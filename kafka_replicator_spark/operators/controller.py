"""T14: cron-scheduled compaction controller (reference
pkg/compaction/controller.go:99-239; cron setup pkg/compaction/config.go:140-150).

The reference triggers compaction from a 6-field cron expression (seconds
minute hour day-of-month month day-of-week — robfig/cron syntax, e.g.
``0 0 1 * * *`` = 01:00:00 daily, README.md:129) and caps concurrent
partition jobs at ``Parallelism``.

In the Spark engine the *placement* half of the controller is deleted by
design (SURVEY §2.9: the cluster manager places work; T12), and intra-run
parallelism is the Spark scheduler's job — ``compact`` already fans out one
task per output segment.  What remains reference surface is the *schedule*:
this module implements the 6-field cron next-fire computation and a driver
loop with injectable clock/sleep so the cadence is testable without wall
time.  Production deployments can equally drive ``compact`` from an
external scheduler (Airflow/cron) — this is the in-engine equivalent.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

_FIELD_RANGES = (
    ("second", 0, 59),
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("dom", 1, 31),
    ("month", 1, 12),
    ("dow", 0, 6),  # 0 = Sunday (7 also accepted as Sunday)
)


def _parse_field(spec: str, name: str, lo: int, hi: int) -> frozenset[int]:
    """One cron field: ``*``, ``*/step``, ``a``, ``a-b``, ``a-b/step``,
    ``a/step`` and comma lists thereof (the numeric core of robfig/cron's
    grammar).  Day-of-week accepts 7 as a Sunday alias both as a single
    value and as a range end (``5-7`` = Fri, Sat, Sun — legal in
    Vixie/robfig cron)."""
    out: set[int] = set()
    for part in spec.split(","):
        rng, step = part, 1
        had_step = "/" in part
        if had_step:
            rng, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"cron {name}: step must be >= 1 in {spec!r}")
        if rng == "*":
            a, b = lo, hi
        elif "-" in rng:
            a_s, b_s = rng.split("-", 1)
            a, b = int(a_s), int(b_s)
            if name == "dow" and b == 7:
                # range runs through the Sunday alias: keep 7 in the walk,
                # then fold it onto 0 (5-7 → {5, 6, 0})
                if not (lo <= a <= 7 and a <= b):
                    raise ValueError(f"cron {name}: {spec!r} out of range [{lo},7]")
                out.update(0 if v == 7 else v for v in range(a, 8, step))
                continue
        else:
            a = int(rng)
            if name == "dow" and a == 7:
                a = 0  # single-value Sunday alias
            # "a/step" (any step, including 1) means a..hi per cron's rule;
            # a bare "a" is just a
            b = hi if had_step else a
        if name == "dow":
            a, b = (0 if a == 7 else a), (0 if b == 7 else b)
        if not (lo <= a <= hi and lo <= b <= hi and a <= b):
            raise ValueError(f"cron {name}: {spec!r} out of range [{lo},{hi}]")
        out.update(range(a, b + 1, step))
    return frozenset(out)


@dataclass(frozen=True)
class CronSchedule:
    """A parsed 6-field cron expression.

    Day-of-month and day-of-week combine with standard cron's OR quirk:
    when BOTH are restricted (neither is ``*``), a day matching EITHER
    fires; when only one is restricted, it alone decides.
    """

    seconds: frozenset[int]
    minutes: frozenset[int]
    hours: frozenset[int]
    doms: frozenset[int]
    months: frozenset[int]
    dows: frozenset[int]
    dom_star: bool
    dow_star: bool

    @classmethod
    def parse(cls, expr: str) -> "CronSchedule":
        fields = expr.split()
        if len(fields) != 6:
            raise ValueError(
                f"cron expression must have 6 fields (sec min hour dom month dow), got {expr!r}"
            )
        sets = [
            _parse_field(f, name, lo, hi)
            for f, (name, lo, hi) in zip(fields, _FIELD_RANGES)
        ]
        return cls(
            *sets,
            dom_star=fields[3] == "*",
            dow_star=fields[5] == "*",
        )

    def _day_matches(self, d: datetime) -> bool:
        if d.month not in self.months:
            return False
        dow = (d.weekday() + 1) % 7  # python Monday=0 -> cron Sunday=0
        dom_ok, dow_ok = d.day in self.doms, dow in self.dows
        if self.dom_star and self.dow_star:
            return True
        if self.dom_star:
            return dow_ok
        if self.dow_star:
            return dom_ok
        return dom_ok or dow_ok  # both restricted: cron's OR rule

    def next_fire(self, after: datetime) -> datetime:
        """Smallest schedule time strictly after ``after`` (field-wise walk:
        at most ~4 years of day candidates, then set lookups — no
        second-by-second scan)."""
        t = (after + timedelta(seconds=1)).replace(microsecond=0)
        day = t.replace(hour=0, minute=0, second=0)
        for _ in range(366 * 4 + 2):
            if self._day_matches(day):
                floor = t if day.date() == t.date() else day
                hms = self._first_hms(floor)
                if hms is not None:
                    return day.replace(hour=hms[0], minute=hms[1], second=hms[2])
            day += timedelta(days=1)
        raise ValueError("cron expression never fires (e.g. Feb 30)")

    def _first_hms(self, floor: datetime) -> tuple[int, int, int] | None:
        for h in sorted(self.hours):
            if h < floor.hour:
                continue
            for m in sorted(self.minutes):
                if h == floor.hour and m < floor.minute:
                    continue
                for s in sorted(self.seconds):
                    if h == floor.hour and m == floor.minute and s < floor.second:
                        continue
                    return (h, m, s)
        return None


def run_scheduled_compaction(
    spark,
    root: str,
    region: str,
    cron_expr: str,
    max_cycles: int,
    clock=None,
    sleep_fn=None,
    on_cycle=None,
    **compact_kwargs,
):
    """The controller loop (reference controller.go:99-140): sleep until the
    next cron fire, run one compaction cycle, repeat for ``max_cycles``.

    ``clock``/``sleep_fn`` are injectable (defaults ``datetime.now`` /
    ``time.sleep``) so tests drive simulated time; ``on_cycle(fire_time,
    result_rows)`` observes each cycle.  Returns the list of per-cycle
    written-segment row lists.  A cycle with nothing to compact returns []
    for that cycle (plan finds no eligible band) — the reference likewise
    no-ops when below MinCount/MinSize.
    """
    import time as _time

    from kafka_replicator_spark.operators.compaction import compact

    sched = CronSchedule.parse(cron_expr)
    clock = clock or datetime.now
    sleep_fn = sleep_fn or _time.sleep
    results = []
    now = clock()
    for _ in range(max_cycles):
        fire = sched.next_fire(now)
        wait = (fire - now).total_seconds()
        if wait > 0:
            sleep_fn(wait)
        rows = compact(spark, root, region=region, **compact_kwargs).collect()
        results.append(rows)
        if on_cycle is not None:
            on_cycle(fire, rows)
        now = max(clock(), fire)
    return results
