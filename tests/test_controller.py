"""T14 cron-scheduled compaction controller (operators/controller.py) —
schedule semantics of the reference's 6-field cron trigger
(pkg/compaction/controller.go:99-239, README.md:129) plus the driver loop
under simulated time."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from kafka_replicator_spark.operators.controller import (
    CronSchedule,
    run_scheduled_compaction,
)
from kafka_replicator_spark.sources.segments import list_segments

from tests.test_compaction import REGION, _write_range


def _nf(expr, iso):
    return CronSchedule.parse(expr).next_fire(datetime.fromisoformat(iso))


def test_cron_daily_at_one(tmp_path):
    """'0 0 1 * * *' (README.md:129) = 01:00:00 every day."""
    assert _nf("0 0 1 * * *", "2024-03-05T00:30:00") == datetime(2024, 3, 5, 1, 0, 0)
    assert _nf("0 0 1 * * *", "2024-03-05T01:00:00") == datetime(2024, 3, 6, 1, 0, 0)
    assert _nf("0 0 1 * * *", "2024-12-31T02:00:00") == datetime(2025, 1, 1, 1, 0, 0)


def test_cron_steps_lists_ranges():
    # every 15 s within the minute
    assert _nf("*/15 * * * * *", "2024-01-01T00:00:14") == datetime(2024, 1, 1, 0, 0, 15)
    assert _nf("*/15 * * * * *", "2024-01-01T00:00:45") == datetime(2024, 1, 1, 0, 1, 0)
    # minute list + hour range
    assert _nf("0 5,35 9-17 * * *", "2024-01-01T17:36:00") == datetime(2024, 1, 2, 9, 5, 0)
    # "a/step" = from a to max by step
    assert _nf("0 10/20 * * * *", "2024-01-01T00:31:00") == datetime(2024, 1, 1, 0, 50, 0)


def test_cron_dow_and_dom_or_rule():
    # dow only: next Sunday (2024-03-05 is a Tuesday)
    assert _nf("0 0 0 * * 0", "2024-03-05T12:00:00") == datetime(2024, 3, 10, 0, 0, 0)
    # 7 == Sunday alias
    assert _nf("0 0 0 * * 7", "2024-03-05T12:00:00") == datetime(2024, 3, 10, 0, 0, 0)
    # both dom and dow restricted -> OR: the 15th (Fri) vs Monday the 11th
    assert _nf("0 0 0 15 * 1", "2024-03-05T12:00:00") == datetime(2024, 3, 11, 0, 0, 0)
    # month gate: Feb 29 exists only in leap years
    assert _nf("0 0 0 29 2 *", "2024-03-01T00:00:00") == datetime(2028, 2, 29, 0, 0, 0)


def test_cron_rejects_bad_expressions():
    for bad in ("0 0 1 * *", "0 0 25 * * *", "x 0 1 * * *", "0 0 1 * * */0"):
        with pytest.raises(ValueError):
            CronSchedule.parse(bad)
    with pytest.raises(ValueError):
        CronSchedule.parse("0 0 0 30 2 *").next_fire(datetime(2024, 1, 1))


def test_scheduled_compaction_cycles(spark, tmp_path):
    """Two simulated cron cycles: each fires at the schedule time, compacts
    what is eligible, and the injected sleeper receives the exact waits."""
    root = str(tmp_path)
    for s, e in [(0, 9), (10, 19)]:
        _write_range(spark, root, 0, s, e)

    t0 = datetime(2024, 3, 5, 0, 59, 0)
    now = [t0]
    waits = []

    def sleeper(sec):
        waits.append(sec)
        now[0] = now[0] + timedelta(seconds=sec)
        if len(waits) == 2:
            # new level-0 work arrives between cycle 1 and cycle 2 (the
            # sleep for cycle 2 runs before its compact)
            _write_range(spark, root, 0, 20, 29)

    # hourly at :00:00; wait: the sleeper must be called BEFORE each compact
    fires = []
    results = run_scheduled_compaction(
        spark, root, REGION, "0 0 * * * *", max_cycles=2,
        clock=lambda: now[0], sleep_fn=sleeper,
        on_cycle=lambda fire, rows: fires.append(fire),
        min_count=2, min_bytes=1,
    )
    assert waits[0] == 60.0  # 00:59 -> 01:00
    assert fires == [datetime(2024, 3, 5, 1, 0, 0), datetime(2024, 3, 5, 2, 0, 0)]
    # cycle 1 merged the two initial segments; cycle 2 found only the single
    # new level-0 segment (below min_count) -> no-op
    assert len(results) == 2
    assert [r["start_offset"] for r in results[0]] == [0]
    assert results[0][0]["end_offset"] == 19
    assert results[1] == []
    levels = sorted(r["level"] for r in list_segments(spark, root).collect())
    assert levels == [0, 1]


def test_cron_dow_wraparound_range_and_step_value():
    # 5-7 = Fri, Sat, Sun (7 aliases 0) — legal in Vixie/robfig cron
    s = CronSchedule.parse("0 0 0 * * 5-7")
    assert s.dows == frozenset({5, 6, 0})
    # 2024-03-05 is a Tuesday → next match is Friday the 8th
    assert _nf("0 0 0 * * 5-7", "2024-03-05T12:00:00") == datetime(2024, 3, 8, 0, 0, 0)
    # a/step means a..hi for ANY step, including 1 (cron's a/step rule)
    assert CronSchedule.parse("30/1 * * * * *").seconds == frozenset(range(30, 60))
    assert CronSchedule.parse("10/15 * * * * *").seconds == frozenset({10, 25, 40, 55})
    # 7/2 in dow: Sunday alias start, every 2nd day → {0, 2, 4, 6}
    assert CronSchedule.parse("0 0 0 * * 7/2").dows == frozenset({0, 2, 4, 6})


def test_cron_grid_matches_next_fire_walk():
    """The r_t14_cron_grid relational match set must equal iterating the
    REAL CronSchedule.next_fire over the same window — ties the walk-based
    scheduler to the grid restatement the oracle checks."""
    from datetime import datetime, timedelta, timezone

    from kafka_replicator_spark.operators.controller import CronSchedule
    from kafka_replicator_spark.queries.replicator import (
        _CRON_GRID_MINUTES,
        _CRON_GRID_START_MIN,
        _CRON_SPECS,
        _cron_clause,
    )

    start = datetime.fromtimestamp(_CRON_GRID_START_MIN * 60, tz=timezone.utc)
    end = start + timedelta(minutes=_CRON_GRID_MINUTES)

    def grid_matches(expr: str) -> list[int]:
        # pure-python evaluation of the generated SQL predicate
        clause = _cron_clause(expr)
        out = []
        for k in range(_CRON_GRID_MINUTES):
            m = _CRON_GRID_START_MIN + k
            d = datetime.fromtimestamp(m * 60, tz=timezone.utc)
            env = {
                "mi": d.minute,
                "hh": d.hour,
                "dm": d.day,
                "mo": d.month,
                "dw": (d.weekday() + 1) % 7,
                "TRUE": True,
            }
            import re

            py = clause.replace(" IN (", " in (").replace(" OR ", " or ").replace(
                " AND ", " and "
            )
            # single-element SQL lists `in (0)` need a python tuple `(0,)`
            py = re.sub(r"in \(([^)]*)\)", r"in (\1,)", py)
            if eval(py, {}, env):  # noqa: S307 - literal generated clause
                out.append(m)
        return out

    for name, expr in _CRON_SPECS:
        cs = CronSchedule.parse(expr)
        fires, t = [], start - timedelta(seconds=1)
        while True:
            t = cs.next_fire(t)
            if t >= end:
                break
            assert t.second == 0  # seconds pinned to 0 keep fires on the grid
            fires.append(int(t.replace(tzinfo=timezone.utc).timestamp()) // 60)
        assert fires == grid_matches(expr), name
