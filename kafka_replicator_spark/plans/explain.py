"""Physical-plan inspection — the engine's scale guardrails.

At 100 TB the plan *is* the product: a filter that doesn't reach the
parquet scan re-reads terabytes; a dimension join that doesn't broadcast
shuffles the fact table; an extra Exchange doubles the job.  These helpers
turn those properties into assertions that tests/test_plans.py pins down,
so a regression in plan shape fails CI rather than a cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def broadcast_build_columns(df: DataFrame) -> list[list[str]]:
    """Column-name lists of every BroadcastExchange build side.

    Parses the formatted plan's per-node ``Input [n]: [cols]`` section so a
    test can assert WHICH frame broadcasts — "a broadcast join exists" pins
    nothing when the hint could sit on the corpus-scale side (the
    wrong-side-broadcast defect class: correct at sf0.1, OOM at 100×).
    Returns one list of bare column names (exprIds stripped) per
    BroadcastExchange node.
    """
    plan = physical_plan(df, mode="formatted")
    out: list[list[str]] = []
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if not re.search(r"\(\d+\) BroadcastExchange", ln):
            continue
        for follow in lines[i + 1 : i + 4]:
            m = re.match(r"Input \[\d+\]: \[(.*)\]", follow.strip())
            if m:
                cols = [
                    re.sub(r"#\d+L?", "", c.strip()) for c in m.group(1).split(",")
                ]
                out.append(cols)
                break
    return out


def window_partition_specs(df: DataFrame) -> list[list[str]]:
    """Partition-column name lists of every window spec in the plan.

    Parses each ``windowspecdefinition(...)`` occurrence: top-level
    comma-split arguments up to the first one carrying an ordering
    direction (``ASC``/``DESC``) are the partition columns (exprIds
    stripped).  Lets a test pin WHAT a window partitions by — e.g. reject
    ``partitionBy(source)`` over the document grain (a whole-source
    single-task sort at 100 TB) while allowing the bounded
    ``partitionBy(__pid, source)`` stitch windows and per-pack stats.
    """
    plan = physical_plan(df, mode="formatted")
    out: list[list[str]] = []
    key = "windowspecdefinition("
    i = 0
    while True:
        start = plan.find(key, i)
        if start < 0:
            break
        j = start + len(key)
        depth = 1
        args: list[str] = []
        cur = ""
        while j < len(plan) and depth > 0:
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            if ch == "," and depth == 1:
                args.append(cur)
                cur = ""
            else:
                cur += ch
            j += 1
        if cur.strip():
            args.append(cur)
        parts: list[str] = []
        for a in args:
            a = a.strip()
            if re.search(r"\b(ASC|DESC)\b", a) or a.startswith("specifiedwindowframe"):
                break
            parts.append(re.sub(r"#\d+L?", "", a))
        out.append(parts)
        i = j + 1
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes broadcast exchanges)."""
    plan = physical_plan(df, mode="simple")
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan
        )
    )


def has_wholestage_codegen(df: DataFrame) -> bool:
    # AQE plans don't show '*(n)' markers until finalized; the codegen
    # explain mode reports generated subtrees regardless.
    return "WholeStageCodegen" in physical_plan(df, mode="codegen")
