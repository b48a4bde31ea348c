"""Temporal join operators Spark lacks natively: as-of join and range join.

Both follow the guide's recommended constructions (pyspark_guide.md "As-of /
range join"): the as-of join runs ``pd.merge_asof`` per co-partitioned group
(Arrow-batched, sorted merge — O(n log n) per group, no pair blow-up); the
range join bucketizes the range key so the equi-join prunes the candidate
space to adjacent buckets instead of a nested-loop cross product — the
construction that survives 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` within the same ``by`` group (direction
    "backward"; "forward" symmetric).  Left rows with no match are dropped
    (inner as-of).

    Implementation: union both sides tagged, group by ``by`` so each pandas
    group holds its left and right rows, ``pd.merge_asof`` inside.  Groups
    are independent → full partition parallelism.
    """
    lcols = [c for c in left.columns if c != by]
    l_tag = left.select(
        F.lit("l").alias("__side"), F.col(by).alias(by), F.col(on).alias("__t"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.lit("r").alias("__side"), F.col(by).alias(by), F.col(on).alias("__t"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    both = l_tag.unionByName(r_tag)
    out_fields = (
        [f"{by} {dict(left.dtypes)[by]}"]
        + [f"{c} {dict(left.dtypes)[c]}" for c in lcols]
        + [f"{c} {dict(right.dtypes)[c]}" for c in right_cols]
    )
    out_schema = ", ".join(out_fields)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lf = pdf[pdf["__side"] == "l"].sort_values("__t", kind="mergesort")
        rf = pdf[pdf["__side"] == "r"].sort_values("__t", kind="mergesort")
        if lf.empty or rf.empty:
            return pd.DataFrame(columns=[by] + lcols + right_cols)
        rf = rf[["__t"] + [f"__r_{c}" for c in right_cols]].rename(
            columns={f"__r_{c}": c for c in right_cols}
        )
        merged = pd.merge_asof(
            lf[[by, "__t"] + lcols], rf, on="__t", direction=direction
        ).dropna(subset=[right_cols[0]])
        return merged[[by] + lcols + right_cols]

    return both.groupBy(by).applyInPandas(merge, schema=out_schema)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    extra_cond=None,
) -> DataFrame:
    """Join each left row to right rows whose [start, end] interval contains
    the left point — via bucketization: both sides key on
    ``floor(value / width)``, the right side exploding over every bucket its
    interval covers, then an equi-join + exact refine.

    vs the naive ``left.join(right, point BETWEEN start AND end)`` (a
    broadcast-nested-loop at best): the bucket equi-join shuffles hash-wise
    and scales; choose ``bucket_width`` ≈ typical interval length so each
    interval covers O(1) buckets.
    """
    lb = left.withColumn("__bucket", F.floor(F.col(left_point) / bucket_width))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / bucket_width),
                F.floor(F.col(right_end) / bucket_width),
            )
        ),
    )
    joined = lb.join(rb, "__bucket").filter(
        (F.col(left_point) >= F.col(right_start)) & (F.col(left_point) <= F.col(right_end))
    )
    if extra_cond is not None:
        joined = joined.filter(extra_cond)
    return joined.drop("__bucket")


def versioned_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """SCD2-style temporal versioning: treat each row as a keyed change
    event and emit validity ranges — ``valid_from`` (the row's own
    timestamp), ``valid_to`` (the successor's timestamp, open interval; NULL
    for the live version) and ``is_current``.

    The window is partitioned by key, so versioning shuffles each key's
    (typically short) history to one task — the same partition-local shape
    as the engine's checkpoint LWW (A6), which keeps only the newest
    version; this keeps them all, the audit/time-travel flavor.

    ``order_cols`` break timestamp ties deterministically (defaults to the
    timestamp alone).
    """
    order = [ts_col] + list(order_cols or [])
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order])
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull().cast("long"))
    )
