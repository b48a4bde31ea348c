"""Round-9 structural properties.

The grouped range-prefix stitch must be BIT-IDENTICAL to the per-group
global window it replaces (corpus_mix / pack_sequences ride on that), and
the new plan-spec parser must read window partition columns faithfully —
these pin both directly, independent of the registered queries' oracles.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from kafka_replicator_spark.cacheutil import release_cached
from kafka_replicator_spark.functions.stitch import grouped_rank_cumsum
from kafka_replicator_spark.plans.explain import window_partition_specs


@pytest.fixture()
def frame(spark):
    # 3 groups of very different sizes, deliberately more range partitions
    # than groups so groups split across partitions AND partitions hold
    # multiple groups; NULLs in the sum column exercise the SQL-SUM rule
    rows = []
    for g, n in (("a", 57), ("b", 3), ("c", 40)):
        for i in range(n):
            rows.append((g, (i * 37) % n, i, None if (g == "c" and i % 7 == 0) else i + 1))
    return spark.createDataFrame(rows, "grp string, ord1 int, ord2 int, val long")


def test_grouped_rank_cumsum_matches_global_window(spark, frame):
    spark.catalog.clearCache()
    release_cached()
    got = grouped_rank_cumsum(frame, "grp", ["ord1", "ord2"], sum_col="val", partitions=8)
    w = Window.partitionBy("grp").orderBy("ord1", "ord2")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exp = frame.withColumn("__grank", F.row_number().over(w).cast("long")).withColumn(
        "__gcumsum", F.sum("val").over(cum)
    )
    key = ["grp", "ord1", "ord2"]
    joined = got.alias("g").join(exp.alias("e"), key).select(
        F.col("g.__grank").alias("gr"),
        F.col("e.__grank").alias("er"),
        F.col("g.__gcumsum").alias("gc"),
        F.col("e.__gcumsum").alias("ec"),
    )
    n = frame.count()
    assert joined.count() == n
    bad = joined.filter(
        (F.col("gr") != F.col("er")) | ~(F.col("gc").eqNullSafe(F.col("ec")))
    ).count()
    assert bad == 0
    release_cached()


def test_grouped_rank_cumsum_rank_only(spark, frame):
    spark.catalog.clearCache()
    release_cached()
    got = grouped_rank_cumsum(frame, "grp", ["ord1", "ord2"], partitions=4)
    assert "__gcumsum" not in got.columns
    # per-group ranks are a dense 1..n permutation
    chk = got.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__grank").alias("lo"),
        F.max("__grank").alias("hi"),
        F.countDistinct("__grank").alias("d"),
    )
    for r in chk.collect():
        assert (r["lo"], r["hi"], r["d"]) == (1, r["n"], r["n"]), r
    release_cached()


def test_grouped_stitch_windows_are_pid_scoped(spark, frame):
    spark.catalog.clearCache()
    release_cached()
    got = grouped_rank_cumsum(frame, "grp", ["ord1"], sum_col="val", partitions=4)
    specs = window_partition_specs(got)
    assert specs, "expected window specs in the stitched plan"
    for s in specs:
        assert s != ["grp"], specs  # never a whole-group window
        assert "__pid" in s, specs  # every window is one range-partition slice
    release_cached()


def test_window_partition_specs_parses_mixed_plans(spark):
    df = spark.createDataFrame(
        [("x", 1, 2), ("x", 2, 3), ("y", 1, 4)], "g string, o int, v int"
    )
    w1 = Window.partitionBy("g").orderBy("o")
    w2 = Window.partitionBy("g", "o").orderBy(F.desc("v"))
    out = df.withColumn("r", F.row_number().over(w1)).withColumn(
        "s", F.sum("v").over(w2)
    )
    specs = window_partition_specs(out)
    assert ["g"] in specs
    assert ["g", "o"] in specs


def test_stitch_rejects_float_sums(spark):
    """Float accumulation order varies with the partition count — both
    stitch helpers must fail fast rather than drift silently (agg='max'
    on floats stays allowed: max is order-free)."""
    from kafka_replicator_spark.functions.stitch import range_prefix_stitch

    df = spark.createDataFrame(
        [("a", 1, 1.5), ("b", 2, 2.5)], "grp string, o int, v double"
    )
    with pytest.raises(ValueError, match="floating-point"):
        grouped_rank_cumsum(df, "grp", ["o"], sum_col="v", partitions=2)
    with pytest.raises(ValueError, match="floating-point"):
        range_prefix_stitch(df, "o", "v", agg="sum", partitions=2)
    with pytest.raises(ValueError, match="floating-point"):
        range_prefix_stitch(df, "o", "o", agg="sum", extra_sum_col="v", partitions=2)
    # max over floats is order-free — allowed
    tagged, prefix = range_prefix_stitch(df, "o", "v", agg="max", partitions=2)
    assert prefix.count() >= 1
    release_cached()

def test_stitch_rejects_null_group_keys(spark):
    """The prefix join on [__pid, group_col] is null-UNSAFE — NULL-group
    rows would silently vanish (2/4 rows survived before the guard) while
    Window.partitionBy(group) keeps them as a partition.  The helper must
    fail fast instead of dropping rows (ADVICE r09)."""
    df = spark.createDataFrame(
        [("a", 1, 10), (None, 2, 20), ("a", 3, 30), (None, 4, 40)],
        "grp string, o int, v long",
    )
    with pytest.raises(ValueError, match="NULL"):
        grouped_rank_cumsum(df, "grp", ["o"], sum_col="v", partitions=2)
    release_cached()
    # non-null groups keep working unchanged
    ok = grouped_rank_cumsum(
        df.filter(F.col("grp").isNotNull()), "grp", ["o"], sum_col="v", partitions=2
    )
    assert ok.count() == 2
    release_cached()
