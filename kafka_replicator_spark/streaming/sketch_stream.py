"""Streaming cardinality monitoring: windowed HLL register maintenance.

The reference's observability layer keeps per-partition volume meters
(ingress/metrics.go, SURVEY §2.11); a distinct-count meter (unique keys /
users / documents per window) is the natural extension, and the exact
version is unbounded state.  HLL registers bound it: the streaming state per
window is ≤ 256 (bucket → max rho) rows no matter how many distinct keys
pass through.

Structured Streaming allows ONE stateful aggregation per query, so the
stream maintains the *register table* (a single windowed groupBy — max is
an idempotent, order-free merge, exactly what the state store replays on
recovery) and the estimate readout (`hll_estimate_from_registers`) runs as
a batch query over the sink — the same split a register store at 100 TB
would use, and the identical arithmetic the batch/oracle path uses
(functions/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.hashing import portable_hash60
from kafka_replicator_spark.functions.sketches import _W_BITS, _W_MASK


def windowed_hll_registers(
    df: DataFrame,
    key,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts_ns",
) -> DataFrame:
    """Per-(event-time window, bucket) max-rho register stream.

    Works on both batch and streaming frames — the batch run over the same
    complete input is the oracle for the streaming one (the test strategy
    of streaming/windowed.py).
    """
    with_ts = df.withColumn(
        "event_time", F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    )
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("event_time", watermark_delay)
    h = portable_hash60(key)
    w = h.bitwiseAND(F.lit(_W_MASK))
    rho = (
        F.when(w == 0, F.lit(_W_BITS))
        .otherwise(F.lit(_W_BITS + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        with_ts.select(
            F.window("event_time", window_duration).alias("win"),
            F.shiftright(h, _W_BITS).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("win", "bucket")
        .agg(F.max("rho").alias("r"))
        .select(
            F.col("win.start").alias("window_start"),
            "bucket",
            "r",
        )
    )


def windowed_oph_registers(
    df: DataFrame,
    key,
    group_col: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts_ns",
    b: int = 64,
) -> DataFrame:
    """Per-(event-time window, group, bucket) minimum-hash register stream —
    the one-permutation-MinHash analog of :func:`windowed_hll_registers`.

    ``min`` is an idempotent, order-free merge, so this is a single
    replay-safe stateful aggregation with state bounded at b rows per
    (window, group) however many keys stream through; the pairwise Jaccard
    readout (functions/sketches.oph_jaccard_from_registers) runs as a batch
    query over the sink, identical to the batch/oracle arithmetic.
    """
    from kafka_replicator_spark.functions.sketches import oph_registers

    with_ts = df.withColumn(
        "event_time", F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    )
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("event_time", watermark_delay)
    win = F.window("event_time", window_duration).alias("win")
    regs = oph_registers(
        with_ts.select(win, F.col(group_col).alias("grp"), *df.columns),
        key,
        ["win", "grp"],
        b=b,
    )
    return regs.select(F.col("win.start").alias("window_start"), "grp", "bucket", "mh")


def windowed_cms_registers(
    df: DataFrame,
    key,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts_ns",
    w: int | None = None,
    event_time_col: str | None = None,
) -> DataFrame:
    """Per-(event-time window, depth-row, bucket) count-min counter stream —
    the frequency/heavy-hitter analog of :func:`windowed_hll_registers`.

    Counters are exact int64 sums — associative and order-free, so the
    windowed aggregation is replay-safe under the state store, and two
    register tables (or microbatch increments) merge by elementwise
    addition.  State per window is bounded at D×W rows however many keys
    stream through; the heavy-hitter/point-estimate readout
    (functions/sketches.cms_estimate) runs as a batch query over the sink
    with the identical arithmetic the batch/oracle path uses.

    ``event_time_col`` names an EXISTING timestamp column to window on,
    skipping both the ``ts_col`` conversion and the ``withWatermark`` call
    — required when this aggregation sits downstream of another stateful
    operator in one query (multi-stateful queries forbid redefining the
    watermark, and recreating the column would drop the upstream watermark
    tag; the caller's earlier ``withWatermark`` governs emission).
    """
    from kafka_replicator_spark.functions.hashing import (
        hash_family_col,
        portable_hash32,
    )
    from kafka_replicator_spark.functions.sketches import _CMS_PARAMS, CMS_W

    w = CMS_W if w is None else w
    if event_time_col is not None:
        with_ts = (
            df if event_time_col == "event_time"
            else df.withColumnRenamed(event_time_col, "event_time")
        )
    else:
        with_ts = df.withColumn(
            "event_time", F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
        if with_ts.isStreaming:
            with_ts = with_ts.withWatermark("event_time", watermark_delay)
    h32 = portable_hash32(key)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    (hash_family_col(h32, a, b) % F.lit(w)).alias("b"),
                )
                for i, (a, b) in enumerate(_CMS_PARAMS)
            ]
        )
    ).alias("rb")
    return (
        with_ts.select(F.window("event_time", window_duration).alias("win"), rows)
        .groupBy("win", F.col("rb.i").alias("i"), F.col("rb.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("counter"))
        .select(F.col("win.start").alias("window_start"), "i", "b", "counter")
    )


def windowed_histogram_registers(
    df: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    n_buckets: int = 32,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts_ns",
) -> DataFrame:
    """Per-(event-time window, bucket) equi-width histogram counter stream —
    the quantile-sketch analog of :func:`windowed_cms_registers`
    (functions/sketches.histogram_quantiles is the batch/readout side).

    The streaming variant uses CONFIGURED bounds ``[lo, hi]`` (a monitoring
    histogram can't learn min/max retroactively; out-of-range values clamp
    to the edge buckets).  Counters are exact int64 sums — associative and
    order-free, so the aggregation is replay-safe and register tables merge
    by addition; state per window is bounded at ``n_buckets`` rows.  The
    interpolated-quantile readout runs as a batch query over the sink with
    the batch operator's arithmetic.
    """
    from kafka_replicator_spark.functions.sketches import equiwidth_bucket

    # NULL values are EXCLUDED (greatest() skips nulls, which would
    # silently count null payloads into bucket 0)
    with_ts = df.where(F.col(value_col).isNotNull()).withColumn(
        "event_time", F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    )
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("event_time", watermark_delay)
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0), equiwidth_bucket(value_col, str(lo), str(hi), n_buckets)
        ),
    ).cast("int")
    return (
        with_ts.select(
            F.window("event_time", window_duration).alias("win"),
            bucket.alias("bucket"),
        )
        .groupBy("win", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("counter"))
        .select(F.col("win.start").alias("window_start"), "bucket", "counter")
    )


def windowed_bloom_registers(
    df: DataFrame,
    key,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts_ns",
    m: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """Per-(event-time window, bit position) counting-bloom register stream —
    the set-membership analog of :func:`windowed_hll_registers`.

    Counters are exact int64 sums — associative and order-free — so the
    windowed aggregation is replay-safe under the state store and register
    tables merge by elementwise addition; plain membership reads bits as
    ``n_hits > 0``.  State per window is bounded at m rows however many keys
    stream through; the membership/FPR readout
    (functions/sketches.bloom_membership_from_registers) runs as a batch
    query over the sink — the same register-table/readout split as the
    HLL/OPH/CMS families.
    """
    from kafka_replicator_spark.functions.sketches import (
        BLOOM_K,
        BLOOM_M,
        bloom_bit_positions,
    )

    m = BLOOM_M if m is None else m
    k = BLOOM_K if k is None else k
    with_ts = df.withColumn(
        "event_time", F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    )
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("event_time", watermark_delay)
    pos = F.explode(bloom_bit_positions(key, m, k)).alias("p")
    return (
        with_ts.select(F.window("event_time", window_duration).alias("win"), pos)
        .groupBy("win", "p")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .select(F.col("win.start").alias("window_start"), "p", "n_hits")
    )
