"""Stream-stream interval join: the streaming run must equal the batch
run of the same plan (the batch frame is the oracle), and the state must
be watermark-bounded (plan carries the watermark + interval condition).
"""

import pytest
from pyspark.sql import functions as F

from kafka_replicator_spark.sources.tables import load_table
from kafka_replicator_spark.streaming.joins import interval_join


def _views_and_purchases(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
        "value",
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_time"), F.col("value").alias("view_value")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_time"), F.col("value").alias("buy_value")
    )
    return views, buys


def _attributed(views, buys):
    j = interval_join(
        views, buys, on=["user_id"], max_delay="60 minutes",
        watermark_delay="30 minutes",
    )
    return j.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_time").alias("view_time"),
        F.col("r.event_time").alias("buy_time"),
        "view_value",
        "buy_value",
    )


def test_interval_join_batch_matches_manual(spark, sf_dir):
    views, buys = _views_and_purchases(spark, sf_dir)
    got = _attributed(views, buys)
    manual = (
        views.alias("v")
        .join(buys.alias("b"), "user_id")
        .filter(
            (F.col("v.event_time") < F.col("b.event_time"))
            & (F.col("b.event_time") <= F.col("v.event_time") + F.expr("INTERVAL 60 minutes"))
        )
    )
    assert got.count() == manual.count()
    assert got.count() > 0, "fixture produced no attributable pairs — vacuous test"


def test_interval_join_stream_matches_batch(spark, sf_dir, tmp_path):
    views, buys = _views_and_purchases(spark, sf_dir)
    batch = _attributed(views, buys)
    expected = {tuple(r) for r in batch.collect()}

    vdir, bdir = str(tmp_path / "views"), str(tmp_path / "buys")
    views.write.parquet(vdir)
    buys.write.parquet(bdir)
    sviews = spark.readStream.schema(views.schema).parquet(vdir)
    sbuys = spark.readStream.schema(buys.schema).parquet(bdir)
    out = _attributed(sviews, sbuys)
    assert out.isStreaming

    q = (
        out.writeStream.format("memory")
        .queryName("ij_out")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("ij_out").collect()}
    assert got == expected


def test_interval_join_refuses_nothing_but_carries_watermark(spark, sf_dir, tmp_path):
    views, buys = _views_and_purchases(spark, sf_dir)
    vdir = str(tmp_path / "v2")
    views.write.parquet(vdir)
    sviews = spark.readStream.schema(views.schema).parquet(vdir)
    out = interval_join(sviews, buys, on=["user_id"])  # stream-batch mix is fine
    assert out.isStreaming


def _attributed_outer(views, buys):
    j = interval_join(
        views, buys, on=["user_id"], max_delay="60 minutes",
        watermark_delay="30 minutes", how="leftOuter",
    )
    return j.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_time").alias("view_time"),
        F.col("r.event_time").alias("buy_time"),
        "view_value",
        "buy_value",
    )


def test_interval_join_left_outer_stream_watermark_semantics(spark, sf_dir, tmp_path):
    """Left-outer stream-stream join: every inner pair must emit; null
    rows emit exactly for unmatched views whose join window closed before
    the final watermark (min(max_view, max_buy) - 30min); unmatched views
    nearer the stream head stay in state and are the ONLY rows missing
    versus the batch-oracle left outer join."""
    import datetime

    views, buys = _views_and_purchases(spark, sf_dir)
    batch_outer = {tuple(r) for r in _attributed_outer(views, buys).collect()}
    batch_inner = {t for t in batch_outer if t[2] is not None}

    vdir, bdir = str(tmp_path / "views"), str(tmp_path / "buys")
    views.write.parquet(vdir)
    buys.write.parquet(bdir)
    sviews = spark.readStream.schema(views.schema).parquet(vdir)
    sbuys = spark.readStream.schema(buys.schema).parquet(bdir)
    out = _attributed_outer(sviews, sbuys)
    assert out.isStreaming

    q = (
        out.writeStream.format("memory")
        .queryName("ij_outer")
        .option("checkpointLocation", str(tmp_path / "cp_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("ij_outer").collect()}

    # 1. the inner half is exact
    assert {t for t in got if t[2] is not None} == batch_inner
    # 2. every emitted null row is genuinely unmatched in the oracle
    got_nulls = {t for t in got if t[2] is None}
    batch_nulls = {t for t in batch_outer if t[2] is None}
    assert got_nulls <= batch_nulls
    assert got_nulls, "no null row emitted — watermark flush did not run"
    # 3. the only rows missing vs the oracle are unmatched views whose
    #    join window had NOT closed under the final watermark
    max_v = views.agg(F.max("event_time")).collect()[0][0]
    max_b = buys.agg(F.max("event_time")).collect()[0][0]
    wm = min(max_v, max_b) - datetime.timedelta(minutes=30)
    window_close_cut = wm - datetime.timedelta(minutes=60)
    for t in batch_nulls - got_nulls:
        assert t[1] >= window_close_cut, (
            f"null row {t} was due (window closed before watermark) but "
            "never emitted"
        )


def test_interval_join_state_survives_restart(spark, sf_dir, tmp_path):
    """T2-style recovery for the stream-stream join: run 1 ingests the
    older half of both streams and stops; run 2 (same checkpoint)
    ingests the newer half.  Pairs whose view arrived in run 1 and buy
    in run 2 can ONLY form if the join state was recovered from the
    checkpoint — their presence proves state survival; every emitted
    pair must also exist in the batch oracle (no spurious rows)."""
    views, buys = _views_and_purchases(spark, sf_dir)
    batch_inner = {tuple(r) for r in _attributed(views, buys).collect()}
    assert batch_inner, "fixture has no attributable pairs — vacuous"

    import datetime as _dt

    mid_us = int(
        views.select(F.unix_micros("event_time").alias("t"))
        .agg(F.expr("CAST(percentile(t, 0.5) AS BIGINT)"))
        .collect()[0][0]
    )
    mid = _dt.datetime.utcfromtimestamp(mid_us / 1e6)
    vdir, bdir = str(tmp_path / "v"), str(tmp_path / "b")
    outdir, cpdir = str(tmp_path / "out"), str(tmp_path / "cp")

    def run_once():
        sv = spark.readStream.schema(views.schema).parquet(vdir)
        sb = spark.readStream.schema(buys.schema).parquet(bdir)
        q = (
            _attributed(sv, sb)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", cpdir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: the older half of each stream only
    views.filter(F.unix_micros("event_time") <= mid_us).write.mode(
        "append"
    ).parquet(vdir)
    buys.filter(F.unix_micros("event_time") <= mid_us).write.mode(
        "append"
    ).parquet(bdir)
    run_once()
    # run 2: the newer half lands, same checkpoint — state must recover
    views.filter(F.unix_micros("event_time") > mid_us).write.mode(
        "append"
    ).parquet(vdir)
    buys.filter(F.unix_micros("event_time") > mid_us).write.mode(
        "append"
    ).parquet(bdir)
    run_once()

    got = {
        tuple(r)
        for r in spark.read.schema(
            _attributed(views, buys).schema
        ).parquet(outdir).collect()
    }
    # no spurious pairs, ever
    assert got <= batch_inner, f"spurious rows: {sorted(got - batch_inner)[:3]}"
    # the restart-proof: at least one pair spans the boundary (view from
    # run 1, buy from run 2) — impossible without recovered state
    spanning = {t for t in got if t[1] <= mid < t[2]}
    batch_spanning = {t for t in batch_inner if t[1] <= mid < t[2]}
    if batch_spanning:
        assert spanning, (
            "no cross-restart pair emitted although the oracle has "
            f"{len(batch_spanning)} — join state was lost on restart"
        )
