"""Streaming HLL register maintenance: the streamed register table (with
watermark, incremental state) must equal the batch register table over the
same complete input, and the estimate read out from the streamed registers
must equal the batch estimate — sketch state is mergeable, so microbatch
order can't change it.
"""

from pyspark.sql import functions as F

from kafka_replicator_spark.functions.sketches import hll_estimate_from_registers
from kafka_replicator_spark.streaming.sketch_stream import windowed_hll_registers


def test_streaming_hll_registers_match_batch(spark, messages, tmp_path):
    src = str(tmp_path / "drops")
    data = messages.select("topic", "partition_id", "msg_offset", "ts_ns").withColumn(
        "key_s", F.concat_ws(":", "topic", "partition_id", "msg_offset")
    )
    data.filter(F.col("msg_offset") < 120).coalesce(1).write.mode("append").parquet(src)
    data.filter(F.col("msg_offset") >= 120).coalesce(1).write.mode("append").parquet(src)

    batch_regs = windowed_hll_registers(data, F.col("key_s"))

    stream = (
        spark.readStream.schema(
            "topic string, partition_id int, msg_offset long, ts_ns long, key_s string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_hll_registers(stream, F.col("key_s"), watermark_delay="10 seconds")
        .writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_regs = spark.sql("SELECT * FROM hll_regs")

    assert got_regs.exceptAll(batch_regs).count() == 0
    assert batch_regs.exceptAll(got_regs).count() == 0

    got_est = {
        r["window_start"]: r["hll_estimate"]
        for r in hll_estimate_from_registers(got_regs, ["window_start"]).collect()
    }
    exp_est = {
        r["window_start"]: r["hll_estimate"]
        for r in hll_estimate_from_registers(batch_regs, ["window_start"]).collect()
    }
    assert got_est == exp_est and len(exp_est) > 1
    assert all(v > 0 for v in exp_est.values())


def test_streaming_oph_registers_match_batch(spark, messages, tmp_path):
    from kafka_replicator_spark.functions.sketches import oph_jaccard_from_registers
    from kafka_replicator_spark.streaming.sketch_stream import windowed_oph_registers

    src = str(tmp_path / "oph_drops")
    data = messages.select("topic", "partition_id", "msg_offset", "ts_ns").withColumn(
        "key_s", F.concat_ws(":", "topic", "msg_offset")
    )
    data.filter(F.col("msg_offset") < 120).coalesce(1).write.mode("append").parquet(src)
    data.filter(F.col("msg_offset") >= 120).coalesce(1).write.mode("append").parquet(src)

    batch_regs = windowed_oph_registers(data, F.col("key_s"), "partition_id")

    stream = (
        spark.readStream.schema(
            "topic string, partition_id int, msg_offset long, ts_ns long, key_s string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_oph_registers(
            stream, F.col("key_s"), "partition_id", watermark_delay="10 seconds"
        )
        .writeStream.format("memory")
        .queryName("oph_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_regs = spark.sql("SELECT * FROM oph_regs")

    assert got_regs.exceptAll(batch_regs).count() == 0
    assert batch_regs.exceptAll(got_regs).count() == 0

    # per-group state is bounded at b rows per window
    per = got_regs.groupBy("window_start", "grp").count().agg(F.max("count")).first()[0]
    assert per <= 64

    # pairwise readout over one window's registers is sane ppm
    one = got_regs.orderBy("window_start").first()["window_start"]
    jac = oph_jaccard_from_registers(
        got_regs.filter(F.col("window_start") == one), "grp"
    ).toPandas()
    assert len(jac) > 0
    assert ((jac.jacc_est_ppm >= 0) & (jac.jacc_est_ppm <= 1_000_000)).all()


def test_oph_identical_groups_estimate_full_overlap(spark):
    from kafka_replicator_spark.functions.sketches import (
        oph_jaccard_from_registers,
        oph_registers,
    )

    rows = [(g, f"k{i}") for g in ("a", "b") for i in range(500)]
    df = spark.createDataFrame(rows, schema="grp string, k string")
    regs = oph_registers(df, F.col("k"), ["grp"])
    jac = oph_jaccard_from_registers(regs, "grp").toPandas()
    assert jac.iloc[0]["jacc_est_ppm"] == 1_000_000


def test_streaming_cms_registers_match_batch(spark, messages, tmp_path):
    from kafka_replicator_spark.functions.sketches import cms_estimate
    from kafka_replicator_spark.streaming.sketch_stream import windowed_cms_registers

    src = str(tmp_path / "cms_drops")
    data = messages.select("topic", "partition_id", "msg_offset", "ts_ns").withColumn(
        "key_s", F.concat_ws(":", "topic", "partition_id")
    )
    data.filter(F.col("msg_offset") < 120).coalesce(1).write.mode("append").parquet(src)
    data.filter(F.col("msg_offset") >= 120).coalesce(1).write.mode("append").parquet(src)

    batch_regs = windowed_cms_registers(data, F.col("key_s"))

    stream = (
        spark.readStream.schema(
            "topic string, partition_id int, msg_offset long, ts_ns long, key_s string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_cms_registers(stream, F.col("key_s"), watermark_delay="10 seconds")
        .writeStream.format("memory")
        .queryName("cms_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_regs = spark.sql("SELECT * FROM cms_regs")

    # streamed register table == batch register table over the same input
    assert got_regs.exceptAll(batch_regs).count() == 0
    assert batch_regs.exceptAll(got_regs).count() == 0

    # per-window point estimates never underestimate the true counts
    wins = [r["window_start"] for r in got_regs.select("window_start").distinct().collect()]
    assert len(wins) > 1
    for win in sorted(wins)[:2]:  # two windows suffice; the register-equality
        # check above already covers every window
        sketch = got_regs.filter(F.col("window_start") == win).select("i", "b", "counter")
        truth = (
            data.withColumn(
                "event_time", F.timestamp_micros(F.expr("ts_ns div 1000"))
            )
            .withColumn("win", F.window("event_time", "1 hour"))
            .filter(F.col("win.start") == win)
            .groupBy("key_s")
            .count()
        )
        cands = truth.select(F.col("key_s").alias("key"))
        est = {
            r["key"]: r["cms_estimate"]
            for r in cms_estimate(sketch, cands).collect()
        }
        for r in truth.collect():
            assert est[r["key_s"]] >= r["count"]


def test_streaming_histogram_registers_match_batch(spark, messages, tmp_path):
    from kafka_replicator_spark.streaming.sketch_stream import (
        windowed_histogram_registers,
    )

    src = str(tmp_path / "hist_drops")
    data = messages.select("msg_offset", "msg_size", "ts_ns")
    data.filter(F.col("msg_offset") < 120).coalesce(1).write.mode("append").parquet(src)
    data.filter(F.col("msg_offset") >= 120).coalesce(1).write.mode("append").parquet(src)

    lo, hi = 0, 4096
    batch_regs = windowed_histogram_registers(data, "msg_size", lo, hi)

    stream = (
        spark.readStream.schema("msg_offset long, msg_size long, ts_ns long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_histogram_registers(
            stream, "msg_size", lo, hi, watermark_delay="10 seconds"
        )
        .writeStream.format("memory")
        .queryName("hist_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.bucket): r.counter
        for r in spark.sql("SELECT * FROM hist_regs").collect()
    }
    exp = {(r.window_start, r.bucket): r.counter for r in batch_regs.collect()}
    assert got == exp
    # counters account for every row (clamping loses nothing)
    assert sum(got.values()) == data.count()


def test_streaming_hll_registers_survive_restart(spark, messages, tmp_path):
    """Register continuity across a checkpoint restart: run 1 absorbs
    the first half of the stream and stops; run 2 (same checkpoint)
    absorbs the rest.  The final complete-mode table must equal the
    batch registers over the FULL input — possible only if the
    register state recovered, since run 2 never re-reads run 1's
    files."""
    src = str(tmp_path / "drops_r")
    cpdir = str(tmp_path / "cp_r")
    data = messages.select(
        "topic", "partition_id", "msg_offset", "ts_ns"
    ).withColumn(
        "key_s", F.concat_ws(":", "topic", "partition_id", "msg_offset")
    )
    batch_regs = windowed_hll_registers(data, F.col("key_s"))

    def run_once(qname):
        stream = spark.readStream.schema(
            "topic string, partition_id int, msg_offset long,"
            " ts_ns long, key_s string"
        ).parquet(src)
        q = (
            windowed_hll_registers(
                stream, F.col("key_s"), watermark_delay="10 seconds"
            )
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", cpdir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    data.filter(F.col("msg_offset") < 120).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once("hll_r1")
    data.filter(F.col("msg_offset") >= 120).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once("hll_r2")

    got_regs = spark.sql("SELECT * FROM hll_r2")
    assert got_regs.exceptAll(batch_regs).count() == 0
    assert batch_regs.exceptAll(got_regs).count() == 0


def test_streaming_bloom_registers_match_batch(spark, messages, tmp_path):
    """Streamed counting-bloom register table == batch table over the same
    complete input; the membership readout over the streamed registers has
    NO false negatives and an FPR inside the geometry's envelope."""
    from kafka_replicator_spark.functions.sketches import (
        BLOOM_M,
        bloom_membership_from_registers,
        bloom_registers,
    )
    from kafka_replicator_spark.streaming.sketch_stream import (
        windowed_bloom_registers,
    )

    src = str(tmp_path / "bloom_drops")
    data = messages.select("topic", "partition_id", "msg_offset", "ts_ns").withColumn(
        "key_s", F.concat_ws(":", "topic", "partition_id", "msg_offset")
    )
    data.filter(F.col("msg_offset") < 120).coalesce(1).write.mode("append").parquet(src)
    data.filter(F.col("msg_offset") >= 120).coalesce(1).write.mode("append").parquet(src)

    batch_regs = windowed_bloom_registers(data, F.col("key_s"))
    # the batch register builder over the same window grouping must agree —
    # windowed_bloom_registers IS bloom_registers keyed by the window start
    builder_regs = bloom_registers(
        data.withColumn(
            "window_start",
            F.window(
                F.timestamp_micros(F.expr("ts_ns div 1000")), "1 hour"
            ).start,
        ),
        F.col("key_s"),
        ["window_start"],
    )
    assert builder_regs.exceptAll(batch_regs).count() == 0
    assert batch_regs.exceptAll(builder_regs).count() == 0

    stream = (
        spark.readStream.schema(
            "topic string, partition_id int, msg_offset long, ts_ns long, key_s string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_bloom_registers(stream, F.col("key_s"), watermark_delay="10 seconds")
        .writeStream.format("memory")
        .queryName("bloom_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_regs = spark.sql("SELECT * FROM bloom_regs")

    assert got_regs.exceptAll(batch_regs).count() == 0
    assert batch_regs.exceptAll(got_regs).count() == 0

    # state is bounded at m set-bit rows per window
    per = got_regs.groupBy("window_start").count().agg(F.max("count")).first()[0]
    assert per <= BLOOM_M

    # counters account for every (key, hash) incidence
    from kafka_replicator_spark.functions.sketches import BLOOM_K

    assert got_regs.agg(F.sum("n_hits")).first()[0] == data.count() * BLOOM_K

    # membership replay per window: every streamed key must be
    # maybe_present (no false negatives); synthetic absent keys stay
    # mostly absent (the 2048/4 geometry at ~120 keys → FPR ≈ 0.2%)
    wins = data.select(
        F.window(
            F.timestamp_micros(F.expr("ts_ns div 1000")), "1 hour"
        ).start.alias("window_start"),
        F.col("key_s").alias("probe"),
    ).distinct()
    absent = wins.select("window_start").distinct().crossJoin(
        spark.range(200).select(F.concat(F.lit("absent:"), "id").alias("probe"))
    )
    regs = got_regs.select("window_start", "p")
    members = bloom_membership_from_registers(regs, wins, ["window_start"])
    assert members.filter(~F.col("maybe_present")).count() == 0
    fp = bloom_membership_from_registers(regs, absent, ["window_start"])
    n_abs = fp.count()
    n_fp = fp.filter(F.col("maybe_present")).count()
    assert n_abs > 0 and n_fp / n_abs < 0.05


def test_streaming_bloom_registers_survive_restart(spark, messages, tmp_path):
    """Register continuity across a checkpoint restart (the HLL restart
    recipe): run 2 never re-reads run 1's files, so equality with the
    full-input batch table proves the (window, p) counter state
    recovered."""
    from kafka_replicator_spark.streaming.sketch_stream import (
        windowed_bloom_registers,
    )

    src = str(tmp_path / "bloom_drops_r")
    cpdir = str(tmp_path / "bloom_cp_r")
    data = messages.select("topic", "partition_id", "msg_offset", "ts_ns").withColumn(
        "key_s", F.concat_ws(":", "topic", "partition_id", "msg_offset")
    )
    batch_regs = windowed_bloom_registers(data, F.col("key_s"))

    def run_once(qname):
        stream = spark.readStream.schema(
            "topic string, partition_id int, msg_offset long,"
            " ts_ns long, key_s string"
        ).parquet(src)
        q = (
            windowed_bloom_registers(
                stream, F.col("key_s"), watermark_delay="10 seconds"
            )
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", cpdir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    data.filter(F.col("msg_offset") < 120).coalesce(1).write.mode("append").parquet(src)
    run_once("bloom_r1")
    data.filter(F.col("msg_offset") >= 120).coalesce(1).write.mode("append").parquet(src)
    run_once("bloom_r2")

    got_regs = spark.sql("SELECT * FROM bloom_r2")
    assert got_regs.exceptAll(batch_regs).count() == 0
    assert batch_regs.exceptAll(got_regs).count() == 0


def test_streaming_oph_registers_survive_restart(spark, messages, tmp_path):
    """Register continuity across a checkpoint restart for the OPH family
    (HLL and counting-bloom already have this; min is idempotent and
    order-free like max, so the recovered state must reproduce the batch
    registers over the FULL input even though run 2 never re-reads run 1's
    files)."""
    from kafka_replicator_spark.streaming.sketch_stream import windowed_oph_registers

    src = str(tmp_path / "oph_r")
    cpdir = str(tmp_path / "cp_oph_r")
    data = messages.select("topic", "partition_id", "msg_offset", "ts_ns").withColumn(
        "key_s", F.concat_ws(":", "topic", "msg_offset")
    )
    batch_regs = windowed_oph_registers(data, F.col("key_s"), "partition_id")

    def run_once(qname):
        stream = spark.readStream.schema(
            "topic string, partition_id int, msg_offset long, ts_ns long, key_s string"
        ).parquet(src)
        q = (
            windowed_oph_registers(
                stream, F.col("key_s"), "partition_id", watermark_delay="10 seconds"
            )
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", cpdir)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(120)
        if not finished:
            q.stop()  # stop BEFORE asserting so the leak fixture stays quiet
        assert finished, f"{qname}: availableNow drain did not terminate"

    data.filter(F.col("msg_offset") < 120).coalesce(1).write.mode("append").parquet(src)
    run_once("oph_r1")
    data.filter(F.col("msg_offset") >= 120).coalesce(1).write.mode("append").parquet(src)
    run_once("oph_r2")

    got_regs = spark.sql("SELECT * FROM oph_r2")
    assert got_regs.exceptAll(batch_regs).count() == 0
    assert batch_regs.exceptAll(got_regs).count() == 0
