"""Generic temporal joins: as-of join semantics, and the bucketized range
join vs a naive inequality join."""

from pyspark.sql import functions as F

from kafka_replicator_spark.operators.temporal import asof_join, bucketed_range_join


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [("A", 3, 100.0), ("A", 7, 101.0), ("B", 5, 50.0), ("B", 1, 49.0)],
        schema="sym string, t long, px double",
    )
    quotes = spark.createDataFrame(
        [("A", 2, 99.5), ("A", 6, 100.5), ("B", 4, 49.9), ("C", 1, 1.0)],
        schema="sym string, t long, bid double",
    )
    out = {
        (r["sym"], r["t"]): r["bid"]
        for r in asof_join(
            trades, quotes, on="t", by="sym", right_cols=["bid"]
        ).collect()
    }
    # A@3 -> quote@2; A@7 -> quote@6; B@5 -> quote@4; B@1 -> no quote (dropped)
    assert out == {("A", 3): 99.5, ("A", 7): 100.5, ("B", 5): 49.9}


def test_bucketed_range_join_matches_naive(spark, messages):
    points = messages.select("partition_id", "msg_offset").limit(400)
    intervals = spark.createDataFrame(
        [(i, i * 37, i * 37 + 60) for i in range(12)],
        schema="iv_id int, iv_start long, iv_end long",
    )
    fast = bucketed_range_join(
        points, intervals, "msg_offset", "iv_start", "iv_end", bucket_width=64
    )
    naive = points.join(
        intervals,
        (F.col("msg_offset") >= F.col("iv_start")) & (F.col("msg_offset") <= F.col("iv_end")),
    )
    key = lambda r: (r["partition_id"], r["msg_offset"], r["iv_id"])  # noqa: E731
    assert sorted(map(key, fast.collect())) == sorted(map(key, naive.collect()))
    assert fast.count() > 0
