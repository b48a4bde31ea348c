"""Skew/co-location machinery: salted results equal plain results; bucketed
joins read without a shuffle Exchange."""

from pyspark.sql import functions as F

from kafka_replicator_spark.operators.skew import salted_agg, salted_join, write_bucketed
from kafka_replicator_spark.plans.explain import count_exchanges


def test_salted_agg_matches_plain(spark, messages):
    plain = {
        (r["event_type"]): (r["n"], r["s"])
        for r in messages.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("msg_size").alias("s"))
        .collect()
    }
    salted = {
        (r["event_type"]): (r["n"], r["s"])
        for r in salted_agg(
            messages,
            ["event_type"],
            [("msg_size", "count", "n"), ("msg_size", "sum", "s")],
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, messages):
    dim = messages.select("partition_id").distinct().withColumn(
        "pname", F.concat(F.lit("p"), F.col("partition_id"))
    )
    plain = messages.join(dim, "partition_id").groupBy("pname").count()
    salted = salted_join(messages, dim, "partition_id", n_salts=4).groupBy("pname").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_shuffle(spark, messages):
    segs = messages.groupBy("topic", "partition_id").agg(
        F.max("msg_offset").alias("hi")
    )
    cps = messages.groupBy("topic", "partition_id").agg(
        F.min("msg_offset").alias("lo")
    )
    write_bucketed(segs, "bk_segs", ["partition_id"], n_buckets=8)
    write_bucketed(cps, "bk_cps", ["partition_id"], n_buckets=8)
    a = spark.table("bk_segs")
    b = spark.table("bk_cps")
    joined = a.join(b, "partition_id")
    # co-located buckets: the join itself needs no shuffle Exchange
    assert count_exchanges(joined) == 0
    assert joined.count() == segs.count()
