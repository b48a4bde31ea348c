"""End-to-end streaming chain across a checkpoint restart (VERDICT r08 #6):

    intake (curate_stream: watermarked dedup -> quality gate -> PII scrub)
        -> windowed CMS register aggregation

as ONE multi-stateful-operator streaming query, driven by two availableNow
runs against a single checkpoint.  Per-stage tests exist elsewhere; this
pins the COMPOSITION: the second run redelivers every run-1 document, so
the final register table equals the batch chain only if

  * the dedup seen-keys state recovered (CMS counters are exact sums —
    re-emitted duplicates would inflate them; the dedup watermark is 10
    days, so suppression cannot come from late-row filtering or state
    eviction, only from recovered state), and
  * the windowed aggregation state recovered (windows mix run-1 and run-2
    contributions; event times are CONTENT-keyed, so a window's counters
    combine documents from both runs).

Event times derive from the content hash, not the doc id, so the dedup
winner's identity cannot move a document between windows — the batch chain
over the distinct input is an exact oracle.
"""

import pyspark.sql.functions as F

from kafka_replicator_spark.functions.curation import gopher_quality
from kafka_replicator_spark.functions.hashing import portable_hash60
from kafka_replicator_spark.sources.tables import load_table
from kafka_replicator_spark.streaming.curation_stream import curate_stream
from kafka_replicator_spark.streaming.sketch_stream import windowed_cms_registers

#: fixed HOUR-ALIGNED epoch anchor (2023-11-14T23:00:00Z) — content minutes
#: spread over exactly 4 hourly windows from here.  The flush document lands
#: 10 days + 5 hours later: the ONE shared watermark (multi-stateful queries
#: forbid redefining it) has a 10-day delay, so the flush drives it to
#: base+5h — past every real window's end, forcing append-mode emission —
#: while every redelivered duplicate stays inside the horizon (suppression
#: can only come from recovered dedup state, never late-row filtering).
_BASE_US = 1_700_002_800_000_000
_FLUSH_US = _BASE_US + (10 * 24 + 5) * 3600 * 1_000_000


def _with_event_time(docs):
    minute = F.pmod(portable_hash60(F.md5("text")), F.lit(240))
    return docs.select(
        "doc_id",
        "source",
        "lang",
        "text",
        F.timestamp_micros(
            F.lit(_BASE_US) + minute.cast("long") * F.lit(60_000_000)
        ).alias("event_time"),
    )


def _chain(frame):
    curated = curate_stream(frame, watermark="10 days")
    return windowed_cms_registers(
        curated,
        F.col("content_hash"),
        window_duration="1 hour",
        event_time_col="event_time",
    )


def _flush_text(spark, docs):
    """A synthetic document that passes the quality gate (so it reaches the
    downstream watermark node and advances it past every real window) and
    is unique content (so the dedup emits it)."""
    passing = [
        r["text"]
        for r in gopher_quality(docs)
        .filter(F.col("passes") == 1)
        .join(docs, "doc_id")
        .select("text")
        .limit(5)
        .collect()
    ]
    for t in passing:
        cand = t + " flushqz"
        row = gopher_quality(
            spark.createDataFrame([(999_999, cand)], "doc_id long, text string")
        ).head()
        if row["passes"] == 1:
            return cand
    raise AssertionError("no quality-passing flush candidate found")


def test_e2e_curation_chain_survives_restart(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    ).limit(400).cache()
    timed = _with_event_time(docs)

    flush = spark.createDataFrame(
        [(999_999, "s0", "en", _flush_text(spark, docs))],
        "doc_id long, source string, lang string, text string",
    ).select(
        "doc_id", "source", "lang", "text",
        F.timestamp_micros(F.lit(_FLUSH_US)).alias("event_time"),
    )

    # batch oracle over the distinct logical input (originals + flush);
    # redeliveries dedup away, so they don't appear here
    batch = _chain(timed.unionByName(flush))
    flush_win_cut = F.timestamp_micros(F.lit(_FLUSH_US - 3600 * 1_000_000))
    expected = {
        tuple(r)
        for r in batch.filter(F.col("window_start") < flush_win_cut).collect()
    }
    n_windows = len({t[0] for t in expected})
    assert n_windows == 4, f"fixture should span 4 hourly windows, got {n_windows}"

    indir = str(tmp_path / "in")
    outdir, cpdir = str(tmp_path / "out"), str(tmp_path / "cp")
    schema = "doc_id long, source string, lang string, text string, event_time timestamp"
    progresses = []

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", True)
            .parquet(indir)
        )
        q = (
            _chain(stream)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", cpdir)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(240)
        if not finished:
            q.stop()  # stop BEFORE asserting, or the leak fixture double-fails
        assert finished, "availableNow drain did not terminate"
        if q.lastProgress:
            progresses.append(q.lastProgress)

    half = timed.filter(F.col("doc_id") % 2 == 0)
    rest = timed.filter(F.col("doc_id") % 2 == 1)
    half.coalesce(1).write.parquet(indir + "/b0")
    run_once()
    # run 2: EVERY run-1 row redelivered verbatim + the fresh half + flush
    half.coalesce(1).write.parquet(indir + "/b1")
    rest.unionByName(flush).coalesce(1).write.parquet(indir + "/b2")
    run_once()

    got_rows = spark.read.schema(
        "window_start timestamp, i int, b long, counter long"
    ).parquet(outdir).collect()
    got = {tuple(r) for r in got_rows}
    # exact register equality: every window emitted exactly once across the
    # two runs, counters equal the batch chain — inflation (lost dedup
    # state) or a missing run-1 contribution (lost agg state) both break it
    assert got == expected

    # bounded state: the dedup store holds at most one row per distinct
    # content hash, the agg store at most D-rows x W-buckets per window
    assert progresses, "no streaming progress reported by either run"
    n_distinct = timed.select(F.md5("text")).distinct().count() + 1
    ops = {o["operatorName"]: o for o in progresses[-1]["stateOperators"]}
    assert ops, "no stateOperators reported"
    dedup_ops = [o for n, o in ops.items() if "dedupe" in n.lower() or "duplicate" in n.lower()]
    # the windowed aggregation reports as stateStoreSave
    agg_ops = [o for n, o in ops.items() if "statestoresave" in n.lower() or "aggregate" in n.lower()]
    assert dedup_ops and agg_ops, f"unexpected operator names: {list(ops)}"
    assert dedup_ops[0]["numRowsTotal"] <= n_distinct
    from kafka_replicator_spark.functions.sketches import _CMS_PARAMS, CMS_W

    assert agg_ops[0]["numRowsTotal"] <= (n_windows + 1) * len(_CMS_PARAMS) * CMS_W
    docs.unpersist()
