"""Egress: message stream → parquet segments (reference pkg/egress/).

The reference's egress worker is a per-partition state machine that appends
messages to an open segment and closes it when full (size/count threshold —
worker.go:51-56) or old (age timer — worker.go:139-141).  Re-expressed
declaratively:

  1. *segment assignment* — a column computation tagging each message with
     the segment it belongs to (two flavors below);
  2. *segment write* — one writer task per segment group
     (``applyInPandas``), producing exactly one parquet object named
     ``{start:020d}-{end:020d}`` with footer metadata, via a temp-file →
     atomic-rename two-phase publish (reference two-phase CopyObject commit,
     pkg/stores/s3_segment_store.go:275-298).

Scale notes: assignment is pure column math (codegen); the shuffle that
feeds the writer is partitioned by (partition_id, segment_seq) so segment
files are written fully in parallel, one task each, no driver involvement.
At 100 TB the only knob is segment size (default 100 MiB / 1M messages,
reference pkg/egress/config.go:28-34) which bounds task memory.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_replicator_spark.core.codec import SEGMENT_SUFFIX
from kafka_replicator_spark.core.schema import message_size_col

#: reference defaults, pkg/egress/config.go:28-34
DEFAULT_MAX_SEGMENT_BYTES = 100 * 1024 * 1024
DEFAULT_MAX_SEGMENT_MESSAGES = 1_000_000

#: parquet footer KV metadata keys (reference stamps SegmentMetadata into the
#: footer — pkg/formats/s3_parquet.go:379-397, messages.proto:57-66)
FOOTER_KEYS = (
    "region",
    "topic",
    "partition",
    "level",
    "startOffset",
    "endOffset",
    "messageCount",
    "createdTimestamp",
)


def assign_segments_by_count(df: DataFrame, max_messages: int) -> DataFrame:
    """Tag each message with ``segment_seq = msg_offset // max_messages``.

    Count-only rollover over a dense offset stream — one integer division,
    no window, no shuffle; the SQL-oracle-checkable flavor.
    """
    from kafka_replicator_spark.core.validation import validate_segment_limits

    validate_segment_limits(1, max_messages)
    return df.withColumn(
        "segment_seq", (F.col("msg_offset") / F.lit(max_messages)).cast("long")
    )


def assign_segments_greedy(
    df: DataFrame,
    max_bytes: int = DEFAULT_MAX_SEGMENT_BYTES,
    max_messages: int = DEFAULT_MAX_SEGMENT_MESSAGES,
) -> DataFrame:
    """Exact reference rollover semantics: a segment closes when, after an
    append, ``size >= max_bytes`` OR ``count == max_messages``
    (reference pkg/egress/worker.go:51-56).

    Greedy reset-on-threshold is inherently sequential per partition, but
    only the *boundaries* need the sequential walk — so the pandas stage
    sees just (msg_offset, msg_size) per partition and returns the
    segment-start offsets (metadata-scale), and the data-scale assignment
    is a broadcast join + array scan that never leaves the JVM.  Moving the
    full rows through Arrow (the naive applyInPandas shape) costs 2× the
    message bytes in serialization; this shape costs ~16 bytes/row.
    Inside the walk it is O(#segments · log n) numpy (cumsum +
    searchsorted), not a Python row loop.
    """
    from kafka_replicator_spark.core.validation import validate_segment_limits

    validate_segment_limits(max_bytes, max_messages)
    if "msg_size" not in df.columns:
        df = df.withColumn(
            "msg_size",
            message_size_col(headers="headers" if "headers" in df.columns else None),
        )

    def boundaries(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("msg_offset", kind="mergesort").reset_index(drop=True)
        offs = pdf["msg_offset"].to_numpy(dtype=np.int64)
        csum = np.cumsum(pdf["msg_size"].to_numpy(dtype=np.int64))
        n = len(pdf)
        starts: list[int] = []
        start = 0
        base = 0
        while start < n:
            # close at the first row where post-append size >= max_bytes,
            # or after max_messages rows, whichever comes first
            cut_size = int(np.searchsorted(csum, base + max_bytes, side="left"))
            cut = min(cut_size, start + max_messages - 1, n - 1)
            starts.append(int(offs[start]))
            base = int(csum[cut])
            start = cut + 1
        return pd.DataFrame(
            [
                {
                    "topic": pdf["topic"].iloc[0],
                    "partition_id": pdf["partition_id"].iloc[0],
                    "seg_starts": starts,
                }
            ]
        )

    bounds = (
        df.select("topic", "partition_id", "msg_offset", "msg_size")
        .groupBy("topic", "partition_id")
        .applyInPandas(
            boundaries,
            schema="topic string, partition_id int, seg_starts array<long>",
        )
    )
    tagged = df.join(F.broadcast(bounds), ["topic", "partition_id"]).withColumn(
        "segment_seq", _segment_seq_expr()
    )
    return tagged.drop("seg_starts")


#: fixed binary-search depth — covers 2^21 segment boundaries per
#: partition-batch, far above any real plan (the plan itself is bounded by
#: max_count), at 21 codegen steps per row
_BSEARCH_STEPS = 21

#: below this boundary count a straight scan beats the fold's constant
#: factor (measured ~3× at K=2 on 2M rows); above it the fold's O(log K)
#: wins and caps the worst case
_LINEAR_SCAN_MAX = 32


def _segment_seq_expr() -> "F.Column":
    """Greatest ``seg_starts`` entry ≤ ``msg_offset``: linear scan for small
    boundary arrays (the steady-state case — a partition-batch rolls over a
    handful of segments), fixed-depth binary search beyond
    ``_LINEAR_SCAN_MAX`` so a pathological batch with thousands of
    boundaries stays O(log K) per row instead of O(K)."""
    linear = (
        F.size(F.filter("seg_starts", lambda b: b <= F.col("msg_offset"))) - 1
    ).cast("long")
    return F.when(
        F.size("seg_starts") <= _LINEAR_SCAN_MAX, linear
    ).otherwise(_bsearch_segment_seq())


def _bsearch_segment_seq() -> "F.Column":
    """Index of the greatest ``seg_starts`` entry ≤ ``msg_offset`` via a
    fixed-depth binary-search fold over the sorted boundary array.

    Pure column expression (whole-stage codegen): O(log K) comparisons per
    row instead of the O(K) per-row array scan a higher-order ``filter``
    would cost — at a 100× batch with thousands of boundaries, the linear
    scan degrades quadratically while this stays flat.  ``seg_starts`` is
    sorted ascending by construction and every offset is ≥ its partition's
    first boundary, so the greatest-≤ entry always exists.
    """
    half = "CAST((acc.lo + acc.hi + 1) div 2 AS INT)"
    return F.expr(
        f"""
        aggregate(
          sequence(1, {_BSEARCH_STEPS}),
          struct(CAST(1 AS INT) AS lo, CAST(size(seg_starts) AS INT) AS hi),
          (acc, step) -> IF(acc.lo >= acc.hi, acc,
            IF(element_at(seg_starts, {half}) <= msg_offset,
               struct({half} AS lo, acc.hi AS hi),
               struct(acc.lo AS lo, CAST({half} - 1 AS INT) AS hi))),
          acc -> CAST(acc.lo - 1 AS BIGINT))
        """
    )


def segment_bounds(tagged: DataFrame, region: str, level: int = 0) -> DataFrame:
    """Per-segment metadata from a segment-tagged message DataFrame — the
    reference's running (count, size, startOffset, endOffset) accumulation
    (A1/A5, pkg/egress/worker.go:174-180) as one partial-aggregable groupBy.
    """
    return (
        tagged.groupBy("topic", "partition_id", "segment_seq")
        .agg(
            F.min("msg_offset").alias("start_offset"),
            F.max("msg_offset").alias("end_offset"),
            F.count(F.lit(1)).alias("message_count"),
            F.sum("msg_size").alias("size_bytes"),
        )
        .select(
            F.lit(region).alias("region"),
            "topic",
            "partition_id",
            F.lit(level).cast("int").alias("level"),
            "segment_seq",
            "start_offset",
            "end_offset",
            "message_count",
            "size_bytes",
        )
    )


def _write_one_segment(
    pdf: pd.DataFrame,
    root: str,
    region: str,
    level: int | str,
    data_cols: list[str],
    require_dense: bool = False,
) -> pd.DataFrame:
    """Write one segment group to its final path (executor-side).

    Two-phase publish: write to ``{root}/temp/{uuid}`` then atomically
    rename to the final key (reference s3_segment_store.go:135-149,275-312).
    On object stores without rename, swap for a conditional CopyObject —
    the call-site contract (temp key, final key, footer) is the same.

    ``require_dense`` performs the compaction gap check inline (count ==
    end-start+1, reference compactor.go:219-221) — checked here, on data
    already in hand, instead of a separate full pass; raising before the
    rename means nothing is published for the failing partition.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pdf.sort_values("msg_offset", kind="mergesort").reset_index(drop=True)
    if isinstance(level, str):
        level = int(pdf[level].iloc[0])  # per-group level column (compaction)
    topic = str(pdf["topic"].iloc[0])
    partition_id = int(pdf["partition_id"].iloc[0])
    start = int(pdf["msg_offset"].iloc[0])
    end = int(pdf["msg_offset"].iloc[-1])
    count = len(pdf)
    if require_dense and count != end - start + 1:
        raise ValueError(
            f"missing message range (offset gap) in {topic}/{partition_id}"
            f"[{start}..{end}] n={count}"
        )
    created_ns = pd.Timestamp.utcnow().value

    final_dir = os.path.join(root, region, topic, str(partition_id), str(level))
    os.makedirs(final_dir, exist_ok=True)
    tmp_dir = os.path.join(root, "temp")
    os.makedirs(tmp_dir, exist_ok=True)
    tmp_path = os.path.join(tmp_dir, uuid.uuid4().hex)
    final_path = os.path.join(final_dir, f"{start:020d}-{end:020d}{SEGMENT_SUFFIX}")

    # explicit Arrow types — inference over object columns (binary, list of
    # header structs) is unstable on empty/all-null groups
    arrow_types = {
        "msg_offset": pa.int64(),
        "msg_key": pa.binary(),
        "payload": pa.binary(),
        "ts_ns": pa.int64(),
        "headers": pa.list_(
            pa.struct([("key", pa.string()), ("value", pa.binary())])
        ),
    }
    table = pa.Table.from_pandas(
        pdf[data_cols],
        schema=pa.schema([(c, arrow_types[c]) for c in data_cols]),
        preserve_index=False,
    )
    footer = {
        "region": region,
        "topic": topic,
        "partition": str(partition_id),
        "level": str(level),
        "startOffset": str(start),
        "endOffset": str(end),
        "messageCount": str(count),
        "createdTimestamp": str(created_ns),
    }
    table = table.replace_schema_metadata(
        {**(table.schema.metadata or {}), **{k.encode(): v.encode() for k, v in footer.items()}}
    )
    pq.write_table(table, tmp_path, compression="snappy")
    os.replace(tmp_path, final_path)  # atomic publish

    return pd.DataFrame(
        [
            {
                "region": region,
                "topic": topic,
                "partition_id": partition_id,
                "level": level,
                "start_offset": start,
                "end_offset": end,
                "message_count": count,
                "size_bytes": int(os.path.getsize(final_path)),
                "path": final_path,
            }
        ]
    )


def _arrow_segment_types():
    import pyarrow as pa

    return {
        "msg_offset": pa.int64(),
        "msg_key": pa.binary(),
        "payload": pa.binary(),
        "ts_ns": pa.int64(),
        "headers": pa.list_(pa.struct([("key", pa.string()), ("value", pa.binary())])),
    }


def _arrow_result_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("region", pa.string()),
            ("topic", pa.string()),
            ("partition_id", pa.int32()),
            ("level", pa.int32()),
            ("start_offset", pa.int64()),
            ("end_offset", pa.int64()),
            ("message_count", pa.int64()),
            ("size_bytes", pa.int64()),
            ("path", pa.string()),
        ]
    )


def _publish_segment_table(
    out,
    root: str,
    region: str,
    topic: str,
    partition_id: int,
    level: int,
    require_dense: bool = False,
):
    """Publish a sorted, canonical-schema Arrow table of message rows as one
    segment object (footer KV + temp-file → atomic-rename two-phase commit)
    and return its metadata as a 1-row Arrow table.  Shared by the grouped
    writer and the shuffle-free compaction merge.
    """
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    offs = out.column("msg_offset")
    start = int(offs[0].as_py())
    end = int(offs[-1].as_py())
    count = out.num_rows
    if require_dense and count != end - start + 1:
        raise ValueError(
            f"missing message range (offset gap) in {topic}/{partition_id}"
            f"[{start}..{end}] n={count}"
        )
    created_ns = _time.time_ns()

    final_dir = os.path.join(root, region, topic, str(partition_id), str(level))
    os.makedirs(final_dir, exist_ok=True)
    tmp_dir = os.path.join(root, "temp")
    os.makedirs(tmp_dir, exist_ok=True)
    tmp_path = os.path.join(tmp_dir, uuid.uuid4().hex)
    final_path = os.path.join(final_dir, f"{start:020d}-{end:020d}{SEGMENT_SUFFIX}")

    footer = {
        "region": region,
        "topic": topic,
        "partition": str(partition_id),
        "level": str(level),
        "startOffset": str(start),
        "endOffset": str(end),
        "messageCount": str(count),
        "createdTimestamp": str(created_ns),
    }
    out = out.replace_schema_metadata(
        {**(out.schema.metadata or {}), **{k.encode(): v.encode() for k, v in footer.items()}}
    )
    pq.write_table(out, tmp_path, compression="snappy")
    os.replace(tmp_path, final_path)  # atomic publish

    return pa.Table.from_pylist(
        [
            {
                "region": region,
                "topic": topic,
                "partition_id": partition_id,
                "level": int(level),
                "start_offset": start,
                "end_offset": end,
                "message_count": count,
                "size_bytes": int(os.path.getsize(final_path)),
                "path": final_path,
            }
        ],
        schema=_arrow_result_schema(),
    )


def _write_one_segment_arrow(
    table,
    root: str,
    region: str,
    level: int | str,
    data_cols: list[str],
    require_dense: bool = False,
):
    """Arrow-native flavor of :func:`_write_one_segment` for
    ``applyInArrow`` — the group arrives as a ``pyarrow.Table`` and is
    written without ever materializing pandas objects.  For binary payloads
    and the repeated-headers column the pandas round-trip is pure
    conversion overhead (python object boxing of every key/payload/header);
    staying in Arrow cuts the writer to sort + cast + write.
    """
    import pyarrow as pa

    # r13 opt: the group usually arrives offset-sorted (shuffle readers
    # drain map outputs in map order, and upstream data is offset-ordered
    # per partition), making the full-table sort gather a wasted copy —
    # one vectorized strictly-increasing check (~0.2 ms per 250k rows vs
    # ~56 ms CPU for the sort) skips it; any tie or inversion falls back.
    po = table.column("msg_offset").to_numpy()
    if len(po) > 1 and not (po[1:] > po[:-1]).all():
        table = table.sort_by([("msg_offset", "ascending")])
    if isinstance(level, str):
        level = int(table.column(level)[0].as_py())
    topic = str(table.column("topic")[0].as_py())
    partition_id = int(table.column("partition_id")[0].as_py())
    arrow_types = _arrow_segment_types()
    out = table.select(data_cols)
    canonical = pa.schema([(c, arrow_types[c]) for c in data_cols])
    if out.schema != canonical:  # Spark may hand over large_binary etc.
        out = out.cast(canonical)
    return _publish_segment_table(
        out, root=root, region=region, topic=topic, partition_id=partition_id,
        level=int(level), require_dense=require_dense,
    )


#: applyInPandas output schema for the writer
_WRITE_RESULT_SCHEMA = (
    "region string, topic string, partition_id int, level int, "
    "start_offset long, end_offset long, message_count long, "
    "size_bytes long, path string"
)

#: columns persisted inside a segment file (at-rest message schema; binary
#: key/payload + repeated headers per reference s3_parquet.go:99-116)
SEGMENT_DATA_COLS = ["msg_offset", "msg_key", "payload", "ts_ns", "headers"]


def write_segments(
    tagged: DataFrame,
    root: str,
    region: str,
    level: int | str = 0,
    require_dense: bool = False,
) -> DataFrame:
    """Write one parquet segment per (topic, partition_id, segment_seq)
    group; returns the written-segment metadata DataFrame (K1).

    ``level`` may be an int (all segments at that level — egress) or the
    name of a column carrying a per-group output level (compaction).

    The groupBy shuffles each segment's rows to one task — segments write
    concurrently across the cluster.  Returned metadata comes back from the
    executors, so nothing is listed or re-read.
    """
    data = tagged.withColumn("msg_key", F.col("msg_key").cast("binary")).withColumn(
        "payload", F.col("payload").cast("binary")
    )
    cols = [c for c in SEGMENT_DATA_COLS if c in data.columns]
    extra = [level] if isinstance(level, str) else []
    grouped = data.select(
        "topic", "partition_id", "segment_seq", *cols, *extra
    ).groupBy("topic", "partition_id", "segment_seq")

    if hasattr(grouped, "applyInArrow"):  # Spark 4: no pandas round-trip

        def afn(table):
            return _write_one_segment_arrow(
                table, root=root, region=region, level=level, data_cols=cols,
                require_dense=require_dense,
            )

        return grouped.applyInArrow(afn, schema=_WRITE_RESULT_SCHEMA)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _write_one_segment(
            pdf, root=root, region=region, level=level, data_cols=cols,
            require_dense=require_dense,
        )

    return grouped.applyInPandas(fn, schema=_WRITE_RESULT_SCHEMA)


def write_segments_native(
    tagged: DataFrame,
    root: str,
    region: str,
    level: int | str = 0,
    require_dense: bool = False,
) -> DataFrame:
    """JVM-native fast path of :func:`write_segments`: the data never leaves
    Tungsten — Spark's parquet writer emits one file per (topic, partition,
    segment) directory (rows pre-sorted within each task), and a metadata-
    scale rename pass derives the final ``%020d-%020d`` names from the
    files' parquet column statistics (no data re-read).

    Trade-off vs the default writer: no custom footer KV metadata (segment
    identity lives in the path, counts/extents in the parquet stats) — the
    sidecar-manifest flavor SURVEY §1.1 allows.  Same layout, same two-phase
    atomicity (stage dir → rename).
    """
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    level_col = F.col(level) if isinstance(level, str) else F.lit(int(level))
    data = (
        tagged.withColumn("msg_key", F.col("msg_key").cast("binary"))
        .withColumn("payload", F.col("payload").cast("binary"))
        .withColumn("__level", level_col.cast("int"))
    )
    cols = [c for c in SEGMENT_DATA_COLS if c in data.columns]
    stage = tempfile.mkdtemp(prefix="krs_stage_", dir=root)
    (
        data.select("topic", "partition_id", "segment_seq", "__level", *cols)
        .repartition("topic", "partition_id", "segment_seq")
        .sortWithinPartitions("topic", "partition_id", "segment_seq", "msg_offset")
        .write.partitionBy("topic", "partition_id", "segment_seq", "__level")
        .parquet(stage, mode="overwrite")
    )

    # rename pass (metadata-scale): stats give the offset extent per file
    out_rows = []
    for dirpath, _dn, filenames in os.walk(stage):
        parts = dict(
            kv.split("=", 1) for kv in dirpath[len(stage):].strip("/").split("/") if "=" in kv
        )
        for fn in filenames:
            if not fn.endswith(".parquet"):
                continue
            src = os.path.join(dirpath, fn)
            meta = pq.ParquetFile(src).metadata
            idx = next(
                i for i in range(meta.num_columns)
                if meta.row_group(0).column(i).path_in_schema == "msg_offset"
            )
            start = min(meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups))
            end = max(meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups))
            count = meta.num_rows
            lvl = int(parts["__level"])
            if require_dense and count != end - start + 1:
                shutil.rmtree(stage, ignore_errors=True)
                raise ValueError(
                    f"missing message range (offset gap) in {parts['topic']}/"
                    f"{parts['partition_id']}[{start}..{end}] n={count}"
                )
            final_dir = os.path.join(
                root, region, parts["topic"], parts["partition_id"], str(lvl)
            )
            os.makedirs(final_dir, exist_ok=True)
            final = os.path.join(final_dir, f"{start:020d}-{end:020d}{SEGMENT_SUFFIX}")
            os.replace(src, final)
            out_rows.append(
                (
                    region, parts["topic"], int(parts["partition_id"]), lvl,
                    int(start), int(end), int(count), int(os.path.getsize(final)), final,
                )
            )
    shutil.rmtree(stage, ignore_errors=True)
    return tagged.sparkSession.createDataFrame(out_rows, schema=_WRITE_RESULT_SCHEMA)
