"""Minimal protobuf wire-format codec for the reference's metadata messages
(X5 — reference pkg/core/messages.proto; encode/decode sites
checkpoint_store.go:257-273, consistent_segment_store.go:413-429).

The reference serializes Checkpoint and SegmentEvent as protobuf onto its
metadata Kafka topics.  For cross-engine interop parity we hand-roll the
wire format (varints + length-delimited fields — public protobuf spec);
no protobuf runtime exists in this container, and the two messages are flat
and tiny, so the full generality of a proto library buys nothing.

Message shapes (messages.proto:37-55):

    Checkpoint   { 1: region (string), 2: topic (string),
                   3: partition (uint32), 4: offset (uint64),
                   5: timestamp_ns (int64) }
    SegmentEvent { 1: event_type (string CREATED|REMOVED),
                   2: region, 3: topic, 4: partition (uint32),
                   5: level (uint32), 6: start_offset, 7: end_offset,
                   8: size_bytes (uint64), 9: event_ts_ns (int64) }

Spark-side use: `encode_checkpoint_udf` / `decode_checkpoint_udf` are
Arrow-batched pandas UDFs for K3/S5 topic interop.  (Field numbering here
is this engine's wire contract; matching the reference's exact .proto tags
is a constant-table change.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- varint

def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement 64-bit, per proto spec
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("malformed varint")


def _write_tag(out: bytearray, field: int, wire_type: int) -> None:
    _write_varint(out, (field << 3) | wire_type)


def _write_str(out: bytearray, field: int, s: str) -> None:
    data = s.encode("utf-8")
    _write_tag(out, field, 2)
    _write_varint(out, len(data))
    out.extend(data)


def _write_uint(out: bytearray, field: int, v: int) -> None:
    _write_tag(out, field, 0)
    _write_varint(out, v)


def _decode_fields(buf: bytes) -> dict[int, int | bytes]:
    pos = 0
    fields: dict[int, int | bytes] = {}
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            fields[field], pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            fields[field] = buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wt}")
    return fields


# ------------------------------------------------------------ Checkpoint

def encode_checkpoint(region: str, topic: str, partition_id: int, msg_offset: int, ts_ns: int) -> bytes:
    out = bytearray()
    _write_str(out, 1, region)
    _write_str(out, 2, topic)
    _write_uint(out, 3, partition_id)
    _write_uint(out, 4, msg_offset)
    _write_uint(out, 5, ts_ns)
    return bytes(out)


def decode_checkpoint(buf: bytes) -> dict:
    f = _decode_fields(bytes(buf))
    return {
        "region": f.get(1, b"").decode("utf-8"),
        "topic": f.get(2, b"").decode("utf-8"),
        "partition_id": int(f.get(3, 0)),
        "msg_offset": int(f.get(4, 0)),
        "ts_ns": int(f.get(5, 0)),
    }


CHECKPOINT_STRUCT = T.StructType(
    [
        T.StructField("region", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("msg_offset", T.LongType()),
        T.StructField("ts_ns", T.LongType()),
    ]
)


@F.pandas_udf(T.BinaryType())
def encode_checkpoint_udf(
    region: pd.Series, topic: pd.Series, partition_id: pd.Series,
    msg_offset: pd.Series, ts_ns: pd.Series,
) -> pd.Series:
    return pd.Series(
        [
            encode_checkpoint(r, t, int(p), int(o), int(ts))
            for r, t, p, o, ts in zip(region, topic, partition_id, msg_offset, ts_ns)
        ]
    )


@F.pandas_udf(CHECKPOINT_STRUCT)
def decode_checkpoint_udf(payload: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([decode_checkpoint(b) for b in payload])


# ---------------------------------------------------------- SegmentEvent

def encode_segment_event(
    event_type: str, region: str, topic: str, partition_id: int, level: int,
    start_offset: int, end_offset: int, size_bytes: int, event_ts_ns: int,
) -> bytes:
    out = bytearray()
    _write_str(out, 1, event_type)
    _write_str(out, 2, region)
    _write_str(out, 3, topic)
    _write_uint(out, 4, partition_id)
    _write_uint(out, 5, level)
    _write_uint(out, 6, start_offset)
    _write_uint(out, 7, end_offset)
    _write_uint(out, 8, size_bytes)
    _write_uint(out, 9, event_ts_ns)
    return bytes(out)


def decode_segment_event(buf: bytes) -> dict:
    f = _decode_fields(bytes(buf))
    return {
        "event_type": f.get(1, b"").decode("utf-8"),
        "region": f.get(2, b"").decode("utf-8"),
        "topic": f.get(3, b"").decode("utf-8"),
        "partition_id": int(f.get(4, 0)),
        "level": int(f.get(5, 0)),
        "start_offset": int(f.get(6, 0)),
        "end_offset": int(f.get(7, 0)),
        "size_bytes": int(f.get(8, 0)),
        "event_ts_ns": int(f.get(9, 0)),
    }
