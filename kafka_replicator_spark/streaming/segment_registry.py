"""Per-partition segment registry — a transformWithState operator keeping
cross-batch bookkeeping with MAP and LIST state.

Reference parity: the consistent segment store tracks known segments per
(topic, partition) and reconciles new listings against that memory
(reference pkg/stores/consistent_segment_store.go:81-170 — the in-memory
``segments`` map keyed by start offset, appended per listing round).  This
operator is its Structured Streaming restatement on the transformWithState
engine:

* **MapState** ``segments``: segment_seq → end_offset, the per-partition
  registry surviving across microbatches (storage-backed, not an
  in-memory map).
* **ListState** ``rounds``: one entry per microbatch recording how many
  segments that batch touched — the listing-round audit trail.

Per batch and key it emits the reconciled registry summary: tracked
segment count, the maximum end offset, the number of NEW segments this
batch introduced, and the rounds-so-far count.  Alongside the value-state
event store (streaming/event_store.py) this drives the remaining
map/list surfaces of the state-server protocol end-to-end — getValue /
updateValue / containsKey / keys iteration, appendValue / get — which is
exactly the protocol slice the vendored protoshim must encode correctly
for the JVM to parse.

Requires Spark ≥ 4.0, the RocksDB state store provider, and
``google.protobuf`` (the vendored protoshim suffices).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: grouping key: one registry per (topic, partition)
REG_KEY = ("topic", "partition_id")

INPUT_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("segment_seq", LongType()),
        StructField("end_offset", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("n_tracked", LongType()),
        StructField("max_end_offset", LongType()),
        StructField("n_new_this_batch", LongType()),
        StructField("n_rounds", LongType()),
    ]
)

_SEQ_SCHEMA = StructType([StructField("segment_seq", LongType())])
_END_SCHEMA = StructType([StructField("end_offset", LongType())])
_ROUND_SCHEMA = StructType([StructField("n_touched", LongType())])


def segment_registry_stream(segments: DataFrame) -> DataFrame:
    """segments: streaming DataFrame with INPUT_SCHEMA columns.  Returns
    one row per (key, microbatch) summarizing the reconciled registry."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RegistryProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._segments = handle.getMapState("segments", _SEQ_SCHEMA, _END_SCHEMA)
            self._rounds = handle.getListState("rounds", _ROUND_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n_new = 0
            n_touched = 0
            for pdf in rows:
                for seq, end in zip(pdf["segment_seq"], pdf["end_offset"]):
                    seq_t = (int(seq),)
                    n_touched += 1
                    if self._segments.containsKey(seq_t):
                        (cur,) = self._segments.getValue(seq_t)
                        if int(end) > int(cur):  # monotonic end-offset rule
                            self._segments.updateValue(seq_t, (int(end),))
                    else:
                        self._segments.updateValue(seq_t, (int(end),))
                        n_new += 1
            self._rounds.appendValue((n_touched,))
            n_tracked = 0
            max_end = -1
            for seq_t in self._segments.keys():
                (end,) = self._segments.getValue(seq_t)
                n_tracked += 1
                if int(end) > max_end:
                    max_end = int(end)
            n_rounds = sum(1 for _ in self._rounds.get())
            yield pd.DataFrame(
                [
                    {
                        "topic": key[0],
                        "partition_id": key[1],
                        "n_tracked": n_tracked,
                        "max_end_offset": max_end,
                        "n_new_this_batch": n_new,
                        "n_rounds": n_rounds,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return segments.groupBy(*REG_KEY).transformWithStateInPandas(
        statefulProcessor=_RegistryProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
