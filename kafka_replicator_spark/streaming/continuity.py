"""Streaming offset-continuity monitor (arbitrary stateful processing).

The reference's ingress sanity checks (F6: non-negative offsets, start ≤
end, monotone delivery — pkg/ingress/worker.go:390-412) run per read batch
with the worker's in-memory position as context.  The streaming-native form
is arbitrary stateful processing: per (topic, partition), state holds the
last delivered offset across microbatches; every batch emits a continuity
report (contiguous? gap size? regression?) without any global scan.  State
is one long per partition — bounded regardless of stream length, the
property that matters at 1000 partitions × unbounded retention.

Implemented with ``applyInPandasWithState``.  Spark 4's successor API
(``transformWithStateInPandas``, typed state + timers) is the upgrade
path, but its Python state-server worker needs a working ``protobuf``
runtime, which this environment lacks — the call-site shape is identical
(grouped stream → per-key state + per-batch emission), so swapping is
mechanical.

Batch-shape equivalent (window lag over msg_offset) is oracle-checked as
``r_f6_sanity_offsets``; this processor is its cross-batch streaming form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

#: output schema of the per-batch continuity report
CONTINUITY_SCHEMA = (
    "topic string, partition_id int, batch_lo long, batch_hi long, "
    "n_rows long, n_distinct long, missing_from_last long, "
    "internal_gaps long, regressed boolean"
)


def _continuity_fn(key, pdfs, state):
    offs = pd.concat([pdf["msg_offset"] for pdf in pdfs], ignore_index=True)
    lo, hi = int(offs.min()), int(offs.max())
    n, n_distinct = len(offs), int(offs.nunique())
    last = state.getOption
    expected = int(last[0]) + 1 if last is not None else lo
    missing_from_last = max(0, lo - expected)
    regressed = lo < expected
    internal_gaps = (hi - lo + 1) - n_distinct
    state.update((max(hi, expected - 1),))
    yield pd.DataFrame(
        [
            {
                "topic": str(key[0]),
                "partition_id": int(key[1]),
                "batch_lo": lo,
                "batch_hi": hi,
                "n_rows": n,
                "n_distinct": n_distinct,
                "missing_from_last": missing_from_last,
                "internal_gaps": internal_gaps,
                "regressed": regressed,
            }
        ]
    )


def offset_continuity_stream(messages: DataFrame) -> DataFrame:
    """Attach the continuity monitor to a (streaming) message frame.

    NoTimeout by design: the monitor state must survive idle partitions
    (and ProcessingTimeTimeout never fires under availableNow triggers).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        messages.select("topic", "partition_id", "msg_offset")
        .groupBy("topic", "partition_id")
        .applyInPandasWithState(
            _continuity_fn,
            outputStructType=CONTINUITY_SCHEMA,
            stateStructType="last_offset long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
