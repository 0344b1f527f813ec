"""Custom stateful streaming operator via applyInPandasWithState.

The engine's exactly-once apply runs through foreachBatch (stream.py); this
module is the OTHER Structured Streaming tool the stack needs: arbitrary
per-key running state across micro-batches, checkpoint-persistent, Arrow-
batched (reference has no analogue — its streaming concepts are realized in
batch; SURVEY.md §2.7 maps them to Structured Streaming).

``running_key_state`` maintains a per-key CDC digest — event count, max
LSN, delete count, last op — and emits the keys touched by each
micro-batch with their updated totals. That is the streaming form of the
per-key lineage/validation aggregates (A1-A3): a downstream monitor can
diff these digests against the table without scanning it.

Scale shape: state lives in the state store keyed by doc_id (hash-
partitioned across executors); each micro-batch shuffles only its own
events by key; the pandas function receives Arrow record batches per key
group — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "events LONG, max_lsn LONG, deletes LONG, last_op STRING"
OUTPUT_SCHEMA = (
    "doc_id STRING, events LONG, max_lsn LONG, deletes LONG, last_op STRING"
)


def _update_digest(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        events, max_lsn, deletes, last_op = state.get
    else:
        events, max_lsn, deletes, last_op = 0, -1, 0, None
    for pdf in pdfs:
        events += len(pdf)
        deletes += int((pdf["op"] == "D").sum())
        # null-lsn (malformed / corrupt-wire) events count toward the
        # digest but carry no ordering evidence: max() over all-NaN is
        # NaN and int(NaN) would kill the whole streaming query — the
        # batch path parks such rows, the digest must not crash on them
        mx = pdf["lsn"].max()
        if pd.isna(mx):
            continue
        batch_max = int(mx)
        # last op = op of the max-lsn event seen so far (LWW order)
        if batch_max > max_lsn:
            max_lsn = batch_max
            last_op = str(pdf.loc[pdf["lsn"].idxmax(), "op"])
    state.update((events, max_lsn, deletes, last_op))
    yield pd.DataFrame(
        [
            {
                "doc_id": key[0],
                "events": events,
                "max_lsn": max_lsn,
                "deletes": deletes,
                "last_op": last_op,
            }
        ]
    )


def running_key_state(stream_df: DataFrame) -> DataFrame:
    """Per-key running CDC digest over a change-event stream; emits the
    updated digest for every key touched by each micro-batch. The stream
    must carry (doc_id, lsn, op) — the update function and output schema
    are fixed to that contract (rename upstream if your key differs)."""
    return (
        stream_df.select("doc_id", "lsn", "op")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _update_digest,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
