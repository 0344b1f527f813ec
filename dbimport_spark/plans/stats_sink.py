"""Pluggable per-batch statistics emission.

The reference ships per-stage statistics JSON to Kafka and/or a REST
endpoint after every import stage (import_stage.py:592-826, the
``post_*_data`` senders documented in docs/statistics.rst). The engine
records the same facts durably in commit lineage; this module adds the
*push* surface: a ``StatsSink`` receives one JSON-able record per applied
(or skipped) batch, emitted right after the batch's commit.

Two implementations cover the deployment shapes:

- ``JsonLinesStatsSink`` — appends records through the small-state seam
  (``lake/statestore.py``), so the stream of stats lands wherever the
  deployment keeps state (local file, object-store record-per-object);
- ``CallableStatsSink`` — wraps any ``fn(record) -> None`` (a Kafka
  producer ``send``, an HTTP POST, a metrics client), the shape the
  reference's Kafka/REST senders take.

Emission is best-effort by design, exactly like the reference's
(import_stage.py catches and logs send failures): a stats outage must
never fail a replay that already committed — failures are logged and the
batch result stands. The durable record of what happened is the commit
lineage; the sink is telemetry.
"""

from __future__ import annotations

import json
import logging

log = logging.getLogger(__name__)


class StatsSink:
    def emit(self, record: dict) -> None:
        raise NotImplementedError


class JsonLinesStatsSink(StatsSink):
    """One JSON line per record, appended through a StateStore."""

    def __init__(self, path: str, store=None):
        from dbimport_spark.lake.statestore import DEFAULT_STORE

        self.path = path
        self.store = store or DEFAULT_STORE

    def emit(self, record: dict) -> None:
        self.store.append_line(self.path, json.dumps(record, sort_keys=True))

    def records(self) -> list[dict]:
        return [json.loads(ln) for ln in self.store.read_lines(self.path)]


class CallableStatsSink(StatsSink):
    """Adapter for Kafka-/REST-shaped consumers: any callable taking the
    record dict (e.g. ``lambda r: producer.send(topic, r)``)."""

    def __init__(self, fn):
        self.fn = fn

    def emit(self, record: dict) -> None:
        self.fn(record)


def emit_batch_stats(sink: StatsSink | None, record: dict) -> None:
    """Best-effort emit: a sink failure is logged, never raised — the
    batch already committed; telemetry must not roll it back."""
    if sink is None:
        return
    try:
        sink.emit(record)
    except Exception as exc:
        log.warning(
            "stats sink %s failed (batch record dropped from telemetry; "
            "the commit lineage still has it): %s: %s",
            type(sink).__name__,
            type(exc).__name__,
            exc,
        )
