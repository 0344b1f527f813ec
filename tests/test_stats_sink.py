"""Pluggable statistics sink (VERDICT r4 #5; reference per-stage stats
JSON to Kafka/REST, import_stage.py:592-826, docs/statistics.rst): one
record per batch, pushed after the commit, best-effort — the commit
lineage stays the durable record and telemetry outages never fail a
replay."""

import logging

from dbimport_spark.lake.statestore import MemoryStateStore
from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.plans.lineage import lineage_history
from dbimport_spark.plans.stats_sink import (
    CallableStatsSink,
    JsonLinesStatsSink,
    StatsSink,
)
from dbimport_spark.sources.loggen import generate_changes


def test_emitted_records_match_committed_lineage(spark, tmp_path):
    """Multi-batch replay: the sink receives one record per applied batch
    whose (lo, hi, events, version) agree with the lineage stamped in the
    commits themselves."""
    mem = MemoryStateStore()
    sink = JsonLinesStatsSink(str(tmp_path / "stats.jsonl"), store=mem)
    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=4)
    eng = CDCEngine(spark, table, stats_sink=sink)
    log = generate_changes(spark, 3000, n_keys=150, seed=51)
    eng.replay(log, num_batches=3)

    recs = [r for r in sink.records() if not r["skipped"]]
    assert len(recs) == 3
    # fold the committed lineage per snapshot version: per-batch event
    # totals and lsn windows must agree with what the sink was told
    by_version = {}
    for rec in lineage_history(table):
        if rec.get("bucket") is None:
            continue
        v = rec["version"]
        agg = by_version.setdefault(
            v, {"events": 0, "first": None, "last": None}
        )
        agg["events"] += rec["events"]
        agg["first"] = (
            rec["first_lsn"]
            if agg["first"] is None
            else min(agg["first"], rec["first_lsn"])
        )
        agg["last"] = max(agg["last"] or -1, rec["last_lsn"])
    for r in recs:
        lin = by_version[r["version"]]
        assert r["events"] == lin["events"]
        assert r["lo"] < lin["first"] <= lin["last"] <= r["hi"]
        assert r["op"] == "apply_batch"
        assert r["table"] == table.root
    # watermarks chain: batch i's hi is batch i+1's lo
    windows = [(r["lo"], r["hi"]) for r in recs]
    assert windows == sorted(windows)
    for (_, hi1), (lo2, _) in zip(windows, windows[1:]):
        assert hi1 == lo2

    # an idempotent re-apply emits a skipped record (telemetry sees the
    # no-op too, like the reference's per-stage posts)
    from pyspark.sql import functions as F

    eng.apply_batch(log.filter(F.col("lsn") > 2000), 2000, 3000)
    assert sink.records()[-1]["skipped"] is True


def test_callable_sink_receives_kafka_shaped_records(spark, tmp_path):
    got: list[dict] = []
    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=2)
    eng = CDCEngine(spark, table, stats_sink=CallableStatsSink(got.append))
    log = generate_changes(spark, 500, n_keys=40, seed=53)
    eng.replay(log, num_batches=2)
    applied = [r for r in got if not r["skipped"]]
    assert len(applied) == 2
    assert all(
        {"op", "table", "version", "ts", "lo", "hi", "events"} <= set(r)
        for r in applied
    )
    assert sum(r["events"] for r in applied) == 500


def test_sink_failure_never_fails_the_batch(spark, tmp_path, caplog):
    """A sink that raises is logged and the replay still converges — the
    reference's senders catch-and-log the same way."""

    class Exploding(StatsSink):
        def emit(self, record):
            raise RuntimeError("kafka down")

    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=2)
    eng = CDCEngine(spark, table, stats_sink=Exploding())
    log = generate_changes(spark, 400, n_keys=30, seed=57)
    with caplog.at_level(logging.WARNING, logger="dbimport_spark.plans.stats_sink"):
        stats = eng.replay(log, num_batches=2)
    assert stats.batches_applied == 2
    assert table.last_lsn() == 400
    assert any("stats sink" in m for m in caplog.messages)
