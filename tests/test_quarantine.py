"""Dead-letter quarantine: malformed change events (null merge key,
unknown op, null lsn) are diverted to parquet — or refused loudly — so
one bad row can never silently corrupt a merge or kill a long replay.
Detection rides the existing single-pass stats agg (pseudo-bucket -1):
the clean path pays no extra scan."""

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.schema import CHANGE_SCHEMA

TS = dt.datetime(2024, 1, 1)

# CHANGE_SCHEMA with nullable lsn/op/doc_id so malformed rows are even
# constructible (the declared log schema marks them non-null)
LAX_SCHEMA = T.StructType(
    [
        T.StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA.fields
    ]
)

GOOD = [
    (1, "I", "k1", [1, 2], 2, "web", TS),
    (2, "I", "k2", [3], 1, "web", TS),
    (3, "U", "k1", [9], 1, "web", TS),
]
BAD = [
    (4, "I", None, [5], 1, "web", TS),       # null merge key
    (5, "X", "k3", [6], 1, "web", TS),       # unknown op
    (None, "I", "k4", [7], 1, "web", TS),    # null lsn
    (6, None, None, None, None, None, TS),   # several reasons at once
]


def _log(spark, rows):
    return spark.createDataFrame(rows, LAX_SCHEMA)


def test_refuses_loudly_without_quarantine_dir(spark, tmp_path):
    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=4)
    eng = CDCEngine(spark, table)
    v0 = table.current().version
    with pytest.raises(ValueError, match="malformed"):
        eng.apply_batch(_log(spark, GOOD + BAD), 0, 10)
    # refusal is all-or-nothing: no commit, no watermark movement
    assert table.current().version == v0
    assert table.read(spark).count() == 0


def test_quarantine_diverts_and_applies_good_rows(spark, tmp_path):
    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=4)
    qdir = str(tmp_path / "q")
    eng = CDCEngine(spark, table, quarantine_dir=qdir)
    bs = eng.apply_batch(_log(spark, GOOD + BAD), 0, 10)
    assert bs.quarantined == len(BAD)
    assert bs.events == len(GOOD)

    got = {r["doc_id"]: r["tokens"] for r in table.read(spark).collect()}
    assert got == {"k1": [9], "k2": [3]}  # LWW over the good rows only

    q = spark.read.parquet(os.path.join(qdir, "batch-0-10")).collect()
    assert len(q) == len(BAD)
    reasons = {(r["lsn"], r["dl_reason"]) for r in q}
    assert (4, "null_merge_key") in reasons
    assert (5, "unknown_op") in reasons
    assert (None, "null_lsn") in reasons
    assert (6, "null_merge_key,unknown_op") in reasons

    # lineage carries the quarantine record alongside per-bucket rows
    lin = table.current().lineage
    assert any(rec.get("quarantined") == len(BAD) for rec in lin)


def test_all_bad_batch_still_advances_watermark(spark, tmp_path):
    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=4)
    qdir = str(tmp_path / "q")
    eng = CDCEngine(spark, table, quarantine_dir=qdir)
    bs = eng.apply_batch(_log(spark, BAD), 0, 10)
    assert bs.quarantined == len(BAD)
    assert bs.events == 0 and bs.mode == "empty"
    assert table.last_lsn() == 10  # window consumed, replay can proceed
    assert table.read(spark).count() == 0
    assert any(
        rec.get("quarantined") == len(BAD) for rec in table.current().lineage
    )


def test_resume_overwrite_is_idempotent(spark, tmp_path):
    """A replay killed after the quarantine write but before the commit
    re-runs the window: the per-window overwrite leaves exactly one copy."""
    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=4)
    qdir = str(tmp_path / "q")
    eng = CDCEngine(spark, table, quarantine_dir=qdir)
    log = _log(spark, GOOD + BAD)
    eng.apply_batch(log, 0, 10)
    # simulated crash-replay of the same window: skipped upstream, but a
    # raw re-apply against a rolled-back view must also not duplicate
    bs2 = eng.apply_batch(log, 0, 10)
    assert bs2.skipped  # watermark already past
    q = spark.read.parquet(os.path.join(qdir, "batch-0-10"))
    assert q.count() == len(BAD)


def test_clean_batch_writes_nothing(spark, tmp_path):
    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=4)
    qdir = str(tmp_path / "q")
    eng = CDCEngine(spark, table, quarantine_dir=qdir)
    bs = eng.apply_batch(_log(spark, GOOD), 0, 10)
    assert bs.quarantined == 0
    assert not os.path.exists(qdir)
    assert not any("quarantined" in rec for rec in table.current().lineage)


def test_replay_accumulates_quarantined(spark, tmp_path):
    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=4)
    qdir = str(tmp_path / "q")
    eng = CDCEngine(
        spark, table, checkpoint_dir=str(tmp_path / "ckpt"), quarantine_dir=qdir
    )
    stats = eng.replay(_log(spark, GOOD + BAD[:2]), num_batches=2)
    assert stats.events_applied == len(GOOD)
    assert stats.events_quarantined == 2
