"""Steady-state tailing: repeated replay() calls with one checkpoint dir
must pick up new log growth after a completed plan (re-plan the tail)."""

from pyspark.sql import functions as F

from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.plans.validate import fold_expected, reconcile
from dbimport_spark.schema import PAYLOAD_COLUMNS
from dbimport_spark.sources.loggen import generate_changes


def test_replay_resumes_after_log_growth(spark, tmp_path):
    full = generate_changes(spark, 3000, n_keys=150, seed=41)
    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=8)
    eng = CDCEngine(spark, table, checkpoint_dir=str(tmp_path / "ck"))

    # tail call 1: only the first 1000 events exist yet
    s1 = eng.replay(full.filter(F.col("lsn") <= 1000), num_batches=2)
    assert s1.batches_applied == 2 and table.last_lsn() == 1000

    # tail call 2: same checkpoint dir, log has grown
    s2 = eng.replay(full.filter(F.col("lsn") <= 2200), num_batches=2)
    assert s2.batches_applied == 2 and table.last_lsn() == 2200

    # tail call 3: no growth → nothing applied, no new commits
    v = table.current().version
    s3 = eng.replay(full.filter(F.col("lsn") <= 2200), num_batches=2)
    assert s3.batches_applied == 0 and table.current().version == v

    # tail call 4: the rest
    eng.replay(full, num_batches=3)
    rec = reconcile(table.read(spark), fold_expected(full), PAYLOAD_COLUMNS)
    assert rec["converged"], rec


def test_all_null_commit_ts(spark, tmp_path):
    log = generate_changes(spark, 200, n_keys=20, seed=43).withColumn(
        "commit_ts", F.lit(None).cast("timestamp")
    )
    table = CDCEngine.create_table(str(tmp_path / "t2"), num_buckets=4)
    eng = CDCEngine(spark, table)
    eng.replay(log, num_batches=1)  # must not crash on max() over nulls
    rec = reconcile(table.read(spark), fold_expected(log), PAYLOAD_COLUMNS)
    assert rec["converged"], rec
