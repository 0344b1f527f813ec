"""Hot-key skew handling and concurrent-writer commit races."""

from pyspark.sql import functions as F

from dbimport_spark.operators.dedup import STRATEGIES, dedup_lww
from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.plans.validate import fold_expected, reconcile
from dbimport_spark.schema import PAYLOAD_COLUMNS
from dbimport_spark.sources.loggen import generate_changes


def test_heavy_skew_converges(spark, tmp_path):
    """50% of 20k events hit 1 hot key (zipf-extreme): every dedup strategy
    and both merge paths must still converge."""
    log = generate_changes(
        spark,
        20_000,
        n_keys=500,
        seed=77,
        hot_key_fraction=0.002,  # 1 hot key
        hot_event_fraction=0.5,
    )
    hot = log.groupBy("doc_id").count().orderBy(F.desc("count")).first()
    assert hot["count"] > 5_000  # skew actually present
    for strategy in ("maxjoin", "salted"):
        table = CDCEngine.create_table(
            str(tmp_path / f"t-{strategy}"), num_buckets=8
        )
        eng = CDCEngine(
            spark, table, dedup_strategy=strategy, broadcast_threshold_rows=1_000
        )
        eng.replay(log, num_batches=3)
        rec = reconcile(table.read(spark), fold_expected(log), PAYLOAD_COLUMNS)
        assert rec["converged"], (strategy, rec)


def test_commit_race_duplicate_window_skipped(spark, tmp_path):
    """Two engines sharing one table apply the same window concurrently:
    the loser of the version race must detect the duplicate and skip."""
    log = generate_changes(spark, 1000, n_keys=50, seed=88)
    root = str(tmp_path / "t")
    table = CDCEngine.create_table(root, num_buckets=4)
    e1 = CDCEngine(spark, table)
    e2 = CDCEngine(spark, table)
    # interleave: e2 snapshots the table (inside apply), e1 commits first.
    # Simulate by committing via e1 mid-way: easiest deterministic variant —
    # e1 applies, then e2 applies the same window against its stale view.
    bs1 = e1.apply_batch(log, 0, 1000)
    assert not bs1.skipped
    bs2 = e2.apply_batch(log, 0, 1000)  # sees updated table → skip via lsn
    assert bs2.skipped

    # true version race: monkeypatch table.commit of a third engine to
    # first let another writer commit, then attempt the stale commit
    from dbimport_spark.lake.table import LakeTable

    log2 = log.withColumn("lsn", F.col("lsn") + 1000)
    e3 = CDCEngine(spark, LakeTable.load(root))
    orig_commit = e3.table.commit
    raced = {"done": False}

    def racing_commit(*args, **kwargs):
        if not raced["done"]:
            raced["done"] = True
            # a competing writer lands the SAME window first
            other = CDCEngine(spark, LakeTable.load(root))
            other.apply_batch(log2, 1000, 2000)
        return orig_commit(*args, **kwargs)

    e3.table.commit = racing_commit
    bs3 = e3.apply_batch(log2, 1000, 2000)
    assert bs3.skipped  # conflict detected, duplicate window dropped
    assert e3.table.last_lsn() == 2000
    rec = reconcile(
        e3.table.read(spark),
        fold_expected(log.unionByName(log2)),
        PAYLOAD_COLUMNS,
    )
    assert rec["converged"], rec


def test_two_process_concurrent_replay_converges(spark, tmp_path):
    """Two OS PROCESSES replay the same log into the same table
    concurrently through the durable sqlite catalog: version races resolve
    to exactly one winner per window (the loser detects the duplicate and
    skips), both processes exit clean, and the table converges to the
    fold with no duplicate application."""
    import json as _json
    import subprocess
    import sys

    log = generate_changes(spark, 4000, n_keys=200, seed=91)
    log_path = str(tmp_path / "clog")
    log.write.parquet(log_path)
    root = str(tmp_path / "ct")
    CDCEngine.create_table(root, num_buckets=4)

    go = tmp_path / "go"
    script = tmp_path / "replayer.py"
    script.write_text(
        "import os, sys, time, json\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from dbimport_spark.session import get_spark\n"
        "from dbimport_spark.lake.catalog import SqliteCatalog\n"
        "from dbimport_spark.lake.table import LakeTable\n"
        "from dbimport_spark.plans.engine import CDCEngine\n"
        "tag = sys.argv[1]\n"
        "spark = get_spark(master='local[4]', shuffle_partitions=4,\n"
        "                  extra_conf={'spark.ui.showConsoleProgress': 'false'})\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"changes = spark.read.parquet({log_path!r})\n"
        f"t = LakeTable.load({root!r}, catalog=SqliteCatalog())\n"
        "eng = CDCEngine(spark, t)\n"
        f"while not os.path.exists({str(go)!r}):\n"
        "    time.sleep(0.01)\n"
        "stats = eng.replay(changes, num_batches=4)\n"
        "print('DONE ' + json.dumps({'tag': tag,\n"
        "      'applied': stats.batches_applied,\n"
        "      'skipped': stats.batches_skipped}))\n"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), tag],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for tag in ("A", "B")
    ]
    import time

    time.sleep(20)  # both JVMs up and spinning on the barrier
    go.write_text("go")
    outs = [p.communicate(timeout=600) for p in procs]
    results = []
    for out, err in outs:
        done = [ln for ln in out.splitlines() if ln.startswith("DONE ")]
        assert done, f"replayer died:\n{out[-2000:]}\n{err[-2000:]}"
        results.append(_json.loads(done[0][len("DONE "):]))

    # every window applied exactly once ACROSS both processes (a loser may
    # also resolve a window as already-committed before attempting it)
    total_applied = sum(r["applied"] for r in results)
    assert 1 <= total_applied <= 4 + 3  # at least one writer made progress
    from dbimport_spark.lake.table import LakeTable

    t = LakeTable.load(root)
    assert t.last_lsn() == 4000
    rec = reconcile(t.read(spark), fold_expected(log), PAYLOAD_COLUMNS)
    assert rec["converged"], rec
