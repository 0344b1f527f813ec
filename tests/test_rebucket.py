"""Partition evolution: online bucket-count change (lake/maintenance.rebucket).

The Iceberg REPLACE-PARTITION-FIELD analogue, eager: one atomic
rewrite-only commit re-homes every live row under the new modulus. State
is byte-preserved (audit columns, tombstones), old snapshots stay
readable under their own bucket count, subsequent merges prune against
the new layout, and the change feed emits the rebucket window as EMPTY
from metadata alone — batch via the rewrite_only fast path, streaming
via zero planned tasks, crossing windows via gcd co-location groups.
"""

import pytest
from pyspark.sql import functions as F

from dbimport_spark.lake.cdf import rewrite_only_window, table_changes
from dbimport_spark.lake.maintenance import rebucket
from dbimport_spark.lake.table import LakeTable
from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.schema import PAYLOAD_COLUMNS
from dbimport_spark.sources.loggen import generate_changes
from dbimport_spark.streaming.cdf_source import diff_bucket, plan_window


def _full_rows(spark, table, version=None):
    """Every column of every row (audit columns included) as a multiset."""
    df = table.read(spark, version=version)
    out = []
    for r in df.collect():
        d = r.asDict()
        if d.get("tokens") is not None:
            d["tokens"] = tuple(d["tokens"])
        out.append(tuple(sorted(d.items(), key=lambda kv: kv[0])))
    return sorted(out, key=repr)


def _replayed(spark, tmp_path, n=3000, keys=150, buckets=8, **table_kw):
    table = CDCEngine.create_table(
        str(tmp_path / "t"), num_buckets=buckets, **table_kw
    )
    eng = CDCEngine(spark, table, checkpoint_dir=str(tmp_path / "ckpt"))
    eng.replay(generate_changes(spark, n, n_keys=keys, seed=77), num_batches=2)
    return table, eng


def test_rebucket_preserves_state_and_updates_layout(spark, tmp_path):
    table, _ = _replayed(spark, tmp_path, buckets=8)
    before = _full_rows(spark, table)
    v_pre = table.current().version
    old_paths = {f.path for f in table.current().files}

    out = rebucket(spark, table, 16)
    assert out["rebucketed"] and out["to_buckets"] == 16
    assert out["rows"] == len(before)

    snap = table.current()
    assert snap.version == v_pre + 1
    assert snap.num_buckets == 16
    # every file is new, and bucket ids live in the new modulus
    assert not ({f.path for f in snap.files} & old_paths)
    assert all(0 <= f.bucket < 16 for f in snap.files)
    # content byte-preserved, audit columns included
    assert _full_rows(spark, table) == before
    # rows physically live where the NEW bucket function says they do
    for b in (0, 7, 13):
        got = table.read(spark, buckets=[b]).select("doc_id").collect()
        for r in got:
            expected_bucket = spark.range(1).select(
                F.pmod(F.xxhash64(F.lit(r["doc_id"])), F.lit(16)).alias("b")
            ).collect()[0]["b"]
            assert expected_bucket == b
    # time travel: the pre-rebucket snapshot still reads under ITS layout
    assert _full_rows(spark, table, version=v_pre) == before
    assert table.snapshot(v_pre).num_buckets == 8
    # boundary marker is not inherited by the next commit
    assert snap.properties["rewrite_only"] == "true"


def test_rebucket_noop_and_commit_guard(spark, tmp_path):
    table, _ = _replayed(spark, tmp_path, n=500, keys=50, buckets=4)
    v = table.current().version
    out = rebucket(spark, table, 4)
    assert not out["rebucketed"]
    assert table.current().version == v
    # changing the modulus while keeping old-modulus files must refuse
    with pytest.raises(ValueError, match="rebucket commit must replace"):
        table.commit([], replaced_buckets=set(), new_num_buckets=8)


def test_merge_after_rebucket_uses_new_layout(spark, tmp_path):
    from tests.oracle import as_tuple_set, lww_fold

    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=4)
    eng = CDCEngine(spark, table, checkpoint_dir=str(tmp_path / "ckpt"))
    log = generate_changes(spark, 4000, n_keys=200, seed=9)
    eng.replay(log, num_batches=2, stop_after=1)
    rebucket(spark, table, 16)
    # the SAME engine object continues the replay over the new layout
    eng.replay(log, num_batches=2)

    snap = table.current()
    assert snap.num_buckets == 16
    # post-rebucket merge lineage is bucketed under the new modulus
    buckets = [r["bucket"] for r in snap.lineage if "bucket" in r]
    assert buckets and all(0 <= b < 16 for b in buckets)

    got = as_tuple_set(
        [r.asDict() for r in table.read(spark).select(*PAYLOAD_COLUMNS).collect()],
        list(PAYLOAD_COLUMNS),
    )
    want = as_tuple_set(
        list(lww_fold([r.asDict() for r in log.collect()]).values()),
        list(PAYLOAD_COLUMNS),
    )
    assert got == want


def test_cdf_rebucket_window_is_empty_and_scan_free(spark, tmp_path):
    table, eng = _replayed(spark, tmp_path, buckets=8)
    v_pre = table.current().version
    rebucket(spark, table, 16)
    v_reb = table.current().version

    assert rewrite_only_window(table, table.snapshot(v_pre), table.snapshot(v_reb))
    cdf = table_changes(spark, table, v_pre, v_reb)
    assert cdf.inputFiles() == []  # metadata-only: not one byte read
    assert cdf.count() == 0

    # ...and the marker does NOT leak onto later windows: a real change
    # after the rebucket is emitted in full
    late = generate_changes(
        spark, 200, n_keys=30, seed=5, first_lsn=table.last_lsn() + 1
    )
    eng.replay(late, num_batches=1)
    v_post = table.current().version
    assert not rewrite_only_window(
        table, table.snapshot(v_reb), table.snapshot(v_post)
    )
    assert table_changes(spark, table, v_reb, v_post).count() > 0


def test_stream_plan_across_rebucket(spark, tmp_path):
    table, eng = _replayed(spark, tmp_path, buckets=8)
    v_pre = table.current().version
    rebucket(spark, table, 16)
    # pure rebucket window: zero planned tasks
    assert plan_window(table, v_pre, table.current().version) == []

    # crossing window (8 -> 16 buckets, real changes after): gcd grouping
    # still co-locates each key's two sides, so the per-bucket executor
    # diff equals the batch (key-join) diff
    late = generate_changes(
        spark, 600, n_keys=80, seed=21, first_lsn=table.last_lsn() + 1
    )
    eng.replay(late, num_batches=1)
    v_post = table.current().version

    parts = plan_window(table, v_pre, v_post)
    assert parts and len(parts) <= 8  # gcd(8, 16) co-location groups
    got = []
    for meta in parts:
        it = diff_bucket(meta)
        if it is not None:
            for batch in it:
                got.extend(batch.to_pylist())
    want = [r.asDict() for r in table_changes(spark, table, v_pre, v_post).collect()]

    def canon(rows):
        out = set()
        for r in rows:
            d = dict(r)
            toks = d.get("tokens")
            d["tokens"] = tuple(toks) if toks is not None else None
            out.add(tuple(sorted(d.items(), key=lambda kv: kv[0])))
        return out

    assert canon(got) == canon(want)


def test_cdf_compaction_window_is_scan_free(spark, tmp_path):
    """Compaction commits now carry the same rewrite-only marker: a
    compact-only window costs the change feed zero bytes and the stream
    zero tasks (previously it scanned the rewritten buckets to net zero)."""
    from dbimport_spark.lake.maintenance import compact

    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=4)
    # at-scale broadcast behavior (no output repartition) appends files
    # per commit, so the buckets actually fragment
    eng = CDCEngine(
        spark,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        broadcast_threshold_rows=10**9,
        repartition_output_bytes=0,
    )
    eng.replay(generate_changes(spark, 2000, n_keys=80, seed=13), num_batches=4)
    v_pre = table.current().version
    before = _full_rows(spark, table)

    out = compact(spark, table, max_files_per_bucket=1)
    assert out["compacted_buckets"] > 0
    v_post = table.current().version
    assert _full_rows(spark, table) == before  # content-preserving, as pinned

    cdf = table_changes(spark, table, v_pre, v_post)
    assert cdf.inputFiles() == []
    assert cdf.count() == 0
    assert plan_window(table, v_pre, v_post) == []


def test_auto_rebucket_policy(spark, tmp_path):
    from dbimport_spark.lake.maintenance import auto_rebucket

    table, _ = _replayed(spark, tmp_path, n=1500, keys=100, buckets=4)
    live = sum(f.bytes for f in table.current().files)
    assert live > 0

    # comfortably under target: metadata-only no-op
    out = auto_rebucket(spark, table, target_bytes_per_bucket=live)
    assert not out["rebucketed"] and "within target" in out["reason"]
    assert table.current().num_buckets == 4

    # tiny target with a cap: doubles to the cap, reports staying over
    out = auto_rebucket(spark, table, target_bytes_per_bucket=1, max_buckets=16)
    assert out["rebucketed"] and out["to_buckets"] == 16
    assert out["to_buckets"] % out["from_buckets"] == 0  # stream-friendly
    assert out.get("capped") is True  # no-silent-caps
    # at the cap: refuses further growth, says why
    out = auto_rebucket(spark, table, target_bytes_per_bucket=1, max_buckets=16)
    assert not out["rebucketed"] and "max_buckets" in out["reason"]


def test_fsck_rebucket_invariants(spark, tmp_path):
    import json
    import os

    from dbimport_spark.lake.fsck import check_table

    table, _ = _replayed(spark, tmp_path, n=800, keys=60, buckets=4)
    v_pre = table.current().version
    rebucket(spark, table, 8)
    assert check_table(table) == []

    meta = os.path.join(table.root, "metadata", f"v{v_pre + 1}.json")
    doc = json.load(open(meta))
    # tamper 1: drop the marker — consumers would scan needlessly (warn)
    doc["properties"].pop("rewrite_only")
    # tamper 2: keep a parent file under the old modulus (error)
    parent = json.load(
        open(os.path.join(table.root, "metadata", f"v{v_pre}.json"))
    )
    doc["files"].append(parent["files"][0])
    json.dump(doc, open(meta, "w"))

    findings = check_table(LakeTable.load(table.root))
    assert any(
        f["level"] == "error" and f["check"] == "rebucket" for f in findings
    ), findings
    assert any(
        f["level"] == "warn" and f["check"] == "rebucket" for f in findings
    ), findings


def test_rebucket_soft_delete_preserves_tombstones(spark, tmp_path):
    table = CDCEngine.create_table(
        str(tmp_path / "t"), num_buckets=4, soft_delete=True
    )
    eng = CDCEngine(spark, table, checkpoint_dir=str(tmp_path / "ckpt"))
    eng.replay(
        generate_changes(spark, 2000, n_keys=100, seed=3, p_insert=0.5, p_update=0.2),
        num_batches=2,
    )
    before = _full_rows(spark, table)
    dead_before = (
        table.read(spark).filter(F.col("dl_delete_ts").isNotNull()).count()
    )
    assert dead_before > 0  # the rewrite actually carries tombstones

    rebucket(spark, table, 8)
    assert _full_rows(spark, table) == before
    assert (
        table.read(spark).filter(F.col("dl_delete_ts").isNotNull()).count()
        == dead_before
    )
