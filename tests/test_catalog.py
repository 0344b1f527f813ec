"""Pluggable commit arbitration (lake/catalog.py): the one piece of the
format that changes between POSIX (O_EXCL exclusive create) and an object
store (catalog compare-and-swap — the reference leans on the Hive/Iceberg
catalog for this, import_operations.py:1117-1146). A lost race must always
surface as CommitConflict with ZERO metadata from the loser visible."""

import json
import os

import pytest
from pyspark.sql import types as T

from dbimport_spark.lake.catalog import CASCatalog, FileCatalog
from dbimport_spark.lake.table import CommitConflict, DataFile, LakeTable

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.StringType()), T.StructField("v", T.IntegerType())]
)


def _snapshot_files(root):
    meta = os.path.join(root, "metadata")
    return sorted(n for n in os.listdir(meta) if n.endswith(".json"))


@pytest.mark.parametrize("catalog_cls", [FileCatalog, CASCatalog])
def test_lost_race_is_conflict_with_no_partial_state(tmp_path, catalog_cls):
    """Two writers race the same version: exactly one wins, the loser gets
    CommitConflict, and the committed metadata is exactly the winner's."""
    root = str(tmp_path / "t")
    cat = catalog_cls()
    table = LakeTable.create(root, SCHEMA, num_buckets=4, catalog=cat)

    # both writers plan against v0; writer A commits first
    a = LakeTable(root, catalog=cat)
    b = LakeTable(root, catalog=cat)
    va = a.current().version
    vb = b.current().version
    assert va == vb == 0
    a.commit([], set(), properties={"writer": "A"}, expected_version=va)

    before = _snapshot_files(root)
    with pytest.raises(CommitConflict):
        b.commit([], set(), properties={"writer": "B"}, expected_version=vb)
    # no partial state: same metadata files as before the losing attempt,
    # and v1 is fully the winner's
    assert _snapshot_files(root) == before
    assert table.current().properties["writer"] == "A"
    with open(os.path.join(root, "metadata", "v1.json")) as fh:
        assert json.load(fh)["properties"]["writer"] == "A"
    # no stray tmp files left behind by the loser
    assert not [n for n in os.listdir(os.path.join(root, "metadata")) if ".tmp" in n]


@pytest.mark.parametrize("catalog_cls", [FileCatalog, CASCatalog])
def test_race_detected_at_commit_even_without_expected_version(tmp_path, catalog_cls):
    """Even when the caller skips optimistic expected_version, the catalog
    itself must refuse the duplicate version number."""
    root = str(tmp_path / "t2")
    cat = catalog_cls()
    LakeTable.create(root, SCHEMA, num_buckets=4, catalog=cat)
    a = LakeTable(root, catalog=cat)
    b = LakeTable(root, catalog=cat)
    sa, sb = a.current(), b.current()  # both see v0 → both build v1
    assert sa.version == sb.version == 0
    a.commit([], set(), properties={"writer": "A"})
    # b's commit() re-reads current() and would build v2 — drive the
    # low-level path instead: a stale writer publishing v1 directly
    import uuid

    from dbimport_spark.lake.table import Snapshot

    stale = Snapshot(
        version=1,
        snapshot_id=uuid.uuid4().hex,
        parent_snapshot_id=sb.snapshot_id,
        schema=sb.schema,
        num_buckets=sb.num_buckets,
        bucket_column=sb.bucket_column,
        files=[],
        properties={"writer": "B"},
        lineage=[],
    )
    with pytest.raises(CommitConflict):
        b._write_snapshot(stale)
    assert a.current().properties["writer"] == "A"


def test_cas_catalog_initializes_pointer_from_disk(tmp_path):
    """A CAS catalog attached to a pre-existing table (e.g. process restart)
    picks up the on-disk version, so the next commit succeeds and a stale
    one conflicts."""
    root = str(tmp_path / "t3")
    t = LakeTable.create(root, SCHEMA, num_buckets=4)  # file catalog
    t.commit([], set(), properties={"n": "1"})

    fresh = LakeTable(root, catalog=CASCatalog())
    fresh.commit([], set(), properties={"n": "2"})
    assert fresh.current().version == 2
    with pytest.raises(CommitConflict):
        fresh.catalog.commit_version(
            os.path.join(root, "metadata"), 2, {"stale": True}
        )


def test_engine_replay_through_cas_catalog(spark, tmp_path):
    """The full CDC engine runs unchanged over a CAS-arbitrated table —
    replay, idempotent re-apply, convergence."""
    from dbimport_spark.plans.engine import CDCEngine
    from dbimport_spark.plans.validate import fold_expected, reconcile
    from dbimport_spark.schema import PAYLOAD_COLUMNS
    from dbimport_spark.sources.loggen import generate_changes

    cat = CASCatalog()
    root = str(tmp_path / "cas-tbl")
    CDCEngine.create_table(root, num_buckets=4)
    table = LakeTable.load(root, catalog=cat)
    eng = CDCEngine(spark, table, checkpoint_dir=str(tmp_path / "cas-ckpt"))
    log = generate_changes(spark, 2000, n_keys=100, seed=11)
    stats = eng.replay(log, num_batches=2)
    assert stats.batches_applied == 2
    # idempotent re-apply under the same catalog
    again = eng.replay(log, num_batches=2)
    assert again.batches_applied == 0
    rec = reconcile(table.read(spark), fold_expected(log), PAYLOAD_COLUMNS)
    assert rec["converged"]


def test_file_and_cas_agree_on_layout(tmp_path):
    """Both catalogs produce byte-compatible metadata: a table committed
    through CAS reads fine through a plain (file-catalog) handle."""
    root = str(tmp_path / "t4")
    cat = CASCatalog()
    t = LakeTable.create(root, SCHEMA, num_buckets=4, catalog=cat)
    t.commit(
        [DataFile("data/x/f.parquet", 0, 10, 100)], set(), properties={"k": "v"}
    )
    plain = LakeTable.load(root)  # default FileCatalog
    snap = plain.current()
    assert snap.version == 1
    assert snap.properties["k"] == "v"
    assert snap.files[0].rows == 10
