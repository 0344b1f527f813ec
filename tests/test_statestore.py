"""Small-state storage seam (lake/statestore.py): the replay checkpoint,
stream segment ledger, and export watermark all ride a pluggable StateStore
— LocalStateStore (default) keeps the historical POSIX layout, and the
MemoryStateStore stub proves the engine never touches the filesystem
behind the seam (the object-store honesty bar from VERDICT r3 #3)."""

import json
import os

import pytest

from dbimport_spark.lake.statestore import (
    LocalStateStore,
    MemoryStateStore,
    ObjectStateStore,
)
from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.plans.export import ParquetExporter
from dbimport_spark.schema import PAYLOAD_COLUMNS
from dbimport_spark.sources.loggen import generate_changes, write_changes_segments
from dbimport_spark.streaming.stream import run_stream, stream_changes
from tests.oracle import as_tuple_set, lww_fold


@pytest.fixture(params=["memory", "object"])
def off_disk_store(request, tmp_path):
    """The two stores that keep engine state OFF the engine's own paths:
    the in-memory stub and the object-store emulation (one local prefix
    dir standing in for an S3 bucket)."""
    if request.param == "memory":
        return MemoryStateStore()
    return ObjectStateStore(str(tmp_path / "objstore"))


def test_store_contracts(tmp_path):
    """All three stores implement the same read/write/append/delete
    semantics."""
    stores = [
        LocalStateStore(),
        MemoryStateStore(),
        ObjectStateStore(str(tmp_path / "objstore")),
    ]
    for store in stores:
        p = str(tmp_path / f"{type(store).__name__}-blob.json")
        assert store.read_text(p) is None
        assert not store.exists(p)
        store.write_text(p, '{"a": 1}')
        store.write_text(p, '{"a": 2}')  # atomic replace
        assert json.loads(store.read_text(p)) == {"a": 2}
        assert store.exists(p)
        store.delete(p)
        store.delete(p)  # idempotent
        assert store.read_text(p) is None

        log = str(tmp_path / f"{type(store).__name__}-log.jsonl")
        assert store.read_lines(log) == []
        store.append_line(log, "one")
        store.append_line(log, "two\n")
        assert store.read_lines(log) == ["one", "two"]


def test_replay_checkpoint_through_memory_store(spark, tmp_path, off_disk_store):
    """Resumable replay with the plan in an off-disk store (memory and
    object-store emulation): resume works, and NO plan file appears at the
    engine's own path."""
    mem = off_disk_store
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    table = CDCEngine.create_table(root, num_buckets=4)
    eng = CDCEngine(spark, table, checkpoint_dir=ckpt, state_store=mem)
    log = generate_changes(spark, 2000, n_keys=100, seed=7)
    eng.replay(log, num_batches=4, stop_after=2)  # die mid-replay
    assert table.last_lsn() < 2000
    assert not os.path.exists(os.path.join(ckpt, "replay_plan.json"))
    assert mem.exists(os.path.join(ckpt, "replay_plan.json"))

    # a restarted driver (same store) resumes the persisted plan
    eng2 = CDCEngine(spark, table, checkpoint_dir=ckpt, state_store=mem)
    stats = eng2.replay(log, num_batches=4)
    assert stats.batches_skipped >= 2
    assert table.last_lsn() == 2000

    # full reload clears the plan through the store, not the filesystem
    eng2.full_reload(log, num_batches=1)
    assert table.last_lsn() == 2000


def test_export_state_through_memory_store(spark, tmp_path, off_disk_store):
    """Incremental export watermark in an off-disk store: second run
    exports zero rows, no _export_state.json lands at the export dir (the
    parquet run dirs of course do)."""
    mem = off_disk_store
    root = str(tmp_path / "t")
    table = CDCEngine.create_table(root, num_buckets=4)
    eng = CDCEngine(spark, table)
    log = generate_changes(spark, 500, n_keys=50, seed=9)
    eng.replay(log, num_batches=1)

    out = str(tmp_path / "out")
    exp = ParquetExporter(table, out, state_store=mem)
    s1 = exp.export(spark, mode="incr")
    assert s1["last_run_rows"] > 0
    s2 = exp.export(spark, mode="incr")
    assert s2["last_run_rows"] == 0
    assert os.path.isdir(s1["last_run_dir"])  # data on disk
    assert not os.path.exists(os.path.join(out, "_export_state.json"))
    assert mem.exists(os.path.join(out, "_export_state.json"))


def test_stream_ledger_through_memory_store(spark, tmp_path, off_disk_store):
    """The per-segment ledger in an off-disk store: stream converges, the
    ledger records land in the store and NOT inside the checkpoint dir."""
    mem = off_disk_store
    log_dir = str(tmp_path / "log")
    changes = generate_changes(spark, 1000, n_keys=50, seed=13)
    write_changes_segments(changes, log_dir, n_segments=3)

    root = str(tmp_path / "t")
    table = CDCEngine.create_table(root, num_buckets=4)
    eng = CDCEngine(spark, table)
    ckpt = str(tmp_path / "sck")
    q = run_stream(
        eng, stream_changes(spark, log_dir), checkpoint_dir=ckpt, state_store=mem
    )
    q.awaitTermination(300)
    assert table.last_lsn() == 1000
    ledger_path = os.path.join(ckpt, "dbimport-segments.jsonl")
    assert not os.path.exists(ledger_path)
    recs = [json.loads(ln) for ln in mem.read_lines(ledger_path)]
    assert len(recs) == 3

    got = as_tuple_set(
        [r.asDict() for r in table.read(spark).collect()], PAYLOAD_COLUMNS
    )
    expected = lww_fold([r.asDict() for r in changes.collect()])
    assert got == as_tuple_set(list(expected.values()), PAYLOAD_COLUMNS)

    # checkpoint-loss restart (fresh checkpoint dir ⇒ fresh ledger path in
    # the same store): full re-delivery is the benign catch-up case — the
    # watermark makes it a no-op and state stays converged
    v = table.current().version
    q2 = run_stream(
        eng,
        stream_changes(spark, log_dir),
        checkpoint_dir=str(tmp_path / "sck2"),
        state_store=mem,
    )
    q2.awaitTermination(300)
    assert table.last_lsn() == 1000
    assert table.current().version == v  # nothing recommitted


def test_object_store_append_order_and_delete(tmp_path):
    """Object-store emulation specifics: many appended records come back
    in append order via the lexicographic LIST (zero-padded seq), and
    delete removes both the blob object and the record prefix."""
    store = ObjectStateStore(str(tmp_path / "obj"))
    log = str(tmp_path / "wm" / "ledger.jsonl")
    for i in range(25):
        store.append_line(log, f"rec-{i}")
    assert store.read_lines(log) == [f"rec-{i}" for i in range(25)]
    # one object per record, zero-padded seq names, under the path prefix
    rec_dir = os.path.join(store._obj(log), "records")
    names = sorted(os.listdir(rec_dir))
    assert len(names) == 25
    assert names[0].startswith("0" * 19) and "-" in names[0]
    store.delete(log)
    assert store.read_lines(log) == []
    assert not store.exists(log)


def test_object_store_list_never_surfaces_inflight_temps(tmp_path):
    """code-review r5: the S3 emulation's LIST must never return a
    half-written local temp file — an S3 PUT is invisible until
    complete. A crash-orphaned .tmp-* object must neither corrupt
    read_lines nor break the next append's sequence computation."""
    from dbimport_spark.lake.statestore import ObjectStateStore

    store = ObjectStateStore(str(tmp_path / "s3"))
    store.append_line("/state/log", '{"n": 1}')
    store.append_line("/state/log", '{"n": 2}')
    rec_dir = tmp_path / "s3" / "state" / "log" / "records"
    # simulate a crash mid-PUT: a torn temp object in the records prefix
    names = sorted(p.name for p in rec_dir.iterdir())
    torn = rec_dir / f"{names[-1]}.tmp-999-140000000"
    torn.write_text('{"n": 3, "truncat')
    assert store.read_lines("/state/log") == ['{"n": 1}', '{"n": 2}']
    store.append_line("/state/log", '{"n": 4}')  # seq parse unaffected
    assert store.read_lines("/state/log") == [
        '{"n": 1}', '{"n": 2}', '{"n": 4}',
    ]
