"""Incrementally-maintained aggregate views (plans/matview.py): the view
folds the source's change feed into count/sum totals without rescanning
the base table, and must equal a direct groupBy of the source's live
rows after every sync (the reference's custom-aggregate validation
shape, import_config.py:2257-2284 — run the aggregate both ways,
compare)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.plans.matview import (
    AggSpec,
    create_view,
    sync_view,
    verify_view,
)
from dbimport_spark.schema import CHANGE_SCHEMA
from dbimport_spark.sources.loggen import generate_changes

TS = dt.datetime(2024, 1, 1)
SPEC = AggSpec(group_cols=["source"], sum_cols=["n_tok"])


def _log(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _pair(spark, tmp_path):
    src_t = CDCEngine.create_table(str(tmp_path / "src"), num_buckets=8)
    src = CDCEngine(spark, src_t, checkpoint_dir=str(tmp_path / "ckpt"))
    view_t = create_view(str(tmp_path / "view"), src_t, SPEC, num_buckets=4)
    view = CDCEngine(spark, view_t)
    return src, view


def _totals(spark, view_t):
    return {
        r["source"]: (r["n_rows"], r["sum_n_tok"])
        for r in view_t.read(spark).collect()
    }


def test_bootstrap_equals_direct_groupby(spark, tmp_path):
    src, view = _pair(spark, tmp_path)
    src.replay(generate_changes(spark, 3000, n_keys=200, seed=31), num_batches=2)
    bs = sync_view(spark, src.table, view, SPEC)
    assert not bs.skipped
    assert verify_view(spark, src.table, view.table, SPEC)["converged"]
    # idempotent: nothing new -> skipped, watermark = source version
    assert sync_view(spark, src.table, view, SPEC).skipped
    assert view.table.last_lsn() == src.table.current().version


def test_incremental_insert_update_delete(spark, tmp_path):
    src, view = _pair(spark, tmp_path)
    # n_tok is engine-normalized to size(tokens) on apply, so the token
    # arrays carry the summed quantity
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS),
                     (2, "I", "k2", [2] * 20, 20, "a", TS),
                     (3, "I", "k3", [3] * 5, 5, "b", TS)]), 0, 3,
    )
    sync_view(spark, src.table, view, SPEC)
    assert _totals(spark, view.table) == {"a": (2, 30), "b": (1, 5)}

    # update within group (sum moves), update across groups (row migrates),
    # delete collapsing a group to zero (group row disappears)
    src.apply_batch(
        _log(spark, [(4, "U", "k1", [1] * 15, 15, "a", TS),  # a: 30 -> 35
                     (5, "U", "k3", [3] * 5, 5, "a", TS),    # b -> a migration
                     (6, "D", "k2", None, None, None, TS)]), 3, 6,
    )
    bs = sync_view(spark, src.table, view, SPEC)
    assert not bs.skipped
    assert _totals(spark, view.table) == {"a": (2, 20)}
    assert verify_view(spark, src.table, view.table, SPEC)["converged"]


def test_update_not_touching_aggregates_is_noop(spark, tmp_path):
    src, view = _pair(spark, tmp_path)
    src.apply_batch(_log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS)]), 0, 1)
    sync_view(spark, src.table, view, SPEC)
    v_before = view.table.current().version
    # token VALUES change but neither the group nor n_tok (same length)
    # does: the delta nets to zero and no group is rewritten — the sync
    # still advances the view's watermark (empty batch commits are atomic)
    src.apply_batch(_log(spark, [(2, "U", "k1", [9] * 10, 10, "a", TS)]), 1, 2)
    bs = sync_view(spark, src.table, view, SPEC)
    assert not bs.skipped and bs.events == 0
    assert view.table.current().version == v_before + 1  # watermark-only
    assert view.table.last_lsn() == src.table.current().version
    assert _totals(spark, view.table) == {"a": (1, 10)}


def test_resync_of_committed_window_is_skipped(spark, tmp_path):
    src, view = _pair(spark, tmp_path)
    src.apply_batch(_log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS)]), 0, 1)
    sync_view(spark, src.table, view, SPEC)
    before = _totals(spark, view.table)
    # crash-redelivery shape: the same window applied again must not
    # double-count (watermark gate, not delta arithmetic, protects it)
    assert sync_view(spark, src.table, view, SPEC).skipped
    assert _totals(spark, view.table) == before


def test_gap_refuses_then_full_rebuild(spark, tmp_path):
    src, view = _pair(spark, tmp_path)
    src.apply_batch(_log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS)]), 0, 1)
    sync_view(spark, src.table, view, SPEC)
    src.apply_batch(_log(spark, [(2, "I", "k2", [2] * 7, 7, "b", TS),
                                 (3, "D", "k1", None, None, None, TS)]), 1, 3)
    src.table.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        sync_view(spark, src.table, view, SPEC)
    # no-silent-caps: the opt-in full rebuild reports its scan size
    from tests.test_mirror import _caplog_records

    with _caplog_records("dbimport_spark.plans.matview") as recs:
        bs = sync_view(spark, src.table, view, SPEC, on_gap="full")
    assert any("full rebuild will scan" in r.getMessage() for r in recs)
    assert not bs.skipped
    assert _totals(spark, view.table) == {"b": (1, 7)}
    assert verify_view(spark, src.table, view.table, SPEC)["converged"]


def test_composite_groups_and_null_sums(spark, tmp_path):
    spec = AggSpec(group_cols=["source"], sum_cols=["n_tok"])
    src_t = CDCEngine.create_table(str(tmp_path / "s2"), num_buckets=4)
    src = CDCEngine(spark, src_t)
    view_t = create_view(str(tmp_path / "v2"), src_t, spec, num_buckets=2)
    view = CDCEngine(spark, view_t)
    # null tokens => engine-normalized null n_tok, which contributes 0 to
    # the sum (documented convention: the invertible COALESCE(sum, 0)
    # form) but still counts the row
    src.apply_batch(
        _log(spark, [(1, "I", "k1", None, None, "a", TS),
                     (2, "I", "k2", [2] * 4, 4, "a", TS)]), 0, 2,
    )
    sync_view(spark, src_t, view, spec)
    assert _totals(spark, view_t) == {"a": (2, 4)}
    src.apply_batch(_log(spark, [(3, "D", "k2", None, None, None, TS)]), 2, 3)
    sync_view(spark, src_t, view, spec)
    assert _totals(spark, view_t) == {"a": (1, 0)}
    assert verify_view(spark, src_t, view_t, spec)["converged"]


def test_random_log_converges_per_window(spark, tmp_path):
    """Property-style: replay a generated log in 3 windows, sync after
    each; the view must equal the direct groupBy at every step."""
    src, view = _pair(spark, tmp_path)
    log = generate_changes(spark, 4000, n_keys=150, seed=77)
    for hi in (1300, 2600, 4000):
        src.replay(log.filter(F.col("lsn") <= hi), num_batches=1)
        sync_view(spark, src.table, view, SPEC)
        assert verify_view(spark, src.table, view.table, SPEC)["converged"]


def test_sync_reads_only_touched_view_buckets(spark, tmp_path):
    """Scale shape: the current-totals read is bucket-pruned to the
    delta's groups — a sync touching one group must not read view files
    from untouched buckets (sync cost ∝ delta, not view size)."""
    spec = AggSpec(group_cols=["source"], sum_cols=["n_tok"])
    src_t = CDCEngine.create_table(str(tmp_path / "s3"), num_buckets=4)
    src = CDCEngine(spark, src_t)
    view_t = create_view(str(tmp_path / "v3"), src_t, spec, num_buckets=8)
    view = CDCEngine(spark, view_t)
    # bootstrap: many groups spread across view buckets
    src.apply_batch(
        _log(spark, [(i, "I", f"k{i}", [1] * i, i, f"g{i % 6}", TS)
                     for i in range(1, 13)]), 0, 12,
    )
    sync_view(spark, src_t, view, spec)
    all_files = {f.path for f in view_t.current().files}
    assert len(all_files) > 1  # groups actually spread over buckets

    # one group changes; capture which view files the sync reads
    src.apply_batch(_log(spark, [(13, "U", "k1", [1] * 99, 99, "g1", TS)]),
                    12, 13)
    read_files = set()
    orig_read = type(view_t).read

    def spy(self, spark_, buckets=None, version=None):
        df = orig_read(self, spark_, buckets=buckets, version=version)
        if self is view_t and buckets is not None:
            read_files.update(df.inputFiles())
        return df

    import unittest.mock as mock

    with mock.patch.object(type(view_t), "read", spy):
        sync_view(spark, src_t, view, spec)
    # DataFile paths are table-root-relative; inputFiles are absolute URIs
    read_paths = {p.removeprefix("file://") for p in read_files}
    all_abs = {str(tmp_path / "v3" / p) for p in all_files}
    assert read_paths and read_paths < all_abs  # strict subset: pruned
    assert verify_view(spark, src_t, view_t, spec)["converged"]


def test_soft_delete_source(spark, tmp_path):
    """Soft sources: a tombstoned row leaves the aggregate (the feed
    emits 'delete' on the live->dead transition), and a revival
    re-enters it — totals always equal the groupBy of LIVE rows."""
    src_t = CDCEngine.create_table(
        str(tmp_path / "soft"), num_buckets=4, soft_delete=True
    )
    src = CDCEngine(spark, src_t)
    view_t = create_view(str(tmp_path / "vsoft"), src_t, SPEC, num_buckets=2)
    view = CDCEngine(spark, view_t)
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS),
                     (2, "I", "k2", [2] * 5, 5, "a", TS)]), 0, 2,
    )
    sync_view(spark, src_t, view, SPEC)
    assert _totals(spark, view_t) == {"a": (2, 15)}
    src.apply_batch(_log(spark, [(3, "D", "k1", None, None, None, TS)]), 2, 3)
    sync_view(spark, src_t, view, SPEC)
    assert _totals(spark, view_t) == {"a": (1, 5)}  # tombstone left the agg
    src.apply_batch(_log(spark, [(4, "I", "k1", [7] * 7, 7, "a", TS)]), 3, 4)
    sync_view(spark, src_t, view, SPEC)
    assert _totals(spark, view_t) == {"a": (2, 12)}  # revival re-entered
    assert verify_view(spark, src_t, view_t, SPEC)["converged"]


def test_follow_view_applies_windows(spark, tmp_path):
    """Continuous view maintenance: follow_view polls and delta-syncs as
    the source advances from another thread (follow_mirror's shape)."""
    import threading

    from dbimport_spark.plans.matview import follow_view

    src, view = _pair(spark, tmp_path)
    log = generate_changes(spark, 2000, n_keys=120, seed=13)
    src.replay(log.filter(F.col("lsn") <= 1000), num_batches=1)

    stop = tmp_path / "backstop"
    backstop = threading.Timer(120.0, stop.touch)
    backstop.start()
    t = threading.Timer(1.0, lambda: src.replay(log, num_batches=1))
    t.start()
    try:
        applied = follow_view(
            spark, src.table, view, SPEC, poll_s=0.1, max_syncs=2,
            stop_file=str(stop),
        )
    finally:
        t.join()
        backstop.cancel()
    assert len(applied) == 2
    assert verify_view(spark, src.table, view.table, SPEC)["converged"]
    assert view.table.last_lsn() == src.table.current().version


# ---- min/max: candidate rule + group-scoped rescan-on-invalidation ---------

MM_SPEC = AggSpec(
    group_cols=["source"], sum_cols=["n_tok"],
    min_cols=["n_tok"], max_cols=["n_tok"],
)


def _mm_pair(spark, tmp_path, spec=MM_SPEC):
    src_t = CDCEngine.create_table(str(tmp_path / "src"), num_buckets=8)
    src = CDCEngine(spark, src_t, checkpoint_dir=str(tmp_path / "ckpt"))
    view_t = create_view(str(tmp_path / "view"), src_t, spec, num_buckets=4)
    view = CDCEngine(spark, view_t)
    return src, view


def _mm_totals(spark, view_t):
    return {
        r["source"]: (r["n_rows"], r["sum_n_tok"], r["min_n_tok"], r["max_n_tok"])
        for r in view_t.read(spark).collect()
    }


def _rescans(recs):
    """Total groups rescanned across the captured sync_view INFO lines."""
    import re

    n = 0
    for r in recs:
        m = re.search(r"(\d+) group\(s\) rescanned", r.getMessage())
        if m:
            n += int(m.group(1))
    return n


def _mm_sync(spark, src, view, spec=MM_SPEC):
    import logging

    from tests.test_mirror import _caplog_records

    with _caplog_records(
        "dbimport_spark.plans.matview", level=logging.INFO
    ) as recs:
        bs = sync_view(spark, src.table, view, spec)
    return bs, _rescans(recs)


def test_minmax_bootstrap_and_growth_without_rescan(spark, tmp_path):
    """Inserts only ever GROW an extremum — the candidate rule handles
    them with zero rescans, including bootstrap (the whole table arrives
    as inserts)."""
    src, view = _mm_pair(spark, tmp_path)
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS),
                     (2, "I", "k2", [2] * 20, 20, "a", TS),
                     (3, "I", "k3", [3] * 5, 5, "b", TS)]), 0, 3,
    )
    bs, rescanned = _mm_sync(spark, src, view)
    assert not bs.skipped and rescanned == 0
    assert _mm_totals(spark, view.table) == {
        "a": (2, 30, 10, 20), "b": (1, 5, 5, 5),
    }
    # a new outlier value: candidate folds in, still no rescan
    src.apply_batch(_log(spark, [(4, "I", "k4", [4] * 99, 99, "a", TS)]), 3, 4)
    bs, rescanned = _mm_sync(spark, src, view)
    assert rescanned == 0
    assert _mm_totals(spark, view.table)["a"] == (3, 129, 10, 99)
    assert verify_view(spark, src.table, view.table, MM_SPEC)["converged"]


def test_minmax_extremum_removal_rescans_only_that_group(spark, tmp_path):
    """Deleting the max-carrier of group 'a' invalidates only 'a': one
    group rescanned, 'b' untouched, and the new max is the runner-up."""
    src, view = _mm_pair(spark, tmp_path)
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS),
                     (2, "I", "k2", [2] * 20, 20, "a", TS),
                     (3, "I", "k3", [3] * 7, 7, "b", TS)]), 0, 3,
    )
    _mm_sync(spark, src, view)
    src.apply_batch(_log(spark, [(4, "D", "k2", None, None, None, TS)]), 3, 4)
    bs, rescanned = _mm_sync(spark, src, view)
    assert rescanned == 1
    assert _mm_totals(spark, view.table) == {
        "a": (1, 10, 10, 10), "b": (1, 7, 7, 7),
    }
    assert verify_view(spark, src.table, view.table, MM_SPEC)["converged"]


def test_minmax_nonextremal_delete_no_rescan(spark, tmp_path):
    """Removing a strictly-interior value can't carry an extremum: no
    group is rescanned and both extremes survive."""
    src, view = _mm_pair(spark, tmp_path)
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS),
                     (2, "I", "k2", [2] * 15, 15, "a", TS),
                     (3, "I", "k3", [3] * 20, 20, "a", TS)]), 0, 3,
    )
    _mm_sync(spark, src, view)
    src.apply_batch(_log(spark, [(4, "D", "k2", None, None, None, TS)]), 3, 4)
    bs, rescanned = _mm_sync(spark, src, view)
    assert rescanned == 0
    assert _mm_totals(spark, view.table)["a"] == (2, 30, 10, 20)
    assert verify_view(spark, src.table, view.table, MM_SPEC)["converged"]


def test_minmax_tied_extremum_delete_rescans_and_survives(spark, tmp_path):
    """Two rows tie for the max; deleting one MUST rescan (the stored
    extremum was possibly removed) and the max must survive via the
    remaining carrier."""
    src, view = _mm_pair(spark, tmp_path)
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 20, 20, "a", TS),
                     (2, "I", "k2", [2] * 20, 20, "a", TS),
                     (3, "I", "k3", [3] * 5, 5, "a", TS)]), 0, 3,
    )
    _mm_sync(spark, src, view)
    src.apply_batch(_log(spark, [(4, "D", "k1", None, None, None, TS)]), 3, 4)
    bs, rescanned = _mm_sync(spark, src, view)
    assert rescanned == 1
    assert _mm_totals(spark, view.table)["a"] == (2, 25, 5, 20)
    assert verify_view(spark, src.table, view.table, MM_SPEC)["converged"]


def test_minmax_update_moves_extremum_across_groups(spark, tmp_path):
    """An update migrating the max-carrier from group 'a' to 'b' removes
    a's extremum (rescan) and candidates b's new one (no rescan)."""
    src, view = _mm_pair(spark, tmp_path)
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS),
                     (2, "I", "k2", [2] * 30, 30, "a", TS),
                     (3, "I", "k3", [3] * 7, 7, "b", TS)]), 0, 3,
    )
    _mm_sync(spark, src, view)
    src.apply_batch(_log(spark, [(4, "U", "k2", [2] * 30, 30, "b", TS)]), 3, 4)
    bs, rescanned = _mm_sync(spark, src, view)
    assert rescanned == 1  # only 'a' (b's new value is a pure candidate)
    assert _mm_totals(spark, view.table) == {
        "a": (1, 10, 10, 10), "b": (2, 37, 7, 30),
    }
    assert verify_view(spark, src.table, view.table, MM_SPEC)["converged"]


def test_minmax_value_unchanged_update_is_skipped(spark, tmp_path):
    """An update that keeps both the group and the aggregated value
    contributes nothing: no candidate, no removal, no rescan — even
    though the row itself changed (token values differ)."""
    src, view = _mm_pair(spark, tmp_path)
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS),
                     (2, "I", "k2", [2] * 5, 5, "a", TS)]), 0, 2,
    )
    _mm_sync(spark, src, view)
    src.apply_batch(_log(spark, [(3, "U", "k1", [9] * 10, 10, "a", TS)]), 2, 3)
    bs, rescanned = _mm_sync(spark, src, view)
    assert rescanned == 0 and bs.events == 0  # watermark-only sync
    assert _mm_totals(spark, view.table)["a"] == (2, 15, 5, 10)


def test_minmax_group_collapse_needs_no_rescan(spark, tmp_path):
    """Deleting a group's LAST row deletes the view row outright — no
    rescan even though the extremum was removed."""
    src, view = _mm_pair(spark, tmp_path)
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS),
                     (2, "I", "k2", [2] * 5, 5, "b", TS)]), 0, 2,
    )
    _mm_sync(spark, src, view)
    src.apply_batch(_log(spark, [(3, "D", "k1", None, None, None, TS)]), 2, 3)
    bs, rescanned = _mm_sync(spark, src, view)
    assert rescanned == 0
    assert _mm_totals(spark, view.table) == {"b": (1, 5, 5, 5)}
    assert verify_view(spark, src.table, view.table, MM_SPEC)["converged"]


def test_minmax_full_rebuild_gap(spark, tmp_path):
    src, view = _mm_pair(spark, tmp_path)
    src.apply_batch(_log(spark, [(1, "I", "k1", [1] * 10, 10, "a", TS)]), 0, 1)
    _mm_sync(spark, src, view)
    src.apply_batch(
        _log(spark, [(2, "I", "k2", [2] * 7, 7, "a", TS),
                     (3, "I", "k3", [3] * 2, 2, "b", TS),
                     (4, "D", "k1", None, None, None, TS)]), 1, 4,
    )
    src.table.expire_snapshots(keep_last=1)
    bs = sync_view(spark, src.table, view, MM_SPEC, on_gap="full")
    assert not bs.skipped
    assert _mm_totals(spark, view.table) == {
        "a": (1, 7, 7, 7), "b": (1, 2, 2, 2),
    }
    assert verify_view(spark, src.table, view.table, MM_SPEC)["converged"]


def test_minmax_schema_refuses_non_orderable(spark, tmp_path):
    from dbimport_spark.plans.matview import view_schema
    from dbimport_spark.schema import PAYLOAD_SCHEMA

    with pytest.raises(ValueError, match="non-orderable"):
        view_schema(
            PAYLOAD_SCHEMA,
            AggSpec(group_cols=["source"], max_cols=["tokens"]),
        )


def test_view_sync_across_reload_boundary(spark, tmp_path):
    """code-review r5: same wedge as the mirror — a reload inside the
    window must route to the on_gap='full' rebuild even while the base
    snapshot is retained, and on_gap='error' must name the reload."""
    spec = AggSpec(group_cols=["source"], sum_cols=["n_tok"])
    src_t = CDCEngine.create_table(str(tmp_path / "src"), num_buckets=2)
    src = CDCEngine(spark, src_t)
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 3, 3, "a", TS),
                     (2, "I", "k2", [2] * 4, 4, "b", TS)]), 0, 2,
    )
    view_t = create_view(str(tmp_path / "view"), src_t, spec, num_buckets=2)
    view = CDCEngine(spark, view_t)
    sync_view(spark, src_t, view, spec)
    base_v = view_t.last_lsn()

    src_t.reset_for_reload(src_t.current().schema)
    src2 = CDCEngine(spark, src_t)
    src2.apply_batch(
        _log(spark, [(1, "I", "k9", [9] * 5, 5, "c", TS)]), 0, 1,
    )
    assert base_v in src_t.snapshots()

    with pytest.raises(ValueError, match="declared full reload"):
        sync_view(spark, src_t, view, spec)
    bs = sync_view(spark, src_t, view, spec, on_gap="full")
    assert not bs.skipped
    assert verify_view(spark, src_t, view_t, spec)["converged"]
    rows = {r["source"]: r["n_rows"] for r in view_t.read(spark).filter(
        "dl_delete_ts is null" if "dl_delete_ts" in view_t.read(spark).columns
        else "1=1").collect()}
    assert rows == {"c": 1}  # pre-reload groups a/b are gone


def test_rescanned_groups_reaches_stats_sink(spark, tmp_path):
    """code-review r5: the min/max invalidation rescan count must be in
    the EMITTED stats record, not set on the BatchStats after the sink
    already serialized it."""
    from dbimport_spark.plans.stats_sink import CallableStatsSink

    spec = AggSpec(group_cols=["source"], min_cols=["n_tok"])
    src_t = CDCEngine.create_table(str(tmp_path / "src"), num_buckets=2)
    src = CDCEngine(spark, src_t)
    src.apply_batch(
        _log(spark, [(1, "I", "k1", [1] * 2, 2, "a", TS),
                     (2, "I", "k2", [2] * 9, 9, "a", TS)]), 0, 2,
    )
    view_t = create_view(str(tmp_path / "view"), src_t, spec, num_buckets=2)
    got = []
    view = CDCEngine(spark, view_t, stats_sink=CallableStatsSink(got.append))
    sync_view(spark, src_t, view, spec)
    # delete the min carrier: group 'a' must rescan, and the emitted
    # record must say so
    src.apply_batch(_log(spark, [(3, "D", "k1", None, None, None, TS)]), 2, 3)
    got.clear()
    sync_view(spark, src_t, view, spec)
    recs = [r for r in got if r["op"] == "apply_batch" and not r["skipped"]]
    assert recs and recs[-1]["rescanned_groups"] == 1
