"""Lake-to-lake mirror driven by the change data feed.

The Spark-native analogue of the reference's copy-to-other-cluster stage
(reference copy_operations.py — DBImport ships each import's delta to
remote clusters): the source table's snapshot-diff changelog
(``lake/cdf.py``) is re-applied through a second ``CDCEngine``, so the
mirror converges to the source byte-for-byte, deletes included — the one
change class the watermarked row-export can never propagate (a
hard-deleted row simply vanishes from the table it scans).

Watermark design: the mirror's LSN domain IS the source version number.
``sync`` maps the net feed of window (from_v, to_v] to change events with
``lsn = to_v`` (the net diff has exactly one event per key, so per-key
LWW needs no finer ordering) and applies them as batch (from_v, to_v].
The mirror's committed ``last_lsn`` is therefore "last mirrored source
version": resume, idempotent re-sync, and crash recovery all ride the
engine's existing exactly-once machinery with zero new state.

Scale: each sync reads only the source files the window changed (CDF
file pruning), shuffles once on the merge key, and applies through the
mirror's bucket-pruned merge. Bootstrap is the same code path — version
0 is the empty creation snapshot, so the first sync's feed is the full
table as inserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.lake.cdf import (
    CHANGE_TYPE_COL,
    COMMIT_VERSION_COL,
    table_changes,
    window_has_reload,
)
from dbimport_spark.lake.table import LakeTable, advance_pin
from dbimport_spark.plans.engine import BatchStats, CDCEngine
from dbimport_spark.schema import AUDIT_COLUMNS


def feed_to_change_events(feed: DataFrame, lsn: int) -> DataFrame:
    """Map a CDF frame to the engine's change-event shape.

    All events share one LSN (the window's target version): a net feed
    carries at most one row per key, so last-writer-wins dedup never has
    to break a tie inside the batch.
    """
    payload = [
        c
        for c in feed.columns
        if c not in (CHANGE_TYPE_COL, COMMIT_VERSION_COL)
        and not c.startswith("_pre_")
    ]
    op = (
        F.when(F.col(CHANGE_TYPE_COL) == "delete", F.lit("D"))
        .when(F.col(CHANGE_TYPE_COL) == "insert", F.lit("I"))
        .otherwise(F.lit("U"))
    )
    return feed.select(
        F.lit(lsn).cast("long").alias("lsn"), op.alias("op"), *payload
    )


def sync_mirror(
    spark: SparkSession,
    source: LakeTable,
    mirror_engine: CDCEngine,
    on_gap: str = "error",
    pin_name: str | None = None,
) -> BatchStats:
    """Advance the mirror to the source's current version. Idempotent.

    ``on_gap`` controls what happens when the last mirrored source
    version's snapshot has been expired on the source (so the diff base
    is gone): 'error' raises; 'full' falls back to a full reconcile —
    the source's current live rows as upserts plus anti-join deletes for
    mirror keys the source no longer has. The fallback scans both tables
    once (unavoidable: the metadata that scoped the delta is deleted)
    but still applies through the same exactly-once merge.

    ``pin_name``: advance a retention pin (``LakeTable.set_pin``) on the
    SOURCE to the synced version after each sync — the source's
    ``expire_snapshots`` then keeps this mirror's delta base alive, so a
    mirror that lags behind the maintenance schedule is never forced
    through the ``on_gap='full'`` scan. Pin advancement is best-effort
    (a racing expiry may still win once; the fallback path remains).
    """
    from_v = source_version_mirrored(mirror_engine)
    to_v = source.current().version
    if to_v <= from_v:
        advance_pin(source, pin_name, min(from_v, to_v))
        return BatchStats(lo=from_v, hi=to_v, skipped=True)

    reload_v = window_has_reload(source, from_v, to_v)
    if from_v in source.snapshots() and reload_v is None:
        feed = table_changes(spark, source, from_v, to_v)
        events = feed_to_change_events(feed, to_v)
        bs = mirror_engine.apply_batch(events, from_v, to_v)
        advance_pin(source, pin_name, to_v)
        return bs

    if on_gap != "full":
        if reload_v is not None:
            raise ValueError(
                f"window ({from_v}, {to_v}] crosses a declared full "
                f"reload at version {reload_v} — an incremental sync "
                "cannot cover it. Re-run with on_gap='full' for a full "
                "reconcile sync."
            )
        raise ValueError(
            f"source snapshot {from_v} has been expired (retained: "
            f"{source.snapshots()}) — the delta base is gone. Re-run with "
            "on_gap='full' for a full reconcile sync."
        )
    # no-silent-caps: the fallback scans BOTH tables once (the metadata
    # that scoped the delta is deleted) — report how much, from file
    # metadata alone, before paying it
    import logging

    # PINNED to to_v: reading current() would let a row inserted by a
    # racing commit (> to_v) into the reconcile while the watermark
    # commits as to_v — if the source then deletes that row, the next
    # window's net diff sees absent→absent and emits nothing, so the
    # mirror retains the phantom row forever
    src_snap, mir_snap = source.snapshot(to_v), mirror_engine.table.current()
    logging.getLogger(__name__).warning(
        "sync_mirror on_gap='full': delta base v%d expired — full "
        "reconcile will scan the source (%d rows, %d bytes, %d files) "
        "and the mirror's keys (%d rows, %d bytes, %d files)",
        from_v,
        sum(f.rows for f in src_snap.files),
        sum(f.bytes for f in src_snap.files),
        len(src_snap.files),
        sum(f.rows for f in mir_snap.files),
        sum(f.bytes for f in mir_snap.files),
        len(mir_snap.files),
    )
    keys = mirror_engine.keys
    src = source.read(spark, version=to_v)
    payload = [c for c in src.columns if c not in AUDIT_COLUMNS]
    from dbimport_spark.schema import AUDIT_DELETE

    if AUDIT_DELETE in src.columns:  # soft source: tombstones are deletes
        live = src.filter(F.col(AUDIT_DELETE).isNull())
    else:
        live = src
    upserts = live.select(
        F.lit(to_v).cast("long").alias("lsn"), F.lit("U").alias("op"), *payload
    )
    gone = (
        mirror_engine.table.read(spark)
        .select(*keys)
        .join(live.select(*keys), on=keys, how="left_anti")
    )
    ptypes = {f.name: f.dataType for f in live.select(*payload).schema.fields}
    deletes = gone.select(
        F.lit(to_v).cast("long").alias("lsn"),
        F.lit("D").alias("op"),
        *[
            F.col(c) if c in keys else F.lit(None).cast(ptypes[c]).alias(c)
            for c in payload
        ],
    )
    bs = mirror_engine.apply_batch(upserts.unionByName(deletes), from_v, to_v)
    advance_pin(source, pin_name, to_v)
    return bs


def follow_sync(
    sync_fn,
    poll_s: float = 5.0,
    max_syncs: int | None = None,
    stop_file: str | None = None,
) -> list[BatchStats]:
    """THE follower loop — drain-first-then-stop, shared by
    ``follow_mirror`` and ``matview.follow_view`` so the subtle ordering
    (applied windows re-check immediately; the stop file only wins when
    the source has no pending window) is defined once. ``sync_fn`` runs
    one sync attempt and returns a ``BatchStats`` (``skipped=True`` =
    nothing pending)."""
    import os as _os
    import time as _time

    applied: list[BatchStats] = []
    while max_syncs is None or len(applied) < max_syncs:
        bs = sync_fn()
        if not bs.skipped:
            applied.append(bs)
            continue  # drained this window; re-check before sleeping
        if stop_file is not None and _os.path.isfile(stop_file):
            break
        _time.sleep(poll_s)
    return applied


def follow_mirror(
    spark: SparkSession,
    source: LakeTable,
    mirror_engine: CDCEngine,
    poll_s: float = 5.0,
    max_syncs: int | None = None,
    stop_file: str | None = None,
    on_gap: str = "error",
    pin_name: str | None = None,
) -> list[BatchStats]:
    """Continuous replication: poll the source and ``sync_mirror`` each
    time it advances (the daemonized form of the reference's scheduled
    copy stage — Airflow re-runs the copy DAG per import cycle). Polls
    are metadata-only; each applied sync ships one window's delta. The
    watermark lives in the MIRROR table, so a killed follower restarted
    with the same arguments resumes exactly where the last committed
    sync left it. Stops after ``max_syncs`` applied syncs, or — drain
    first, then stop — when ``stop_file`` exists and the source has no
    pending window (pending work is never abandoned mid-shutdown)."""
    return follow_sync(
        lambda: sync_mirror(
            spark, source, mirror_engine, on_gap=on_gap, pin_name=pin_name
        ),
        poll_s=poll_s, max_syncs=max_syncs, stop_file=stop_file,
    )


def verify_mirror(
    spark: SparkSession, source: LakeTable, mirror: LakeTable
) -> dict:
    """Row-count + content-checksum reconciliation of mirror vs source
    (the reference validates its cluster copies the same way its imports
    are validated — count and content, copy_operations.py validation
    step). Soft-delete tombstones count as absent on either side; only
    payload columns shared by both tables are compared (an unsynced
    additive column would otherwise flag a false mismatch)."""
    from dbimport_spark.plans.validate import reconcile
    from dbimport_spark.schema import AUDIT_DELETE

    def live_rows(t: LakeTable) -> DataFrame:
        df = t.read(spark)
        if AUDIT_DELETE in df.columns:
            df = df.filter(F.col(AUDIT_DELETE).isNull())
        return df.select(
            *[c for c in df.columns if c not in AUDIT_COLUMNS]
        )

    src, mir = live_rows(source), live_rows(mirror)
    cols = [c for c in src.columns if c in set(mir.columns)]
    return reconcile(mir.select(*cols), src.select(*cols), cols)


def source_version_mirrored(mirror_engine: CDCEngine) -> int:
    """The mirror's LSN watermark, i.e. the last source version applied.
    A never-synced mirror reports 0 — the source's empty creation
    snapshot — so the bootstrap sync is an ordinary delta from v0."""
    return max(mirror_engine.table.last_lsn(), 0)
