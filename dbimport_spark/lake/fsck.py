"""Table consistency checker ("fsck"): metadata-only invariant audit.

Operational parity with the reference's manage/validation tooling (its
per-table validation machinery and manual repair commands): verify every
structural invariant the format relies on WITHOUT scanning data — pure
metadata + filesystem stats, so it is safe to run against a live table
and O(#files) cheap at any scale.

Checks (error = the table lies about something; warn = drift worth GC or
investigation, nothing is lost):

- referenced-file existence + recorded byte sizes match the filesystem
  (error: a reader will fail or silently read wrong data);
- snapshot chain: parent_snapshot_id links resolve, versions contiguous
  over retained snapshots (error);
- watermark monotonicity: ``last_lsn`` never decreases across retained
  snapshots (error — replay exactly-once depends on it);
- merge_ts monotonicity: ``last_merge_ts`` strictly increases where
  present (error — the incremental export watermark depends on it);
- rename chain: no two current columns share a physical name within any
  epoch window, schema fields unique (error);
- file epochs within the current rename-epoch range (error);
- bucket ids within [0, num_buckets) (error);
- version hint vs newest metadata (warn: stale hint — current() probes
  forward, but the hint should be refreshed);
- sqlite catalog pointer (when catalog.db exists) vs newest metadata
  (warn: one behind = the documented crash window, self-heals on the
  next commit; error: pointer AHEAD of disk — metadata was lost);
- orphan data files not referenced by any retained snapshot (warn, with
  total bytes — ``remove_orphan_files`` reclaims them).
"""

from __future__ import annotations

import os
from datetime import datetime

from dbimport_spark.lake.table import LakeTable


def check_table(table: LakeTable) -> list[dict]:
    """Run every invariant check; returns findings as
    ``{"level": "error"|"warn", "check": ..., "detail": ...}`` (empty =
    clean)."""
    findings: list[dict] = []

    def err(check: str, detail: str) -> None:
        findings.append({"level": "error", "check": check, "detail": detail})

    def warn(check: str, detail: str) -> None:
        findings.append({"level": "warn", "check": check, "detail": detail})

    versions = table.snapshots()
    if not versions:
        err("snapshots", "no snapshot metadata found")
        return findings
    snaps = [table.snapshot(v) for v in versions]
    cur = snaps[-1]

    # -- snapshot chain -------------------------------------------------------
    for a, b in zip(versions, versions[1:]):
        if b != a + 1:
            err("chain", f"retained versions jump v{a} -> v{b}")
    by_version = {s.version: s for s in snaps}
    for s in snaps[1:]:
        parent = by_version.get(s.version - 1)
        if parent is not None and s.parent_snapshot_id != parent.snapshot_id:
            err(
                "chain",
                f"v{s.version}.parent_snapshot_id does not match "
                f"v{s.version - 1}",
            )

    # -- watermark + merge_ts monotonicity -----------------------------------
    prev_lsn, prev_ts = None, None
    for s in snaps:
        lsn = int(s.properties.get("last_lsn", "-1"))
        if prev_lsn is not None and lsn < prev_lsn:
            err(
                "watermark",
                f"last_lsn moved backward at v{s.version}: {prev_lsn} -> {lsn}",
            )
        prev_lsn = max(lsn, prev_lsn if prev_lsn is not None else lsn)
        ts = s.properties.get("last_merge_ts")
        if ts is not None:
            tsv = datetime.fromisoformat(ts)
            # equal = inherited by a non-merge commit (compaction, rename,
            # repair of other buckets) — only a DECREASE is a violation
            if prev_ts is not None and tsv < prev_ts:
                err(
                    "merge_ts",
                    f"last_merge_ts moved backward at v{s.version}",
                )
            prev_ts = tsv

    # -- current snapshot structure ------------------------------------------
    names = cur.schema.fieldNames()
    if len(names) != len(set(names)):
        err("schema", "duplicate column names in current schema")
    epoch = len(cur.renames)
    for f in cur.files:
        if not (0 <= f.bucket < cur.num_buckets):
            err("bucket", f"{f.path}: bucket {f.bucket} outside [0, {cur.num_buckets})")
        if not (0 <= f.epoch <= epoch):
            err("epoch", f"{f.path}: epoch {f.epoch} outside [0, {epoch}]")

    # -- referenced files vs filesystem --------------------------------------
    for s in snaps:
        for f in s.files:
            p = os.path.join(table.root, f.path)
            if not os.path.isfile(p):
                err("files", f"v{s.version} references missing file {f.path}")
            elif s is cur and os.path.getsize(p) != f.bytes:
                err(
                    "files",
                    f"{f.path}: recorded {f.bytes} bytes, on disk "
                    f"{os.path.getsize(p)}",
                )

    # -- version hint ---------------------------------------------------------
    hint_path = os.path.join(table.root, "metadata", "version-hint.text")
    try:
        with open(hint_path) as fh:
            hint = int(fh.read().strip())
        if hint < cur.version:
            warn("hint", f"version hint {hint} behind newest v{cur.version}")
        elif hint > cur.version:
            err("hint", f"version hint {hint} ahead of newest v{cur.version}")
    except (FileNotFoundError, ValueError):
        warn("hint", "version hint missing/unreadable (current() recovers)")

    # -- sqlite catalog pointer ----------------------------------------------
    db = os.path.join(table.root, "metadata", "catalog.db")
    if os.path.isfile(db):
        import sqlite3

        try:
            row = sqlite3.connect(db).execute(
                "SELECT version FROM table_pointer WHERE key = ?",
                (os.path.abspath(os.path.join(table.root, "metadata")),),
            ).fetchone()
        except sqlite3.Error as e:
            row = None
            warn("catalog", f"catalog.db unreadable: {e}")
        if row is not None:
            if row[0] > cur.version:
                err(
                    "catalog",
                    f"pointer v{row[0]} AHEAD of newest metadata "
                    f"v{cur.version} — committed metadata was lost",
                )
            elif row[0] < cur.version:
                warn(
                    "catalog",
                    f"pointer v{row[0]} behind newest v{cur.version} "
                    "(crash window; self-heals on next commit)",
                )

    # -- orphan data files ----------------------------------------------------
    live = {f.path for s in snaps for f in s.files}
    orphans, orphan_bytes = 0, 0
    data_dir = os.path.join(table.root, "data")
    if os.path.isdir(data_dir):
        for dirpath, _dirs, fs in os.walk(data_dir):
            for name in fs:
                if not name.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, name), table.root)
                if rel not in live:
                    orphans += 1
                    orphan_bytes += os.path.getsize(os.path.join(dirpath, name))
    if orphans:
        warn(
            "orphans",
            f"{orphans} unreferenced data file(s), {orphan_bytes} bytes — "
            "remove_orphan_files reclaims them",
        )

    return findings
