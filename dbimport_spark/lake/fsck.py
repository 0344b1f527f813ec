"""Table consistency checker ("fsck"): metadata-only invariant audit.

Operational parity with the reference's manage/validation tooling (its
per-table validation machinery and manual repair commands): verify every
structural invariant the format relies on WITHOUT scanning data — pure
metadata + filesystem stats, so it is safe to run against a live table
and O(#files) cheap at any scale. The checker itself must survive the
corruption it audits: malformed metadata becomes an error FINDING, never
an unhandled exception.

Checks (error = the table lies about something; warn = drift worth GC or
investigation, nothing is lost):

- metadata files parse (error);
- referenced-file existence + recorded byte sizes match the filesystem
  (error: a reader will fail or silently read wrong data);
- snapshot chain: parent_snapshot_id links resolve, versions contiguous
  over retained snapshots (error);
- watermark monotonicity: ``last_lsn`` never decreases across retained
  snapshots (error — replay exactly-once depends on it), EXCEPT across a
  declared full reload (``reload`` marker, or the zero-files/no-renames/
  reset-watermark signature of pre-marker reload snapshots), which
  resets the baseline;
- merge_ts monotonicity: ``last_merge_ts`` never decreases where present
  (equal = inherited by a non-merge commit) (error — the incremental
  export watermark depends on it);
- schema name uniqueness at EVERY rename epoch (the backdated schema
  historical reads use — the same invariant commit() enforces at write
  time, table.py epoch-collision guard) (error);
- file epochs within the current rename-epoch range (error);
- bucket ids within [0, num_buckets) (error);
- bucket-modulus evolution: a ``num_buckets`` change keeps no parent
  files (error — one modulus per snapshot, the rebucket invariant) and
  carries the ``rewrite_only`` marker (warn — consumers scan needlessly);
- version hint vs newest metadata (warn behind, error ahead: readers
  would chase a version the store lacks);
- sqlite catalog pointer (when catalog.db exists) vs newest metadata
  (warn: one behind = the documented crash window, self-heals on the
  next commit; error: pointer AHEAD of disk — metadata was lost);
- orphan data files (shared definition with
  ``maintenance.find_orphan_files`` so audit and GC can never disagree)
  (warn, with total bytes).
"""

from __future__ import annotations

import os
from datetime import datetime

from dbimport_spark.lake.table import LakeTable


def _is_reload_boundary(snap) -> bool:
    if snap.properties.get("reload") == "true":
        return True
    # pre-marker reload snapshots: the reset_for_reload signature
    return (
        not snap.files
        and not snap.renames
        and snap.properties.get("last_lsn") == "-1"
    )


def check_table(table: LakeTable) -> list[dict]:
    """Run every invariant check; returns findings as
    ``{"level": "error"|"warn", "check": ..., "detail": ...}`` (empty =
    clean). Never raises on corrupt metadata — that IS a finding."""
    findings: list[dict] = []

    def err(check: str, detail: str) -> None:
        findings.append({"level": "error", "check": check, "detail": detail})

    def warn(check: str, detail: str) -> None:
        findings.append({"level": "warn", "check": check, "detail": detail})

    # tolerant enumeration (table.snapshots() assumes well-formed names):
    # a stray v-prefixed junk file is a finding, never an abort
    meta_dir = os.path.join(table.root, "metadata")
    versions: list[int] = []
    try:
        for name in os.listdir(meta_dir):
            if ".tmp-" in name:
                # a catalog writer died between tmp-write and publish
                # (catalog.py documents the turd); harmless to readers
                # but accumulates forever without a signal — repair_table
                # age-gate-removes them
                warn("metadata", f"commit tmp turd {name}")
                continue
            if name.startswith("v") and name.endswith(".json"):
                try:
                    versions.append(int(name[1:-5]))
                except ValueError:
                    err("metadata", f"stray metadata file {name}")
    except FileNotFoundError:
        err("metadata", f"metadata directory missing: {meta_dir}")
        return findings
    versions.sort()
    if not versions:
        err("snapshots", "no snapshot metadata found")
        return findings
    snaps = []
    for v in versions:
        try:
            snaps.append(table.snapshot(v))
        except Exception as e:
            err("metadata", f"v{v}.json unreadable: {type(e).__name__}: {e}")
    if not snaps:
        return findings
    cur = snaps[-1]

    # -- snapshot chain -------------------------------------------------------
    # a gap whose lower edge is tagged is expiry working as designed (a tag
    # keeps exactly its version; the untagged successors aged out); any
    # other gap is a hole someone tore in the chain
    tag_versions = set(table.tags().values())
    for a, b in zip(versions, versions[1:]):
        if b != a + 1 and a not in tag_versions:
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

    # -- retention pins ---------------------------------------------------------
    # a pin naming an expired version protects nothing (the follower it
    # belongs to will be forced through on_gap='full'); a pin far behind
    # current silently inflates retention — both deserve an operator's eye.
    # First: TORN pin/tag files. pins()/tags() silently skip unparsable
    # JSON (a reader must), but a torn pin has silently STOPPED protecting
    # its follower's delta base — fsck is where that surfaces.
    retained = {s.version for s in snaps}
    import json as _json

    for sub, check in (("pins", "pins"), ("tags", "tags")):
        d = os.path.join(meta_dir, sub)
        if not os.path.isdir(d):
            continue
        for fname in sorted(os.listdir(d)):
            if not fname.endswith(".json"):
                if not fname.endswith(".tmp") and ".tmp-" not in fname:
                    warn(check, f"stray file in {sub}/: {fname}")
                continue
            try:
                with open(os.path.join(d, fname)) as fh:
                    int(_json.load(fh)["version"])
            except (
                ValueError,
                TypeError,  # "version": null / list — not int-coercible
                KeyError,
                _json.JSONDecodeError,
                OSError,
            ) as e:
                err(
                    check,
                    f"{sub}/{fname} is unreadable ({type(e).__name__}) — "
                    "a torn write; this entry protects NOTHING until "
                    "re-created (set_pin/set_tag) or deleted",
                )
    for name, v in sorted(table.pins().items()):
        if v not in retained:
            warn(
                "pins",
                f"pin {name!r} names version {v}, which is not retained — "
                "the pin is ineffective; its follower must full-reconcile "
                "(delete the pin if the follower is gone)",
            )
        elif cur.version - v > 100:
            warn(
                "pins",
                f"pin {name!r} lags current by {cur.version - v} versions "
                f"(v{v} vs v{cur.version}) — expiry keeps everything above "
                "it; check that its follower is still alive",
            )

    # -- snapshot tags ----------------------------------------------------------
    # expire_snapshots keeps tagged versions, so a tag naming a missing
    # version means out-of-band deletion or a pre-tag expiry — time travel
    # to it is broken NOW and the operator should retag or delete it
    for name, v in sorted(table.tags().items()):
        if v not in retained:
            err(
                "tags",
                f"tag {name!r} names version {v}, which is not retained — "
                "time travel to it is broken (expiry keeps tagged versions, "
                "so this was deleted out-of-band; retag or delete the tag)",
            )

    # -- merge-on-read file kinds ----------------------------------------------
    # seq is the LWW order across delta commits: a non-base file whose seq
    # is missing or from the future reconciles in the wrong order (silent
    # lost/resurrected rows); an unknown kind would be read as base.
    for s in snaps:
        for f in s.files:
            if f.kind not in ("base", "delta", "delete"):
                err(
                    "mor",
                    f"v{s.version}: unknown data-file kind {f.kind!r}: {f.path}",
                )
            elif f.kind != "base" and not (0 < f.seq <= s.version):
                err(
                    "mor",
                    f"v{s.version}: {f.kind} file with out-of-range "
                    f"seq={f.seq} (must be in 1..{s.version}): {f.path}",
                )
    cur_delta_bytes = sum(f.bytes for f in cur.files if f.kind != "base")
    if cur_delta_bytes:
        cur_total = sum(f.bytes for f in cur.files) or 1
        if cur_delta_bytes > 0.5 * cur_total:
            warn(
                "mor",
                f"merge-on-read deltas are {cur_delta_bytes} bytes "
                f"({100 * cur_delta_bytes // cur_total}% of the table) — "
                "every read pays reconciliation; run maintenance.compact",
            )

    # -- bucket-modulus evolution ---------------------------------------------
    # a num_buckets change is only sound as a full rewrite (one modulus per
    # snapshot — commit() enforces this at write time; the audit re-checks
    # it because a hand-edited or corrupted snapshot breaks merge pruning
    # and the per-bucket streaming diff silently)
    for s in snaps[1:]:
        parent = by_version.get(s.version - 1)
        if parent is None or s.num_buckets == parent.num_buckets:
            continue
        shared = {f.path for f in s.files} & {f.path for f in parent.files}
        if shared:
            err(
                "rebucket",
                f"v{s.version} changed num_buckets "
                f"{parent.num_buckets} -> {s.num_buckets} but kept "
                f"{len(shared)} file(s) bucketed under the old modulus",
            )
        if s.properties.get("rewrite_only") != "true":
            warn(
                "rebucket",
                f"v{s.version} changed num_buckets without the "
                "rewrite_only marker — change-feed consumers will scan "
                "the window instead of skipping it",
            )

    # -- watermark + merge_ts monotonicity -----------------------------------
    prev_lsn, prev_ts = None, None
    for s in snaps:
        if _is_reload_boundary(s):
            # declared full reload: watermark and merge_ts restart
            prev_lsn, prev_ts = None, None
        try:
            lsn = int(s.properties.get("last_lsn", "-1"))
        except ValueError:
            err("metadata", f"v{s.version}: last_lsn is not an integer")
            continue
        if prev_lsn is not None and lsn < prev_lsn:
            err(
                "watermark",
                f"last_lsn moved backward at v{s.version}: {prev_lsn} -> {lsn}",
            )
        prev_lsn = max(lsn, prev_lsn if prev_lsn is not None else lsn)
        ts = s.properties.get("last_merge_ts")
        if ts is not None:
            try:
                tsv = datetime.fromisoformat(ts)
            except ValueError:
                err("metadata", f"v{s.version}: last_merge_ts unparseable")
                continue
            # equal = inherited by a non-merge commit (compaction, rename,
            # repair of other buckets) — only a DECREASE is a violation
            try:
                moved_back = prev_ts is not None and tsv < prev_ts
            except TypeError:
                # aware vs naive mix (foreign writer): a FINDING, not a
                # crash — the never-raise contract holds
                err(
                    "merge_ts",
                    f"v{s.version}: last_merge_ts timezone-awareness "
                    "differs from the previous snapshot's — ordering is "
                    "uncomparable",
                )
                prev_ts = tsv
                continue
            if moved_back:
                err(
                    "merge_ts",
                    f"last_merge_ts moved backward at v{s.version}",
                )
            prev_ts = tsv

    # -- schema uniqueness at every rename epoch ------------------------------
    # the same invariant commit() enforces for NEW columns (table.py
    # epoch-collision guard): the backdated schema any epoch's files are
    # read through must not contain duplicate field names. Uses THE
    # name-mapping implementation reads use (LakeTable._backdated_schema)
    # so the audit can never drift from actual read behavior.
    for epoch in range(len(cur.renames) + 1):
        names = LakeTable._backdated_schema(cur, epoch).fieldNames()
        dupes = sorted({n for n in names if names.count(n) > 1})
        if dupes:
            err(
                "schema",
                f"duplicate column name(s) {dupes} in the backdated schema "
                f"of rename epoch {epoch} — historical reads of that "
                "epoch's files break",
            )

    # -- current snapshot structure ------------------------------------------
    epoch = len(cur.renames)
    for f in cur.files:
        if not (0 <= f.bucket < cur.num_buckets):
            err("bucket", f"{f.path}: bucket {f.bucket} outside [0, {cur.num_buckets})")
        if not (0 <= f.epoch <= epoch):
            err("epoch", f"{f.path}: epoch {f.epoch} outside [0, {epoch}]")

    # -- referenced files vs filesystem --------------------------------------
    # deduped by (path, recorded bytes): data files are immutable, so one
    # stat answers every referencing snapshot — O(unique files) syscalls,
    # not O(snapshots x files) — and EVERY retained snapshot's files are
    # size-checked (a truncated file referenced only by a tagged
    # historical snapshot breaks time travel just as loudly)
    refs: dict[tuple[str, int], list[int]] = {}
    for s in snaps:
        for f in s.files:
            refs.setdefault((f.path, f.bytes), []).append(s.version)
    for (rel, nbytes), versions in refs.items():
        p = os.path.join(table.root, rel)
        vlist = ",".join(f"v{v}" for v in sorted(set(versions)))
        if not os.path.isfile(p):
            err("files", f"{vlist} reference missing file {rel}")
        else:
            actual = os.path.getsize(p)
            if actual != nbytes:
                err(
                    "files",
                    f"{rel} (referenced by {vlist}): recorded {nbytes} "
                    f"bytes, on disk {actual}",
                )

    # -- version hint ---------------------------------------------------------
    hint_path = os.path.join(table.root, "metadata", "version-hint.text")
    try:
        with open(hint_path) as fh:
            hint = int(fh.read().strip())
        if hint < cur.version:
            warn("hint", f"version hint {hint} behind newest v{cur.version}")
        elif hint > cur.version:
            err(
                "hint",
                f"version hint {hint} ahead of newest metadata "
                f"v{cur.version} — committed metadata was lost",
            )
    except (FileNotFoundError, ValueError):
        warn("hint", "version hint missing/unreadable (current() recovers)")

    # -- sqlite catalog pointer ----------------------------------------------
    db = os.path.join(table.root, "metadata", "catalog.db")
    if os.path.isfile(db):
        import sqlite3
        from contextlib import closing

        row = None
        try:
            with closing(sqlite3.connect(db)) as con:
                row = con.execute(
                    "SELECT version FROM table_pointer WHERE key = ?",
                    (os.path.abspath(os.path.join(table.root, "metadata")),),
                ).fetchone()
        except sqlite3.Error as e:
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
    from dbimport_spark.lake.maintenance import find_orphan_files

    try:
        orphans = find_orphan_files(table)
    except Exception as e:
        orphans = []
        warn("orphans", f"orphan scan failed: {type(e).__name__}: {e}")
    if orphans:
        warn(
            "orphans",
            f"{len(orphans)} unreferenced data file(s), "
            f"{sum(b for _, b in orphans)} bytes — remove_orphan_files "
            "reclaims them",
        )

    return findings


def repair_table(
    table: LakeTable, orphan_older_than_seconds: float = 24 * 3600
) -> list[dict]:
    """Apply the SAFE subset of repairs for ``check_table`` findings —
    actions that restore readability or reclaim space without ever
    destroying committed state or hiding what happened (the findings the
    operator saw before repairing remain the durable record):

    - **version hint** rewritten to the newest retained metadata —
      a hint AHEAD of the newest snapshot (committed metadata lost)
      otherwise breaks ``load()`` outright; behind/missing merely costs
      the probe. The rewrite repairs the POINTER, not the loss — the
      error finding still reported it.
    - **stray metadata files** (unparseable ``v*.json`` names) moved to
      ``metadata/_stray/`` — never deleted; readers and ``snapshots()``
      stop tripping over them.
    - **orphan data files** (referenced by no retained snapshot) removed
      via ``maintenance.remove_orphan_files`` — age-gated so an in-flight
      commit's fresh files are never swept.

    Deliberately NOT repaired: chain gaps, modulus violations, missing
    data files, watermark regressions (structural corruption — an
    automatic "fix" would destroy evidence or fabricate state) and
    retention pins (operator-owned; an ineffective pin is a decision,
    not damage). Returns the actions taken. Idempotent: a second run
    finds nothing to do.
    """
    import shutil

    actions: list[dict] = []
    meta_dir = os.path.join(table.root, "metadata")

    # commit tmp turds (writer died between tmp-write and publish) —
    # age-gated removal: a LIVE commit's tmp is seconds old, never hours
    import time as _time

    cutoff = _time.time() - orphan_older_than_seconds
    for name in sorted(os.listdir(meta_dir)):
        if ".tmp-" not in name:
            continue
        p = os.path.join(meta_dir, name)
        try:
            if os.path.isfile(p) and os.path.getmtime(p) <= cutoff:
                os.unlink(p)
                actions.append(
                    {"action": "remove_commit_tmp_turd", "detail": name}
                )
        except OSError:
            continue  # raced another repair: nothing to do

    # stray metadata files -> metadata/_stray/
    for name in sorted(os.listdir(meta_dir)):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        try:
            int(name[1:-5])
        except ValueError:
            stray_dir = os.path.join(meta_dir, "_stray")
            os.makedirs(stray_dir, exist_ok=True)
            dst = os.path.join(stray_dir, name)
            # 'never deleted' includes PREVIOUSLY quarantined evidence: a
            # recurring stray name gets a numbered destination instead of
            # unlinking the first capture
            n = 1
            while os.path.exists(dst):
                dst = os.path.join(stray_dir, f"{name}.{n}")
                n += 1
            shutil.move(os.path.join(meta_dir, name), dst)
            actions.append(
                {"action": "quarantine_stray_metadata", "detail": name}
            )

    # version hint -> newest retained metadata
    versions = table.snapshots()
    if versions:
        newest = versions[-1]
        hint_path = os.path.join(meta_dir, "version-hint.text")
        hint = None
        try:
            with open(hint_path) as fh:
                hint = int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            pass
        if hint != newest:
            tmp = hint_path + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(str(newest))
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, hint_path)
            actions.append(
                {
                    "action": "rewrite_version_hint",
                    "detail": f"{hint} -> {newest}",
                }
            )

    # orphan data files (age-gated)
    from dbimport_spark.lake.maintenance import remove_orphan_files

    removed = remove_orphan_files(
        table, older_than_seconds=orphan_older_than_seconds
    )
    if removed:
        actions.append(
            {"action": "remove_orphan_files", "detail": f"{removed} file(s)"}
        )
    return actions
