"""Multi-table registry: one config document driving a fleet of tables.

The reference manages fleets through per-table config rows in its MySQL
database (import_tables, configSchema.py:686-766) discovered via
``discoverAndAddTablesFromSource`` (import_operations.py:518-648) and
scheduled per table by generated Airflow DAGs. DAG generation is out of
scope (SURVEY §2.1); this module is the minimal equivalent a user needs to
drive many tables from one invocation:

- a JSON registry (through the small-state seam, lake/statestore.py) maps
  table name → {table_root, log_path, history, checkpoint, renames,
  batches, schedule, enabled};
- ``replay_all`` iterates the registry with INDEPENDENT watermarks and
  INDEPENDENT failure domains — one table's error is recorded and the
  sweep continues, exactly how the reference's per-table Airflow tasks
  isolate failures.

Each entry's watermark/checkpoint state lives with its own table (lake
commit property + per-table replay plan), never in the registry — the
registry is configuration, not state, so concurrent single-table runs and
registry sweeps compose safely (the table commit CAS arbitrates).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

from pyspark.sql import SparkSession


@dataclass
class TableEntry:
    """One managed table (reference import_tables row analogue)."""

    name: str
    table_root: str
    log_path: str
    history: str | None = None
    checkpoint: str | None = None
    renames: dict[str, str] = field(default_factory=dict)
    # per-column ingest anonymization: column -> 'hash'|'star'|'first4'
    # (reference import_columns.anonymization_function, configSchema.py:938)
    anonymize: dict[str, str] = field(default_factory=dict)
    anonymize_salt: str = ""
    # 'cow' | 'mor' | 'auto': how batches land (CDCEngine.write_mode —
    # 'auto' picks merge-on-read delta files when the batch is small
    # relative to the touched buckets, the steady-state CDC shape)
    write_mode: str = "cow"
    # pre-commit truncated-upstream guard (plans/validate
    # max_delete_fraction): refuse to publish a batch deleting more than
    # this fraction of the touched buckets' previous rows
    max_delete_fraction: float | None = None
    # dead-letter quarantine dir (CDCEngine(quarantine_dir=...)): without
    # it a sweep REFUSES the whole table on the first malformed event —
    # right for a hand-run replay, wrong for an unattended fleet where
    # one corrupt wire line must not stall ingestion until an operator
    # shows up. Parked windows surface via the monitoring server
    # (/tables/<name>/quarantine) and drain via `quarantine --drain`.
    quarantine_dir: str | None = None
    batches: int = 1
    # free-form scheduling hint (e.g. "hourly") — recorded for the
    # orchestrator the deployment pairs this with; replay_all ignores it
    schedule: str | None = None
    enabled: bool = True
    # derived targets advanced after each successful replay (the
    # reference's per-table copy phase: import runs, then the configured
    # cluster copies ship the delta — copy_operations.py):
    # a mirror table root, and/or matviews [{root, group_by, sum, min, max}]
    mirror_root: str | None = None
    views: list[dict] = field(default_factory=list)
    # CDC JDBC exports advanced per sweep alongside mirror/views (the
    # reference's export phase): [{url, target_table, state_dir,
    # properties?, on_gap?}] — each applies the window's change feed
    # through plans/cdc_export's staging-table merge (deletes propagate)
    cdc_exports: list[dict] = field(default_factory=list)
    # post-replay storage upkeep (the reference runs Iceberg
    # expire_snapshots / remove_orphan_files right after each import,
    # import_operations.py:1513-1535). Recognized keys:
    #   target_bytes_per_bucket, max_buckets -> maintenance.auto_rebucket
    #   max_files_per_bucket                 -> maintenance.compact
    #   expire_keep_last                     -> table.expire_snapshots
    # Runs only when the replay AND derived syncs succeeded, so snapshot
    # expiry can never destroy a delta base a lagging mirror still needs.
    maintenance: dict = field(default_factory=dict)


class TableRegistry:
    def __init__(self, path: str, store=None):
        from dbimport_spark.lake.statestore import DEFAULT_STORE

        self.path = path
        self.store = store or DEFAULT_STORE

    def load(self) -> dict[str, TableEntry]:
        text = self.store.read_text(self.path)
        if text is None:
            return {}
        raw = json.loads(text)
        return {name: TableEntry(**rec) for name, rec in raw.items()}

    def save(self, entries: dict[str, TableEntry]) -> None:
        self.store.write_text(
            self.path,
            json.dumps({n: asdict(e) for n, e in entries.items()}, indent=2),
        )

    def add(self, entry: TableEntry) -> None:
        entries = self.load()
        if entry.name in entries:
            raise ValueError(f"table {entry.name!r} already registered")
        entries[entry.name] = entry
        self.save(entries)

    def remove(self, name: str) -> None:
        entries = self.load()
        if name not in entries:
            raise KeyError(f"table {name!r} not registered")
        del entries[name]
        self.save(entries)


def discover_tables(
    registry: TableRegistry,
    base_dir: str,
    log_base: str,
    batches: int = 1,
) -> list[str]:
    """Bootstrap the registry from a directory of lake tables — the
    reference's ``discoverAndAddTablesFromSource``
    (import_operations.py:518-648) reshaped for the lake: every immediate
    subdirectory of ``base_dir`` that IS a lake table (has table metadata)
    and is not yet registered gets an entry named after its directory,
    with its change log expected at ``<log_base>/<name>``. Already-
    registered names are left untouched (discovery is additive, like the
    reference's). Returns the newly added names."""
    import os

    from dbimport_spark.lake.table import LakeTable

    entries = registry.load()
    added: list[str] = []
    for name in sorted(os.listdir(base_dir)):
        root = os.path.join(base_dir, name)
        if not os.path.isdir(root) or not LakeTable.exists(root):
            continue
        if name in entries:
            continue
        entries[name] = TableEntry(
            name=name,
            table_root=root,
            log_path=os.path.join(log_base, name),
            batches=batches,
        )
        added.append(name)
    if added:
        registry.save(entries)
    return added


def discover_sources(
    spark: SparkSession,
    registry: TableRegistry,
    log_base: str,
    table_base: str,
    key: str | list[str] | None = None,
    num_buckets: int = 32,
    batches: int = 1,
    soft_delete: bool = False,
) -> list[str]:
    """Discover SOURCE change logs and register ready-to-replay tables —
    the other half of the reference's ``discoverAndAddTablesFromSource``
    (import_operations.py:518-648): where ``discover_tables`` adopts
    existing lake tables, this scans a warehouse of change logs. Every
    immediate subdirectory of ``log_base`` holding parquet becomes an
    entry: its payload schema is inferred from the log footer (metadata
    read only, bookkeeping columns ``lsn``/``op``/``commit_ts`` stripped —
    the reference likewise reads the source catalog, not the data), the
    merge key defaults to the schema-standard ``doc_id`` when present
    (else the log's first payload column, matching the reference's
    take-the-PK-else-first-column fallback), and a lake table is created
    at ``<table_base>/<name>`` unless one already exists there. Additive
    and idempotent: registered names and existing tables are left
    untouched. Returns the newly registered names."""
    import os

    from dbimport_spark.lake.table import LakeTable
    from dbimport_spark.plans.engine import CDCEngine
    from dbimport_spark.schema import MERGE_KEY

    bookkeeping = {"lsn", "op", "commit_ts"}
    entries = registry.load()
    added: list[str] = []
    for name in sorted(os.listdir(log_base)):
        log_path = os.path.join(log_base, name)
        if not os.path.isdir(log_path) or name in entries:
            continue
        try:
            # schema-only read: parquet footers, no data scan
            log_schema = (
                spark.read.option("mergeSchema", "true")
                .parquet(log_path)
                .schema
            )
        except Exception:
            continue  # not a parquet log — skip, keep discovering
        names = set(log_schema.fieldNames())
        if not {"lsn", "op"} <= names:
            continue  # parquet, but not a change log
        from pyspark.sql import types as T

        payload = T.StructType(
            [f for f in log_schema.fields if f.name not in bookkeeping]
        )
        if not payload.fields:
            continue
        if key is None:
            tbl_key: str | list[str] = (
                MERGE_KEY if MERGE_KEY in names else payload.fields[0].name
            )
        else:
            tbl_key = key
        key_list = [tbl_key] if isinstance(tbl_key, str) else list(tbl_key)
        if not set(key_list) <= names:
            continue  # declared key absent from this log
        root = os.path.join(table_base, name)
        if not LakeTable.exists(root):
            CDCEngine.create_table(
                root,
                payload_schema=payload,
                num_buckets=num_buckets,
                key=tbl_key,
                soft_delete=soft_delete,
            )
        entries[name] = TableEntry(
            name=name, table_root=root, log_path=log_path, batches=batches
        )
        added.append(name)
    if added:
        registry.save(entries)
    return added


def _syncpoints_path(registry: TableRegistry) -> str:
    return f"{registry.path}.syncpoints.json"


def sync_points(registry: TableRegistry) -> dict[str, dict]:
    """All sync-point manifests for this registry: ``{name: manifest}``."""
    text = registry.store.read_text(_syncpoints_path(registry))
    return json.loads(text) if text else {}


def _entry_roots(e: TableEntry) -> list[tuple[str, str]]:
    """Every lake-table root a sync point must freeze for one entry:
    the table itself plus its derived targets (mirror, history,
    matviews) — a warehouse freeze that skipped the derived side would
    let ``expire_snapshots`` age the frozen mirror out from under the
    sync point's reader."""
    roots = [("table", e.table_root)]
    if e.history:
        roots.append(("history", e.history))
    if e.mirror_root:
        roots.append(("mirror", e.mirror_root))
    for v in e.views:
        if v.get("root"):
            roots.append(("view", v["root"]))
    return roots


def create_sync_point(
    registry: TableRegistry,
    name: str,
    only: list[str] | None = None,
    replace: bool = False,
) -> dict:
    """Freeze a consistent cross-table snapshot set — tag every enabled
    entry's table (and its derived mirror / history / matview tables) at
    its CURRENT version under ``name``, and record one manifest.

    This is a *snapshot set*, not a cross-table transaction: each table
    is tagged at whatever version it holds when the sync point is cut.
    Run it right after an all-green ``replay_all`` sweep (or pass
    ``sync_point=`` to ``replay_all``) and the set is mutually
    consistent — every table reflects its own log up to the ``last_lsn``
    the manifest records, and the derived targets were just synced to
    those versions. The reference has no cross-table surface at all (one
    Airflow task per table); this is the coordinated-freeze primitive a
    training-data warehouse needs ("ship the corpus as of Monday":
    ``create_sync_point`` then ``export --at <name>`` per table).

    All-or-nothing: tag names are validated and versions tagged table by
    table; any failure rolls back the tags already set and re-raises, and
    the manifest — the sync point's existence proof — is written only
    after every tag landed. Tags pin exactly their version through
    ``expire_snapshots``, so the frozen set survives retention. A sync
    point is immutable: re-using a live name raises (a freeze that can
    move is not a freeze) — ``drop_sync_point`` first, or pass
    ``replace=True`` for a scheduled re-cut. A re-cut is near-atomic:
    the new freeze is cut under a temporary tag first (a failed cut
    rolls back and leaves the OLD freeze fully intact — a nightly DAG
    that fails never loses its last good freeze), the manifest then
    swaps to the new cut in one write (readers never resolve a missing
    name), the final tags move last (LWW replace-tag, per-table no-gap),
    and the temporaries are dropped. A crash between swap and cleanup
    leaves inert ``<name>.replacing`` / stale tags that only pin extra
    retention (fsck-visible), never a missing or half-applied freeze.
    """
    import re
    import time as _time

    from dbimport_spark.lake.table import LakeTable

    if not re.match(LakeTable._PIN_NAME_RE, name):
        raise ValueError(f"invalid sync point name {name!r}")
    points = sync_points(registry)
    replacing = name in points
    if replacing and not replace:
        raise ValueError(
            f"sync point {name!r} already exists (drop_sync_point "
            "first — a freeze never moves — or pass replace=True "
            "for a scheduled re-cut)"
        )
    entries = registry.load()
    missing = [n for n in only or [] if n not in entries]
    if missing:
        raise KeyError(f"not registered: {missing}")
    # an explicitly named disabled table is an ERROR, not a silent drop:
    # the operator asked for it in the freeze, and a manifest quietly
    # missing a member breaks every later `export --at` of that table
    # (replay_all reports the same situation as a failure)
    disabled = [n for n in only or [] if not entries[n].enabled]
    if disabled:
        raise ValueError(
            f"sync point names disabled table(s) {disabled} — enable "
            "them or drop them from --only"
        )
    targets = {
        n: e
        for n, e in entries.items()
        if e.enabled and (only is None or n in only)
    }
    if not targets:
        raise ValueError("sync point over zero tables")

    def _cut_freeze(tag_name: str):
        """Tag every target at its current version under ``tag_name``.
        All-or-nothing: any failure rolls back the tags already set and
        re-raises. Returns (manifest, [(table, version), ...])."""
        manifest: dict = {"created_unix": _time.time(), "tables": {}}
        pairs: list[tuple[LakeTable, int]] = []
        try:
            for n, e in targets.items():
                rec: dict = {}
                for kind, root in _entry_roots(e):
                    if kind != "table" and not LakeTable.exists(root):
                        continue  # derived target not materialized yet
                    t = LakeTable.load(root)
                    v = t.set_tag(tag_name)
                    pairs.append((t, v))
                    info = {"root": root, "version": v,
                            "last_lsn": t.last_lsn()}
                    if kind == "view":
                        rec.setdefault("views", []).append(info)
                    else:
                        rec[kind] = info
                manifest["tables"][n] = rec
        except Exception:
            for t, _ in pairs:  # a half-tagged freeze must not exist
                try:
                    t.delete_tag(tag_name)
                except OSError:
                    pass  # stray tag w/o manifest is inert; fsck-visible
            raise
        return manifest, pairs

    if not replacing:
        manifest, _ = _cut_freeze(name)
        points[name] = manifest
        registry.store.write_text(
            _syncpoints_path(registry), json.dumps(points, indent=2)
        )
        return manifest

    # Scheduled re-cut: new freeze under a temp tag first — a failed cut
    # rolls back above and the OLD freeze stays fully intact.
    old = points[name]
    tmp = name + ".replacing"
    manifest, pairs = _cut_freeze(tmp)
    # Swap the manifest in one write: from here readers resolve the NEW
    # versions, which the temp tags already pin through retention.
    points[name] = manifest
    registry.store.write_text(
        _syncpoints_path(registry), json.dumps(points, indent=2)
    )
    # Move the final tags (LWW replace-tag: per-table, never a gap),
    # drop final tags on tables the new cut no longer covers, then the
    # temporaries. Best-effort from here: a crash leaves only inert
    # extra tags pinning retention, never a missing freeze.
    new_roots = {p[0].root for p in pairs}
    for t, v in pairs:
        t.set_tag(name, version=v)
    for rec in old["tables"].values():
        infos = [rec[k] for k in ("table", "history", "mirror") if k in rec]
        infos += rec.get("views", [])
        for info in infos:
            if info["root"] not in new_roots:
                try:
                    LakeTable.load(info["root"]).delete_tag(name)
                except Exception:
                    pass  # table itself gone since the old freeze
    for t, _ in pairs:
        t.delete_tag(tmp)
    return manifest


def drop_sync_point(registry: TableRegistry, name: str) -> bool:
    """Remove a sync point: per-table tags first (best effort — a table
    deleted since the freeze is fine), manifest entry last. Returns False
    when the name does not exist."""
    from dbimport_spark.lake.table import LakeTable

    points = sync_points(registry)
    if name not in points:
        return False
    for rec in points[name]["tables"].values():
        infos = [rec[k] for k in ("table", "history", "mirror") if k in rec]
        infos += rec.get("views", [])
        for info in infos:
            try:
                LakeTable.load(info["root"]).delete_tag(name)
            except Exception:
                pass  # already gone; the manifest removal is authoritative
    del points[name]
    registry.store.write_text(
        _syncpoints_path(registry), json.dumps(points, indent=2)
    )
    return True


def replay_all(
    spark: SparkSession,
    registry: TableRegistry,
    only: list[str] | None = None,
    sync_point: str | None = None,
    phase: str = "all",
) -> dict[str, dict]:
    """One sweep over every enabled registry entry: independent replays,
    independent watermarks, independent failures. Returns per-table
    results; a failed table reports its error and never blocks the rest.

    ``phase`` splits the sweep for orchestrators (the reference's
    ``run_import_and_etl_separate`` Airflow mode, Schedule/Airflow.py):
    ``'replay'`` ingests the change log only; ``'derived'`` advances the
    entry's derived targets (mirror/views/CDC exports) and storage
    upkeep only — safe standalone because every derived target keeps
    its own watermark; ``'all'`` (default) does both in order. Skipping
    is idempotent either way: a ``'derived'`` sweep with no new source
    commits reports each target ``skipped``.
    """
    from dbimport_spark.lake.table import LakeTable
    from dbimport_spark.plans.engine import CDCEngine
    from dbimport_spark.plans.validate import max_delete_fraction as _mdf

    if phase not in ("all", "replay", "derived"):
        raise ValueError(f"phase must be all|replay|derived, got {phase!r}")
    if sync_point is not None and phase == "replay":
        # a freeze cut before the derived syncs would tag mirrors/views
        # at stale pre-sweep versions under a name that promises
        # consistency — cut it from the 'derived' (or 'all') sweep
        raise ValueError(
            "sync_point with phase='replay' would freeze derived targets "
            "at stale versions — pass it to the phase='derived' sweep"
        )
    entries = registry.load()
    results: dict[str, dict] = {}
    # a typo'd --only name must surface as a failure, not an empty green
    # sweep (replaying nothing while reporting success)
    for name in only or []:
        if name not in entries:
            results[name] = {"ok": False, "error": "not registered"}
    for name, e in entries.items():
        if only is not None and name not in only:
            continue
        if not e.enabled:
            # a disabled table reached by the normal sweep is a benign
            # skip; one EXPLICITLY requested via --only was not replayed
            # as asked — surface that as a failure, not a green no-op
            if only is not None:  # the loop filter guarantees name in only
                results[name] = {"ok": False, "error": "disabled"}
            else:
                results[name] = {"ok": True, "skipped": "disabled"}
            continue
        try:
            table = LakeTable.load(e.table_root)
            if phase != "derived":
                eng = CDCEngine(
                    spark,
                    table,
                    checkpoint_dir=e.checkpoint,
                    history_table=(
                        LakeTable.load(e.history) if e.history else None
                    ),
                    renames=e.renames,
                    anonymize=e.anonymize,
                    anonymize_salt=e.anonymize_salt,
                    write_mode=e.write_mode,
                    quarantine_dir=e.quarantine_dir,
                    validators=(
                        None
                        if e.max_delete_fraction is None
                        else [_mdf(e.max_delete_fraction)]
                    ),
                    state_store=registry.store,
                )
                changes = spark.read.option("mergeSchema", "true").parquet(
                    e.log_path
                )
                stats = eng.replay(changes, num_batches=e.batches)
                results[name] = {
                    "ok": True,
                    "batches_applied": stats.batches_applied,
                    "batches_skipped": stats.batches_skipped,
                    "events_applied": stats.events_applied,
                    "last_lsn": table.last_lsn(),
                }
            else:
                results[name] = {"ok": True, "last_lsn": table.last_lsn()}
            if phase != "replay":
                _sync_derived(
                    spark, table, e, results[name], store=registry.store
                )
                if e.maintenance and results[name].get("ok"):
                    _run_maintenance(spark, table, e, results[name])
        except Exception as exc:  # isolate per-table failures, keep sweeping
            results[name] = {
                "ok": False,
                "error": f"{type(exc).__name__}: {exc}",
            }
    if sync_point is not None:
        # cut the freeze only over an ALL-green sweep: a sync point whose
        # manifest silently excluded a failed table would read as "the
        # warehouse as of X" while missing a member
        if all(r.get("ok") for r in results.values()):
            try:
                swept = [
                    n for n, r in results.items() if "skipped" not in r
                ]
                create_sync_point(registry, sync_point, only=swept or None)
                results["_sync_point"] = {"ok": True, "name": sync_point}
            except Exception as exc:
                results["_sync_point"] = {
                    "ok": False,
                    "error": f"{type(exc).__name__}: {exc}",
                }
        else:
            results["_sync_point"] = {
                "ok": False,
                "error": "sweep had failures — sync point not created",
            }
    return results


def _run_maintenance(
    spark: SparkSession, table, e: TableEntry, result: dict
) -> None:
    """Per-entry storage upkeep after a fully-successful sweep step.

    Order matters: the rebucket growth check runs first (a rebucket is a
    full rewrite, so it leaves every bucket at one file — compacting
    after it would be a no-op anyway), then threshold compaction, then
    snapshot expiry. Gated on the entry's replay AND derived syncs having
    succeeded, so expiry never removes a delta base a lagging mirror or
    view still needs (they would otherwise be forced through the
    on_gap='full' reconcile). Failures are recorded and flip the entry's
    ``ok`` — every step is idempotent, the next sweep retries."""
    m = e.maintenance
    rec: dict = {}
    try:
        if "target_bytes_per_bucket" in m:
            from dbimport_spark.lake.maintenance import auto_rebucket

            rec["rebucket"] = auto_rebucket(
                spark,
                table,
                target_bytes_per_bucket=int(m["target_bytes_per_bucket"]),
                max_buckets=int(m.get("max_buckets", 4096)),
            )
        if "max_files_per_bucket" in m and not rec.get("rebucket", {}).get(
            "rebucketed"
        ):
            from dbimport_spark.lake.maintenance import compact

            rec["compact"] = compact(
                spark, table, max_files_per_bucket=int(m["max_files_per_bucket"])
            )
        if "expire_keep_last" in m:
            table.expire_snapshots(keep_last=int(m["expire_keep_last"]))
            rec["expired_keep_last"] = int(m["expire_keep_last"])
        rec["ok"] = True
    except Exception as exc:
        rec["ok"] = False
        rec["error"] = f"{type(exc).__name__}: {exc}"
        result["ok"] = False
    result["maintenance"] = rec


def _pin_name(kind: str, root: str) -> str:
    """Deterministic retention-pin name for a derived target: readable
    basename plus a short hash of the full root (two targets sharing a
    basename must not share a pin)."""
    import hashlib
    import os

    h = hashlib.md5(root.encode()).hexdigest()[:6]
    base = "".join(
        ch if ch.isalnum() or ch in "._-" else "_"
        for ch in os.path.basename(root.rstrip("/")) or "t"
    )
    return f"{kind}:{base}-{h}"


def _sync_derived(
    spark: SparkSession, table, e: TableEntry, result: dict, store=None
) -> None:
    """Advance the entry's derived targets (mirror, matviews, CDC JDBC
    exports) after a
    successful replay — the reference's copy phase runs the same way,
    per table, after its import phase (bin/import COPY PHASE,
    copy_operations.py). Each derived target has its own watermark (its
    table's LSN = source version), so a failed derived sync is recorded,
    flips the entry's ``ok``, and is simply retried by the next sweep —
    it never rolls back or blocks the table's own replay, and never
    blocks other tables."""
    from dbimport_spark.lake.table import LakeTable
    from dbimport_spark.plans.engine import CDCEngine

    if e.mirror_root:
        try:
            from dbimport_spark.plans.mirror import sync_mirror

            bs = sync_mirror(
                spark, table, CDCEngine(spark, LakeTable.load(e.mirror_root)),
                pin_name=_pin_name("mirror", e.mirror_root),
            )
            result["mirror"] = {"ok": True, "skipped": bs.skipped,
                                "events": bs.events}
        except Exception as exc:
            result["mirror"] = {
                "ok": False, "error": f"{type(exc).__name__}: {exc}"
            }
            result["ok"] = False
    if e.views:
        out = []
        for v in e.views:
            try:
                from dbimport_spark.plans.matview import AggSpec, sync_view

                spec = AggSpec(
                    group_cols=list(v["group_by"]),
                    sum_cols=list(v.get("sum", [])),
                    min_cols=list(v.get("min", [])),
                    max_cols=list(v.get("max", [])),
                )
                bs = sync_view(
                    spark,
                    table,
                    CDCEngine(spark, LakeTable.load(v["root"])),
                    spec,
                    pin_name=_pin_name("view", v["root"]),
                )
                out.append({"root": v["root"], "ok": True,
                            "skipped": bs.skipped, "groups": bs.events})
            except Exception as exc:
                out.append({
                    "root": v.get("root"), "ok": False,
                    "error": f"{type(exc).__name__}: {exc}",
                })
                result["ok"] = False
        result["views"] = out
    if e.cdc_exports:
        out = []
        for x in e.cdc_exports:
            try:
                from dbimport_spark.plans.cdc_export import CDCJdbcExporter

                exp = CDCJdbcExporter(
                    table,
                    x["url"],
                    x["target_table"],
                    state_dir=x["state_dir"],
                    properties=x.get("properties"),
                    state_store=store,  # the registry's statestore seam
                    pin_name=_pin_name("export", x["state_dir"]),
                    dialect=x.get("dialect"),
                )
                st = exp.sync(spark, on_gap=x.get("on_gap", "error"))
                out.append({"target": x["target_table"], "ok": True,
                            "skipped": st.get("skipped", False),
                            "rows": st.get("rows", 0)})
            except Exception as exc:
                out.append({
                    "target": x.get("target_table"), "ok": False,
                    "error": f"{type(exc).__name__}: {exc}",
                })
                result["ok"] = False
        result["cdc_exports"] = out
