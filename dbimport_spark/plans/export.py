"""Incremental export: lake table → parquet dir / JDBC (reference reverse
direction, SURVEY.md §3.2, export_operations.py:706-1117).

The reference exports Hive/Iceberg tables back to an RDBMS or S3 parquet
with an incremental filter and a pending/committed watermark
(export_operations.py:1058-1079, configSchema.py:410-415). Here:

- the incremental column is the engine's own ``dl_update_ts`` audit column
  (every merge stamps it, so "rows changed since the last export" is exact);
- full mode re-exports everything;
- the export watermark is committed to a JSON state file atomically AFTER
  the export lands (two-phase: crash ⇒ re-export the same window);
- row count AND the new watermark come from a single ``Observation`` on
  the export write itself — no second scan of the exported data, and no
  separate max-timestamp scan of the table (at a 100 TB export the old
  re-read doubled the IO). The watermark observed over the exported window
  equals the table max: in incr mode any row carrying the table max has
  ``dl_update_ts > last`` and is in the window; an empty window means the
  table max hasn't moved, so the old watermark stands.

Sinks share one state machine (``_IncrementalExporter``):

- ``ParquetExporter`` (S13): one ``run-NNNNN`` directory per window;
  overwrite-by-run-directory makes crash re-export idempotent.
- ``JdbcExporter`` (S12, reference export_operations.py:1058-1079): append
  per window (full mode overwrites). Complex columns (array/map/struct —
  e.g. the token arrays) are serialized with ``to_json`` because an RDBMS
  has no array type, mirroring how the reference flattens for export.
  Idempotency caveat, stated plainly: a crash AFTER the JDBC append but
  BEFORE the state commit re-appends the same window on retry — dedupe at
  the target with a primary key / staging table, exactly as the reference
  requires; the parquet sink does not share this caveat.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbimport_spark.lake.table import LakeTable
from dbimport_spark.schema import AUDIT_COLUMNS, AUDIT_DELETE, AUDIT_UPDATE


class _IncrementalExporter:
    """Watermark state machine shared by every export sink.

    State file layout: ``{"last_update_ts": iso-or-null, "runs": N, ...}``
    committed via tmp+rename only after the sink write succeeded — the
    two-phase pending/committed watermark the reference keeps in its config
    database (export_operations.py:1058-1079)."""

    def __init__(
        self,
        table: LakeTable,
        state_dir: str,
        include_audit: bool = False,
        state_store=None,
    ):
        from dbimport_spark.lake.statestore import DEFAULT_STORE

        self.table = table
        self.state_dir = state_dir
        self.include_audit = include_audit
        # watermark state rides the small-state seam (lake/statestore.py)
        self.state_store = state_store or DEFAULT_STORE

    @property
    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "_export_state.json")

    def _state(self) -> dict:
        text = self.state_store.read_text(self._state_path)
        if text is not None:
            return json.loads(text)
        return {"last_update_ts": None, "runs": 0}

    def _save_state(self, state: dict) -> None:
        self.state_store.write_text(self._state_path, json.dumps(state))

    def _write(
        self, spark: SparkSession, df: DataFrame, state: dict, mode: str
    ) -> dict:
        """Sink hook: land ``df``, return sink-specific info for the state
        record. Must be a single Spark action on ``df`` (the Observation
        rides it)."""
        raise NotImplementedError

    def export(self, spark: SparkSession, mode: str = "incr") -> dict:
        """Run one export window. mode='incr' exports rows with
        dl_update_ts > the committed watermark; 'full' exports all."""
        if mode not in ("incr", "full"):
            raise ValueError("mode must be 'incr' or 'full'")
        state = self._state()
        last = state["last_update_ts"]
        if mode == "incr" and last is not None:
            # metadata-only bucket pruning via per-file dl_update_ts stats
            # (DataFile.stats): a bucket whose every file's max update-ts
            # is at or before the watermark cannot contribute a row to the
            # strict > filter below (which still runs — pruning is an
            # optimization, never the correctness boundary). The raw-micros
            # conversion is exact: the session pins UTC + TIMESTAMP_MICROS
            # and the watermark isoformat round-trips microseconds. At the
            # 100 TB design point this turns a full-table scan per export
            # run into touched-buckets-only.
            from datetime import datetime

            from dbimport_spark.lake.table import ts_micros

            wm = ts_micros(datetime.fromisoformat(last))
            # ONE pinned snapshot for the prune AND the read: a merge
            # committing between two current() resolutions could prune a
            # bucket from snapshot A that snapshot B's read then skips —
            # its fresh rows would fall behind the promoted watermark and
            # no future incremental run would ever export them
            snap = self.table.current()
            buckets = self.table.buckets_stat_max_gt(
                AUDIT_UPDATE, wm, version=snap.version
            )
            n_total = len({f.bucket for f in snap.files})
            if len(buckets) < n_total:
                import logging

                logging.getLogger(__name__).info(
                    "incremental export: stats pruned %d/%d buckets",
                    n_total - len(buckets), n_total,
                )
            df = self.table.read(spark, buckets=buckets, version=snap.version)
            df = df.filter(F.col(AUDIT_UPDATE) > F.lit(last).cast("timestamp"))
        else:
            df = self.table.read(spark)
        obs = Observation()  # auto-named: names must be unique per session
        df = df.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.max(AUDIT_UPDATE).alias("hi"),
        )
        if not self.include_audit:
            df = df.drop(*[c for c in AUDIT_COLUMNS if c in df.columns])
        info = self._write(spark, df, state, mode)
        got = obs.get
        hi = got["hi"]
        # commit point: watermark promoted only after the data landed
        state = {
            "last_update_ts": hi.isoformat() if hi is not None else last,
            "runs": state["runs"] + 1,
            "last_run_rows": got["rows"],
            "mode": mode,
            **info,
        }
        self._save_state(state)
        return state


class ParquetExporter(_IncrementalExporter):
    def __init__(
        self,
        table: LakeTable,
        out_dir: str,
        include_audit: bool = False,
        state_store=None,
    ):
        super().__init__(
            table,
            state_dir=out_dir,
            include_audit=include_audit,
            state_store=state_store,
        )
        self.out_dir = out_dir

    def _write(
        self, spark: SparkSession, df: DataFrame, state: dict, mode: str
    ) -> dict:
        run_dir = os.path.join(self.out_dir, f"run-{state['runs']:05d}")
        df.write.mode("overwrite").parquet(run_dir)
        # schema sidecar next to the output (reference uploads one with
        # every S3 parquet export, export_operations.py:1067-1073):
        # written atomically BEFORE the watermark commit, so consumers that
        # see a committed run always find a sidecar matching its schema (a
        # crash in between re-exports the window and rewrites the sidecar
        # with identical content)
        schema_path = os.path.join(self.out_dir, "_export_schema.json")
        self.state_store.write_text(schema_path, df.schema.json())
        return {"last_run_dir": run_dir, "schema_file": schema_path}


class JdbcExporter(_IncrementalExporter):
    """Incremental lake → RDBMS export (S12). ``state_dir`` holds the
    watermark state locally (the reference keeps it in its config DB —
    same two-phase semantics). Live-tested against embedded Derby."""

    def __init__(
        self,
        table: LakeTable,
        url: str,
        target_table: str,
        state_dir: str,
        properties: dict | None = None,
        include_audit: bool = False,
        state_store=None,
    ):
        super().__init__(
            table,
            state_dir=state_dir,
            include_audit=include_audit,
            state_store=state_store,
        )
        self.url = url
        self.target_table = target_table
        self.properties = dict(properties or {})

    @staticmethod
    def _flatten_for_rdbms(df: DataFrame) -> DataFrame:
        """Serialize complex-typed columns to JSON strings — RDBMS targets
        have no array/map/struct types (reference flattens likewise on
        export)."""
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                cols.append(F.to_json(F.col(f.name)).alias(f.name))
            else:
                cols.append(F.col(f.name))
        return df.select(*cols)

    def _write(
        self, spark: SparkSession, df: DataFrame, state: dict, mode: str
    ) -> dict:
        # full = TRUNCATE + insert (reference full export). truncate=true
        # matters: without it Spark's JDBC overwrite DROPs and recreates the
        # table, destroying the target's primary key / indexes / grants —
        # including the very PK the incremental path's retry-dedupe relies on
        w = self._flatten_for_rdbms(df).write.mode(
            "overwrite" if mode == "full" else "append"
        )
        if mode == "full":
            w = w.option("truncate", "true")
        w.jdbc(self.url, self.target_table, properties=self.properties)
        return {"target_table": self.target_table}


def export_to_jdbc(df: DataFrame, url: str, table: str, properties: dict | None = None):
    """One-shot stateless JDBC append (reference export_operations.py:
    1076-1079). For watermarked incremental export use ``JdbcExporter``."""
    return df.write.mode("append").jdbc(url, table, properties=properties or {})


def export_snapshot(
    spark: SparkSession,
    table: LakeTable,
    out_dir: str,
    at: int | str,
    include_audit: bool = False,
    include_deleted: bool = False,
) -> dict:
    """One-off full export of a historical snapshot to parquet — "ship the
    corpus as of the freeze tag". ``at`` is any snapshot ref (version, tag
    name, timestamp; ``LakeTable.resolve_ref``).

    On a soft-delete table the shipped corpus is the snapshot's LIVE rows:
    tombstones are records already deleted as of the freeze, and shipping
    them indistinguishable from live rows (the default drops the audit
    marker) would corrupt the corpus. ``include_deleted=True`` keeps them
    for audit shipments — it forces ``include_audit`` so the marker column
    always travels with the rows it explains.

    Deliberately OUTSIDE the incremental watermark state machine: a freeze
    shipment must neither advance nor depend on the live export chain's
    watermark (an AS-OF export re-shipping old rows would otherwise
    rewind it). Output lands in ``<out_dir>/snapshot-v<version>/`` with a
    schema sidecar; overwrite-by-version makes re-runs idempotent."""
    if include_deleted:
        include_audit = True
    v = table.resolve_ref(at)
    df = table.read(spark, version=v)
    if AUDIT_DELETE in df.columns and not include_deleted:
        df = df.filter(F.col(AUDIT_DELETE).isNull())
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    if not include_audit:
        df = df.drop(*[c for c in AUDIT_COLUMNS if c in df.columns])
    dest = os.path.join(out_dir, f"snapshot-v{v}")
    df.write.mode("overwrite").parquet(dest)
    # sidecar through the state-store seam, same as ParquetExporter._write:
    # a bare open() only speaks POSIX, so a non-local out_dir would land
    # the parquet and then crash (or mis-place) the schema file
    from dbimport_spark.lake.statestore import DEFAULT_STORE

    DEFAULT_STORE.write_text(
        os.path.join(dest, "_export_schema.json"), df.schema.json()
    )
    return {"version": v, "at": str(at), "rows": obs.get["rows"], "out": dest}
