"""Incremental export: lake table → parquet dir / JDBC (reference reverse
direction, SURVEY.md §3.2, export_operations.py:706-1117).

The reference exports Hive/Iceberg tables back to an RDBMS or S3 parquet
with an incremental filter and a pending/committed watermark
(export_operations.py:1058-1079, configSchema.py:410-415). Here:

- the incremental column is the engine's own ``dl_update_ts`` audit column
  (every merge stamps it, so "rows changed since the last export" is exact);
- full mode re-exports everything;
- the export watermark is committed to a JSON state file atomically AFTER
  the export lands (two-phase: crash ⇒ re-export the same window; the
  overwrite-by-run-directory layout makes re-export idempotent);
- sink = parquet directory (S13 analogue; no S3/JDBC drivers in sandbox —
  the JDBC sink reuses sources/jdbc.py option construction and
  ``df.write.jdbc`` when a driver is present).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.lake.table import LakeTable
from dbimport_spark.schema import AUDIT_COLUMNS, AUDIT_UPDATE


class ParquetExporter:
    def __init__(self, table: LakeTable, out_dir: str, include_audit: bool = False):
        self.table = table
        self.out_dir = out_dir
        self.include_audit = include_audit

    @property
    def _state_path(self) -> str:
        return os.path.join(self.out_dir, "_export_state.json")

    def _state(self) -> dict:
        if os.path.isfile(self._state_path):
            with open(self._state_path) as fh:
                return json.load(fh)
        return {"last_update_ts": None, "runs": 0}

    def _save_state(self, state: dict) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self._state_path)

    def export(self, spark: SparkSession, mode: str = "incr") -> dict:
        """Run one export. mode='incr' exports rows with
        dl_update_ts > last exported watermark; 'full' exports all."""
        state = self._state()
        df = self.table.read(spark)
        hi_row = df.agg(F.max(AUDIT_UPDATE).alias("hi")).first()
        hi = hi_row["hi"]
        last = state["last_update_ts"]
        if mode == "incr" and last is not None:
            df = df.filter(F.col(AUDIT_UPDATE) > F.lit(last).cast("timestamp"))
        if not self.include_audit:
            df = df.drop(*[c for c in AUDIT_COLUMNS if c in df.columns])
        run_dir = os.path.join(self.out_dir, f"run-{state['runs']:05d}")
        df.write.mode("overwrite").parquet(run_dir)
        n = spark.read.parquet(run_dir).count()  # export validation count
        # commit point: watermark promoted only after the data landed
        state = {
            "last_update_ts": hi.isoformat() if hi is not None else last,
            "runs": state["runs"] + 1,
            "last_run_rows": n,
            "last_run_dir": run_dir,
            "mode": mode,
        }
        self._save_state(state)
        return state


def export_to_jdbc(df: DataFrame, url: str, table: str, properties: dict | None = None):
    """JDBC export sink (reference export_operations.py:1076-1079):
    ``df.write.mode('append').jdbc(...)``. Requires a JDBC driver on the
    classpath — not available in this sandbox; kept thin and untested
    beyond construction."""
    return df.write.mode("append").jdbc(url, table, properties=properties or {})
