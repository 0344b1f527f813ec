"""Per-partition lineage across snapshots.

Analogue of the reference's import_statistics / import_stage_statistics
(configSchema.py:489-585): every commit records, per bucket, the applied
batch's first/last LSN, event count, and output rows/bytes — stamped inside
the same atomic snapshot as the data, so lineage can never double-count a
replayed batch.
"""

from __future__ import annotations

from dbimport_spark.lake.table import LakeTable


def lineage_history(table: LakeTable) -> list[dict]:
    """Flatten lineage records across all retained snapshots."""
    out: list[dict] = []
    for v in table.snapshots():
        snap = table.snapshot(v)
        for rec in snap.lineage:
            out.append({"version": v, "snapshot_id": snap.snapshot_id, **rec})
    return out


def per_bucket_offsets(table: LakeTable) -> dict[int, int]:
    """Per-partition committed offsets: bucket → highest applied LSN,
    folded from the lineage stamped in retained snapshots (the
    "checkpoints per-partition offsets" surface of the north star; the
    scalar table watermark is their global max)."""
    out: dict[int, int] = {}
    for v in table.snapshots():
        for rec in table.snapshot(v).lineage:
            # quarantine / repair records carry no bucket — they describe
            # diverted or re-folded events, not a per-partition offset
            b = rec.get("bucket")
            if b is None:
                continue
            out[b] = max(out.get(b, -1), rec.get("last_lsn", -1))
    return out


def table_totals(table: LakeTable) -> dict:
    """Current-table totals from file metadata (no data scan)."""
    snap = table.current()
    return {
        "version": snap.version,
        "snapshot_id": snap.snapshot_id,
        "files": len(snap.files),
        "rows": sum(f.rows for f in snap.files),
        "bytes": sum(f.bytes for f in snap.files),
        "buckets": len({f.bucket for f in snap.files}),
        "last_lsn": int(snap.properties.get("last_lsn", "-1")),
    }
