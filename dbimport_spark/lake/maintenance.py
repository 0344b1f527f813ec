"""Table maintenance: compaction + snapshot expiry.

Analogues of the reference's storage upkeep: Hive compaction
(import_operations.py:3106-3155) / Iceberg ``rewrite_data_files`` +
``expire_snapshots`` (import_operations.py:1513-1535).

The broadcast merge path appends files per commit without shuffling the
target, so buckets accumulate files until compacted — the classic CoW
write-amplification vs read-amplification dial. ``compact`` rewrites only
buckets whose file count exceeds the threshold (bucket-pruned, one pass,
no shuffle: read bucket files → coalesce → rewrite).
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dbimport_spark.lake.table import LakeTable


def buckets_needing_compaction(table: LakeTable, max_files_per_bucket: int = 4) -> list[int]:
    counts: dict[int, int] = {}
    for f in table.current().files:
        counts[f.bucket] = counts.get(f.bucket, 0) + 1
    return sorted(b for b, n in counts.items() if n > max_files_per_bucket)


def compact(
    spark: SparkSession,
    table: LakeTable,
    max_files_per_bucket: int = 4,
    expire_keep_last: int | None = None,
) -> dict:
    """Rewrite fragmented buckets to one file each; optionally expire old
    snapshots afterwards. Commits one new snapshot (atomic, no data change
    — content-preserving, verified by tests)."""
    snap = table.current()
    todo = buckets_needing_compaction(table, max_files_per_bucket)
    if not todo:
        return {"compacted_buckets": 0, "files_before": len(snap.files)}
    df = table.read(spark, buckets=todo)
    bexpr = F.pmod(F.xxhash64(F.col(snap.bucket_column)), F.lit(snap.num_buckets)).cast(
        "int"
    )
    out = df.withColumn("_bucket", bexpr).repartition(len(todo), "_bucket")
    version_dir = f"compact-{snap.version + 1}-{uuid.uuid4().hex[:8]}"
    new_files = table.write_data_files(spark, out, version_dir)
    table.commit(
        new_files,
        replaced_buckets=set(todo),
        properties={"last_compaction_version": str(snap.version + 1)},
        expected_version=snap.version,
    )
    if expire_keep_last is not None:
        table.expire_snapshots(keep_last=expire_keep_last)
    return {
        "compacted_buckets": len(todo),
        "files_before": len(snap.files),
        "files_after": len(table.current().files),
    }
