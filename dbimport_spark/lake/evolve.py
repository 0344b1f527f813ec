"""Additive schema evolution (reference import_operations.py:2661-2958).

Rules carried over from the reference:
- **Add**: new columns arrive nullable, metadata-only, no data rewrite
  (Iceberg-style additive evolution; reference 2808-2829). Old files are
  read through the new schema and yield nulls.
- **Never drop**: source-side column drops are NOT propagated — data
  safety (reference deliberately disables this, 2852-2868).
- **Type change**: only safe widenings are accepted (int→bigint,
  float→double — the reference ALTERs compatible types at 2884 and hard-
  errors otherwise at 2907-2911). We hard-error on any non-identical type:
  with schema-on-read over parquet a widening would require a rewrite, so
  it is out of additive scope.

New columns are appended *before* the audit columns so the audit block
stays trailing.
"""

from __future__ import annotations

from pyspark.sql import types as T

from dbimport_spark.schema import AUDIT_COLUMNS


class SchemaEvolutionError(Exception):
    pass


def diff_payload_schema(
    table_schema: T.StructType, batch_schema: T.StructType, ignore: set[str] | None = None
) -> list[T.StructField]:
    """Fields present in the batch but not the table (the additive delta).

    ``ignore`` lists change-log bookkeeping columns (lsn/op/commit_ts) that
    never become table columns. Type mismatches on shared columns raise.
    """
    ignore = ignore or set()
    existing = {f.name: f for f in table_schema.fields}
    added: list[T.StructField] = []
    for f in batch_schema.fields:
        if f.name in ignore:
            continue
        cur = existing.get(f.name)
        if cur is None:
            added.append(T.StructField(f.name, f.dataType, True))  # always nullable
        elif cur.dataType != f.dataType:
            raise SchemaEvolutionError(
                f"incompatible type change for column {f.name!r}: "
                f"{cur.dataType.simpleString()} -> {f.dataType.simpleString()} "
                "(only additive evolution is supported)"
            )
    return added


def evolve_schema(table_schema: T.StructType, added: list[T.StructField]) -> T.StructType:
    """Append new nullable fields before the trailing audit columns."""
    if not added:
        return table_schema
    fields = list(table_schema.fields)
    audit = [f for f in fields if f.name in AUDIT_COLUMNS]
    rest = [f for f in fields if f.name not in AUDIT_COLUMNS]
    return T.StructType(rest + added + audit)
