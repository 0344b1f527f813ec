"""Debezium-envelope change source: connector-agnostic binlog/WAL tail.

The reference tails RDBMS change feeds directly (MSSQL Change Tracking /
Oracle Flashback, SURVEY.md S4/S5 — reference import_operations.py change
scans); the industry-standard wire format for the same stream is a
Debezium change event:

    {"before": {...}|null, "after": {...}|null,
     "source": {"lsn": 123, ...connector metadata...},
     "op": "c"|"r"|"u"|"d", "ts_ms": 1700000000000}

optionally wrapped in a Kafka-Connect ``{"schema":…, "payload":…}``
envelope (JsonConverter with ``schemas.enable=true``). This source turns a
directory/glob of JSON-lines Debezium events (a topic dump, a Kafka
Connect file sink, a CDC archive on object storage) into the engine's
change shape ``(lsn, op I/U/D, doc_id, <payload columns>, commit_ts)``
with pure column expressions — schema inference by Spark's JSON reader,
no per-row Python.

Semantics:

- op map: ``c`` (insert) and ``r`` (snapshot read) -> I, ``u`` -> U,
  ``d`` -> D. Snapshot reads are inserts to an empty target — the same
  initial-load-then-tail plan the reference runs (J7).
- row image: ``after`` for c/r/u; ``before`` for d (Debezium's delete
  event carries the final row image in ``before``; ``after`` is null).
- ordering key: an explicit ``lsn_expr`` always wins; otherwise
  ``source.lsn`` (Postgres/SQL Server commit LSN) when present, else
  ``source.pos`` (MySQL binlog offset — valid within a single binlog
  file; multi-file logs must pass ``lsn_expr`` combining file+pos), else
  the envelope ``ts_ms``.
- Kafka tombstones (null value emitted after a delete for log compaction)
  and schema-only lines carry no ``op`` — dropped before projection.
- ``t`` (truncate) and ``m`` (logical message) are documented Debezium
  non-row events with no before/after image — dropped too. Any OTHER op
  value is unknown wire content and flows through as a null-op row, which
  the engine's malformed-event check quarantines (plans/engine.py op_bad).

The result feeds ``CDCEngine.apply_batch`` / ``replay`` unchanged: LWW
dedup, keyed MERGE, watermark commits and schema evolution all operate on
this source exactly as on the native change log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbimport_spark.functions.schema_normalize import normalize_dataframe

ENVELOPE_COLS = ("lsn", "op", "doc_id", "commit_ts")


def read_debezium_changes(
    spark: SparkSession,
    path: str,
    key_field: str = "doc_id",
    lsn_expr: Column | None = None,
    flatten: bool = True,
    dates_to_string: bool = False,
) -> DataFrame:
    """Read JSON-lines Debezium change events into the engine change shape.

    ``key_field`` names the merge key inside the row image (hoisted to
    ``doc_id``). Raises on events with no row images, no resolvable
    ordering key, or image fields that collide with envelope columns.
    """
    raw = spark.read.json(path)
    return _to_change_shape(
        raw, path, key_field, lsn_expr, flatten, dates_to_string
    )


def stream_debezium_changes(
    spark: SparkSession,
    path: str,
    key_field: str = "doc_id",
    lsn_expr: Column | None = None,
    flatten: bool = True,
    dates_to_string: bool = False,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a growing directory of Debezium JSON-lines
    segments — the continuous tail to ``read_debezium_changes``'s batch
    read. The projection is identical (pure column expressions, so it is
    streaming-legal); feed the result to ``streaming.stream.run_stream``
    and the per-segment ledger / watermark machinery applies unchanged
    (the micro-batch classifier keys on ``input_file_name``, which
    survives projections).

    The streaming JSON source needs a fixed schema; by default it is
    inferred ONCE from the files already present (a topic dump always
    starts non-empty — the connector snapshot). Events arriving later
    with NEW image columns read as null until the caller re-infers and
    restarts — pass ``schema`` explicitly to pre-declare evolution,
    exactly like Spark's own streaming JSON contract.
    """
    if schema is None:
        schema = spark.read.json(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(path)
    return _to_change_shape(
        raw, path, key_field, lsn_expr, flatten, dates_to_string
    )


def _to_change_shape(
    raw: DataFrame,
    path: str,
    key_field: str,
    lsn_expr: Column | None,
    flatten: bool,
    dates_to_string: bool,
) -> DataFrame:
    # Kafka-Connect envelope: {"schema": …, "payload": {actual event}}
    if "payload" in raw.columns and isinstance(
        raw.schema["payload"].dataType, T.StructType
    ):
        inner = {f.name for f in raw.schema["payload"].dataType.fields}
        if "op" in inner:
            raw = raw.select("payload.*")

    if "op" not in raw.columns:
        raise ValueError(
            f"debezium log at {path} has no 'op' field (neither top-level "
            "nor under 'payload')"
        )
    # tombstones / schema-only lines: no op -> not a change event;
    # 't' (truncate) / 'm' (logical message) are documented non-row
    # events with no row image — not malformed, just not row changes
    raw = raw.filter(
        F.col("op").isNotNull() & ~F.upper(F.col("op")).isin("T", "M")
    )

    def _struct_fields(name: str) -> list[T.StructField]:
        if name in raw.columns and isinstance(raw.schema[name].dataType, T.StructType):
            return list(raw.schema[name].dataType.fields)
        return []

    after_fields = _struct_fields("after")
    before_fields = _struct_fields("before")
    if not after_fields and not before_fields:
        raise ValueError(
            f"debezium log at {path} has no 'before'/'after' row images"
        )

    source_fields = {f.name for f in _struct_fields("source")}
    if lsn_expr is not None:
        lsn = lsn_expr.cast("long")
    elif "lsn" in source_fields:
        lsn = F.col("source.lsn").cast("long")
    elif "pos" in source_fields:
        lsn = F.col("source.pos").cast("long")
    elif "ts_ms" in raw.columns:
        lsn = F.col("ts_ms").cast("long")
    else:
        raise ValueError(
            "no ordering key: pass lsn_expr (source.lsn / source.pos / "
            "ts_ms all absent)"
        )

    raw_op = F.upper(F.col("op"))
    is_delete = raw_op == "D"
    op = (
        F.when(raw_op.isin("C", "R"), F.lit("I"))
        .when(raw_op == "U", F.lit("U"))
        .when(is_delete, F.lit("D"))
    )

    # union of image fields, after's type winning on overlap; per field the
    # side is picked by op (before for deletes) — null-side access is safe,
    # a null struct yields null fields
    merged: dict[str, tuple[T.DataType, bool, bool]] = {}
    for f in before_fields:
        merged[f.name] = (f.dataType, False, True)
    for f in after_fields:
        _, _, in_before = merged.get(f.name, (None, False, False))
        merged[f.name] = (f.dataType, True, in_before)

    def _image(name: str) -> Column:
        _, in_after, in_before = merged[name]
        if in_after and in_before:
            return F.when(is_delete, F.col(f"before.{name}")).otherwise(
                F.col(f"after.{name}")
            )
        return F.col(f"after.{name}" if in_after else f"before.{name}")

    if key_field not in merged:
        raise ValueError(
            f"key field {key_field!r} not present in the before/after row "
            f"images (have: {sorted(merged)})"
        )

    cols = [
        lsn.alias("lsn"),
        op.alias("op"),
        _image(key_field).cast("string").alias("doc_id"),
    ]
    taken = set(ENVELOPE_COLS)
    for name in merged:
        if name == key_field:
            continue
        src = _image(name)
        dtype = merged[name][0]
        if flatten and isinstance(dtype, T.StructType):
            emit = [(f"{name}__{sub.name}", src.getField(sub.name))
                    for sub in dtype.fields]
        else:
            emit = [(name, src)]
        for out_name, col in emit:
            if out_name in taken:
                raise ValueError(
                    f"image field {out_name!r} collides with a change-"
                    "envelope column or another flattened field — rename "
                    "it in the source or map it explicitly"
                )
            taken.add(out_name)
            cols.append(col.alias(out_name))

    if "ts_ms" in raw.columns:
        cols.append(
            F.timestamp_millis(F.col("ts_ms").cast("long")).alias("commit_ts")
        )

    out = raw.select(*cols)
    return normalize_dataframe(out, dates_to_string=dates_to_string)
