"""Schema evolution: additive columns, type widening, rename detection
(reference import_operations.py:2661-2958).

Rules carried over from the reference:
- **Add**: new columns arrive nullable, metadata-only, no data rewrite
  (Iceberg-style additive evolution; reference 2808-2829). Old files are
  read through the new schema and yield nulls.
- **Never drop**: source-side column drops are NOT propagated — data
  safety (reference deliberately disables this, 2852-2868).
- **Type widening**: compatible widenings (int chain byte→short→int→bigint,
  float→double, decimal precision growth) are applied metadata-only — the
  reference ALTERs compatible types (import_operations.py:2884) and hard-
  errors on incompatible ones (2907-2911). Spark ≥4.0 parquet readers
  upcast narrow physical types through a wider read schema natively
  (SPARK-40876), so no data rewrite is needed. A batch column *narrower*
  than the table's is not an evolution at all — the batch is cast up.
- **Rename**: the reference treats a same-position same-type name change
  as a rename (import_operations.py:2737-2795). We detect that pattern and
  raise ``RenameSuspected`` — silently treating it as add-new would fork
  the data (old column frozen as nulls). The caller resolves it with an
  explicit rename mapping (``LakeTable.rename_column`` — metadata-only,
  old files are read through a name-mapped schema, Iceberg-style).

New columns are appended *before* the audit columns so the audit block
stays trailing.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from dbimport_spark.schema import AUDIT_COLUMNS


class SchemaEvolutionError(Exception):
    pass


class RenameSuspected(SchemaEvolutionError):
    """Batch looks like it renamed column(s): same position, same type.
    Resolve with an explicit rename mapping instead of silently forking."""


_INT_RANK = {T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2, T.LongType(): 3}
_FLOAT_RANK = {T.FloatType(): 0, T.DoubleType(): 1}


def compare_types(cur: T.DataType, new: T.DataType) -> str:
    """'same' | 'widen' (new is a safe widening of cur) |
    'narrow' (new is narrower but compatible — cast the batch up) |
    'incompatible'."""
    if cur == new:
        return "same"
    for rank in (_INT_RANK, _FLOAT_RANK):
        if cur in rank and new in rank:
            return "widen" if rank[new] > rank[cur] else "narrow"
    if isinstance(cur, T.DecimalType) and isinstance(new, T.DecimalType):
        # safe iff both the integral digits and the scale don't shrink
        cur_int, new_int = cur.precision - cur.scale, new.precision - new.scale
        if new_int >= cur_int and new.scale >= cur.scale:
            return "widen"
        if cur_int >= new_int and cur.scale >= new.scale:
            return "narrow"
        return "incompatible"
    return "incompatible"


@dataclass
class SchemaDelta:
    """The evolution a batch demands: columns to add, columns to widen,
    column comments to (re)apply."""

    added: list[T.StructField] = field(default_factory=list)
    widened: list[T.StructField] = field(default_factory=list)
    # (column, new comment) — metadata-only, applied as part of the same
    # snapshot commit (reference applies comment changes as table ALTERs,
    # import_operations.py:2952-2956)
    commented: list[tuple[str, str]] = field(default_factory=list)

    def __bool__(self) -> bool:
        return bool(self.added or self.widened or self.commented)


def diff_payload_schema(
    table_schema: T.StructType,
    batch_schema: T.StructType,
    ignore: set[str] | None = None,
    check_renames: bool = True,
    engine_cols: set[str] | None = None,
) -> SchemaDelta:
    """The evolution delta a batch demands from the table schema.

    ``ignore`` lists change-log bookkeeping columns (lsn/op/commit_ts) that
    never become table columns. ``engine_cols`` lists table columns the
    ENGINE stamps (e.g. the dl_source provenance label) — absent from every
    batch by design, so they must not count as "dropped" in the rename
    heuristic. Incompatible type changes raise ``SchemaEvolutionError``; a
    same-position same-type add+drop pattern raises ``RenameSuspected``
    (reference rename heuristic, import_operations.py:2737-2795).
    """
    ignore = ignore or set()
    existing = {f.name: f for f in table_schema.fields}
    delta = SchemaDelta()
    for f in batch_schema.fields:
        if f.name in ignore:
            continue
        cur = existing.get(f.name)
        if cur is None:
            delta.added.append(
                T.StructField(f.name, f.dataType, True, f.metadata)
            )  # always nullable; source comment metadata carried along
            continue
        # comment propagation (reference ALTERs comments on change,
        # import_operations.py:2952-2956): only when the batch CARRIES a
        # comment that differs — a batch without metadata (the normal case
        # for parquet change logs) never clears an existing comment,
        # mirroring the never-drop column rule.
        new_comment = (f.metadata or {}).get("comment")
        if new_comment and new_comment != (cur.metadata or {}).get("comment"):
            delta.commented.append((f.name, new_comment))
        rel = compare_types(cur.dataType, f.dataType)
        if rel == "widen":
            delta.widened.append(T.StructField(f.name, f.dataType, True))
        elif rel == "incompatible":
            raise SchemaEvolutionError(
                f"incompatible type change for column {f.name!r}: "
                f"{cur.dataType.simpleString()} -> {f.dataType.simpleString()} "
                "(only safe widenings are supported). If the source really "
                "changed the type, declare a full reload — "
                "CDCEngine.full_reload(changes) / CLI replay --full-reload — "
                "to re-create the table at the new schema and replay from "
                "LSN 0."
            )
        # 'same' / 'narrow': no evolution (narrow batch columns are cast up)

    if delta.added and check_renames:
        _check_rename_pattern(
            table_schema, batch_schema, delta, ignore, engine_cols or set()
        )
    return delta


def _check_rename_pattern(
    table_schema: T.StructType,
    batch_schema: T.StructType,
    delta: SchemaDelta,
    ignore: set[str],
    engine_cols: set[str],
) -> None:
    """Raise RenameSuspected when added/missing columns pair up by payload
    position and type — the reference's rename signature. A batch that
    merely lacks new table columns (old log segment) has no added columns
    and never trips this."""
    batch_names = {f.name for f in batch_schema.fields}
    table_payload = [
        f
        for f in table_schema.fields
        if f.name not in AUDIT_COLUMNS and f.name not in engine_cols
    ]
    batch_payload = [f for f in batch_schema.fields if f.name not in ignore]
    missing = [f for f in table_payload if f.name not in batch_names]
    if not missing:
        return
    tbl_pos = {f.name: i for i, f in enumerate(table_payload)}
    bat_pos = {f.name: i for i, f in enumerate(batch_payload)}
    pairs = []
    for m in missing:
        for a in delta.added:
            if (
                tbl_pos[m.name] == bat_pos.get(a.name)
                and compare_types(m.dataType, a.dataType) in ("same", "widen", "narrow")
            ):
                pairs.append((m.name, a.name))
                break
    # ANY positional+type-compatible (missing, added) pair is suspicious —
    # a rename mixed with genuine adds in one batch must not slip through
    # just because the counts differ
    if pairs:
        mapping = ", ".join(f"{o!r} -> {n!r}" for o, n in pairs)
        raise RenameSuspected(
            f"batch schema looks like a column rename ({mapping}): same "
            "payload position and compatible type. Treating it as add-new "
            "would freeze the old column as nulls. If this IS a rename, "
            "declare it (CDCEngine(renames={...}) / LakeTable."
            "rename_column); if it is a genuine drop+add, declare "
            "rename_check=False (CLI --no-rename-check) or add the column "
            "in a separate step."
        )


def evolve_schema(table_schema: T.StructType, delta: SchemaDelta) -> T.StructType:
    """Apply a delta: widen types in place, update comments in place,
    append new nullable fields before the trailing audit columns."""
    if not delta:
        return table_schema
    wider = {f.name: f.dataType for f in delta.widened}
    comments = dict(delta.commented)
    fields = [
        T.StructField(
            f.name,
            wider.get(f.name, f.dataType),
            f.nullable,
            (
                {**(f.metadata or {}), "comment": comments[f.name]}
                if f.name in comments
                else f.metadata
            ),
        )
        for f in table_schema.fields
    ]
    audit = [f for f in fields if f.name in AUDIT_COLUMNS]
    rest = [f for f in fields if f.name not in AUDIT_COLUMNS]
    return T.StructType(rest + list(delta.added) + audit)
