"""Recursive nested-schema normalization (reference Mongo path, §1.4).

The reference rewrites Spark-inferred document schemas before landing them:
``StructType/StructField/ArrayType`` walked recursively, ``BinaryType →
StringType`` (base64), ``NullType → StringType``, optionally
``Date/Timestamp → StringType`` (reference import_operations.py:686-713;
the binary/date fixups are UDFs in sparkUDF2.py:39-72 — here they are
pure column expressions, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_type(dt: T.DataType, dates_to_string: bool = False) -> T.DataType:
    """The normalized type for dt (recursive)."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, normalize_type(f.dataType, dates_to_string), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(normalize_type(dt.elementType, dates_to_string), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            normalize_type(dt.keyType, dates_to_string),
            normalize_type(dt.valueType, dates_to_string),
            True,
        )
    if isinstance(dt, (T.BinaryType, T.NullType)):
        return T.StringType()
    if dates_to_string and isinstance(dt, (T.DateType, T.TimestampType)):
        return T.StringType()
    return dt


def _convert(col: Column, dt: T.DataType, dates_to_string: bool) -> Column:
    if isinstance(dt, T.StructType):
        rebuilt = F.struct(
            *[
                _convert(col.getField(f.name), f.dataType, dates_to_string).alias(f.name)
                for f in dt.fields
            ]
        )
        # preserve struct-level nullability: rebuilding a NULL struct would
        # otherwise yield a non-null struct of all-null fields
        return F.when(col.isNotNull(), rebuilt)
    if isinstance(dt, T.ArrayType):
        return F.transform(col, lambda x: _convert(x, dt.elementType, dates_to_string))
    if isinstance(dt, T.MapType):
        return F.map_from_arrays(
            F.transform(
                F.map_keys(col), lambda k: _convert(k, dt.keyType, dates_to_string)
            ),
            F.transform(
                F.map_values(col), lambda v: _convert(v, dt.valueType, dates_to_string)
            ),
        )
    if isinstance(dt, T.BinaryType):
        return F.base64(col)  # reference base64EncodeArray analogue
    if isinstance(dt, T.NullType):
        return col.cast("string")
    if dates_to_string and isinstance(dt, (T.DateType, T.TimestampType)):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col


def normalize_dataframe(df: DataFrame, dates_to_string: bool = False) -> DataFrame:
    """Apply the recursive normalization to every column — pure JVM-side
    expressions (base64/transform/map rebuild), no per-row Python."""
    return df.select(
        *[
            # df[name], not F.col(name): Mongo-inferred top-level keys
            # may contain dots ('user.name' is legal since Mongo 3.6),
            # which F.col would mis-parse as a nested field path
            _convert(df[f.name], f.dataType, dates_to_string).alias(f.name)
            for f in df.schema.fields
        ]
    )


def flatten_image_columns(
    fields: list[T.StructField],
    src_for,
    key_field: str,
    taken: set[str],
    flatten: bool = True,
    what: str = "image field",
) -> list[Column]:
    """Project the non-key fields of a row image to output columns: one
    level of ``parent__child`` struct flattening (the reference's Mongo
    subdocument flatten, import_operations.py:686-713) plus a collision
    guard against the change-envelope columns and earlier flattened names.

    Shared by sources/jsonlog.py and sources/debezium.py — ``src_for(name)``
    supplies the Column for an image field (each source picks its own row
    image), ``taken`` holds the reserved output names and is mutated as
    names are claimed.
    """
    cols: list[Column] = []
    for f in fields:
        if f.name == key_field:
            continue
        src = src_for(f.name)
        if flatten and isinstance(f.dataType, T.StructType):
            emit = [
                (f"{f.name}__{sub.name}", src.getField(sub.name))
                for sub in f.dataType.fields
            ]
        else:
            emit = [(f.name, src)]
        for name, col in emit:
            if name in taken:
                raise ValueError(
                    f"{what} {name!r} collides with a change-envelope "
                    "column or another flattened field — rename it in "
                    "the source or map it explicitly"
                )
            taken.add(name)
            cols.append(col.alias(name))
    return cols
