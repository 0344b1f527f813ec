"""Anonymization functions — builtin re-expressions of the reference's
row-at-a-time UDFs (sparkUDF2.py:78-111, registered at
import_operations.py:1197-1205 and applied per-column at 1383-1395).

All JVM-side (codegen'd); the seeded-hash variant keeps the reference's
"seed changes the hash" property via a salt argument.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_column(col: Column, salt: str = "") -> Column:
    """Salted SHA-256 hex — analogue of the reference's seeded blake2b
    hashColumn (sparkUDF2.py:78-86)."""
    return F.sha2(F.concat(F.lit(salt), col.cast("string")), 256)


def replace_with_star(col: Column) -> Column:
    """Full mask, length-preserving (sparkUDF2.py:88-99). repeat(), not
    regexp '.': the dot does not match line terminators, so a multi-line
    secret kept its newline structure (line count + per-line lengths)
    visible through the mask."""
    s = col.cast("string")
    return F.repeat(F.lit("*"), F.length(s))


def show_first_four(col: Column) -> Column:
    """First 4 chars kept, rest starred (sparkUDF2.py:101-111).
    Length-preserving for ANY length — the old substring(…, 2_000_000)
    silently truncated gigantic values, and its '.' mask leaked
    newlines. Matches the DuckDB oracle's repeat/greatest form."""
    s = col.cast("string")
    return F.concat(
        F.substring(s, 1, 4),
        F.repeat(F.lit("*"), F.greatest(F.length(s) - 4, F.lit(0))),
    )


ANONYMIZATION = {
    "hash": hash_column,
    "star": replace_with_star,
    "first4": show_first_four,
}


def apply_anonymization(
    df: DataFrame, rules: dict[str, str], salt: str = ""
) -> DataFrame:
    """rules: column -> 'hash' | 'star' | 'first4' (the reference's
    per-column anonymization_function, configSchema.py import_columns)."""
    for col_name, kind in rules.items():
        fn = ANONYMIZATION[kind]
        new = fn(F.col(col_name), salt) if kind == "hash" else fn(F.col(col_name))
        df = df.withColumn(col_name, new)
    return df
