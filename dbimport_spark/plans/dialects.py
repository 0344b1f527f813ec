"""Per-dialect SQL/DDL generation for JDBC export targets.

The reference generates target-side DDL for eight RDBMS dialects on its
export path: CREATE TABLE with per-dialect identifier folding/quoting and
inline comments (export_config.py:1164-1235), a per-dialect column-type
conversion table (convertColumnTypeForTargetTable,
export_config.py:609-760) and an evolve step that diffs the live target
against the desired schema and emits ALTER TABLE ADD / RENAME COLUMN
statements per dialect (updateTargetTable, export_config.py:766-1060).

This module is the Spark-first analogue. Where the reference rewrites
Hive type *strings* with per-dialect regex chains, the input here is the
Spark ``StructType`` the distributed JDBC writer actually ships (after
``JdbcExporter._flatten_for_rdbms`` — complex types already serialized to
JSON strings), mapped through a declarative per-dialect table, so the
generated DDL always agrees with the DataFrame being written.

Deliberate deviations from the reference's map, each because the
reference's choice loses data this engine's invariants care about:

- MSSQL ``double`` -> ``FLOAT`` (53-bit), not the reference's ``real``
  (24-bit) — a silent precision loss;
- MSSQL ``timestamp`` -> ``DATETIME2(6)``, not ``datetime`` (3.33 ms
  granularity) — watermark comparisons need microseconds;
- Oracle ``timestamp`` -> ``TIMESTAMP``, not ``DATE`` (second
  granularity), same reason.

Everything else follows the reference mapping (Oracle NUMBER(n) ladders,
BINARY_DOUBLE, boolean -> NUMBER(1)/TINYINT/SMALLINT per target, CLOB /
VARCHAR(MAX) / LONGTEXT / TEXT for unbounded strings, upper-fold on
Oracle/DB2, lower-fold on PostgreSQL, case-preserving quotes on
Snowflake).

Key columns get a bounded ``VARCHAR(n)`` instead of the dialect's
unbounded text type: every dialect either refuses to index/compare its
LOB type (Derby CLOB, Oracle CLOB, DB2 CLOB) or pays dearly for it, and
the staging merge joins on the keys (plans/cdc_export.py). Key columns
are also NOT NULL so they can carry the PRIMARY KEY the incremental
export's retry-dedupe relies on (plans/export.py:224-228).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

__all__ = [
    "DIALECTS",
    "Dialect",
    "add_column_sql",
    "column_type",
    "create_table_sql",
    "get_dialect",
    "plan_target_evolution",
    "quote_ident",
    "rename_column_sql",
]


@dataclass(frozen=True)
class Dialect:
    """Declarative description of one target dialect's DDL surface."""

    name: str
    quote: str = '"'
    # identifier case fold applied BEFORE quoting: None | "upper" | "lower"
    fold: str | None = None
    # Spark simple type name -> SQL type. Unlisted types fall back to the
    # ANSI base map; decimal(p,s) is templated separately.
    types: dict = field(default_factory=dict)
    # SQL type for unbounded strings (non-key StringType columns)
    text_type: str = "VARCHAR(4000)"
    decimal_template: str = "DECIMAL({p},{s})"
    varchar_template: str = "VARCHAR({n})"
    # inline `COMMENT 'x'` clause inside CREATE TABLE (mysql/snowflake/db2
    # style); otherwise comments that the dialect supports at all are
    # emitted as separate COMMENT ON COLUMN statements
    inline_comments: bool = False
    comment_on: bool = False  # postgres/oracle/db2 COMMENT ON COLUMN
    add_template: str = "ALTER TABLE {table} ADD COLUMN {column} {type}"
    rename_template: str = (
        "ALTER TABLE {table} RENAME COLUMN {old} TO {new}"
    )
    supports_pk: bool = True


_ANSI_TYPES = {
    "tinyint": "SMALLINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "REAL",
    "double": "DOUBLE PRECISION",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}


DIALECTS: dict[str, Dialect] = {
    "ansi": Dialect(name="ansi", text_type="CLOB", comment_on=True),
    # Derby: what Spark's own JDBC writer produces for StringType is CLOB —
    # the dialect must agree so a pre-created target and a writer-created
    # stage table take the same types. Derby has no COMMENT syntax at all,
    # and spells rename as a top-level statement, not ALTER TABLE.
    "derby": Dialect(
        name="derby",
        text_type="CLOB",
        rename_template="RENAME COLUMN {table}.{old} TO {new}",
    ),
    "postgresql": Dialect(
        name="postgresql",
        fold="lower",
        types={"double": "DOUBLE PRECISION", "binary": "BYTEA"},
        text_type="TEXT",
        comment_on=True,
    ),
    "mysql": Dialect(
        name="mysql",
        quote="`",
        types={
            "tinyint": "TINYINT",
            "boolean": "TINYINT(1)",  # reference: boolean -> tinyint
            "double": "DOUBLE",
            "float": "FLOAT",
            # mysql TIMESTAMP stops at 2038; DATETIME(6) carries the range
            "timestamp": "DATETIME(6)",
            "timestamp_ntz": "DATETIME(6)",
            "binary": "LONGBLOB",
        },
        text_type="LONGTEXT",
        inline_comments=True,
        # mysql spells rename CHANGE COLUMN old new type
        rename_template=(
            "ALTER TABLE {table} CHANGE COLUMN {old} {new} {type}"
        ),
    ),
    "oracle": Dialect(
        name="oracle",
        fold="upper",
        types={
            # reference ladder: export_config.py:708-719
            "tinyint": "NUMBER(3)",
            "smallint": "NUMBER(5)",
            "int": "NUMBER(10)",
            "bigint": "NUMBER(19)",
            "float": "BINARY_FLOAT",
            "double": "BINARY_DOUBLE",
            "boolean": "NUMBER(1)",
            "timestamp": "TIMESTAMP",  # deviation: reference uses DATE
            "timestamp_ntz": "TIMESTAMP",
        },
        text_type="CLOB",
        decimal_template="NUMBER({p},{s})",
        varchar_template="VARCHAR2({n})",
        comment_on=True,
        add_template="ALTER TABLE {table} ADD {column} {type}",
    ),
    "mssql": Dialect(
        name="mssql",
        types={
            "tinyint": "TINYINT",
            "boolean": "TINYINT",  # reference: export_config.py:700
            "float": "REAL",
            "double": "FLOAT",  # deviation: reference maps to REAL
            "timestamp": "DATETIME2(6)",  # deviation: reference DATETIME
            "timestamp_ntz": "DATETIME2(6)",
            "binary": "VARBINARY(MAX)",
        },
        text_type="VARCHAR(MAX)",  # reference: export_config.py:699
        add_template="ALTER TABLE {table} ADD {column} {type}",
        # mssql renames via a stored procedure, not ALTER
        # (reference export_config.py:881)
        rename_template=(
            "EXEC sp_rename '{table_raw}.{old_raw}', '{new_raw}', 'COLUMN'"
        ),
    ),
    "db2": Dialect(
        name="db2",
        fold="upper",
        types={"boolean": "SMALLINT", "double": "DOUBLE"},
        text_type="CLOB",
        comment_on=True,
    ),
    "snowflake": Dialect(
        name="snowflake",
        types={
            "double": "DOUBLE",
            "float": "FLOAT",
            "timestamp": "TIMESTAMP_NTZ",
            "timestamp_ntz": "TIMESTAMP_NTZ",
            "binary": "BINARY",
        },
        text_type="VARCHAR",  # snowflake VARCHAR is unbounded
        inline_comments=True,
    ),
}


def get_dialect(name: str | Dialect) -> Dialect:
    if isinstance(name, Dialect):
        return name
    try:
        return DIALECTS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown dialect {name!r} (have: {sorted(DIALECTS)})"
        ) from None


def _fold(d: Dialect, name: str) -> str:
    if d.fold == "upper":
        return name.upper()
    if d.fold == "lower":
        return name.lower()
    return name


def quote_ident(dialect: str | Dialect, name: str) -> str:
    """Fold then quote one identifier the way the dialect expects."""
    d = get_dialect(dialect)
    n = _fold(d, name)
    return d.quote + n.replace(d.quote, d.quote * 2) + d.quote


def column_type(
    dialect: str | Dialect,
    dtype: T.DataType,
    *,
    key: bool = False,
    key_varchar_len: int = 255,
) -> str:
    """SQL type for one Spark type under the dialect's conversion table.

    Complex types (array/map/struct) are rejected — flatten first
    (``JdbcExporter._flatten_for_rdbms`` serializes them to JSON strings);
    the DDL must describe the frame that is actually written.
    """
    d = get_dialect(dialect)
    if isinstance(dtype, (T.ArrayType, T.MapType, T.StructType)):
        raise TypeError(
            f"complex type {dtype.simpleString()} has no RDBMS column "
            "type — flatten to JSON first (JdbcExporter._flatten_for_rdbms)"
        )
    if isinstance(dtype, T.DecimalType):
        return d.decimal_template.format(
            p=dtype.precision, s=dtype.scale
        )
    if isinstance(dtype, (T.StringType, T.VarcharType, T.CharType)):
        if key:
            return d.varchar_template.format(n=key_varchar_len)
        if isinstance(dtype, (T.VarcharType, T.CharType)):
            return d.varchar_template.format(n=dtype.length)
        return d.text_type
    simple = dtype.simpleString()
    try:
        return d.types.get(simple) or _ANSI_TYPES[simple]
    except KeyError:
        raise TypeError(
            f"no {d.name} mapping for Spark type {simple!r}"
        ) from None


def _comment_literal(text: str) -> str:
    return "'" + text.replace("'", "''") + "'"


def _qualified(
    d: Dialect,
    table: str,
    schema_name: str | None,
    quote_table: bool = True,
) -> str:
    """``quote_table=False`` emits the table name unquoted-verbatim so the
    DATABASE applies its own case fold — required when other SQL against
    the same table (Spark's JDBC writer dbtable, the staging merge) also
    goes unquoted, as plans/cdc_export.py's does."""
    if quote_table:
        t = quote_ident(d, table)
        return f"{quote_ident(d, schema_name)}.{t}" if schema_name else t
    t = _fold(d, table)
    return f"{_fold(d, schema_name)}.{t}" if schema_name else t


def create_table_sql(
    dialect: str | Dialect,
    table: str,
    schema: T.StructType,
    *,
    keys: tuple | list = (),
    comments: dict | None = None,
    key_varchar_len: int = 255,
    schema_name: str | None = None,
    primary_key: bool = True,
    quote_table: bool = True,
) -> list[str]:
    """CREATE TABLE (+ trailing COMMENT ON statements where the dialect
    has no inline comment clause). Returns the ordered statement list.

    Mirrors reference createTargetTable (export_config.py:1164-1235):
    fold/quote per dialect, every non-key column nullable, comments
    emitted where the target supports them — plus a PRIMARY KEY over the
    merge keys (NOT NULL), which the reference leaves to the DBA but the
    staging merge and the incremental sink's retry-dedupe both want.
    """
    d = get_dialect(dialect)
    comments = comments or {}
    keys = list(keys)
    tname = _qualified(d, table, schema_name, quote_table)
    coldefs = []
    post: list[str] = []
    for f in schema.fields:
        is_key = f.name in keys
        sql_t = column_type(
            d, f.dataType, key=is_key, key_varchar_len=key_varchar_len
        )
        null_sql = " NOT NULL" if is_key else ""
        line = f"{quote_ident(d, f.name)} {sql_t}{null_sql}"
        comment = comments.get(f.name)
        if comment:
            if d.inline_comments:
                line += f" COMMENT {_comment_literal(comment)}"
            elif d.comment_on:
                post.append(
                    f"COMMENT ON COLUMN {tname}.{quote_ident(d, f.name)} "
                    f"IS {_comment_literal(comment)}"
                )
            # else: dialect has no comment syntax at all (derby/mssql) —
            # dropped, as the reference drops them for those targets
            # (export_config.py:1227-1231; we go further and keep
            # oracle/postgres comments via COMMENT ON)
        coldefs.append(line)
    body = ", ".join(coldefs)
    if keys and primary_key and d.supports_pk:
        pk = ", ".join(quote_ident(d, k) for k in keys)
        body += f", PRIMARY KEY ({pk})"
    return [f"CREATE TABLE {tname} ({body})", *post]


def add_column_sql(
    dialect: str | Dialect,
    table: str,
    name: str,
    dtype: T.DataType,
    *,
    comment: str | None = None,
    schema_name: str | None = None,
    quote_table: bool = True,
) -> list[str]:
    """ALTER TABLE ADD for one new nullable column (additive evolution —
    the only column change the lake ever propagates; reference
    updateTargetTable's add branch, export_config.py:966-1010)."""
    d = get_dialect(dialect)
    tname = _qualified(d, table, schema_name, quote_table)
    col = quote_ident(d, name)
    sql_t = column_type(d, dtype)
    if comment and d.inline_comments:
        sql_t += f" COMMENT {_comment_literal(comment)}"
    out = [d.add_template.format(table=tname, column=col, type=sql_t)]
    if comment and d.comment_on:
        out.append(
            f"COMMENT ON COLUMN {tname}.{col} IS "
            f"{_comment_literal(comment)}"
        )
    return out


def rename_column_sql(
    dialect: str | Dialect,
    table: str,
    old: str,
    new: str,
    dtype: T.DataType | None = None,
    *,
    key: bool = False,
    key_varchar_len: int = 255,
    schema_name: str | None = None,
    quote_table: bool = True,
) -> str:
    """Per-dialect column rename (reference updateTargetTable's rename
    branch, export_config.py:875-900). MySQL's CHANGE COLUMN needs the
    type restated; MSSQL uses sp_rename with raw (unquoted) names.

    ``key=True`` when the column carries the merge key: type-restating
    renames (MySQL) must restate the bounded key VARCHAR + NOT NULL, not
    the unbounded text type — TEXT/LONGTEXT is illegal inside a PRIMARY
    KEY and CHANGE COLUMN would otherwise also reset nullability.
    """
    d = get_dialect(dialect)
    tname = _qualified(d, table, schema_name, quote_table)
    if "{type}" in d.rename_template and dtype is None:
        raise ValueError(f"{d.name} rename requires the column type")
    raw_table = _fold(d, table)
    if schema_name:
        raw_table = f"{_fold(d, schema_name)}.{raw_table}"
    type_sql = ""
    if dtype is not None:
        type_sql = column_type(
            d, dtype, key=key, key_varchar_len=key_varchar_len
        )
        if key and "{type}" in d.rename_template:
            type_sql += " NOT NULL"
    return d.rename_template.format(
        table=tname,
        old=quote_ident(d, old),
        new=quote_ident(d, new),
        type=type_sql,
        table_raw=raw_table,
        old_raw=_fold(d, old),
        new_raw=_fold(d, new),
    )


def plan_target_evolution(
    dialect: str | Dialect,
    table: str,
    target_columns: list,
    desired: T.StructType,
    *,
    renames: list | tuple = (),
    keys: tuple | list = (),
    key_varchar_len: int = 255,
    comments: dict | None = None,
    schema_name: str | None = None,
    quote_table: bool = True,
) -> list[str]:
    """Diff the live target against the desired (flattened) schema and
    return the ordered ALTER statements that bring it up: declared
    renames first (old name present, new absent), then ADDs for columns
    the target lacks. Columns the target has but the desired schema lacks
    are left alone — the lake never drops, so neither does the export
    (reference updateTargetTable never drops either).

    ``target_columns``: live column names from the target (any case —
    compared case-insensitively, JDBC metadata case-folds per database).
    ``renames``: ordered ``[{"from": old, "to": new}, ...]`` — the lake
    snapshot rename-log slice since the last sync.
    ``keys``: the merge-key columns (post-rename names) — a renamed key
    keeps its bounded VARCHAR + NOT NULL where the dialect restates the
    type (the lake may rename its bucket column, table.py:913).
    """
    d = get_dialect(dialect)
    have = {c.lower() for c in target_columns}
    # transitive pre-images: a chained key rename (a->b then b->c, key=c)
    # must treat the intermediate hop as a key rename too
    keyset = {k.lower() for k in keys}
    for r in reversed(list(renames)):
        if r["to"].lower() in keyset:
            keyset.add(r["from"].lower())
    stmts: list[str] = []
    dtypes = {f.name.lower(): f.dataType for f in desired.fields}
    renames = list(renames)
    for i, r in enumerate(renames):
        old, new = r["from"], r["to"]
        # an intermediate hop of a chained rename (a->b then b->c) is not
        # in the desired schema — resolve through the remaining chain to
        # the final name for its type
        final = new
        for nxt in renames[i + 1:]:
            if nxt["from"].lower() == final.lower():
                final = nxt["to"]
        if old.lower() in have and new.lower() not in have:
            stmts.append(
                rename_column_sql(
                    d, table, old, new,
                    dtypes.get(final.lower()),
                    key=new.lower() in keyset,
                    key_varchar_len=key_varchar_len,
                    schema_name=schema_name,
                    quote_table=quote_table,
                )
            )
            have.discard(old.lower())
            have.add(new.lower())
    comments = comments or {}
    for f in desired.fields:
        if f.name.lower() not in have:
            stmts.extend(
                add_column_sql(
                    d, table, f.name, f.dataType,
                    comment=comments.get(f.name),
                    schema_name=schema_name,
                    quote_table=quote_table,
                )
            )
            have.add(f.name.lower())
    return stmts
