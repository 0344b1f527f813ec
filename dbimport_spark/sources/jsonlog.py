"""Document-store change source: JSON-lines change events → CDC batches.

The reference's Mongo import (SURVEY.md S6) reads full documents with an
inferred nested schema, rewrites that schema (binary→base64, null→string,
optional date→string; import_operations.py:686-713), flattens the payload,
and feeds the normal merge path. Here the same shape as a from-scratch
source: a directory of JSON-lines change events

    {"lsn": 7, "op": "U", "doc": {...arbitrary nested document...}}

becomes a standard change DataFrame (lsn, op, doc_id, <flattened payload>)
ready for ``CDCEngine.apply_batch`` / ``replay``:

- schema inference over the document column (Spark's JSON reader), then the
  recursive normalization from functions/schema_normalize.py — pure column
  expressions, no Python in the data path;
- one level of struct flattening with ``parent__child`` names (the
  reference flattens Mongo subdocuments into column names the RDBMS side
  can hold); deeper nesting stays as typed nested columns — the lake is
  schema-on-read parquet, it does not need the reference's full flatten;
- the id field is hoisted to ``doc_id`` (string) — Mongo's ``_id``
  analogue, the merge key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbimport_spark.functions.schema_normalize import (
    flatten_image_columns,
    normalize_dataframe,
)


def read_json_changes(
    spark: SparkSession,
    path: str,
    id_field: str = "_id",
    dates_to_string: bool = False,
    flatten: bool = True,
) -> DataFrame:
    """Read a JSON-lines change log into the engine's change shape.

    Expects objects with ``lsn`` (long), ``op`` (I/U/D) and ``doc``
    (arbitrary nested document; absent/null for deletes except the id).
    Delete events may carry the id at the top level (``_id``) instead of a
    document body.
    """
    raw = spark.read.json(path)
    for req in ("lsn", "op"):
        if req not in raw.columns:
            raise ValueError(f"json change log at {path} lacks column {req!r}")

    has_doc = "doc" in raw.columns and isinstance(
        raw.schema["doc"].dataType, T.StructType
    )
    doc_fields = (
        [f.name for f in raw.schema["doc"].dataType.fields] if has_doc else []
    )

    # merge key: doc._id, falling back to a top-level _id (delete events)
    id_sources = []
    if has_doc and id_field in doc_fields:
        id_sources.append(F.col(f"doc.{id_field}").cast("string"))
    if id_field in raw.columns:
        id_sources.append(F.col(id_field).cast("string"))
    if not id_sources:
        raise ValueError(f"no {id_field!r} found in document or event envelope")

    cols = [
        F.col("lsn").cast("long").alias("lsn"),
        F.col("op").cast("string").alias("op"),
        F.coalesce(*id_sources).alias("doc_id"),
    ]
    taken = {"lsn", "op", "doc_id"}
    if has_doc:
        # one flatten level: parent__child (reference Mongo flatten) —
        # shared projection/collision logic with the Debezium source
        cols += flatten_image_columns(
            list(raw.schema["doc"].dataType.fields),
            lambda name: F.col(f"doc.{name}"),
            id_field,
            taken,
            flatten=flatten,
            what="document field",
        )
    out = raw.select(*cols)
    return normalize_dataframe(out, dates_to_string=dates_to_string)
