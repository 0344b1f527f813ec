"""Schemas for the CDC engine (per BASELINE.json input_hint / FIXTURES.md).

Payload table (the maintained "sequences" table of pre-tokenized training
data) and the ordered change-event log. Audit columns mirror the reference's
"datalake_" system-column model (reference import_config.py:977-983,
etl_operations.py:229-296) and are excluded from the equality invariant.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- payload ---------------------------------------------------------------

PAYLOAD_FIELDS = [
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
]

PAYLOAD_SCHEMA = T.StructType(PAYLOAD_FIELDS)

PAYLOAD_COLUMNS = [f.name for f in PAYLOAD_FIELDS]
MERGE_KEY = "doc_id"

# ---- change-event log ------------------------------------------------------

CHANGE_FIELDS = [
    T.StructField("lsn", T.LongType(), False),
    T.StructField("op", T.StringType(), False),  # 'I' | 'U' | 'D'
    *[T.StructField(f.name, f.dataType, True) for f in PAYLOAD_FIELDS],
    T.StructField("commit_ts", T.TimestampType(), True),
]

CHANGE_SCHEMA = T.StructType(CHANGE_FIELDS)

# Schema-evolution fixture: events past the evolution LSN also carry this
# nullable column; the engine must propagate it additively (no rewrite),
# mirroring reference import_operations.py:2808-2829.
EVOLVED_COLUMN = T.StructField("quality_score", T.FloatType(), True)

# ---- audit columns (datalake_* analogue) -----------------------------------

AUDIT_IUD = "dl_iud"          # 'I'/'U'/'D' last operation
AUDIT_INSERT = "dl_insert_ts"  # first-insert timestamp
AUDIT_UPDATE = "dl_update_ts"  # last-merge timestamp
AUDIT_DELETE = "dl_delete_ts"  # soft-delete timestamp (soft mode only)
# provenance label (reference datalake_source, configSchema.py:754,
# etl_operations.py:237-239): stamped by the ENGINE, not carried by the
# change log — modeled as an auto-filled payload column (opt-in via
# create_table(source_label=...)), so dedup/merge/pre-images treat it
# uniformly and it rides the equality invariant like any payload column.
AUDIT_SOURCE = "dl_source"
# per-row version column (opt-in via create_table(track_lsn=True)): the LSN
# of the event that last touched the row — including content-identical
# events, so a later-but-equal event still advances it. Makes LATE events
# directly mergeable (apply iff event.lsn > row.dl_lsn) with a single
# bucket-pruned merge instead of a full-log re-fold — the design the
# repair_keys docstring recommends for deployments where out-of-order
# segments are ROUTINE rather than exceptional.
AUDIT_LSN = "dl_lsn"
AUDIT_COLUMNS = [AUDIT_IUD, AUDIT_INSERT, AUDIT_UPDATE, AUDIT_DELETE, AUDIT_LSN]
