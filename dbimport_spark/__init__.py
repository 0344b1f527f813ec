"""dbimport_spark — a from-scratch, PySpark-native CDC / incremental-ingest engine.

Re-expresses the semantics of Middlecon/DBImport's incremental-import core
(reference surveyed in SURVEY.md) as an idiomatic Spark engine:

- an ordered change-event log (lsn, op, key, payload) is the source
  (generalizing the reference's watermark/CHANGETABLE/Flashback reads,
  reference import_config.py:2087-2255, 2519-2563);
- batches are deduplicated last-writer-wins per key by LSN
  (reference import_config.py:3238-3252);
- changes are applied to a snapshot-versioned, bucket-partitioned lake table
  via a key-partitioned MERGE with I/U/D routing and null-safe change
  detection (reference etl_operations.py:100-298);
- the LSN watermark is committed atomically with the data (two-phase
  pending/committed analogue of reference import_config.py:1086-1108);
- schema evolution is additive-only (reference import_operations.py:2661-2958).

No code is copied from the reference; citations are for semantic parity only.
"""

__version__ = "0.1.0"

from dbimport_spark.session import get_spark  # noqa: F401
