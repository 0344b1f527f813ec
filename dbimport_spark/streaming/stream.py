"""Structured Streaming front-end: tail the change-log directory.

The reference realizes streaming concepts in batch (SURVEY.md §2.7); here
the same apply path runs under Structured Streaming via ``foreachBatch``:

    readStream(file source over the log dir)
      → foreachBatch(micro_batch -> CDCEngine.apply_batch)

Exactly-once composition: Structured Streaming's checkpoint gives at-least-
once micro-batch delivery; the engine's LSN-watermark commit makes re-
delivery a no-op (apply_batch skips any window whose hi ≤ table.last_lsn),
so the sink is effectively exactly-once — the same property the batch
replay relies on. Late/out-of-order arrival inside a micro-batch is
absorbed by LWW dedup; events older than the committed watermark are
filtered (they were already applied from a previous file).

Ordering assumption: log segments are appended in LSN order (true for any
real binlog/WAL tailer writing sequential segments) and the file source
delivers them in discovery order — so the committed watermark only ever
trails the stream. A delivery that violated LSN order across micro-batches
would need per-segment (not scalar) offset tracking; out of scope, as the
reference's sources are all scalar-watermark ordered too
(import_config.py:2087-2255).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.schema import CHANGE_SCHEMA


def stream_changes(
    spark: SparkSession,
    log_dir: str,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the parquet change-log directory."""
    reader = spark.readStream.schema(schema or CHANGE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(log_dir)


def run_stream(
    engine: CDCEngine,
    stream_df: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drive the CDC apply from a stream; returns the StreamingQuery.

    ``available_now=True`` processes everything present then stops (the
    batch-replay analogue); False runs continuously on new files.
    """

    def apply_micro_batch(batch: DataFrame, batch_id: int) -> None:
        last = engine.table.last_lsn()
        fresh = batch.filter(F.col("lsn") > F.lit(last))
        bounds = fresh.agg(
            F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
        ).first()
        if bounds["hi"] is None:
            return
        engine.apply_batch(fresh, int(bounds["lo"]) - 1, int(bounds["hi"]))

    writer = stream_df.writeStream.foreachBatch(apply_micro_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
