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
    on_out_of_order: str = "auto",
):
    """Drive the CDC apply from a stream; returns the StreamingQuery.

    ``available_now=True`` processes everything present then stops (the
    batch-replay analogue); False runs continuously on new files.

    Ordering violations are DETECTED, not silently absorbed: a micro-batch
    carrying below-watermark rows that is not simply the re-run of the
    watermark-setting window means either (a) a benign catch-up — a fresh
    checkpoint over a log the table already absorbed (batch replay then
    stream, or checkpoint loss), which always happens in the FIRST
    micro-batches of a run — or (b) a segment that arrived after a later
    one was committed: silent data loss. ``on_out_of_order``:

    - 'auto' (default): warn on micro-batch 0 of a run (the catch-up
      case), raise ``LogTruncatedError`` on later batches (true
      out-of-order arrival mid-stream);
    - 'error': always raise; 'warn': always warn and continue.

    The exact re-run of the window that set the watermark is always
    skipped silently — that is the at-least-once → exactly-once contract
    working as intended.
    """
    if on_out_of_order not in ("auto", "error", "warn"):
        raise ValueError("on_out_of_order must be 'auto', 'error' or 'warn'")
    first_batch_id: list[int] = []  # batch ids persist across checkpoint restarts

    def apply_micro_batch(batch: DataFrame, batch_id: int) -> None:
        if not first_batch_id:
            first_batch_id.append(batch_id)  # first micro-batch of THIS run
        last = engine.table.last_lsn()
        stats = batch.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("mn"),
            F.min(F.when(F.col("lsn") > F.lit(last), F.col("lsn"))).alias("lo"),
            F.max("lsn").alias("hi"),
            F.count(F.when(F.col("lsn") > F.lit(last), F.lit(1))).alias("n_fresh"),
        ).first()
        if stats["n"] == 0:
            return
        dropped = stats["n"] - stats["n_fresh"]
        suspect = None
        if stats["n_fresh"] == 0:
            if stats["hi"] == last:
                # re-run of the exact window that set the watermark (crash
                # between table commit and checkpoint commit): idempotent skip
                return
            # every row is below the watermark but this is NOT the
            # watermark-setting window: either a full re-delivery after
            # checkpoint loss (benign) or a segment that arrived after a
            # later one was committed (data loss) — indistinguishable by
            # LSN alone, so surface it
            suspect = (
                f"micro-batch {batch_id}: whole batch (lsn [{stats['mn']}, "
                f"{stats['hi']}]) is below the committed watermark {last} "
                "and is not the watermark-setting window. If this is "
                "checkpoint-loss re-delivery, rerun with "
                "on_out_of_order='warn'; if segments arrived out of order, "
                "these events were never applied."
            )
        elif dropped > 0:
            suspect = (
                f"micro-batch {batch_id}: {dropped} event(s) with lsn in "
                f"[{stats['mn']}, {last}] arrived AFTER the watermark "
                f"passed them (out-of-order segment delivery) — they were "
                "already applied from an earlier delivery, or they are "
                "lost. Re-snapshot or replay the log in batch mode to "
                "recover."
            )
        if suspect is not None:
            from dbimport_spark.sources.changelog import LogTruncatedError

            is_first = batch_id == first_batch_id[0]
            policy = on_out_of_order
            if policy == "auto":
                policy = "warn" if is_first else "error"
            if policy == "error":
                raise LogTruncatedError(suspect)
            print(f"WARN {suspect}", flush=True)
        if stats["n_fresh"] == 0:
            return
        fresh = batch.filter(F.col("lsn") > F.lit(last))
        engine.apply_batch(fresh, int(stats["lo"]) - 1, int(stats["hi"]))

    writer = stream_df.writeStream.foreachBatch(apply_micro_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
