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
trails the stream. Violations are detected per micro-batch, and with the
per-segment ledger (one ``(file, lsn-range)`` record per processed segment,
kept next to the checkpoint) they are also RECOVERABLE: a re-delivered
already-ledgered segment is skipped silently (at-least-once contract), and
a genuinely late segment under ``on_out_of_order='recover'`` triggers a
key-scoped authoritative re-fold (``CDCEngine.repair_keys``) over the
ledgered log instead of demanding a manual batch replay. The reference's
sources are all scalar-watermark ordered (import_config.py:2087-2255); the
ledger is the generalization a bulk-parallel segment writer needs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.schema import CHANGE_SCHEMA


def _ledger_path(checkpoint_dir: str) -> str:
    # lives inside the checkpoint dir (Structured Streaming ignores foreign
    # entries) so checkpoint loss and ledger loss are atomic — a fresh
    # checkpoint always starts with a fresh ledger, which is exactly the
    # "benign catch-up" signature the policy relies on
    return os.path.join(checkpoint_dir, "dbimport-segments.jsonl")


def _ledger_read(path: str) -> dict[str, dict]:
    seen: dict[str, dict] = {}
    if os.path.isfile(path):
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    seen[rec["file"]] = rec
    return seen


def _ledger_append(path: str, records: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as fh:
        for rec in records:
            fh.write(json.dumps(rec) + "\n")
        fh.flush()
        os.fsync(fh.fileno())


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

    Ordering violations are DETECTED per micro-batch and classified with
    the per-segment ledger (``dbimport-segments.jsonl`` inside the
    checkpoint dir — one (file, lsn-range) record per processed segment):

    - below-watermark rows from segments the ledger already records are a
      benign re-delivery (crash between table commit and checkpoint
      commit, or checkpoint-loss catch-up): skipped silently, the
      at-least-once → exactly-once contract working as intended;
    - below-watermark rows from segments the ledger has NEVER seen are a
      genuinely late segment — a delivery that violated LSN order.

    ``on_out_of_order`` decides the late-segment response:

    - 'auto' (default): warn on the first micro-batch of a run over a
      BRAND-NEW checkpoint (no ledger yet — the batch-replay-then-stream
      catch-up), raise ``LogTruncatedError`` otherwise. The ledger is the
      run marker: a restart over an existing checkpoint never downgrades
      a real out-of-order arrival to a warning, even on batch 0.
    - 'recover': re-fold the late keys authoritatively over the full
      ledgered log + this batch (``CDCEngine.repair_keys``) — converges
      without manual intervention, then continue with the fresh rows;
    - 'error': always raise; 'warn': always warn and continue.
    """
    if on_out_of_order not in ("auto", "error", "warn", "recover"):
        raise ValueError(
            "on_out_of_order must be 'auto', 'error', 'warn' or 'recover'"
        )
    ledger = _ledger_path(checkpoint_dir)
    fresh_checkpoint = not os.path.isfile(ledger)
    first_batch_id: list[int] = []  # batch ids persist across checkpoint restarts

    def apply_micro_batch(batch: DataFrame, batch_id: int) -> None:
        if not first_batch_id:
            first_batch_id.append(batch_id)  # first micro-batch of THIS run
        last = engine.table.last_lsn()
        spark = batch.sparkSession
        per_file = [
            r.asDict()
            for r in batch.groupBy(F.input_file_name().alias("file"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min("lsn").alias("min_lsn"),
                F.max("lsn").alias("max_lsn"),
            )
            .collect()
        ]
        if not per_file:
            return
        seen = _ledger_read(ledger)
        stats = batch.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("mn"),
            F.min(F.when(F.col("lsn") > F.lit(last), F.col("lsn"))).alias("lo"),
            F.max("lsn").alias("hi"),
            F.count(F.when(F.col("lsn") > F.lit(last), F.lit(1))).alias("n_fresh"),
        ).first()
        dropped = stats["n"] - stats["n_fresh"]
        # stale rows are suspicious only when they come from segments the
        # ledger has never recorded: a recorded segment re-appearing is the
        # benign at-least-once re-delivery. A whole-batch re-run whose max
        # lsn IS the watermark is the watermark-setting window re-delivered
        # (crash between table commit and ledger/checkpoint commit) — also
        # benign even though its files missed the ledger.
        watermark_rerun = stats["n_fresh"] == 0 and stats["hi"] == last
        late_files = [
            r["file"]
            for r in per_file
            if r["file"] not in seen and r["min_lsn"] <= last
        ]
        if dropped > 0 and late_files and not watermark_rerun:
            suspect = (
                f"micro-batch {batch_id}: segment(s) {late_files} carry "
                f"event(s) at or below the committed watermark {last} and "
                "were never processed before (out-of-order segment "
                "delivery) — their events were skipped by the watermark. "
                "on_out_of_order='recover' re-folds the affected keys from "
                "the ledgered log; a batch replay also recovers."
            )
            from dbimport_spark.sources.changelog import LogTruncatedError

            is_catchup = fresh_checkpoint and batch_id == first_batch_id[0]
            policy = on_out_of_order
            if policy == "auto":
                policy = "warn" if is_catchup else "error"
            if policy == "error":
                raise LogTruncatedError(suspect)
            if policy == "recover":
                print(f"RECOVER {suspect}", flush=True)
                late = batch.filter(
                    F.input_file_name().isin(late_files)
                    & (F.col("lsn") <= F.lit(last))
                )
                key_rows = late.select(*engine.keys).distinct()
                ledgered = sorted(seen.keys())
                # the authoritative fold = ledgered segments + THIS batch's
                # new segments. Batch rows re-delivered from ledgered files
                # are excluded — they would duplicate (key, lsn) rows
                batch_new = (
                    batch.filter(~F.input_file_name().isin(ledgered))
                    if ledgered
                    else batch
                )
                full_log = batch_new if not ledgered else batch_new.unionByName(
                    spark.read.schema(batch.schema).parquet(*ledgered),
                    allowMissingColumns=True,
                )
                engine.repair_keys(full_log, key_rows)
            else:
                print(f"WARN {suspect}", flush=True)
        if stats["n_fresh"] > 0:
            fresh = batch.filter(F.col("lsn") > F.lit(last))
            engine.apply_batch(fresh, int(stats["lo"]) - 1, int(stats["hi"]))
        # record this batch's segments only after they are fully absorbed:
        # a crash before this point re-delivers them, and re-delivery of
        # ledgered segments is benign by construction
        _ledger_append(
            ledger,
            [
                {**r, "batch_id": batch_id}
                for r in per_file
                if r["file"] not in seen
            ],
        )

    writer = stream_df.writeStream.foreachBatch(apply_micro_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
