"""Event-time windowed aggregation with watermark-bounded late data.

The canonical Structured Streaming pattern the reference realizes in
batch (its incremental windows are polled watermark ranges,
import_config.py:2087-2255): here the SAME change log is consumed as a
stream and aggregated by EVENT TIME (``commit_ts``), with a watermark
that bounds how late a row may arrive and still update its window —
Spark drops state for windows older than (max event time − watermark),
so memory is bounded no matter how long the stream runs (the 100 TB
consideration: state size ∝ windows inside the watermark horizon, not
stream length).

Two delivery guarantees compose:

- rows later than the watermark horizon are DROPPED from the aggregation
  (standard Structured Streaming semantics — the horizon is the contract
  with the source about maximum disorder);
- within the horizon, late rows update their window's running aggregate,
  and in append output mode a window is only emitted once it can no
  longer change.

``windowed_event_counts`` declares the aggregation (pure DataFrame ops —
usable on a batch frame too, which is exactly how the tests oracle it);
``run_windowed_counts`` drives it as a stream into an in-memory table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    df: DataFrame,
    window: str = "1 minute",
    watermark: str | None = "2 minutes",
    ts_col: str = "commit_ts",
) -> DataFrame:
    """Tumbling event-time windows: per (window, op) row counts + distinct
    key estimate + max lsn. Works identically on a stream (watermarked)
    and a batch frame (watermark is a no-op there — Spark ignores it in
    batch, which makes the batch run the value oracle for the stream)."""
    src = df
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("doc_id").alias("approx_keys"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "approx_keys",
            "max_lsn",
        )
    )


def run_windowed_counts(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    output_mode: str = "update",
    available_now: bool = True,
):
    """Drive the windowed aggregation into an in-memory sink (read the
    result back as ``spark.table(query_name)``). ``output_mode='update'``
    emits window revisions as late-but-within-horizon rows arrive;
    'append' emits each window exactly once, after the watermark passes
    its end (nothing may change it anymore) — the mode a downstream
    exactly-once consumer wants on a CONTINUOUS stream.

    'append' + ``available_now=True`` caveat: when the bounded run
    terminates, windows still inside the final watermark horizon (ending
    within ``watermark`` of the max event time) remain in state and are
    emitted ZERO times, not once — Spark never advances the watermark
    past them. Over a bounded log where the tail matters, use 'update'
    (the default here), or restart the query on the same checkpoint
    after more data arrives to flush them."""
    agg = windowed_event_counts(stream_df, window=window, watermark=watermark)
    writer = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
