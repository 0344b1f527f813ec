"""Training-data pipeline operators over tokenized/corpus tables.

Beyond-the-reference operators a large-scale LLM training pipeline needs
(the reference moves tables; a training pipeline also has to SHAPE them):

- ``pack_sequences`` — concat-and-chunk sequence packing: documents are
  concatenated per stratum in a deterministic total order and chunked into
  fixed context-length windows (the standard LLM pretraining packing).
  Implemented as a DISTRIBUTED exact prefix sum: a per-stratum window
  would bottleneck on one task per stratum, so the cumsum is two-phase —
  explicit (stratum, id) range boundaries computed once on the driver and
  inlined as literals (so every job derives the same bucket id with zero
  materialized state), per-(bucket, stratum) totals (metadata-sized
  collect), running offsets broadcast back, and a bounded-size window per
  bucket. The result depends only on the global order, not on where
  boundaries land, so the output is deterministic and SQL-replicable (one
  window cumsum in the oracle).

- ``stratified_sample`` — deterministic per-stratum sampling by hash
  threshold: keep a row iff ``md5(id|seed)`` maps under the stratum's
  permille rate. No RNG state, stable under re-runs and re-partitioning,
  reproducible in any engine with md5 (the correctness oracle recomputes
  it in DuckDB). This is how training mixtures are weighted re-runnably.

- ``contamination_pairs`` — benchmark-contamination check: word n-gram
  shingle containment of benchmark docs inside training docs
  (train×bench join on shingle hash, count per pair, containment =
  |common| / |bench shingles|). Reuses the dedup shingle machinery; the
  join is shuffle-by-shingle, the standard distributed decontamination
  shape. ``max_doc_freq`` caps ubiquitous shingles (same trade-off as
  ``jaccard_pairs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbimport_spark.operators.text_dedup import word_shingles


def pack_sequences(
    df: DataFrame,
    context_len: int = 2048,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    part_col: str = "source",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document its context-window id and offset under
    concat-and-chunk packing (per ``part_col`` stratum, ordered by
    ``id_col``).

    Returns (id, stratum, length, pack_id, pack_offset): the window this
    document STARTS in and its token offset there. Documents longer than
    the remaining window space span into following windows — exactly the
    concat-then-chunk semantics of pretraining data loaders.
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    base = df.select(part_col, id_col, len_col)
    # EXPLICIT range boundaries, computed once on the driver and inlined as
    # literals: both downstream jobs (the totals aggregate and the final
    # join+window) derive _pid from the same frozen boundary set, so they
    # agree by construction. This replaces the earlier
    # repartitionByRange + spark_partition_id + localCheckpoint pin: range
    # boundaries from Spark's sampler are not guaranteed identical across
    # job executions, and materializing the frame to freeze them costs a
    # full executor-memory copy of the (3-column) input. Two pruned scans
    # plus a metadata-sized boundary list is the cheaper trade at scale —
    # and the result is identical either way, because the packing depends
    # only on the global (stratum, id) order, not on where boundaries land.
    n = base.count()
    bounds: list = []
    if n > nparts:
        want = max(nparts * 20, 200)
        frac = min(1.0, want / n * 1.2)
        keys = sorted(
            (r[0], r[1])
            for r in base.select(part_col, id_col)
            .where(F.col(id_col).isNotNull() & F.col(part_col).isNotNull())
            .sample(False, frac, seed=42)
            .collect()
        )
        if keys:
            step = max(1, len(keys) // nparts)
            bounds = sorted(set(keys[i] for i in range(step, len(keys), step)))[
                : nparts - 1
            ]
    key = F.struct(F.col(part_col).alias("s"), F.col(id_col).alias("i"))
    if bounds:
        barr = F.array(
            *[
                F.struct(F.lit(s).alias("s"), F.lit(i).alias("i"))
                for s, i in bounds
            ]
        )
        # rank of the row's key among the boundary literals: O(|bounds|)
        # struct comparisons inside codegen, no shuffle, no state
        pid = F.size(F.filter(barr, lambda b: key >= b)).cast("int")
    else:
        pid = F.lit(0)
    d = base.withColumn("_pid", pid)
    # phase 1: per-(partition, stratum) token totals — ≤ nparts × strata
    # rows, metadata-sized by construction
    totals = d.groupBy("_pid", part_col).agg(F.sum(len_col).alias("_t")).collect()
    if any(r[part_col] is None for r in totals):
        raise ValueError(
            f"pack_sequences: NULL values in stratum column {part_col!r} — "
            "packs are joined on stratum equality, which silently drops "
            "nulls; fill or filter them first"
        )
    run: dict = {}
    offsets = []
    for r in sorted(totals, key=lambda r: (r[part_col], r["_pid"])):
        offsets.append((r["_pid"], r[part_col], run.get(r[part_col], 0)))
        run[r[part_col]] = run.get(r[part_col], 0) + r["_t"]
    from pyspark.sql import types as T

    off_df = spark.createDataFrame(
        offsets,
        T.StructType(
            [
                T.StructField("_pid", T.IntegerType()),
                d.schema[part_col],  # stratum keeps its actual type
                T.StructField("_off", T.LongType()),
            ]
        ),
    )
    # phase 2: bounded within-partition cumsum + broadcast offset join.
    # The window partitions by (_pid, stratum): every task's window fits
    # its own partition — no single-task-per-stratum bottleneck.
    w = (
        Window.partitionBy("_pid", part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_cum = F.coalesce(F.sum(len_col).over(w), F.lit(0)) + F.col("_off")
    return (
        d.join(F.broadcast(off_df), ["_pid", part_col])
        .select(
            F.col(id_col),
            F.col(part_col),
            F.col(len_col),
            F.floor(prev_cum / context_len).cast("long").alias("pack_id"),
            (prev_cum % context_len).cast("long").alias("pack_offset"),
        )
    )


def hash_bucket(col, seed: int = 42, buckets: int = 1000):
    """Deterministic cross-engine bucket in [0, buckets): integer value of
    the first 8 hex chars of md5(value|seed). Reproducible in any engine
    with md5 (DuckDB oracle: ``('0x' || substr(md5(..), 1, 8))::UBIGINT``).
    """
    h = F.md5(F.concat_ws("|", col.cast("string"), F.lit(str(seed))))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def stratified_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    id_col: str = "doc_id",
    part_col: str = "source",
    default_permille: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted mixture sampling: keep a row iff its hash
    bucket falls under its stratum's permille rate. Re-runs, re-orderings
    and re-partitionings select the SAME rows (no RNG state), and adding a
    stratum later never changes previous strata's selections."""
    if rates_permille:
        # one map-literal lookup per row (O(1) regardless of stratum count)
        # instead of a chained CASE WHEN — thousands of strata stay cheap
        pairs: list = []
        for stratum, permille in sorted(rates_permille.items(), key=lambda kv: str(kv[0])):
            # keys cast to string so the map's key type always matches the
            # string-cast lookup column, even for int/float strata
            pairs += [F.lit(str(stratum)), F.lit(int(permille))]
        rate = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(part_col).cast("string")),
            F.lit(default_permille),
        )
    else:
        rate = F.lit(default_permille)
    return df.filter(hash_bucket(F.col(id_col), seed) < rate)


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_permille: int = 500,
    num_partitions: int | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Benchmark contamination: (train_id, bench_id, containment_permille)
    for every train/bench pair sharing word ``n``-gram shingles, where
    containment = |shared shingles| / |bench doc's shingles|. A benchmark
    doc fully quoted inside a training doc scores 1000 regardless of how
    much OTHER text the training doc has (containment, not Jaccard — the
    right asymmetry for decontamination).

    The 100 TB asymmetry: the train side is the expensive one (its
    shingles are worth computing ONCE and persisting), while the bench
    side is tiny and re-checked per release — use
    ``contamination_pairs_from_shingles`` with the materialized train
    shingle table for that steady state; this function is the
    compute-both-sides convenience over it."""
    tsh = word_shingles(train, text_col, id_col, n, num_partitions)
    return contamination_pairs_from_shingles(
        tsh,
        bench,
        text_col=text_col,
        id_col=id_col,
        n=n,
        min_permille=min_permille,
        num_partitions=num_partitions,
        max_doc_freq=max_doc_freq,
    )


def contamination_pairs_from_shingles(
    train_shingles: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_permille: int = 500,
    num_partitions: int | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """``contamination_pairs`` over an ALREADY-materialized train shingle
    table (columns: ``id_col``, ``shingle`` — the exact output of
    ``word_shingles(train)``, e.g. persisted as parquet): the train corpus
    is scanned zero times per bench check. ``n`` must match the n-gram
    width the persisted shingles were built with. ``max_doc_freq`` (when
    given) is applied to the persisted table too, so a pre-capped table
    and an on-the-fly cap return identical pairs."""
    tsh = train_shingles
    bsh = word_shingles(bench, text_col, id_col, n, num_partitions)
    if max_doc_freq is not None:
        hot = (
            tsh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("shingle")
        )
        tsh = tsh.join(hot, "shingle", "left_anti")
    bsizes = bsh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_bn"))
    common = (
        tsh.alias("t")
        .join(bsh.alias("b"), "shingle")
        .groupBy(
            F.col(f"t.{id_col}").alias("train_id"),
            F.col(f"b.{id_col}").alias("bench_id"),
        )
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    return (
        common.join(bsizes.withColumnRenamed(id_col, "bench_id"), "bench_id")
        .select(
            "train_id",
            "bench_id",
            F.floor(F.lit(1000) * F.col("_common") / F.col("_bn")).alias(
                "containment_permille"
            ),
        )
        .filter(F.col("containment_permille") >= min_permille)
    )
