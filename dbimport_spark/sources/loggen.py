"""Deterministic, distributed change-log generator.

Synthesizes the LSN-ordered change-event log described in FIXTURES.md §2-3
entirely with JVM-side expressions over ``spark.range`` — no Python in the
data path, no RNG state: every value is a pure function of (seed, lsn), so
the log is reproducible at any scale and any parallelism. This mirrors how
the reference's incremental sources present changes (an always-increasing
watermark column plus an operation code, reference import_config.py:2087-2255,
2519-2563) without needing a live RDBMS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCES = ["web", "books", "code"]
EPOCH0 = 1_700_000_000  # deterministic commit_ts base


def _u(seed: int, tag: str, *cols: Column) -> Column:
    """Deterministic uniform in [0,1) from (seed, tag, cols)."""
    m = 1_000_003
    return F.pmod(F.xxhash64(F.lit(seed), F.lit(tag), *cols), F.lit(m)) / F.lit(float(m))


def generate_changes(
    spark: SparkSession,
    n_events: int,
    n_keys: int = 1_000,
    seed: int = 42,
    p_insert: float = 0.6,
    p_update: float = 0.3,
    tokens_min: int = 1,
    tokens_max: int = 64,
    vocab: int = 50_000,
    hot_key_fraction: float = 0.01,
    hot_event_fraction: float = 0.10,
    evolve_at_lsn: int | None = None,
    first_lsn: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the change log [first_lsn, first_lsn + n_events) as a DataFrame.

    Columns: lsn, op, doc_id, tokens, n_tok, source, commit_ts
    (+ quality_score when evolve_at_lsn is set — null at or below it).

    Op mix, hot-key skew, token lengths per FIXTURES.md §3. Deletes carry
    null payload. A fraction of events lands on a small hot key set to
    exercise skew handling (salting / AQE).
    """
    # spark.range partitions are CONTIGUOUS ascending id ranges — with
    # num_partitions set, the output is already range-partitioned and
    # lsn-sorted, so write_changes(presorted=True) can skip the shuffle
    df = spark.range(
        first_lsn, first_lsn + n_events, 1, num_partitions
    ).withColumnRenamed("id", "lsn")
    lsn = F.col("lsn")

    n_hot = max(1, int(n_keys * hot_key_fraction))
    is_hot = _u(seed, "hot", lsn) < F.lit(hot_event_fraction)
    key_idx = F.when(
        is_hot, F.pmod(F.xxhash64(F.lit(seed), F.lit("hkey"), lsn), F.lit(n_hot))
    ).otherwise(F.pmod(F.xxhash64(F.lit(seed), F.lit("ukey"), lsn), F.lit(n_keys)))
    doc_id = F.format_string("doc-%08d", key_idx.cast("int"))

    r_op = _u(seed, "op", lsn)
    op = (
        F.when(r_op < F.lit(p_insert), F.lit("I"))
        .when(r_op < F.lit(p_insert + p_update), F.lit("U"))
        .otherwise(F.lit("D"))
    )

    span = tokens_max - tokens_min + 1
    tok_len = (
        F.lit(tokens_min) + F.pmod(F.xxhash64(F.lit(seed), F.lit("len"), lsn), F.lit(span))
    ).cast("int")
    tokens = F.when(tok_len <= 0, F.array().cast("array<int>")).otherwise(
        # the when-guard matters for tokens_min=0: sequence(1, 0) would
        # auto-step DOWN and yield [1, 0] — two tokens instead of none
        F.transform(
            F.sequence(F.lit(1), F.greatest(tok_len, F.lit(1))),
            lambda i: F.pmod(
                F.xxhash64(F.lit(seed), F.lit("tok"), lsn, i), F.lit(vocab)
            ).cast("int"),
        )
    )
    source = F.element_at(
        F.array(*[F.lit(s) for s in SOURCES]),
        (F.pmod(F.xxhash64(F.lit(seed), F.lit("src"), lsn), F.lit(len(SOURCES))) + 1).cast(
            "int"
        ),
    )

    is_delete = op == F.lit("D")
    # two-step projection: codegen subexpression elimination does NOT
    # dedupe the token-transform subtree across the `tokens` and
    # `size(tokens)` output expressions (each sits under its own
    # conditional branch, which CSE refuses to hoist), so a single-select
    # form evaluates the per-token hash transform TWICE per row — measured
    # 1.98s vs 1.23s for 2M events at local[32]. Materializing `tokens`
    # in a first projection and taking size() of the materialized column
    # halves the hash work; output is row-identical (pinned in
    # tests/test_loggen.py determinism tests).
    mid = df.select(
        lsn,
        op.alias("op"),
        doc_id.alias("doc_id"),
        F.when(~is_delete, tokens).alias("tokens"),
        F.when(~is_delete, source).alias("source"),
        F.timestamp_seconds(F.lit(EPOCH0) + lsn).alias("commit_ts"),
    )
    out = mid.select(
        "lsn",
        "op",
        "doc_id",
        "tokens",
        F.when(F.col("tokens").isNotNull(), F.size("tokens")).alias("n_tok"),
        "source",
        "commit_ts",
    )
    if evolve_at_lsn is not None:
        q = (
            F.pmod(F.xxhash64(F.lit(seed), F.lit("q"), lsn), F.lit(1000)) / F.lit(1000.0)
        ).cast("float")
        out = out.withColumn(
            "quality_score",
            F.when((lsn > F.lit(evolve_at_lsn)) & ~is_delete, q),
        )
    return out


def write_changes(
    df: DataFrame, path: str, n_files: int = 32, presorted: bool = False
) -> None:
    """Persist a change log as parquet, range-partitioned and sorted by lsn.

    Range partitioning + in-file ordering gives parquet row-group min/max
    stats on lsn, so watermark scans (lsn > lo AND lsn <= hi) prune files —
    the engine-side analogue of the reference pushing its watermark WHERE
    into the source query (reference import_operations.py:1316-1321).

    ``presorted=True`` asserts the frame is ALREADY range-partitioned and
    ascending in lsn (true for ``generate_changes(num_partitions=...)``,
    whose spark.range partitions are contiguous id ranges) and writes it
    as-is: the default path shuffles the full token payload through a
    range exchange plus a sort, which at log scale moves every byte of
    the log twice for an ordering the generator can provide for free.
    """
    if presorted:
        df.write.mode("overwrite").parquet(path)
        return
    (
        df.repartitionByRange(n_files, "lsn")
        .sortWithinPartitions("lsn")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_changes_segments(df: DataFrame, path: str, n_segments: int = 8) -> list[str]:
    """Write the log as SEQUENTIAL segment files with ascending mtimes —
    the shape a real WAL/binlog tailer produces, and the shape Spark's file
    stream source requires for in-LSN-order delivery (it orders files by
    modification time; a single parallel write gives all parts the same
    mtime, so delivery order — and hence the committed watermark — would be
    arbitrary). Segment k covers an LSN range strictly after segment k-1.
    """
    import os
    import shutil

    b = df.agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi")).first()
    lo, hi = b["lo"], b["hi"]
    os.makedirs(path, exist_ok=True)
    # stale segments from an earlier, wider write would overlap the new
    # LSN ranges (seg-00004+ surviving a re-write with n_segments=4) and
    # a file-stream consumer would replay conflicting events — clear them
    for name in os.listdir(path):
        if name.startswith("seg-") and name.endswith(".parquet"):
            os.unlink(os.path.join(path, name))
    if lo is None:
        return []  # empty log: no segments
    span = hi - lo + 1
    out: list[str] = []
    for k in range(n_segments):
        s = lo - 1 + (span * k) // n_segments
        e = lo - 1 + (span * (k + 1)) // n_segments
        # coalesce FIRST: sort-then-coalesce only concatenates per-parent
        # sorted runs (parquet splits arrive size-ordered), leaving the
        # single segment file only locally sorted — the in-lsn-order
        # row-group-stats rationale silently lost
        seg = df.filter(
            (F.col("lsn") > s) & (F.col("lsn") <= e)
        ).coalesce(1).sortWithinPartitions("lsn")
        tmp = f"{path}.seg-tmp"
        seg.write.mode("overwrite").parquet(tmp)
        part = next(n for n in sorted(os.listdir(tmp)) if n.endswith(".parquet"))
        dest = os.path.join(path, f"seg-{k:05d}.parquet")
        os.replace(os.path.join(tmp, part), dest)
        shutil.rmtree(tmp)
        out.append(dest)
    return out
