"""Last-writer-wins batch dedup: one surviving event per key, max LSN.

This is correctness-critical, not an optimization: the MERGE requires a
unique source key per target key (exactly why the reference pre-dedupes its
Flashback imports with a max-SCN-per-PK view, reference
import_config.py:3238-3252, SURVEY.md J6).

``key`` may be a list — the engine passes ["_bucket", "doc_id"] in its
bucket-aligned plan so the grouping is satisfied by the batch's existing
HashPartitioning(_bucket) and the dedup runs WITHOUT its own shuffle
(Catalyst: HashPartitioning(exprs) satisfies ClusteredDistribution(keys)
when exprs ⊆ keys).

Three strategies, all equivalent:

- ``window``  — ``row_number() OVER (PARTITION BY key ORDER BY lsn DESC)``,
  the literal form named by the north star. A single hot key serializes
  into one task.
- ``maxby``   — ``groupBy(key).agg(max_by(struct(*cols), lsn))``. Map-side
  partial combine absorbs hot keys, BUT the struct-typed aggregation
  buffer is not hash-aggregable, so Spark compiles it to SortAggregate —
  a per-partition sort of full event rows (token arrays included).
- ``maxjoin`` — ``groupBy(key).agg(max(lsn))`` (pure-long HashAggregate,
  map-side combined, skew-immune) then a semi join back on
  (key, order_col) to pick the winning rows. Requires order_col unique
  per key (LSNs are globally unique). The winners side is tiny after the
  agg, so Catalyst broadcasts the semi join — no sort anywhere, no event
  row ever passes through an aggregation buffer. Measured ~2x faster than
  maxby on 8M events. **Default.**
- ``salted``  — explicit two-phase: first reduce per (key, salt) where
  salt = pmod(xxhash64(lsn), S), then per key. Guards the reducer even if
  partial aggregation is disabled/overwhelmed; the form the north rule
  names ("salted on hot doc_id prefixes"). The rank is computed per
  (salt, key) then re-reduced per key — the re-reduce is what makes
  salting correct (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STRATEGIES = ("window", "maxby", "maxjoin", "salted")


def dedup_lww(
    df: DataFrame,
    key: str | list[str] = "doc_id",
    order_col: str = "lsn",
    strategy: str = "maxjoin",
    n_salts: int = 16,
) -> DataFrame:
    """Return one row per key: the event with the highest order_col."""
    if strategy not in STRATEGIES:
        raise ValueError(f"strategy must be one of {STRATEGIES}")
    keys = [key] if isinstance(key, str) else list(key)
    cols = df.columns

    if strategy == "maxjoin":
        winners = df.groupBy(*keys).agg(F.max(order_col).alias(order_col))
        return df.join(winners, [*keys, order_col], "left_semi")

    if strategy == "window":
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    payload = F.struct(*[F.col(c) for c in cols])
    if strategy == "maxby":
        return (
            df.groupBy(*keys)
            .agg(F.max_by(payload, F.col(order_col)).alias("_w"))
            .select("_w.*")
        )

    # salted two-phase
    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.max_by(payload, F.col(order_col)).alias("_w"), F.max(order_col).alias("_o"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.max_by(F.col("_w"), F.col("_o")).alias("_w"))
        .select("_w.*")
    )
