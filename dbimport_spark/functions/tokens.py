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
    """struct(min, max, sum) over a token array via JVM-side aggregate.
    mn/mx/sm are BIGINT regardless of element type — a zero struct
    hardcoded to the element's width would make the aggregate's merge
    lambda type-mismatch on any non-int token column (e.g. xxhash64-
    derived bigint ids)."""
    zero = F.struct(
        F.lit(None).cast("bigint").alias("mn"),
        F.lit(None).cast("bigint").alias("mx"),
        F.lit(0).cast("bigint").alias("sm"),
    )
    return F.aggregate(
        tokens,
        zero,
        lambda acc, x: F.struct(
            F.least(F.coalesce(acc.mn, x.cast("bigint")), x.cast("bigint")).alias("mn"),
            F.greatest(F.coalesce(acc.mx, x.cast("bigint")), x.cast("bigint")).alias("mx"),
            (acc.sm + x.cast("bigint")).alias("sm"),
        ),
    )


def truncate_tokens(tokens: Column, max_len: int) -> Column:
    return F.slice(tokens, 1, max_len)


# -- Arrow/pandas UDFs (vectorized; for folds builtins can't express) --------


FP_MOD = (1 << 31) - 1  # Mersenne prime: h*B < 2^52 stays exact in uint64/int64
FP_B1 = 1_000_003
FP_B2 = 2_000_029


@pandas_udf("long")
def rolling_token_fingerprint(tokens: pd.Series) -> pd.Series:
    """Order-sensitive polynomial rolling hash over the token sequence —
    the classic Rabin-Karp fold, as TWO independent 31-bit Mersenne Horner
    chains packed into one 62-bit value:

        h_b = fold((acc * B + t) mod (2^31-1)),  fp = h_B1 * 2^31 + h_B2

    31-bit moduli keep every intermediate < 2^52, so the whole fold is
    exact uint64 numpy — fully vectorized ACROSS the Arrow batch: one flat
    token buffer + offsets, then one vector op per token POSITION (the
    ragged-Horner formulation), never per-row Python. The same fold is
    SQL-expressible (list_reduce with BIGINT accumulator), so the gate
    checks it value-exactly against an independent engine.
    """
    import numpy as np

    n = len(tokens)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return pd.Series(out)
    lens = np.fromiter(
        (0 if t is None else len(t) for t in tokens), dtype=np.int64, count=n
    )
    total = int(lens.sum())
    if total == 0:
        return pd.Series(out)
    flat = np.empty(total, dtype=np.uint64)
    pos = 0
    for t, ln in zip(tokens, lens):
        if ln:
            arr = np.asarray(t)
            if arr.dtype.kind not in ("i", "u"):
                # pandas delivers arrays WITH null elements as float/
                # object; a straight int64 cast would turn NaN into a
                # platform-dependent sentinel and emit a silently wrong
                # fingerprint (only a RuntimeWarning) — refuse loudly
                fa = arr.astype(np.float64)
                if np.isnan(fa).any():
                    raise ValueError(
                        "rolling_token_fingerprint: token array contains "
                        "null element(s) — a null token has no stable "
                        "fingerprint; filter or repair the rows first"
                    )
                arr = arr.astype(np.int64)
            flat[pos : pos + ln] = np.mod(arr, FP_MOD)
            pos += ln
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # process rows sorted by length DESC: the active set at every position
    # is then a contiguous prefix — pure slice views, no boolean masks or
    # scatter-assignments in the hot loop
    order = np.argsort(-lens, kind="stable")
    soffs = offsets[order]
    maxlen = int(lens.max())
    hist = np.bincount(lens, minlength=maxlen + 1)
    n_gt = n - np.cumsum(hist)  # n_gt[i] = #rows with len > i
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    M, B1, B2 = np.uint64(FP_MOD), np.uint64(FP_B1), np.uint64(FP_B2)
    for i in range(maxlen):
        na = int(n_gt[i])
        t_i = flat[soffs[:na] + i]
        h1[:na] = (h1[:na] * B1 + t_i) % M
        h2[:na] = (h2[:na] * B2 + t_i) % M
    out_sorted = (h1.astype(np.int64) << np.int64(31)) + h2.astype(np.int64)
    out = np.zeros(n, dtype=np.int64)
    out[order] = out_sorted
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
