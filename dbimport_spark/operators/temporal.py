"""Temporal joins and event-time sessionization — pure Catalyst.

Operators Spark's DataFrame API lacks as primitives, built as
shuffle-minimal compositions (no UDF, no driver loop):

- ``asof_join``: for every left row, the latest (or earliest) right row
  with the same key whose timestamp is at-or-before (at-or-after) the
  left row's — the standard enrichment join for event streams against
  slowly-changing state. The classic distributed formulation: union the
  two sides with a side marker, hash-partition by key, sort by
  (timestamp, side), and carry the last non-null right payload forward
  with an ``ignorenulls`` window ``last`` — ONE exchange total, scales
  as a plain repartition+sort at 100 TB.

- ``range_join``: interval-containment join via fixed-width binning —
  the equi-join plan (hash/SMJ) instead of the BroadcastNestedLoopJoin
  Spark plans for a bare inequality join.

- ``sessionize``: gap-based session ids per key — lag + running sum
  over one window spec, again one exchange.

Both windows are per-key sequential scans; a pathologically hot key
serializes within its partition (inherent to order-dependent
semantics — same bound as Spark's own ``session_window``). Keys here
are users/documents, whose per-key event counts are bounded in
practice; the operators never collect or loop on the driver.

Reference parity: the reference engine has no temporal joins at all
(its joins are the keyed merge family, import_operations.py); these
cover the event-pipeline surface the north rule's training-data
ingestion implies (enriching change events against the latest state
snapshot at event time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "range_join", "sessionize"]


def _ordinal(df_or_schema, col: str) -> Column:
    """Exact ordering/difference value for a timestamp-or-numeric column:
    integer microseconds for timestamps (no float wobble at gap/tolerance
    boundaries), the raw value otherwise. TIMESTAMP_NTZ goes through a
    session-zone cast (the engine session pins UTC, session.py)."""
    dt = df_or_schema[col].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col))
    if isinstance(dt, T.TimestampNTZType):
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col)


def _scale(df_or_schema, col: str, seconds: float | int):
    """The gap/tolerance in the same unit ``_ordinal`` yields."""
    dt = df_or_schema[col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return int(round(float(seconds) * 1_000_000))
    return seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: float | int | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, enriched with the matched right
    row's ``right_cols`` (or NULLs when no right row qualifies).

    direction='backward' (default): latest right row with
    ``right.right_ts <= left.left_ts`` (inclusive, like pandas
    ``merge_asof`` and DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).
    direction='forward': earliest right row with
    ``right.right_ts >= left.left_ts``.

    tolerance: maximum allowed |left_ts - matched right_ts| — seconds for
    timestamp columns, raw units otherwise; a match farther away yields
    NULLs, same as no match.

    Carried right columns keep their name unless it collides with a left
    column, in which case ``suffix`` is appended. Rows with NULL keys
    group together (Spark window semantics); right rows tied on
    (key, right_ts) have an unspecified winner — pre-dedupe the right
    side if that matters.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # A NULL right timestamp matches nothing (merge_asof/ASOF JOIN
    # semantics). Dropping those rows up front also keeps the window
    # fold honest: under backward/asc ordering a NULL-ts right row would
    # sort FIRST and its (non-null) carry struct would propagate to every
    # left row that precedes all real right rows.
    right = right.where(F.col(right_ts).isNotNull())
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }
    # the suffixed name can itself collide (left has both 'v' and
    # 'v_r'): the join would then succeed silently with DUPLICATE output
    # columns and every downstream reference throws AMBIGUOUS_REFERENCE
    # far from the cause — refuse loudly here instead (pandas merge_asof
    # raises on the equivalent collision)
    clashes = sorted(
        n for c, n in out_names.items()
        if n != c and (n in left.columns or n in out_names)
    )
    if clashes:
        raise ValueError(
            f"asof_join: suffixed right column(s) {clashes} still "
            f"collide with a left or right output column — pass a "
            f"different suffix (got {suffix!r})"
        )

    carry = F.struct(
        _ordinal(right.schema, right_ts).alias("__ats"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    carry_type = right.select(carry.alias("c")).schema["c"].dataType

    lhs = left.select(
        *left.columns,
        _ordinal(left.schema, left_ts).alias("__ord"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(carry_type).alias("__carry"),
    )
    rhs = right.select(
        *[
            F.col(c).alias(c)
            if c in keys
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        _ordinal(right.schema, right_ts).alias("__ord"),
        F.lit(0).alias("__side"),
        carry.alias("__carry"),
    )
    both = lhs.unionByName(rhs)

    order = [F.col("__ord").asc(), F.col("__side").asc()]
    if direction == "forward":
        order = [F.col("__ord").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn(
        "__m", F.last("__carry", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    # A NULL left timestamp matches nothing. Without this guard the
    # forward direction would match spuriously: desc ordering puts NULLs
    # last, so a NULL-ts left row trails every right row and inherits the
    # earliest right carry (backward/asc is safe only because NULLs sort
    # first there).
    m: Column = F.when(F.col("__ord").isNotNull(), F.col("__m"))
    if tolerance is not None:
        tol = _scale(left.schema, left_ts, tolerance)
        dist = (
            F.col("__ord") - m["__ats"]
            if direction == "backward"
            else m["__ats"] - F.col("__ord")
        )
        m = F.when(dist <= F.lit(tol), m)
    return matched.select(
        *left.columns,
        *[m[c].alias(out_names[c]) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    left_point: str,
    lo: str,
    hi: str,
    bin_width: float | int,
    on: str | list[str] | None = None,
    bounds: str = "[)",
    suffix: str = "_r",
) -> DataFrame:
    """Interval-containment join without a nested-loop node: each left
    row joined to every interval row whose ``[lo, hi)`` (per ``bounds``)
    contains ``left.left_point``, optionally ANDed with equality keys
    ``on``.

    Spark plans a bare inequality join as BroadcastNestedLoopJoin —
    O(left × intervals) and a non-starter at scale. The standard fix
    (bin-based range join): quantize both sides to fixed-width bins —
    a point lands in one bin, an interval explodes to every bin it
    overlaps — equi-join on the bin (plus ``on`` keys), then apply the
    exact containment filter. The join becomes a plain hash/SMJ
    equi-join; cost scales with genuine candidate pairs, not the cross
    product.

    bin_width: in seconds for timestamp columns, raw units otherwise.
    Pick it near the TYPICAL interval length: too small explodes each
    interval into many bin rows, too large packs unrelated rows into
    one bin and pushes work into the post-join filter. Degenerate
    intervals (lo > hi, NULL bounds) match nothing.

    bounds: two characters, '[' / '(' for the low bound and ']' / ')'
    for the high bound; default '[)' (lo inclusive, hi exclusive).

    Inner-join semantics (a point in no interval is dropped; a point in
    k intervals appears k times). Interval columns keep their name
    unless it collides with a left column, then ``suffix`` is appended.
    """
    if bounds not in ("[)", "[]", "()", "(]"):
        raise ValueError(f"bounds must be one of [) [] () (], got {bounds!r}")
    if not bin_width or bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width!r}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    w = _scale(intervals.schema, lo, bin_width)

    p_ord = _ordinal(left.schema, left_point)
    lo_ord = _ordinal(intervals.schema, lo)
    hi_ord = _ordinal(intervals.schema, hi)

    out_names = {
        c: (c + suffix if c in left.columns else c)
        for c in intervals.columns
        if c not in keys
    }
    # one row per (interval, overlapped bin); the top bin is a superset
    # for exclusive-high bounds — the exact filter below trims it
    rhs = intervals.select(
        *[F.col(k).alias(f"__k_{i}") for i, k in enumerate(keys)],
        *[F.col(c).alias(out_names[c]) for c in out_names],
        lo_ord.alias("__lo"),
        hi_ord.alias("__hi"),
    ).where(F.col("__lo") <= F.col("__hi"))
    rhs = rhs.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col("__lo") / F.lit(w)),
                F.floor(F.col("__hi") / F.lit(w)),
            )
        ),
    )
    lhs = left.withColumn("__p", p_ord).withColumn(
        "__bin", F.floor(F.col("__p") / F.lit(w))
    )

    lo_ok = (
        F.col("__p") >= F.col("__lo")
        if bounds[0] == "["
        else F.col("__p") > F.col("__lo")
    )
    hi_ok = (
        F.col("__p") <= F.col("__hi")
        if bounds[1] == "]"
        else F.col("__p") < F.col("__hi")
    )
    cond = lhs["__bin"] == rhs["__bin"]
    for i, k in enumerate(keys):
        cond = cond & (lhs[k] == rhs[f"__k_{i}"])
    joined = lhs.join(rhs, cond, "inner").where(lo_ok & hi_ok)
    return joined.select(
        *[lhs[c] for c in left.columns],
        *[rhs[out_names[c]] for c in out_names],
    )


def sessionize(
    df: DataFrame,
    key: str | list[str],
    ts: str,
    gap: float | int,
    order_cols: list[str] | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: append ``out_col``, the 1-based session
    ordinal per key — a new session starts when the gap to the previous
    event STRICTLY exceeds ``gap`` (seconds for timestamp columns, raw
    units otherwise). ``order_cols`` breaks ordering ties among events
    with equal timestamps (pass the event id for determinism)."""
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    cur = _ordinal(df.schema, ts)
    prev = F.lag(cur).over(w)
    new_s = (prev.isNull() | (cur - prev > F.lit(_scale(df.schema, ts, gap)))).cast(
        "long"
    )
    sid = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, sid)
