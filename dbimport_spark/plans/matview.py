"""Incrementally-maintained aggregate views over the change feed.

The reference keeps downstream aggregates fresh by re-running export
queries over the whole table each cycle (export_operations.py runs the
full ``sparkQuery`` per export; custom validation aggregates likewise
re-scan, import_config.py:2257-2284). At the 100 TB design point a
re-scan per refresh is the wrong shape: this module maintains a
``GROUP BY`` table *incrementally* from the engine's own change feed
(``lake/cdf.py``) — each refresh reads only the rows a version window
changed, never the base table.

Semantics: the view equals

    SELECT <group_cols>, count(*) AS <count_col>,
           COALESCE(sum(c), 0) AS sum_<c> ...
    FROM source-live-rows GROUP BY <group_cols>

(sums treat an all-null group as 0, the invertible convention — a true
SQL ``NULL`` sum cannot be maintained without per-group non-null
counters). count and sum are self-inverting under deletes (+x on
insert, -x on delete, -old+new on update), which makes their delta
maintenance exact. min/max are NOT invertible; they are maintained by
the candidate rule (a new value can only grow the extremum) plus
GROUP-SCOPED rescan-on-invalidation: only a group whose stored extremum
was possibly removed is recomputed, from the source's live rows at the
window's end version — the table as a whole is still never rescanned.
Derive avg at read time as sum/count.

Exactly-once rides the engine unchanged: the view is a lake table whose
LSN domain is the SOURCE VERSION NUMBER (the mirror's trick,
plans/mirror.py) — totals and watermark commit atomically, a re-sync of
a committed window is skipped, and a crash between feed read and commit
leaves no partial state.

Null group values are unsupported: the group columns are the view's
merge key, and the engine's merge-key invariant (null keys are refused
loudly / quarantined, never silently grouped) applies — unlike SQL's
``GROUP BY``, which would invent a NULL group. Filter or coalesce null
group values in the source before aggregating on them.

Scale shape per refresh: one groupBy shuffle of the delta (feed-sized),
one left join of the delta against current totals (delta side drives;
AQE broadcasts it when small), and the engine's bucket-pruned merge of
the touched groups. The base table is never scanned after bootstrap —
bootstrap itself is the same code path, because version 0 is the empty
creation snapshot and its feed is the full table as inserts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbimport_spark.lake.cdf import CHANGE_TYPE_COL, table_changes, window_has_reload
from dbimport_spark.lake.table import LakeTable
from dbimport_spark.plans.engine import BatchStats, CDCEngine
from dbimport_spark.schema import AUDIT_COLUMNS, AUDIT_DELETE


def _log():
    import logging

    return logging.getLogger(__name__)


@dataclass
class AggSpec:
    """What the view maintains: count(*) plus sum()/min()/max() per
    listed column.

    count/sum are exactly delta-maintained (invertible). min/max are
    maintained by the candidate rule — a new value can only GROW the
    extremum, so inserts fold in for free — plus group-scoped
    rescan-on-invalidation: a removed value that EQUALS a group's stored
    extremum may have been its last carrier, so that group (and ONLY
    that group) is recomputed from the source's live rows. The base
    table is still never fully rescanned; the rescan reads the
    invalidated groups via a semi-join (predicate reaches the parquet
    scan) and its trigger count is logged per sync (no-silent-caps)."""

    group_cols: list[str]
    sum_cols: list[str] = field(default_factory=list)
    min_cols: list[str] = field(default_factory=list)
    max_cols: list[str] = field(default_factory=list)
    count_col: str = "n_rows"

    def sum_name(self, c: str) -> str:
        return f"sum_{c}"

    def min_name(self, c: str) -> str:
        return f"min_{c}"

    def max_name(self, c: str) -> str:
        return f"max_{c}"

    def minmax_cols(self) -> list[str]:
        return sorted(set(self.min_cols) | set(self.max_cols))


def view_schema(source_schema: T.StructType, spec: AggSpec) -> T.StructType:
    """View payload schema: group columns (source types, non-null — they
    are the merge key), the count, and one sum per aggregated column
    (integral sources widen to long, fractional to double — Spark's own
    sum() result types)."""
    by_name = {f.name: f for f in source_schema.fields}
    fields = []
    for g in spec.group_cols:
        if g not in by_name:
            raise ValueError(f"group column {g!r} not in source schema")
        fields.append(T.StructField(g, by_name[g].dataType, False))
    fields.append(T.StructField(spec.count_col, T.LongType(), True))
    for c in spec.sum_cols:
        if c not in by_name:
            raise ValueError(f"sum column {c!r} not in source schema")
        dt = by_name[c].dataType
        out: T.DataType
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            out = T.DoubleType()
        elif isinstance(dt, T.DecimalType):
            out = T.DecimalType(min(dt.precision + 10, 38), dt.scale)
        elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            out = T.LongType()
        else:
            raise ValueError(f"sum column {c!r} has non-numeric type {dt}")
        fields.append(T.StructField(spec.sum_name(c), out, True))
    orderable = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
        T.DoubleType, T.DecimalType, T.StringType, T.TimestampType,
        T.DateType, T.BooleanType,
    )
    for c in spec.minmax_cols():
        if c not in by_name:
            raise ValueError(f"min/max column {c!r} not in source schema")
        dt = by_name[c].dataType
        if not isinstance(dt, orderable):
            raise ValueError(
                f"min/max column {c!r} has non-orderable type {dt}"
            )
        # extremes keep the source type (no widening — min/max never
        # leave the input domain)
        if c in spec.min_cols:
            fields.append(T.StructField(spec.min_name(c), dt, True))
        if c in spec.max_cols:
            fields.append(T.StructField(spec.max_name(c), dt, True))
    return T.StructType(fields)


def create_view(
    root: str,
    source: LakeTable,
    spec: AggSpec,
    num_buckets: int = 16,
) -> LakeTable:
    """Create the (empty) view table keyed by the group columns."""
    src_payload = T.StructType(
        [f for f in source.current().schema.fields if f.name not in AUDIT_COLUMNS]
    )
    return CDCEngine.create_table(
        root,
        payload_schema=view_schema(src_payload, spec),
        num_buckets=num_buckets,
        key=list(spec.group_cols),
    )


def _source_live(
    spark: SparkSession, source: LakeTable, version: int | None = None
) -> DataFrame:
    df = source.read(spark, version=version)
    if AUDIT_DELETE in df.columns:
        df = df.filter(F.col(AUDIT_DELETE).isNull())
    return df


def _contributions(feed: DataFrame, spec: AggSpec) -> DataFrame:
    """Explode the net feed into signed (+/-) per-row contributions.

    post side (+1): insert and update rows at their NEW group/values;
    pre side  (-1): delete rows at their last-known values, update rows
    at their ``_pre_*`` pre-image values. An update that moves a row
    across groups therefore decrements the old group and increments the
    new one in the same delta.

    Shape: ONE pass over the feed — each row builds an array of its 0-2
    contribution structs (post / pre), compacted and exploded. The former
    three-way union re-executed the feed's snapshot-diff JOIN once per
    branch (three scans of both diff sides; the bootstrap sync paid two
    of them for provably-empty branches), tripling the dominant cost of
    every view sync.
    """
    ct = F.col(CHANGE_TYPE_COL)
    dtypes = {f.name: f.dataType for f in feed.schema.fields}

    # per-min/max column: an update that kept both the row's group AND
    # this value contributes nothing (not a candidate, not a removal) —
    # the value is still carried by the same row, so it can neither grow
    # nor invalidate the extremum; skipping it avoids needless rescans
    def unchanged(c: str):
        same = F.lit(True)
        for g in spec.group_cols:
            same = same & F.col(f"_pre_{g}").eqNullSafe(F.col(g))
        return (ct == "update") & same & F.col(f"_pre_{c}").eqNullSafe(F.col(c))

    def contrib(sign: int, prefix: str):
        """Contribution struct at ``prefix`` columns with ``sign``."""
        fields = [
            *[F.col(prefix + g).alias(g) for g in spec.group_cols],
            F.lit(sign).cast("long").alias("_d_n"),
            *[
                (F.lit(sign) * F.col(prefix + c)).alias(spec.sum_name(c))
                for c in spec.sum_cols
            ],
        ]
        for c in spec.minmax_cols():
            null = F.lit(None).cast(dtypes[c])
            if sign == 1:  # post side: candidate new values
                fields.append(
                    F.when(unchanged(c), null)
                    .otherwise(F.col(c))
                    .alias(f"_post_{c}")
                )
                fields.append(null.alias(f"_rem_{c}"))
            else:  # pre side: removed values (delete / update pre-image)
                fields.append(null.alias(f"_post_{c}"))
                fields.append(
                    (
                        F.col(c)
                        if prefix == ""
                        else F.when(unchanged(c), null).otherwise(
                            F.col(f"_pre_{c}")
                        )
                    ).alias(f"_rem_{c}")
                )
        return F.struct(*fields)

    post = F.when(ct.isin("insert", "update"), contrib(1, ""))
    pre = F.when(ct == "delete", contrib(-1, "")).when(
        ct == "update", contrib(-1, "_pre_")
    )
    exploded = feed.select(
        F.explode(F.array_compact(F.array(post, pre))).alias("_c")
    )
    return exploded.select("_c.*")


def sync_view(
    spark: SparkSession,
    source: LakeTable,
    view_engine: CDCEngine,
    spec: AggSpec,
    on_gap: str = "error",
    pin_name: str | None = None,
) -> BatchStats:
    """Advance the view to the source's current version (see
    ``_sync_view_impl`` for semantics). ``pin_name``: advance a retention
    pin on the SOURCE to the view's synced version afterwards —
    ``expire_snapshots`` then keeps this view's delta base alive, so a
    lagging view is never forced through the ``on_gap='full'`` rebuild.
    Best-effort, exactly like the mirror's pin."""
    bs = _sync_view_impl(spark, source, view_engine, spec, on_gap)
    if pin_name is not None:
        from dbimport_spark.lake.table import advance_pin

        advance_pin(source, pin_name, max(view_engine.table.last_lsn(), 0))
    return bs


def apply_feed_to_view(
    spark: SparkSession,
    source: LakeTable,
    view_engine: CDCEngine,
    spec: AggSpec,
    feed: DataFrame,
    from_v: int,
    to_v: int,
) -> BatchStats:
    """Apply one window's PRE-IMAGE change feed to the view — the shared
    core of the batch ``sync_view`` and the streaming
    ``follow_view_stream`` (streaming/cdf_source.py). ``feed`` carries
    ``table_changes(..., include_preimage=True)``'s columns — equally a
    ``lake_cdf`` stream micro-batch read with ``includePreimage`` (the
    two are pinned row-identical by tests/test_cdf_stream.py). The
    window MUST start at the view's own watermark and callers enforce
    it; min/max invalidation rescans read the SOURCE at ``to_v``."""
    if list(view_engine.keys) != list(spec.group_cols):
        raise ValueError(
            f"spec.group_cols {spec.group_cols} != view table merge key "
            f"{list(view_engine.keys)} — the view is keyed by its group "
            "columns; syncing with a different spec would corrupt totals"
        )
    # one metadata parse for every per-sum-column type lookup below
    vschema = view_engine.table.current().schema
    sums = [
        F.coalesce(F.sum(spec.sum_name(c)), F.lit(0))
        .cast(_view_sum_type(view_engine, spec, c, vschema))
        .alias(spec.sum_name(c))
        for c in spec.sum_cols
    ]
    mm_aggs = []
    for c in spec.min_cols:
        mm_aggs.append(F.min(f"_post_{c}").alias(f"_cand_min_{c}"))
        mm_aggs.append(F.min(f"_rem_{c}").alias(f"_remv_min_{c}"))
    for c in spec.max_cols:
        mm_aggs.append(F.max(f"_post_{c}").alias(f"_cand_max_{c}"))
        mm_aggs.append(F.max(f"_rem_{c}").alias(f"_remv_max_{c}"))
    delta = (
        _contributions(feed, spec)
        .groupBy(*spec.group_cols)
        .agg(F.sum("_d_n").alias("_d_n"), *sums, *mm_aggs)
    )
    # drop no-op deltas (e.g. an update that only touched columns the
    # view does not aggregate): no reason to rewrite those groups
    noop = F.col("_d_n") == 0
    for c in spec.sum_cols:
        noop = noop & (F.col(spec.sum_name(c)) == 0)
    for c in spec.min_cols:
        noop = noop & F.col(f"_cand_min_{c}").isNull()
        noop = noop & F.col(f"_remv_min_{c}").isNull()
    for c in spec.max_cols:
        noop = noop & F.col(f"_cand_max_{c}").isNull()
        noop = noop & F.col(f"_remv_max_{c}").isNull()
    # group-cardinality-sized; materialized once because three
    # consumers follow (bucket collect, join, merge) — an uncached
    # delta would re-run the feed groupBy per consumer. Caveat: this
    # buys the reuse at the cost of materializing |touched groups|
    # rows — the right trade while group cardinality << row
    # cardinality; a near-unique grouping (groups ~ rows) makes the
    # checkpoint itself data-sized, and such a "view" should be a
    # mirror instead
    delta = delta.filter(~noop).localCheckpoint(eager=True)

    # current totals, bucket-pruned to the delta's touched groups:
    # sync cost scales with the window's delta, not the view size
    vsnap = view_engine.table.current()
    bexpr = view_engine.table.bucket_expr(
        key_col=list(spec.group_cols), num_buckets=vsnap.num_buckets
    )
    touched = sorted(
        r["bucket"]
        for r in delta.select(bexpr.alias("bucket")).distinct().collect()
    )
    cur = view_engine.table.read(spark, buckets=touched)
    if AUDIT_DELETE in cur.columns:
        cur = cur.filter(F.col(AUDIT_DELETE).isNull())
    cur = cur.select(
        *spec.group_cols,
        F.col(spec.count_col).alias("_cur_n"),
        *[
            F.col(spec.sum_name(c)).alias(f"_cur_{spec.sum_name(c)}")
            for c in spec.sum_cols
        ],
        *[
            F.col(spec.min_name(c)).alias(f"_cur_min_{c}")
            for c in spec.min_cols
        ],
        *[
            F.col(spec.max_name(c)).alias(f"_cur_max_{c}")
            for c in spec.max_cols
        ],
    )
    merged = delta.join(cur, on=list(spec.group_cols), how="left")
    new_n = F.coalesce(F.col("_cur_n"), F.lit(0)) + F.col("_d_n")

    # min/max invalidation: a removed value that ties-or-beats the
    # group's stored extremum may have been its last carrier — that
    # group (and ONLY that group) is recomputed from the source's
    # live rows at to_v. Candidates alone handle everything else:
    # a surviving new value can only GROW the extremum.
    inval = F.lit(False)
    for c in spec.min_cols:
        inval = inval | (
            F.col(f"_remv_min_{c}").isNotNull()
            & (
                F.col(f"_cur_min_{c}").isNull()
                | (F.col(f"_remv_min_{c}") <= F.col(f"_cur_min_{c}"))
            )
        )
    for c in spec.max_cols:
        inval = inval | (
            F.col(f"_remv_max_{c}").isNotNull()
            & (
                F.col(f"_cur_max_{c}").isNull()
                | (F.col(f"_remv_max_{c}") >= F.col(f"_cur_max_{c}"))
            )
        )
    # new groups carry no removals by construction; a group folding
    # to zero rows is deleted outright — neither needs a rescan
    inval = inval & F.col("_cur_n").isNotNull() & (new_n > 0)

    def fold_events(rows: DataFrame) -> DataFrame:
        return rows.select(
            F.lit(to_v).cast("long").alias("lsn"),
            F.when(new_n <= 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            *spec.group_cols,
            new_n.alias(spec.count_col),
            *[
                (
                    F.coalesce(F.col(f"_cur_{spec.sum_name(c)}"), F.lit(0))
                    + F.col(spec.sum_name(c))
                )
                .cast(_view_sum_type(view_engine, spec, c, vschema))
                .alias(spec.sum_name(c))
                for c in spec.sum_cols
            ],
            # least/greatest skip nulls: for a NEW group _cur_* is
            # null and the candidate wins; for a surviving group the
            # stored extremum folds with the window's candidates
            *[
                F.least(F.col(f"_cur_min_{c}"), F.col(f"_cand_min_{c}"))
                .alias(spec.min_name(c))
                for c in spec.min_cols
            ],
            *[
                F.greatest(F.col(f"_cur_max_{c}"), F.col(f"_cand_max_{c}"))
                .alias(spec.max_name(c))
                for c in spec.max_cols
            ],
        )

    # the fold-event frame is group-cardinality-sized (touched groups
    # only), but the engine consumes it in TWO jobs (stats agg + write),
    # each of which would re-execute the delta-join/rescan dataflow —
    # materialize it once (lazy: the stats agg computes, the write reads
    # cache). Same group-cardinality bound as the delta checkpoint above.
    if not spec.minmax_cols():
        return view_engine.apply_batch(
            fold_events(merged).localCheckpoint(eager=False), from_v, to_v
        )

    # group-scoped rescan: tiny (one row per invalidated group), and
    # consumed three times (count for the log, broadcast join, plan)
    rescan_keys = (
        merged.filter(inval)
        .select(*spec.group_cols)
        .localCheckpoint(eager=True)
    )
    n_rescan = rescan_keys.count()
    _log().info(
        "sync_view window (%d, %d]: %d group(s) rescanned for min/max "
        "invalidation",
        from_v,
        to_v,
        n_rescan,
    )
    if n_rescan == 0:
        return view_engine.apply_batch(
            fold_events(merged).localCheckpoint(eager=False), from_v, to_v
        )

    # recompute ALL aggregates for the invalidated groups from the
    # source's live rows AT to_v (never current() — a concurrent
    # writer may have advanced the source past this sync's window);
    # count/sum would fold exactly anyway, but one groupBy for
    # everything keeps the rescan single-pass
    src = source.read(spark, version=to_v)
    if AUDIT_DELETE in src.columns:
        src = src.filter(F.col(AUDIT_DELETE).isNull())
    recomputed = (
        src.join(
            F.broadcast(rescan_keys), on=list(spec.group_cols), how="inner"
        )
        .groupBy(*spec.group_cols)
        .agg(
            F.count(F.lit(1)).alias(spec.count_col),
            *[
                F.coalesce(F.sum(F.col(c)), F.lit(0))
                .cast(_view_sum_type(view_engine, spec, c, vschema))
                .alias(spec.sum_name(c))
                for c in spec.sum_cols
            ],
            *[F.min(F.col(c)).alias(spec.min_name(c)) for c in spec.min_cols],
            *[F.max(F.col(c)).alias(spec.max_name(c)) for c in spec.max_cols],
        )
    )
    rescan_events = recomputed.select(
        F.lit(to_v).cast("long").alias("lsn"),
        F.lit("U").alias("op"),
        *spec.group_cols,
        F.col(spec.count_col),
        *[F.col(spec.sum_name(c)) for c in spec.sum_cols],
        *[F.col(spec.min_name(c)) for c in spec.min_cols],
        *[F.col(spec.max_name(c)) for c in spec.max_cols],
    )
    # group-cardinality-sized; materialized once so the engine's stats agg
    # and write jobs don't each re-run the rescan join + delta fold
    events = (
        fold_events(merged.filter(~inval))
        .unionByName(rescan_events)
        .localCheckpoint(eager=False)
    )
    return view_engine.apply_batch(
        events, from_v, to_v, stats_extra={"rescanned_groups": n_rescan}
    )


def _sync_view_impl(
    spark: SparkSession,
    source: LakeTable,
    view_engine: CDCEngine,
    spec: AggSpec,
    on_gap: str = "error",
) -> BatchStats:
    """Advance the view to the source's current version. Idempotent.

    ``on_gap``: when the last-synced source snapshot has been expired
    (the delta base is gone), 'error' raises and 'full' rebuilds — a
    one-time full groupBy of the source plus anti-join deletes for
    groups that vanished, applied through the same exactly-once merge.
    """
    if list(view_engine.keys) != list(spec.group_cols):
        raise ValueError(
            f"spec.group_cols {spec.group_cols} != view table merge key "
            f"{list(view_engine.keys)} — the view is keyed by its group "
            "columns; syncing with a different spec would corrupt totals"
        )
    from_v = max(view_engine.table.last_lsn(), 0)
    to_v = source.current().version
    if to_v <= from_v:
        return BatchStats(lo=from_v, hi=to_v, skipped=True)

    reload_v = window_has_reload(source, from_v, to_v)
    if from_v in source.snapshots() and reload_v is None:
        # compare_cols scopes update detection to the view's own columns:
        # a source row whose group/sum/min/max columns are ALL unchanged
        # contributes exactly zero to every maintained aggregate (its +1
        # and -1 cancel in the same group, its sums cancel, and the
        # `unchanged` rule already nulled its min/max candidates), so
        # dropping it from the feed changes nothing — while letting
        # Catalyst prune the wide payload columns from both diff-join
        # sides. Measured: the sf0.1 incr sync's feed join drops from
        # full-token-array width to (key, source, n_tok).
        feed = table_changes(
            spark, source, from_v, to_v, include_preimage=True,
            compare_cols=sorted(
                set(spec.group_cols)
                | set(spec.sum_cols)
                | set(spec.minmax_cols())
            ),
        )
        return apply_feed_to_view(
            spark, source, view_engine, spec, feed, from_v, to_v
        )

    if on_gap != "full":
        if reload_v is not None:
            raise ValueError(
                f"window ({from_v}, {to_v}] crosses a declared full "
                f"reload at version {reload_v} — an incremental sync "
                "cannot cover it. Re-run with on_gap='full' for a "
                "one-time full rebuild."
            )
        raise ValueError(
            f"source snapshot {from_v} has been expired (retained: "
            f"{source.snapshots()}) — the delta base is gone. Re-run with "
            "on_gap='full' for a one-time full rebuild."
        )
    # no-silent-caps: the rebuild scans the whole source once — report
    # how much, from file metadata alone, before paying it. The scan is
    # PINNED to to_v: reading current() instead would count a commit that
    # lands during the rebuild while the watermark stays at to_v, and the
    # next incremental sync would re-apply that commit's deltas onto
    # totals that already include it — off-by-one forever (deltas fold,
    # they never self-correct).
    src_snap = source.snapshot(to_v)
    _log().warning(
        "sync_view on_gap='full': delta base v%d expired — full rebuild "
        "will scan the source (%d rows, %d bytes, %d files)",
        from_v,
        sum(f.rows for f in src_snap.files),
        sum(f.bytes for f in src_snap.files),
        len(src_snap.files),
    )
    fresh = (
        _source_live(spark, source, version=to_v)
        .groupBy(*spec.group_cols)
        .agg(
            F.count(F.lit(1)).alias(spec.count_col),
            *[
                F.coalesce(F.sum(F.col(c)), F.lit(0))
                .cast(_view_sum_type(view_engine, spec, c))
                .alias(spec.sum_name(c))
                for c in spec.sum_cols
            ],
            *[F.min(F.col(c)).alias(spec.min_name(c)) for c in spec.min_cols],
            *[F.max(F.col(c)).alias(spec.max_name(c)) for c in spec.max_cols],
        )
    )
    upserts = fresh.select(
        F.lit(to_v).cast("long").alias("lsn"), F.lit("U").alias("op"), "*"
    )
    vtypes = {
        f.name: f.dataType for f in view_engine.table.current().schema.fields
    }
    gone = (
        view_engine.table.read(spark)
        .select(*spec.group_cols)
        .join(fresh.select(*spec.group_cols), on=list(spec.group_cols), how="left_anti")
        .select(
            F.lit(to_v).cast("long").alias("lsn"),
            F.lit("D").alias("op"),
            *spec.group_cols,
            F.lit(None).cast("long").alias(spec.count_col),
            *[
                F.lit(None)
                .cast(vtypes[spec.sum_name(c)])
                .alias(spec.sum_name(c))
                for c in spec.sum_cols
            ],
            *[
                F.lit(None).cast(vtypes[spec.min_name(c)]).alias(spec.min_name(c))
                for c in spec.min_cols
            ],
            *[
                F.lit(None).cast(vtypes[spec.max_name(c)]).alias(spec.max_name(c))
                for c in spec.max_cols
            ],
        )
    )
    return view_engine.apply_batch(upserts.unionByName(gone), from_v, to_v)


def follow_view(
    spark: SparkSession,
    source: LakeTable,
    view_engine: CDCEngine,
    spec: AggSpec,
    poll_s: float = 5.0,
    max_syncs: int | None = None,
    stop_file: str | None = None,
    on_gap: str = "error",
    pin_name: str | None = None,
) -> list[BatchStats]:
    """Continuous view maintenance: poll the source and ``sync_view``
    each time it advances (``plans/mirror.follow_mirror``'s shape — the
    watermark lives in the VIEW table, so a killed follower resumes from
    its last committed sync). Stops after ``max_syncs`` applied syncs,
    or — drain first, then stop — when ``stop_file`` exists and the
    source has no pending window."""
    from dbimport_spark.plans.mirror import follow_sync

    return follow_sync(
        lambda: sync_view(
            spark, source, view_engine, spec, on_gap=on_gap,
            pin_name=pin_name,
        ),
        poll_s=poll_s, max_syncs=max_syncs, stop_file=stop_file,
    )


def _view_sum_type(
    view_engine: CDCEngine, spec: AggSpec, c: str, schema=None
) -> T.DataType:
    # callers building per-sum-column expression lists pass the schema
    # once — each bare call re-opens and json-parses the full view
    # snapshot metadata (O(files)), which adds up to ~4x|sum_cols| full
    # parses per sync when left implicit
    if schema is None:
        schema = view_engine.table.current().schema
    dt = next(
        (f.dataType for f in schema.fields if f.name == spec.sum_name(c)),
        None,
    )
    if dt is None:
        raise ValueError(
            f"view table has no column {spec.sum_name(c)!r} — the spec's "
            f"sum_cols do not match the view (created with a different "
            "AggSpec?)"
        )
    return dt


def verify_view(
    spark: SparkSession, source: LakeTable, view: LakeTable, spec: AggSpec
) -> dict:
    """Reconcile the maintained totals against a direct groupBy of the
    source's live rows (count + content checksum — the same shape as the
    reference's custom-aggregate validation, import_config.py:2257-2284)."""
    from dbimport_spark.plans.validate import reconcile

    cols = (
        list(spec.group_cols)
        + [spec.count_col]
        + [spec.sum_name(c) for c in spec.sum_cols]
        + [spec.min_name(c) for c in spec.min_cols]
        + [spec.max_name(c) for c in spec.max_cols]
    )
    vdf = view.read(spark)
    if AUDIT_DELETE in vdf.columns:
        vdf = vdf.filter(F.col(AUDIT_DELETE).isNull())
    vtypes = {f.name: f.dataType for f in view.current().schema.fields}
    expected = (
        _source_live(spark, source)
        .groupBy(*spec.group_cols)
        .agg(
            F.count(F.lit(1)).alias(spec.count_col),
            *[
                F.coalesce(F.sum(F.col(c)), F.lit(0))
                .cast(vtypes[spec.sum_name(c)])
                .alias(spec.sum_name(c))
                for c in spec.sum_cols
            ],
            *[F.min(F.col(c)).alias(spec.min_name(c)) for c in spec.min_cols],
            *[F.max(F.col(c)).alias(spec.max_name(c)) for c in spec.max_cols],
        )
    )
    return reconcile(vdf.select(*cols), expected.select(*cols), cols)
