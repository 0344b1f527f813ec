"""Property-based convergence: arbitrary op sequences (including pathological
delete/re-insert interleavings and duplicate-content updates) must fold to
the pandas oracle under any batching."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.schema import CHANGE_SCHEMA, PAYLOAD_COLUMNS
from tests.oracle import as_tuple_set, lww_fold

KEYS = ["a", "b", "c"]

event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(KEYS),
    st.lists(st.integers(0, 5), min_size=0, max_size=3),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event, min_size=1, max_size=12), st.integers(1, 3))
def test_random_sequences_converge(spark, tmp_path_factory, ops, num_batches):
    rows = []
    for i, (op, key, toks) in enumerate(ops, start=1):
        if op == "D":
            rows.append((i, op, key, None, None, None, dt.datetime(2024, 1, 1)))
        else:
            rows.append(
                (i, op, key, toks, len(toks), "web", dt.datetime(2024, 1, 1))
            )
    log = spark.createDataFrame(rows, CHANGE_SCHEMA)
    root = str(tmp_path_factory.mktemp("prop"))
    table = CDCEngine.create_table(root + "/t", num_buckets=4)
    CDCEngine(spark, table, broadcast_threshold_rows=2).replay(
        log, num_batches=num_batches
    )
    got = as_tuple_set(
        [r.asDict() for r in table.read(spark).collect()], PAYLOAD_COLUMNS
    )
    expected = lww_fold([r.asDict() for r in log.collect()])
    assert got == as_tuple_set(list(expected.values()), PAYLOAD_COLUMNS)


evo_step = st.sampled_from(["plain", "widen", "add"])


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(evo_step, min_size=2, max_size=5))
def test_random_evolution_sequences_converge(spark, tmp_path_factory, steps):
    """Random interleavings of plain / type-widening / column-adding batches
    must evolve the schema monotonically and keep every row readable with
    the right values."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dbimport_spark.plans.engine import CDCEngine

    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    root = str(tmp_path_factory.mktemp("evoseq"))
    table = CDCEngine.create_table(root + "/t", payload_schema=payload, num_buckets=4)
    eng = CDCEngine(spark, table)

    q_seen = False
    lsn = 0
    for si, step in enumerate(steps):
        rows = []
        for k in range(3):
            lsn += 1
            key = f"k{(si + k) % 5}"
            rows.append((lsn, "I", key, lsn * 10))
        df = spark.createDataFrame(rows, "lsn long, op string, doc_id string, v long")
        if step == "widen":
            pass  # v already long: widening against the int table schema
        elif step == "plain":
            df = df.withColumn("v", F.col("v").cast("int"))
        if step == "add" or q_seen:
            q_seen = True
            df = df.withColumn("q", F.col("lsn"))
        eng.apply_batch(df, lsn - 3, lsn)

    # recompute expectation precisely: LWW per key with q = lsn when the
    # winning batch carried q, else null
    winners: dict = {}
    lsn = 0
    q_from = None
    for si, step in enumerate(steps):
        if step == "add" and q_from is None:
            q_from = lsn + 1
        for k in range(3):
            lsn += 1
            key = f"k{(si + k) % 5}"
            winners[key] = (lsn * 10, lsn if q_from is not None and lsn >= q_from else None)
    got = {
        (r["doc_id"], r["v"], r.asDict().get("q"))
        for r in table.read(spark).collect()
    }
    want = {(k, v, q) for k, (v, q) in winners.items()}
    assert got == want
    # widened runs end with a bigint column
    if "widen" in steps:
        assert dict(table.read(spark).dtypes)["v"] == "bigint"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(event, min_size=2, max_size=14),
    st.lists(st.booleans(), min_size=2, max_size=14),
)
def test_random_late_splits_converge_via_apply_late(
    spark, tmp_path_factory, ops, late_mask
):
    """track_lsn invariant: for ANY split of a log into an applied window
    and a late remainder (arbitrary interleaving of which LSNs are late —
    deletes, re-inserts, duplicate content included), replay(applied) then
    apply_late(late) equals the full-log fold on live rows, and late keys'
    tombstones gate correctly."""
    from pyspark.sql import functions as F

    rows = []
    for i, (op, key, toks) in enumerate(ops, start=1):
        if op == "D":
            rows.append((i, op, key, None, None, None, dt.datetime(2024, 1, 1)))
        else:
            rows.append(
                (i, op, key, toks, len(toks), "web", dt.datetime(2024, 1, 1))
            )
    mask = (late_mask * len(rows))[: len(rows)]
    applied_rows = [r for r, m in zip(rows, mask) if not m]
    late_rows = [r for r, m in zip(rows, mask) if m]
    if not applied_rows or not late_rows:
        return
    log = spark.createDataFrame(rows, CHANGE_SCHEMA)
    root = str(tmp_path_factory.mktemp("latep"))
    table = CDCEngine.create_table(
        root + "/t", num_buckets=4, soft_delete=True, track_lsn=True
    )
    eng = CDCEngine(spark, table, broadcast_threshold_rows=2)
    eng.replay(
        spark.createDataFrame(applied_rows, CHANGE_SCHEMA), num_batches=1
    )
    eng.apply_late(spark.createDataFrame(late_rows, CHANGE_SCHEMA))

    live = table.read(spark).filter(F.col("dl_iud") != "D")
    got = as_tuple_set(
        [r.asDict() for r in live.collect()], PAYLOAD_COLUMNS
    )
    expected = lww_fold([r.asDict() for r in log.collect()])
    assert got == as_tuple_set(list(expected.values()), PAYLOAD_COLUMNS)
    # idempotent: re-delivering the late window commits nothing
    v = table.current().version
    eng.apply_late(spark.createDataFrame(late_rows, CHANGE_SCHEMA))
    assert table.current().version == v


mv_event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(KEYS),
    st.lists(st.integers(0, 5), min_size=0, max_size=3),
    st.sampled_from(["g0", "g1"]),  # group migrations included
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(mv_event, min_size=1, max_size=12), st.integers(1, 3))
def test_matview_random_sequences_equal_groupby(
    spark, tmp_path_factory, ops, n_windows
):
    """Any op interleaving — first-event deletes, delete/re-insert,
    cross-group migrations, no-op updates — synced in any windowing must
    leave the view equal to a direct groupBy of the live rows. The spec
    carries min/max too, so extremum-removal rescans (non-invertible
    aggregates) are exercised under the same random interleavings."""
    from pyspark.sql import functions as F

    from dbimport_spark.plans.matview import (
        AggSpec,
        create_view,
        sync_view,
        verify_view,
    )

    rows = []
    for i, (op, key, toks, grp) in enumerate(ops, start=1):
        if op == "D":
            rows.append((i, op, key, None, None, None, dt.datetime(2024, 1, 1)))
        else:
            rows.append(
                (i, op, key, toks, len(toks), grp, dt.datetime(2024, 1, 1))
            )
    log = spark.createDataFrame(rows, CHANGE_SCHEMA)
    root = str(tmp_path_factory.mktemp("mvprop"))
    table = CDCEngine.create_table(root + "/t", num_buckets=2)
    eng = CDCEngine(spark, table)
    spec = AggSpec(
        group_cols=["source"], sum_cols=["n_tok"],
        min_cols=["n_tok"], max_cols=["n_tok"],
    )
    view = CDCEngine(
        spark, create_view(root + "/v", table, spec, num_buckets=2)
    )
    n = len(rows)
    edges = [(n * k) // n_windows for k in range(n_windows + 1)]
    for lo, hi in zip(edges, edges[1:]):
        if hi <= lo:
            continue
        eng.apply_batch(
            log.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi)), lo, hi
        )
        sync_view(spark, table, view, spec)
        assert verify_view(spark, table, view.table, spec)["converged"]
