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
