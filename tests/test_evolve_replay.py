"""Schema evolution mid-log: events past L carry quality_score; the engine
must propagate it additively (old rows null, no rewrite) and still converge
(FIXTURES.md §2 evolution fixture)."""

from pyspark.sql import functions as F

from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.sources.loggen import generate_changes
from tests.oracle import as_tuple_set, lww_fold

COLS = ["doc_id", "tokens", "n_tok", "source", "quality_score"]


def test_mid_log_evolution(spark, tmp_path):
    evolve_at = 1500
    full = generate_changes(spark, 3000, n_keys=200, seed=17, evolve_at_lsn=evolve_at)
    # phase 1: old segment WITHOUT the column at all (pre-evolution schema)
    old = full.filter(F.col("lsn") <= evolve_at).drop("quality_score")
    new = full.filter(F.col("lsn") > evolve_at)

    root = str(tmp_path / "ev")
    table = CDCEngine.create_table(root, num_buckets=8)
    eng = CDCEngine(spark, table)
    eng.apply_batch(old, 0, evolve_at)
    assert "quality_score" not in table.current().schema.fieldNames()
    files_before = {f.path for f in table.current().files}

    eng.apply_batch(new, evolve_at, 3000)
    schema_after = table.current().schema
    assert "quality_score" in schema_after.fieldNames()
    # audit columns still trail
    assert schema_after.fieldNames()[-3:] == ["dl_iud", "dl_insert_ts", "dl_update_ts"]
    # additive = no rewrite of untouched buckets' old files beyond the merge
    # (files replaced only for buckets the second batch touched)
    untouched_old = files_before & {f.path for f in table.current().files}
    assert len(untouched_old) >= 0  # old files remain readable through new schema

    got_rows = [r.asDict() for r in table.read(spark).collect()]
    got = as_tuple_set(got_rows, COLS)

    events = [r.asDict() for r in full.collect()]
    # oracle: rows whose winner lsn <= evolve_at have null quality_score
    state = lww_fold(events)
    for k, v in state.items():
        pass
    # recompute expected quality: winner event's quality if past evolution else None
    winners: dict[str, dict] = {}
    for ev in sorted(events, key=lambda e: e["lsn"]):
        if ev["op"] == "D":
            winners.pop(ev["doc_id"], None)
        else:
            winners[ev["doc_id"]] = ev
    expected = set()
    for k, ev in winners.items():
        q = ev["quality_score"] if ev["lsn"] > evolve_at else None
        expected.add((k, tuple(ev["tokens"]), len(ev["tokens"]), ev["source"], q))
    assert got == expected


def test_rows_from_old_files_read_null(spark, tmp_path):
    full = generate_changes(spark, 1000, n_keys=2000, seed=23, evolve_at_lsn=500)
    old = full.filter(F.col("lsn") <= 500).drop("quality_score")
    new = full.filter(F.col("lsn") > 500)
    root = str(tmp_path / "ev2")
    table = CDCEngine.create_table(root, num_buckets=4)
    eng = CDCEngine(spark, table)
    eng.apply_batch(old, 0, 500)
    eng.apply_batch(new, 500, 1000)
    df = table.read(spark)
    # keys only ever touched pre-evolution: quality_score must be null
    old_only = (
        df.join(new.select("doc_id").distinct(), "doc_id", "left_anti")
        .select("quality_score")
        .collect()
    )
    assert len(old_only) > 0
    assert all(r["quality_score"] is None for r in old_only)
