from pyspark.sql import functions as F

from dbimport_spark.sources.loggen import generate_changes


def test_deterministic(spark):
    a = generate_changes(spark, 500, n_keys=50, seed=7).collect()
    b = generate_changes(spark, 500, n_keys=50, seed=7).collect()
    assert a == b


def test_seed_changes_content(spark):
    a = generate_changes(spark, 200, n_keys=50, seed=1).collect()
    b = generate_changes(spark, 200, n_keys=50, seed=2).collect()
    assert a != b


def test_shape_and_mix(spark):
    df = generate_changes(spark, 5000, n_keys=200, seed=42)
    rows = df.collect()
    assert len(rows) == 5000
    lsns = [r["lsn"] for r in rows]
    assert sorted(lsns) == list(range(1, 5001))
    ops = {r["op"] for r in rows}
    assert ops == {"I", "U", "D"}
    n_del = sum(1 for r in rows if r["op"] == "D")
    assert 0.05 < n_del / 5000 < 0.15
    for r in rows:
        if r["op"] == "D":
            assert r["tokens"] is None and r["n_tok"] is None and r["source"] is None
        else:
            assert r["n_tok"] == len(r["tokens"])
            assert r["source"] in ("web", "books", "code")


def test_evolution_column(spark):
    df = generate_changes(spark, 300, n_keys=40, seed=3, evolve_at_lsn=150)
    assert "quality_score" in df.columns
    rows = df.collect()
    for r in rows:
        if r["lsn"] <= 150:
            assert r["quality_score"] is None
        elif r["op"] != "D":
            assert r["quality_score"] is not None


def test_hot_key_skew(spark):
    df = generate_changes(
        spark, 20000, n_keys=1000, seed=42, hot_key_fraction=0.01, hot_event_fraction=0.5
    )
    top = (
        df.groupBy("doc_id").count().orderBy(F.desc("count")).limit(10).collect()
    )
    # hot set = 10 keys absorbing ~50% of events
    assert sum(r["count"] for r in top) > 0.4 * 20000


def test_presorted_write_equals_shuffled_write(spark, tmp_path):
    """The no-shuffle write path (generator partitions are contiguous lsn
    ranges) must produce the same log content as the default
    repartitionByRange+sort path, with per-file lsn ranges disjoint and
    ascending within each file (parquet min/max stats stay prunable)."""
    import os

    from dbimport_spark.sources.loggen import write_changes

    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    write_changes(
        generate_changes(spark, 3000, n_keys=100, seed=9), a_path, n_files=4
    )
    write_changes(
        generate_changes(spark, 3000, n_keys=100, seed=9, num_partitions=4),
        b_path,
        presorted=True,
    )
    a = sorted(spark.read.parquet(a_path).collect(), key=lambda r: r["lsn"])
    b = sorted(spark.read.parquet(b_path).collect(), key=lambda r: r["lsn"])
    assert a == b
    ranges = []
    for f in sorted(os.listdir(b_path)):
        if not f.endswith(".parquet"):
            continue
        lsns = [r["lsn"] for r in spark.read.parquet(os.path.join(b_path, f)).collect()]
        assert lsns == sorted(lsns)  # ascending within the file
        ranges.append((min(lsns), max(lsns)))
    ranges.sort()
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint ranges across files
