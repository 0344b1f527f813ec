from pyspark.sql import functions as F

from dbimport_spark.operators.dedup import STRATEGIES, dedup_lww
from dbimport_spark.sources.loggen import generate_changes


def _winners_by_oracle(rows):
    best = {}
    for r in rows:
        k = r["doc_id"]
        if k not in best or r["lsn"] > best[k]["lsn"]:
            best[k] = r
    return {k: v["lsn"] for k, v in best.items()}


def test_strategies_agree_and_match_oracle(spark):
    df = generate_changes(spark, 3000, n_keys=80, seed=11)
    # shuffle input order within the frame: dedup must not depend on order
    df = df.orderBy(F.xxhash64("lsn"))
    expected = _winners_by_oracle(df.collect())
    for strategy in STRATEGIES:
        out = dedup_lww(df, strategy=strategy, n_salts=4).collect()
        got = {r["doc_id"]: r["lsn"] for r in out}
        assert got == expected, strategy
        assert len(out) == len(expected)


def test_salted_hot_key(spark):
    # one key with many events: salted two-phase must still return exactly
    # the max-LSN event
    df = generate_changes(spark, 2000, n_keys=1, seed=5)
    out = dedup_lww(df, strategy="salted", n_salts=8).collect()
    assert len(out) == 1
    assert out[0]["lsn"] == 2000


def test_neardup_clusters_and_survivors(spark):
    """Known graph: chain a-b-c (one component), pair e-f, isolated g not
    in pairs. Min-label propagation must converge to min-id clusters and
    survivors keep exactly one doc per component."""
    from dbimport_spark.operators.text_dedup import dedup_survivors, neardup_clusters

    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("e", "f")], "id_a string, id_b string"
    )
    got = {
        (r["doc_id"], r["cluster_id"]) for r in neardup_clusters(pairs).collect()
    }
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("e", "e"), ("f", "e")}

    docs = spark.createDataFrame(
        [(x, f"text {x}") for x in "abcefg"], "doc_id string, text string"
    )
    surv = {r["doc_id"] for r in dedup_survivors(docs, pairs).collect()}
    assert surv == {"a", "e", "g"}
