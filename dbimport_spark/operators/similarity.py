"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k / threshold scan: exact baseline. Dot product and
  norms via ``zip_with`` + ``aggregate`` — JVM-side fold, double precision,
  deterministic summation order (array order), no Python.
- LSH-bucketed ANN: deterministic random-hyperplane signatures (signs of
  dot products with hash-derived pseudo-random planes) — candidates share a
  signature prefix bucket; exact cosine re-rank inside buckets. The scale
  path: the self-join is per-bucket instead of all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def cosine_to_query(
    df: DataFrame, query: list[float], vec_col: str = "embedding"
) -> DataFrame:
    qlit = F.array(*[F.lit(float(x)).cast("double") for x in query])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sim = _dot(v, qlit) / (_norm(v) * _norm(qlit))
    return df.withColumn("cosine_sim", sim)


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: global sort of (sim, id) — Spark's takeOrdered
    path (partial top-k per partition, merge on driver via limit)."""
    scored = cosine_to_query(df, query, vec_col)
    return (
        scored.select(id_col, "cosine_sim")
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def rhp_signature(vec_col: str, n_planes: int = 16, dim: int = 64, seed: int = 42) -> Column:
    """Random-hyperplane LSH signature (bit i = sign of dot(v, plane_i)).

    Planes are hash-derived (xxhash64(seed, plane, coord) → centered
    uniform), so executors regenerate them identically — nothing shipped.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    big = 1_000_003
    for p in range(n_planes):
        plane = F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.lit(seed), F.lit(p), F.lit(i)), F.lit(big))
                    / F.lit(float(big))
                    - F.lit(0.5)
                )
                for i in range(dim)
            ]
        )
        bit = (_dot(v, plane) > 0).cast("long")
        sig = sig + F.shiftleft(bit, p)
    return sig


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: KMeans coarse quantizer (pyspark.ml), exact
    cosine re-rank inside the n_probe clusters nearest the query.

    The inverted-file structure is the classic ANN scale path: at 10^9
    vectors the per-query scan drops from N to ~N*(n_probe/n_clusters),
    and cluster id becomes the partition key for routing. Deterministic
    via fixed seed + fixed maxIter.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn(
        "_feat", array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double")))
    )
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=5, featuresCol="_feat", predictionCol="_cluster"
    ).fit(feats)
    assigned = model.transform(feats)

    import numpy as np

    q = np.asarray(query, dtype=np.float64)
    centers = model.clusterCenters()
    dists = [float(np.linalg.norm(np.asarray(c) - q)) for c in centers]
    probe = sorted(range(len(dists)), key=lambda i: dists[i])[:n_probe]

    bucket = assigned.filter(F.col("_cluster").isin(probe)).drop("_feat", "_cluster")
    scored = cosine_to_query(bucket, list(map(float, query)), vec_col)
    return (
        scored.select(id_col, "cosine_sim")
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    min_milli: int = 990,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lsh_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold).

    Exact mode (lsh_planes=None): all-pairs self-join — the correctness
    baseline, O(n²) scoring entirely JVM-side.
    Scale mode (lsh_planes=k): candidates restricted to pairs sharing an
    RHP signature bucket (hash-partition join on the signature instead of
    a cross join), then exact cosine re-rank — the standard LSH recall/
    cost dial.
    Output sim as integral permille for engine-stable comparison.
    """
    v = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).withColumn("_n", _norm(F.col("_v")))
    if lsh_planes:
        sig = rhp_signature("_v", lsh_planes, dim, seed)
        v = v.withColumn("_sig", sig)
    a = v.alias("a")
    b = v.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if lsh_planes:
        joined = a.join(b, on=(F.col("a._sig") == F.col("b._sig")) & cond)
    else:
        joined = a.join(b, on=cond)
    sim = _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n"))
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.floor(sim * F.lit(1000)).alias("sim_milli"),
        )
        .filter(F.col("sim_milli") >= min_milli)
    )


def ann_lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only vectors whose RHP signature matches the
    query's signature within the same bucket are scored exactly.

    At scale this turns a full scan per query into one bucket probe
    (signature equality is a hash-partition lookup); batched queries become
    a bucket-key join instead of a cross join.
    """
    dim = len(query)
    sigs = df.withColumn("_sig", rhp_signature(vec_col, n_planes, dim, seed))
    qdf_sig_row = (
        sigs.sparkSession.createDataFrame([(query,)], f"q: array<double>")
        .withColumn("_sig", rhp_signature("q", n_planes, dim, seed))
        .first()
    )
    bucket = sigs.filter(F.col("_sig") == qdf_sig_row["_sig"])
    scored = cosine_to_query(bucket, query, vec_col)
    return (
        scored.select(id_col, "cosine_sim")
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )
