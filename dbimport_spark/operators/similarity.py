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


def _cosine(num: Column, den: Column) -> Column:
    """Cosine ratio, NULL-safe under Spark 4's default ANSI mode: a
    zero-norm vector (padding / failed encoder) has no direction, and a
    plain ``/`` would abort the WHOLE job with DIVIDE_BY_ZERO on the
    first such row. try_divide yields NULL there (and for dimension
    mismatches, where zip_with's padding nulls the dot product);
    consumers filter or sort NULLs last."""
    return F.try_divide(num, den)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def cosine_to_query(
    df: DataFrame, query: list[float], vec_col: str = "embedding"
) -> DataFrame:
    qlit = F.array(*[F.lit(float(x)).cast("double") for x in query])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sim = _cosine(_dot(v, qlit), _norm(v) * _norm(qlit))
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
        # zero-norm / dimension-mismatched vectors score NULL — they are
        # not results, and without the filter they'd pad the top-k
        .filter(F.col("cosine_sim").isNotNull())
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


class IVFIndex:
    """Persisted IVF coarse quantizer: fit ONCE, save, load, reuse.

    At scale the quantizer is trained once over a corpus sample, its
    centroids (n_clusters × dim floats — KB-sized) are persisted, and every
    query/batch job loads them; re-fitting KMeans inside each query (the
    round-2 shape) re-scans the corpus per call and yields a different
    partitioning whenever the corpus changed. Cluster assignment here is a
    pure Catalyst expression (argmin over the centroid literal via
    transform + array_min) — queries need no pyspark.ml at all, and the
    corpus can be written bucketed by cluster id so the batch join is
    co-located.
    """

    def __init__(self, centers: list[list[float]], seed: int = 42):
        self.centers = [list(map(float, c)) for c in centers]
        self.seed = seed

    # -- lifecycle -----------------------------------------------------------

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        n_clusters: int = 16,
        vec_col: str = "embedding",
        seed: int = 42,
        max_iter: int = 5,
    ) -> "IVFIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = df.withColumn(
            "_feat",
            array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))),
        )
        model = KMeans(
            k=n_clusters, seed=seed, maxIter=max_iter,
            featuresCol="_feat", predictionCol="_cluster",
        ).fit(feats)
        return cls([list(c) for c in model.clusterCenters()], seed=seed)

    def save(self, path: str) -> None:
        import json
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"seed": self.seed, "centers": self.centers}, fh)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        import json

        with open(path) as fh:
            d = json.load(fh)
        return cls(d["centers"], seed=d.get("seed", 42))

    # -- query-side ----------------------------------------------------------

    def _centers_lit(self) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(ci).alias("cid"),
                    F.array(*[F.lit(x).cast("double") for x in c]).alias("cv"),
                )
                for ci, c in enumerate(self.centers)
            ]
        )

    def assign_expr(self, vec_col: str = "embedding") -> Column:
        """Nearest-centroid id as a pure expression (no ml, no shuffle)."""
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        dists = F.transform(
            self._centers_lit(),
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(v, c["cv"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x,
                ).alias("d2"),
                c["cid"].alias("cid"),
            ),
        )
        return F.array_min(dists)["cid"]

    def nearest(self, query: list[float], n_probe: int) -> list[int]:
        """Driver-side probe list: the n_probe centroids closest to one
        query (centroid table is KB-sized — never a Spark job)."""
        import numpy as np

        q = np.asarray(query, dtype=np.float64)
        dists = [float(np.linalg.norm(np.asarray(c) - q)) for c in self.centers]
        return sorted(range(len(dists)), key=lambda i: (dists[i], i))[:n_probe]


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    index: IVFIndex | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse quantizer + exact cosine re-rank inside
    the n_probe clusters nearest the query.

    The inverted-file structure is the classic ANN scale path: at 10^9
    vectors the per-query scan drops from N to ~N*(n_probe/n_clusters),
    and cluster id becomes the partition key for routing. Pass a
    pre-fitted ``index`` (IVFIndex.fit → save → load) to skip the KMeans
    job entirely — the query is then pure expressions; omitting it fits
    on the fly (deterministic via fixed seed + fixed maxIter).
    """
    if index is None:
        index = IVFIndex.fit(df, n_clusters, vec_col, seed)
    probe = index.nearest([float(x) for x in query], n_probe)
    bucket = df.filter(index.assign_expr(vec_col).isin(probe))
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
    blocks: int | None = None,
    lsh_bands: int | None = None,
    lsh_rows: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold).

    Three plans, picked by the similarity regime:

    - **Exact all-pairs** (default): self-join on an inequality —
      BroadcastNestedLoopJoin by construction. Correctness baseline,
      small-n only.
    - **Blocked exact** (``blocks=B``): the scale path for LOW thresholds,
      where no LSH family can prune (a 0.45-cosine pair is nearly random —
      any sketch with recall ~1 admits ~every pair). The O(n²) work is
      unavoidable for exact output, so distribute it evenly instead: ids
      hash into B blocks, the B(B+1)/2 block-grid is a tiny broadcast
      join, and the candidate join runs as a hash join keyed by block —
      per-task memory is one block of vectors (n/B), parallelism is the
      grid, and there is no nested-loop node anywhere.
    - **Banded RHP-LSH** (``lsh_bands=b``, ``lsh_rows=r``): the scale path
      for HIGH thresholds (true near-dups, cosine ≳0.9) where hashing
      genuinely prunes: shared (band, r-bit key) ⇒ candidate, exact cosine
      re-rank on candidates only. Recall per pair with angular agreement
      p = 1-θ/π is 1-(1-p^r)^b; r must be large enough (≥8 bits) that
      random pairs rarely collide — tiny r degenerates into all-pairs
      with extra steps.

    Output sim as integral permille for engine-stable comparison.
    """
    v = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).withColumn("_n", _norm(F.col("_v")))

    def rerank(cand: DataFrame) -> DataFrame:
        sim = _cosine(_dot(F.col("_va"), F.col("_vb")), F.col("_na") * F.col("_nb"))
        return cand.select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.floor(sim * F.lit(1000)).alias("sim_milli"),
        ).filter(F.col("sim_milli") >= min_milli)

    if blocks:
        spark = df.sparkSession
        blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).cast("int")
        vb = v.withColumn("_blk", blk)
        grid = spark.createDataFrame(
            [(i, j) for i in range(blocks) for j in range(i, blocks)], "i int, j int"
        )
        left = vb.select(
            F.col(id_col).alias("_la"),
            F.col("_v").alias("_va"),
            F.col("_n").alias("_na"),
            F.col("_blk").alias("i"),
        ).join(F.broadcast(grid), "i")
        right = vb.select(
            F.col(id_col).alias("_lb"),
            F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"),
            F.col("_blk").alias("j"),
        )
        cand = (
            left.join(right, "j")
            # cross-block (i<j): every unordered pair appears exactly once;
            # same-block: keep one orientation
            .filter((F.col("i") < F.col("j")) | (F.col("_la") < F.col("_lb")))
            .select(
                F.least("_la", "_lb").alias("_ida"),
                F.greatest("_la", "_lb").alias("_idb"),
                "_va",
                "_na",
                "_vb",
                "_nb",
            )
        )
        return rerank(cand)

    if lsh_bands:
        bands = v.select(
            F.col(id_col),
            F.posexplode(
                F.array(
                    *[
                        rhp_signature("_v", lsh_rows, dim, seed + band * 7919)
                        for band in range(lsh_bands)
                    ]
                )
            ).alias("band", "band_key"),
        )
        pa, pb = bands.alias("pa"), bands.alias("pb")
        cands = (
            pa.join(pb, ["band", "band_key"])
            .filter(F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}"))
            .select(
                F.col(f"pa.{id_col}").alias("_ida"), F.col(f"pb.{id_col}").alias("_idb")
            )
            .distinct()
        )
        a = v.select(F.col(id_col).alias("_ida"), F.col("_v").alias("_va"),
                     F.col("_n").alias("_na"))
        b = v.select(F.col(id_col).alias("_idb"), F.col("_v").alias("_vb"),
                     F.col("_n").alias("_nb"))
        return rerank(cands.join(a, "_ida").join(b, "_idb"))

    a, b = v.alias("a"), v.alias("b")
    joined = a.join(b, on=F.col(f"a.{id_col}") < F.col(f"b.{id_col}")).select(
        F.col(f"a.{id_col}").alias("_ida"),
        F.col(f"b.{id_col}").alias("_idb"),
        F.col("a._v").alias("_va"),
        F.col("a._n").alias("_na"),
        F.col("b._v").alias("_vb"),
        F.col("b._n").alias("_nb"),
    )
    return rerank(joined)


def ann_lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    probe_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via multi-probe RHP-LSH: vectors whose signature is
    within ``probe_hamming`` bits of the query's are scored exactly.

    probe_hamming is the standard multi-probe recall/cost dial (0 = single
    bucket). Candidate selection is a bit_count(xor) predicate over the
    signature column — at scale the signatures live bucket-partitioned, so
    a probe touches C(n_planes, ≤probe_hamming) buckets instead of the
    corpus; non-candidates skip the d-dim dot product entirely.
    """
    dim = len(query)
    sigs = df.withColumn("_sig", rhp_signature(vec_col, n_planes, dim, seed))
    qsig = (
        sigs.sparkSession.createDataFrame(
            # float() like ivf_topk: a pinned array<double> schema
            # refuses Python ints instead of coercing them
            [([float(x) for x in query],)], "q: array<double>"
        )
        .withColumn("_sig", rhp_signature("q", n_planes, dim, seed))
        .first()["_sig"]
    )
    bucket = sigs.filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    scored = cosine_to_query(bucket, query, vec_col)
    return (
        scored.select(id_col, "cosine_sim")
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def assert_topk_matches_exact(ann: DataFrame, exact: DataFrame, id_col: str = "vec_id"):
    """Recall gate: raise unless the ANN top-k equals the exact top-k (same
    ids, same order). Used by the correctness entries so an ANN recall
    regression surfaces as a hard failure instead of a silent approximation;
    the production dial is the probe width, not this assertion."""
    a = [r[id_col] for r in ann.collect()]
    e = [r[id_col] for r in exact.collect()]
    if a != e:
        raise AssertionError(
            f"ANN top-k diverged from exact: ann={a} exact={e} — widen the "
            "probe (n_probe / probe_hamming) or add planes/clusters"
        )
    return ann


def ann_batch_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 42,
    index: IVFIndex | None = None,
) -> DataFrame:
    """Batched ANN: a query TABLE joined against the corpus on IVF cluster
    id — the reference-scale shape (per-query probing would be a driver
    loop; this is one shuffle-free broadcast join + windowed re-rank).

    Plan: IVF coarse quantizer over the corpus (pass a pre-fitted persisted
    ``index`` to skip the KMeans job — the production shape); every query
    fans out to its n_probe nearest centroids (tiny centroid table
    broadcast both ways); queries×corpus matched on cluster id (hash join —
    at 10^9 vectors the corpus would be stored bucketed by cluster id,
    making this join co-located); exact cosine re-rank per query via
    window top-k.
    """
    from pyspark.sql import Window as W

    if index is None:
        index = IVFIndex.fit(df, n_clusters, vec_col, seed)
    corpus = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_cv"),
        index.assign_expr(vec_col).alias("_cluster"),
    )
    centers_lit = index._centers_lit()
    qv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qx = queries.select(
        F.col(query_id_col), qv.alias("_qv"), F.explode(centers_lit).alias("c")
    ).select(
        query_id_col,
        "_qv",
        F.col("c.cid").alias("_cluster"),
        F.aggregate(
            F.zip_with(F.col("_qv"), F.col("c.cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_d2"),
    )
    wq = W.partitionBy(query_id_col).orderBy(F.col("_d2"), F.col("_cluster"))
    probes = qx.withColumn("_cr", F.row_number().over(wq)).filter(
        F.col("_cr") <= n_probe
    ).select(query_id_col, "_qv", "_cluster")

    cand = probes.join(corpus, "_cluster")
    cv = F.transform(F.col("_cv"), lambda x: x.cast("double"))
    sim = _cosine(_dot(F.col("_qv"), cv), _norm(F.col("_qv")) * _norm(cv))
    scored = cand.select(query_id_col, F.col(id_col), sim.alias("cosine_sim"))
    wk = W.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("_rk", F.row_number().over(wk))
        .filter(F.col("_rk") <= k)
        .select(query_id_col, id_col, "cosine_sim", F.col("_rk").alias("rank"))
    )
