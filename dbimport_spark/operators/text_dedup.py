"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), n-gram Jaccard (inverted shingle index), MinHash+LSH
(shingle → minhash sketch → band bucket join → verified Jaccard), and
SimHash (Arrow/pandas-UDF bit voting + banded Hamming candidates).

Scale notes: everything is shuffle-by-key over shingles/bands — the
standard distributed formulations. The only Python in the data path is the
SimHash bit-vote, which is a vectorized Arrow pandas_udf (numpy bit ops),
never per-row Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _one_per_doc(
    df: DataFrame, id_col: str, num_partitions: int | None = None
) -> DataFrame:
    """One row per doc id, explicitly distributed, deterministic survivor.

    Does two jobs: (a) correctness — a duplicated doc_id row would double
    every (id, shingle) pair downstream and poison the Jaccard
    denominators (up to division by zero for identical dups); (b)
    parallelism — the explicit repartition spreads the CPU-heavy
    shingling/hashing across the cluster even when the input is a handful
    of parquet files. The repartition must be EXPLICIT (doc rows are tiny
    relative to their exploded shingles, so AQE would otherwise coalesce
    the exchange to one partition and re-serialize the expensive map work)
    and comes FIRST: the groupBy then reuses its hash distribution, so the
    whole thing is ONE shuffle, not two.

    ``num_partitions`` defaults to defaultParallelism — right for local /
    small corpora; on a real cluster the right width is data-sized, not
    core-count-sized, so callers thread it through.

    When the id-uniqueness contract IS violated (two rows, same id,
    different text), the survivor is the row with the max payload struct —
    deterministic, so dedup output and every gate hash built on it is
    stable run-to-run (dropDuplicates keeps an arbitrary row)."""
    from pyspark.sql import types as T

    want = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    others = [c for c in df.columns if c != id_col]
    part = df.repartition(want, F.col(id_col))
    def _has_map(dt) -> bool:
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    has_unorderable = any(_has_map(f.dataType) for f in df.schema.fields)
    if not others:
        return part.dropDuplicates([id_col])
    if has_unorderable:
        # map columns are not orderable → no max-struct; order by a hash of
        # the JSON-canonicalized row instead (max_by over xxhash64): still
        # deterministic run-to-run, so gate hashes stay stable (the old
        # dropDuplicates fallback silently reintroduced the arbitrary
        # survivor this function exists to prevent)
        order_key = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in others])))
        out = part.groupBy(id_col).agg(
            F.max_by(F.struct(*[F.col(c) for c in others]), order_key).alias("_s")
        )
    else:
        out = part.groupBy(id_col).agg(
            F.max(F.struct(*[F.col(c) for c in others])).alias("_s")
        )
    return out.select(id_col, *[F.col(f"_s.{c}").alias(c) for c in others])


# -- exact -------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = False
) -> DataFrame:
    """Keep one doc (min id) per identical text. Hash-groupBy: map-side
    partial agg, one shuffle on the digest."""
    from dbimport_spark.operators.text import normalize_text

    text = F.col(text_col)
    digest = F.md5(normalize_text(text) if normalized else text)
    keep = df.select(F.col(id_col), digest.alias("_d")).groupBy("_d").agg(
        F.min(id_col).alias(id_col)
    )
    return keep.select(id_col)


# -- shingles ----------------------------------------------------------------

def word_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distinct word n-gram shingle hashes per doc: (id, shingle_hash)."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    count = F.size(toks) - F.lit(n - 1)
    # guard: F.sequence(1, 0) yields the DESCENDING [1, 0], so a doc with
    # fewer than n words would index past the token array and abort the job
    shingles = F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.xxhash64(
                F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # array_distinct dedups within the doc and _one_per_doc dedups the doc
    # rows themselves, so the exploded rows are unique (id, shingle) pairs
    # — no post-explode distinct/shuffle needed
    return _one_per_doc(df, id_col, num_partitions).select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def _jaccard_from_common(
    common: DataFrame,
    sizes: DataFrame,
    id_col: str,
    min_permille: int | None = None,
) -> DataFrame:
    """Shared tail of jaccard_pairs and jaccard_for_pairs: join per-doc
    shingle counts onto (id_a, id_b, c) and emit the integral permille
    floor(1000*c/(na+nb-c)) — ONE definition, so the rounding and the
    size-join scaffolding cannot drift between the all-pairs and the
    candidates-only paths (the same SQL oracle grades both)."""
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard_permille",
            F.floor(F.lit(1000) * F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))),
        )
    )
    if min_permille is not None:
        out = out.filter(F.col("jaccard_permille") >= min_permille)
    return out.select("id_a", "id_b", "jaccard_permille")


def jaccard_pairs(
    shingles: DataFrame,
    id_col: str = "doc_id",
    min_permille: int = 500,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs with Jaccard ≥ threshold via an inverted shingle index.

    common(a,b) from the self-join on shingle; sizes joined back;
    jaccard_permille = floor(1000*c/(na+nb-c)) keeps the output integral.

    ``max_doc_freq`` is the scale dial for the self-join's worst case: a
    shingle present in d documents contributes d² candidate rows, so a few
    ultra-common shingles (boilerplate/stopword n-grams) dominate the
    shuffle quadratically. Capping document frequency drops them from the
    INDEX only — sizes still count every shingle, so for pairs whose
    overlap isn't exclusively boilerplate the Jaccard stays exact; pairs
    supported only by dropped shingles can undercount (standard
    common-shingle suppression trade-off, opt-in).
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    if max_doc_freq is not None:
        rare = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("shingle")
        )
        shingles = shingles.join(rare, "shingle", "left_semi")
    a = shingles.alias("a")
    b = shingles.alias("b")
    common = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _jaccard_from_common(common, sizes, id_col, min_permille)


def ngram_jaccard_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_permille: int = 500,
    num_partitions: int | None = None,
) -> DataFrame:
    # three consumers of the shingle set inside jaccard_pairs (sizes +
    # both sides of the inverted-index self-join): materialize once, same
    # rationale as minhash_lsh_dedup
    return jaccard_pairs(
        word_shingles(df, text_col, id_col, n, num_partitions).localCheckpoint(
            eager=False
        ),
        id_col,
        min_permille,
    )


# -- MinHash + LSH -----------------------------------------------------------

def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", num_perm: int = 32
) -> DataFrame:
    """num_perm minhashes per doc: min over shingles of xxhash64(p, shingle).

    One hash-aggregate (map-side combine) — no per-permutation passes.
    """
    aggs = [
        F.min(F.xxhash64(F.lit(p), F.col("shingle"))).alias(f"m{p}")
        for p in range(num_perm)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def _band_keys(bands: int, rows: int) -> Column:
    """THE band-key expression — one definition shared by the self-join and
    the asymmetric (batch-vs-corpus) paths, so precomputed corpus-side
    buckets stay compatible with batch-side ones."""
    return F.array(
        *[
            F.xxhash64(F.lit(b), *[F.col(f"m{b * rows + r}") for r in range(rows)])
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 8, rows: int = 4
) -> DataFrame:
    """Docs sharing any LSH band bucket (band key = hash of its rows)."""
    band_keys = _band_keys(bands, rows)
    buckets = signatures.select(
        F.col(id_col), F.explode(band_keys).alias("band_key")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_for_pairs(
    shingles: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard computed ONLY for the given candidate pairs.

    Cost is |pairs| x shingles-per-doc instead of the full inverted-index
    self-join — the whole point of LSH: verification work scales with the
    candidate set, not with n^2.
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sh_a = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])  # semi-match on b's shingle set
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _jaccard_from_common(common, sizes, id_col)


def _lsh_rows(num_perm: int, bands: int) -> int:
    """Validated rows-per-band. bands > num_perm would give rows=0 — every
    doc then shares every band key and the candidate stage degenerates to
    the full n^2 cross join the LSH exists to avoid (output stays correct
    via the exact verify, so the blowup is SILENT); a non-divisible
    num_perm would silently discard trailing permutations, lowering
    recall below the b/r math callers rely on."""
    if bands <= 0 or num_perm % bands != 0:
        raise ValueError(
            f"num_perm={num_perm} must be a positive multiple of "
            f"bands={bands} (rows per band = num_perm // bands >= 1)"
        )
    return num_perm // bands


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    min_permille: int = 500,
    num_partitions: int | None = None,
) -> DataFrame:
    """Candidate pairs from LSH, verified with exact Jaccard — but only on
    the candidates (see jaccard_for_pairs)."""
    rows = _lsh_rows(num_perm, bands)
    # the shingle set feeds FOUR consumers (the sketch, the pair sizes,
    # and both sides of the candidate-verify join). Catalyst reuses the
    # underlying exchange but re-executes the post-shuffle shingling
    # (regexp + per-shingle hash) once per consumer — measured 4x the
    # shingle CPU and 4.8s vs 2.0s for the sf0.1 corpus at local[32].
    # Materialize once (lazy local checkpoint: computed by the first
    # consumer, read from cache by the rest); linear in corpus size, the
    # same trade matview.py already makes for its delta.
    sh = word_shingles(df, text_col, id_col, n, num_partitions).localCheckpoint(
        eager=False
    )
    sigs = minhash_signatures(sh, id_col, num_perm)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows)
    return jaccard_for_pairs(sh, cands, id_col).filter(
        F.col("jaccard_permille") >= min_permille
    )


def dedup_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "exact",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    min_permille: int = 500,
    normalized: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dedup-on-ingest: return the batch rows that are NOT duplicates of
    any existing corpus document (the asymmetric variant of the self-join
    dedups — what a CDC/ingest pipeline runs per incoming batch).

    - ``method='exact'``: one shuffle on the md5 text digest, left-anti
      join against the corpus digests. At 100 TB the corpus digest set is
      a precomputed column — the batch side is the only new work.
    - ``method='minhash'``: asymmetric LSH. Batch signatures join corpus
      signatures on shared band buckets (cost ∝ batch × collisions, NEVER
      a corpus self-join), candidates verified with exact Jaccard scoped
      to the candidate pairs, verified near-dups anti-joined out. At scale
      the corpus signatures/shingles are precomputed and stored bucketed
      by band key.

    ``batch`` and ``corpus`` ids must be disjoint (true for any id scheme
    where ids are assigned at ingest).
    """
    if method == "exact":
        from dbimport_spark.operators.text import normalize_text

        def digest(df: DataFrame) -> DataFrame:
            text = F.col(text_col)
            d = F.md5(normalize_text(text) if normalized else text)
            return df.select(F.col(id_col), d.alias("_d"))

        dup_ids = (
            digest(batch)
            .join(digest(corpus).select("_d").distinct(), "_d", "left_semi")
            .select(id_col)
        )
        return batch.join(dup_ids, id_col, "left_anti")

    if method == "minhash":
        rows = _lsh_rows(num_perm, bands)
        # each shingle set feeds its sketch plus the verify join (via the
        # union below, whose sizes/a/b sides re-consume it) — materialize
        # once per side, same rationale as minhash_lsh_dedup
        bsh = word_shingles(
            batch, text_col, id_col, n, num_partitions
        ).localCheckpoint(eager=False)
        csh = word_shingles(
            corpus, text_col, id_col, n, num_partitions
        ).localCheckpoint(eager=False)
        bsig = minhash_signatures(bsh, id_col, num_perm)
        csig = minhash_signatures(csh, id_col, num_perm)

        def band_buckets(sigs: DataFrame, out: str) -> DataFrame:
            return sigs.select(
                F.col(id_col).alias(out),
                F.explode(_band_keys(bands, rows)).alias("band_key"),
            )

        cands = (
            band_buckets(bsig, "id_a")
            .join(band_buckets(csig, "id_b"), "band_key")
            .select("id_a", "id_b")
            .distinct()
        )
        # verify with exact Jaccard over the union's shingles (ids disjoint)
        verified = jaccard_for_pairs(
            bsh.unionByName(csh), cands, id_col
        ).filter(F.col("jaccard_permille") >= min_permille)
        return batch.join(
            verified.select(F.col("id_a").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )

    raise ValueError("method must be 'exact' or 'minhash'")


# -- SimHash -----------------------------------------------------------------

@pandas_udf("long")
def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """64-bit SimHash from per-token hashes — vectorized numpy bit voting."""
    import numpy as np

    out = np.zeros(len(hashes), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, hs in enumerate(hashes):
        if hs is None or len(hs) == 0:
            continue
        h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
        bits = (h[:, None] >> shifts) & np.uint64(1)  # (n_tokens, 64)
        votes = bits.sum(axis=0) * 2 >= len(h)
        out[i] = np.int64(
            np.bitwise_or.reduce((votes.astype(np.uint64) << shifts)).astype(np.int64)
        )
    return pd.Series(out)


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, simhash): token hashes computed JVM-side, bit-vote in Arrow."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    token_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return _one_per_doc(df, id_col, num_partitions).select(
        F.col(id_col), _simhash_from_hashes(token_hashes).alias("simhash")
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: banded bit chunks as LSH, then exact
    Hamming via bit_count(xor).

    Chunk count is derived from the radius: with c > max_hamming equal-width
    chunks, any pair within the radius shares at least one chunk verbatim
    (pigeonhole) — candidate generation is COMPLETE, not probabilistic.
    The dial: a larger radius needs more (hence narrower) chunks, whose
    buckets are coarser (2^width values), growing the candidate set — the
    classic recall/cost trade, here exact-recall/cost."""
    if not 0 <= max_hamming < 32:
        # n_chunks must stay <= 64 for width >= 1: past that every chunk
        # value is 0 and candidate generation silently degenerates to the
        # full cross join (the exact Hamming filter keeps output correct,
        # which is precisely why the blowup needs a loud guard)
        raise ValueError(
            f"max_hamming={max_hamming} out of range [0, 32) — a radius "
            "that wide has no non-degenerate 64-bit chunking"
        )
    n_chunks = 2
    while n_chunks <= max_hamming:
        n_chunks *= 2
    width = 64 // n_chunks
    mask = (1 << width) - 1
    # (id, simhash) is tiny but expensive to produce (the Arrow bit-vote
    # UDF) and feeds BOTH sides of the chunk self-join — materialize once
    # so the UDF runs once per doc, not once per join side
    sh = simhash(df, text_col, id_col, num_partitions).localCheckpoint(
        eager=False
    )
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), width * i).bitwiseAND(F.lit(mask))
            for i in range(n_chunks)
        ]
    )
    buckets = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(chunks).alias("chunk_pos", "chunk_val"),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cands = (
        a.join(b, ["chunk_pos", "chunk_val"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_verified_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 7,
    n: int = 3,
    min_permille: int = 500,
    num_partitions: int | None = None,
) -> DataFrame:
    """SimHash as the CANDIDATE generator, exact n-gram Jaccard as the
    verifier: pairs within Hamming ``max_hamming`` get their true Jaccard
    computed (cost ∝ candidates), and only verified near-dups survive.

    This is the production shape — a cheap hash-distance recall stage in
    front of an exact verify stage — and it makes the output value-exact:
    when SimHash recall is 1 at the chosen radius, the result EQUALS the
    full exact Jaccard dedup, so the same SQL oracle grades both (a missed
    candidate surfaces as a gate mismatch, not a silent approximation).
    """
    cands = simhash_near_dups(
        df, text_col, id_col, max_hamming, num_partitions
    ).select("id_a", "id_b")
    # three consumers inside jaccard_for_pairs — materialize once
    sh = word_shingles(df, text_col, id_col, n, num_partitions).localCheckpoint(
        eager=False
    )
    return jaccard_for_pairs(sh, cands, id_col).filter(
        F.col("jaccard_permille") >= min_permille
    )


# -- near-dup clustering (the dedup ACTION: one canonical doc per group) ------

def neardup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over a near-dup pair graph (id_a, id_b) by
    iterative min-label propagation: every member adopts the smallest id
    reachable from it; the smallest id is the canonical survivor.

    Scale shape: each round is one join + one aggregate on the (small)
    pair-graph vertex set — rounds needed = graph diameter, and near-dup
    components are tiny cliques/chains in practice (2-3 rounds). The loop
    is driver-side control flow only; all data stays distributed. This is
    the standard large-scale CC formulation (GraphFrames/Pregel-style)
    without needing a graph library.
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # edges are reused every round — keep them materialized; labels get
    # their lineage TRUNCATED each round (localCheckpoint), otherwise round
    # k re-executes k stacked joins and plan analysis grows superlinearly
    edges = edges.localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("lbl", F.col("v"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.dst == labels.v)
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr, labels.v == nbr.src, "left")
            .select(
                "v",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"neardup_clusters did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — a duplicate chain longer "
            "than max_iter exists; raise max_iter"
        )
    return labels.select(F.col("v").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def dedup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Documents surviving near-dup clustering: non-duplicates plus the
    canonical (min-id) member of each duplicate cluster."""
    clusters = neardup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return df.join(
        losers.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
