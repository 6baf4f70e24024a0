"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Query side is broadcast (queries ≪ corpus); the corpus scan is
  map-only + per-partition top-k heaps (window row_number ≤ k after a
  shuffle only on the small query-id key space).
- ``hyperplane_lsh_buckets`` / ``ann_topk``: the scale path — random-
  hyperplane LSH with deterministic integer weights (engine-portable,
  see functions/hashing.py): sign bits of w·v bucket the corpus; ANN
  search probes only the query's bucket. At 100 TB the bucket column
  becomes the partition key, so a query touches one partition instead
  of the full corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from strat_backtest_spark.functions.numeric import round_half_up


def _dot(a: Column, b: Column) -> Column:
    # HOF fold, deliberately: an unrolled 64-term element_at expression
    # was measured 2.7x SLOWER (the generated method blows past JIT
    # limits and falls back to interpreted expression eval per term,
    # with 64 per-element null checks); the lambda path is one tight
    # interpreted loop over the array
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with per-vector norms precomputed on the join inputs.

    Norms are a property of one vector; computing them inside the pair
    expression re-evaluates an O(dim) aggregate once per PAIR instead
    of once per VECTOR — at n² candidate pairs that is 2/3 of the
    per-pair arithmetic. Value-identical to :func:`cosine` (same
    expression, same vector), so oracles need no change."""
    return _dot(a, b) / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, cos_sim, rank).
    Self-matches excluded. Deterministic rank tiebreak on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnrm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_pre(F.col("qvec"), F.col("cvec"), F.col("qnrm"), F.col("cnrm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# deterministic integer hyperplane weights: w[p][d] in [-8, 8]
def _plane_weight(p: int, d: int) -> int:
    return ((p * 7_919 + d * 104_729 + 12_345) % 17) - 8


def _plane_matrix(n_planes: int, dim: int, plane_offset: int) -> "np.ndarray":
    import numpy as np

    return np.array(
        [
            [_plane_weight(p, d) for d in range(dim)]
            for p in range(plane_offset, plane_offset + n_planes)
        ],
        dtype=np.float64,
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_offset: int = 0,
) -> DataFrame:
    """Bucket id = sign-bit string of ``n_planes`` fixed integer
    hyperplanes (family indices ``plane_offset..plane_offset+n_planes``
    — distinct offsets give independent hash tables). Map-only;
    deterministic across engines.

    Implemented as an Arrow-batched pandas UDF (one ``V @ W.T``
    matmul per batch) rather than an unrolled Catalyst expression: the
    expression form is n_planes x dim ``element_at`` terms (~384 per
    table, >1k with OR-amplification), which blows the generated
    method past JIT limits — measured as multi-MiB task binaries and
    ~10 s of compile-dominated runtime on a 2k-row input. The UDF cuts
    q47 from 11.7 s to well under 1 s at sf0.1 with identical output
    (same weights, double math; sign flips need |w.v| ~ 1e-13)."""
    W_T = _plane_matrix(n_planes, dim, plane_offset).T  # (dim, n_planes)
    pow2 = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("long")
    def _bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        V = np.vstack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(((V @ W_T) > 0.0).astype(np.int64) @ pow2)

    return df.withColumn("bucket", _bucket(F.col(vec_col)))


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the
    query's LSH bucket. Join is on the bucket key — at scale, with the
    corpus written bucket-partitioned, this prunes to one partition
    per query."""
    cb = hyperplane_lsh_buckets(corpus, n_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnrm"),
        "bucket",
    )
    qb = hyperplane_lsh_buckets(queries, n_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnrm"),
        "bucket",
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_pre(F.col("qvec"), F.col("cvec"), F.col("qnrm"), F.col("cnrm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 6,
    dim: int = 64,
    max_bucket: int = 2_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos_sim).

    The scale shape mirrors MinHash-LSH dedup (operators/dedup.py):
    candidate generation is a self-join on the LSH bucket key — never
    all-pairs — and the exact cosine check runs only inside buckets.

    ``n_tables`` is OR-amplification, the same trick as MinHash
    banding: each table hashes with an independent slice of the
    hyperplane family (plane_offset = t·n_planes), a pair is a
    candidate if it collides in ANY table, and pairs are deduped
    across tables. Single-table recall for a pair at angle θ is
    ``(1 - θ/π)^n_planes`` — e.g. ≈0.39 at cos 0.9 with 6 planes;
    L tables lift it to ``1-(1-r)^L`` (≈0.78 at L=3) at L× the
    candidate volume. Tune (n_planes, n_tables) like (rows, bands).

    ``max_bucket`` drops degenerate buckets per table (e.g. the
    all-zeros bucket a constant embedding column would create) before
    pairing — at 100 TB one hot bucket is a quadratic bomb; the cap
    turns it into a documented recall loss instead of a job-killer,
    same policy as ``lsh_candidate_pairs``.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    # All tables' buckets in ONE scan: a union of per-table branches
    # would scan (and, under _t's under-split repartition, shuffle)
    # the corpus once per table. One matmul against the stacked
    # hyperplane family computes every table's sign bits per batch;
    # posexplode fans out to (table, bucket) rows. Column t*n_planes+p
    # of ``V @ W_all.T`` is identical to the per-table matmul's
    # column p — same weights, same double math.
    W_all_T = _plane_matrix(n_tables * n_planes, dim, 0).T  # (dim, T*P)
    pow2 = (1 << np.arange(n_planes)).astype(np.int64)
    nt, npl = n_tables, n_planes

    @F.pandas_udf("array<long>")
    def _buckets_all(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.vstack(vecs.to_numpy()).astype(np.float64)
        bits = ((V @ W_all_T) > 0.0).astype(np.int64).reshape(len(V), nt, npl)
        return pd.Series(list(bits @ pow2))

    b = base.select(
        "id", "vec", F.posexplode(_buckets_all(F.col("vec"))).alias("table", "bucket")
    )

    id_type = base.schema["id"].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cos_sim double"
    thr = float(threshold)
    cap = int(max_bucket)

    # Within-bucket scoring is ONE numpy matmul per group instead of a
    # bucket self-join + per-pair O(dim) fold: the group IS the
    # candidate set, so applyInPandas turns the quadratic term into
    # BLAS. The hot-bucket cap is a group-size check here — semantics
    # identical to the former broadcast size-filter join (and to the
    # oracle's QUALIFY count(*) <= cap), one fewer scan + shuffle.
    def _bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        n = len(ids)
        if n < 2 or n > cap:
            return pd.DataFrame(
                {"id_a": ids[:0], "id_b": ids[:0], "cos_sim": np.empty(0)}
            )
        order = np.argsort(ids)
        ids = ids[order]
        V = np.vstack(pdf["vec"].to_numpy()[order]).astype(np.float64)
        nrm = np.sqrt((V * V).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = round_half_up((V @ V.T) / np.outer(nrm, nrm), 6)
        iu, ju = np.triu_indices(n, k=1)
        keep = sim[iu, ju] >= thr
        iu, ju = iu[keep], ju[keep]
        return pd.DataFrame(
            {"id_a": ids[iu], "id_b": ids[ju], "cos_sim": sim[iu, ju]}
        )

    pairs = b.groupBy("table", "bucket").applyInPandas(_bucket_pairs, out_schema)
    if n_tables > 1:
        # a pair can collide in several tables — keep it once
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return pairs


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partition-pruning scale path
# ---------------------------------------------------------------------------

def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (L2², deterministic
    tiebreak on centroid id) — the IVF coarse quantizer as a map-only
    projection. ``centroids`` is a small driver-side list (the IVF
    codebook is KB-scale even for thousands of lists), baked into the
    plan as literals: no join, no shuffle, broadcast-free.

    At 100 TB the corpus is written ``partitionBy(centroid_id)``; a
    query then scans only its ``nprobe`` partitions — partition
    pruning does the index lookup.

    Vectorized as a pandas UDF for the same reason as
    ``hyperplane_lsh_buckets``: K centroids x dim unrolled literal
    terms is a codegen bomb; one ``(V - C)**2`` broadcast per Arrow
    batch is not. Distances round to 9 dp before comparison (both
    engines agree there) and ties break on the smaller centroid id."""
    cids = np.array([int(c) for c, _ in centroids], dtype=np.int64)
    C = np.array([v for _, v in centroids], dtype=np.float64)  # (K, dim)

    @F.pandas_udf("long")
    def _assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        V = np.vstack(vecs.to_numpy()).astype(np.float64)  # (N, dim)
        D = round_half_up(((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 9)
        best = D.min(axis=1, keepdims=True)
        # among equal-distance centroids, the smallest cid wins
        cand = np.where(D == best, cids[None, :], np.iinfo(np.int64).max)
        return pd.Series(cand.min(axis=1))

    return df.withColumn(out_col, _assign(F.col(vec_col)))


def ivf_probes(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    nprobe: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """One row per (vector, probed centroid): the query's ``nprobe``
    nearest codebook entries, nearest first. Vectorized pandas UDF
    (see ``ivf_assign``); (distance rounded to 9 dp, cid) lexicographic
    order matches the former struct array_sort."""
    cids = np.array([int(c) for c, _ in centroids], dtype=np.int64)
    C = np.array([v for _, v in centroids], dtype=np.float64)
    npr = int(nprobe)

    @F.pandas_udf("array<long>")
    def _probes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.vstack(vecs.to_numpy()).astype(np.float64)
        D = round_half_up(((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 9)
        # sort centroids per row by (distance, cid); cids may be unsorted
        cid_order = np.argsort(cids, kind="stable")
        Ds = D[:, cid_order]
        idx = np.argsort(Ds, axis=1, kind="stable")[:, :npr]
        out = cids[cid_order][idx]  # (N, nprobe), nearest first
        return pd.Series(list(out))

    return df.withColumn("probe", F.explode(_probes(F.col(vec_col))))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: coarse-quantize the corpus into inverted lists,
    probe the query's ``nprobe`` nearest lists, exact cosine rerank
    inside them. Same output contract as ``ann_topk``; recall is
    governed by (n_centroids, nprobe) instead of hyperplane count.

    The codebook here is caller-supplied; ``train_centroids_kmeans``
    learns one (better recall), while any deterministic seed set (e.g.
    the first K corpus vectors) keeps the whole structure reproducible
    across engines — the plan shape is identical either way."""
    cb = ivf_assign(corpus, centroids, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnrm"),
        F.col("centroid_id").alias("probe"),
    )
    qb = ivf_probes(queries, centroids, nprobe, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnrm"),
        "probe",
    )
    scored = (
        cb.join(F.broadcast(qb), "probe")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_pre(F.col("qvec"), F.col("cvec"), F.col("qnrm"), F.col("cnrm")),
                6,
            ).alias("cos_sim"),
        )
        # a (query, neighbor) pair can appear once per shared probe list
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def train_centroids_kmeans(
    corpus: DataFrame,
    n_centroids: int = 16,
    seed: int = 7,
    sample_fraction: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Learn an IVF codebook with MLlib KMeans (fixed seed), optionally
    on a sample — at 100 TB you train on ~1M sampled vectors, never the
    full corpus. Returns the same (cid, vector) list ``ivf_topk``
    consumes; swap in for seed centroids when recall matters more than
    cross-engine reproducibility."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    df = corpus if sample_fraction is None else corpus.sample(sample_fraction, seed=seed)
    feats = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(feats)
    return [(i, list(map(float, c))) for i, c in enumerate(model.clusterCenters())]
