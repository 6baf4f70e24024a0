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

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
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
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
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


def hyperplane_lsh_buckets(
    df: DataFrame,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket id = sign-bit string of ``n_planes`` fixed integer
    hyperplanes. Map-only; deterministic across engines."""
    vec = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = None
        for d in range(dim):
            wgt = _plane_weight(p, d)
            if wgt == 0:
                continue
            term = F.element_at(vec, d + 1).cast("double") * F.lit(float(wgt))
            dot = term if dot is None else dot + term
        bucket = bucket + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("bucket", bucket)


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
        "bucket",
    )
    qb = hyperplane_lsh_buckets(queries, n_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
