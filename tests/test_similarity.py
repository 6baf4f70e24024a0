"""IVF ANN: learned-codebook path (rows-only — KMeans is iterative,
so the gate checks the deterministic seed-codebook variant q51)."""

from conftest import SF_SMALL


def test_ivf_with_kmeans_codebook(spark):
    from pyspark.sql import functions as F

    from strat_backtest_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        train_centroids_kmeans,
    )
    from strat_backtest_spark.plans.catalog import _t

    emb = _t(spark, SF_SMALL, "embeddings")
    codebook = train_centroids_kmeans(emb, n_centroids=8, seed=7)
    assert len(codebook) == 8 and len(codebook[0][1]) == 64

    queries = emb.filter(F.col("vec_id") < 5)
    approx = ivf_topk(emb, queries, codebook, k=5, nprobe=3)
    rows = approx.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3, 4}
    assert all(1 <= r["rank"] <= 5 for r in rows)

    # recall@5 vs exact: with 3/8 lists probed this should be high
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, queries, k=5).collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.5, f"recall {recall}"
