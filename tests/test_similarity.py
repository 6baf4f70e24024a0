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


def test_neardup_multi_table_recall(spark):
    """OR-amplification: L independent hash tables must recover
    near-dup pairs a single table misses, at identical precision
    (exact cosine filters candidates either way)."""
    import numpy as np
    from pyspark.sql import functions as F

    from strat_backtest_spark.operators.similarity import embedding_neardup_pairs

    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for i in range(60):
        base = rng.normal(size=64)
        noisy = base + rng.normal(scale=0.02, size=64)  # true near-dup
        rows.append((vid, [float(x) for x in base])); vid += 1
        rows.append((vid, [float(x) for x in noisy])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def recall(n_tables):
        got = {
            (r["id_a"], r["id_b"])
            for r in embedding_neardup_pairs(
                df, threshold=0.95, n_tables=n_tables
            ).collect()
        }
        truth = {(2 * i, 2 * i + 1) for i in range(60)}
        return len(got & truth) / len(truth)

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1
    assert r3 >= 0.7, f"multi-table recall {r3}"


def test_round_half_up_matches_sql_round():
    """np.round is banker's (half-to-even); SQL round in Spark and
    DuckDB is half-away-from-zero. The shared helper must follow SQL."""
    import duckdb
    import numpy as np

    from strat_backtest_spark.functions.numeric import round_half_up

    xs = np.array([0.0000005, 0.0000015, -0.0000005, -0.0000015, 0.1234564, 0.12345649999])
    got = round_half_up(xs, 6)
    exp = [
        duckdb.sql(f"SELECT round(CAST({repr(float(x))} AS DOUBLE), 6)").fetchone()[0] for x in xs
    ]
    assert got.tolist() == exp
    # the case banker's rounding gets wrong:
    assert round_half_up(np.array([2.5]), 0)[0] == 3.0
    assert round_half_up(np.array([-2.5]), 0)[0] == -3.0


def test_cosine_topk_local_topk_pruning_survives_ties(spark):
    """cosine_topk emits only each Arrow batch's LOCAL top-k per query
    before the global rank window. The pruning is lossless because
    (cos_sim desc, neighbor_id asc) is a strict total order (ids are
    unique) — pin that with the adversarial case: EVERY corpus vector
    identical (all ties at the k-th slot), spread across many
    partitions, so any per-batch ordering slip would surface as a
    wrong global winner set."""
    from pyspark.sql import functions as F

    from strat_backtest_spark.operators.similarity import cosine_topk

    vec = [float(i % 7 + 1) for i in range(8)]
    corpus = (
        spark.range(100)
        .select(F.col("id").alias("vec_id"))
        .withColumn("embedding", F.array(*[F.lit(v) for v in vec]))
        .repartition(16)
    )
    queries = corpus.filter(F.col("vec_id") >= 98)  # ids 98, 99
    out = cosine_topk(corpus, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cos_sim))
    assert set(by_q) == {98, 99}
    for qid, rows in by_q.items():
        rows.sort()
        # all sims tie at 1.0 -> winners are the 5 smallest non-self ids
        assert [nid for _, nid, _ in rows] == [0, 1, 2, 3, 4]
        assert all(abs(s - 1.0) < 1e-9 for *_, s in rows)
        assert [rk for rk, *_ in rows] == [1, 2, 3, 4, 5]


def test_ivf_hybrid_prune_matches_naive_distance_order():
    """The IVF assign/probe hybrid (matmul candidate prune + exact
    recompute on a margin) must reproduce the naive broadcast
    formula's rounded (distance, cid) order EXACTLY — including
    duplicate-centroid ties, unsorted cids, and nprobe > K. Pure-numpy
    differential; a margin regression here would silently corrupt the
    q51 gate."""
    import numpy as np

    from strat_backtest_spark.functions.numeric import round_half_up
    from strat_backtest_spark.operators.similarity import (
        _l2_candidates,
        _l2_exact,
    )

    rng = np.random.default_rng(0)
    for trial in range(20):
        N, K, d = 200, int(rng.integers(2, 40)), 16
        V = rng.normal(0, 1, (N, d))
        C = rng.normal(0, 1, (K, d))
        if trial % 3 == 0:
            C[1] = C[0]  # exact tie
        cids = np.arange(K)[::-1].copy()  # unsorted
        D = round_half_up(((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 9)

        # assign
        best = D.min(axis=1, keepdims=True)
        cand = np.where(D == best, cids[None, :], np.iinfo(np.int64).max)
        ref_assign = cand.min(axis=1)
        rows, ks = _l2_candidates(V, C, 1)
        Dex = _l2_exact(V, C, rows, ks)
        order = np.lexsort((cids[ks], Dex, rows))
        first = np.unique(rows[order], return_index=True)[1]
        assert (ref_assign == cids[ks[order[first]]]).all(), trial

        # probes (nprobe may exceed K)
        npr = int(rng.integers(1, K + 2))
        cid_order = np.argsort(cids, kind="stable")
        idx = np.argsort(D[:, cid_order], axis=1, kind="stable")[:, :npr]
        ref_probes = cids[cid_order][idx]
        rows, ks = _l2_candidates(V, C, npr)
        Dex = _l2_exact(V, C, rows, ks)
        order = np.lexsort((cids[ks], Dex, rows))
        rows_o, k_o = rows[order], ks[order]
        counts = np.bincount(rows_o, minlength=N)
        grp_start = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(len(rows_o)) - grp_start[rows_o]
        out_cids = cids[k_o[pos < npr]]
        got = np.split(out_cids, np.cumsum(np.minimum(counts, npr))[:-1])
        for r in range(N):
            assert (ref_probes[r] == got[r]).all(), (trial, r)

def test_ivf_prune_margin_large_magnitude():
    """ADVICE r7 (medium): the matmul expansion's CANCELLATION error
    scales with |v|²+|c|², not with the distance — for un-normalized
    ~1e5-magnitude vectors sitting near a centroid the old
    distance-scaled margin could prune the true nearest list. The
    margin now carries an 8·eps·(|v|²+max|c|²) term; pin it with
    adversarial trials: huge-magnitude clusters with vectors a tiny
    perturbation away from their centroid."""
    import numpy as np

    from strat_backtest_spark.functions.numeric import round_half_up
    from strat_backtest_spark.operators.similarity import _l2_candidates, _l2_exact

    rng = np.random.default_rng(42)
    for trial in range(10):
        K, d = 8, 16
        scale = 10.0 ** rng.integers(4, 7)  # 1e4..1e6 coordinates
        C = rng.normal(0, scale, (K, d))
        # each vector = a centroid + a perturbation ~12 orders smaller
        picks = rng.integers(0, K, 300)
        V = C[picks] + rng.normal(0, scale * 1e-12, (300, d))
        cids = np.arange(K)
        D = round_half_up(((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 9)
        best = D.min(axis=1, keepdims=True)
        cand = np.where(D == best, cids[None, :], np.iinfo(np.int64).max)
        ref_assign = cand.min(axis=1)
        rows, ks = _l2_candidates(V, C, 1)
        Dex = _l2_exact(V, C, rows, ks)
        order = np.lexsort((cids[ks], Dex, rows))
        first = np.unique(rows[order], return_index=True)[1]
        got = cids[ks[order[first]]]
        assert (ref_assign == got).all(), (trial, scale)


def test_bucket_rerank_chunking_invariance(spark):
    """The degenerate-bucket guard (hash-salt chunking of the corpus
    side of the rerank cogroup) must be value-invariant: forcing many
    tiny chunks produces byte-identical top-k to the unchunked plan,
    for both the LSH and IVF paths."""
    import numpy as np
    from pyspark.sql import functions as F

    from strat_backtest_spark.operators.similarity import ann_topk, ivf_topk

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=64)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 4)

    def key(r):
        return (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])

    base = sorted(map(key, ann_topk(df, q, k=5, max_chunk_rows=None).collect()))
    chunked = sorted(map(key, ann_topk(df, q, k=5, max_chunk_rows=20).collect()))
    assert base == chunked and len(base) > 0

    codebook = [(c, [float(x) for x in rng.normal(size=64)]) for c in range(4)]
    base = sorted(map(key, ivf_topk(df, q, codebook, k=5, nprobe=2, max_chunk_rows=None).collect()))
    chunked = sorted(map(key, ivf_topk(df, q, codebook, k=5, nprobe=2, max_chunk_rows=20).collect()))
    assert base == chunked and len(base) > 0


def test_zero_norm_nan_policy_uniform(spark):
    """ADVICE r7: one NaN policy for all three scorers — zero-norm
    vectors (undefined cosine) are DROPPED, never emitted or ranked.
    A zero corpus vector must appear in nobody's neighbor list; a zero
    QUERY vector must yield zero rows for that query."""
    import numpy as np
    from pyspark.sql import functions as F

    from strat_backtest_spark.operators.similarity import ann_topk, cosine_topk, ivf_topk

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    rows.append((99, [0.0] * 8))  # zero-norm corpus vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id").isin(0, 1, 99))  # 99 is a zero-norm QUERY too
    codebook = [(c, [float(x) for x in rng.normal(size=8)]) for c in range(3)]

    for out in (
        cosine_topk(df, q, k=40),
        ann_topk(df, q, k=40, n_planes=2, dim=8, max_chunk_rows=None),
        ivf_topk(df, q, codebook, k=40, nprobe=3, max_chunk_rows=None),
    ):
        got = out.collect()
        assert all(r["neighbor_id"] != 99 for r in got)
        assert all(r["query_id"] != 99 for r in got)
        assert all(not np.isnan(r["cos_sim"]) for r in got)
        assert any(r["query_id"] == 0 for r in got)  # normal queries still served


def test_ann_topk_bucket_cap(spark):
    """max_bucket bounds rerank work per bucket: with a mega-bucket of
    near-identical vectors, the capped run still returns k neighbors
    per query (uniform ε-ball sample), is deterministic, and on a
    corpus with no overfull bucket it equals the uncapped run."""
    import numpy as np

    from strat_backtest_spark.operators.similarity import ann_topk

    rng = np.random.default_rng(5)
    base = rng.normal(size=64)
    # 400 near-identical vectors -> one (or few) mega buckets
    rows = [
        (i, (base + rng.normal(0, 0.001, 64)).astype("float32").tolist())
        for i in range(400)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter("vec_id < 3")

    capped = ann_topk(corpus, queries, k=5, n_planes=6, max_bucket=50)
    got = capped.collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(per_q) == {0, 1, 2}
    assert all(len(v) == 5 for v in per_q.values())
    # deterministic: identical output on a re-run
    again = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_topk(corpus, queries, k=5, n_planes=6, max_bucket=50).collect()
    }
    assert {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got} == again

    # no-overfull-bucket corpus: capped == uncapped exactly
    div_rows = [
        (i, rng.normal(size=64).astype("float32").tolist()) for i in range(300)
    ]
    div = spark.createDataFrame(div_rows, "vec_id long, embedding array<float>")
    dq = div.filter("vec_id < 3")
    a = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ann_topk(div, dq, k=5, n_planes=6, max_bucket=10_000).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ann_topk(div, dq, k=5, n_planes=6).collect()
    )
    assert a == b


def test_ivf_max_list_cap(spark):
    """Per-list cap (VERDICT r9 #6): a cap at/above every probed list
    size is value-identical to the uncapped path; a small cap bounds
    per-list candidates to exactly ``max_list`` deterministic rows
    (same sample every run) while every query still gets k ranked
    neighbors from its probed lists."""
    from pyspark.sql import functions as F

    from strat_backtest_spark.operators.similarity import ivf_topk
    from strat_backtest_spark.plans.catalog import _t

    emb = _t(spark, SF_SMALL, "embeddings")
    codebook = [
        (i, [1.0 if d == i else 0.1 for d in range(64)]) for i in range(4)
    ]
    q = emb.filter(F.col("vec_id") < 3)

    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    base = sorted(
        map(key, ivf_topk(emb, q, codebook, k=5, nprobe=2, max_chunk_rows=None).collect())
    )
    capped_loose = sorted(
        map(
            key,
            ivf_topk(
                emb, q, codebook, k=5, nprobe=2, max_chunk_rows=None, max_list=10**9
            ).collect(),
        )
    )
    assert base == capped_loose, "huge cap must be value-identical to None"

    tight1 = ivf_topk(
        emb, q, codebook, k=5, nprobe=2, max_chunk_rows=None, max_list=20
    ).collect()
    tight2 = ivf_topk(
        emb, q, codebook, k=5, nprobe=2, max_chunk_rows=None, max_list=20
    ).collect()
    assert sorted(map(key, tight1)) == sorted(map(key, tight2)), "cap sample must be deterministic"
    by_q = {}
    for r in tight1:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(by_q) == {0, 1, 2}
    # <= 2 probed lists x 20 sampled rows each -> at most 40 candidates,
    # and k=5 survivors per query
    assert all(len(v) <= 5 for v in by_q.values())
