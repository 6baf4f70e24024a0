"""q99 at scale: persisted-IVF index APPEND cost must track the delta,
not the index. 10M vectors (similarity_10m_rung's planted-clone corpus
builder), 1024 KMeans lists: build the 8M-vector index once, then
append a 2M delta and a 200k delta; compare against the full-rebuild
wall. Also: drift ratio before/after the same-distribution append
(should stay ~1 — no re-train signal from in-distribution data), and
the appended layout must answer probe-pruned queries with the exact
result set of a one-shot 10M rebuild. Corpus + layouts deleted after.

    python probes/ivf_append_rung.py [REPLICAS]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/probes")

from strat_backtest_spark.session import get_spark  # noqa: E402
from similarity_10m_rung import build_corpus  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    out = {"replicas": replicas, "vectors": 2000 * replicas}
    corpus_dir = f"/tmp/vecs_append_rung_{replicas}x"
    out["corpus_build_s"] = round(build_corpus(spark, replicas, corpus_dir), 1)

    from strat_backtest_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_drift,
        ivf_index_write,
        ivf_probes,
        ivf_topk,
        train_centroids_kmeans,
    )

    emb = spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
    t = time.time()
    cents = train_centroids_kmeans(emb, n_centroids=1024, sample_fraction=0.01)
    out["kmeans_train_s"] = round(time.time() - t, 1)

    base = emb.filter(F.col("vec_id") % 5 != 0)      # 8M "yesterday"
    # deltas arrive as their OWN tables in production — materialize
    # them first so append timings measure the append, not a filter
    # scan over the 10M parent corpus (first run: the 200k append
    # "cost" 12.7 s, most of it that scan)
    for name, cond in [("delta_big", F.col("vec_id") % 5 == 0),
                       ("delta_small", F.col("vec_id") % 50 == 0)]:
        emb.filter(cond).repartition(32).write.mode("overwrite").parquet(
            f"{corpus_dir}/{name}.parquet"
        )
    delta_big = spark.read.parquet(f"{corpus_dir}/delta_big.parquet")      # 2M
    delta_small = spark.read.parquet(f"{corpus_dir}/delta_small.parquet") # 200k

    p_full = f"{corpus_dir}/ivf_full"
    p_inc = f"{corpus_dir}/ivf_inc"

    def timed(key, fn):
        t = time.time()
        fn()
        out[key] = round(time.time() - t, 1)
        print(json.dumps({key: out[key]}), file=sys.stderr, flush=True)

    # drift baselines are SAMPLED (the 100 TB contract)
    timed("rebuild_full_10m_s", lambda: ivf_index_write(
        emb, cents, p_full, drift_sample=0.01))
    timed("index_build_8m_s", lambda: ivf_index_write(
        base, cents, p_inc, drift_sample=0.01))
    out["drift_before"] = round(
        ivf_index_drift(spark, p_inc, sample_fraction=0.01)["ratio"], 4
    )
    timed("append_2m_s", lambda: ivf_index_append(delta_big, p_inc))
    out["drift_after_2m"] = round(
        ivf_index_drift(spark, p_inc, sample_fraction=0.01)["ratio"], 4
    )
    timed("append_200k_s", lambda: ivf_index_append(delta_small, p_inc))

    # probe-pruned query equivalence: appended layout vs full rebuild
    # (restrict to the 10M rows both layouts share: the 200k second
    # append re-added vec_id%50 rows, so dedupe by reading distinct)
    queries = emb.filter(F.col("vec_id") < 100)
    probe_ids = sorted(
        r["probe"]
        for r in ivf_probes(queries, cents, 8).select("probe").distinct().collect()
    )

    def topk(path, dedupe):
        corpus = spark.read.parquet(f"{path}/vectors").filter(
            F.col("centroid_id").isin(probe_ids)
        )
        if dedupe:
            corpus = corpus.dropDuplicates(["vec_id"])
        t = time.time()
        res = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                corpus, queries, cents, k=10, nprobe=8, pre_assigned=True
            ).collect()
        }
        return res, round(time.time() - t, 1)

    full_set, out["query_full_s"] = topk(p_full, False)
    inc_set, out["query_inc_s"] = topk(p_inc, True)
    out["query_sets_equal"] = full_set == inc_set
    assert out["query_sets_equal"], "append-then-query diverged from rebuild"

    print(json.dumps(out))
    shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
