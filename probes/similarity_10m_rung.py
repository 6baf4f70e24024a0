"""Similarity decade 7: 10M vectors (10x the round-7 1M rung).

Corpus: sf0.1 embeddings (2,000 base x 64-dim) replicated REPLICAS
times with per-replica gaussian jitter (sigma=0.05, per-batch seeded) —
the same construction as the 1M rung, 64-file layout (probe-layout
row). Deleted after the run.

Plane/bucket scaling rule (the 1M rung's finding, applied): bucket
count must scale with the corpus so the mean bucket stays under the
rerank cap — 6 planes = 64 buckets collapses recall at 1M; 12 planes
(4,096 buckets, ~244 vecs/bucket) was the 1M setting; at 10M the same
rule gives 16 planes = 65,536 buckets (~153 vecs/bucket). IVF lists
scale the same way: K=256 (~3.9k/list) at 1M -> K=1024 (~9.8k/list,
nprobe=8 scans ~78k vecs/query) at 10M, codebook trained on a 1%
sample. Recall is spot-checked with the q88 harness at the same
plane count. Prints one JSON line.

    python probes/similarity_10m_rung.py [REPLICAS] [--ivf-only RUNS]

``--ivf-only RUNS`` is the round-10 variance-pinning mode (VERDICT r9
#6: ivf walls spread 39.4-98.5 s across same-day runs at 10M — family
mega-lists make probed-list rerank the cost and the host regime the
variance): build the corpus + codebook once, then run ivf_topk RUNS
times UNCAPPED and RUNS times with the new ``max_list`` per-list cap,
reporting each wall and the capped-vs-uncapped (query, neighbor)
overlap so the cap's recall cost on THIS corpus is measured, not
assumed.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from strat_backtest_spark.session import get_spark  # noqa: E402


def build_corpus(spark, replicas: int, corpus_dir: str) -> float:
    t0 = time.time()
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    rep = base.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "r")
    ).select(
        (F.col("vec_id") + F.col("r") * n_base).alias("new_id"), "embedding"
    )

    def _jitter(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            rng = np.random.default_rng(int(pdf["new_id"].iloc[0]) % (2**31))
            mat = mat + rng.normal(0.0, 0.05, mat.shape)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["new_id"].to_numpy(),
                    "embedding": list(mat.astype(np.float32)),
                }
            )

    (
        rep.repartition(64)
        .mapInPandas(_jitter, "vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(f"{corpus_dir}/embeddings.parquet")
    )
    # planted ground truth: 10 tight clones (sigma=0.001, cos~0.99997)
    # per query vector, ids >= 10*n_base*replicas. The family jitter
    # (sigma=0.05 on unit-norm bases) makes family pairs cos~0.9285 —
    # there, single-table LSH recall is THEORY-bounded at
    # (1-theta/pi)^planes (~0.13 at 16 planes), so recall-vs-family
    # measures the corpus, not the index. The clones are the clearly-
    # nearest cluster the index SHOULD find; exact top-10 = the clones.
    # clone the CORPUS query rows (their sigma=0.05 jitter included),
    # not the raw bases — a base-built clone would sit at cos~0.93
    # from its query, indistinguishable from the family noise
    qpdf = (
        spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 100)
        .toPandas()
        .sort_values("vec_id")
    )
    qm = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(99)
    rows = []
    nid = 10 * n_base * replicas
    for qi, qv in zip(qpdf["vec_id"], qm):
        for _ in range(10):
            rows.append((int(nid), (qv + rng.normal(0, 0.001, qv.shape)).astype(np.float32)))
            nid += 1
    spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]}),
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("append").parquet(f"{corpus_dir}/embeddings.parquet")
    return time.time() - t0


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n_planes = 16  # 2^16 buckets: corpus/buckets ~ 153 << 2000 cap
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    out = {"replicas": replicas, "vectors": 2000 * replicas, "n_planes": n_planes}
    corpus_dir = f"/tmp/vecs_rung_{replicas}x"
    out["corpus_build_s"] = round(build_corpus(spark, replicas, corpus_dir), 1)

    from strat_backtest_spark.operators.similarity import (
        ann_recall,
        ann_topk,
        embedding_neardup_pairs,
        ivf_topk,
        train_centroids_kmeans,
    )

    emb = spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 100).cache()
    queries.count()

    def run(key, fn):
        t = time.time()
        n = fn().count()
        out[key + "_rows"] = n
        out[key + "_s"] = round(time.time() - t, 1)
        print(json.dumps({key: out[key + "_s"], "rows": n}),
              file=sys.stderr, flush=True)

    if "--ivf-only" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--ivf-only") + 1])
        t = time.time()
        cents = train_centroids_kmeans(emb, n_centroids=1024, sample_fraction=0.01)
        out["kmeans_train_s"] = round(time.time() - t, 1)
        pairs = {}
        for label, max_list in [("uncapped", None), ("capped", 20_000)]:
            walls = []
            for i in range(runs):
                t = time.time()
                res = ivf_topk(
                    emb, queries, cents, k=10, nprobe=8, max_list=max_list
                )
                got = {
                    (r["query_id"], r["neighbor_id"]) for r in res.collect()
                }
                walls.append(round(time.time() - t, 1))
                print(json.dumps({f"ivf_{label}_run{i}": walls[-1],
                                  "rows": len(got)}),
                      file=sys.stderr, flush=True)
            pairs[label] = got
            out[f"ivf_{label}_s"] = walls
            out[f"ivf_{label}_rows"] = len(got)
        inter = len(pairs["capped"] & pairs["uncapped"])
        out["capped_vs_uncapped_overlap"] = round(
            inter / max(1, len(pairs["uncapped"])), 4
        )
        shutil.rmtree(corpus_dir, ignore_errors=True)
        print(json.dumps(out))
        spark.stop()
        return

    if "--ivf-persist" in sys.argv:
        # persisted-IVF A/B (q97 at scale): assignment+layout cost is
        # paid ONCE at write time; the query then READS only its
        # probed lists' directories — unlike the bucketed dedup index
        # (exchange-only win, measured slower single-node), partition
        # pruning here avoids ~99% of the SCAN, which is a single-node
        # win too. repartition on centroid_id keeps files-per-dir ~1.
        from strat_backtest_spark.operators.similarity import (
            ivf_assign,
            ivf_probes,
        )

        t = time.time()
        cents = train_centroids_kmeans(emb, n_centroids=1024, sample_fraction=0.01)
        out["kmeans_train_s"] = round(time.time() - t, 1)
        t = time.time()
        ivf_dir = f"{corpus_dir}/ivf_corpus"
        (
            ivf_assign(emb, cents)
            .repartition(64, F.col("centroid_id"))
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(ivf_dir)
        )
        out["ivf_layout_write_s"] = round(time.time() - t, 1)
        print(json.dumps({"ivf_layout_write": out["ivf_layout_write_s"]}),
              file=sys.stderr, flush=True)
        pairs = {}
        for label in ("onthefly", "persisted", "onthefly2", "persisted2"):
            t = time.time()
            if label.startswith("persisted"):
                probe_ids = sorted(
                    r["probe"]
                    for r in ivf_probes(queries, cents, 8)
                    .select("probe").distinct().collect()
                )
                corpus = spark.read.parquet(ivf_dir).filter(
                    F.col("centroid_id").isin(probe_ids)
                )
                res = ivf_topk(corpus, queries, cents, k=10, nprobe=8,
                               pre_assigned=True)
            else:
                res = ivf_topk(emb, queries, cents, k=10, nprobe=8)
            got = {(r["query_id"], r["neighbor_id"]) for r in res.collect()}
            pairs[label] = got
            out[f"ivf_{label}_s"] = round(time.time() - t, 1)
            print(json.dumps({f"ivf_{label}": out[f"ivf_{label}_s"],
                              "rows": len(got)}),
                  file=sys.stderr, flush=True)
        out["persisted_equals_onthefly"] = pairs["persisted"] == pairs["onthefly"]
        shutil.rmtree(corpus_dir, ignore_errors=True)
        print(json.dumps(out))
        spark.stop()
        return

    run("ann_topk", lambda: ann_topk(emb, queries, k=10, n_planes=n_planes))
    # the mega-bucket mitigation: deterministic per-bucket cap
    run(
        "ann_topk_capped",
        lambda: ann_topk(
            emb, queries, k=10, n_planes=n_planes, max_bucket=2000
        ),
    )
    t = time.time()
    cents = train_centroids_kmeans(emb, n_centroids=1024, sample_fraction=0.01)
    out["kmeans_train_s"] = round(time.time() - t, 1)
    run("ivf_topk", lambda: ivf_topk(emb, queries, cents, k=10, nprobe=8))
    run(
        "embedding_neardup",
        lambda: embedding_neardup_pairs(
            emb, threshold=0.9, n_planes=n_planes, n_tables=3, max_bucket=2000
        ),
    )
    # recall at BOTH plane counts: more planes = more buckets (needed
    # for the rerank cap) but also more sign-bit flips between true
    # near neighbors — the q88 harness is how the trade is measured
    for planes in (n_planes, 12):
        t = time.time()
        rec = ann_recall(emb, queries, k=10, n_planes=planes).agg(
            F.avg("recall").alias("mean_recall")
        ).collect()[0]["mean_recall"]
        out[f"ann_recall_{planes}p_s"] = round(time.time() - t, 1)
        out[f"mean_recall_at_10_{planes}p"] = round(float(rec), 4)
        print(json.dumps({f"recall_{planes}p": out[f"mean_recall_at_10_{planes}p"],
                          "s": out[f"ann_recall_{planes}p_s"]}),
              file=sys.stderr, flush=True)

    shutil.rmtree(corpus_dir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
