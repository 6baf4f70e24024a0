"""A/B for the q100 loop's batch-0 classify_write anomaly (r12 verdict
item 3: 200.5 s vs 4.5 s steady at the 20M rung — a 45x first-batch
factor the r12 row provisionally attributed to Python-worker fleet +
codegen warm-up).

Two candidate owners, measured separately:

A. FIXED warm-up (worker fleet fork + numpy/pandas import + first
   Arrow batch + codegen): in a FRESH JVM, run quality_classifier over
   the same fixed input three times — run1 pays every first-use cost,
   run3 is steady. The difference is the whole fixed warm-up constant,
   an upper bound on what batch 0 could be paying for this reason.

B. WORKLOAD (the suspected real owner): the classify stage's input is
   the batch's dedup SURVIVORS. Batch 0 runs against an EMPTY index,
   so ~every family head it sees is novel and reaches the classifier;
   by batch 2 the index has absorbed the corpus's families and almost
   everything is verdicted dup_near BEFORE the classifier — the
   classify input collapses by an order of magnitude while the wall is
   read as "per batch". The loop's phase timers now record per-batch
   verdict counts, so the per-SURVIVOR rate is computable directly: if
   batch-0's rate matches steady-state, the anomaly is workload, not
   warm-up.

Run order matters: part A must own the fresh JVM's first Python UDF,
so the loop (part B) runs in a SECOND session.

    python probes/curation_warmup_ab.py [REPLICAS]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from strat_backtest_spark.session import get_spark  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out = {"replicas": replicas, "docs": 5000 * replicas}
    corpus_dir = f"/tmp/curation_warmup_ab_{replicas}x"

    from _corpus import assert_family_construction, build_family_corpus
    from strat_backtest_spark.operators.text_analysis import (
        fixture_weights,
        quality_classifier,
    )

    # ---- session 1: corpus build, then part A (cold vs warm classifier)
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    t0 = time.time()
    build_family_corpus(
        spark, replicas, corpus_dir, extra_cols=("source",), n_files=32
    )
    out["corpus_build_s"] = round(time.time() - t0, 1)
    assert_family_construction(spark, corpus_dir)
    spark.stop()

    # fresh JVM so run1 genuinely pays fleet fork + imports + codegen
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    docs = (
        spark.read.parquet(f"{corpus_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 3 == 0)  # ~chunk-0-sized slice
        .localCheckpoint()
    )
    n_fixed = docs.count()
    w1, w2 = fixture_weights(4096), fixture_weights(2048)
    runs = []
    for _ in range(3):
        t0 = time.time()
        quality_classifier(docs, w1, bigram_weights=w2).write.format(
            "noop"
        ).mode("overwrite").save()
        runs.append(round(time.time() - t0, 1))
    out["partA_fixed_input_docs"] = n_fixed
    out["partA_classifier_runs_s"] = runs
    out["partA_fixed_warmup_s"] = round(runs[0] - runs[-1], 1)
    spark.stop()

    # ---- session 2: the real loop with per-batch verdict counts
    from strat_backtest_spark.streaming.documents_stream import (
        streaming_curation_loop,
    )

    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    timers: list = []
    cap = 200 * replicas
    t0 = time.time()
    verdicts = streaming_curation_loop(
        spark, corpus_dir, cap=cap, phase_timers=timers
    )
    counts = {
        r["status"]: r["n"]
        for r in verdicts.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    out["partB_loop_total_s"] = round(time.time() - t0, 1)
    out["partB_status_counts"] = counts
    out["partB_phase_timers"] = timers
    # per-survivor classify rate per batch: input = docs the dedup
    # stage verdicted 'kept' (they and only they reach the classifier)
    rates = []
    for tm in timers:
        surv = tm.get("verdict_counts", {}).get("kept", 0)
        rates.append(
            {
                "chunk": tm.get("chunk"),
                "classify_write_s": tm.get("classify_write_s"),
                "classifier_input_docs": surv,
                "us_per_survivor": (
                    round(tm["classify_write_s"] / surv * 1e6, 1)
                    if surv
                    else None
                ),
            }
        )
    out["partB_classify_rates"] = rates
    print(json.dumps(out))
    shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
