"""q100 at scale: the ONE-JOB streaming curation loop (PII scrub →
per-source quota → incremental dedup vs the persisted index → quality
classifier, one foreachBatch per replay chunk) over 5M documents with
per-stage phase timers.

Corpus: the incremental-dedup rung's hashed-family generator (5
near-dup members per family, vocabulary-expanding family tokens — the
curation_10m_rung.py trap notes) with the base doc's ``source``
carried through, so the quota stage sees the real 20-source key space.
cap=200,000/source admits ~80% (each source holds 250k docs at 5M),
so every stage processes rung-scale volume. Each ~1.67M-doc micro-batch
rides the broadcast-delta dedup path (under the 2M gate). The wall
INCLUDES _chunked_replay's full corpus rewrite (probe scaffolding a
production stream does not pay — same caveat as the q96 rung row).
Corpus + scratch deleted after.

    python probes/curation_loop_rung.py [REPLICAS]
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
    # decade rungs trade task concurrency for heap-per-task (the 50M
    # OOM lesson: ~16.7M-doc micro-batches at 32 tasks exhaust 16g)
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # decade 4 lesson: micro-batch SIZE is the other heap knob — the
    # per-(source, chunk) quota-window state doubles if the corpus
    # doubles at fixed n_chunks (100M/3 chunks OOMed batch 0 at
    # local[16] where 50M/3 ran clean). Production ingest holds batch
    # size roughly constant as daily volume grows; model that by
    # scaling the chunk count, keeping ~16.7M docs per micro-batch.
    n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(cpus=cpus)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    from _corpus import N_BASE as n_base

    out = {"replicas": replicas, "docs": n_base * replicas}
    corpus_dir = f"/tmp/curation_loop_rung_{replicas}x"

    t0 = time.time()
    from _corpus import assert_family_construction, build_family_corpus

    build_family_corpus(
        spark, replicas, corpus_dir, extra_cols=("source",), n_files=32
    )
    out["corpus_build_s"] = round(time.time() - t0, 1)
    assert_family_construction(spark, corpus_dir)

    from strat_backtest_spark.streaming.documents_stream import (
        streaming_curation_loop,
    )

    timers: list = []
    # scale the quota with the corpus so the regime is decade-stable:
    # 20 sources -> n_base*replicas/20 docs per source; cap admits ~80%
    # (r11 anchor: 1000 replicas, cap 200k of 250k/source)
    cap = 200 * replicas
    t = time.time()
    out["n_chunks"] = n_chunks
    verdicts = streaming_curation_loop(
        spark, corpus_dir, cap=cap, n_chunks=n_chunks, phase_timers=timers
    )
    counts = {
        r["status"]: r["n"]
        for r in verdicts.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    out["loop_total_s"] = round(time.time() - t, 1)
    out["cap_per_source"] = cap
    out["status_counts"] = counts
    out["phase_timers"] = timers
    assert sum(counts.values()) == out["docs"], counts
    print(json.dumps(out))
    shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
