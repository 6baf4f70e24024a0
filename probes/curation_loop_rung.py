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
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    n_base = 5000
    out = {"replicas": replicas, "docs": n_base * replicas}
    corpus_dir = f"/tmp/curation_loop_rung_{replicas}x"

    t0 = time.time()
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    rep = base.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "r")
    ).select(
        "doc_id",
        "source",
        "text",
        "r",
        (F.col("r") / 5).cast("long").alias("g"),
        (F.col("r") % 5).alias("j"),
    )
    words = F.split(F.col("text"), r"\s+")
    fam_tok = lambda i: F.concat(
        F.lit("f"),
        F.pmod(F.xxhash64(F.col("doc_id"), F.col("g"), i), F.lit(99991)).cast(
            "string"
        ),
    )
    jittered = F.transform(
        words, lambda w, i: F.when(i % 2 == 1, fam_tok(i)).otherwise(w)
    )
    new_text = F.concat(
        F.array_join(jittered, " "), F.lit(" u"), F.col("j").cast("string")
    )
    # two-stage select: jitter while doc_id is the BASE id, then re-key
    staged = rep.select("doc_id", "source", "r", new_text.alias("text"))
    (
        staged.select(
            (F.col("doc_id") + F.col("r") * n_base).alias("doc_id"),
            "source",
            "text",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{corpus_dir}/documents.parquet")
    )
    out["corpus_build_s"] = round(time.time() - t0, 1)

    from strat_backtest_spark.streaming.documents_stream import (
        streaming_curation_loop,
    )

    timers: list = []
    cap = 200_000
    t = time.time()
    verdicts = streaming_curation_loop(
        spark, corpus_dir, cap=cap, phase_timers=timers
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
