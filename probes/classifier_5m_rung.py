"""Quality-classifier rung at 5M documents: throughput of the q98
hashed-linear scorer (map-only Arrow pass, per-worker token memo) on a
replicated sf0.1 corpus. Dup structure is irrelevant to scoring, so
the corpus is a plain suffix-jittered replication (each replica gets
one disambiguating token — keeps texts realistic while varying the
vocabulary the memo sees). 32-file layout; corpus deleted after.

    python probes/classifier_5m_rung.py [REPLICAS]
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
    out = {"replicas": replicas, "docs": 5000 * replicas}
    corpus_dir = f"/tmp/docs_classifier_{replicas}x"

    t0 = time.time()
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    rep = base.crossJoin(spark.range(replicas).withColumnRenamed("id", "r"))
    (
        rep.select(
            (F.col("doc_id") + F.col("r") * 5000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" r"), F.col("r").cast("string")
            ).alias("text"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{corpus_dir}/documents.parquet")
    )
    out["corpus_build_s"] = round(time.time() - t0, 1)

    from strat_backtest_spark.operators.text_analysis import (
        fixture_weights,
        quality_classifier,
    )

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    # warm-up: page the corpus + start Python workers OUTSIDE the
    # timed window (the r11 first-timed-run-vs-second skew: 7.0 s
    # unigram before 5.2 s unigram+bigram was pure scan warmup)
    docs.select("doc_id", "text").write.format("noop").mode("overwrite").save()
    t = time.time()
    quality_classifier(docs, fixture_weights(4096)).write.format("noop").mode(
        "overwrite"
    ).save()
    out["classify_s"] = round(time.time() - t, 1)
    out["docs_per_s"] = int(out["docs"] / out["classify_s"])

    # round-11 variant: unigram + hashed-bigram features (the fastText
    # pair table roughly doubles the feature stream; vectorized scorer)
    t = time.time()
    quality_classifier(
        docs, fixture_weights(4096), bigram_weights=fixture_weights(2048)
    ).write.format("noop").mode("overwrite").save()
    out["classify_bigram_s"] = round(time.time() - t, 1)
    out["docs_per_s_bigram"] = int(out["docs"] / out["classify_bigram_s"])
    print(json.dumps({"classify": out["classify_s"],
                      "docs_per_s": out["docs_per_s"],
                      "classify_bigram": out["classify_bigram_s"],
                      "docs_per_s_bigram": out["docs_per_s_bigram"]}),
          file=sys.stderr, flush=True)

    shutil.rmtree(corpus_dir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
