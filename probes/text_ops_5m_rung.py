"""Text-operator rung at 5M documents (~266M shingle instances):
dup-n-gram fraction after the blocked-exchange rewrite, and the new
exact-substring dedup (q92) first rung.

Corpus: the family-of-5 vocabulary-expanding construction from
probes/curation_10m_rung.py (see its docstring for why suffix-only
jitter and base-vocab-only constructions are traps) at REPLICAS=1000,
written as a 32-file layout (single-file corpora cap map parallelism —
BASELINE "probe-layout correction" row). The corpus is deleted after
the run. Prints one JSON line.

    python probes/text_ops_5m_rung.py [REPLICAS]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from strat_backtest_spark.session import get_spark  # noqa: E402


def build_corpus(spark, replicas: int, corpus_dir: str) -> float:
    t0 = time.time()
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = 5000
    rep = base.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "r")
    ).select(
        "doc_id", "text", "lang", "source", "r",
        (F.col("r") / 5).cast("long").alias("g"),
        (F.col("r") % 5).alias("j"),
    )
    words = F.split(F.col("text"), r"\s+")
    fam_tok = lambda i: F.concat(  # noqa: E731
        F.lit("f"),
        ((F.col("doc_id") * 37 + F.col("g") * 101 + i * 13) % 99991).cast("string"),
    )
    jittered = F.transform(
        words, lambda w, i: F.when(i % 2 == 1, fam_tok(i)).otherwise(w)
    )
    new_text = F.concat(
        F.array_join(jittered, " "), F.lit(" u"), F.col("j").cast("string")
    )
    (
        rep.select(
            (F.col("doc_id") + F.col("r") * n_base).alias("doc_id"),
            new_text.alias("text"),
            "lang",
            "source",
            F.length(new_text).cast("long").alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{corpus_dir}/documents.parquet")
    )
    return time.time() - t0


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    out = {"replicas": replicas, "docs": 5000 * replicas}
    corpus_dir = f"/tmp/docs_textops_{replicas}x"
    out["corpus_build_s"] = round(build_corpus(spark, replicas, corpus_dir), 1)

    from strat_backtest_spark.plans.catalog import CATALOG

    def run(key: str, df) -> None:
        # noop write forces EVERY output column: count() lets Catalyst
        # eliminate unique-key left joins and the work feeding them
        # (the first probe run "timed" q92 at 1.9 s that way)
        t = time.time()
        df.write.format("noop").mode("overwrite").save()
        out[key + "_s"] = round(time.time() - t, 1)
        print(json.dumps({key: out[key + "_s"]}), file=sys.stderr, flush=True)

    run("dup_ngram", CATALOG["q75_dup_ngram_fraction"].fn(spark, corpus_dir))
    run("substring_dedup", CATALOG["q92_substring_dedup"].fn(spark, corpus_dir))
    shutil.rmtree(corpus_dir, ignore_errors=True)

    # sparse-density companion for q92: the family corpus is the
    # ADVERSARIAL regime (members share nearly all 6-grams, banned
    # occurrences ~ the whole stream). Real curation corpora are
    # boilerplate-sparse; build one (every word replaced by a
    # (doc, replica)-unique token -> no organic cross-doc 6-grams;
    # only q92's own 1-in-2 injected template is duplicated) and time
    # the same catalog entry.
    sparse_dir = f"/tmp/docs_textops_sparse_{replicas}x"
    t0 = time.time()
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    rep = base.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "r")
    )
    words = F.split(F.col("text"), r"\s+")
    uniq_tok = lambda i: F.concat(  # noqa: E731
        F.lit("u"),
        (F.col("doc_id") + F.col("r") * 5000).cast("string"),
        F.lit("x"),
        i.cast("string"),
    )
    new_text = F.array_join(F.transform(words, lambda w, i: uniq_tok(i)), " ")
    (
        rep.select(
            (F.col("doc_id") + F.col("r") * 5000).alias("doc_id"),
            new_text.alias("text"),
            "lang",
            "source",
            F.length(new_text).cast("long").alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{sparse_dir}/documents.parquet")
    )
    out["sparse_corpus_build_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    CATALOG["q92_substring_dedup"].fn(spark, sparse_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    out["substring_dedup_sparse_s"] = round(time.time() - t0, 1)
    print(json.dumps({"substring_dedup_sparse": out["substring_dedup_sparse_s"]}),
          file=sys.stderr, flush=True)
    shutil.rmtree(sparse_dir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
