"""A/B for the round-11 hot-bucket-cap fold (r10 verdict item 5):
`simhash_neardup_pairs` / `hash_neardup_pairs` used to compute bucket
counts TWICE — a groupBy().count().filter(>cap).collect() for the
first-band-wins hot-set predicate PLUS a count-window over the same
keys to apply the cap. The fold reuses the collected hot set as a
literal NOT-isin filter, removing the window pass.

This probe times BOTH formulations on the same 500k-doc corpus with a
planted 3000-copy hot family (so the cap actually fires), by injecting
the pre-fold window formulation into `_drop_hot_buckets` for the A
side. Results are asserted identical (pair counts) before timing is
reported. Corpus deleted after.

    python probes/neardup_cap_fold_ab.py
"""

from __future__ import annotations

import json
import shutil
import sys
import time

from pyspark.sql import Window, functions as F

sys.path.insert(0, "/root/repo")

from strat_backtest_spark.session import get_spark  # noqa: E402

CAP = 2000
DOCS = 500_000
HOT = 3_000  # planted identical family: every band bucket over CAP


def main() -> None:
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    corpus = "/tmp/neardup_ab_500k"

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    rep = base.crossJoin(spark.range(DOCS // 5000).withColumnRenamed("id", "r"))
    (
        rep.select(
            (F.col("doc_id") + F.col("r") * 5000).alias("doc_id"),
            F.when(
                F.col("doc_id") + F.col("r") * 5000 < HOT,
                F.lit("planted hot family text shared verbatim by every member"),
            )
            .otherwise(F.concat(F.col("text"), F.lit(" r"), F.col("r").cast("string")))
            .alias("text"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{corpus}/documents.parquet")
    )
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()  # warm

    import strat_backtest_spark.operators.dedup as dd

    literal_impl = dd._drop_hot_buckets

    def window_impl(banded, capped_by_band):
        # the pre-fold formulation: re-count every bucket in a window
        bucket = Window.partitionBy("band", "band_val")
        return banded.withColumn(
            "__n", F.count(F.lit(1)).over(bucket)
        ).filter(F.col("__n") <= CAP).drop("__n")

    # phash corpus for the generic path: cold hashes from xxhash64,
    # the planted family all-identical (hot in every band)
    hashed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") < HOT, F.lit(0x1234ABCD5678EF01))
        .otherwise(F.xxhash64(F.col("doc_id")))
        .alias("phash"),
    ).localCheckpoint()

    out = {"docs": DOCS, "hot_family": HOT, "cap": CAP}
    for tag, impl in [("window", window_impl), ("literal", literal_impl)]:
        dd._drop_hot_buckets = impl
        t = time.time()
        sp = dd.simhash_neardup_pairs(docs, max_bucket_size=CAP)
        sp.write.format("noop").mode("overwrite").save()
        out[f"simhash_{tag}_s"] = round(time.time() - t, 1)
        t = time.time()
        # bands=4 (16-bit band space): the designed scale regime —
        # with the default 8-bit slices a uniform 500k corpus SATURATES
        # every one of the 256 buckets per band at the cap (measured:
        # the literal formulation degraded 6x there; see BASELINE.md)
        hp = dd.hash_neardup_pairs(hashed, bands=4, max_hamming=3, max_bucket_size=CAP)
        hp.write.format("noop").mode("overwrite").save()
        out[f"hash_{tag}_s"] = round(time.time() - t, 1)
        out[f"simhash_{tag}_pairs"] = sp.count()
        out[f"hash_{tag}_pairs"] = hp.count()
    dd._drop_hot_buckets = literal_impl

    assert out["simhash_window_pairs"] == out["simhash_literal_pairs"], out
    assert out["hash_window_pairs"] == out["hash_literal_pairs"], out
    print(json.dumps(out))
    shutil.rmtree(corpus, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
