"""Streaming document curation: exact dedup on an unbounded corpus.

The batch exact-dedup operator (operators/dedup.py:exact_dedup) is a
digest groupBy; on a stream the same semantics are Structured
Streaming's native ``dropDuplicates`` stateful operator — per-key
state is the 16-byte digest set, managed (and watermark-evictable)
by the engine rather than hand-rolled. Only digests enter state;
document text never shuffles, the same scale property as the batch
path. An unbounded production run adds ``withWatermark`` on an
arrival-time column so state ages out; the finite gate replay needs
(and uses) none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from strat_backtest_spark.streaming.events_stream import _drain_to_parquet


def streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct md5(text) digests of the documents stream — first
    arrival wins, later duplicates are dropped by streaming state.
    Drained on a finite replay this equals the batch DISTINCT, which
    is what the oracle checks."""
    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    hashed = stream.select(
        F.md5(F.col("text").cast("binary")).alias("text_hash")
    )
    return _drain_to_parquet(hashed.dropDuplicates(["text_hash"]), spark, "append")


def streaming_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction applied to the documents STREAM: the batch
    operator (operators/pii.py:pii_scrub) is a pure-codegen map stage,
    so it composes into Structured Streaming unchanged — stateless,
    per-micro-batch, no watermark, no state store. The same property
    that makes it one zero-shuffle pass at 100 TB makes it a
    zero-state streaming stage. Rows equal the batch scrub on the
    finite replay (the q74 oracle SQL gates both). The deterministic
    doc_id-derived augmentation mirrors q74 so every pattern class is
    exercised on both engines."""
    from strat_backtest_spark.operators.pii import pii_scrub

    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    aug = stream.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com"),
                F.lit(" call 555-"), F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"), F.lit("-1234"),
                F.lit(" host 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    scrubbed = pii_scrub(aug).select(
        "doc_id", "n_emails", "n_phones", "n_ips",
        F.md5(F.col("text").cast("binary")).alias("scrub_hash"),
    )
    return _drain_to_parquet(scrubbed, spark, "append")
