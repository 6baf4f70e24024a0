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
