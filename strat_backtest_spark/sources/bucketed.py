"""Bucketed storage — pre-shuffled tables for co-located joins/aggs.

Partitioning (``partitionBy``) prunes SCANS; bucketing (``bucketBy``)
removes SHUFFLES: a table written with ``bucketBy(n, key)`` is stored
pre-hash-partitioned on the key, so a join or aggregation on that key
reads the buckets aligned and Catalyst drops the Exchange entirely. At
100 TB the kernel feed is the textbook case — bars bucketed by ticker
make every backtest/grid run start WITHOUT the (ticker, run_id)
shuffle, amortizing one write-time shuffle across every subsequent
sweep. Same story for the MinHash signature table (bucket by doc_id)
and the ANN corpus (bucket by LSH bucket / IVF list).

Bucketed tables go through the session catalog (``saveAsTable``) —
that is what records bucket metadata; a bare ``.parquet(path)`` write
cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered)
    catalog table. ``sort_col`` additionally orders rows inside each
    bucket file — for bars, (ticker buckets, date-sorted) means the
    kernel's sortWithinPartitions finds its input nearly ordered."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata live (plans
    on the bucket key then skip the Exchange)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Persist ``df`` partitioned by a pruning column — the ANN scale
    path: an embedding corpus written ``partitionBy(bucket)`` (or IVF
    ``centroid_id``) lets a probe query scan ONLY its bucket's
    directory; the filter becomes a PartitionFilter, never touching
    the other partitions' files (tests/test_plans.py asserts this on
    the plan)."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partition-pruned layout back; filters on the partition
    column prune directories at planning time."""
    return spark.read.parquet(path)
