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
