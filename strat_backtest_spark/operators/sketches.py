"""Distinct-count sketches.

Spark's production answer is ``approx_count_distinct`` (HLL++,
JVM-side, mergeable) — use it when the estimate only has to be
consistent within one engine. This module adds a K-MINIMUM-VALUES
sketch built on the repo's portable md5 hash scheme
(functions/hashing.py): the k smallest hash values of a set determine
the estimate ``(k-1) / (h_(k) / P)``, so ANY engine with md5 computes
the IDENTICAL estimate — which is what lets the correctness gate check
an approximation exactly, and what makes sketch states comparable
across a Spark pipeline and an external warehouse.

Scale shape: the per-group distinct-hash reduction is the only
shuffle; the k-smallest selection is a bounded per-group top-k. The
sketch (k longs) is mergeable by union + re-take-k — partial sketches
from map-side combine travel as k-length arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from strat_backtest_spark.functions.hashing import P, md5_hash


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group approximate distinct count of ``key_col``:
    (group_cols..., est_distinct, exact-when-small flag).

    When a group has fewer than k distinct keys the sketch IS exact
    (all hashes retained); the estimator switches to the true count.
    """
    hashed = df.select(
        *group_cols, md5_hash(F.col(key_col).cast("string")).alias("__h")
    ).dropDuplicates(group_cols + ["__h"])
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return (
        topk.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.max("__h").alias("__hk"),
        )
        .select(
            *group_cols,
            F.when(F.col("__n") < k, F.col("__n").cast("double"))
            .otherwise(
                F.round((F.lit(float(k - 1)) * F.lit(float(P))) / F.col("__hk"), 4)
            )
            .alias("est_distinct"),
            (F.col("__n") < k).alias("is_exact"),
        )
    )
