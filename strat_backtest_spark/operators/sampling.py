"""Deterministic sampling for training-data curation.

``df.sample()`` draws per-partition pseudo-random rows: the result
changes with partitioning, retries, and cluster layout — useless for a
reproducible 100 TB curation run. Hash-gate sampling instead keys
every decision on a row's IDENTITY: keep a row iff
``hash(id) mod D < rate·D``. The sample is then a pure function of the
data — stable under repartitioning, resumable after failure,
recomputable by any engine (the hash is the repo's portable md5
scheme, functions/hashing.py), and joins cleanly with itself across
pipeline stages.

``stratified_sample`` applies a different rate per stratum — the
standard move for rebalancing a multilingual/multi-source corpus
(downsample the dominant language, keep the tail).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from strat_backtest_spark.functions.hashing import md5_hash

_DENOM = 1_000_000  # rate resolution: 1e-6


def _gate(key: Column, rate: float) -> Column:
    return (md5_hash(key.cast("string")) % _DENOM) < int(rate * _DENOM)


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by ``md5(key) mod 1e6`` — no
    randomness, no partition sensitivity."""
    return df.filter(_gate(F.col(key_col), rate))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum hash-gate sampling: ``rates`` maps stratum value →
    keep-rate; strata not listed keep ``default_rate``. One map-only
    pass, no shuffle."""
    h = md5_hash(F.col(key_col).cast("string")) % _DENOM
    rate = F.lit(int(default_rate * _DENOM))
    for value, r in rates.items():
        rate = F.when(F.col(strata_col) == value, F.lit(int(r * _DENOM))).otherwise(rate)
    return df.filter(h < rate)
