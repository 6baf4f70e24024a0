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


def split_assign(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test assignment: every row gets a
    ``split`` label decided by ``md5(seed:key) mod 1e6`` against the
    cumulative weight thresholds — the same identity-keyed contract as
    the samplers above, so membership is stable under repartitioning,
    reproducible on any engine, and leakage-auditable (a doc can never
    silently migrate between splits across runs). Map-only; weights
    must sum to ≤ 1 (any remainder falls into the LAST split)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if not weights:
        raise ValueError("weights must be non-empty")
    h = md5_hash(
        F.concat_ws(":", F.lit(int(seed)), F.col(key_col).cast("string"))
    ) % _DENOM
    names = list(weights)
    expr = F.lit(names[-1])
    acc = 0.0
    bounds = []
    for name, wgt in zip(names[:-1], [weights[n] for n in names[:-1]]):
        acc += wgt
        bounds.append((name, int(acc * _DENOM)))
    for name, bound in reversed(bounds):
        expr = F.when(h < bound, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
