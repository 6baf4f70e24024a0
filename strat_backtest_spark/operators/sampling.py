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

from pyspark.sql import Column, DataFrame, Window, functions as F

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


def quota_sample(
    df: DataFrame,
    cap: int,
    group_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
    n_salts: int = 32,
) -> DataFrame:
    """Per-group quota: keep at most ``cap`` rows per ``group_col``
    value, chosen deterministically — the curation move for bounding a
    dominant source/domain ("at most N docs per domain") where a RATE
    (stratified_sample) can't promise a hard ceiling.

    Selection contract: within each group, rank rows by
    ``(md5(seed:key), key)`` ascending and keep rank <= cap. Pure
    function of row identity — stable under repartitioning and
    engine-portable (the oracle replays it with one SQL window).

    Scale shape: the full rows never shuffle. A slim ``(key, group,
    h)`` stream goes through a SALTED two-level top-cap — level 1
    ranks within ``(group, h % n_salts)`` and keeps cap per salt, so
    no single reducer ever sees more than one salt's slice of even a
    corpus-dominating group; level 2 ranks the <= cap*n_salts
    survivors per group globally. Winners (<= cap * |groups| keys)
    then semi-join back to the full rows — corpus-proportional side
    un-hinted, AQE picks the strategy (round-7 lesson: forced
    broadcasts of corpus-proportional sides are an OOM at fleet
    scale; here the winner side is cap-bounded, so AQE broadcasts it
    whenever it actually fits)."""
    if cap <= 0:
        raise ValueError("cap must be positive")
    h = md5_hash(F.concat_ws(":", F.lit(int(seed)), F.col(key_col).cast("string")))
    slim = df.select(F.col(key_col), F.col(group_col), h.alias("__h"))
    lvl1 = Window.partitionBy(
        group_col, (F.col("__h") % int(n_salts)).alias("__salt")
    ).orderBy("__h", key_col)
    lvl2 = Window.partitionBy(group_col).orderBy("__h", key_col)
    winners = (
        slim.withColumn("__r1", F.row_number().over(lvl1))
        .filter(F.col("__r1") <= cap)
        .withColumn("__r2", F.row_number().over(lvl2))
        .filter(F.col("__r2") <= cap)
        .select(key_col)
    )
    return df.join(winners, on=key_col, how="left_semi")
