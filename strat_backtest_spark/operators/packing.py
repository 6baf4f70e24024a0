"""Training-data layout operators: deterministic global shuffle into
shards and fixed-token-budget sequence packing.

These are the last-mile stages of an LLM data pipeline: after
curation (dedup → decontaminate → chunk) the corpus must be (a)
globally shuffled so every training shard is an unbiased sample, and
(b) packed into fixed-token-budget sequences so batches waste no
context. Both are implemented here as pure DataFrame plans whose only
wide operation is ONE hash-partitioned exchange on the shard key —
document/chunk text itself rides along exactly once.

Determinism contract: all randomness is the engine-portable
``md5_hash`` family (functions/hashing.py), so a re-run on any
cluster — or the DuckDB oracle — reproduces shard assignments and
positions bit-for-bit. At 100 TB that matters twice over: resumable
writes (a failed shard can be regenerated alone) and auditable
train/test membership.

Scale shape: ``n_shards`` bounds per-window state — each window
partition is one shard (~corpus/n_shards rows), so raising n_shards
with the corpus keeps every sort partition-sized. No global sort, no
driver collect, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from strat_backtest_spark.functions.hashing import md5_hash


def _shuffle_key(id_col: str, seed: int) -> "F.Column":
    """Engine-portable pseudorandom key in [0, P) for one id."""
    return md5_hash(F.concat_ws(":", F.lit(int(seed)), F.col(id_col).cast("string")))


def shard_shuffle(
    df: DataFrame,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle: every row gets a pseudorandom
    ``shard`` in [0, n_shards) and a dense ``pos`` within its shard.

    Reading shards in (shard, pos) order visits the corpus in
    md5-key order — an unbiased permutation independent of source
    layout (the classic "shuffle before training" step). One
    exchange on ``shard``; the within-shard sort is by the 64-bit
    key, so each sort partition holds ~|corpus|/n_shards rows.
    """
    key = _shuffle_key(id_col, seed)
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return (
        df.withColumn("__key", key)
        .withColumn("shard", (F.col("__key") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("__key")
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Offset-based sequence packing: assign each chunk to a training
    sequence of ``budget`` tokens within its shard.

    Semantics (deterministic, split-on-boundary): chunks are laid out
    within a shard in ``id_col`` order; a chunk starting at cumulative
    token offset ``s`` belongs to sequence ``floor(s / budget)`` — a
    chunk may straddle the boundary into the next sequence, exactly
    how causal-LM training packs documents back-to-back with no
    padding. Output adds ``shard``, ``seq_id``, ``seq_pos`` (0-based
    rank within the sequence) and ``start_offset``.

    Plan: one exchange on the shard hash, two window passes over the
    SAME partitioning (Catalyst reuses the exchange: cumulative sum,
    then rank within (shard, seq_id)). State per window partition is
    one shard's rows.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = (md5_hash(F.col(id_col).cast("string")) % n_shards).cast("int")
    with_shard = df.withColumn("shard", shard)
    w_cum = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_col).over(w_cum), F.lit(0)).cast("long")
    with_seq = with_shard.withColumn("start_offset", start).withColumn(
        "seq_id", (F.col("start_offset") / budget).cast("long")
    )
    w_pos = Window.partitionBy("shard", "seq_id").orderBy(id_col)
    return with_seq.withColumn("seq_pos", F.row_number().over(w_pos) - 1)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 255,
) -> DataFrame:
    """Per-dimension scalar quantization of an ``array<double>``
    embedding column to ``levels``+1 integer codes (int8-style
    compression for ANN shipping / caching).

    Pass 1 computes per-dimension (min, max) via posexplode →
    groupBy(dim): partial aggregation reduces the exchange to
    n_partitions × dim rows regardless of corpus size, and the final
    stats (dim rows — embedding dims are small constants) are
    collected and folded back in as literal arrays, so pass 2 is a
    map-only projection with zero joins. Code formula, mirrored
    verbatim in the SQL oracle so both engines round the same IEEE
    doubles: ``round((x - mn) * levels / (mx - mn))``; constant
    dimensions (mx == mn) quantize to 0.
    """
    dims = (
        df.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    stats = {r["dim"]: (r["mn"], r["mx"]) for r in dims}
    mn = F.array(*[F.lit(float(stats[i][0])) for i in sorted(stats)])
    mx = F.array(*[F.lit(float(stats[i][1])) for i in sorted(stats)])
    codes = F.zip_with(
        F.col(vec_col),
        F.zip_with(mn, mx, lambda a, b: F.struct(a.alias("mn"), b.alias("mx"))),
        lambda x, s: F.when(s["mx"] == s["mn"], F.lit(0)).otherwise(
            F.round((x - s["mn"]) * levels / (s["mx"] - s["mn"]), 0).cast("int")
        ),
    )
    return df.select(F.col(id_col), codes.alias("codes"))
