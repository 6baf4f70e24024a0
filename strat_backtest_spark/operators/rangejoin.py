"""Range (interval) join — the scale-safe shape for time-proximity
joins Spark would otherwise plan as a broadcast-nested-loop.

A naive ``a JOIN b ON a.key = b.key AND b.ts BETWEEN a.ts - L AND
a.ts`` carries an inequality predicate, so Spark falls back to
BroadcastNestedLoopJoin (build side must fit in memory, probe side
scans it per row) or a per-key cartesian — both quadratic in per-key
row counts. The bucketed plan here turns it into an EQUI-join:

- quantize time into buckets of width = the lookback interval;
- the build side keys by its own bucket;
- the probe side explodes to the (at most 2) buckets its lookback
  window can overlap;
- equi-join on (key, bucket) — ONE hash shuffle, AQE-skew-splittable —
  then the exact interval predicate filters inside buckets.

Each qualifying pair lives in exactly one build-side bucket, so no
dedup is needed. Generalizes to any lookback L and composes with the
engine's other operators (the as-of join in plans/catalog_backtest.py
is the "most recent one" cousin; this one keeps ALL rows in range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICROS = {"second": 1_000_000, "minute": 60_000_000, "hour": 3_600_000_000,
          "day": 86_400_000_000}


def lookback_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    time_col: str,
    probe_id_col: str,
    lookback: str = "1 hour",
    probe_prefix: str = "p_",
    build_prefix: str = "b_",
) -> DataFrame:
    """Left-join each probe row to every build row with the same key in
    ``(probe.ts - lookback, probe.ts)`` (exclusive bounds, matching
    strict "prior activity" semantics). Probe rows with no match keep
    exactly one all-null build row — ``probe_id_col`` (the probe's
    primary key) makes that restoration a cheap id-only anti join.

    Output columns: probe's prefixed with ``probe_prefix``, build's
    with ``build_prefix``.
    """
    n, unit = lookback.split()
    width = int(n) * MICROS[unit.rstrip("s")]

    p = probe.select(
        *[F.col(c).alias(probe_prefix + c) for c in probe.columns],
        F.unix_micros(F.col(time_col)).alias("__pt"),
    )
    b = build.select(
        *[F.col(c).alias(build_prefix + c) for c in build.columns],
        F.unix_micros(F.col(time_col)).alias("__bt"),
    )
    # probe window (pt - width, pt) overlaps bucket(pt) and bucket(pt)-1.
    # Integer floor division, not double-divide-then-cast: cast("long")
    # truncates toward zero, so pre-1970 (negative-micros) timestamps
    # would land in misaligned buckets and silently drop in-range pairs.
    pbucket = F.floor(F.col("__pt") / F.lit(width)).cast("long")
    p = p.withColumn("__bucket", F.explode(F.array(pbucket, pbucket - 1)))
    b = b.withColumn("__bucket", F.floor(F.col("__bt") / F.lit(width)).cast("long"))

    probe_cols = [probe_prefix + c for c in probe.columns]
    build_cols = [build_prefix + c for c in build.columns]
    pid = probe_prefix + probe_id_col

    # a qualifying build row's own bucket equals exactly one of the
    # probe's two bucket keys, so the inner join yields each pair once
    matched = (
        p.join(
            b,
            (p[probe_prefix + key_col] == b[build_prefix + key_col])
            & (p["__bucket"] == b["__bucket"])
            & (b["__bt"] > p["__pt"] - width)
            & (b["__bt"] < p["__pt"]),
            "inner",
        )
        .select(*probe_cols, *build_cols)
    )
    unmatched = (
        p.select(*probe_cols)
        .dropDuplicates([pid])  # undo the 2-bucket explode
        .join(matched.select(pid).distinct(), pid, "left_anti")
        .select(*probe_cols, *[F.lit(None).alias(c) for c in build_cols])
    )
    return matched.unionByName(unmatched)
