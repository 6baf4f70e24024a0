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

from pyspark.sql import DataFrame, Window, functions as F

MICROS = {"second": 1_000_000, "minute": 60_000_000, "hour": 3_600_000_000,
          "day": 86_400_000_000}


def _floor_div(expr: str, width: int):
    """Exact floor division of a long SQL expression by ``width`` in
    pure long arithmetic. ``FLOOR(x / width)`` routes through a double
    quotient, which loses precision for |x| near 2^53 (~year 2255 in
    micros) and can misassign boundary rows to a neighboring bucket.
    ``pmod`` is non-negative for positive ``width``, so subtracting it
    lands on an exact multiple and integral ``div`` then matches floor
    semantics for negative (pre-epoch) values too."""
    return F.expr(f"(({expr}) - pmod(({expr}), {width})) div {width}")


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
    # Exact long floor division (_floor_div): cast("long") of a plain
    # divide truncates toward zero, so pre-1970 (negative-micros)
    # timestamps would land in misaligned buckets and silently drop
    # in-range pairs; FLOOR over the double quotient breaks past 2^53.
    pbucket = _floor_div("__pt", width)
    p = p.withColumn("__bucket", F.explode(F.array(pbucket, pbucket - 1)))
    b = b.withColumn("__bucket", _floor_div("__bt", width))

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


def asof_lookup(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    probe_id_col: str,
    salt_width: str | None = None,
) -> DataFrame:
    """As-of lookup: each probe row gets the ``value_col`` of the most
    recent build row with the same key at or before its time
    (inclusive; ties on time take the MAX value). Returns
    ``(probe_id_col, value_col)`` pairs — one row per probe row,
    ``value_col`` null when no build row precedes; callers needing
    more probe columns join back on the id.

    Plan (salt_width=None): union both streams → ONE shuffle+sort per
    key → ``last(ignorenulls)`` forward fill over an
    unbounded-preceding frame — linear in per-key rows, never the
    event x build fan-out (see q32's docstring for the history).

    ``salt_width`` (e.g. "7 days") is the WHALE-KEY mitigation: one
    key holding a pathological share of rows makes the single-window
    sort that key's straggler task (measured 2.1x at 2M-row whales —
    graceful, external sort spills, but linear in the whale). Salting
    splits each key's timeline into contiguous segments of that width:

    1. forward-fill WITHIN (key, segment) — partitions now bounded by
       rows-per-(key x width);
    2. per-(key, segment) build summaries (max value at the segment's
       latest build time) forward-fill ACROSS segments — tiny data,
       one row per non-empty segment;
    3. probe rows whose local fill is null take the carry from
       strictly earlier segments (the carry window orders the probe
       marker BEFORE same-segment summaries, so a row never sees its
       own segment's later builds).

    Results are bit-identical to the unsalted path (equivalence
    pinned in tests); below ~10M rows/key the extra summary pass
    costs more than it saves, so None stays the default."""
    val_t = build.schema[value_col].dataType
    pid_t = probe.schema[probe_id_col].dataType

    # Null build values are dropped up front: the unsalted fill is
    # last(ignorenulls) so they can never be the answer there, but the
    # salted path's per-segment max_by summary COULD pick a null-valued
    # latest build row and skip the carry to that segment's earlier
    # non-null value (ADVICE r8). Filtering before the union makes the
    # two paths equivalent by construction.
    b = build.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.col(time_col).cast("timestamp").alias("__t"),
        F.lit(0).alias("__kind"),
        F.col(value_col).alias("__val"),
        F.lit(None).cast(pid_t).alias("__pid"),
    )
    p = probe.select(
        F.col(key_col).alias("__k"),
        F.col(time_col).cast("timestamp").alias("__t"),
        F.lit(1).alias("__kind"),
        F.lit(None).cast(val_t).alias("__val"),
        F.col(probe_id_col).alias("__pid"),
    )
    u = b.unionByName(p)

    if salt_width is None:
        w = (
            Window.partitionBy("__k")
            .orderBy("__t", "__kind", "__val", "__pid")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = u.withColumn("__fill", F.last("__val", ignorenulls=True).over(w))
    else:
        n, unit = salt_width.split()
        width = int(n) * MICROS[unit.rstrip("s")]
        seg = _floor_div("unix_micros(__t)", width)
        useg = u.withColumn("__seg", seg)
        w1 = (
            Window.partitionBy("__k", "__seg")
            .orderBy("__t", "__kind", "__val", "__pid")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        loc = useg.withColumn("__loc", F.last("__val", ignorenulls=True).over(w1))
        # per-(key, segment) final fill, from build rows alone: the
        # value of the segment's last build row by (t, value)
        summ = (
            b.withColumn("__seg", seg)
            .groupBy("__k", "__seg")
            .agg(F.max_by("__val", F.struct("__t", "__val")).alias("__last"))
            .withColumn("__ck", F.lit(1))
        )
        # probe markers: one per (key, segment) that still needs carry
        need = (
            loc.filter(F.col("__kind") == 1)
            .filter(F.col("__loc").isNull())
            .select("__k", "__seg")
            .distinct()
            .withColumn("__ck", F.lit(0))
            .withColumn("__last", F.lit(None).cast(val_t))
        )
        # carry fill at SEGMENT granularity: marker (__ck=0) sorts
        # before the same segment's summary (__ck=1), so a marker only
        # sees summaries of strictly earlier segments
        w2 = (
            Window.partitionBy("__k")
            .orderBy("__seg", "__ck")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = (
            summ.unionByName(need.select(summ.columns))
            .withColumn("__carry", F.last("__last", ignorenulls=True).over(w2))
            .filter(F.col("__ck") == 0)
            .select("__k", "__seg", "__carry")
        )
        filled = (
            loc.join(carry, ["__k", "__seg"], "left")
            .withColumn("__fill", F.coalesce("__loc", "__carry"))
        )

    return filled.filter(F.col("__kind") == 1).select(
        F.col("__pid").alias(probe_id_col), F.col("__fill").alias(value_col)
    )
