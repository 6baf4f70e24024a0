"""Vectorized signal generation (SURVEY.md §2.2 P9, §2.9 K8).

The reference detects indicator-cross edges with numpy positional
indexing (custom_strats.py:45-48):

    cross = fast_ma > lagging_ma
    buy  = cross.iloc[np.where(cross & (cross != cross.shift(1)))]
    sell = cross.iloc[np.where(~cross & (cross != cross.shift(1)))]

Here the same semantics are a lag + filter over a per-ticker window —
fully declarative, whole-stage-codegen'd, and partitionable across any
number of (ticker, run_id) groups.

pandas parity notes:
- NaN > NaN is False in pandas, so `cross` is False during the MA
  warm-up window → replicated with coalesce(..., False).
- `cross != cross.shift(1)` is True on the first row (NaN != x), so a
  leading True emits a buy and a leading False emits a sell →
  replicated by treating a null lag as "changed".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from strat_backtest_spark.functions.windows import rolling_mean, ticker_window


def ma_cross_signals(
    bars: DataFrame,
    fast: int,
    lagging: int,
    run_id: int = 0,
) -> DataFrame:
    """MA-crossover signal events for a single parameter point
    (reference: MA_Cross_Strat, custom_strats.py:36-48).

    Returns (ticker, run_id, date, close, action) rows at the cross
    edges only.
    """
    w = ticker_window()
    cross = F.coalesce(
        rolling_mean("close", fast, w) > rolling_mean("close", lagging, w),
        F.lit(False),
    )
    df = bars.select(
        "ticker",
        F.lit(run_id).cast("long").alias("run_id"),
        "date",
        "close",
        cross.alias("cross"),
    )
    prev = F.lag("cross").over(ticker_window())
    edges = df.withColumn(
        "changed", prev.isNull() | (F.col("cross") != prev)
    ).filter("changed")
    return edges.select(
        "ticker",
        "run_id",
        "date",
        "close",
        F.when(F.col("cross"), F.lit("buy")).otherwise(F.lit("sell")).alias("action"),
    )


def ma_cross_signals_grid(bars: DataFrame, params: DataFrame) -> DataFrame:
    """MA-crossover signals for a whole parameter grid at once — the
    scalable replacement for the reference's per-state re-run
    (optimize.py:218-225).

    Strategy: compute each ticker's close prefix-sum ONCE, broadcast
    the (small) params table, and derive sma(n) for any n from
    prefix-sum differences via two self-joins on row offsets:

        sma_n(i) = (S(i) - S(i-n)) / n        valid when i >= n

    This avoids a per-parameter window pass: the bars table is scanned
    once, and the joins are co-partitioned on (ticker, rn). With P
    parameter points the output is P× the signal rows but the heavy
    bars scan does not multiply.

    params: (run_id LONG, fast INT, lagging INT).
    """
    w = ticker_window()
    base = bars.select(
        "ticker",
        "date",
        "close",
        F.row_number().over(w).alias("rn"),
        F.sum("close").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("csum"),
    )
    # prefix sums table used for the offset lookups (S(i-n)); S(0) = 0
    psum = base.select("ticker", "rn", F.col("csum").alias("psum"))

    g = base.crossJoin(F.broadcast(params))

    def attach_sma(df: DataFrame, n_col: str, out: str) -> DataFrame:
        # fully-renamed join keys: the prefix-sum table shares lineage
        # with `df`, so positional Column references would be ambiguous
        p = psum.select(
            F.col("ticker").alias("__p_ticker"),
            F.col("rn").alias("__p_rn"),
            F.col("psum").alias(f"__p_{out}"),
        )
        joined = df.join(
            p,
            (F.col("ticker") == F.col("__p_ticker"))
            & (F.col("__p_rn") == F.col("rn") - F.col(n_col)),
            "left",
        ).drop("__p_ticker", "__p_rn")
        lagged = F.when(F.col("rn") == F.col(n_col), F.lit(0.0)).otherwise(
            F.col(f"__p_{out}")
        )
        return joined.withColumn(
            out,
            F.when(
                F.col("rn") >= F.col(n_col),
                (F.col("csum") - lagged) / F.col(n_col),
            ),
        ).drop(f"__p_{out}")

    g = attach_sma(g, "fast", "sma_fast")
    g = attach_sma(g, "lagging", "sma_lagging")

    cross = F.coalesce(F.col("sma_fast") > F.col("sma_lagging"), F.lit(False))
    g = g.select("ticker", "run_id", "date", "close", cross.alias("cross"))
    wg = Window.partitionBy("ticker", "run_id").orderBy("date")
    prev = F.lag("cross").over(wg)
    edges = g.withColumn("changed", prev.isNull() | (F.col("cross") != prev)).filter(
        "changed"
    )
    return edges.select(
        "ticker",
        "run_id",
        "date",
        "close",
        F.when(F.col("cross"), F.lit("buy")).otherwise(F.lit("sell")).alias("action"),
    )


def band_signals(bars: DataFrame, run_id: int = 0) -> DataFrame:
    """All-bars feed for path-dependent strategies (custom_strats.py:83-101):
    every bar is a potential decision point, so the 'signals' table is
    the full close series tagged 'bar' — the kernel's callback decides.
    """
    return bars.select(
        "ticker",
        F.lit(run_id).cast("long").alias("run_id"),
        "date",
        "close",
        F.lit("bar").alias("action"),
    )
