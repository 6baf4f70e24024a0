"""Portfolio / net-worth algebra and benchmark attachment
(SURVEY.md §2.9 K10, §2.3 J3/J5, §2.5 W4/W7).

The reference computes this layer vectorized in pandas
(strats.py:557-579); here it is pure window algebra over
(ticker, run_id) partitions — whole-stage-codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _w(order_col: str = "date"):
    return Window.partitionBy("ticker", "run_id").orderBy(order_col)


def build_portfolio(feed: DataFrame, trade_events: DataFrame, initial_amount: float) -> DataFrame:
    """bars ⟕ kernel trade events → daily net-worth curve.

    Replicates Backtest._enter_positions + _net_worth
    (strats.py:557-579):

      buy/sell null→0, shares_owned forward-filled then 0-filled,
      net_worth = shares_owned·close − Σ(buy·close) + Σ(sell·close) + init

    ``feed`` must carry (ticker, run_id, date, close); extra columns
    pass through. The join key (ticker, run_id, date) matches the
    kernel's output partitioning, and events are tiny relative to bars,
    so Catalyst broadcast-joins them under AQE.
    """
    ev = trade_events.withColumnRenamed("shares_owned", "shares_owned_event")
    df = feed.join(ev, ["ticker", "run_id", "date"], "left")

    w = _w()
    cum = w.rowsBetween(Window.unboundedPreceding, 0)

    buy = F.coalesce(F.col("buy_shares"), F.lit(0.0))
    sell = F.coalesce(F.col("sell_shares"), F.lit(0.0))
    shares = F.coalesce(
        F.last("shares_owned_event", ignorenulls=True).over(cum), F.lit(0.0)
    )

    df = (
        df.withColumn("buy", buy)
        .withColumn("sell", sell)
        .withColumn("shares_owned", shares)
    )
    net_worth = (
        F.col("shares_owned") * F.col("close")
        - F.sum(F.col("buy") * F.col("close")).over(cum)
        + F.sum(F.col("sell") * F.col("close")).over(cum)
        + F.lit(float(initial_amount))
    )
    return df.withColumn("net_worth", net_worth).drop(
        "buy_shares", "sell_shares", "shares_owned_event"
    )


def attach_benchmark(
    portfolio: DataFrame, benchmark: DataFrame, mode: str = "positional"
) -> DataFrame:
    """Attach the market-index column (reference: strats.py:592-600).

    mode='positional' replicates quirk Q6 exactly: the benchmark series
    is truncated to dates ≤ the portfolio's last date, then its last
    len(portfolio) rows are zipped onto the portfolio BY POSITION —
    both sides ranked from their series end and equi-joined on that
    rank.

    mode='date' is the fix: a plain date equi-join (benchmark
    broadcast — it is one row per trading day).
    """
    if mode == "date":
        return portfolio.join(F.broadcast(benchmark), "date", "left")

    wp = Window.partitionBy("ticker", "run_id").orderBy(F.col("date").desc())
    p = portfolio.withColumn("__rfe", F.row_number().over(wp))

    last_dates = portfolio.groupBy("ticker", "run_id").agg(
        F.max("date").alias("__last_date")
    )
    b = benchmark.join(F.broadcast(last_dates), F.col("date") <= F.col("__last_date"))
    wb = Window.partitionBy("ticker", "run_id").orderBy(F.col("date").desc())
    b = b.withColumn("__rfe", F.row_number().over(wb)).select(
        F.col("ticker"),
        F.col("run_id"),
        F.col("__rfe"),
        F.col("sp500"),
    )
    return p.join(b, ["ticker", "run_id", "__rfe"], "left").drop("__rfe", "__last_date")
