"""The 18-statistic metrics suite (SURVEY.md §2.11; reference
strats.py:657-789).

One pass of window prep + one aggregation per input table, joined on
(ticker, run_id) — each metric is a Column expression, so adding a
ticker or a thousand parameter points changes nothing structurally.

The reference's estimator idiosyncrasies are replicated on purpose
(they are part of its observable behavior):

- Q9  Sharpe compounds mean daily return ^255 but annualizes vol with
      √252 (strats.py:730-732).
- Q10 CAGR uses integer years = days // 365 (strats.py:696).
- Q11 Beta divides a population-style covariance (÷ row count, NaNs
      skipped in the sum) by a SAMPLE variance (strats.py:743-752);
      "R-Squared" is actually the correlation coefficient.
- Q12 Profit factor coerces a zero/absent loss to −1 (strats.py:714-716).

The risk-free rate is injected (fixing Q7's import-time network I/O).

Division semantics: every ratio uses ``try_divide`` so a degenerate
input (zero variance, zero-year span, zero risked capital) yields NULL
under ANSI mode instead of failing the job. The reference CRASHES on
several of these (e.g. ZeroDivisionError for backtests shorter than a
year, strats.py:696) — NULL is the deliberate, strictly-more-usable
replacement. A portfolio without an attached benchmark column gets
NULL for the benchmark-dependent stats (beta/alpha/r_squared) rather
than an AnalysisException.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def compute_metrics(
    portfolio: DataFrame,
    orders: DataFrame,
    initial_amount: float,
    risk_free_rate: float = 0.03,
) -> DataFrame:
    """Returns one row per (ticker, run_id) with the full stats suite."""
    keys = ["ticker", "run_id"]
    w = Window.partitionBy(*keys).orderBy("date")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)

    if "sp500" not in portfolio.columns:
        portfolio = portfolio.withColumn("sp500", F.lit(None).cast("double"))

    # pandas pct_change() forward-fills before differencing
    # (fill_method='pad'), so a calendar-mismatch null row yields a 0.0
    # return and the next real row differences against the filled value
    # — replicated with last-ignorenulls running fills (own layer:
    # window functions cannot nest).
    # positional [0]/[-1] anchors (reference indexes the concat'd frame
    # by position, so a null first/last value is kept, not skipped —
    # min_by/max_by would silently pick the first NON-null).
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    filled = portfolio.select(
        *keys,
        "date",
        "net_worth",
        "sp500",
        F.last("net_worth", ignorenulls=True).over(cum).alias("__nw_ff"),
        F.last("sp500", ignorenulls=True).over(cum).alias("__sp_ff"),
        F.first("net_worth").over(full).alias("__nw_first"),
        F.last("net_worth").over(full).alias("__nw_last"),
        F.first("sp500").over(full).alias("__sp_first"),
        F.last("sp500").over(full).alias("__sp_last"),
    )
    r_s = F.try_divide(F.col("__nw_ff"), F.lag("__nw_ff").over(w)) - 1
    r_m = F.try_divide(F.col("__sp_ff"), F.lag("__sp_ff").over(w)) - 1

    prepped = filled.select(
        *keys,
        "date",
        "net_worth",
        r_s.alias("r_s"),
        r_m.alias("r_m"),
        (F.try_divide(F.col("net_worth"), F.max("net_worth").over(cum)) - 1).alias(
            "drawdown"
        ),
        F.col("sp500"),
        "__nw_first",
        "__nw_last",
        "__sp_first",
        "__sp_last",
    )

    start_amt = F.lit(float(initial_amount))
    days = F.datediff(F.max("date"), F.min("date"))
    years = F.floor(days / 365)  # Q10: integer years
    mean_rs = F.avg("r_s")
    mean_rm = F.avg("r_m")
    # Q11: pandas .sum() skips NaN pairs but divides by FULL row count.
    prepped = prepped.withColumn(
        "__cov_term",
        (F.col("r_s") - F.avg("r_s").over(Window.partitionBy(*keys)))
        * (F.col("r_m") - F.avg("r_m").over(Window.partitionBy(*keys))),
    )

    port_agg = prepped.groupBy(*keys).agg(
        F.min("date").alias("start_time"),
        F.max("date").alias("end_time"),
        F.first("__nw_last").alias("end_amount"),
        F.first("__nw_first").alias("first_net_worth"),
        (F.min("drawdown") * 100).alias("max_drawdown_pct"),
        (F.avg("drawdown") * 100).alias("avg_drawdown_pct"),
        mean_rs.alias("mean_r_s"),
        F.stddev_samp("r_s").alias("std_r_s"),
        F.var_samp("r_s").alias("var_r_s"),
        mean_rm.alias("mean_r_m"),
        F.stddev_samp("r_m").alias("std_r_m"),
        F.sum("__cov_term").alias("cov_num"),
        F.count(F.lit(1)).alias("n_rows"),
        F.first("__sp_last").alias("sp500_last"),
        F.first("__sp_first").alias("sp500_first"),
        years.alias("years"),
    )

    ord_agg = orders.groupBy(*keys).agg(
        F.avg(F.datediff("end_time", "start_time")).alias("avg_hold_days"),
        F.avg(F.when(F.col("profit") < 0, F.col("profit"))).alias("avg_losses"),
        F.avg(F.when(F.col("profit") > 0, F.col("profit"))).alias("avg_profits"),
        F.min(F.when(F.col("profit") < 0, F.col("profit"))).alias("biggest_loss"),
        F.max("profit").alias("biggest_win"),
        F.sum(F.when(F.col("profit") < 0, F.col("profit"))).alias("loss_sum"),
        F.sum(F.when(F.col("profit") > 0, F.col("profit"))).alias("profit_sum"),
        F.sum(F.when(F.col("filled"), F.col("profit"))).alias("filled_profit_sum"),
        F.sum(F.col("start_amount") * F.col("num_shares")).alias("total_risked"),
        F.count(F.lit(1)).alias("n_orders"),
    )

    m = port_agg.join(ord_agg, keys, "left")

    rf = F.lit(float(risk_free_rate))
    cagr = (
        F.pow(
            F.try_divide(F.col("end_amount"), start_amt),
            F.try_divide(F.lit(1.0), F.col("years")),
        )
        - 1
    ) * 100
    # Q12: loss coerced to -1 when zero or null.
    loss = F.when(
        F.col("loss_sum").isNull() | (F.col("loss_sum") == 0), F.lit(-1.0)
    ).otherwise(F.col("loss_sum"))
    profit_factor = F.try_divide(F.coalesce(F.col("profit_sum"), F.lit(0.0)), -loss)
    risk_reward = F.when(
        F.col("n_orders") > 0,
        F.try_divide(F.col("filled_profit_sum"), F.col("total_risked")),
    )
    # Q9: mean daily return compounded over 255 trading days. Explicit
    # square-and-multiply instead of F.pow: Java Math.pow and C libm
    # pow disagree in the last ULP for some inputs, and the ^255
    # amplification makes that visible through the DuckDB oracle's
    # hash gate — a fixed left-associated product of binary powers is
    # the same IEEE op sequence in any engine.
    b1 = F.col("mean_r_s") + 1
    b2 = b1 * b1
    b4 = b2 * b2
    b8 = b4 * b4
    b16 = b8 * b8
    b32 = b16 * b16
    b64 = b32 * b32
    b128 = b64 * b64
    annual_er = b1 * b2 * b4 * b8 * b16 * b32 * b64 * b128 - 1
    sharpe = F.try_divide(annual_er - rf, F.col("std_r_s") * math.sqrt(252))
    volatility = F.col("std_r_s") * math.sqrt(252)
    covariance = F.try_divide(F.col("cov_num"), F.col("n_rows"))  # Q11
    beta = F.try_divide(covariance, F.col("var_r_s"))
    stock_return = F.try_divide(
        F.col("end_amount") - F.col("first_net_worth"), F.col("first_net_worth")
    )
    alpha = (
        stock_return
        - rf
        - beta
        * ((F.try_divide(F.col("sp500_last"), F.col("sp500_first")) - 1) - rf)
    )
    r_squared = F.try_divide(
        covariance, F.sqrt(F.col("var_r_s")) * F.col("std_r_m")
    )

    return m.select(
        *keys,
        F.col("start_time"),
        F.col("end_time"),
        start_amt.alias("start_amount"),
        F.col("end_amount"),
        F.col("avg_hold_days").alias("average_hold_time_days"),
        F.col("avg_losses").alias("average_losses"),
        F.col("avg_profits").alias("average_profits"),
        F.col("biggest_loss"),
        F.col("biggest_win").alias("biggest_win"),
        cagr.alias("cagr_pct"),
        F.col("max_drawdown_pct"),
        F.col("avg_drawdown_pct"),
        (F.col("end_amount") - start_amt).alias("net_profit"),
        profit_factor.alias("profit_factor"),
        risk_reward.alias("risk_reward"),
        sharpe.alias("sharpe_ratio"),
        volatility.alias("volatility_annualized"),
        beta.alias("beta"),
        alpha.alias("alpha"),
        r_squared.alias("r_squared"),
    )
