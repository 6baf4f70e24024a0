"""Round-15 optimization equivalence tests: every plan-shape change
must be value-invisible. Each test pins one rewrite against the shape
it replaced."""

from datetime import date

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL


def _rows(df, cols):
    return sorted(
        tuple(r) for r in df.select(*cols).collect()
    )


def test_attach_benchmark_positional_equals_full_outer_join(spark):
    """attach_benchmark mode='positional' (union + single-non-null
    merge) must equal the full-outer-join construction it replaced —
    including benchmark-only calendar rows (null portfolio columns) and
    portfolio-only rows (null sp500)."""
    from strat_backtest_spark.operators.portfolio import attach_benchmark

    # two groups with different lengths/last dates; portfolio calendar
    # deliberately missing one benchmark day (d3) and containing one
    # day the benchmark lacks (d4)
    d = [date(2024, 1, i) for i in range(1, 9)]
    portfolio = spark.createDataFrame(
        [
            ("a", 0, d[0], 10.0, "buy", 100.0),
            ("a", 0, d[1], 11.0, None, 101.0),
            ("a", 0, d[3], 12.0, None, 102.0),   # not a benchmark day
            ("a", 0, d[4], 13.0, "sell", 103.0),
            ("b", 0, d[1], 20.0, None, 200.0),
            ("b", 0, d[2], 21.0, None, 201.0),
        ],
        "ticker string, run_id long, date date, close double, "
        "action string, net_worth double",
    )
    benchmark = spark.createDataFrame(
        [(d[0], 1.0), (d[1], 2.0), (d[2], 3.0), (d[4], 5.0), (d[5], 6.0)],
        "date date, sp500 double",
    )

    new = attach_benchmark(portfolio, benchmark, mode="positional")

    # the replaced shape, inlined
    stats = portfolio.groupBy("ticker", "run_id").agg(
        F.max("date").alias("__last_date"), F.count(F.lit(1)).alias("__n")
    )
    from pyspark.sql import Window

    b = benchmark.join(F.broadcast(stats), F.col("date") <= F.col("__last_date"))
    wb = Window.partitionBy("ticker", "run_id").orderBy(F.col("date").desc())
    b = (
        b.withColumn("__rfe", F.row_number().over(wb))
        .filter(F.col("__rfe") <= F.col("__n"))
        .select("ticker", "run_id", "date", "sp500")
    )
    old = portfolio.join(b, ["ticker", "run_id", "date"], "full_outer")

    assert new.columns == old.columns
    assert _rows(new, new.columns) == _rows(old, old.columns)
    # the merge must actually produce benchmark-only rows
    assert any(r["close"] is None for r in new.collect())


def test_sweep_partition_cols_decision(spark):
    """Adaptive kernel keying: single-run sweeps and cluster-saturating
    ticker counts keep the elidable ("ticker",) key; a few-ticker
    multi-run sweep spreads on ("ticker", "run_id")."""
    from strat_backtest_spark.operators.optimize import _sweep_partition_cols

    par = spark.sparkContext.defaultParallelism
    one_ticker = spark.range(10).select(
        F.lit("x").alias("ticker"), F.col("id").alias("v")
    )
    many = spark.range(8 * par).select(
        F.col("id").cast("string").alias("ticker"), F.col("id").alias("v")
    )
    assert _sweep_partition_cols(one_ticker, 1) == ("ticker",)
    assert _sweep_partition_cols(one_ticker, 51) == ("ticker", "run_id")
    assert _sweep_partition_cols(many, 51) == ("ticker",)


def test_evaluate_params_partition_cols_value_invariant(spark):
    """evaluate_params must score identically under both kernel keyings
    (the adaptive decision may pick either at different scales)."""
    from strat_backtest_spark.operators.optimize import evaluate_params
    from strat_backtest_spark.plans.catalog import _t
    from strat_backtest_spark.sources.bars import bars_from_events

    bars = bars_from_events(_t(spark, SF_SMALL, "events"))
    rows = [(0, 3, 8), (1, 3, 13), (2, 5, 8), (3, 5, 13)]
    a = evaluate_params(bars, rows, 10_000.0, partition_cols=("ticker",))
    b = evaluate_params(bars, rows, 10_000.0, partition_cols=("ticker", "run_id"))
    cols = ["ticker", "run_id", "net_worth"]
    assert _rows(a, cols) == _rows(b, cols)


def test_params_local_relation_empty_grid(spark):
    """expand_grid over an empty range must return an empty typed
    relation, not raise a ParseException (VALUES with no rows)."""
    from strat_backtest_spark.operators.optimize import expand_grid

    df = expand_grid(spark, (3, 3, 1), (8, 14, 5))
    assert df.columns == ["run_id", "fast", "lagging"]
    assert df.count() == 0
