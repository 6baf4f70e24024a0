"""Golden-parity tests — port of the reference's end-to-end test
(tests/test_strat.py:11-30): same AAPL fixture, same params, same
final net worth. Our kernel reproduces the values bit-exactly."""

import os

import pandas as pd
import pytest

AAPL = "/root/reference/strat_backtest/data/aapl.csv"

needs_fixture = pytest.mark.skipif(
    not os.path.exists(AAPL), reason="reference AAPL fixture not available"
)


@pytest.fixture(scope="module")
def bars10(spark):
    from strat_backtest_spark.sources.bars import load_bars_csv

    bars = load_bars_csv(spark, AAPL)
    # pandas .last("10Y") parity: strictly after last_date − 10×YearEnd
    dates = pd.read_csv(AAPL, usecols=["Date"], parse_dates=["Date"])
    cutoff = (dates.Date.iloc[-1] - pd.tseries.frequencies.to_offset("10YE")).date()
    return bars.filter(f"date > '{cutoff}'").cache()


@needs_fixture
@pytest.mark.parametrize(
    "fast,lagging,golden",
    [(36, 40, 1283666.449897766), (40, 100, 61864.069396972656)],
)
def test_ma_cross_golden(spark, bars10, fast, lagging, golden):
    from strat_backtest_spark.plans.backtest import Backtest, MACrossStrategy

    bt = Backtest(bars10, 5000, MACrossStrategy(fast=fast, lagging=lagging))
    [row] = bt.final_net_worth().collect()
    assert row["net_worth"] == pytest.approx(golden, rel=1e-9)


@needs_fixture
def test_band_strategy_runs(spark, bars10):
    from strat_backtest_spark.plans.backtest import Backtest, BandStrategy

    bt = Backtest(bars10, 5000, BandStrategy(), ticker="aapl")
    [row] = bt.final_net_worth().collect()
    assert row["net_worth"] > 0
