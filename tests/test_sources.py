"""Ingestion adapters: yfinance-style fetch (S2/S3/S4) through an
injected offline fixture, CSV sink round-trip (S5), and NASDAQ symbol
parsing (S6)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def _fixture_fetcher(ticker: str, period: str) -> pd.DataFrame:
    """Deterministic recorded-fixture stand-in for yfinance: 300
    business days of a noisy trend, yfinance-style frame (DatetimeIndex,
    capitalized OHLCV columns)."""
    rng = np.random.default_rng(abs(hash(ticker)) % 2**32)
    idx = pd.date_range("2020-01-02", periods=300, freq="B", tz="America/New_York")
    close = 100 + np.cumsum(rng.normal(0.1, 1.0, 300))
    return pd.DataFrame(
        {
            "Open": close - 0.5,
            "High": close + 1.0,
            "Low": close - 1.0,
            "Close": close,
            "Volume": rng.integers(1e5, 1e6, 300),
        },
        index=idx,
    )


def test_download_bars_long_layout(spark):
    from strat_backtest_spark.sources.yahoo import download_bars

    bars = download_bars(spark, "AAPL", "MSFT", fetcher=_fixture_fetcher)
    assert bars.columns == ["ticker", "date", "open", "high", "low", "close", "volume"]
    counts = {r["ticker"]: r["n"] for r in bars.groupBy("ticker").agg(F.count("*").alias("n")).collect()}
    assert counts == {"aapl": 300, "msft": 300}
    # tz dropped, dates normalized
    d = bars.agg(F.min("date").alias("d")).collect()[0]["d"]
    assert str(d) == "2020-01-02"


def test_backtest_runs_on_downloaded_bars(spark):
    from strat_backtest_spark.sources.yahoo import download_bars
    from strat_backtest_spark.plans.backtest import Backtest, MACrossStrategy

    bars = download_bars(spark, "AAPL", fetcher=_fixture_fetcher)
    bt = Backtest(bars, 10_000.0, MACrossStrategy(fast=5, lagging=20))
    out = bt.final_net_worth().collect()
    assert len(out) == 1 and out[0]["net_worth"] > 0


def test_market_benchmark_schema(spark):
    from strat_backtest_spark.sources.yahoo import market_benchmark

    b = market_benchmark(spark, fetcher=_fixture_fetcher)
    assert b.columns == ["date", "sp500"]
    assert b.count() == 300


def test_csv_sink_roundtrip(spark, tmp_path):
    from strat_backtest_spark.sources.yahoo import download_bars
    from strat_backtest_spark.sources.bars import write_bars_csv

    bars = download_bars(spark, "AAPL", "MSFT", fetcher=_fixture_fetcher)
    path = str(tmp_path / "bars_csv")
    write_bars_csv(bars, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 600
    assert set(r["ticker"] for r in back.select("ticker").distinct().collect()) == {
        "aapl",
        "msft",
    }


def test_yfinance_missing_raises_helpfully(spark):
    from strat_backtest_spark.sources.yahoo import download_bars

    with pytest.raises(ImportError, match="fetcher"):
        download_bars(spark, "AAPL")  # no fetcher injected, yfinance absent
