"""Market-data ingestion adapters (SURVEY.md §2.1 S2/S3/S4; reference
``finance_data.py:106-126`` ``download_data``, ``:17-27``
``Finance_Data``).

A market-data API is a DRIVER-side concern: the fetch is a handful of
HTTP calls returning kilobytes-per-ticker of daily bars, while the
heavy lifting (indicators, kernels, grids) is cluster-side. So these
adapters fetch through an injectable ``fetcher`` callable, normalize
the provider's pandas frame into the engine's long ``bars`` layout,
and hand Spark one DataFrame. Tests inject recorded fixtures;
production uses yfinance when installed (import is lazy — the library
is optional and never touched unless a default fetch happens).

At ingest scale (thousands of tickers), batch the fetches driver-side
and union the per-batch frames — the bottleneck is the upstream API's
rate limit, not Spark. Durable pipelines should land the result with
``write_bars_parquet`` and scan parquet thereafter.
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

# fetcher contract: (ticker, period) -> pandas.DataFrame indexed by a
# DatetimeIndex with at least the yfinance-style columns
# Open/High/Low/Close/Volume (case-insensitive).
Fetcher = Callable[[str, str], pd.DataFrame]


def _yfinance_fetcher(ticker: str, period: str) -> pd.DataFrame:
    """Default fetcher: yfinance Ticker.history (reference
    finance_data.py:26-27). Lazy import — the dependency is optional."""
    try:
        import yfinance as yf  # type: ignore
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise ImportError(
            "yfinance is not installed; pass fetcher= (any callable "
            "(ticker, period) -> pandas.DataFrame of OHLCV bars)"
        ) from exc
    return yf.Ticker(ticker).history(period=period, auto_adjust=True)


def _normalize(pdf: pd.DataFrame, ticker: str) -> pd.DataFrame:
    """Provider frame → long layout rows for one ticker. Lowercases
    columns (reference strats.py:527-528) and materializes the index
    as a date column."""
    out = pdf.copy()
    out.columns = [str(c).lower() for c in out.columns]
    out["date"] = pd.to_datetime(out.index).tz_localize(None).normalize()
    out["ticker"] = ticker.lower()
    cols = ["ticker", "date", "open", "high", "low", "close", "volume"]
    for c in cols:
        if c not in out.columns:
            out[c] = None
    return out[cols].reset_index(drop=True)


def download_bars(
    spark: SparkSession,
    *tickers: str,
    period: str = "10Y",
    fetcher: Optional[Fetcher] = None,
) -> DataFrame:
    """S2 — the reference's front door, ``download_data('AAPL', 'MSFT',
    period='max')`` (finance_data.py:106-126, README.md:145), returned
    as ONE long bars DataFrame instead of a column-multiindexed pandas
    frame: per-ticker work downstream is Window.partitionBy("ticker"),
    identical for 2 tickers or 20,000."""
    fetch = fetcher or _yfinance_fetcher
    frames = [_normalize(fetch(t, period), t) for t in tickers]
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)
    return df.select(
        "ticker",
        F.to_date("date").alias("date"),
        F.col("open").cast("double"),
        F.col("high").cast("double"),
        F.col("low").cast("double"),
        F.col("close").cast("double"),
        F.col("volume").cast("long"),
    )


def ticker_history(
    spark: SparkSession,
    ticker: str,
    period: str = "max",
    fetcher: Optional[Fetcher] = None,
) -> DataFrame:
    """S3 — single-ticker history (reference Finance_Data.__init__,
    finance_data.py:17-27)."""
    return download_bars(spark, ticker, period=period, fetcher=fetcher)


def market_benchmark(
    spark: SparkSession,
    ticker: str = "SPY",
    period: str = "max",
    fetcher: Optional[Fetcher] = None,
) -> DataFrame:
    """S4 — the market-index series the metrics layer joins as
    ``sp500`` (reference Finance_Data.market_data class attribute,
    finance_data.py:13 — fetched at import time there; lazily and
    injectably here, which also fixes quirk Q7's import-time I/O)."""
    bars = download_bars(spark, ticker, period=period, fetcher=fetcher)
    return bars.select("date", F.col("close").alias("sp500"))
