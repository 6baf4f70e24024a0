"""Output sinks: CSV (sources/bars.py keeps the bar-format writer next
to its reader), parquet, and the driver-side plot sink."""

from strat_backtest_spark.sinks.plot import plot_series, PlotUnavailableError

__all__ = ["plot_series", "PlotUnavailableError"]
