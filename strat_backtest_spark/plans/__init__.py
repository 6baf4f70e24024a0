from strat_backtest_spark.plans.backtest import Backtest, MACrossStrategy, BandStrategy  # noqa: F401
