"""strat_backtest_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference backtester
(dhruvsamdani/strat-backtest), re-expressed Spark-first.

Architecture (see SURVEY.md §7):

- One long ``bars`` DataFrame ``(ticker, date, open, high, low, close,
  volume)`` replaces the reference's dict-of-pandas-frames
  (reference: finance_data.py:91-103). Everything partitions by
  ``ticker`` (plus ``run_id`` for parameter sweeps).
- Indicators / signals / portfolio algebra / metrics are pure DataFrame
  window expressions — Catalyst optimizes, whole-stage codegen executes.
- The only sequential component — FIFO order matching with buying-power
  feedback (reference: strats.py:133-245,293-420) — runs as a per-group
  ``mapInPandas`` kernel (operators/kernel.py).
- Large-scale data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal plumbing) live in ``operators/`` as first-class
  DataFrame transformations.
"""

__version__ = "0.1.0"

from strat_backtest_spark.session import get_spark  # noqa: F401
