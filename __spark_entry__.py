"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose
the operator catalog (strat_backtest_spark/plans/catalog.py) for the
DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full multi-ticker MA-cross backtest on synthetic bars
    derived from /root/testdata/sf0.001 events — signal windows →
    applyInPandas order kernel → portfolio net-worth algebra."""
    from strat_backtest_spark.sources.bars import bars_from_events, load_testdata
    from strat_backtest_spark.plans.backtest import Backtest, MACrossStrategy

    tables = load_testdata(spark, "/root/testdata/sf0.001", "events")
    from pyspark.sql import functions as F

    ev = tables["events"].withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    bars = bars_from_events(ev)
    bt = Backtest(bars, initial_amount=10_000.0, strategy=MACrossStrategy(fast=3, lagging=8))
    return bt.final_net_worth()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from strat_backtest_spark.plans.catalog import CATALOG

    return {name: qd.fn for name, qd in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    from strat_backtest_spark.plans.catalog import CATALOG

    return {name: qd.oracle for name, qd in CATALOG.items() if qd.oracle is not None}
