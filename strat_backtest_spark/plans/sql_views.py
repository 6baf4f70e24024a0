"""Raw-SQL surface: register the testdata tables as temp views so a
user can drive the engine with ``spark.sql`` instead of the DataFrame
API — same Catalyst plans either way (SURVEY §7.1: declare the logical
plan, let the optimizer pick the physical strategy).

Views go through the same readers as the catalog queries
(plans/catalog.py:_t), so the events timestamp normalization and the
under-split repartition of the heavy-compute tables apply to SQL users
too.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from strat_backtest_spark.plans.catalog import _t
from strat_backtest_spark.schemas import TESTDATA_TABLES


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create (or replace) one temp view per testdata table; returns
    the view names."""
    names = []
    for t in TESTDATA_TABLES:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    return names
