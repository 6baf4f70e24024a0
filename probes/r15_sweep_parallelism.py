"""Round-15: verify the adaptive sweep-path kernel keying.

1. Single-ticker 51-point grid: the r14 fixed ("ticker",) key ran the
   whole sweep on one core; the adaptive key must spread it on
   ("ticker","run_id") — check the decision, the kernel-stage task
   spread, and A/B wall-clock (interleaved, same session).
2. 1500-ticker bench grid (q41 shape): the adaptive key must KEEP
   ("ticker",) so the r14 exchange elision stays.

Usage: python probes/r15_sweep_parallelism.py
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import time


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from strat_backtest_spark.session import get_spark
    from strat_backtest_spark.plans.catalog_backtest import _bars
    from strat_backtest_spark.operators.optimize import (
        _grid_rows,
        _sweep_partition_cols,
        evaluate_params,
    )

    spark = get_spark("r15-sweep", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    bars_all = _bars(spark, sf_dir)
    # synthetic long single-ticker series: the testdata tickers have
    # only ~29 bars each at sf0.1, far too small to expose kernel
    # serialization; a real single-ticker backtest has decades of bars
    n_bars = int(os.environ.get("R15_BARS", "150000"))
    bars_1t = (
        spark.range(n_bars)
        .select(
            F.lit("X").alias("ticker"),
            F.date_add(F.lit("2000-01-01").cast("date"), F.col("id").cast("int")).alias("date"),
            (
                100.0
                + 10.0 * F.sin(F.col("id") / 17.0)
                + (F.pmod(F.xxhash64("id"), F.lit(100)) / 50.0)
            ).alias("close"),
        )
        .localCheckpoint(eager=True)
    )

    rows51 = _grid_rows((3, 54, 1), (60, 61, 1))
    assert len(rows51) == 51, len(rows51)

    print("decision single-ticker 51 runs:",
          _sweep_partition_cols(bars_1t, len(rows51)), flush=True)
    print("decision 1500-ticker 4 runs:",
          _sweep_partition_cols(bars_all, 4), flush=True)

    def timed(tag, pcols):
        best = None
        for i in range(3):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{tag} #{i}")
            t0 = time.time()
            force(
                evaluate_params(
                    bars_1t, rows51, 10_000.0,
                    materialize=False, partition_cols=pcols,
                )
            )
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{tag}: best={best:.3f}s", flush=True)
        return best

    # interleaved A/B
    for _ in range(2):
        timed("51pt single-ticker OLD ticker-only", ("ticker",))
        timed("51pt single-ticker NEW adaptive", None)

    # kernel task spread check: count output partitions with rows
    from strat_backtest_spark.operators.kernel import run_kernel
    from strat_backtest_spark.operators.signals import ma_cross_feed_grid

    feed = ma_cross_feed_grid(bars_1t, rows51)
    for tag, pcols in [("old", ("ticker",)), ("new", ("ticker", "run_id"))]:
        ko = run_kernel(feed, 10_000.0, partition_cols=pcols)
        parts = (
            ko.select(F.spark_partition_id().alias("p"))
            .groupBy("p").count().collect()
        )
        print(f"kernel output partitions with rows ({tag}): {len(parts)}",
              flush=True)


if __name__ == "__main__":
    main()
