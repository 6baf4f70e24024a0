"""Round-15: attribute the single-ticker 51-point sweep's wall between
the feed build (per-ticker window stage) and the kernel walk.

Times, on a synthetic 150k-bar single ticker:
  A. SMA-only window pass (distinct lengths)          — serial floor
  B. full feed (SMAs + per-run cross/lag + explode)   — current shape
  C. feed + kernel, adaptive keying                   — the whole sweep

Usage: PYTHONPATH=/root/repo python probes/r15_feed_split.py
"""

from __future__ import annotations

import os
import time


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from strat_backtest_spark.session import get_spark
    from strat_backtest_spark.operators.optimize import _grid_rows, evaluate_params
    from strat_backtest_spark.operators.signals import ma_cross_feed_grid
    from strat_backtest_spark.functions.windows import rolling_mean_sql

    spark = get_spark("r15-feed-split", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    n_bars = int(os.environ.get("R15_BARS", "150000"))
    bars = (
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
    rows = _grid_rows((3, 54, 1), (60, 61, 1))
    lengths = sorted({f for _, f, _ in rows} | {l for _, _, l in rows})

    def timed(tag, build):
        best = None
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{tag} #{i}")
            t0 = time.time()
            force(build())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{tag}: best={best:.3f}s", flush=True)

    timed("A sma-only", lambda: bars.selectExpr(
        "ticker", "date", "close",
        *[f"{rolling_mean_sql('close', n)} AS __sma_{n}" for n in lengths],
    ))
    timed("B full feed", lambda: ma_cross_feed_grid(bars, rows))
    timed("C feed+kernel adaptive", lambda: evaluate_params(
        bars, rows, 10_000.0, materialize=False))


if __name__ == "__main__":
    main()
