"""Round-15 optimization: time individual headline queries with the
bench methodology (noop sink, warm-up run, best-of-N) without running
the whole suite.

Usage: python probes/r15_time_query.py q42_backtest_metrics [q41_...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, R15_RUNS (default 3).
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("R15_RUNS", "3"))

    from strat_backtest_spark.session import get_spark
    from strat_backtest_spark.plans.catalog import CATALOG

    spark = get_spark("r15-time", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in sys.argv[1:]:
        qd = CATALOG[name]
        spark.sparkContext.setJobDescription(f"warmup {name}")
        force(qd.fn(spark, sf_dir))
        runs = []
        for i in range(n_runs):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"timed {name} #{i}")
            t0 = time.time()
            force(qd.fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        print(f"{name}: best={min(runs)} samples={runs}", flush=True)


if __name__ == "__main__":
    main()
