"""Round-15: count py4j round-trips and wall time of PLAN CONSTRUCTION
(no execution) for a catalog query — the driver-side cost the bench
legitimately times inside fn().

Usage: python probes/r15_py4j_profile.py q42_backtest_metrics [more...]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from strat_backtest_spark.session import get_spark
    from strat_backtest_spark.plans.catalog import CATALOG

    spark = get_spark("r15-py4j", cpus=cpus)
    spark.range(10).collect()

    for name in sys.argv[1:]:
        qd = CATALOG[name]
        qd.fn(spark, sf_dir)  # warm (_t memo, imports)
        spark.catalog.clearCache()
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        qd.fn(spark, sf_dir)
        pr.disable()
        dt = time.time() - t0
        st = pstats.Stats(pr)
        send = [
            (k, v)
            for k, v in st.stats.items()
            if "java_gateway" in k[0] and k[2] == "send_command"
        ]
        n_send = sum(v[0] for _, v in send)
        print(f"{name}: construct={dt:.3f}s py4j send_command={n_send}", flush=True)


if __name__ == "__main__":
    main()
