"""Round-15 optimization: capture .explain("formatted") for headline
queries into plans/r15/<query>_<tag>.txt (tag = before/after).

Usage: python probes/r15_capture_plans.py <tag> [query ...]
Defaults to every bench.py HEADLINE query.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from strat_backtest_spark.session import get_spark
    from strat_backtest_spark.plans.catalog import CATALOG
    import bench

    names = sys.argv[2:] or bench.HEADLINE
    spark = get_spark("r15-plans", cpus=cpus)
    os.makedirs("plans/r15", exist_ok=True)
    for name in names:
        df = CATALOG[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r15/{name}_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", flush=True)


if __name__ == "__main__":
    main()
