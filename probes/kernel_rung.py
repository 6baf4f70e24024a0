"""Kernel scale rung: full backtest family over REPLICAS x 1,500
tickers, WITH the DuckDB recursive-CTE oracle hash receipt at rung
scale (the property that distinguishes these rungs from plain timing:
the sequential kernel is value-gated at every decade).

Corpus = sf0.1 events replicated with a user offset (disjoint tickers,
per-ticker bar count unchanged) and a 0.3%/replica value scale (so
replica kernels genuinely diverge), 64-file layout. q40 (full backtest
finals), q41 (4-point grid = 4x tickers simulations), q72 (stop-loss
heap path) run as their CATALOG entries, noop-write forced (timing
protocol: no driver collect — r8's 150k rows stated collect-included,
so compare shapes, not absolutes). Then each entry's oracle SQL is
built for the corpus dir and hash-compared via the gate's own
comparator. Corpus deleted after. Prints one JSON line.

    python probes/kernel_rung.py [REPLICAS] [--no-oracle]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from strat_backtest_spark.session import get_spark  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 334
    do_oracle = "--no-oracle" not in sys.argv
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    out = {"replicas": replicas, "tickers": 1500 * replicas,
           "events": 100_000 * replicas}
    corpus = f"/tmp/kernel_rung_{replicas}x"

    import os

    if "--reuse" in sys.argv and os.path.exists(f"{corpus}/events.parquet"):
        out["corpus_build_s"] = 0.0
    else:
        t0 = time.time()
        ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
        rep = ev.crossJoin(spark.range(replicas).withColumnRenamed("id", "r"))
        (
            rep.select(
                (F.col("event_id") + F.col("r") * 1_000_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + F.col("r") * 100_000).alias("user_id"),
                "event_type",
                (F.col("value") * (1 + 0.003 * F.col("r"))).alias("value"),
                "props",
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(f"{corpus}/events.parquet")
        )
        out["corpus_build_s"] = round(time.time() - t0, 1)

    from strat_backtest_spark.plans.catalog import CATALOG

    for name, key in [
        ("q40_backtest_networth", "q40"),
        ("q41_grid_search", "q41"),
        ("q72_stoploss_networth", "q72"),
    ]:
        t = time.time()
        CATALOG[name].fn(spark, corpus).write.format("noop").mode(
            "overwrite"
        ).save()
        out[key + "_s"] = round(time.time() - t, 1)
        print(json.dumps({key: out[key + "_s"]}), file=sys.stderr, flush=True)

    if do_oracle:
        import duckdb

        from tests.oracle_utils import compare

        # the rung corpus holds only events; the kernel oracles need
        # nothing else, so register just that view. Spill + memory
        # settings: the q72 stop-loss recursion OOM'd DuckDB's default
        # allocation budget at 33.4M rows (the recursion's order-table
        # working set), so give it an explicit limit and a temp dir.
        con = duckdb.connect()
        con.execute("SET memory_limit='100GB'")
        con.execute("SET temp_directory='/tmp/duck_spill'")
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{corpus}/events.parquet/*.parquet')"
        )
        for name, key in [
            ("q40_backtest_networth", "q40"),
            ("q41_grid_search", "q41"),
            ("q72_stoploss_networth", "q72"),
        ]:
            t = time.time()
            try:
                res = compare(
                    CATALOG[name].fn(spark, corpus),
                    con,
                    CATALOG[name].oracle_for(corpus),
                    name,
                )
                out[key + "_oracle_ok"] = bool(res["ok"])
            except Exception as exc:  # noqa: BLE001 — record, keep going
                out[key + "_oracle_ok"] = None
                out[key + "_oracle_err"] = f"{type(exc).__name__}: {exc}"[:200]
            out[key + "_oracle_s"] = round(time.time() - t, 1)
            print(json.dumps({key + "_oracle": out[key + "_oracle_ok"],
                              "s": out[key + "_oracle_s"],
                              "err": out.get(key + "_oracle_err", "")}),
                  file=sys.stderr, flush=True)

    if "--keep" not in sys.argv:
        shutil.rmtree(corpus, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
