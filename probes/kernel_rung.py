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

    python probes/kernel_rung.py [REPLICAS] [--no-oracle] [--only qNN]
        [--shard-q72 N]

``--shard-q72 N`` closes the r9 comparator boundary: DuckDB's q72
order-table recursion OOMs between 10M and 15M events (the recursion's
working set cannot spill), but the simulation is per-ticker
independent, so the oracle is run N times over disjoint ticker shards
(``user_id % N = i`` pushed into the events VIEW itself — a WHERE on
the recursive CTE's output would not shrink the working set) against
the engine result filtered to the same shard, each shard through the
gate's own comparator; the receipt is the AND of the shard verdicts.
``--only`` restricts the timing+oracle loop to one entry.
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
    only = sys.argv[sys.argv.index("--only") + 1] if "--only" in sys.argv else None
    shard_q72 = (
        int(sys.argv[sys.argv.index("--shard-q72") + 1])
        if "--shard-q72" in sys.argv
        else 0
    )
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

    entries = [
        ("q40_backtest_networth", "q40"),
        ("q41_grid_search", "q41"),
        ("q72_stoploss_networth", "q72"),
    ]
    if only:
        entries = [(n, k) for n, k in entries if k == only]

    for name, key in entries:
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
        for name, key in entries:
            if key == "q72" and shard_q72 > 1:
                # per-ticker-shard oracle runs: shrink the RECURSION's
                # working set by filtering the view, not the output
                shard_ok, shard_s = [], []
                for i in range(shard_q72):
                    ts = time.time()
                    scon = duckdb.connect()  # fresh budget per shard
                    scon.execute("SET memory_limit='100GB'")
                    scon.execute("SET temp_directory='/tmp/duck_spill'")
                    scon.execute(
                        "CREATE VIEW events AS SELECT * FROM "
                        f"read_parquet('{corpus}/events.parquet/*.parquet') "
                        f"WHERE user_id % {shard_q72} = {i}"
                    )
                    eng = CATALOG[name].fn(spark, corpus).filter(
                        F.pmod(F.col("ticker").cast("long"), F.lit(shard_q72))
                        == i
                    )
                    try:
                        res = compare(
                            eng, scon, CATALOG[name].oracle_for(corpus), name
                        )
                        shard_ok.append(bool(res["ok"]))
                        if not res["ok"]:
                            out[f"q72_shard{i}_detail"] = res["detail"][:200]
                    except Exception as exc:  # noqa: BLE001
                        shard_ok.append(None)
                        out[f"q72_shard{i}_err"] = f"{type(exc).__name__}: {exc}"[:200]
                    finally:
                        scon.close()
                    shard_s.append(round(time.time() - ts, 1))
                    print(
                        json.dumps({"q72_shard": i, "ok": shard_ok[-1],
                                    "s": shard_s[-1]}),
                        file=sys.stderr, flush=True,
                    )
                out["q72_oracle_ok"] = all(v is True for v in shard_ok)
                out["q72_oracle_shards"] = shard_q72
                out["q72_oracle_shard_ok"] = shard_ok
                out["q72_oracle_s"] = round(sum(shard_s), 1)
                out["q72_oracle_shard_s"] = shard_s
                continue
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
