"""Scale rung for the as-of join (q32): most-recent-order-per-event.

Corpus = sf0.1 events (100k) and orders (150k) replicated REPLICAS
times with a user-id offset (replica r: user/custkey += r * 15000,
event_id/orderkey += r * 10**7) — users stay disjoint across replicas,
so per-user row counts (the quantity that bounds the window sort) are
unchanged while total volume scales. Timestamps untouched. Runs the
CATALOG q32 entry against the corpus dir — the exact gate code path
(union both streams, ONE shuffle+sort per user, last(ignorenulls)
forward fill; linear, no event x orders fan-out). Prints one JSON
line and deletes the corpus.

    python probes/asof_rung.py [REPLICAS]
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
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    out = {
        "replicas": replicas,
        "events": 100_000 * replicas,
        "orders": 150_000 * replicas,
    }

    corpus = f"/tmp/asof_rung_{replicas}x"
    t0 = time.time()
    r = spark.range(replicas).withColumnRenamed("id", "r")
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    (
        ev.crossJoin(r)
        .select(
            (F.col("event_id") + F.col("r") * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("r") * 15_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{corpus}/events.parquet")
    )
    od = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    (
        od.crossJoin(r)
        .select(
            (F.col("o_orderkey") + F.col("r") * 10_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("r") * 15_000).alias("o_custkey"),
            *[c for c in od.columns if c not in ("o_orderkey", "o_custkey")],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{corpus}/orders.parquet")
    )
    out["corpus_build_s"] = round(time.time() - t0, 1)

    from strat_backtest_spark.plans.catalog import CATALOG

    t0 = time.time()
    res = CATALOG["q32_asof_join"].fn(spark, corpus)
    out["matched_events"] = res.count()
    out["asof_s"] = round(time.time() - t0, 1)
    shutil.rmtree(corpus, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
