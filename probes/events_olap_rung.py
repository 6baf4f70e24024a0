"""Scale rung for the events OLAP family: sessionization (q35),
pivot event matrix (q34), and the bucketed range join (q52) at
replicated-event scale.

Corpus = the same user-disjoint replication as probes/asof_rung.py
(events only). Runs the CATALOG entries
against the corpus dir — identical code paths to the gate. Prints one
JSON line and deletes the corpus.

    python probes/events_olap_rung.py [REPLICAS]
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
    out = {"replicas": replicas, "events": 100_000 * replicas}

    corpus = f"/tmp/events_rung_{replicas}x"
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
    out["corpus_build_s"] = round(time.time() - t0, 1)

    from strat_backtest_spark.plans.catalog import CATALOG

    def run(name: str, key: str) -> None:
        t = time.time()
        df = CATALOG[name].fn(spark, corpus)
        out[key + "_rows"] = df.count()
        out[key + "_s"] = round(time.time() - t, 1)
        print(json.dumps({key: out[key + "_s"], "rows": out[key + "_rows"]}),
              file=sys.stderr, flush=True)

    run("q35_sessionization", "sessionize")
    run("q34_pivot_event_matrix", "pivot")
    run("q52_range_join", "range_join")
    print(json.dumps(out))
    shutil.rmtree(corpus, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
