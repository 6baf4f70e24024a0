"""Round-15 (VERDICT item 6): what does the curation loop's per-batch
index listing actually cost, as a function of chunk count?

``dedup_incremental`` calls ``spark.read.parquet(index/digests)`` +
``(index/bands)`` once per micro-batch; each call lists the partition
tree and reads one footer for schema. The rungs run 3–6 chunks where
this is milliseconds; production accumulates chunks (one per
micro-batch), so measure the listing cost at 10 / 100 / 1000 chunks
directly instead of re-running a 30-minute rung.

Usage: PYTHONPATH=/root/repo python probes/r15_chunk_listing.py
"""

from __future__ import annotations

import os
import shutil
import time

ROOT = "/tmp/r15_chunk_listing"


def main() -> None:
    from pyspark.sql import functions as F

    from strat_backtest_spark.session import get_spark

    spark = get_spark("r15-chunk-listing", cpus="32")
    spark.range(10).collect()

    one = spark.range(100).select(
        F.md5(F.col("id").cast("string").cast("binary")).alias("text_hash"),
        F.col("id").alias("doc_id"),
    )

    for n_chunks in (10, 100, 1000):
        base = f"{ROOT}/{n_chunks}"
        shutil.rmtree(base, ignore_errors=True)
        for t in ("digests", "bands"):
            for c in range(n_chunks):
                one.coalesce(2).write.mode("overwrite").parquet(
                    f"{base}/{t}/chunk={c}"
                )
        # measure the per-batch pattern: fresh read (listing + schema)
        # + the chunk-prune filter + one action over the pruned scan
        for attempt in range(3):
            t0 = time.time()
            digs = spark.read.parquet(f"{base}/digests")
            bands = spark.read.parquet(f"{base}/bands")
            t_list = time.time() - t0
            t0 = time.time()
            n = (
                digs.filter(f"chunk != {n_chunks - 1}")
                .unionByName(bands.filter(f"chunk != {n_chunks - 1}"))
                .count()
            )
            t_q = time.time() - t0
            print(
                f"chunks={n_chunks:5d} attempt={attempt} "
                f"listing+schema={t_list:6.3f}s  pruned-count={t_q:6.3f}s  rows={n}",
                flush=True,
            )
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
