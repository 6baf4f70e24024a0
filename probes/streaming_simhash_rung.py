"""Scale rung for the streaming simhash near-dup admission operator
(q91 / streaming/documents_stream.streaming_simhash_neardup).

Builds a deterministic replicated corpus from /root/testdata/sf0.1
documents (5,000 docs x REPLICAS), runs the streaming operator with
phase timers, and prints one JSON line:

  corpus-build  — write the replicated corpus parquet (not engine cost)
  replay-write  — the operator's chunked-replay file writes
  stream-drain  — micro-batch execution: simhash mapInPandas + banding
                  + applyInPandasWithState + foreachBatch parquet sink
  post-agg      — the batch novel = AND-over-bands reduction + count

Corpus construction (documented for the BASELINE rung row): replica r
of doc d gets doc_id = d + 5000*r and text = text || ' rep<r % 100>'
— a one-token word jitter so replicas are near-duplicates (Hamming-
close simhashes), the regime this operator exists for. Run:

    python probes/streaming_simhash_rung.py [REPLICAS]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from strat_backtest_spark.session import get_spark  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_chunks = 3
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    out = {"replicas": replicas, "docs": 5000 * replicas, "n_chunks": n_chunks, "files_per_chunk": 24}

    t0 = time.time()
    corpus_dir = f"/tmp/docs_stream_rung_{replicas}x"
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    (
        base.crossJoin(
            spark.range(replicas).withColumnRenamed("id", "r")
        )
        .select(
            (F.col("doc_id") + F.col("r") * 5000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" rep"), (F.col("r") % 100).cast("string")
            ).alias("text"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(corpus_dir)
    )
    out["corpus_build_s"] = round(time.time() - t0, 1)

    # Time the EXACT production code path: the operator's stages are
    # the shared builders (simhash_claim_verdicts / novel_from_verdicts
    # in streaming/documents_stream.py), called here with phase timers
    # around each — no probe-local copy of operator logic.
    import shutil

    from strat_backtest_spark.streaming.documents_stream import (
        _chunked_replay,
        _drain_to_parquet,
        novel_from_verdicts,
        simhash_claim_verdicts,
    )

    static = spark.read.parquet(corpus_dir)
    t0 = time.time()
    stream, replay_dir = _chunked_replay(spark, static, n_chunks, files_per_chunk=24)
    out["replay_write_s"] = round(time.time() - t0, 1)

    verdicts = simhash_claim_verdicts(stream, bits=32, bands=4)
    t0 = time.time()
    drained = _drain_to_parquet(verdicts, spark, "append")
    out["stream_drain_s"] = round(time.time() - t0, 1)
    shutil.rmtree(replay_dir, ignore_errors=True)

    t0 = time.time()
    agg = (
        novel_from_verdicts(drained)
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("novel").alias("novel_docs"))
        .collect()[0]
    )
    out["post_agg_s"] = round(time.time() - t0, 1)
    out["verdict_docs"] = agg["docs"]
    out["novel_docs"] = agg["novel_docs"]
    shutil.rmtree(corpus_dir, ignore_errors=True)
    out["engine_s"] = round(
        out["replay_write_s"] + out["stream_drain_s"] + out["post_agg_s"], 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
