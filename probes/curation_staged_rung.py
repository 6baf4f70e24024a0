"""Staged execution of q69's composed curation chain (r12 verdict
item 4): the decade-6 (100M-doc) single-plan run died on SHUFFLE
SCRATCH capacity — the box's ~80 GB of free disk vs the chain's
cumulative shuffle files across 5 stages (knee #3, diagnosed as
executor count / scratch capacity, not plan shape). This probe is the
receipt for that diagnosis: split the chain at its natural stage
boundaries into SEPARATE Spark sessions, materializing slim parquet
intermediates between them, so each stage's shuffle scratch frees when
its context stops (DiskBlockManager removes the local dirs) before the
next stage starts. If the same corpus that OOM-killed the one-plan
chain completes staged, "capacity, not plan" is measured, not argued —
and the per-stage disk high-water numbers quantify the scratch law a
cluster operator would size executors-with-local-disk by.

Stage boundaries (post-pairs and post-CC, exactly where the verdict
suggested) and what crosses them:

  corpus  -> documents.parquet          (built once, --keep reusable)
  pairs   : q23 LSH banding over text   -> pairs.parquet  (id_a, id_b)
  cc      : connected_components(pairs) -> components.parquet (id, component)
  apply   : q68 anti-join + decontaminate + chunk_documents -> count

The apply stage re-reads the corpus but only slim ids cross from the
earlier stages — the same artifact shape (doc ids, not text) the
one-plan chain shuffles, now parquet instead of shuffle files.

Each stage samples statvfs free-space every 5 s on a daemon thread;
"hw_used_gb" is the stage's high-water disk draw over its start point.

    python probes/curation_staged_rung.py [REPLICAS] [--block-mib 16]
    python probes/curation_staged_rung.py --stage pairs ...   # one stage
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
# Python WORKERS need the package too (they unpickle engine closures);
# must be in the env before the JVM starts so executors inherit it
os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")

SCRATCH = "/tmp/staged_chain"


def parse_args(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("replicas", nargs="?", type=int, default=20000)
    ap.add_argument("--block-mib", type=int, default=16)
    ap.add_argument("--stage", choices=["corpus", "pairs", "cc", "apply", "all"],
                    default="all")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--keep", action="store_true",
                    help="keep corpus + intermediates after the apply stage")
    return ap.parse_args(argv)


class DiskWatch:
    """min-free sampler: captures the stage's scratch high-water mark."""

    def __init__(self, path="/tmp"):
        self.path, self.min_free, self.stop = path, None, False
        self._start_free = self._free()
        t = threading.Thread(target=self._run, daemon=True)
        t.start()

    def _free(self):
        st = os.statvfs(self.path)
        return st.f_bavail * st.f_frsize

    def _run(self):
        while not self.stop:
            f = self._free()
            if self.min_free is None or f < self.min_free:
                self.min_free = f
            time.sleep(5)

    def report(self):
        self.stop = True
        f = self._free()
        if self.min_free is None or f < self.min_free:
            self.min_free = f
        return {
            "start_free_gb": round(self._start_free / 1e9, 1),
            "min_free_gb": round(self.min_free / 1e9, 1),
            "hw_used_gb": round((self._start_free - self.min_free) / 1e9, 1),
            "end_free_gb": round(f / 1e9, 1),
        }


def corpus_dir(ns):
    return f"/tmp/docs_rung_{ns.replicas}x"


def stage_corpus(ns, spark):
    from _corpus import assert_family_construction, build_family_corpus

    build_family_corpus(
        spark, ns.replicas, corpus_dir(ns),
        extra_cols=("lang", "source"), with_n_chars=True,
        n_files=64, block_size_mib=ns.block_mib,
    )
    assert_family_construction(spark, corpus_dir(ns))
    return {}


def stage_pairs(ns, spark):
    from strat_backtest_spark.plans.catalog import CATALOG

    pairs = CATALOG["q23_minhash_lsh_pairs"].fn(spark, corpus_dir(ns))
    pairs.write.mode("overwrite").parquet(f"{SCRATCH}/pairs.parquet")
    n = spark.read.parquet(f"{SCRATCH}/pairs.parquet").count()
    return {"pairs_rows": n}


def stage_cc(ns, spark):
    from strat_backtest_spark.operators.dedup import connected_components

    pairs = spark.read.parquet(f"{SCRATCH}/pairs.parquet")
    cc = connected_components(pairs)
    cc.write.mode("overwrite").parquet(f"{SCRATCH}/components.parquet")
    n = spark.read.parquet(f"{SCRATCH}/components.parquet").count()
    return {"cc_rows": n}


def stage_apply(ns, spark):
    # q69's tail with the CC intermediate injected: identical operator
    # composition (plans/catalog_pipeline.q69_curation_end_to_end),
    # reading (id, component) from parquet instead of the live plan
    from pyspark.sql import functions as F

    from strat_backtest_spark.operators.dedup import decontaminate
    from strat_backtest_spark.operators.text_analysis import chunk_documents

    docs = spark.read.parquet(f"{corpus_dir(ns)}/documents.parquet")
    cc = spark.read.parquet(f"{SCRATCH}/components.parquet")
    removed = cc.filter(F.col("component") != F.col("id")).select(
        F.col("id").alias("doc_id")
    )
    surv = docs.join(removed, "doc_id", "left_anti")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    contaminated = decontaminate(docs, bench, n=3, threshold=0.5).select("doc_id")
    kept = surv.join(contaminated, "doc_id", "left_anti")
    chunks = chunk_documents(kept, chunk_tokens=64, overlap=16).select(
        "doc_id", "chunk_id", "n_tokens"
    )
    return {"chunk_rows": chunks.count()}


STAGES = {"corpus": stage_corpus, "pairs": stage_pairs,
          "cc": stage_cc, "apply": stage_apply}


def run_one(ns) -> None:
    from strat_backtest_spark.session import get_spark

    os.makedirs(SCRATCH, exist_ok=True)
    watch = DiskWatch()
    spark = get_spark(cpus=ns.cpus)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    t0 = time.time()
    extra = STAGES[ns.stage](ns, spark)
    out = {"stage": ns.stage, "wall_s": round(time.time() - t0, 1), **extra}
    spark.stop()
    out["disk"] = watch.report()
    print(json.dumps(out), flush=True)


def main() -> None:
    ns = parse_args(sys.argv[1:])
    if ns.stage != "all":
        run_one(ns)
        return
    results = []
    for st in ["corpus", "pairs", "cc", "apply"]:
        # one PROCESS per stage: JVM exit is the hard guarantee that
        # the stage's spark-local scratch is gone before the next starts
        cmd = [sys.executable, __file__, str(ns.replicas),
               "--stage", st, "--block-mib", str(ns.block_mib),
               "--cpus", str(ns.cpus)]
        p = subprocess.run(cmd, capture_output=True, text=True)
        line = (p.stdout.strip().splitlines() or ["{}"])[-1]
        print(f"# {st}: {line}", file=sys.stderr, flush=True)
        if p.returncode != 0:
            print(json.dumps({"failed_stage": st, "rc": p.returncode,
                              "stderr_tail": p.stderr[-2000:],
                              "stages": results}))
            sys.exit(1)
        results.append(json.loads(line))
    total = round(sum(r["wall_s"] for r in results), 1)
    if not ns.keep:
        shutil.rmtree(corpus_dir(ns), ignore_errors=True)
        shutil.rmtree(SCRATCH, ignore_errors=True)
    print(json.dumps({"replicas": ns.replicas, "docs": 5000 * ns.replicas,
                      "block_mib": ns.block_mib, "total_wall_s": total,
                      "stages": results}))


if __name__ == "__main__":
    main()
