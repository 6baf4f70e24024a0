"""Round-15: stage-level attribution for q23/q56 — where does the
banding-checkpoint query actually spend its time?

Runs the query once (warm), then once timed, and dumps every job's
stages with submission/completion wall, task counts and executor run
time from the status REST API.

Usage: PYTHONPATH=/root/repo python probes/r15_q23_profile.py q23_minhash_lsh_pairs
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    name = sys.argv[1] if len(sys.argv) > 1 else "q23_minhash_lsh_pairs"

    os.environ["SPARK_GRAFT_UI"] = "1"  # if session honors it; else ignored

    from strat_backtest_spark.session import get_spark
    from strat_backtest_spark.plans.catalog import CATALOG

    spark = get_spark("r15-q23-profile", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    qd = CATALOG[name]
    force(qd.fn(spark, sf_dir))  # warm-up

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before_jobs = set(tracker.getJobIdsForGroup() or [])

    spark.catalog.clearCache()
    sc._jvm.System.gc()
    t0 = time.time()
    force(qd.fn(spark, sf_dir))
    wall = time.time() - t0
    print(f"{name}: timed wall = {wall:.3f}s", flush=True)

    # Pull job/stage data via the JVM status store (no UI REST needed)
    jstore = sc._jvm.org.apache.spark.status.api.v1
    app_id = sc.applicationId
    # use the AppStatusStore through the SparkContext's statusStore
    store = sc._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    it = jobs.iterator()
    rows = []
    while it.hasNext():
        j = it.next()
        jid = j.jobId()
        if jid in before_jobs:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        rows.append((jid, j.name()[:60], dur, j.numTasks()))
    rows.sort()
    print("\njobs (id, name, wall_s, tasks):")
    for r in rows:
        print(f"  {r[0]:>4} {r[2] if r[2] is not None else '?':>7} {r[3]:>5}  {r[1]}")

    # gap attribution: time between consecutive job windows is driver
    # work (planning, analysis, AQE re-optimization, py4j)
    spans = []
    it2 = jobs.iterator()
    while it2.hasNext():
        j = it2.next()
        jid = j.jobId()
        if jid in before_jobs:
            continue
        sub, comp = j.submissionTime(), j.completionTime()
        if sub.isDefined() and comp.isDefined():
            spans.append((sub.get().getTime(), comp.get().getTime()))
    spans.sort()
    in_jobs = sum(e - s for s, e in spans) / 1000.0
    gaps = 0.0
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        gaps += max(0, s2 - e1) / 1000.0
    print(f"\nwall={wall:.3f}s  in-jobs={in_jobs:.3f}s  inter-job gaps={gaps:.3f}s"
          f"  pre-first-job={(spans[0][0]/1000.0 - t0):.3f}s" if spans else "no jobs")


if __name__ == "__main__":
    main()
