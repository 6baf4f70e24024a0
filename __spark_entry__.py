"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose
the operator catalog (strat_backtest_spark/plans/catalog.py) for the
DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full multi-ticker MA-cross backtest on synthetic bars
    derived from /root/testdata/sf0.001 events — signal windows →
    applyInPandas order kernel → portfolio net-worth algebra."""
    from strat_backtest_spark.sources.bars import bars_from_events, load_testdata
    from strat_backtest_spark.plans.backtest import Backtest, MACrossStrategy

    tables = load_testdata(spark, "/root/testdata/sf0.001", "events")
    from pyspark.sql import functions as F

    ev = tables["events"]
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":  # TIMESTAMP(NANOS) drop read via nanosAsLong
        ev = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    elif ts_type == "timestamp_ntz":  # MICROS drop; session is UTC
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    bars = bars_from_events(ev)
    bt = Backtest(bars, initial_amount=10_000.0, strategy=MACrossStrategy(fast=3, lagging=8))
    return bt.final_net_worth()


# The correctness sweep evaluates at most ~50 catalog entries in
# registration order, so entries past the window never get a gate row.
# The catalog (100 entries) is larger than the window; rotate which
# entries sit past it. Rotation policy (codified round 8):
#   1. EVERY entry whose implementation (or a consumed operator)
#      changed this round stays IN the window.
#   2. NO entry goes more than 2 rounds ungated: an entry whose last
#      driver gate row is round N must be back in the window by
#      round N+3 at the latest.
#   3. The tail PREFERS untouched entries whose latest gate row is
#      the immediately previous round (at most 1 round stale when the
#      tail is formed). When new-entry pressure makes that impossible
#      (rule-1/new entries alone exceed the 50-entry head), an
#      untouched 2-rounds-stale entry may take a tail slot as long as
#      rule 2 still holds — flag it <round>-MANDATORY so the next
#      rotation returns it first. Head is exactly 50.
# Round-13 application. The six r12-MANDATORY seats (q03/q05/q07/
# q13/q15/q20, last gate-green r10, rule-2 deadline r13) RETURN to
# the head — the hard deadline honored for the second time. Rule-1
# (touched this round) keeps eight r12-head entries in the head;
# every r13 package diff and its catalog consumers:
#   - operators/dedup.py: connected_components (plan-scoped RDD-id
#     capture for round eviction — ADVICE r12 concurrency race) ->
#     q56 (direct), q68/q69 (compose q56's fn), q76 (direct); q70 is
#     kept in the head conservatively with its r12 siblings though
#     its entry is digest-distinct only (verified: no CC reference);
#     dedup_index_write/dedup_index_append (new ``partition``
#     overwrite-by-chunk layout) and dedup_incremental (new
#     ``exclude_index_ids`` replay guard) -> q93 (direct), q96 (via
#     streaming_incremental_dedup), q100 (via the curation loop);
#   - streaming/documents_stream.py: streaming_curation_loop
#     (at-least-once micro-batch: verdicts commit BEFORE the index
#     append, both overwrite-by-chunk, probe self-exclusion via
#     chunk-partition prune, fail_after failpoint — r12 verdict
#     item 2; DISK_ONLY scrub checkpoint — the 50M OOM fix) -> q100;
#   - operators/dedup.py LATE in the round: decontaminate gained the
#     persisted-benchmark_hashes path (benchmark_shingle_hashes
#     artifact) -> q60 (direct) and q69 (already head).
# 6 returning + 9 touched = 15 head seats; the remaining 35 go to
# the r11 tail's 44 entries returning for their rule-2 r14 deadline.
# The nine that did not fit — q06/q09/q19/q32/q33/q34/q35/q52/q53,
# chosen as the most change-stable shapes (pure catalog.py /
# functions/windows.py code, zero diffs since r7) — are flagged
# r13-MANDATORY below per rule 3 and MUST return in round 14 (rule-2
# deadline: last green r11 + 3). The 41 vacated r12-head seats in
# the tail are all function-level untouched this round (the diff
# list above is exhaustive — verify with git diff r12..HEAD on the
# package) and at most 1 round stale, rule 3's preferred tail.
_SWEEP_TAIL = [
    # --- 41 all-true r12, function-level untouched r13 ---
    "q01_pricing_summary",
    "q02_regional_revenue",
    "q04_orders_with_bigticket_items",
    "q08_running_totals",
    "q10_forward_fill",
    "q11_tail_n",
    "q12_trailing_period",
    "q14_distinct",
    "q16_nations_without_suppliers",
    "q17_signal_edges",
    "q18_compound_range_predicate",
    "q21_dedup_exact",
    "q26_token_counts",
    "q30_cosine_topk",
    "q38_multimodal_features",
    "q44_common_stock_mentions",
    "q47_embedding_neardup",
    "q51_ivf_topk",
    "q54_stratified_sample",
    "q55_curation_pipeline",
    "q57_kmv_distinct_users",
    "q62_token_quantiles",
    "q66_chunking",
    "q67_embedding_profile",
    "q74_pii_scrub",
    "q77_line_dedup",
    "q78_stream_pii_scrub",
    "q79_pack_sequences",
    "q80_shard_shuffle",
    "q81_tfidf_topk",
    "q82_quantize_embeddings",
    "q83_unigram_logprob",
    "q84_split_assign",
    "q85_quota_sample",
    "q86_ngram_topk",
    "q87_bigram_logprob",
    "q89_profile_columns",
    "q94_image_neardup",
    "q95_audio_neardup",
    "q97_ivf_persisted_topk",
    "q99_ivf_index_append",
    # --- 9 all-true r11 — r13-MANDATORY: return in r14 (rule-2
    # deadline r11+3); most change-stable shapes, zero diffs since r7
    "q06_rolling_mean",
    "q09_cumprod",
    "q19_string_predicates",
    "q32_asof_join",
    "q33_rollup_revenue",
    "q34_pivot_event_matrix",
    "q35_sessionization",
    "q52_range_join",
    "q53_resample_ohlc",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from strat_backtest_spark.plans.catalog import CATALOG

    head = {n: qd.fn for n, qd in CATALOG.items() if n not in _SWEEP_TAIL}
    tail = {n: CATALOG[n].fn for n in _SWEEP_TAIL if n in CATALOG}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    from strat_backtest_spark.plans.catalog import CATALOG

    # The driver runs oracle SQL against sf0.01 views; data-dependent
    # oracle_builders (q46) must be instantiated for that same data.
    gate_sf = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
    out = {}
    for name, qd in CATALOG.items():
        try:
            sql = qd.oracle_for(gate_sf)
        except Exception as exc:  # noqa: BLE001
            # A builder failure must not take down the whole gate —
            # the entry degrades to the rows-only check — but a
            # silently degraded oracle is invisible in gate logs, so
            # shout about it on stderr (ADVICE r7).
            import sys
            import traceback

            print(
                f"[oracle_sql] WARNING: oracle builder for {name!r} raised "
                f"{type(exc).__name__}: {exc} — entry degrades to rows-only check",
                file=sys.stderr,
            )
            traceback.print_exc(file=sys.stderr)
            sql = None
        if sql is not None:
            out[name] = sql
    return out
