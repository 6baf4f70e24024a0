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
# The catalog (92 entries) is larger than the window; rotate which
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
# Round-9 application (round 9 is where rule 2 first bound): ALL 41
# round-8 tail entries return to the window — q14_distinct
# (r9-MANDATORY, last gate row r06) plus the 40 entries hash-green in
# r07 — so after r9 no entry's latest green row is older than the
# previous round. They are joined by the entries touched this round:
# q92 (NEW exact-substring dedup — never gated), q75 (blocked-exchange
# dup-n-gram rewrite), q52 (asof_lookup null-build filter + exact
# floor-div segment index, ADVICE r8), q90/q91 (documents_stream.py:
# quota-admission stage extraction, replay empty-input guard, argmin
# bucket claim), q50 (multimodal.py gained the real PNG/WAV decoders;
# the catalog path uses the fake decoder but the file changed), and
# the similarity family touched by the probed-bucket prune and
# ann_topk's max_bucket cap (q31 ann_topk, q51 ivf_topk, q88
# ann_recall — which composes both). q38 (also multimodal) is in the
# mandatory 41 already. The dedup.py co-residents q21/q56/q77 take
# the freed tail slots: their own functions (exact_dedup,
# connected_components, line_dedup) have ZERO r9 diffs — dedup.py's
# r9 changes are confined to dup_ngram_stats, _py_shingle_occurrences,
# and the new substring_dedup (verifiable: git diff ba23cc1..HEAD --
# strat_backtest_spark/operators/dedup.py) — the r8 kernel-family
# precedent applied at function granularity. Head is exactly 50; the
# tail is 42 entries, every one all-true in CORRECTNESS_r08 and
# function-level untouched this round (at most 1 round stale when the
# tail was formed — rule 3 satisfied with no exceptions).
_SWEEP_TAIL = [
    "q03_top_customers",          # all-true r08, untouched r9
    "q05_status_totals",          # all-true r08, untouched r9
    "q07_pct_change",             # all-true r08, untouched r9
    "q08_running_totals",         # all-true r08, untouched r9
    "q10_forward_fill",           # all-true r08, untouched r9
    "q11_tail_n",                 # all-true r08, untouched r9
    "q12_trailing_period",        # all-true r08, untouched r9
    "q13_first_last",             # all-true r08, untouched r9
    "q15_union_nations",          # all-true r08, untouched r9
    "q16_nations_without_suppliers",  # all-true r08, untouched r9
    "q17_signal_edges",           # all-true r08, untouched r9
    "q20_json_props",             # all-true r08, untouched r9
    "q26_token_counts",           # all-true r08, untouched r9
    "q30_cosine_topk",            # all-true r08, untouched r9
    "q21_dedup_exact",            # all-true r08; exact_dedup has zero r9 diffs
    "q56_dedup_components",       # all-true r08; connected_components zero r9 diffs
    "q77_line_dedup",             # all-true r08; line_dedup zero r9 diffs
    "q44_common_stock_mentions",  # all-true r08, untouched r9
    "q47_embedding_neardup",      # all-true r08, untouched r9
    "q54_stratified_sample",      # all-true r08, untouched r9
    "q55_curation_pipeline",      # all-true r08, untouched r9
    "q57_kmv_distinct_users",     # all-true r08, untouched r9
    "q60_decontaminate",          # all-true r08, untouched r9
    "q62_token_quantiles",        # all-true r08, untouched r9
    "q66_chunking",               # all-true r08, untouched r9
    "q67_embedding_profile",      # all-true r08, untouched r9
    "q68_dedup_apply",            # all-true r08, untouched r9
    "q69_curation_end_to_end",    # all-true r08, untouched r9
    "q70_dup_rate_by_source",     # all-true r08, untouched r9
    "q74_pii_scrub",              # all-true r08, untouched r9
    "q76_semantic_dedup_apply",   # all-true r08, untouched r9
    "q78_stream_pii_scrub",       # all-true r08, untouched r9
    "q79_pack_sequences",         # all-true r08, untouched r9
    "q80_shard_shuffle",          # all-true r08, untouched r9
    "q81_tfidf_topk",             # all-true r08, untouched r9
    "q82_quantize_embeddings",    # all-true r08, untouched r9
    "q83_unigram_logprob",        # all-true r08, untouched r9
    "q84_split_assign",           # all-true r08, untouched r9
    "q85_quota_sample",           # all-true r08, untouched r9
    "q86_ngram_topk",             # all-true r08, untouched r9
    "q87_bigram_logprob",         # all-true r08, untouched r9
    "q89_profile_columns",        # all-true r08, untouched r9
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
