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
# Round-12 application. The five r11-MANDATORY seats (q01/q02/q04/
# q14/q18, last gate-green r9, rule-2 deadline r12) RETURN to the
# head — the hard deadline honored. Rule-1 (touched this round) keeps
# six r11-head entries in the head; every r12 package diff and its
# catalog consumers:
#   - operators/dedup.py: delta_probe_rows (caller-digest column
#     validation + checkpoint) -> q93/q96/q100; connected_components
#     (DISK_ONLY round checkpoints — the decade-6 100M-doc OOM fix)
#     -> q56/q68/q69/q70/q76, ALL of which hold head seats among the
#     returning r10-tail entries, so rule 1 is satisfied;
#   - streaming/documents_stream.py: streaming_curation_loop (cold-
#     restart params + single-checkpoint fold) and
#     curation_quota_counts_from_verdicts (left join + loud missing-
#     source failure) -> q100;
#   - operators/multimodal.py: decode_png (palette PLTE/tRNS decode;
#     chunk walk now collects PLTE/tRNS) -> q94 and, via the
#     real_decoder dispatch both entries inject, q95 (conservative:
#     its WAV payloads never reach decode_png, but the dispatcher's
#     callee changed); q38/q50 keep their deterministic-fake/inline
#     extractors and are NOT consumers (verified: no decode_png or
#     real_decoder reference in their entries);
#   - operators/similarity.py: _assigned_mean_dist (returns count),
#     ivf_index_write (sampled drift baseline default + min-sample
#     floor), ivf_index_drift (same floor) -> q99; q97 consumes only
#     untouched ivf_assign/ivf_probes/ivf_topk (verified by read).
# 5 returning + 6 touched = 11 head seats; the remaining 39 go to the
# r10 tail's 45 entries returning for their rule-2 r13 deadline. The
# six that did not fit — q03/q05/q07/q13/q15/q20, chosen as the most
# change-stable shapes (pure catalog.py / functions/windows.py code,
# zero diffs since r7) — are flagged r12-MANDATORY below per rule 3
# and MUST return in round 13 (rule 2 deadline: last green r10 + 3).
# The 44 vacated r11-head seats in the tail are all function-level
# untouched this round (the diff list above is exhaustive — verify
# with git diff r11..r12 on the package). Receipt beyond the window:
# a full local 100/100 oracle sweep on the final r12 code
# (BASELINE.md round-12 row).
_SWEEP_TAIL = [
    "q06_rolling_mean",  # all-true r11, untouched r12
    "q09_cumprod",  # all-true r11, untouched r12
    "q19_string_predicates",  # all-true r11, untouched r12
    "q22_minhash_signatures",  # all-true r11, untouched r12
    "q23_minhash_lsh_pairs",  # all-true r11, untouched r12
    "q24_simhash",  # all-true r11, untouched r12
    "q25_ngram_jaccard",  # all-true r11, untouched r12
    "q27_quality_score",  # all-true r11, untouched r12
    "q28_langid",  # all-true r11, untouched r12
    "q29_fingerprint",  # all-true r11, untouched r12
    "q31_ann_lsh_topk",  # all-true r11, untouched r12
    "q58_simhash_neardup",  # all-true r11, untouched r12
    "q61_repetition_score",  # all-true r11, untouched r12
    "q63_stream_dedup",  # all-true r11, untouched r12
    "q75_dup_ngram_fraction",  # all-true r11, untouched r12
    "q88_ann_recall",  # all-true r11, untouched r12
    "q90_stream_quota_admission",  # all-true r11, untouched r12
    "q91_stream_simhash_neardup",  # all-true r11, untouched r12
    "q92_substring_dedup",  # all-true r11, untouched r12
    "q98_quality_classifier",  # all-true r11, untouched r12
    "q32_asof_join",  # all-true r11, untouched r12
    "q33_rollup_revenue",  # all-true r11, untouched r12
    "q34_pivot_event_matrix",  # all-true r11, untouched r12
    "q35_sessionization",  # all-true r11, untouched r12
    "q36_token_topk",  # all-true r11, untouched r12
    "q37_ticker_mentions",  # all-true r11, untouched r12
    "q39_ma_cross_signals",  # all-true r11, untouched r12
    "q40_backtest_networth",  # all-true r11, untouched r12
    "q41_grid_search",  # all-true r11, untouched r12
    "q42_backtest_metrics",  # all-true r11, untouched r12
    "q43_stream_windowed_agg",  # all-true r11, untouched r12
    "q48_stream_sessionize",  # all-true r11, untouched r12
    "q49_stream_signal_edges",  # all-true r11, untouched r12
    "q59_stream_backtest_kernel",  # all-true r11, untouched r12
    "q50_multimodal_frames",  # all-true r11, untouched r12
    "q52_range_join",  # all-true r11, untouched r12
    "q53_resample_ohlc",  # all-true r11, untouched r12
    "q73_stream_late_arrival",  # all-true r11, untouched r12
    "q64_stream_band_kernel",  # all-true r11, untouched r12
    "q65_stream_grid",  # all-true r11, untouched r12
    "q72_stoploss_networth",  # all-true r11, untouched r12
    "q71_stream_partial_close",  # all-true r11, untouched r12
    "q45_common_stock_sweep",  # all-true r11, untouched r12
    "q46_simulated_annealing",  # all-true r11, untouched r12
    "q03_top_customers",  # all-true r10 — r12-MANDATORY: returns in r13 (rule-2 deadline r10+3)
    "q05_status_totals",  # all-true r10 — r12-MANDATORY: returns in r13 (rule-2 deadline r10+3)
    "q07_pct_change",  # all-true r10 — r12-MANDATORY: returns in r13 (rule-2 deadline r10+3)
    "q13_first_last",  # all-true r10 — r12-MANDATORY: returns in r13 (rule-2 deadline r10+3)
    "q15_union_nations",  # all-true r10 — r12-MANDATORY: returns in r13 (rule-2 deadline r10+3)
    "q20_json_props",  # all-true r10 — r12-MANDATORY: returns in r13 (rule-2 deadline r10+3)
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
