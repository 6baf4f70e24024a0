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
# The catalog (73 entries) is larger than the window; rotate which
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
# Round-8 application: the nine entries last gated in r05 (q44, q50,
# q52, q54, q57, q62, q66, q67, q70) and the fourteen last gated in
# r06 (q03, q05, q07, q08, q10-q17, q20, q21) ALL return to the
# window, as do the entries touched this round: the similarity family
# (q30/q31/q47/q51 — margin + NaN-policy + bucket-cap fixes), the
# dedup family consumers of decontaminate/connected-components
# (q55/q56/q60/q68/q69), q26 (BPE tokenizer scale run), and the
# EIGHTEEN new round-8 entries (q74 PII scrub, q75 dup-n-gram
# fraction, q76 semantic dedup apply, q77 line-level dedup, q78
# streaming PII, q79 sequence packing, q80 shard shuffle, q81 TF-IDF
# top-k, q82 embedding quantization, q83 unigram log-prob quality,
# q84 train/val/test split, q85 per-source quota sample, q86 corpus
# trigram top-k, q87 bigram log-prob quality, q88 ANN recall@k, q89
# column profiler, q90 streaming quota admission, q91 streaming
# simhash near-dup — never gated, must be in the window).
# Catalog is now 91 entries; the tail is 41 untouched entries, every
# one hash-green in r07 except q14 (r06 — see below), keeping the
# head at exactly 50. The four kernel-family rows below
# (q40/q42/q46/q59) joined the tail when the round-8 entry count
# passed 84: their source files (operators/kernel.py, metrics.py,
# optimize.py, streaming/backtest_stream.py) have zero round-8 diffs
# and all four hash-matched in r07. When q91 (streaming simhash
# near-dup, new this round — must be in the window) pushed the head
# to 51, q14_distinct moved to the tail: it is untouched, green
# r01-r06, and rule 2 gives it until round 9 (last gate row r06 →
# back in the window by r09 at the latest) — flagged r9-MANDATORY.
_SWEEP_TAIL = [
    "q14_distinct",               # hash-match r01-r06, untouched r7+r8; r9-MANDATORY (rule 2)
    "q40_backtest_networth",      # hash-match r01-r07, kernel.py untouched r8
    "q72_stoploss_networth",      # hash-match r07 (heap-oracle), kernel.py untouched r8
    "q41_grid_search",            # hash-match r07, optimize.py untouched r8
    "q42_backtest_metrics",       # hash-match r07 (full oracle), metrics.py untouched r8
    "q46_simulated_annealing",    # hash-match r07 (replay oracle), optimize.py untouched r8
    "q59_stream_backtest_kernel", # hash-match r07, backtest_stream.py untouched r8
    "q01_pricing_summary",        # hash-match r01-r07, untouched r8
    "q02_regional_revenue",       # hash-match r01-r07, untouched r8
    "q04_orders_with_bigticket_items",  # hash-match r01-r07, untouched r8
    "q06_rolling_mean",           # hash-match r01-r07, untouched r8
    "q09_cumprod",                # hash-match r01-r07, untouched r8
    "q18_compound_range_predicate",  # hash-match r01-r07, untouched r8
    "q19_string_predicates",      # hash-match r01-r07, untouched r8
    "q22_minhash_signatures",     # hash-match r07 (Arrow rewrite), untouched r8
    "q23_minhash_lsh_pairs",      # hash-match r07 (first-band-wins), untouched r8
    "q24_simhash",                # hash-match r07 (Arrow rewrite), untouched r8
    "q25_ngram_jaccard",          # hash-match r07, untouched r8
    "q27_quality_score",          # hash-match r07 (native punct), untouched r8
    "q28_langid",                 # hash-match r07 (single-fold), untouched r8
    "q29_fingerprint",            # hash-match r07 (Arrow rewrite), untouched r8
    "q32_asof_join",              # hash-match r02-r07, untouched r8
    "q33_rollup_revenue",         # hash-match r02-r07, untouched r8
    "q34_pivot_event_matrix",     # hash-match r02-r07, untouched r8
    "q35_sessionization",         # hash-match r02-r07, untouched r8
    "q36_token_topk",             # hash-match r02-r07, untouched r8
    "q37_ticker_mentions",        # hash-match r02-r07, untouched r8
    "q38_multimodal_features",    # hash-match r02-r07, untouched r8
    "q53_resample_ohlc",          # hash-match r07 (oracle BIGINT fix), untouched r8
    "q61_repetition_score",       # hash-match r07 (Arrow rewrite), untouched r8
    "q39_ma_cross_signals",       # hash-match r02-r07, untouched r8
    "q43_stream_windowed_agg",    # hash-match r02-r07, untouched r8
    "q48_stream_sessionize",      # hash-match r02-r07, untouched r8
    "q49_stream_signal_edges",    # hash-match r02-r07, untouched r8
    "q73_stream_late_arrival",    # hash-match r07, untouched r8
    "q58_simhash_neardup",        # hash-match r07 (Arrow rewrite r7), untouched r8
    "q63_stream_dedup",           # hash-match r07, untouched r8
    "q65_stream_grid",            # hash-match r07, untouched r8
    "q45_common_stock_sweep",     # hash-match r07 (full composed oracle), untouched r8
    "q64_stream_band_kernel",     # hash-match r07, backtest_stream.py untouched r8
    "q71_stream_partial_close",   # hash-match r07, backtest_stream.py untouched r8
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
