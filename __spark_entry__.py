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
# Round-10 application: the 42-entry r8 tail returns to the window
# (rule 3: after r10 no entry's latest green row is older than r9),
# joined by everything new or touched this round — six NEW entries:
# q93 (incremental dedup vs persisted index, + broadcast-delta and
# bucketed-index plans), q94 (perceptual-hash image near-dup), q95
# (audio-fingerprint near-dup), q96 (streaming incremental dedup),
# q97 (persisted partition-pruned IVF), q98 (hashed-linear quality
# classifier) — plus the touched q51 (ivf_topk: max_list cap +
# pre_assigned) and q38 (multimodal.py: ADVICE-r9 decode_png
# hardening + the new encoder/fingerprint functions; its own path
# uses the fake decoder but it keeps the file's in-window seat).
# Six new entries needed six head slots, vacated by untouched
# all-true-r09 co-residents whose functions have ZERO r10 diffs
# (each verifiable via git diff cf01838..HEAD on its file — the r10
# changes are strictly APPENDED functions): q92, q22, q23 (dedup.py),
# q50 (multimodal.py sample_frames/resize_meta path). Head is exactly
# 50; the tail is 48 entries, every one all-true in CORRECTNESS_r09
# and function-level untouched this round (at most 1 round stale when
# the tail was formed — rule 3 satisfied with no exceptions).
_SWEEP_TAIL = [
    "q92_substring_dedup",        # all-true r09; substring fns zero r10 diffs
    "q22_minhash_signatures",     # all-true r09; sig fns zero r10 diffs — slot freed for NEW q96 (same co-resident reasoning as q92/q95)
    "q23_minhash_lsh_pairs",      # all-true r09; pair fns zero r10 diffs — slot freed for NEW q97
    "q50_multimodal_frames",      # all-true r09; its consumed fns (sample_frames/resize_meta) have zero r10 diffs — slot freed for NEW q98; q38 keeps the in-window seat for the multimodal file
    "q01_pricing_summary",        # all-true r09, untouched r10
    "q02_regional_revenue",       # all-true r09, untouched r10
    "q04_orders_with_bigticket_items",  # all-true r09, untouched r10
    "q06_rolling_mean",           # all-true r09, untouched r10
    "q09_cumprod",                # all-true r09, untouched r10
    "q14_distinct",               # all-true r09, untouched r10
    "q18_compound_range_predicate",  # all-true r09, untouched r10
    "q19_string_predicates",      # all-true r09, untouched r10
    "q24_simhash",                # all-true r09; simhash fns zero r10 diffs
    "q25_ngram_jaccard",          # all-true r09; ngram fns zero r10 diffs
    "q27_quality_score",          # all-true r09, untouched r10
    "q28_langid",                 # all-true r09, untouched r10
    "q29_fingerprint",            # all-true r09, untouched r10
    "q31_ann_lsh_topk",           # all-true r09; ann_topk zero r10 diffs
    "q58_simhash_neardup",        # all-true r09; fn zero r10 diffs
    "q61_repetition_score",       # all-true r09, untouched r10
    "q63_stream_dedup",           # all-true r09, untouched r10
    "q75_dup_ngram_fraction",     # all-true r09; fn zero r10 diffs
    "q88_ann_recall",             # all-true r09; composes cosine/ann only
    "q90_stream_quota_admission", # all-true r09, untouched r10
    "q91_stream_simhash_neardup", # all-true r09, untouched r10
    "q32_asof_join",              # all-true r09, untouched r10
    "q33_rollup_revenue",         # all-true r09, untouched r10
    "q34_pivot_event_matrix",     # all-true r09, untouched r10
    "q35_sessionization",         # all-true r09, untouched r10
    "q36_token_topk",             # all-true r09, untouched r10
    "q37_ticker_mentions",        # all-true r09, untouched r10
    "q39_ma_cross_signals",       # all-true r09, untouched r10
    "q40_backtest_networth",      # all-true r09, untouched r10
    "q41_grid_search",            # all-true r09, untouched r10
    "q42_backtest_metrics",       # all-true r09, untouched r10
    "q43_stream_windowed_agg",    # all-true r09, untouched r10
    "q48_stream_sessionize",      # all-true r09, untouched r10
    "q49_stream_signal_edges",    # all-true r09, untouched r10
    "q59_stream_backtest_kernel", # all-true r09, untouched r10
    "q52_range_join",             # all-true r09, untouched r10
    "q53_resample_ohlc",          # all-true r09, untouched r10
    "q73_stream_late_arrival",    # all-true r09, untouched r10
    "q64_stream_band_kernel",     # all-true r09, untouched r10
    "q65_stream_grid",            # all-true r09, untouched r10
    "q72_stoploss_networth",      # all-true r09, untouched r10
    "q71_stream_partial_close",   # all-true r09, untouched r10
    "q45_common_stock_sweep",     # all-true r09, untouched r10
    "q46_simulated_annealing",    # all-true r09, untouched r10
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
