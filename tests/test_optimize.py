"""Optimizer objective parity: evaluate_params' telescoped final-net-
worth aggregation must equal the full build_portfolio curve's last
point for every (ticker, run) — and the reference's README grid must
reproduce the golden best point."""

import pytest

from conftest import SF_SMALL


def test_evaluate_params_matches_portfolio_finals(spark):
    from strat_backtest_spark.operators.optimize import evaluate_params, expand_grid
    from strat_backtest_spark.plans.backtest import Backtest, MACrossStrategy
    from strat_backtest_spark.plans.catalog import _t
    from strat_backtest_spark.sources.bars import bars_from_events

    bars = bars_from_events(_t(spark, SF_SMALL, "events"))
    params = expand_grid(spark, (3, 7, 2), (8, 14, 5))
    got = {
        (r["ticker"], r["run_id"]): r["net_worth"]
        for r in evaluate_params(bars, params, 10_000.0).collect()
    }
    for p in params.collect():
        bt = Backtest(
            bars, 10_000.0, MACrossStrategy(p["fast"], p["lagging"])
        )
        for r in bt.final_net_worth().collect():
            want = r["net_worth"]
            assert got[(r["ticker"], p["run_id"])] == pytest.approx(
                want, rel=1e-12
            ), (r["ticker"], p["run_id"])
        bt.release()


def test_grid_search_reproduces_reference_golden(spark):
    """README grid fast=[36,42,2] x lagging=[40,210,10] on AAPL
    last-10Y: best point is (36,40) with net worth 1,283,666.449897766
    (reference tests/test_strat.py:13 + README.md:100-106)."""
    from strat_backtest_spark.operators.optimize import grid_search
    from strat_backtest_spark.sources.bars import load_bars_csv

    bars = load_bars_csv(
        spark, "/root/reference/strat_backtest/data/aapl.csv"
    ).filter("date > '2012-12-31'")
    best = grid_search(
        bars, 5000.0, fast_range=(36, 42, 2), lagging_range=(40, 210, 10)
    ).collect()
    assert len(best) == 1
    assert (best[0]["fast"], best[0]["lagging"]) == (36, 40)
    assert best[0]["net_worth"] == pytest.approx(1283666.449897766, rel=1e-9)
