"""Randomized differential fuzz: Spark kernel queries vs their
recursive-CTE DuckDB oracles on SYNTHETIC events tables, not just the
fixed testdata. The generator aims price paths at the engine's edge
cases — closes near stop thresholds, occasional non-positive closes
(rejected buys), tiny cash (zero/negative-share orders) — so the quirk
branches (Q1-Q5, Q13) execute under inputs the gate never shows.
Seeded: failures reproduce exactly.
"""

import numpy as np
import pandas as pd
import pytest

FUZZ_QUERIES = [
    "q40_backtest_networth",
    "q41_grid_search",
    "q59_stream_backtest_kernel",
    "q64_stream_band_kernel",
    "q71_stream_partial_close",
    "q72_stoploss_networth",
]


def _synth_events(seed: int, n_users: int = 6, n_days: int = 40) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-03-01")
    for u in range(n_users):
        # regime-switching walk: trends force MA crosses; the scale
        # spread makes some tickers unaffordable (floor -> 0 shares)
        # and crashes trip stop-losses
        px = float(rng.uniform(0.5, 50.0)) * (10.0 ** int(rng.integers(0, 3)))
        for d in range(n_days):
            drift = rng.choice([-0.2, -0.05, 0.02, 0.08, 0.25])
            px = max(px * (1.0 + drift + rng.normal(0, 0.05)), 0.01)
            val = round(px, 2)
            if rng.random() < 0.03:
                val = -val  # negative close: buy-guard branch
            n_ev = int(rng.integers(1, 3))
            for k in range(n_ev):
                rows.append(
                    {
                        "event_id": eid,
                        "user_id": u,
                        # k == 0 pinned to hour 0 so the walk value is
                        # always first-of-day (= the selected close);
                        # filler events land strictly after it.
                        "ts": base + pd.Timedelta(days=d, hours=0 if k == 0 else int(rng.integers(1, 20))),
                        "event_type": "trade",
                        "value": val if k == 0 else round(float(rng.uniform(-5, 5)), 2),
                    }
                )
                eid += 1
    df = pd.DataFrame(rows)
    return df


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_kernel_oracles_on_random_walks(spark, tmp_path, seed):
    import duckdb

    from oracle_utils import compare
    from strat_backtest_spark.plans.catalog import CATALOG

    sf_dir = str(tmp_path / f"fuzz{seed}")
    pdf = _synth_events(seed)
    import os

    os.makedirs(sf_dir)
    pdf.to_parquet(f"{sf_dir}/events.parquet", index=False)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    for name in FUZZ_QUERIES:
        qd = CATALOG[name]
        res = compare(qd.fn(spark, sf_dir), con, qd.oracle, name)
        assert res["ok"], f"seed {seed} {name}: {res['detail'][:200]}"
