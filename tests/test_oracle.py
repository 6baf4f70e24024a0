"""Catalog-vs-DuckDB oracle tests — the same comparison the driver's
correctness gate runs, at sf0.001 for speed (the driver uses sf0.01)."""

import pytest

from conftest import SF_SMALL


def test_catalog_matches_duckdb(spark):
    from oracle_utils import run_catalog

    results = run_catalog(spark, SF_SMALL, verbose=False)
    assert results, "catalog is empty"
    failures = [r for r in results if not r["ok"]]
    assert not failures, "; ".join(f"{r['name']}: {r['detail'][:120]}" for r in failures)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
