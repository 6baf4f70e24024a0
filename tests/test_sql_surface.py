"""Raw spark.sql over registered views equals the DataFrame-API
catalog queries — the two front-ends share one Catalyst plan space."""

from conftest import SF_SMALL


def test_sql_views_match_dataframe_api(spark):
    from strat_backtest_spark.plans.catalog import CATALOG
    from strat_backtest_spark.plans.sql_views import register_views

    names = register_views(spark, SF_SMALL)
    assert "lineitem" in names and "events" in names

    got = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty
        FROM lineitem WHERE l_shipdate <= timestamp'2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    ).collect()
    want = {
        (r["l_returnflag"], r["l_linestatus"]): r["sum_qty"]
        for r in CATALOG["q01_pricing_summary"]
        .fn(spark, SF_SMALL)
        .select("l_returnflag", "l_linestatus", "sum_qty")
        .collect()
    }
    assert len(got) == len(want)
    for r in got:
        assert r["sum_qty"] == want[(r["l_returnflag"], r["l_linestatus"])]

    # events view has the normalized TIMESTAMP ts (ltz), whatever the
    # parquet drop's physical type
    [(t,)] = spark.sql("SELECT typeof(ts) FROM events LIMIT 1").collect()
    assert t == "timestamp"


def test_text_operator_edge_cases(spark):
    """Empty docs and sub-n-token docs through chunking and
    decontamination: no crashes, documented row semantics."""
    import pandas as pd

    from strat_backtest_spark.operators.dedup import decontaminate
    from strat_backtest_spark.operators.text_analysis import chunk_documents

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["", "one two", "a " * 200]}
        )
    )
    chunks = chunk_documents(docs, chunk_tokens=64, overlap=16)
    rows = {r["doc_id"]: r for r in chunks.collect()}
    assert rows[1]["n_tokens"] == 0 and rows[1]["chunk_text"] == ""
    assert rows[2]["n_tokens"] == 2
    n3 = [r for r in chunks.collect() if r["doc_id"] == 3]
    assert len(n3) > 1  # 200 tokens at stride 48 -> several windows
    assert sorted(r["chunk_id"] for r in n3) == list(range(len(n3)))

    # empty benchmark: nothing can be contaminated
    bench = docs.filter("doc_id < 0")
    assert decontaminate(docs, bench, n=2, threshold=0.1).count() == 0
