"""Local replica of the driver's DuckDB-oracle comparison: run a
catalog query in Spark and its oracle SQL in DuckDB on the same
parquet, compare row count + column names + order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from strat_backtest_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class the driver's hash distinguishes."""
    k = s.dtype.kind if hasattr(s.dtype, "kind") else "O"
    return {
        "i": "int", "u": "int",
        "f": "float",
        "b": "bool",
        "M": "datetime", "m": "timedelta",
    }.get(k, "object")


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if (a is None or (isinstance(a, float) and math.isnan(a))) and (
        b is None or (isinstance(b, float) and math.isnan(b))
    ):
        return True
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> dict:
    got = spark_df.toPandas()
    exp = con.sql(sql).df()
    out = {"name": name, "rows": (len(got), len(exp)), "ok": False, "detail": ""}
    if sorted(got.columns) != sorted(exp.columns):
        out["detail"] = f"columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}"
        return out
    if len(got) != len(exp):
        out["detail"] = "row count mismatch"
        return out
    g = _normalize(got)
    e = _normalize(exp)
    # dtype-strict: the driver's value hash is dtype-sensitive (123 vs
    # 123.0 hash differently), so Python == equality is not enough — a
    # DuckDB HUGEINT landing as float64 against Spark's int64 must FAIL
    # here too, or the local sweep stays green while the gate goes red
    # (the q53 trap, rounds 5-6).
    for c in g.columns:
        gk, ek = _dtype_kind(g[c]), _dtype_kind(e[c])
        if gk != ek:
            out["detail"] = f"col {c} dtype kind differs: spark={g[c].dtype} ({gk}) vs oracle={e[c].dtype} ({ek})"
            return out
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (x, y) in enumerate(zip(gv, ev)):
            if not _values_equal(x, y):
                out["detail"] = f"col {c} row {i}: spark={x!r} oracle={y!r}"
                return out
    out["ok"] = True
    return out


def run_catalog(spark, sf_dir: str, names=None, verbose=True) -> list[dict]:
    from strat_backtest_spark.plans.catalog import CATALOG

    con = duck_connection(sf_dir)
    results = []
    for name, qd in CATALOG.items():
        if names and name not in names:
            continue
        try:
            sql = qd.oracle_for(sf_dir)
            if sql is None:
                # collect, not count: the driver materializes VALUES, so a
                # count() here would miss runtime errors Catalyst prunes away
                n = len(qd.fn(spark, sf_dir).collect())
                r = {"name": name, "rows": (n, None), "ok": n >= 0, "detail": "rows-only"}
            else:
                r = compare(qd.fn(spark, sf_dir), con, sql, name)
        except Exception as exc:  # surface, don't abort the sweep
            r = {"name": name, "rows": (None, None), "ok": False, "detail": f"{type(exc).__name__}: {exc}"[:500]}
        results.append(r)
        if verbose:
            print(("PASS" if r["ok"] else "FAIL"), name, r["rows"], r["detail"][:200], flush=True)
    return results
