"""Symbol-dictionary ingestion (SURVEY.md §2.1 S6).

The reference FTP-fetches NASDAQ's pipe-delimited symbol directory and
caches it as CSV (common_stock.py:61-104). The engine takes the fetch
out of core (an adapter concern) and exposes distributed parsers for
the pipe-delimited directory format plus the dictionary-filter logic
(P6/P7/P8) as DataFrame transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_symbols(spark: SparkSession, path: str, sep: str = "|") -> DataFrame:
    """Parse a pipe-delimited symbol directory (nasdaqlisted.txt
    format) into (symbol, security_name), lowercased."""
    df = spark.read.option("header", True).option("sep", sep).csv(path)
    cols = {c.lower().strip(): c for c in df.columns}
    sym = cols.get("symbol", df.columns[0])
    name = cols.get("security name", cols.get("security_name", df.columns[1]))
    return df.select(
        F.lower(F.col(sym)).alias("symbol"),
        F.lower(F.col(name)).alias("security_name"),
    )


def load_stopwords(spark: SparkSession, path: str, max_len: int = 4) -> DataFrame:
    """Common-word list; only words of len <= max_len retained
    (reference: common_stock.py:93-95)."""
    return (
        spark.read.text(path)
        .select(F.lower(F.col("value")).alias("word"))
        .filter(F.length("word") <= max_len)
    )


def clean_symbols(symbols: DataFrame, stopwords: DataFrame) -> DataFrame:
    """Reference filter chain (common_stock.py:97-102):

    - drop symbols containing '.' or '$' (null-safe: pandas ``na=True``
      treats null as a match, i.e. nulls are dropped — replicated with
      an explicit isNotNull guard);
    - keep symbols longer than 1 char;
    - anti-join away the common-word list (scales past driver memory,
      unlike ``isin``).
    """
    filtered = symbols.filter(
        F.col("symbol").isNotNull()
        & ~F.col("symbol").rlike(r"\.|\$")
        & (F.length("symbol") > 1)
    )
    return filtered.join(
        F.broadcast(stopwords),
        filtered.symbol == stopwords.word,
        "left_anti",
    )
