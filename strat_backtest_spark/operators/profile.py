"""Dataset profiling: per-column null / distinct / extrema stats in
ONE aggregation pass — the first look any pipeline takes at a new
100 TB drop before routing it into curation.

Generalizes the reference's ad-hoc dataframe inspection (its tests
eyeball pandas describe()-style output; SURVEY.md §5) into a
first-class, oracle-checkable operator.

Scale shape: a single global aggregate — every per-column statistic
is a partial-aggregatable expression (count / min / max / HLL-free
exact count_distinct), so the map side reduces each partition to one
row and only |columns|-width partials shuffle. Exact count_distinct
over multiple columns plans as ONE Expand + aggregate (row
multiplication by |profiled columns| — the standard exact-profiler
cost, linear and map-reduced; swap in approx_count_distinct when a
±2% sketch is acceptable and exact portability is not required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUM_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str).

    Numeric columns fill min_num/max_num (as double) and leave the
    string extrema null; everything else is profiled through its
    string form (dates/strings order correctly; n_distinct is exact
    and type-agnostic). All statistics come from ONE aggregate job;
    the per-column rows are a driver-free posexplode of the single
    stat row."""
    if cols is None:
        cols = [f.name for f in df.schema.fields]
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = isinstance(fields[c], _NUM_TYPES)
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if is_num:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__mx_{c}"))
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        is_num = isinstance(fields[c], _NUM_TYPES)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__mn_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__mx_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if is_num else F.col(f"__mn_{c}")).alias("min_str"),
                (F.lit(None).cast("string") if is_num else F.col(f"__mx_{c}")).alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
