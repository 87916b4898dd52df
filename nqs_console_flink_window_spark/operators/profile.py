"""Single-pass table profiler — the stats-collection step a training-data
pipeline runs before/after every filter stage (row counts, null rates,
cardinalities, ranges) and the input to skew/salting decisions.

One ``agg`` computes every statistic for every column in a single scan
(map-side partial aggregation, one reduce of a handful of rows — no
per-column jobs, no driver loop), then the wide row is unpivoted to one
row per column.  ``COUNT(DISTINCT)`` across many columns expands to one
Expand node (rows x columns) feeding partial distinct aggregation; for
quick profiles at extreme scale pass ``approx=True`` to use HLL sketches
(`approx_count_distinct`) instead, which keeps the single-exchange shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.DecimalType,
)


def profile(df: DataFrame, columns: list[str] | None = None, approx: bool = False) -> DataFrame:
    """One row per profiled column: ``col, n, n_null, n_distinct, min_num,
    max_num, min_str, max_str`` (numeric ranges as double, string ranges
    for string columns, NULL elsewhere)."""
    cols = columns or df.columns
    aggs, rows = [], []
    for c in cols:
        dt = df.schema[c].dataType
        cnt = F.count(F.lit(1)).alias(f"{c}__n")
        nulls = F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__null")
        dist = (
            F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        ).alias(f"{c}__dist")
        aggs += [cnt, nulls, dist]
        if isinstance(dt, _NUMERIC):
            aggs += [
                F.min(F.col(c)).cast("double").alias(f"{c}__minn"),
                F.max(F.col(c)).cast("double").alias(f"{c}__maxn"),
            ]
            num = True
        elif isinstance(dt, T.StringType):
            aggs += [
                F.min(F.col(c)).alias(f"{c}__mins"),
                F.max(F.col(c)).alias(f"{c}__maxs"),
            ]
            num = False
        else:
            num = None
        rows.append((c, num))
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__dist").cast("long").alias("n_distinct"),
            (F.col(f"{c}__minn") if num is True else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"{c}__maxn") if num is True else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (F.col(f"{c}__mins") if num is False else F.lit(None).cast("string")).alias(
                "min_str"
            ),
            (F.col(f"{c}__maxs") if num is False else F.lit(None).cast("string")).alias(
                "max_str"
            ),
        )
        for c, num in rows
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
