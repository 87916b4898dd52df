"""T1 — time-bucket derivations (SURVEY §2.7).

Reference: AbstractDataParser.java:56-61 derives epoch-second bucket columns
``test_time_h/_d/_w/_m`` (hour/day/ISO-Monday-week/month starts) plus Date
partition stamps.  Spark's ``date_trunc`` is Monday-based for 'week' as well,
so the mapping is direct and stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKETS = ("hour", "day", "week", "month")


def add_time_buckets(df: DataFrame, ts_col: str, prefix: str) -> DataFrame:
    """Add ``{prefix}_h/_d/_w/_m`` timestamp columns and ``{prefix}_d_date``
    (the write-partition column, DDL `PARTITION BY test_time_d`)."""
    short = {"hour": "h", "day": "d", "week": "w", "month": "m"}
    for unit in BUCKETS:
        df = df.withColumn(f"{prefix}_{short[unit]}", F.date_trunc(unit, F.col(ts_col)))
    return df.withColumn(f"{prefix}_d_date", F.to_date(F.col(ts_col)))
