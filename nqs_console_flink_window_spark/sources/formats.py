"""Alternate source formats (S1 surface breadth).

The reference ingests JSON strings from Kafka only; an analytics engine
serving the same users also ingests files.  All readers return the same
schema'd DataFrame, so every downstream operator is format-agnostic.
Parquet is the performance path (columnar, predicate pushdown, page
pruning); CSV/JSON are ingest/compat paths — schema is always explicit
(never inferSchema at scale: it double-reads the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json_lines(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    # explicit microsecond format: Spark's JSON default is millisecond
    # precision and silently truncates round-trips otherwise
    return (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC is the other columnar interchange format (Hive ecosystems):
    schema enforced, predicate pushdown and column pruning apply as with
    parquet."""
    return spark.read.schema(schema).orc(path)
