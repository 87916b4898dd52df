"""Batch parquet sources for the fixture tables (TESTDATA.md).

The reference's sources are Kafka topics (env/BaseFlink.java:107-129); for
batch analytics and the driver's correctness gate the same pipelines read the
driver-generated parquet.  Streaming variants live in ``sources.streams``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import TABLE_NAMES


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-zone TimestampType.

    The fixture has shipped two physical encodings across driver rounds:
    int64 nanoseconds (TIMESTAMP(NANOS) surfaced as LongType via the
    ``nanosAsLong`` legacy conf) and plain TIMESTAMP/TIMESTAMP_NTZ micros.
    Adapt on the observed dtype instead of assuming one, so the engine reads
    either vintage; both paths floor-truncate to microseconds exactly like
    DuckDB's ``CAST(ts AS TIMESTAMP)``.  The session runs in UTC
    (session.py), so the NTZ->TZ cast is value-preserving.
    """
    if "ts" not in df.columns:
        return df
    dtype = df.schema["ts"].dataType
    if isinstance(dtype, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dtype, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # nanosAsLong keeps old TIMESTAMP(NANOS) fixtures readable; it is a
    # no-op for fixtures that already store micros timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None
) -> None:
    """Expose fixture tables as temp views so ``spark.sql`` sees the same
    names the DuckDB oracle does.  Pass ``tables`` to register only what the
    query reads (avoids touching every parquet footer per call)."""
    for name in tables or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
