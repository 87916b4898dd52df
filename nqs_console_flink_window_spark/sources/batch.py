"""Batch parquet sources for the fixture tables (TESTDATA.md).

The reference's sources are Kafka topics (env/BaseFlink.java:107-129); for
batch analytics and the driver's correctness gate the same pipelines read the
driver-generated parquet.  Streaming variants live in ``sources.streams``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import TABLE_NAMES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The fixture events.parquet stores ts as TIMESTAMP(NANOS) which Spark's
    # parquet reader rejects; read the raw int64 nanos (legacy conf, works
    # with the vectorized reader) and floor-truncate to microsecond
    # TimestampType — the same truncation DuckDB's CAST(ts AS TIMESTAMP) does.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
