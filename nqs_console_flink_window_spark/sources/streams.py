"""Streaming sources (SURVEY §2.1 S1).

The reference consumes Kafka topics (env/BaseFlink.java:107-129).  The same
pipelines here read any Structured Streaming source; for the fixture tables
the file source stands in for Kafka (TESTDATA.md), with ``availableNow``
used by tests to drain it deterministically.  A real deployment swaps
``read_events_stream`` for ``spark.readStream.format('kafka')...`` — every
transform downstream is source-agnostic (unified batch/streaming API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw parquet schema of the events fixture: ts arrives as int64 nanoseconds
# (TIMESTAMP(NANOS) read via nanosAsLong, see sources/batch.py).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stand-in for the Kafka `data_upload` topic.

    ``maxFilesPerTrigger`` is the operational analogue of the reference's
    1000-count early-fire trigger (time/TimeCountMessageTrigger.java:46-104):
    it caps micro-batch size; batch cadence comes from the trigger interval.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
