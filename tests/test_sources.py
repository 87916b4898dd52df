"""Source-layer schema tolerance: the driver regenerates the fixture
between rounds and its physical encodings drift (events.ts shipped as both
int64 TIMESTAMP(NANOS) and plain TIMESTAMP micros).  The loaders must
normalize every vintage to the engine's canonical logical types."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nqs_console_flink_window_spark.config import SMOKE_SF_DIR
from nqs_console_flink_window_spark.sources.batch import (
    canonicalize_types,
    load_table,
    normalize_event_ts,
)


def test_load_table_events_ts_is_timestamp(spark) -> None:
    df = load_table(spark, SMOKE_SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # values land in the fixture's 2024 range, not 1970 (a nanos/micros
    # misread shrinks epochs by 1000x and collapses everything to 1970)
    row = df.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert row["lo"].year >= 2023, row
    assert row["hi"].year <= 2026, row


def test_normalize_event_ts_accepts_long_nanos(spark) -> None:
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    nanos = int(base.timestamp()) * 1_000_000_000 + 123_456_789
    df = spark.createDataFrame([(1, nanos)], "event_id long, ts long")
    out = normalize_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    got = out.first()["ts"]
    # floor-truncated to microseconds, exactly DuckDB's CAST semantics
    assert got.microsecond == 123_456, got


def test_normalize_event_ts_accepts_ntz(spark) -> None:
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 1, 12, 0, 0, 5))],
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampNTZType()),
            ]
        ),
    )
    out = normalize_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.first()["ts"] == datetime.datetime(2024, 3, 1, 12, 0, 0, 5)


def test_canonicalize_types_decimal_to_double(spark) -> None:
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))],
        "k long, t timestamp",
    ).select(
        "k",
        F.col("k").cast("decimal(12,2)").alias("price"),
        F.col("t").cast("timestamp_ntz").alias("t"),
    )
    out = canonicalize_types(df)
    assert isinstance(out.schema["price"].dataType, T.DoubleType)
    # NTZ is left untouched on purpose: casting a scan column would defeat
    # parquet predicate pushdown (see canonicalize_types docstring)
    assert isinstance(out.schema["t"].dataType, T.TimestampNTZType)
    r = out.first()
    assert r["price"] == 1.0 and r["t"] == datetime.datetime(2024, 1, 1)
