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


def test_queries_identical_across_ts_encodings(spark, tmp_path) -> None:
    """Fixture-vintage simulation: rewrite the smoke dir with events.ts as
    int64 nanoseconds (the rounds-1/2 physical encoding) and run registered
    queries through load_table against both vintages — results must be
    identical.  This is the end-to-end guard for the drift that cost
    round 2 (ts misread collapsed every window)."""
    import shutil

    from nqs_console_flink_window_spark.plans import all as _all  # noqa: F401
    from nqs_console_flink_window_spark.plans.registry import REGISTRY

    from nqs_console_flink_window_spark.config import TABLE_NAMES

    alt = tmp_path / "vintage_nanos"
    alt.mkdir()
    for t in TABLE_NAMES:
        shutil.copy(f"{SMOKE_SF_DIR}/{t}.parquet", alt / f"{t}.parquet")
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    nanos = ev.withColumn(
        "ts", (F.unix_micros("ts") * F.lit(1000)).cast("long")
    )
    # single file, same name, long-typed ts
    (alt / "events.parquet").unlink()
    nanos.coalesce(1).write.mode("overwrite").parquet(str(alt / "_tmp"))
    part = next((alt / "_tmp").glob("part-*.parquet"))
    part.rename(alt / "events.parquet")
    shutil.rmtree(alt / "_tmp")

    for name in ("tumbling_window_10s", "session_windows", "enrich_events"):
        base = sorted(map(tuple, REGISTRY[name].spark(spark, SMOKE_SF_DIR).collect()))
        vint = sorted(map(tuple, REGISTRY[name].spark(spark, str(alt)).collect()))
        assert base == vint, f"{name}: ts-encoding changed results"
