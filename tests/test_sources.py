"""Source-layer schema tolerance: the driver regenerates the fixture
between rounds and its physical encodings drift (events.ts shipped as both
int64 TIMESTAMP(NANOS) and plain TIMESTAMP micros).  The loaders must
normalize every vintage to the engine's canonical logical types."""

from __future__ import annotations

import datetime
import os

import pytest
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


def test_kafka_option_map_mirrors_reference_consumer() -> None:
    """S1 — the option map reproduces BaseFlink.java:109-128: bootstrap
    host:port join, '<job>-<topic>2' group id, SCRAM jaas string, security
    protocol + mechanism passthrough with the kafka. prefix."""
    from nqs_console_flink_window_spark.sources.kafka import kafka_options

    opts = kafka_options(
        "data_upload",
        "broker.internal",
        port=9093,
        username="nqs",
        password="secret",
        job_name="heartbeat-job",
        max_offsets_per_trigger=100_000,
    )
    assert opts["subscribe"] == "data_upload"
    assert opts["kafka.bootstrap.servers"] == "broker.internal:9093"
    assert opts["kafka.group.id"] == "heartbeat-job-data_upload2"
    assert (
        opts["kafka.sasl.jaas.config"]
        == "org.apache.kafka.common.security.scram.ScramLoginModule required "
        'username="nqs" password="secret";'
    )
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-256"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    # anonymous dev cluster: no SASL block at all
    anon = kafka_options("t", "localhost")
    assert not any(k.startswith("kafka.sasl") for k in anon)


def test_kafka_wire_parse_roundtrips_events(spark) -> None:
    """S1 — parse_kafka_events turns simulated Kafka wire batches (the
    source's fixed schema, JSON payload in binary value) back into the
    exact events table rows and schema; S6 — kafka_payload is its inverse,
    so events -> value JSON -> parse is lossless."""
    from nqs_console_flink_window_spark.sinks.writers import kafka_payload
    from nqs_console_flink_window_spark.sources.kafka import (
        KAFKA_WIRE_SCHEMA,
        parse_kafka_events,
    )

    # to_json serializes timestamps at millisecond precision (the wire
    # contract); truncate first so the roundtrip comparison is exact.
    ev = (
        load_table(spark, SMOKE_SF_DIR, "events")
        .withColumn("ts", F.date_trunc("millisecond", "ts"))
        .limit(50)
    )
    wire = kafka_payload(ev).select(
        F.lit(None).cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("data_upload").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    parsed = parse_kafka_events(wire)
    assert [f.name for f in parsed.schema.fields] == ev.columns
    assert sorted(map(str, ev.collect())) == sorted(map(str, parsed.collect()))


def test_kafka_reader_and_writer_builders_construct(spark) -> None:
    """S1/S6 — the readStream/writeStream builders assemble without a
    broker or connector jar (configuration is inert until load()/start());
    a deployment runs them unchanged once spark-sql-kafka is on the
    classpath."""
    from nqs_console_flink_window_spark.sources.kafka import (
        kafka_events_reader,
        kafka_sink_writer,
    )

    reader = kafka_events_reader(spark, "data_upload", "broker", username="u", password="p")
    assert reader is not None
    # writeStream requires a streaming DataFrame; the file-source stand-in
    # provides one without a broker.
    from nqs_console_flink_window_spark.sources.streams import read_events_stream

    stream = read_events_stream(spark, SMOKE_SF_DIR)
    writer = kafka_sink_writer(stream, "data_saved", "broker")
    assert writer is not None


def test_loader_absorbs_every_fixture_vintage(spark, tmp_path) -> None:
    """Round-2 lesson, generalized: the driver has re-encoded fixture
    physical types between rounds (events.ts int64-nanos -> TIMESTAMP
    micros) and may again.  Write the same logical events table in every
    physical-type family parquet can ship it in, and assert load_table
    normalizes each to the canonical schema with identical values — so a
    third encoding change cannot zero a bench again."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nqs_console_flink_window_spark.sources.batch import load_table

    base_ts = datetime.datetime(2024, 1, 1, 0, 0, 1, 500000)
    ids = list(range(4))
    tss = [base_ts + datetime.timedelta(seconds=i) for i in ids]
    vals = [1.5, 2.5, 3.25, 4.0]

    def write_vintage(name: str, ts_arr: pa.Array, val_arr: pa.Array) -> str:
        d = tmp_path / name
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": ts_arr,
                "user_id": pa.array(ids, pa.int64()),
                "event_type": pa.array(["a", "b", "a", "b"]),
                "value": val_arr,
                "props": pa.array(['{"k": 1}'] * 4),
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        return str(d)

    us = pa.array(tss, pa.timestamp("us"))
    vintages = {
        "ns_int64": (pa.array(tss, pa.timestamp("ns")), pa.array(vals, pa.float64())),
        "us_ntz": (us, pa.array(vals, pa.float64())),
        "us_tz": (pa.array(tss, pa.timestamp("us", tz="UTC")), pa.array(vals)),
        "ms": (pa.array(tss, pa.timestamp("ms")), pa.array(vals)),
        "float32_val": (us, pa.array(vals, pa.float32())),
        "decimal_val": (us, pa.array(vals, pa.float64()).cast(pa.decimal128(12, 4))),
    }
    results = {}
    for name, (ts_arr, val_arr) in vintages.items():
        df = load_table(spark, write_vintage(name, ts_arr, val_arr), "events")
        schema = dict(df.dtypes)
        assert schema["ts"] == "timestamp", (name, schema)
        assert schema["value"] == "double", (name, schema)
        results[name] = sorted(
            (r.event_id, r.ts, r.value, r.event_type) for r in df.collect()
        )
    want = results["us_ntz"]
    for name, got in results.items():
        assert got == want, (name, got, want)


def test_decimal_vintage_aggregation_matches_duckdb_oracle(spark, tmp_path) -> None:
    """Advisor round-3 caveat, closed with evidence: canonicalize_types
    casts DECIMAL scan columns to DOUBLE, so Spark aggregates IEEE while a
    DuckDB oracle reading the same parquet aggregates decimal-exact.  The
    registry's quantized-sum discipline (qsum: floor(x*1e6+0.5) -> BIGINT
    SUM) absorbs that: for any decimal(p,s<=6) value, x*1e6 is an integer
    the double conversion perturbs by ~1e-13 relative — never enough to
    cross a floor boundary offset by 0.5.  Assert the full aggregate is
    bit-equal across engines on a decimal vintage with adversarial values
    (many .x5 quantization-tie shapes)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nqs_console_flink_window_spark.sources.batch import load_table

    n = 2000
    # adversarial: values ending in 5 at the last decimal place, plus big
    # magnitudes, so any boundary slip would show up in the quantized sum
    vals = [round((i * 7919 % 100000) + (i % 10) * 0.0005 + 0.25, 4) for i in range(n)]
    d = tmp_path / "dec"
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)], pa.timestamp("us")),
            "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
            "event_type": pa.array([f"t{i % 3}" for i in range(n)]),
            "value": pa.array([str(v) for v in vals]).cast(pa.decimal128(12, 4)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))

    qsum = "CAST(SUM(CAST(floor(value * 1.0E6 + 0.5) AS BIGINT)) AS BIGINT)"
    got = {
        (r["event_type"], r["q"])
        for r in load_table(spark, str(d), "events")
        .groupBy("event_type")
        .agg(F.expr(f"{qsum} AS q"))
        .collect()
    }
    con = duckdb.connect()
    want = {
        (t, q)
        for t, q in con.execute(
            "SELECT event_type, "
            "CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1.0E6 + 0.5) AS BIGINT)) AS BIGINT) "
            f"FROM read_parquet('{d}/events.parquet') GROUP BY event_type"
        ).fetchall()
    }
    assert got == want
    # and the decimal-exact DuckDB path (no double cast) agrees too: scale 4
    # values quantize identically whether the *1e6 happens in decimal or
    # double arithmetic
    exact = {
        (t, q)
        for t, q in con.execute(
            "SELECT event_type, "
            "CAST(SUM(CAST(value * 1000000 AS BIGINT)) AS BIGINT) "
            f"FROM read_parquet('{d}/events.parquet') GROUP BY event_type"
        ).fetchall()
    }
    assert got == exact


@pytest.mark.skipif(
    not os.environ.get("NQS_KAFKA_BOOTSTRAP"),
    reason="integration: set NQS_KAFKA_BOOTSTRAP=host:port (and have the "
    "spark-sql-kafka-0-10 connector on the classpath) to round-trip a "
    "micro-batch through a real broker",
)
def test_kafka_roundtrip_against_real_broker(spark, tmp_path) -> None:
    """S1/S6 live-path closure: with a real broker reachable, one micro-batch
    flows out through kafka_sink_writer's payload shaping and back in through
    kafka_events_reader + parse_kafka_events, reproducing the fixture rows
    exactly.  Uses the exact production builders — zero code changes, only
    environment: NQS_KAFKA_BOOTSTRAP=host:port [NQS_KAFKA_TOPIC=name]."""
    import uuid

    from pyspark.sql import functions as F

    from nqs_console_flink_window_spark.sinks.writers import kafka_payload
    from nqs_console_flink_window_spark.sources.batch import load_table
    from nqs_console_flink_window_spark.sources.kafka import (
        kafka_events_reader,
        parse_kafka_events,
    )

    bootstrap = os.environ["NQS_KAFKA_BOOTSTRAP"]
    host, _, port = bootstrap.partition(":")
    topic = os.environ.get("NQS_KAFKA_TOPIC", f"nqs-it-{uuid.uuid4().hex[:8]}")

    events = load_table(spark, SMOKE_SF_DIR, "events").limit(50)
    want = {r["event_id"] for r in events.select("event_id").collect()}

    # start the consumer FIRST (startingOffsets=latest in the production
    # option map), then produce
    parsed = parse_kafka_events(
        kafka_events_reader(
            spark, topic, host, port=port or 9092
        ).load()
    )
    q = (
        parsed.writeStream.format("parquet")
        .option("path", str(tmp_path / "in"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # one-shot batch produce through the same payload shaping the
        # streaming writer uses
        (
            kafka_payload(events)
            .write.format("kafka")
            .option("kafka.bootstrap.servers", f"{host}:{port or 9092}")
            .option("topic", topic)
            .save()
        )
        import time as _t

        deadline = _t.time() + 60
        got: set[int] = set()
        while _t.time() < deadline and got != want:
            q.processAllAvailable()
            back = spark.read.schema(events.schema).parquet(str(tmp_path / "in"))
            got = {r["event_id"] for r in back.select("event_id").collect()}
            if got != want:
                _t.sleep(2)
    finally:
        q.stop()
    assert got == want
