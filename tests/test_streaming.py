"""Batch/stream parity for the three topologies (the unified-API guarantee)
plus native watermarked streaming aggregation and sink semantics."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from nqs_console_flink_window_spark.config import SMOKE_SF_DIR
from nqs_console_flink_window_spark.sinks import writers as W
from nqs_console_flink_window_spark.sources.batch import load_table
from nqs_console_flink_window_spark.sources.streams import read_events_stream
from nqs_console_flink_window_spark.streaming import jobs as J

_DISPATCH = "CAST(value AS DOUBLE)"  # simple stand-in score for parity runs


def test_fact_stream_matches_batch(spark) -> None:
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    cust = load_table(spark, SMOKE_SF_DIR, "customer")
    batch = J.fact_transform(ev, cust, _DISPATCH)

    work = tempfile.mkdtemp(prefix="nqs_t_")
    J.run_fact_stream(spark, SMOKE_SF_DIR, f"{work}/out", f"{work}/cp", _DISPATCH)
    landed = spark.read.parquet(f"{work}/out").select(*batch.columns)

    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in landed.collect()}
    assert b == s


def test_heartbeat_stream_matches_batch(spark) -> None:
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    cust = load_table(spark, SMOKE_SF_DIR, "customer")
    nat = load_table(spark, SMOKE_SF_DIR, "nation")
    reg_b, hb_b = J.split_register_heartbeat(ev, cust)

    work = tempfile.mkdtemp(prefix="nqs_t_")
    J.run_heartbeat_stream(spark, SMOKE_SF_DIR, f"{work}/out", f"{work}/cp")

    hb_s = spark.read.parquet(f"{work}/out/heartbeat")
    reg_s = spark.read.parquet(f"{work}/out/register")
    assert hb_s.count() == hb_b.count()
    assert reg_s.count() == J.register_rows(reg_b, nat).count()
    # exactly one registration row per unknown probe id
    assert reg_s.select("probe_id").distinct().count() == reg_s.count()


def test_probe_info_fanout_stream(spark) -> None:
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    work = tempfile.mkdtemp(prefix="nqs_t_")
    J.run_probe_info_stream(spark, SMOKE_SF_DIR, f"{work}/out", f"{work}/cp")
    total = ev.count()
    branch_counts = {
        name: spark.read.parquet(f"{work}/out/{name}").count()
        for name in [*J.FANOUT_BRANCHES, "main"]
    }
    assert branch_counts["main"] == total
    assert sum(v for k, v in branch_counts.items() if k != "main") == total


def test_watermarked_window_stream(spark) -> None:
    stream = read_events_stream(spark, SMOKE_SF_DIR)
    agg = J.windowed_counts_stream(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT SUM(cnt) AS n FROM wm_counts").collect()[0].n
    want = load_table(spark, SMOKE_SF_DIR, "events").count()
    assert got == want


def test_ttl_partition_drop(spark, tmp_path) -> None:
    from datetime import date

    ev = load_table(spark, SMOKE_SF_DIR, "events").withColumn(
        "d", F.to_date("ts")
    )
    out = str(tmp_path / "facts")
    W.write_facts(ev, out, "d", shard_key="user_id", shards=4)
    # events span 2024-01-01..30; cutoff ~2024-01-14 drops the first half
    total = ev.count()
    dropped = W.drop_expired_partitions(out, "d", keep_months=3, today=date(2024, 4, 14))
    assert len(dropped) > 0
    remaining = spark.read.parquet(out).count()
    assert 0 < remaining < total


def test_kafka_payload_shape(spark) -> None:
    ev = load_table(spark, SMOKE_SF_DIR, "events").limit(5)
    payload = W.kafka_payload(ev).collect()
    import json

    for r in payload:
        obj = json.loads(r.value)
        assert "event_id" in obj and "event_type" in obj
