"""Reference-shaped message processing (FIXTURES.md 'derived fixtures'):
the actual Kafka payload formats of the three topics as inline fixtures,
run through the schema-driven parse/explode/flatten operators (P1/P3/P4,
N1-N4, W6-W9 surfaces)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from nqs_console_flink_window_spark import schemas as SC

# --- data_upload: JSON ARRAY of fact messages (P1) --------------------------

DATA_UPLOAD_PAYLOAD = json.dumps(
    [
        {
            "probe_id": "p1",
            "task_id": "t1",
            "task_type_name": "PING",
            "task_from": 1,
            "test_time": 1704067200,
        },
        {
            "probe_id": "p2",
            "task_id": "t2",
            "task_type_name": "HTTP",
            "task_from": 1,
            "test_time": 1704067210,
        },
        {"probe_id": None, "task_id": "t3", "task_type_name": "PING",
         "task_from": 1, "test_time": 1704067220},
    ]
)


def test_json_array_explode_and_validate(spark) -> None:
    """P1 — from_json(ArrayType) + explode; P2 — badMsg filter."""
    from pyspark.sql.types import ArrayType

    raw = spark.createDataFrame([(DATA_UPLOAD_PAYLOAD,)], ["value"])

    parsed = raw.select(
        F.explode(F.from_json("value", ArrayType(SC.DATA_MESSAGE_SCHEMA))).alias("m")
    ).select("m.*")
    assert parsed.count() == 3
    valid = parsed.filter(
        F.col("probe_id").isNotNull()
        & F.col("task_id").isNotNull()
        & F.col("task_type_name").isNotNull()
    )
    assert valid.count() == 2


# --- gateway_info: nested object with 4-way fan-out content (P4, R2, W6-W9) -

GW_INFO_PAYLOAD = json.dumps(
    {
        "probe_id": "p9",
        "time": 1704067200,
        "probe_info": {"probe_name": "probe nine", "probe_type": "home"},
        "sgw_info": {
            "loid": "LOID9",
            "pppoe_username": "user9",
            "pon_info": {
                "rx_power": 123456.0,
                "tx_power": 2.0,
                "temperature": 40.0,
                "voltage": 3.3,
                "current": 0.02,
            },
        },
        "status_info": {"cpu_rate": 12.5, "ram_rate": 55.0, "run_time": "9d"},
        "access_type_info": [
            {"access_type_name": "wan1", "connect_status": "connected", "is_default": 1},
            {"access_type_name": "wan2", "connect_status": "down", "is_default": 0},
        ],
        "traffic_info": [
            {"access_type_name": "wan1", "ip": "10.0.0.9", "up_avg": 1.0,
             "up_max": 2.0, "down_avg": 3.0, "down_max": 4.0},
        ],
    }
)


def _gw_info_df(spark):
    raw = spark.createDataFrame([(GW_INFO_PAYLOAD,)], ["value"])
    return raw.select(F.from_json("value", SC.GW_INFO_SCHEMA).alias("m")).select("m.*")


def test_gw_info_nested_flatten(spark) -> None:
    """N4 — dot-path flatten of status_info / sgw_info.pon_info (W8/W9)."""
    df = _gw_info_df(spark)
    row = df.select(
        "probe_id",
        F.col("status_info.cpu_rate").alias("cpu_rate"),
        F.col("sgw_info.pon_info.rx_power").alias("rx_power"),
        F.col("sgw_info.loid").alias("loid"),
    ).collect()[0]
    assert row.cpu_rate == 12.5 and row.rx_power == 123456.0 and row.loid == "LOID9"


def test_traffic_explode(spark) -> None:
    """W7/N3 — traffic_info array explode with traffic_type='wan'."""
    df = _gw_info_df(spark)
    tr = df.select(
        "probe_id", F.explode("traffic_info").alias("t")
    ).select("probe_id", "t.*", F.lit("wan").alias("traffic_type"))
    rows = tr.collect()
    assert len(rows) == 1 and rows[0].traffic_type == "wan" and rows[0].up_max == 2.0


def test_pon_rescale_and_status(spark) -> None:
    """T5 — DT741-csf rescale; T6 — connected->10 quirk."""
    from nqs_console_flink_window_spark.operators.derive import (
        pon_rescale_sql,
        probe_status_sql,
    )

    df = _gw_info_df(spark).select(
        F.col("sgw_info.pon_info.rx_power").alias("rx_power"),
        F.lit("DT741-csf").alias("pc"),
        F.element_at("access_type_info", 1).getField("connect_status").alias("cs"),
    )
    out = df.select(
        F.expr(pon_rescale_sql("rx_power", "pc")).alias("rx"),
        F.expr(probe_status_sql("cs")).alias("status"),
    ).collect()[0]
    assert out.rx == 12.3456 and out.status == 10


def test_pon_rescale_repairs_mojibake_vendor_code(spark) -> None:
    """ProbeInfoThread.java:76-78 — 'ÿÿÿÿ' (uninitialized EEPROM product
    code) is repaired to DT741-csf BEFORE the model conditional, so such
    probes rescale; any other vendor string passes through unscaled."""
    from nqs_console_flink_window_spark.operators.derive import (
        pon_rescale_sql,
        repair_model_sql,
    )

    df = spark.createDataFrame(
        [("ÿÿÿÿ", 123456.0), ("DT741-csf", 123456.0), ("OTHER", 123456.0)],
        "pc string, rx_power double",
    )
    rows = {
        r.pc: (r.repaired, r.rx)
        for r in df.select(
            "pc",
            F.expr(repair_model_sql("pc")).alias("repaired"),
            F.expr(pon_rescale_sql("rx_power", "pc")).alias("rx"),
        ).collect()
    }
    assert rows["ÿÿÿÿ"] == ("DT741-csf", 12.3456)
    assert rows["DT741-csf"] == ("DT741-csf", 12.3456)
    assert rows["OTHER"] == ("OTHER", 123456.0)


def test_fanout_branch_predicates(spark) -> None:
    """R2 — presence-based routing: all four branches fire for this payload."""
    df = _gw_info_df(spark)
    has = df.select(
        F.col("access_type_info").isNotNull().alias("access"),
        F.col("traffic_info").isNotNull().alias("traffic"),
        F.col("status_info").isNotNull().alias("status"),
        F.col("sgw_info.pon_info").isNotNull().alias("pon"),
    ).collect()[0]
    assert all([has.access, has.traffic, has.status, has.pon])


# --- HTTP detail explode with parent-column inheritance (N1) ----------------


def test_http_detail_explode_inherits_parent(spark) -> None:
    from pyspark.sql.types import ArrayType

    detail = [
        {"element_url": "u1", "element_status": 0, "element_size": 100.0,
         "element_download_cost": 50.0, "element_total_cost": 60.0,
         "thread_num": 1, "host_ip": "1.2.3.4", "dns_cost": 5.0,
         "tcp_cost": 5.0, "ssl_cost": 0.0},
        {"element_url": "u2", "element_status": 1, "element_size": 200.0,
         "element_download_cost": 80.0, "element_total_cost": 90.0,
         "thread_num": 2, "host_ip": "5.6.7.8", "dns_cost": 6.0,
         "tcp_cost": 4.0, "ssl_cost": 1.0},
    ]
    parent = spark.createDataFrame(
        [("id1", "p1", "HTTP", json.dumps(detail))],
        ["id", "probe_id", "task_type_name", "detail"],
    )
    exploded = parent.select(
        "id",
        "probe_id",
        F.explode(
            F.from_json("detail", ArrayType(SC.HTTP_DETAIL_ELEMENT_SCHEMA))
        ).alias("e"),
    ).select(
        F.col("id").alias("parent_id"),
        "probe_id",
        F.sha2(F.concat_ws("\x1f", "id", "e.element_url"), 256).alias("id"),
        "e.*",
    )
    rows = exploded.collect()
    assert len(rows) == 2
    assert all(r.parent_id == "id1" and r.probe_id == "p1" for r in rows)
    assert len({r.id for r in rows}) == 2  # fresh deterministic child ids

    # A1 — element aggregations over the array, HOF-side
    agg = parent.select(
        F.expr(
            "size(from_json(detail, 'array<struct<element_status:int,element_size:double>>'))"
        ).alias("elements_sum"),
        F.expr(
            "size(filter(from_json(detail, 'array<struct<element_status:int>>'), x -> x.element_status = 0))"
        ).alias("elements_success_sum"),
        F.expr(
            "aggregate(from_json(detail, 'array<struct<element_size:double>>'), CAST(0.0 AS DOUBLE), (a, x) -> a + x.element_size)"
        ).alias("element_total_size"),
    ).collect()[0]
    assert agg.elements_sum == 2
    assert agg.elements_success_sum == 1
    assert agg.element_total_size == 300.0


def test_fact_schema_projection() -> None:
    """P6 — per-protocol schema projection replaces reflection field copy."""
    base = {f.name for f in SC.fact_schema().fields}
    ping = {f.name for f in SC.fact_schema("PING").fields}
    http = {f.name for f in SC.fact_schema("HTTP").fields}
    assert "rtt" in ping and "rtt" not in base
    assert "page_size" in http and "page_size" not in ping
    assert {"probe_id", "task_id", "test_time", "score", "create_time"} <= base


def test_detail_schema_extensions() -> None:
    """N2 — the declared detail-table capability (gw_dns_detail /
    gw_trace_detail / gw_dns_resolution_detail DDL) exists as schemas."""
    for proto, fields in SC.DETAIL_FIELDS.items():
        names = {f.name for f in fields}
        assert "parent_id" in names, proto
    assert "hops" in {f.name for f in SC.PROTOCOL_FIELDS["TRACE"]}
    assert "rtt" in {f.name for f in SC.DETAIL_FIELDS["TRACE_DETAIL"]}
