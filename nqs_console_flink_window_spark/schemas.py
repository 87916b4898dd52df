"""Explicit StructType schemas (SURVEY §1.2) — the rebuild's replacement for
the reference's dynamic-but-convention-fixed JSON/POJO/DDL triangle.

Sources of truth in the reference (paths relative to /root/reference):
- fact base + per-protocol metric columns: POJO fields at
  nqs-gen/src/main/java/com/eystar/gen/entity/gwdata/GwData.java:8-137 and
  subclasses GwPingData/GwHttpData/GwDnsData/GwFlashData
- sink tables: nqs-gen/src/main/resources/ClickHouse建表定稿修改版.txt
  (c_p_heartbeat :3-28, c_p_pinfo :30-75, c_p_traffic :77-103,
  c_p_status :104-126, c_p_pon :128-152, gw_* :153+)
- message shapes: handler/message/{DataMessage,HeartBeatMessage,
  GwInfoMessage}.java

Naming: snake_case throughout (the reference's camelCase<->snake bridge
ChangeChar.java is deliberately collapsed — SURVEY §2.2 P8).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S, L, D, I = T.StringType(), T.LongType(), T.DoubleType(), T.IntegerType()
TS = T.TimestampType()

# ---------------------------------------------------------------------------
# Fact base (GwData.java:8-137 / every gw_* table)
# ---------------------------------------------------------------------------

FACT_BASE_FIELDS = [
    _f("id", S, nullable=False),
    _f("probe_id", S, nullable=False),
    _f("probe_name", S),
    _f("probe_ip", S),
    _f("probe_alias", S),
    _f("pppoe_username", S),
    _f("vendor", S),
    _f("pc", S),
    _f("loid", S),
    _f("serial_num", S),
    _f("task_param_id", S, nullable=False),
    _f("task_param_name", S),
    _f("task_type_name", S),
    _f("task_id", S, nullable=False),
    _f("task_md5", S),
    _f("access_type_name", S),
    _f("test_time", L, nullable=False),
    _f("test_time_d", L, nullable=False),
    _f("test_time_h", L),
    _f("test_time_m", L),
    _f("test_time_w", L),
    _f("dest_id", S),
    _f("dest_name", S),
    _f("dest_addr", S),
    _f("province_code", L),
    _f("province_name", S),
    _f("city_code", L),
    _f("city_name", S),
    _f("district_code", L),
    _f("district_name", S),
    _f("town_code", L),
    _f("town_name", S),
    _f("task_from", L),
    _f("host_province", S),
    _f("host_city", S),
    _f("operator", S),
    _f("net_type", L),
    _f("is_alarm", L),
    _f("alarm_info", S),
    _f("score", D),
    _f("host_ip", S),
    _f("error_code", L),
    _f("test_time_par", TS),
    _f("create_time", L, nullable=False),
]

# Per-protocol metric extensions (subclass POJOs).
PROTOCOL_FIELDS: dict[str, list[T.StructField]] = {
    "PING": [_f("rtt", D), _f("jitter", D), _f("lost_rate", D), _f("real_ip", S),
             _f("jump_iplist", S)],
    "HTTP": [
        _f("detail", S),  # JSON array string, exploded into gw_http_detail (N1)
        _f("tcp_cost", D), _f("page_avg_speed", D), _f("elements_localnet_rate", D),
        _f("elements_success_rate", D), _f("ssl_cost", D), _f("dns_cost", D),
        _f("element_load_cost", D), _f("page_total_cost", D), _f("first_byte_cost", D),
        _f("first_screen_cost", D), _f("text_cost", D), _f("avg_speed", D),
        _f("page_size", D), _f("trans_body_cost", D), _f("conn_cost", D),
        _f("elements_sum", I), _f("elements_success_sum", I), _f("elements_fail_sum", I),
        _f("http_code", I), _f("elements_localnet_sum", I),
    ],
    "DNS": [_f("time_cost", D), _f("success_rate", D), _f("detail", S)],
    "FLASH": [
        _f("real_url", S), _f("conn_cost", D), _f("dns_cost", D), _f("buffer_cost", D),
        _f("content_size", D), _f("avg_speed", D), _f("first_byte_cost", D),
        _f("first_pause_cost", D), _f("bitrate", D), _f("play_duration", D),
        _f("pause_cost", D), _f("pause_count", D), _f("carlton_rate", D),
    ],
    # gw_trace DDL :733-790
    "TRACE": [_f("delay", D), _f("hops", I), _f("detail", S), _f("domain_detail", S)],
    # gw_dns_resolution DDL :274-330
    "DNS_RESOLUTION": [_f("time_cost", D), _f("success_rate", D), _f("ip_list", S)],
}

# Child (detail) table extensions: every detail row inherits the full fact
# base (reflection copy in DetailAbstractDataParser.java:35-75 ->
# parent-column select here) plus `parent_id` and these per-protocol columns.
DETAIL_FIELDS: dict[str, list[T.StructField]] = {
    # gw_http_detail DDL :661-732 (per-element columns mirror
    # HTTP_DETAIL_ELEMENT_SCHEMA below)
    "HTTP_DETAIL": [
        _f("parent_id", S), _f("element_url", S), _f("element_status", I),
        _f("element_size", D), _f("element_download_cost", D),
        _f("element_total_cost", D), _f("thread_num", I), _f("dns_cost", D),
        _f("tcp_cost", D), _f("ssl_cost", D), _f("conn_cost", D),
        _f("avg_speed", D),
    ],
    # gw_dns_detail DDL :210-272
    "DNS_DETAIL": [
        _f("parent_id", S), _f("dns_cost", D), _f("dns_domain", S), _f("dns_ip", S),
        _f("ip_list", S), _f("record_count", L), _f("success_rate", D), _f("detail", S),
    ],
    # gw_dns_resolution_detail DDL :331-390
    "DNS_RESOLUTION_DETAIL": [
        _f("parent_id", S), _f("dns_server_ip", S), _f("query_count", L),
        _f("time_cost", D), _f("success_rate", D), _f("ip_list", S),
    ],
    # gw_trace_detail DDL :791-856
    "TRACE_DETAIL": [
        _f("parent_id", S), _f("delay", D), _f("hops", I), _f("host_name", S),
        _f("jitter", D), _f("lost_rate", D), _f("memo", S), _f("num", I),
        _f("pkt_count", I), _f("ret_code", S), _f("ret_type", S), _f("rtt", D),
        _f("detail", S),
    ],
}


def fact_schema(protocol: str | None = None) -> T.StructType:
    """P6 — schema projection by protocol: the StructType replacement for the
    reflection field copy (AbstractDataParser.java:111-144)."""
    fields = list(FACT_BASE_FIELDS)
    if protocol and protocol in PROTOCOL_FIELDS:
        fields += PROTOCOL_FIELDS[protocol]
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Probe-ops sink tables (DDL :3-152) — ORDER BY (probe_id, timesheet),
# PARTITION BY timesheet_d, ReplacingMergeTree(create_time)
# ---------------------------------------------------------------------------

HEARTBEAT_SCHEMA = T.StructType([
    _f("id", S, nullable=False), _f("heartbeat_time", L, nullable=False),
    _f("internet_ip", S), _f("probe_id", S, nullable=False), _f("so_ver", S),
    _f("soft_ver", S), _f("task_queue_size", L), _f("task_size", L),
    _f("probe_name", S), _f("probe_type", S), _f("type", L),
    _f("heartbeat_time_par", TS), _f("heartbeat_time_d", L),
    _f("heartbeat_time_h", L), _f("heartbeat_time_m", L), _f("heartbeat_time_w", L),
    _f("create_time", L, nullable=False),
])

PINFO_SCHEMA = T.StructType([
    _f("id", S, nullable=False), _f("access_type_info", S), _f("neighbor_info", S),
    _f("probe_id", S, nullable=False), _f("probe_info", S), _f("sgw_info", S),
    _f("status_info", S), _f("traffic_info", S), _f("timesheet", L, nullable=False),
    _f("timesheet_par", TS), _f("timesheet_d", L), _f("timesheet_h", L),
    _f("timesheet_m", L), _f("timesheet_w", L), _f("create_time", L, nullable=False),
])

TRAFFIC_SCHEMA = T.StructType([
    _f("id", S, nullable=False), _f("access_type_name", S), _f("down_avg", D),
    _f("down_max", D), _f("ip", S), _f("probe_id", S, nullable=False),
    _f("timesheet", L, nullable=False), _f("traffic_type", S), _f("up_avg", D),
    _f("up_max", D), _f("timesheet_par", TS), _f("timesheet_d", L),
    _f("timesheet_h", L), _f("timesheet_m", L), _f("timesheet_w", L),
    _f("create_time", L, nullable=False),
])

STATUS_SCHEMA = T.StructType([
    _f("id", S, nullable=False), _f("cpu_rate", D), _f("probe_id", S, nullable=False),
    _f("ram_rate", D), _f("run_time", S), _f("timesheet", L, nullable=False),
    _f("timesheet_par", TS), _f("timesheet_d", L), _f("timesheet_h", L),
    _f("timesheet_m", L), _f("timesheet_w", L), _f("create_time", L, nullable=False),
])

PON_SCHEMA = T.StructType([
    _f("id", S, nullable=False), _f("current", D), _f("probe_id", S, nullable=False),
    _f("rx_power", D), _f("temperature", D), _f("tx_power", D),
    _f("timesheet", L, nullable=False), _f("voltage", D), _f("timesheet_par", TS),
    _f("timesheet_d", L), _f("timesheet_h", L), _f("timesheet_m", L),
    _f("timesheet_w", L), _f("create_time", L, nullable=False),
])

# ---------------------------------------------------------------------------
# Inbound message shapes (the three Kafka topics)
# ---------------------------------------------------------------------------

# data_upload element (DataMessage.java:12-47); payload is a JSON *array* of
# these (P1).  Protocol metric fields ride in the open `metrics` map-like
# remainder — parsed per protocol with fact_schema(protocol).
DATA_MESSAGE_SCHEMA = T.StructType([
    _f("probe_id", S), _f("task_id", S), _f("task_type_name", S),
    _f("task_from", L), _f("test_time", L),
])

# heartbeat_info: json '\x02' internet_ip ['\x02' recv_time] (P3,
# HeartBeatMessage.java:14-33); the JSON part:
HEARTBEAT_MESSAGE_SCHEMA = T.StructType([
    _f("info", T.StructType([
        _f("id", S), _f("soft_ver", S), _f("so_ver", S),
        _f("task_queue_size", L), _f("task_size", L),
    ])),
    _f("probe_id", S), _f("time", L),
])

# gateway_info (GwInfoMessage.java:8-28 + ProbeInfoProcess.java:53-81)
GW_INFO_SCHEMA = T.StructType([
    _f("probe_id", S), _f("time", L),
    _f("probe_info", T.StructType([_f("probe_name", S), _f("probe_type", S)])),
    _f("sgw_info", T.StructType([
        _f("loid", S), _f("pppoe_username", S),
        _f("pon_info", T.StructType([
            _f("rx_power", D), _f("tx_power", D), _f("temperature", D),
            _f("voltage", D), _f("current", D),
        ])),
    ])),
    _f("status_info", T.StructType([
        _f("cpu_rate", D), _f("ram_rate", D), _f("run_time", S),
    ])),
    _f("access_type_info", T.ArrayType(T.StructType([
        _f("access_type_name", S), _f("connect_status", S), _f("is_default", I),
    ]))),
    _f("traffic_info", T.ArrayType(T.StructType([
        _f("access_type_name", S), _f("ip", S), _f("up_avg", D), _f("up_max", D),
        _f("down_avg", D), _f("down_max", D),
    ]))),
])

# HTTP detail element (GwHttpDetailData.java:11-60), exploded to
# gw_http_detail (N1)
HTTP_DETAIL_ELEMENT_SCHEMA = T.StructType([
    _f("element_url", S), _f("element_status", I), _f("element_size", D),
    _f("element_download_cost", D), _f("element_total_cost", D),
    _f("thread_num", I), _f("host_ip", S), _f("dns_cost", D), _f("tcp_cost", D),
    _f("ssl_cost", D),
])
