"""Engine-level constants mirrored from the reference configuration.

Every value cites the reference file it was read from (paths relative to
/root/reference).  Nothing here is loaded from an external service — the
reference's Spring/Redis/MySQL config surface collapses to plain constants
plus per-job parameters.
"""

from __future__ import annotations

import os

# Clock-skew repair threshold in seconds.  Reference: the probe time offset
# check |now - reported| > 108000 s used at
# nqs-console/.../handler/message/DataMessage.java:16-19 and
# handler/probe/WindowHeartbeatProcessFunction.java:82-89
# (config key `gw-console.probe.time.offset`).
CLOCK_SKEW_MAX_SECONDS = 108_000

# Reference window cadence: 10 s tumbling processing-time windows fired early
# at >= 1000 records (startup/ConsoleTaskDataMain.java:83,
# time/TimeCountMessageTrigger.java:51-53).  In Structured Streaming the
# analogues are the micro-batch trigger interval and the per-trigger input cap.
WINDOW_SECONDS = 10
COUNT_TRIGGER_MAX = 1_000

# Storage retention in the reference ClickHouse DDL: day partitions with a
# 3-month TTL (nqs-gen/.../ClickHouse建表定稿修改版.txt:22-28).
RETENTION_MONTHS = 3

# Deterministic "now" used by tests/oracles so clock-repair (P5) and
# create_time stamping are reproducible.  2024-01-15T12:00:00Z — inside the
# events fixture's time range so the repair predicate exercises both branches.
FIXED_NOW_EPOCH = 1_705_320_000

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
