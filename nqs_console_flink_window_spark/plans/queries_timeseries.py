"""Time-series operators the reference performs implicitly or that a
hypertable-style deployment needs explicitly: event-time as-of join
(point-in-time state lookup) and continuous-aggregate rollup cascades.

- ``asof_state_join``: the event-time-correct form of the reference's
  process-time mutable-dim probes (``AbstractDataParser.java`` probe/task
  lookups hit MySQL state that ``ProbeHelper`` upserts concurrently; batch
  reprocessing must instead ask "what was the state *when the event
  happened*").  See ``operators/asof.py`` for the one-shuffle union+window
  formulation.
- ``rollup_cascade``: TimescaleDB/ClickHouse-style multi-resolution
  rollup — aggregate raw events to 1-minute buckets once, then answer
  hour-level queries by re-aggregating the minute materialization.  At
  100 TB the minute rollup is ~1/600th of raw, so downstream aggregations
  read 2-3 orders of magnitude less data; exactness across the cascade is
  guaranteed by keeping the partial sums in DECIMAL (associative) until
  the final cast, per the repo-wide float discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.batch import load_table
from .registry import register

# --------------------------------------------------------------------------
# As-of join: each 'click' event sees the latest 'view' state value of the
# same user at-or-before its timestamp (NULL before the first view).
# --------------------------------------------------------------------------


@register(
    "asof_state_join",
    sql="""
WITH unioned AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ats, 0 AS tag, event_id AS tie,
         value AS uval, CAST(NULL AS BIGINT) AS fact_id,
         CAST(NULL AS DOUBLE) AS fvalue
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ats, 1 AS tag, 0 AS tie,
         CAST(NULL AS DOUBLE) AS uval, event_id AS fact_id, value AS fvalue
  FROM events WHERE event_type = 'click'
), carried AS (
  SELECT user_id, tag, fact_id, fvalue, ats,
    last_value(uval IGNORE NULLS) OVER w AS state_value,
    last_value(CASE WHEN tag = 0 THEN ats END IGNORE NULLS) OVER w
      AS state_ts
  FROM unioned
  WINDOW w AS (PARTITION BY user_id ORDER BY ats, tag, tie
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT fact_id AS event_id, user_id, ats AS ts, fvalue AS value,
       state_value, state_ts
FROM carried WHERE tag = 1
""",
    doc="as-of join — point-in-time state lookup (event-time-correct form "
    "of the reference's process-time MySQL dim probes, "
    "AbstractDataParser.java probe/task lookups + ProbeHelper upserts); "
    "one-shuffle union+window, operators/asof.py",
)
def asof_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    states = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    facts = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        facts,
        states,
        key="user_id",
        ts="ts",
        value_cols=["value"],
        state_tiebreak=F.col("event_id"),
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("value_asof").alias("state_value"),
        F.col("ts_asof").alias("state_ts"),
    )


# --------------------------------------------------------------------------
# Continuous-aggregate rollup cascade: raw -> 1-minute -> 1-hour.  The
# Spark side answers the hour query FROM THE MINUTE ROLLUP; the oracle
# aggregates raw directly — equality proves the cascade is exact (decimal
# partials are associative; a double-summed cascade would drift).
# --------------------------------------------------------------------------


@register(
    "rollup_cascade",
    sql="""
SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_h,
  COUNT(*) AS cnt,
  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    doc="hypertable rollup cascade — hour-level answer computed by "
    "re-aggregating a 1-minute materialization (TimescaleDB continuous "
    "aggregate shape); oracle aggregates raw directly, equality proves "
    "decimal-partial exactness across the cascade; the underlying "
    "decimal-exact bucketed aggregation is driver-gated via "
    "tumbling_window_10s/pricing_summary",
    tier=2,
)
def rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("bucket_m")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("dsum"),
    )
    return minute.groupBy(
        "event_type", F.date_trunc("hour", "bucket_m").alias("bucket_h")
    ).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("dsum").cast("double").alias("sum_value"),
    )
