"""Physical-plan regression guards: the properties that make these queries
scale (broadcast joins, scan pruning/pushdown, top-k without full sort,
map-side partial aggregation) must stay visible in the executed plans."""

from __future__ import annotations

from nqs_console_flink_window_spark.config import SMOKE_SF_DIR
from nqs_console_flink_window_spark.plans import all as _all  # noqa: F401
from nqs_console_flink_window_spark.plans.registry import REGISTRY


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SMOKE_SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_enrich_uses_broadcast_join(spark) -> None:
    plan = _plan(spark, "enrich_events")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle the stream


def test_flagship_single_shuffle(spark) -> None:
    plan = _plan(spark, "nqs_fact_pipeline")
    assert "BroadcastHashJoin" in plan
    # exactly one data shuffle: the final window aggregation
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_pricing_summary_prunes_and_pushes(spark) -> None:
    df = REGISTRY["pricing_summary"].spark(spark, SMOKE_SF_DIR)
    scan = df._jdf.queryExecution().executedPlan().toString()
    # column pruning: only the 7 needed columns reach the scan
    assert "l_partkey" not in scan and "l_suppkey" not in scan
    assert "PushedFilters" in scan or "PartitionFilters" in scan


def test_topk_avoids_global_sort(spark) -> None:
    plan = _plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan  # per-partition top-k + merge


def test_agg_is_partial_then_final(spark) -> None:
    plan = _plan(spark, "tumbling_window_10s")
    assert plan.count("HashAggregate") >= 2  # map-side partial combine
