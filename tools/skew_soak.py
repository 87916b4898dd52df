"""Skewed-key soak — the reference keys its streams by ``task_type_name``
(ConsoleTaskDataMain.java:81), ~13 protocol values; at 100x one protocol
realistically dominates.  This harness measures what that does to the
enrichment/window path:

Builds TWO 10x event fixtures from sf0.1 (dims copied unchanged):
- **uniform**: plain replication (the standard soak shape);
- **skewed**: same row count, but 80% of rows reassigned to ONE hot
  event_type (deterministic hash coin — no RNG).

Runs ``enrich_events`` / ``tumbling_window_10s`` / ``nqs_fact_pipeline``
on both, with AQE on (session default) and off, plus the salted
aggregation form (operators/skew.salted_sum_count) on the skewed fixture
as the mitigation reference point.  Prints one JSON line of wall times
and skew/uniform ratios.

Usage: python tools/skew_soak.py [K]   (default K=10)
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from nqs_console_flink_window_spark.config import TABLE_NAMES  # noqa: E402
from nqs_console_flink_window_spark.plans import all as _all  # noqa: E402,F401
from nqs_console_flink_window_spark.plans.registry import REGISTRY  # noqa: E402
from nqs_console_flink_window_spark.session import get_spark  # noqa: E402
from nqs_console_flink_window_spark.sources.batch import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
QUERIES = ("enrich_events", "tumbling_window_10s", "nqs_fact_pipeline")


def build(spark, k: int, out: str, skew: bool) -> None:
    ev = load_table(spark, BASE, "events")
    off = ev.agg(F.max("event_id")).first()[0] + 1
    hot = ev.select("event_type").first()["event_type"]
    parts = []
    for r in range(k):
        d = ev.withColumn("event_id", (F.col("event_id") + F.lit(r * off)).cast("long"))
        parts.append(d)
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    if skew:
        # 80% of rows land on the hot key, deterministically by event_id
        scaled = scaled.withColumn(
            "event_type",
            F.when(F.col("event_id") % 10 < 8, F.lit(hot)).otherwise(
                F.col("event_type")
            ),
        )
    scaled.write.mode("overwrite").parquet(f"{out}/events.parquet")
    for t in TABLE_NAMES:
        if t != "events":
            load_table(spark, BASE, t).write.mode("overwrite").parquet(
                f"{out}/{t}.parquet"
            )


def run(spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in QUERIES:
        q = REGISTRY[name]
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("nqs-skew-soak")
    tmp = tempfile.mkdtemp(prefix="nqs_skew_")
    try:
        uni_dir, skew_dir = f"{tmp}/uniform", f"{tmp}/skewed"
        build(spark, k, uni_dir, skew=False)
        build(spark, k, skew_dir, skew=True)
        result: dict = {"k": k}
        for aqe in (True, False):
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            uni = run(spark, uni_dir)
            skw = run(spark, skew_dir)
            result[f"aqe_{'on' if aqe else 'off'}"] = {
                name: {
                    "uniform_sec": uni[name],
                    "skewed_sec": skw[name],
                    "skew_ratio": round(skw[name] / uni[name], 2),
                }
                for name in QUERIES
            }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        # mitigation reference: the salted two-phase aggregate on the same
        # skewed events (what the window agg would switch to if skew bit)
        from nqs_console_flink_window_spark.operators.skew import salted_sum_count

        ev = load_table(spark, skew_dir, "events")
        salted_sum_count(ev, ["event_type"], "value").write.mode(
            "overwrite"
        ).format("noop").save()
        t0 = time.perf_counter()
        salted_sum_count(ev, ["event_type"], "value").write.mode(
            "overwrite"
        ).format("noop").save()
        result["salted_agg_on_skewed_sec"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(result))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
