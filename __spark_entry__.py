"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``nqs_console_flink_window_spark``; this file just
re-exports the query registry (``plans/registry.py``).
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = pathlib.Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from nqs_console_flink_window_spark.config import SMOKE_SF_DIR  # noqa: E402
from nqs_console_flink_window_spark.plans import all as _all_queries  # noqa: E402,F401
from nqs_console_flink_window_spark.plans.registry import REGISTRY, driver_registry  # noqa: E402
from nqs_console_flink_window_spark.session import tune  # noqa: E402


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)  # runtime-settable conf only (UTC session tz, AQE, broadcast)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return REGISTRY["nqs_fact_pipeline"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Tier-1 only: the driver's gate checks the first 50 queries() entries,
    # so the driver surface is exactly the <=50 tier-1 registrations
    # (tier-2 redundant forms stay check_oracle/pytest-gated).
    return {name: _wrap(q.spark) for name, q in driver_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.sql for name, q in driver_registry().items() if q.sql is not None
    }
