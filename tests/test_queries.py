"""Every registered query must match its DuckDB oracle at sf0.001 (the fast
local gate; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from nqs_console_flink_window_spark.config import SMOKE_SF_DIR
from nqs_console_flink_window_spark.plans import all as _all  # noqa: F401
from nqs_console_flink_window_spark.plans.registry import REGISTRY

from .conftest import assert_frames_match


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name: str, spark, duck) -> None:
    q = REGISTRY[name]
    sdf = q.spark(spark, SMOKE_SF_DIR)
    if q.sql is None:
        assert sdf.count() >= 0
        return
    assert_frames_match(sdf, duck.execute(q.sql).fetchdf())


def test_entry_smoke(spark) -> None:
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    names = set(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= names
