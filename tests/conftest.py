from __future__ import annotations

import pathlib
import sys

import duckdb
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from nqs_console_flink_window_spark.config import SMOKE_SF_DIR, TABLE_NAMES  # noqa: E402
from nqs_console_flink_window_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nqs-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SMOKE_SF_DIR}/{t}.parquet')"
        )
    yield con


def assert_frames_match(spark_df, duck_df):
    """Order-insensitive exact comparison (mirrors tools/check_oracle.py)."""
    import pandas as pd

    s = spark_df if isinstance(spark_df, pd.DataFrame) else spark_df.toPandas()
    d = duck_df
    assert sorted(s.columns) == sorted(d.columns), (sorted(s.columns), sorted(d.columns))
    assert len(s) == len(d), (len(s), len(d))
    s = s.reindex(sorted(s.columns), axis=1).sort_values(by=list(sorted(s.columns))).reset_index(drop=True)
    d = d.reindex(sorted(d.columns), axis=1).sort_values(by=list(sorted(d.columns))).reset_index(drop=True)
    for col in s.columns:
        sc, dc = s[col], d[col]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(dc):
            assert (sc.astype(float) - dc.astype(float)).abs().max() == 0.0, col
        else:
            assert (sc.astype(str) == dc.astype(str)).all(), col
