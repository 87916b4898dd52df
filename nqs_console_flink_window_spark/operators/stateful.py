"""Custom stateful streaming operators (SURVEY §2.4 W10).

The reference's only keyed state is the ReducingState counter inside its
count-or-time trigger (time/TimeCountMessageTrigger.java:46-104).  The
Spark-native replacement for *operational* batching is the trigger/input-cap
pair (see streaming/jobs.py); this module provides the *literal* capability
— arbitrary per-key state across micro-batches — via
``applyInPandasWithState`` for pipelines that genuinely need it (running
counters, cross-batch dedup, custom sessionization).

Scale notes: state lives in the state store (RocksDB-backed on a real
cluster), partitioned by key — the same sharding as the aggregation shuffle.
Keep state values bounded (counters/ids, not row buffers).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

RUNNING_COUNT_OUTPUT = "key string, batch_rows bigint, running_total bigint"
RUNNING_COUNT_STATE = "total bigint"


def running_counts(stream_df: DataFrame, key_col: str) -> DataFrame:
    """Per-key running row count across micro-batches — the ReducingState
    counter re-expressed.  Emits one row per (key, micro-batch) with the
    batch's row count and the all-time total."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state) -> Iterable[pd.DataFrame]:
        rows = sum(len(p) for p in pdfs)
        total = (state.get[0] if state.exists else 0) + rows
        state.update((total,))
        yield pd.DataFrame(
            {"key": [key[0]], "batch_rows": [rows], "running_total": [total]}
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        RUNNING_COUNT_OUTPUT,
        RUNNING_COUNT_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def per_key_trend(df: DataFrame, key_col: str, x_col: str, y_col: str) -> DataFrame:
    """Grouped-map pandas operator (applyInPandas): least-squares slope of
    y over x per key — the custom-analytics escape hatch for logic the SQL
    surface can't express.  Arrow-batched; one numpy solve per key."""
    import numpy as np

    out_schema = f"{key_col} bigint, slope double, n bigint"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        if n < 2 or np.ptp(x) == 0.0:
            slope = 0.0
        else:
            slope = float(np.polyfit(x, y, 1)[0])
        return pd.DataFrame({key_col: [pdf[key_col].iloc[0]], "slope": [slope], "n": [n]})

    return df.groupBy(key_col).applyInPandas(fit, out_schema)
