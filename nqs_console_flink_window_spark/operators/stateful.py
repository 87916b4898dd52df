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


COUNT_OR_TIME_OUTPUT = (
    "key string, fire_seq bigint, n_records bigint, sum_value double, reason string"
)
COUNT_OR_TIME_STATE = "pending bigint, pending_sum double, fired bigint"


def count_or_time_fires(
    stream_df: DataFrame,
    key_col: str,
    value_col: str = "value",
    max_count: int = 1000,
    timeout_ms: int = 10_000,
) -> DataFrame:
    """W2 — the reference's count-or-time trigger as a literal stateful
    operator (time/TimeCountMessageTrigger.java:46-104): per key, a window
    "fires" (emits an aggregate row and purges its state) as soon as the
    buffered record count reaches ``max_count``, or when ``timeout_ms`` of
    processing time passes with pending records — whichever comes first.

    This is the exact FIRE_AND_PURGE semantics of the reference trigger
    (count path = onElement >= maxCount; time path = onProcessingTime before
    window end), expressed with ``applyInPandasWithState`` +
    ``ProcessingTimeTimeout``.  State is two scalars per key (pending count
    and pending sum) — bounded, RocksDB-friendly; the rows themselves are
    aggregated on arrival, never buffered.

    The operational analogue for plain batching remains the
    trigger/input-cap pair (streaming/jobs.py); use this when fire-exactly-
    at-N semantics are genuinely required.

    Run it under a processing-time trigger and stop explicitly: wall-clock
    timers keep an ``availableNow`` drain alive indefinitely (the trigger
    never reports "done" while timeouts are outstanding), which is the same
    live-clock requirement the reference trigger has.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            pending, pending_sum, fired = state.get
            state.remove()
            if pending > 0:
                yield pd.DataFrame(
                    {
                        "key": [key[0]],
                        "fire_seq": [fired],
                        "n_records": [pending],
                        "sum_value": [pending_sum],
                        "reason": ["time"],
                    }
                )
            return
        pending, pending_sum, fired = state.get if state.exists else (0, 0.0, 0)
        out = []
        for pdf in pdfs:
            # aggregate-on-arrival: count/sum only, rows are not buffered
            pending += len(pdf)
            pending_sum += float(pdf[value_col].sum())
            while pending >= max_count:
                # FIRE_AND_PURGE at exactly max_count (count path).  The
                # per-fire sum is apportioned pro rata — the reference's
                # trigger emits the *batch* downstream; here the aggregate
                # is the demonstration payload.
                fire_sum = pending_sum * (max_count / pending)
                out.append((key[0], fired, max_count, fire_sum, "count"))
                pending -= max_count
                pending_sum -= fire_sum
                fired += 1
        state.update((pending, pending_sum, fired))
        state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=["key", "fire_seq", "n_records", "sum_value", "reason"],
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        COUNT_OR_TIME_OUTPUT,
        COUNT_OR_TIME_STATE,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


SEEN_ROUTER_OUTPUT = "key string, route string, n_records bigint"
SEEN_ROUTER_STATE = "last_seen_ms bigint"


def seen_router_stream(
    stream_df: DataFrame, key_col: str, ttl_ms: int = 60_000
) -> DataFrame:
    """R1 with the reference's Redis-TTL semantics, state-store native: the
    exists-check that routes a probe's first message to the register branch
    and later messages to heartbeat (ProbeExistsCheck — Redis SETEX seen-key
    with TTL; expiry makes the probe re-register).

    The seen-marker here is per-key state holding the last-seen wall-clock
    time: a batch whose arrival is more than ``ttl_ms`` after the marker
    re-registers, exactly like a lapsed Redis key — and every batch slides
    the TTL forward, like SETEX-on-write.  Expiry is judged purely from the
    stored timestamp (NoTimeout), so the operator runs under any trigger,
    including ``availableNow`` drains — wall-clock timers would pin the
    query alive (see ``count_or_time_fires``).  The cost: state for keys
    that never return is not timer-GC'd; a long-lived deployment pairs this
    with ``ProcessingTimeTimeout`` GC under a live processing-time trigger
    (the ``count_or_time_fires`` pattern) or a periodic checkpoint rewrite.

    Batch analogue (driver-gated): the ``exists_router`` query computes the
    same routing with a dim anti-join.
    """
    import time as _time

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state) -> Iterable[pd.DataFrame]:
        now_ms = int(_time.time() * 1000)
        expired = (not state.exists) or (now_ms - state.get[0] > ttl_ms)
        n = sum(len(p) for p in pdfs)
        if n == 0:
            return
        state.update((now_ms,))
        if expired:
            out = [(key[0], "register", 1)]
            if n > 1:
                out.append((key[0], "heartbeat", n - 1))
        else:
            out = [(key[0], "heartbeat", n)]
        yield pd.DataFrame(out, columns=["key", "route", "n_records"])

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        SEEN_ROUTER_OUTPUT,
        SEEN_ROUTER_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def seen_router_tws(
    stream_df: DataFrame, key_col: str, ttl_ms: int = 60_000
) -> DataFrame:
    """``seen_router_stream`` on the Spark 4 ``transformWithStateInPandas``
    API: the TTL lives in the state store itself (``getValueState(...,
    ttlDurationMs=...)``) instead of being re-derived from a stored
    timestamp — the closest native analogue of the reference's Redis SETEX
    seen-marker (ProbeExistsCheck): every update slides the TTL forward,
    and a key silent past the TTL reads as absent, so its next message
    re-registers.

    Requires the RocksDB state-store provider (transformWithState is
    RocksDB-only; the JNI jar ships with Spark) — callers/tests set
    ``spark.sql.streaming.stateStore.providerClass`` accordingly.  TTL
    expiry is judged passively at state *read* time from the stored expiry
    stamp, so ``availableNow`` drains work (no wall-clock timers held).

    Environment note: the transformWithState Python worker talks protobuf
    to the JVM state server, so the ``protobuf`` wheel must be installed
    (the pytest gates itself with ``importorskip``); the
    ``applyInPandasWithState`` form above has no such dependency and is the
    default in this repo.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _SeenTTL(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "last_ms LONG", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(p) for p in rows)
            if n == 0:
                return
            known = self._seen.exists()
            self._seen.update(
                (int(timerValues.getCurrentProcessingTimeInMs()),)
            )
            if known:
                out = [(key[0], "heartbeat", n)]
            else:
                out = [(key[0], "register", 1)]
                if n > 1:
                    out.append((key[0], "heartbeat", n - 1))
            yield pd.DataFrame(out, columns=["key", "route", "n_records"])

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_SeenTTL(),
        outputStructType=SEEN_ROUTER_OUTPUT,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
