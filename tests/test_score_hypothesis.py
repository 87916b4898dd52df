"""Property-based score-compiler tests: for arbitrary float inputs the
compiled SQL (evaluated by DuckDB, the oracle engine) must match the plain
Python golden model within round-2 tolerance."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nqs_console_flink_window_spark.functions.pq_criteria import CRITERIA
from nqs_console_flink_window_spark.functions.score import record_score_sql

from .test_score import golden_score

_VALUES = st.one_of(
    st.floats(min_value=-10.0, max_value=10000.0, allow_nan=False),
    st.sampled_from([0.0, -1.0, 0.01, 0.1, 100.0, 5000.0, 1e7]),
    st.none(),
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=120, deadline=None)
@given(rtt=_VALUES, lost_rate=_VALUES)
def test_ping_score_property(rtt, lost_rate) -> None:
    con = duckdb.connect()
    expr = record_score_sql("PING")
    sel = ", ".join(
        f"CAST({'NULL' if v is None else repr(v)} AS DOUBLE) AS {n}"
        for n, v in [("rtt", rtt), ("lost_rate", lost_rate)]
    )
    got = con.execute(f"SELECT {expr} FROM (SELECT {sel})").fetchone()[0]
    want = golden_score("PING", {"rtt": rtt, "lost_rate": lost_rate})
    assert got == pytest.approx(want, abs=0.011), (rtt, lost_rate)
    assert 0.0 <= got <= 100.0


@settings(max_examples=60, deadline=None)
@given(
    values=st.lists(_VALUES, min_size=4, max_size=4),
    protocol=st.sampled_from(["HTTP", "FLASH", "FTP", "WECHAT", "DNS"]),
)
def test_any_protocol_bounded_and_golden(values, protocol) -> None:
    con = duckdb.connect()
    metrics = [m.name for m in CRITERIA[protocol].metrics]
    vals = dict(zip(metrics, values))
    expr = record_score_sql(protocol)
    sel = ", ".join(
        f"CAST({'NULL' if vals.get(n) is None else repr(vals.get(n))} AS DOUBLE) AS {n}"
        for n in metrics
    )
    got = con.execute(f"SELECT {expr} FROM (SELECT {sel})").fetchone()[0]
    want = golden_score(protocol, vals)
    assert got == pytest.approx(want, abs=0.011), (protocol, vals)
    assert 0.0 <= got <= 100.0
