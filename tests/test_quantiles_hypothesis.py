"""Property-based histogram-quantile tests: for arbitrary finite value sets
the estimator's SQL arithmetic (evaluated by DuckDB, the oracle engine) must
satisfy the mid-bin rank bound — the selected rank's order statistic lies in
the chosen bin, so |estimate - order_stat| <= half a bin width — including
the degenerate single-value, tiny-n, duplicate-heavy, and extreme-range
cases.  Spark-vs-DuckDB parity is covered by the registry oracle; the engine
under test here is the shared arithmetic itself."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from nqs_console_flink_window_spark.operators.sketches import (
    HQ_BINS,
    HQ_QS,
    histogram_quantiles_sql,
)

finite = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
)


@settings(max_examples=60, deadline=None)
@given(st.lists(finite, min_size=1, max_size=300))
def test_midbin_estimate_within_half_bin_of_order_stat(vals: list[float]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, value DOUBLE)")
    con.executemany(
        "INSERT INTO events VALUES ('k', ?)", [(v,) for v in vals]
    )
    row = con.execute(histogram_quantiles_sql("duck")).fetchone()
    _, n, *ests = row
    assert n == len(vals)
    xs = sorted(vals)
    half_bin = (xs[-1] - xs[0]) / HQ_BINS / 2
    for (name, _), est in zip(HQ_QS, ests):
        q = {"p50": 0.5, "p90": 0.9, "p99": 0.99}[name]
        t = math.ceil(q * len(xs))
        order_stat = xs[t - 1]
        # exact-equality tolerance for the degenerate mx == mn key;
        # otherwise half a bin width plus a few ulps AT THE VALUE MAGNITUDE:
        # mn + (b+0.5)*w rounds each op to ~|x|*2^-52, so at |x|~1e12 the
        # representable estimate can sit ~1e-4 past the ideal half-bin bound
        # (hypothesis-found: vals [-999664224732.0, -999664306653.5])
        max_abs = max(abs(xs[0]), abs(xs[-1]))
        slack = half_bin + 8.0 * 2.0**-52 * max_abs + 1e-15
        assert abs(est - order_stat) <= slack, (name, est, order_stat, slack)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(finite, min_size=1, max_size=120),
    st.lists(finite, min_size=1, max_size=120),
)
def test_histogram_merge_is_exact(a: list[float], b: list[float]) -> None:
    """SUM of two fixed-domain partial histograms == the one-pass histogram
    of the union — the mergeability the streaming landing relies on."""
    con = duckdb.connect()
    lo, hi = -1e12, 1e12
    w = (hi - lo) / HQ_BINS

    def hist(vals):
        h: dict[int, int] = {}
        for v in vals:
            bin_ix = min(HQ_BINS - 1, max(0, int(math.floor((v - lo) / w))))
            h[bin_ix] = h.get(bin_ix, 0) + 1
        return h

    ha, hb, hu = hist(a), hist(b), hist(a + b)
    merged: dict[int, int] = dict(ha)
    for k, c in hb.items():
        merged[k] = merged.get(k, 0) + c
    assert merged == hu
