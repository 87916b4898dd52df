"""Semantic tests for the corpus-hygiene operators (decontaminate,
repetition_filter) and the SCD2 history rebuild — each verified against an
independent pure-Python recomputation (a third implementation besides the
Spark plan and the DuckDB oracle), so a shared SQL-level mistake in the
query/oracle pair cannot hide."""

from __future__ import annotations

import math

import duckdb

from nqs_console_flink_window_spark.config import SMOKE_SF_DIR
from nqs_console_flink_window_spark.operators.decontaminate import (
    DECON_NGRAM,
    EVAL_MOD,
)
from nqs_console_flink_window_spark.plans import all as _all  # noqa: F401
from nqs_console_flink_window_spark.plans.registry import REGISTRY


def _fround6(x: float) -> float:
    return math.floor(x * 1.0e6 + 0.5) / 1.0e6


def _docs() -> list[tuple[int, str, int]]:
    return duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM "
        f"read_parquet('{SMOKE_SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


def _grams(text: str, n: int) -> list[str]:
    toks = text.lower().split(" ")
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_decontaminate_matches_python_sets(spark) -> None:
    out = {
        int(r["doc_id"]): r
        for r in REGISTRY["decontaminate"]
        .spark(spark, SMOKE_SF_DIR)
        .toPandas()
        .to_dict("records")
    }
    eval_grams: set[str] = set()
    corpus: dict[int, list[str]] = {}
    for doc_id, text, _ in _docs():
        g = _grams(text, DECON_NGRAM)
        if not g:
            continue
        if doc_id % EVAL_MOD == 0:
            eval_grams.update(g)
        else:
            corpus[doc_id] = g
    assert set(out) == set(corpus)  # eval docs excluded, all others present
    for doc_id, g in corpus.items():
        row = out[doc_id]
        hits = {x for x in g if x in eval_grams}
        assert row["n_grams"] == len(g)
        assert row["n_hit_grams"] == len(hits)
        assert row["contaminated"] == (1 if hits else 0)
        assert row["contamination"] == _fround6(len(hits) / len(g))
    # the fixture's near-dup documents make the test discriminative:
    # at least one contaminated doc and at least one clean doc must exist
    flags = {r["contaminated"] for r in out.values()}
    assert flags == {0, 1}


def test_repetition_filter_matches_python(spark) -> None:
    out = {
        int(r["doc_id"]): r
        for r in REGISTRY["repetition_filter"]
        .spark(spark, SMOKE_SF_DIR)
        .toPandas()
        .to_dict("records")
    }
    for doc_id, text, n_chars in _docs():
        g2, g3 = _grams(text, 2), _grams(text, 3)
        if not g2 or not g3:
            assert doc_id not in out
            continue
        c2: dict[str, int] = {}
        for g in g2:
            c2[g] = c2.get(g, 0) + 1
        top2 = max(c * len(g) for g, c in c2.items())
        c3: dict[str, int] = {}
        for g in g3:
            c3[g] = c3.get(g, 0) + 1
        dup = sum(c * len(g) for g, c in c3.items() if c > 1)
        allc = sum(c * len(g) for g, c in c3.items())
        row = out[doc_id]
        assert row["top_2gram_frac"] == _fround6(top2 / n_chars)
        assert row["dup_3gram_frac"] == _fround6(dup / allc if allc else 0.0)


def test_scd2_history_covers_every_event(spark) -> None:
    hist = (
        REGISTRY["scd2_history"].spark(spark, SMOKE_SF_DIR).toPandas()
    )
    events = duckdb.sql(
        f"SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id "
        f"FROM read_parquet('{SMOKE_SF_DIR}/events.parquet')"
    ).fetchdf()

    by_user: dict[int, list] = {}
    for r in hist.to_dict("records"):
        by_user.setdefault(int(r["user_id"]), []).append(r)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        # versions are contiguous from 1; exactly one open (current) interval
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(int(r["is_current"]) for r in rows) == 1
        assert rows[-1]["is_current"] == 1
        # intervals chain: each valid_to equals the next valid_from
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
            # consecutive versions always change the tracked attribute
            assert a["event_type"] != b["event_type"]

    # full pure-Python recomputation: sort each user's events by
    # (ts, event_id), keep rows whose type differs from the previous row —
    # those are the versions, in order, valid_from = the change row's ts
    ev_sorted = events.sort_values(["user_id", "ts", "event_id"])
    for uid, grp in ev_sorted.groupby("user_id"):
        expect = []
        prev = None
        for e in grp.itertuples():
            if prev is None or e.event_type != prev:
                expect.append((e.event_type, e.ts))
            prev = e.event_type
        rows = by_user[int(uid)]
        assert [(r["event_type"], r["valid_from"]) for r in rows] == expect


def test_sessionize_gap_semantics(spark) -> None:
    rows = (
        REGISTRY["sessionize"]
        .spark(spark, SMOKE_SF_DIR)
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .to_dict("records")
    )
    prev: dict[int, tuple] = {}
    for r in rows:
        uid = int(r["user_id"])
        if uid not in prev:
            assert r["session_seq"] == 1  # first event opens session 1
        else:
            pts, pseq = prev[uid]
            gap = (r["ts"] - pts).total_seconds()
            if gap > 4 * 3600:
                assert r["session_seq"] == pseq + 1, r
            else:
                assert r["session_seq"] == pseq, r
        prev[uid] = (r["ts"], r["session_seq"])


def test_tfidf_topk_shape_and_score(spark) -> None:
    out = REGISTRY["tfidf_keywords"].spark(spark, SMOKE_SF_DIR).toPandas()
    n_docs = len(_docs())
    for doc_id, grp in out.groupby("doc_id"):
        g = grp.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert len(g) <= 3
        # scores non-increasing with rank; score recomputes from tf/df/N
        scores = list(g["tfidf_score"])
        assert scores == sorted(scores, reverse=True) or len(set(scores)) < len(scores)
        for r in g.to_dict("records"):
            assert r["tfidf_score"] == _fround6(r["tf"] / r["df"] * n_docs)


def test_cdc_merge_actions(spark) -> None:
    """Merge actions reconstruct from raw events: keys only before the
    split are 'kept'; keys whose last post-split op is 'error' are
    'deleted' with NULL value; new keys are 'inserted'; the rest
    'updated' with the last post-split value."""
    import pandas as pd

    rows = (
        REGISTRY["cdc_merge"].spark(spark, SMOKE_SF_DIR).toPandas()
    )
    ev = duckdb.sql(
        f"SELECT user_id, event_type, CAST(ts AS TIMESTAMP) ts, event_id, value "
        f"FROM read_parquet('{SMOKE_SF_DIR}/events.parquet')"
    ).fetchdf()
    split = pd.Timestamp("2024-01-16 00:00:00")
    before = ev[ev.ts < split]
    after = ev[ev.ts >= split].sort_values(["ts", "event_id"])
    got = {int(r["user_id"]): r for r in rows.to_dict("records")}
    all_keys = set(before.user_id) | set(after.user_id)
    assert set(got) == {int(k) for k in all_keys}
    for uid in all_keys:
        r = got[int(uid)]
        a = after[after.user_id == uid]
        if a.empty:
            assert r["merge_action"] == "kept"
            continue
        last = a.iloc[-1]
        if last.event_type == "error":
            assert r["merge_action"] == "deleted"
            assert pd.isna(r["value"])
        elif uid not in set(before.user_id):
            assert r["merge_action"] == "inserted"
            assert r["value"] == last.value
        else:
            assert r["merge_action"] == "updated"
            assert r["value"] == last.value


def test_cms_invariant_and_plan(spark) -> None:
    """CMS one-sided guarantee holds on every probe, and the plan contains
    no cartesian product (generator fan-out, not a cross join)."""
    df = REGISTRY["cms_token_counts"].spark(spark, SMOKE_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = df.toPandas().to_dict("records")
    assert len(rows) == 20
    assert all(r["est_ge_exact"] == 1 for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_hll_estimate_accuracy_and_determinism(spark) -> None:
    """Raw HLL with m=64 has ~1.04/sqrt(64) = 13% standard error; assert
    the estimate lands within 3 sigma of exact, and that repeated runs
    are bit-identical (determinism is the whole point)."""
    df = REGISTRY["hll_distinct"].spark(spark, SMOKE_SF_DIR)
    r1 = df.toPandas().to_dict("records")[0]
    r2 = (
        REGISTRY["hll_distinct"]
        .spark(spark, SMOKE_SF_DIR)
        .toPandas()
        .to_dict("records")[0]
    )
    assert r1 == r2
    n, est = r1["n_exact"], r1["hll_raw_est"]
    assert n > 0
    assert abs(est - n) / n < 3 * 1.04 / (64**0.5), (n, est)


def test_bloom_no_false_negatives_and_low_fp(spark) -> None:
    rows = {
        r["probe_set"]: r
        for r in REGISTRY["bloom_filter_probe"]
        .spark(spark, SMOKE_SF_DIR)
        .toPandas()
        .to_dict("records")
    }
    m = rows["members"]
    assert m["n_positive"] == m["n_probes"]  # Bloom guarantee
    dj = rows["disjoint"]
    # 1024 bits / ~n keys at K=3: FP rate should be well under 50% at smoke
    # scale; exact value is pinned by the oracle gate, this bounds sanity
    assert dj["n_positive"] < dj["n_probes"]


def test_incremental_dedup_two_batches(spark) -> None:
    """Batch 2 drops exact dups of batch 1 (via the persisted band index)
    and in-batch dups (smaller id wins); the index grows only by survivors.
    End state matches running the same rule over the full corpus at once."""
    from nqs_console_flink_window_spark.operators.dedup_text import (
        band_table,
        incremental_dedup,
    )

    t_a = "the quick brown fox jumps over the lazy dog again and again"
    t_b = "completely different content with no shared shingles at all here"
    t_c = "a third unique document about spark engines and band indexes"
    b1 = spark.createDataFrame([(1, t_a), (2, t_b)], "doc_id long, text string")
    kept1, bands1 = incremental_dedup(spark, b1, None)
    assert sorted(r.doc_id for r in kept1.collect()) == [1, 2]
    index = bands1.localCheckpoint()

    # batch 2: dup of doc 1, internal dup pair (10, 11), one new unique
    b2 = spark.createDataFrame(
        [(10, t_c), (11, t_c), (12, t_a), (13, "yet another fresh text body nothing like the others")],
        "doc_id long, text string",
    )
    kept2, bands2 = incremental_dedup(spark, b2, index)
    assert sorted(r.doc_id for r in kept2.collect()) == [10, 13]

    # index grows by survivors only
    merged = index.unionByName(bands2)
    survivors = {1, 2, 10, 13}
    assert {r.doc_id for r in merged.select("doc_id").distinct().collect()} == survivors

    # parity with the one-shot rule over the full corpus
    full = b1.unionByName(b2)
    kept_full, _ = incremental_dedup(spark, full, None)
    assert {r.doc_id for r in kept_full.collect()} == survivors

    # a third batch against the merged index still drops historical dups
    b3 = spark.createDataFrame([(20, t_c)], "doc_id long, text string")
    kept3, _ = incremental_dedup(spark, b3, merged)
    assert kept3.count() == 0


def test_histogram_quantiles_error_bound_and_plan(spark) -> None:
    """The two-pass histogram estimator must land within half a bin width
    of the exact interpolated percentile for every key and quantile (the
    mid-bin rule's bound), and the plan must contain no per-key global sort
    of the corpus (the whole point vs exact percentile) and no cartesian."""
    from pyspark.sql import functions as F

    from nqs_console_flink_window_spark.operators.sketches import HQ_BINS
    from nqs_console_flink_window_spark.sources.batch import load_table

    df = REGISTRY["histogram_quantiles"].spark(spark, SMOKE_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    est = {r["event_type"]: r for r in df.collect()}

    import math

    ev = load_table(spark, SMOKE_SF_DIR, "events")
    vals: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    assert set(est) == set(vals)
    for k, xs in vals.items():
        xs.sort()
        e = est[k]
        assert e["n"] == len(xs)
        half_bin = (xs[-1] - xs[0]) / HQ_BINS / 2 or 1e-12
        for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            # The estimator's contract: the t-th order statistic
            # (t = ceil(q*n), the estimator's own rank rule) lies in the
            # selected bin, so the mid-bin estimate is within half a bin
            # width of it.  (The INTERPOLATED percentile can legitimately
            # sit many bins away when data is sparse relative to bins —
            # histogram quantiles bound rank error, not gap error.)
            t = math.ceil(q * len(xs))
            order_stat = xs[t - 1]
            assert abs(e[name] - order_stat) <= half_bin + 1e-9, (
                k, name, e[name], order_stat, half_bin,
            )
