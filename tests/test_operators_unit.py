"""Unit tests for operator helpers not exercised directly by the query
registry (dim_join, salting helpers, IPv4 column check, write_facts shard
repartition)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nqs_console_flink_window_spark.config import SMOKE_SF_DIR
from nqs_console_flink_window_spark.operators.derive import is_ipv4_col
from nqs_console_flink_window_spark.operators.enrich import dim_join
from nqs_console_flink_window_spark.operators.skew import (
    explode_salt,
    salted_sum_count,
    with_salt,
)
from nqs_console_flink_window_spark.sources.batch import load_table


def test_dim_join_renames_and_broadcasts(spark) -> None:
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    cust = load_table(spark, SMOKE_SF_DIR, "customer")
    out = dim_join(
        ev,
        cust,
        on=[("user_id", "c_custkey")],
        select={"c_name": "probe_name", "c_mktsegment": "probe_segment"},
    )
    assert {"probe_name", "probe_segment"} <= set(out.columns)
    assert "c_name" not in out.columns and "c_custkey" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # left join keeps every event row
    assert out.count() == ev.count()


def test_is_ipv4_col(spark) -> None:
    df = spark.createDataFrame(
        [("1.2.3.4",), ("255.255.255.255",), ("999.1.2.3",), ("a.b.c.d",), ("1.2.3",)],
        ["ip"],
    )
    got = {r.ip: r.ok for r in df.select("ip", is_ipv4_col("ip").alias("ok")).collect()}
    assert got == {
        "1.2.3.4": True,
        "255.255.255.255": True,
        "999.1.2.3": False,
        "a.b.c.d": False,
        "1.2.3": False,
    }


def test_salt_helpers_roundtrip(spark) -> None:
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    n_salts = 8
    salted = with_salt(ev, "event_id", n_salts)
    vals = salted.select("__salt").distinct().collect()
    assert all(0 <= r["__salt"] < n_salts for r in vals)
    # deterministic: same row -> same salt on recompute
    a = {r.event_id: r["__salt"] for r in salted.select("event_id", "__salt").collect()}
    b = {r.event_id: r["__salt"] for r in with_salt(ev, "event_id", n_salts).select("event_id", "__salt").collect()}
    assert a == b

    dim = load_table(spark, SMOKE_SF_DIR, "nation")
    exploded = explode_salt(dim, n_salts)
    assert exploded.count() == dim.count() * n_salts


def test_salted_sum_matches_direct(spark) -> None:
    """Both exact modes must equal their same-discipline direct groupBy:
    quantized vs single-level qsum (the operator's actual contract — a
    decimal-cast direct side would only agree on <=6-decimal fixtures),
    and decimal mode vs the decimal-cast direct sum."""
    from nqs_console_flink_window_spark.operators.windows import qsum_col

    ev = load_table(spark, SMOKE_SF_DIR, "events")
    direct_q = {
        r.event_type: (r.s, r.c)
        for r in ev.groupBy("event_type")
        .agg(qsum_col("value").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted_q = {
        r.event_type: (r.sum_value, r.cnt)
        for r in salted_sum_count(ev, ["event_type"], "value").collect()
    }
    assert direct_q == salted_q

    direct_d = {
        r.event_type: (r.s, r.c)
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .collect()
    }
    salted_d = {
        r.event_type: (r.sum_value, r.cnt)
        for r in salted_sum_count(ev, ["event_type"], "value", exact="decimal").collect()
    }
    assert direct_d == salted_d


def test_csv_json_sources_roundtrip(spark, tmp_path) -> None:
    """S1 breadth — the same pipeline schema reads parquet, CSV, and JSON."""
    from nqs_console_flink_window_spark.sources.formats import (
        EVENTS_SCHEMA,
        read_csv,
        read_json_lines,
    )

    ev = load_table(spark, SMOKE_SF_DIR, "events").limit(200)
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    (
        ev.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .write.option("header", "true").mode("overwrite").csv(csv_dir)
    )
    ev.write.option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).mode("overwrite").json(json_dir)

    from_csv = read_csv(spark, csv_dir, EVENTS_SCHEMA)
    from_json = read_json_lines(spark, json_dir, EVENTS_SCHEMA)
    base = {(r.event_id, r.ts, r.event_type) for r in ev.collect()}
    assert {(r.event_id, r.ts, r.event_type) for r in from_csv.collect()} == base
    assert {(r.event_id, r.ts, r.event_type) for r in from_json.collect()} == base

    from nqs_console_flink_window_spark.sources.formats import read_orc

    orc_dir = str(tmp_path / "orc")
    ev.write.mode("overwrite").orc(orc_dir)
    from_orc = read_orc(spark, orc_dir, EVENTS_SCHEMA)
    assert {(r.event_id, r.ts, r.event_type) for r in from_orc.collect()} == base


def test_profile_single_pass_and_approx(spark) -> None:
    """Profiler: one job computes all columns; approx mode swaps exact
    distinct for HLL without changing the row shape."""
    from nqs_console_flink_window_spark.operators.profile import profile

    ev = load_table(spark, SMOKE_SF_DIR, "events")
    out = {r["col"]: r for r in profile(ev, ["user_id", "event_type", "value"]).collect()}
    n = ev.count()
    assert out["user_id"]["n"] == n and out["user_id"]["n_null"] == 0
    n_users = ev.select("user_id").distinct().count()
    assert out["user_id"]["n_distinct"] == n_users
    assert out["event_type"]["min_str"] == "click"  # string range populated
    assert out["value"]["min_num"] is not None and out["value"]["max_num"] is not None
    # approx mode: same shape, cardinality within HLL tolerance
    ap = {r["col"]: r for r in profile(ev, ["user_id"], approx=True).collect()}
    assert abs(ap["user_id"]["n_distinct"] - n_users) <= max(2, n_users // 10)
    # single-pass shape: the plan has no join and exactly one Expand for
    # the multi-column distinct aggregation
    plan = profile(ev, ["user_id", "event_type"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_qsum_forms_agree_exactly(spark) -> None:
    """The three exact-sum forms must agree: single-level qsum == two-level
    salted (associativity of the quantized-long sum, any salt assignment),
    and both must match a Python-side recomputation of the same
    floor(x*1e6+0.5) quantization — including adversarial values (ties at
    the .5 boundary, negatives, many decimals)."""
    import math

    from nqs_console_flink_window_spark.operators.windows import (
        qsum_col,
        qsum_merge_col,
        qsum_partial_col,
    )

    vals = [
        0.1234565,  # 7 decimals, tie-ish at 1e6 scale
        0.0000005,  # exactly .5 after *1e6 (binary value decides)
        -3.25,
        185.22,
        1e9 + 0.333333,
        -0.0000004,
        7.0,
        123456.654321,
    ] * 37  # several partitions' worth
    df = spark.createDataFrame(
        [(i, i % 5, v) for i, v in enumerate(vals)], "id long, salt int, v double"
    )
    want = sum(math.floor(v * 1.0e6 + 0.5) for v in vals) / 1.0e6

    single = df.agg(qsum_col("v").alias("s")).first()["s"]
    two_level = (
        df.groupBy("salt")
        .agg(qsum_partial_col("v").alias("p"))
        .agg(qsum_merge_col("p").alias("s"))
        .first()["s"]
    )
    assert single == want, (single, want)
    assert two_level == want, (two_level, want)

    # and the DuckDB rendering of the same expression is bit-identical
    import duckdb

    from nqs_console_flink_window_spark.plans.registry import qsum

    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    duck = con.execute(f"SELECT {qsum('v', 's')} FROM t").fetchone()[0]
    assert duck == want, (duck, want)


def test_spread_tag_survives_projection_via_parent(spark) -> None:
    """The decode-spread short-circuit must actually fire on the standard
    extract_* call shape: ``_spread_for_decode(media.select(...),
    parent=media)`` where ``media`` came from a marked adapter.  ``select``
    returns a fresh Python object, so without parent inheritance the tag
    was silently dropped at EVERY call site and each micro-batch paid the
    15-35 ms plan-to-RDD partition probe the tag exists to skip."""
    from pyspark.sql import functions as F

    from nqs_console_flink_window_spark.operators.multimodal import (
        _mark_spread,
        _spread_for_decode,
    )

    media = _mark_spread(
        spark.range(10).select(
            F.col("id").alias("media_id"),
            F.lit(b"x").alias("payload"),
            F.struct(F.lit("image/jpeg").alias("mime")).alias("meta"),
        )
    )
    projected = media.select("media_id", "payload", F.col("meta.mime").alias("mime"))
    assert not getattr(projected, "_nqs_spread", False)  # select drops the tag

    out = _spread_for_decode(projected, parent=media)
    assert getattr(out, "_nqs_spread", False)
    # short-circuit: no repartition was injected on the marked path
    assert "Repartition" not in out._jdf.queryExecution().logical().toString()

    # unmarked path still spreads a single-partition input
    single = spark.range(10).coalesce(1).select(F.col("id").alias("media_id"))
    spread = _spread_for_decode(single)
    assert spread.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
