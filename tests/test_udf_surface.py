"""UDF-surface completeness (SURVEY §2.10): the engine's extension points.

Already exercised elsewhere: scalar pandas UDFs (`operators/similarity.py`),
mapInPandas (`operators/multimodal.py`), applyInPandas grouped map
(`operators/stateful.py:per_key_trend`), applyInPandasWithState
(`running_counts`, `count_or_time_fires`).  This file pins the remaining
two forms — grouped-aggregate pandas UDF (Arrow-batched UDAF) and the
Python UDTF (table function) — each checked against the equivalent
built-in plan, which remains the recommended hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from nqs_console_flink_window_spark.config import SMOKE_SF_DIR
from nqs_console_flink_window_spark.sources.batch import load_table


def test_grouped_agg_pandas_udaf_matches_builtin(spark) -> None:
    """Arrow-batched UDAF: value-weighted mean per event_type — equals the
    built-in sum/sum formulation (the form to prefer when expressible)."""

    @pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    ev = load_table(spark, SMOKE_SF_DIR, "events").withColumn(
        "w", (F.col("user_id") % 7 + 1).cast("double")
    )
    got = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type").agg(wmean("value", "w").alias("m")).collect()
    }
    want = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg((F.sum(F.col("value") * F.col("w")) / F.sum("w")).alias("m"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_python_udtf_matches_builtin_explode(spark) -> None:
    """Python UDTF (Spark 4 table function) splitting the composite
    '\\x02'-delimited payload into one row per part — semantically the
    built-in posexplode(split(...)), which stays the hot-path choice."""

    @udtf(returnType="pos: int, part: string")
    class SplitParts:
        def eval(self, payload: str):
            for i, p in enumerate(payload.split("\x02")):
                yield i, p

    ev = (
        load_table(spark, SMOKE_SF_DIR, "events")
        .limit(50)
        .select(
            "event_id",
            F.concat_ws("\x02", "event_type", F.col("user_id").cast("string"), "props").alias(
                "payload"
            ),
        )
    )
    ev.createOrReplaceTempView("udtf_in")
    spark.udtf.register("split_parts", SplitParts)
    got = {
        (r["event_id"], r["pos"], r["part"])
        for r in spark.sql(
            "SELECT u.event_id, s.pos, s.part "
            "FROM udtf_in u, LATERAL split_parts(u.payload) s"
        ).collect()
    }
    want = {
        (r["event_id"], r["pos"], r["part"])
        for r in ev.select(
            "event_id", F.posexplode(F.split("payload", "\x02")).alias("pos", "part")
        ).collect()
    }
    assert got == want and len(want) == 150
