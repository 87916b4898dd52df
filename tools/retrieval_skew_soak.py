"""Retrieval-path skew soak (round-8 verdict item: measure, don't assert).

The round-5 skew harness covered the enrich/window/fact path; this one
runs the same discipline on the retrieval family with a STOP-WORD-heavy
fixture: one of the registered query terms ("window", already a query
term in BM25_QUERY/BM25_QUERYSET) injected into 80% of documents, so

- its df/ctf aggregation rows concentrate into one token group,
- its postings concentrate into one md5 token bucket,
- the QL leg's candidate set inflates to ~the whole corpus.

Builds TWO K-replica documents fixtures from sf0.1 (other tables copied
unchanged): **uniform** (plain replication) and **skewed** (same rows,
the hot term appended to 80% of texts, deterministic by doc_id — no
RNG).  Runs bm25_topk / bm25_multi / hybrid_rrf_topk / hybrid_rrf_multi
on both, AQE on and off, and prints one JSON line of wall times and
skew/uniform ratios.  Partial (map-side) aggregation should absorb the
token-group concentration — this harness checks that it actually does.

Usage: python tools/retrieval_skew_soak.py [K]   (default K=10)
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from nqs_console_flink_window_spark.config import TABLE_NAMES  # noqa: E402
from nqs_console_flink_window_spark.plans import all as _all  # noqa: E402,F401
from nqs_console_flink_window_spark.plans.registry import REGISTRY  # noqa: E402
from nqs_console_flink_window_spark.session import get_spark  # noqa: E402
from nqs_console_flink_window_spark.sources.batch import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
HOT_TERM = "window"  # a registered query term: skew lands ON the hot path
QUERIES = ("bm25_topk", "bm25_multi", "hybrid_rrf_topk", "hybrid_rrf_multi")


def build(spark, k: int, out: str, skew: bool) -> None:
    docs = load_table(spark, BASE, "documents")
    off = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for r in range(k):
        parts.append(
            docs.withColumn("doc_id", (F.col("doc_id") + F.lit(r * off)).cast("long"))
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    if skew:
        scaled = scaled.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 < 8,
                F.concat("text", F.lit(f" {HOT_TERM} {HOT_TERM} {HOT_TERM}")),
            ).otherwise(F.col("text")),
        )
    scaled.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    for t in TABLE_NAMES:
        if t != "documents":
            load_table(spark, BASE, t).write.mode("overwrite").parquet(
                f"{out}/{t}.parquet"
            )


def run(spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in QUERIES:
        q = REGISTRY[name]
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("nqs-retrieval-skew")
    tmp = tempfile.mkdtemp(prefix="nqs_rskew_")
    try:
        uni_dir, skew_dir = f"{tmp}/uniform", f"{tmp}/skewed"
        build(spark, k, uni_dir, skew=False)
        build(spark, k, skew_dir, skew=True)
        result: dict = {"k": k, "hot_term": HOT_TERM}
        for aqe in (True, False):
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            uni = run(spark, uni_dir)
            skw = run(spark, skew_dir)
            result[f"aqe_{'on' if aqe else 'off'}"] = {
                name: {
                    "uniform_sec": uni[name],
                    "skewed_sec": skw[name],
                    "skew_ratio": round(skw[name] / uni[name], 2),
                }
                for name in QUERIES
            }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        print(json.dumps(result))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
