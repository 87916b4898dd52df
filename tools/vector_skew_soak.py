"""Vector-path skew soak (measure, don't assert — the round-5/8 skew
discipline applied to the dense retrieval family).

Skew shape: embeddings concentrated around ONE direction, so a single
IVF cell holds most of the corpus — the hot-cell worst case for
cell-routed ANN (probing the hot cell approaches a corpus scan) and a
hot-broadcast-fanout case for exact multi-query scoring.

Builds TWO K-replica embeddings fixtures from sf0.1 (other tables copied
unchanged): **uniform** (plain replication with re-drawn independent
vectors per replica — the mutated-soak embedding rule) and **skewed**
(same row counts, 80% of vectors pulled 90% of the way toward one fixed
direction, deterministic by vec_id — no RNG).  Runs cosine_multi /
ann_ivf_multi / ann_ivf_indexed on both and prints one JSON line of wall
times and skew/uniform ratios.  The per-query top-k pre-cut and the
bounded probe join should keep the engine flat under skew (recall moves,
wall time should not blow up) — this harness checks that it actually
does.

Usage: python tools/vector_skew_soak.py [K]   (default K=10)
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
QUERIES = ("cosine_multi", "ann_ivf_multi", "ann_ivf_indexed")


def build(spark, k: int, out: str, skew: bool) -> None:
    emb = load_table(spark, BASE, "embeddings")
    off = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for r in range(k):
        p = emb.withColumn("vec_id", (F.col("vec_id") + F.lit(r * off)).cast("long"))
        if r > 0:
            # re-draw per replica: deterministic sin-hash pseudo-vectors so
            # replicas aren't exact copies (the mutated-soak embedding rule)
            p = p.withColumn(
                "embedding",
                F.expr(
                    f"transform(sequence(1, {dim}), "
                    f"i -> CAST(sin(vec_id * 37 + i * 13 + {r}) AS FLOAT))"
                ),
            )
        parts.append(p)
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    if skew:
        # pull 80% of vectors 90% of the way toward one fixed direction:
        # v' = 0.1*v + 0.9*u, u = (1, 1, ..., 1)/sqrt(dim) — one IVF cell
        # ends up owning most of the corpus
        u = 1.0 / (dim ** 0.5)
        scaled = scaled.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 10 < 8,
                F.expr(
                    f"transform(embedding, x -> CAST(0.1 * x + 0.9 * {u!r} AS FLOAT))"
                ),
            ).otherwise(F.col("embedding")),
        )
    scaled.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    for t in TABLE_NAMES:
        if t != "embeddings":
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
    spark = get_spark("nqs-vector-skew")
    tmp = tempfile.mkdtemp(prefix="nqs_vskew_")
    try:
        uni_dir, skew_dir = f"{tmp}/uniform", f"{tmp}/skewed"
        build(spark, k, uni_dir, skew=False)
        build(spark, k, skew_dir, skew=True)
        uni = run(spark, uni_dir)
        skw = run(spark, skew_dir)
        result = {
            "k": k,
            "queries": {
                name: {
                    "uniform_sec": uni[name],
                    "skewed_sec": skw[name],
                    "skew_ratio": round(skw[name] / uni[name], 2),
                }
                for name in QUERIES
            },
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
