"""Near-constant-image skew soak (round 10, verdict item 3).

The documented dHash hot bucket: near-constant thumbnails have no
gradients, so all their bands are 0 and a naive band equi-join goes
quadratic in the zero-group size.  This soak builds a corpus DOMINATED
by that group (80% constant-text docs — varying char and length, all
hashing to bands (0,0,0,0)) at two scales and measures:

- ``clusters``: the production cluster form (zero clique star-reduced)
  at N and 10N — the ratio is the headline: linear-ish in corpus size
  even when the corpus is mostly one giant near-dup group.
- ``legacy_clusters`` at N only: the round-9 composition (full pair
  expansion -> connected components) on the same corpus — the
  quadratic-in-|Z| baseline the star reduction replaces.  Not run at
  10N: its edge set alone would be |Z|^2/2 ~ 3.2e9 rows.

Usage: python tools/image_skew_soak.py [N] [k]   (defaults 5000, 10)
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import pathlib

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from nqs_console_flink_window_spark.operators import multimodal as MM  # noqa: E402
from nqs_console_flink_window_spark.operators.dedup_cluster import (  # noqa: E402
    dedup_clusters_df,
)
from nqs_console_flink_window_spark.session import get_spark  # noqa: E402

ZERO_FRACTION_MOD = 5  # doc_id % 5 != 0 -> constant text (80% of docs)


def skew_docs(spark, n: int):
    """n documents, 80% constant text (zero dHash), 20% varied (md5-hex
    words — real gradients).  Deterministic, no RNG."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % ZERO_FRACTION_MOD != 0,
            F.expr("repeat(char(97 + id % 26), CAST(5 + id % 60 AS INT))"),
        )
        .otherwise(
            F.expr(
                "concat_ws(' ', md5(CAST(id AS STRING)), "
                "md5(CAST(id + 7 AS STRING)), md5(CAST(id * 3 AS STRING)))"
            )
        )
        .alias("text"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("nqs-image-skew-soak")

    def timed(fn) -> float:
        t0 = time.time()
        fn().write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 2)

    views = {}
    for tag, rows in (("base", n), ("scaled", n * k)):
        view = f"__skew_docs_{tag}"
        skew_docs(spark, rows).localCheckpoint().createOrReplaceTempView(view)
        views[tag] = view

    # warmup (codegen/Arrow init) on a tiny slice
    skew_docs(spark, 64).createOrReplaceTempView("__skew_warm")
    MM.image_dup_clusters_df(spark, "__skew_warm").write.mode(
        "overwrite"
    ).format("noop").save()

    base_c = timed(lambda: MM.image_dup_clusters_df(spark, views["base"]))
    scaled_c = timed(lambda: MM.image_dup_clusters_df(spark, views["scaled"]))
    # the round-9 composition on the SAME base corpus: full pair
    # expansion (the zero clique materialized) feeding the CC core
    legacy_base = timed(
        lambda: dedup_clusters_df(
            MM.image_near_dup_df(spark, views["base"]).select(
                "doc_a", "doc_b"
            ),
            spark.table(views["base"]).select("doc_id"),
        )
    )
    print(
        json.dumps(
            {
                "n": n,
                "k": k,
                "zero_fraction": 1 - 1 / ZERO_FRACTION_MOD,
                "clusters_base_sec": base_c,
                "clusters_scaled_sec": scaled_c,
                "clusters_ratio": round(scaled_c / base_c, 2),
                "legacy_clusters_base_sec": legacy_base,
                "legacy_vs_split_base": round(legacy_base / base_c, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
