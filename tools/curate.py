"""End-to-end corpus-curation driver — the engine's lifecycle as one command.

    python tools/curate.py [sf_dir] [out_dir]

1. FIT    — DSIR bucket model on the reference corpus (constant-size)
            + unigram LM on the clean 1-in-7 slice (vocabulary-size).
2. CURATE — stream the corpus through the ingest gate in micro-batches:
            DSIR score vs the fixed model + quality score + CCNet LM
            perplexity cut -> threshold filters -> index-backed
            incremental dedup -> idempotent landing.
3. COMPACT— fold the committed batch subpaths into one generation
            (small-file maintenance).
4. REPORT — one JSON line: docs in/kept, drop reasons, score spread,
            landed file count.

Defaults: sf_dir=/root/testdata/sf0.01, out_dir=a temp dir (printed).
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from nqs_console_flink_window_spark.operators import retrieval as RT  # noqa: E402
from nqs_console_flink_window_spark.operators import selection as SEL  # noqa: E402
from nqs_console_flink_window_spark.session import get_spark  # noqa: E402
from nqs_console_flink_window_spark.sinks.writers import compact_batch_landings  # noqa: E402
from nqs_console_flink_window_spark.streaming import jobs as J  # noqa: E402

MIN_QUALITY = 15.0
MIN_LOGW = -2.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="nqs_curate_")
    spark = get_spark("nqs-curate")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_in = docs.count()

    model = SEL.dsir_fit(spark, docs)
    lm_model = RT.lm_model_fit(spark, docs.filter(RT.LM_FIT_PRED))

    src = f"{out}/src"
    docs.withColumn("part", F.col("doc_id") % 4).write.partitionBy("part").mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    kept_dir, index_dir = f"{out}/kept", f"{out}/index"
    J.run_curation_stream(
        spark, stream, model, kept_dir, index_dir, f"{out}/cp",
        min_quality=MIN_QUALITY, min_logw=MIN_LOGW, lm_model=lm_model,
    )

    landed = spark.read.parquet(kept_dir)
    max_bid = landed.agg(F.max(F.col("batch_id"))).first()[0]
    n_files = compact_batch_landings(spark, kept_dir, int(max_bid))
    compact_batch_landings(spark, index_dir, int(max_bid))

    kept = spark.read.parquet(kept_dir)
    stats = kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("log_weight").alias("lw_min"),
        F.max("log_weight").alias("lw_max"),
        F.min("quality").alias("q_min"),
        F.max("avg_nll_nats").alias("nll_max"),
    ).first()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "out_dir": out,
                "docs_in": n_in,
                "docs_kept": stats["n_kept"],
                "kept_pct": round(100.0 * stats["n_kept"] / n_in, 2),
                "log_weight_range": [round(stats["lw_min"], 4), round(stats["lw_max"], 4)],
                "min_quality_enforced": stats["q_min"] >= MIN_QUALITY,
                "max_avg_nll_kept": round(stats["nll_max"], 4),
                "compacted_files": n_files,
            }
        )
    )


if __name__ == "__main__":
    main()
