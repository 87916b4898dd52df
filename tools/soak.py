"""Scale soak — runs the engine at ~10x the bench fixture to verify the
designs scale linearly, not just pass at sf0.1.

Builds a replicated fixture (events/lineitem/orders/documents/embeddings
replicated K times with id offsets; dims unchanged) in a temp dir, runs the
headline bench suite plus the dedup family end-to-end at both scales, and
prints per-query wall times with the scale ratio.  A design with the right
shuffle shape lands near Kx (or below, where fixed Spark overhead dominates
at sf0.1); a super-linear ratio flags an accidental quadratic/broadcast-miss.

Usage: python tools/soak.py [K] [--keep] [--queries=a,b,c]
                            [--scaled-dir=PATH] [--isolate]
(default K=10, full SOAK_QUERIES list; --scaled-dir reuses a kept build;
--isolate runs one subprocess per query so each query's shuffle spill is
reclaimed before the next — required for 30x pair-form soaks, whose
accumulated spill otherwise fills the disk)
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
# Tables that scale with the fact volume; dims keep their base cardinality
# (exactly the 100 TB shape: facts grow, dimensions don't).  Offset ONLY
# true primary keys: foreign keys into the un-replicated dims (events.
# user_id -> customer, orders.o_custkey -> customer) must keep their base
# values or every replica row misses its dim join and the soak measures
# scan growth instead of join growth (round-4 review finding).  l_orderkey
# is offset on both lineitem and orders so the fact-fact join stays valid.
SCALED = {
    "events": ("event_id",),
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
SOAK_QUERIES = [
    # headline suite
    "pricing_summary", "revenue_by_region", "enrich_events",
    "nqs_fact_pipeline", "score_ping", "tumbling_window_10s", "text_stats",
    "minhash_signatures", "cosine_topk",
    # dedup family end-to-end (the quadratic-risk operators)
    "dedup_clusters", "simhash_hamming_hist", "incremental_dedup_batches",
    "training_sample",
    # corpus-prep additions (round 4): span removal carries a corpus-wide
    # seg-df join, packing a global-order cumsum, SemDeDup an in-cluster
    # quadratic — the three next-most-likely super-linear suspects
    "span_dedup", "pack_sequences", "semdedup_prune",
    # second round-4 batch: hard_negatives shares semdedup's in-cluster
    # quadratic, the estimator joins signatures onto LSH candidates, the
    # composition chains sample->pack, upsampling fans out by copy count
    "hard_negatives", "minhash_jaccard_estimate", "corpus_to_windows",
    "quality_upsample", "vocab_topk",
    # third round-4 batch (data-selection family): DSIR re-reads the feature
    # stream for bucket stats + per-doc sums, containment re-joins shingles
    # onto LSH candidates — both candidate super-linear shapes; entropy and
    # BPE pairs are the cheap keyed-agg controls
    "dsir_importance", "containment_pairs", "token_entropy", "bpe_merge_pairs",
    # staged in the second CTE sweep; in the list so a regression re-inflates
    # their ratios visibly
    "tfidf_keywords", "mixture_allocation", "split_leakage_report",
    # embedding bridge + two-signal pair view (joins at candidate grain)
    "doc_embeddings", "semantic_pairs", "containment_estimate",
    # the degree-capped verifier beside its uncapped twin: the bounded-work
    # claim, measured on the flood-dense replica corpus
    "containment_capped",
    # round 5: the sort-free quantile family (bounded-state claim) and the
    # production estimate-only containment projection
    "histogram_quantiles", "robust_outlier_bounds", "containment_estimate_fast",
    "incremental_embedding_dedup_batches", "psi_drift",
    # round 6: token-stats family (tf/gram-groupBy class — the linear
    # controls), the rebucketized near-dup pairs, and the two pair-grain
    # graph ops whose cost rides the LSH edge set (k^2-inflated by the
    # exact-copy replica fixture, same interpretation as dedup_clusters)
    "lm_perplexity", "bm25_topk", "pmi_collocations", "dup_spans",
    "embedding_near_dup", "pagerank_neardup", "lm_ppl_terciles",
    "cluster_representatives",
]


def _mutate_doc_text(d, r: int):
    """Content-diverse replica text: inject a replica-tagged marker every 6
    characters, so EVERY 8-char shingle (SHINGLE_LEN=8 > 6) crosses a
    marker and no shingle survives across replicas — signatures genuinely
    diverge instead of banding back together.  The legacy ' r{r}' suffix
    perturbation left ~all shingles intact, so LSH edges grew ~k^2 on the
    replica fixture and every graph-family soak ratio needed a hand-written
    interpretation note (round-7 verdict).  Duplicate rate stays
    controlled AND groups stay small: a doc is exact-copied in replica r
    iff (doc_id + r) % 10 == 0 — 10%% of each replica, each base doc
    paired with ONE replica copy (for k <= 11), so duplicate edges grow
    LINEARLY with k, the realistic corpus shape.  Deterministic — no RNG."""
    tag = "§" + chr(ord("a") + (r - 1) % 26)
    return d.withColumn(
        "text",
        F.when((F.col("doc_id") + r) % 10 == 0, F.col("text")).otherwise(
            F.regexp_replace("text", "(.{6})", f"$1{tag}")
        ),
    )


def _mutate_embedding(d, r: int):
    """Content-diverse replica vectors under the same pairwise-duplicate
    rule on vec_id: non-duplicate replicas get a deterministic md5-derived
    pseudo-random vector (uniform in [-1, 1) per component), so cosine to
    the base copy is that of an unrelated random vector — the semantic
    family's cluster sizes stop growing ~k per bucket."""
    fresh = (
        "transform(embedding, (x, i) -> CAST((CAST(conv(substr(md5("
        f"concat(CAST(vec_id AS STRING), '_', CAST(i AS STRING), '_{r}')"
        "), 1, 6), 16, 10) AS BIGINT) % 2001 - 1000) / 1000.0E0 AS FLOAT))"
    )
    return d.withColumn(
        "embedding",
        F.when((F.col("vec_id") + r) % 10 == 0, F.col("embedding")).otherwise(
            F.expr(fresh)
        ),
    )


def build_scaled_dir(spark, k: int, out: str, mutate: bool = False) -> None:
    # The orderkey offset must be IDENTICAL on lineitem and orders or the
    # replicas' fact-fact join (l_orderkey = o_orderkey) silently breaks.
    shared_orderkey_off = (
        max(
            load_table(spark, BASE, "lineitem").agg(F.max("l_orderkey")).first()[0],
            load_table(spark, BASE, "orders").agg(F.max("o_orderkey")).first()[0],
        )
        + 1
    )
    for t in TABLE_NAMES:
        src = load_table(spark, BASE, t)
        if t not in SCALED:
            src.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
            continue
        id_cols = SCALED[t]
        offsets = {
            c: (
                shared_orderkey_off
                if c in ("l_orderkey", "o_orderkey")
                else src.agg(F.max(c)).first()[0] + 1
            )
            for c in id_cols
        }
        parts = []
        for r in range(k):
            d = src
            # content mutation FIRST (the dup-pairing predicate uses the
            # ORIGINAL ids so replica copies pair with their base rows),
            # then the id offsets
            if r > 0 and t == "documents":
                if mutate:
                    d = _mutate_doc_text(d, r)
                else:
                    # legacy mode: suffix perturbation (90%), exact k-wide
                    # duplicate groups (10%) — kept for ratio comparability
                    # with earlier rounds' recorded soaks
                    d = d.withColumn(
                        "text",
                        F.when(
                            F.col("doc_id") % 10 == 0, F.col("text")
                        ).otherwise(F.concat("text", F.lit(f" r{r}"))),
                    )
            if r > 0 and t == "embeddings" and mutate:
                d = _mutate_embedding(d, r)
            for c, off in offsets.items():
                d = d.withColumn(c, (F.col(c) + F.lit(r * off)).cast("long"))
            parts.append(d)
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def run_suite(spark, sf_dir: str, queries: list[str]) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in queries:
        q = REGISTRY[name]
        t0 = time.time()
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
    return timings


def _run_isolated(
    k: int, out: str, queries: list[str], mutate: bool
) -> None:
    """One subprocess per query (``--isolate``): a 30x pair-form soak can
    spill >80 GB of shuffle; inside one long-lived app those files are
    freed only as the ContextCleaner GCs old shuffle dependencies, so
    consecutive heavy queries accumulate spill until the disk fills
    (observed: ENOSPC 45 min into the round-12 scaled suite).  A process
    per query hard-bounds the footprint at one query's own spill — the
    per-query timing protocol (sf0.001 warmup, base, scaled in one
    session) is unchanged, so ratios stay comparable with the in-process
    mode."""
    import subprocess

    merged: dict[str, dict] = {}
    for name in queries:
        r = subprocess.run(
            [
                sys.executable,
                __file__,
                str(k),
                f"--scaled-dir={out}",
                f"--queries={name}",
            ]
            + (["--mutate"] if mutate else []),
            capture_output=True,
            text=True,
        )
        line = (r.stdout or "").strip().splitlines()
        if r.returncode == 0 and line:
            merged[name] = json.loads(line[-1])["queries"][name]
        else:
            tail = (r.stderr or "").strip().splitlines()[-3:]
            merged[name] = {"error": " | ".join(tail)[-500:]}
            print(f"isolated soak FAILED for {name}", file=sys.stderr)
    report = {
        "k": k,
        "mutate": mutate,
        "isolate": True,
        "queries": merged,
    }
    print(json.dumps(report))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    keep = "--keep" in sys.argv
    mutate = "--mutate" in sys.argv
    queries = SOAK_QUERIES
    scaled_dir = None
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            queries = a.split("=", 1)[1].split(",")
        if a.startswith("--scaled-dir="):
            scaled_dir = a.split("=", 1)[1]
    if "--isolate" in sys.argv:
        if scaled_dir is None:
            spark = get_spark("nqs-soak-build")
            scaled_dir = tempfile.mkdtemp(prefix="nqs_soak_")
            build_scaled_dir(spark, k, scaled_dir, mutate=mutate)
            spark.stop()
        _run_isolated(k, scaled_dir, queries, mutate)
        if not keep:
            shutil.rmtree(scaled_dir, ignore_errors=True)
        return
    spark = get_spark("nqs-soak")
    if scaled_dir is not None:
        out = scaled_dir
        build_s = 0.0
    else:
        out = tempfile.mkdtemp(prefix="nqs_soak_")
        t0 = time.time()
        build_scaled_dir(spark, k, out, mutate=mutate)
        build_s = round(time.time() - t0, 1)

    # warmup (codegen/JIT) at the small smoke dir, mirroring bench.py
    for name in queries:
        try:
            REGISTRY[name].spark(spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception as e:  # noqa: BLE001
            print(f"warmup fail {name}: {e}", file=sys.stderr)

    base = run_suite(spark, BASE, queries)
    scaled = run_suite(spark, out, queries)
    report = {
        "k": k,
        "mutate": mutate,
        "build_sec": build_s,
        "base_total": round(sum(base.values()), 2),
        "scaled_total": round(sum(scaled.values()), 2),
        "queries": {
            n: {
                "base_sec": base[n],
                "scaled_sec": scaled[n],
                "ratio": round(scaled[n] / base[n], 2) if base[n] else None,
            }
            for n in queries
        },
    }
    print(json.dumps(report))
    if keep or scaled_dir is not None:
        # never delete a caller-provided --scaled-dir (the isolate parent
        # or the user owns its lifecycle)
        print(f"scaled dir kept: {out}", file=sys.stderr)
    else:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
