"""Registered queries for the retrieval / LM-scoring / graph family
(operators/retrieval.py, operators/graph.py) — round-6 extensions to the
LLM-pipeline surface.  Same contract as every other registration: the
engine side is staged DataFrame/SQL with the CTE-inlining discipline, the
oracle is the identical two-dialect SQL rendered for DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import dialect as X
from ..operators import retrieval as RT
from ..sources.batch import load_table, register_temp_views
from .registry import register


@register(
    "lm_perplexity",
    sql=RT.lm_perplexity_sql(X.DUCK),
    doc="Extension — CCNet-style LM perplexity filter (Wenzek et al. "
    "2020): unigram LM with Laplace smoothing fit on the deterministic "
    "1-in-7 reference slice, every document scored by avg per-token "
    "negative log-likelihood, banded head/middle/tail with a keep flag.  "
    "Integer micro-nat discipline (qln_micro at integer args only, BIGINT "
    "sums); the model is a vocabulary-sized broadcast table — fit-once / "
    "score-everywhere, one corpus-keyed aggregation (the DSIR shape)",
)
def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents",))
    return RT.lm_perplexity_df(spark)


@register(
    "bm25_topk",
    sql=RT.bm25_topk_sql(X.DUCK),
    headline=True,  # retrieval-family bench coverage since round 7
    doc="Extension — BM25 top-10 for a fixed 3-term query (k1=6/5, b=3/4 "
    "exactly; Lucene idf ln(1+...) — strictly positive): idf in quantized "
    "micro-nats (half-integer args cleared by doubling), tf saturation as "
    "a ratio of exact BIGINTs "
    "scaled through 10*T, per-doc sum quantized-exact.  tf shuffles only "
    "query-term rows, df/N/T ride scalar subqueries, top-k is TakeOrdered "
    "— the sparse-retrieval baseline next to the dense ANN family.  "
    "Rotated tier-2 round 8 close: driver-gated via bm25_indexed (the "
    "SAME oracle SQL, bit-identical scoring through the standing index) "
    "+ bm25_multi (the same contrib fragment multi-keyed)",
    tier=2,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents",))
    return RT.bm25_topk_df(spark)


@register(
    "bm25_multi",
    sql=RT.bm25_multi_sql(X.DUCK),
    doc="Extension — multi-query BM25, the production retrieval shape "
    "(hard-negative mining scores a TABLE of queries, not one literal): "
    "(query_id, term) rows broadcast onto the postings, per-(doc, term) "
    "contribution is the SAME _bm25_contrib_expr fragment as bm25_topk, "
    "per-query top-k via a rank window PARTITIONED BY query_id over the "
    "post-aggregation candidate set (bounded by |queries| x candidates, "
    "never corpus-wide).  tf still shuffles only the term-union rows.  "
    "Rotated tier-2 in round 10 to admit the round-9 production shapes: "
    "driver-gated via bm25_indexed (the same BM25 math over the standing "
    "index) + hybrid_dense_sparse_multi (whose sparse leg IS "
    "_bm25_multi_leg_ctes, shared verbatim)",
    tier=2,
)
def bm25_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents",))
    return RT.bm25_multi_df(spark)


@register(
    "hybrid_rrf_topk",
    sql=RT.hybrid_rrf_sql(X.DUCK),
    doc="Extension — hybrid retrieval via Reciprocal Rank Fusion (Cormack "
    "et al. 2009): BM25 and Jelinek-Mercer(1/2) query-likelihood legs over "
    "the SAME staged tf/dl relations, rrf_pico = sum of 1e12 DIV (60 + "
    "leg rank) in exact integers.  QL contribution = qln(5*tf*T + "
    "5*ctf*dl) - qln(10*dl*T) micro-nats (integer args; tf=0 rows keep "
    "the smoothed background mass).  Leg cuts are TakeOrdered and the "
    "rank windows cover <= 50 already-cut rows — never corpus-wide.  "
    "Rotated tier-2 round 8 close: driver-gated via hybrid_rrf_multi "
    "(every fusion stage, per-query) + hybrid_rrf_indexed (the same "
    "fragments over the standing index); single-query parity "
    "pytest-pinned",
    tier=2,
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents",))
    return RT.hybrid_rrf_df(spark)


@register(
    "hybrid_rrf_multi",
    sql=RT.hybrid_rrf_multi_sql(X.DUCK),
    headline=True,  # retrieval-fusion flagship — benched since round 8
    doc="Extension — the multi-query form of the RRF fusion: every stage "
    "of hybrid_rrf_topk with a query_id key threaded through (per-query "
    "candidates, per-query leg rank windows, per-query fused cut), the "
    "(query_id, term) table broadcast exactly like bm25_multi.  The "
    "hard-negative-mining production shape for LEXICAL hybrid retrieval; "
    "per-query parity with hybrid_rrf_topk pytest-pinned.  Rotated "
    "tier-2 in round 10 to admit the round-9 production shapes: "
    "driver-gated via hybrid_rrf_indexed (the same fusion over the "
    "standing index) + hybrid_dense_sparse_multi (the same rrf_pico "
    "fusion fragment and shared BM25 leg CTEs)",
    tier=2,
)
def hybrid_rrf_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents",))
    return RT.hybrid_rrf_multi_df(spark)


@register(
    "pmi_collocations",
    sql=RT.pmi_collocations_sql(X.DUCK),
    doc="Extension — PMI collocation mining (Church & Hanks 1990) over "
    "adjacent-token bigrams, support floor c_ab >= 5, top-50 by quantized "
    "micro-nat PMI (metric DEFINED in quantized space — deterministic "
    "cross-engine by construction).  Two grouped counts + a "
    "vocabulary-sized broadcast join; TakeOrdered cut (tier-1 since "
    "round 7: the collocation-mining machinery is driver-visible "
    "directly)",
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents",))
    return RT.pmi_collocations_df(spark)


@register(
    "lm_ppl_terciles",
    sql=RT.lm_ppl_terciles_sql(X.DUCK),
    doc="Extension — CCNet's ACTUAL banding rule: perplexity bands from "
    "corpus TERCILES (not fixed thresholds), with the cuts derived from "
    "the histogram-quantile machinery (hq_bin_ix / hq_sel_fragment / "
    "hq_out_fragment reused verbatim over the per-doc avg_nll scores; "
    "<=4096-row bounded cum window, scalar-subquery stats — no 1-row "
    "joins).  Engine stages scores/stats/vals against CTE re-runs; "
    "driver-gated via lm_perplexity + histogram_quantiles (the two "
    "composed tier-1 surfaces)",
    tier=2,
)
def lm_ppl_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents",))
    return RT.lm_ppl_terciles_df(spark)


# ---------------------------------------------------------------------------
# Indexed retrieval forms as registry queries: the persisted-index path
# value-oracled cross-engine, not just pytest-parity-pinned.  The index is
# built ONCE per process per sf_dir (a real user queries a standing index
# thousands of times — rebuilding per call would measure the wrong thing),
# and the oracle is the SAME SQL as the online form because the indexed
# plans are bit-identical to the online plans by construction.
# ---------------------------------------------------------------------------

_TEXT_INDEX_CACHE: dict[str, str] = {}


def _ensure_text_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per corpus dir) the persisted inverted
    index for ``sf_dir``'s documents table into a fresh temp dir — always
    current-layout, never a stale on-disk artifact from an older build,
    and never shared with a concurrent process (no overwrite races).  The
    dir is removed at interpreter exit so repeated gate/bench/soak runs
    don't accumulate corpus-scale dead indexes on disk."""
    path = _TEXT_INDEX_CACHE.get(sf_dir)
    if path is None:
        import atexit
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix="nqs_text_index_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        path = base + "/index"
        RT.build_text_index(spark, load_table(spark, sf_dir, "documents"), path)
        _TEXT_INDEX_CACHE[sf_dir] = path
    return path


@register(
    "bm25_indexed",
    sql=RT.bm25_topk_sql(X.DUCK),
    headline=True,  # standing-index sparse hot path — benched since round 9
    doc="Extension — bm25_topk against the MATERIALIZED inverted index "
    "(build_text_index layout: tbucket-partitioned postings + doclen/"
    "stats sidecars): query terms route to buckets at the file-listing "
    "level (PartitionFilters pytest-asserted), tf/dl/N/T all precomputed "
    "— no pass over corpus text.  Results bit-identical to the online "
    "form, so the oracle IS bm25_topk's SQL (tier-1 since round 8 close: "
    "the driver hashes the file-listing-pruned retrieval path directly)",
)
def bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents",))
    return RT.bm25_topk_indexed(spark, _ensure_text_index(spark, sf_dir))


@register(
    "hybrid_rrf_indexed",
    sql=RT.hybrid_rrf_multi_sql(X.DUCK),
    headline=True,  # standing-index fusion hot path — benched since round 9
    doc="Extension — hybrid_rrf_multi against the MATERIALIZED inverted "
    "index: one pruned postings scan serves every query's term union; "
    "ctf = per-term SUM(tf) over pruned postings, N/T inlined from the "
    "stats sidecar.  The compute-once-then-query production shape for "
    "hard-negative mining; results bit-identical to the online form, so "
    "the oracle IS hybrid_rrf_multi's SQL.  Tier-1 rounds 8-11; rotated "
    "out round 12 for audio_near_dup_spectral; RESTORED tier-1 in round "
    "13 per the round-12 verdict (a driver-verified query must stay "
    "driver-verified) — stream_fact_pipeline rotated out in exchange "
    "(its oracle SQL and output are identical to tier-1 "
    "nqs_fact_pipeline's, so the driver's check was duplicated; the "
    "streaming execution path stays pytest- and check_oracle-gated).  "
    "The tier-1 set is FROZEN as of this round: every rotation at the "
    "50-entry cap reads as a dropped query to the driver's gate",
)
def hybrid_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents",))
    return RT.hybrid_rrf_multi_indexed(spark, _ensure_text_index(spark, sf_dir))


# ---------------------------------------------------------------------------
# Dense+sparse hybrid retrieval — THE production hybrid (round 9): a dense
# embedding leg (exact-decimal cosine vs a reference vector) fused with the
# sparse BM25 leg through the same exact-integer rrf_pico rule as the
# lexical fusion.  The fixture pairs documents with embeddings by id
# (vec_id == doc_id), so the fused key is doc_id.
# ---------------------------------------------------------------------------


@register(
    "hybrid_dense_sparse",
    sql=RT.hybrid_dense_sparse_sql(X.DUCK),
    doc="Extension — single-query dense+sparse hybrid retrieval: exact "
    "cosine vs the vec_id=0 reference vector (1e-8-quantized, ties on "
    "vec_id — leg ranks bit-stable cross-engine) fused with the shared "
    "_bm25_leg_ctes sparse leg via exact-integer RRF (rrf_pico = sum of "
    "1e12 DIV (60 + leg rank)).  Leg cuts are TakeOrdered; the 1-row "
    "query vector broadcasts (whitelisted BNLJ — dense scoring has no "
    "equi key by construction).  driver-gated via hybrid_dense_sparse_"
    "multi (every fusion stage with a query_id key threaded through)",
    tier=2,
)
def hybrid_dense_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents", "embeddings"))
    return RT.hybrid_dense_sparse_df(spark)


@register(
    "hybrid_dense_sparse_multi",
    sql=RT.hybrid_dense_sparse_multi_sql(X.DUCK),
    headline=True,  # the production RAG/hard-negative fusion — benched
    doc="Extension — multi-query dense+sparse hybrid retrieval, the "
    "canonical production hybrid (RAG / hard-negative mining fuses a "
    "dense embedding leg with a sparse lexical leg — the stated point of "
    "RRF in Cormack et al. 2009): per query_id, exact-decimal cosine vs "
    "the embedding of vec_id=query_id (broadcast |Q|-row query-vector "
    "table, thin projection, per_query_topk partition-local pre-cut) "
    "fused with the shared _bm25_multi_leg_ctes BM25 leg in exact-integer "
    "rrf_pico.  Dense leg ranks are bit-stable cross-engine (1e-8 "
    "quantized cosine, vec_id ties); each query excludes only its own "
    "vector from the dense corpus",
)
def hybrid_dense_sparse_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents", "embeddings"))
    return RT.hybrid_dense_sparse_multi_df(spark)


@register(
    "hybrid_dense_sparse_indexed",
    sql=RT.hybrid_dense_sparse_multi_sql(X.DUCK),
    headline=True,  # the standing-index fusion hot path — benched
    doc="Extension — hybrid_dense_sparse_multi against the MATERIALIZED "
    "inverted index: the sparse leg reads |Q| pruned postings buckets + "
    "the doclen/stats sidecars (no corpus text pass), the dense leg is "
    "the same broadcast exact-cosine scan, the fusion fragment is shared "
    "— results bit-identical to the online form, so the oracle IS its "
    "SQL.  Promoted tier-1 in round 10 (the standing-index fusion is the "
    "production query shape — the driver now hashes it directly; "
    "hybrid_rrf_multi rotated out in exchange)",
)
def hybrid_dense_sparse_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents", "embeddings"))
    return RT.hybrid_dense_sparse_multi_indexed(
        spark, _ensure_text_index(spark, sf_dir)
    )


from pyspark.sql import functions as F  # noqa: E402

from . import oracles_py as ORC  # noqa: E402


@register(
    "hybrid_dense_sparse_ann",
    sql=None,  # IVF dense leg = seeded k-means — value-oracled in Python
    oracle_py=ORC.hybrid_dense_sparse_ann_oracle,
    headline=True,  # the zero-corpus-pass hybrid query path — benched
    doc="Extension — the FULLY-indexed hybrid (round 9): dense leg = "
    "IVF-probed ANN ranks from the persisted cell-partitioned vector "
    "index (|Q| pruned cell scans, approximate by design — standard RRF "
    "absence semantics absorb the probe cut), sparse leg = BM25 over "
    "pruned postings buckets + sidecar stats, fused through the same "
    "_dense_sparse_multi_ctes fragment as the exact forms.  The "
    "production query path at 100 TB: per query set, |Q| postings "
    "buckets + nprobe cell partitions, ZERO corpus passes.  The oracle "
    "recomputes both legs deterministically in Python (the IVF family's "
    "seeded-Lloyd recompute + the hypothesis suite's integer BM25 twin) "
    "and fuses with the exact-integer rrf_pico rule.  driver-gated via "
    "hybrid_dense_sparse_multi (the same fusion fragment, exact legs) + "
    "ann_topk (the ANN family's driver row)",
    tier=2,
)
def hybrid_dense_sparse_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_ext import _ensure_ivf_index

    register_temp_views(spark, sf_dir, ("documents", "embeddings"))
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [int(q) for q in sorted(RT.BM25_QUERYSET)]

    def qvecs() -> dict[int, list[float]]:
        # passed as a callable so the collect runs inside the operator's
        # driver-read pool, concurrent with the clash/centroid/stats reads
        return {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id").isin(qids)).collect()
        }

    return RT.hybrid_dense_sparse_ann_indexed(
        spark,
        _ensure_text_index(spark, sf_dir),
        _ensure_ivf_index(spark, sf_dir),
        qvecs,
    )


@register(
    "hybrid_weighted",
    sql=RT.hybrid_weighted_sql(X.DUCK),
    doc="Extension — WEIGHTED reciprocal rank fusion of the dense+sparse "
    "legs (the leg-weighted generalization production stacks tune when "
    "one leg is known stronger for the workload: rrf = sum of "
    "w_leg/(K + rank), sparse w=3 / dense w=2 here, weights are config): "
    "each leg contributes w * RRF_SCALE DIV (60 + rank) — exact BIGINT "
    "picos end-to-end, same shared BM25 leg and per_query_topk dense "
    "pre-cut as the unweighted form.  driver-gated via "
    "hybrid_dense_sparse_multi (the identical legs; only the fusion "
    "weights differ)",
    tier=2,
)
def hybrid_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("documents", "embeddings"))
    return RT.hybrid_weighted_df(spark)
