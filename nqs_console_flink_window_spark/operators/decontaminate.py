"""Benchmark decontamination and repetition-based quality filtering.

Two training-corpus hygiene operators every large-scale LLM data pipeline
runs before training (beyond the reference surface; companions to
``operators/text.py`` and ``operators/dedup_text.py``):

- **Decontamination** — flag corpus documents that share any word n-gram
  with a held-out evaluation set (the GPT-3/PaLM "13-gram overlap" test,
  scaled down to the fixture's short documents).  The eval set here is the
  deterministic slice ``doc_id % EVAL_MOD = 0`` of ``documents``; in a real
  deployment it is the benchmark suite.
- **Repetition filter** — the Gopher-style within-document repetition
  signals: fraction of characters covered by the most frequent word 2-gram
  and fraction of characters inside duplicated word 3-grams; documents
  above either threshold are flagged.

Scale design (100 TB):
- n-grams are hashed to 60-bit ints (``dialect.md5_int``) immediately, so
  the shuffle and the join move 8-byte keys, never gram strings.
- the eval-gram table is benchmark-sized (MBs even for a full eval suite)
  → broadcast-hash join against the corpus gram stream; the corpus side is
  never shuffled for the probe.  The per-doc COUNT(DISTINCT ...) is the
  only shuffle, keyed by doc_id (no skew: a doc has bounded grams).
- the repetition filter is a groupBy(doc_id, gram) with map-side partial
  aggregation followed by a doc_id re-aggregation — two local shuffles on
  uniform keys, no joins, no UDFs; everything stays in whole-stage codegen.

Both operators render from one SQL template per dialect, so the DuckDB
oracle is the same text modulo array/hash primitives (functions/dialect.py).
"""

from __future__ import annotations

from ..functions import dialect as X

# Word n-gram size for the overlap test.  The canonical value is 13 for
# web-scale corpora; the fixture documents are ~40-80 tokens, so 3 keeps the
# test discriminative (near-dup docs collide, unrelated docs don't).
DECON_NGRAM = 3
# Deterministic eval-set slice of the documents fixture.
EVAL_MOD = 17

# Gopher repetition thresholds (Rae et al. 2021, Table A1 shape).
TOP_2GRAM_MAX_FRAC = 0.20
DUP_3GRAM_MAX_FRAC = 0.60


def gram_at(d: str, arr: str, i: str, n: int) -> str:
    """The word n-gram starting at 1-based position ``i`` of token array
    ``arr``, joined with single spaces.  Spark ``slice(arr, i, n)`` ==
    DuckDB ``arr[i:i+n-1]`` (both 1-based, n elements)."""
    if d == X.SPARK:
        return f"array_join(slice({arr}, {i}, {n}), ' ')"
    return f"array_to_string({arr}[{i}:{i}+{n - 1}], ' ')"


def word_grams_cte(d: str, n: int, table: str = "documents") -> str:
    """Subquery producing ``(doc_id, n_chars, gram, gram_h)`` — one row per
    word n-gram of the lowercased whitespace tokenization.  Documents
    shorter than ``n`` tokens emit no rows."""
    toks = (
        f"(SELECT doc_id, n_chars, {X.split_tokens(d, 'lower(text)')} AS toks "
        f"FROM {table}) "
    )
    sized = (
        f"(SELECT doc_id, n_chars, toks, {X.arr_size(d, 'toks')} AS nt "
        f"FROM {toks} WHERE {X.arr_size(d, 'toks')} >= {n})"
    )
    pos = X.positions_from(d, sized, "doc_id, n_chars, toks", f"nt - {n - 1}")
    gram = gram_at(d, "toks", "i", n)
    return (
        f"(SELECT doc_id, n_chars, {gram} AS gram, "
        f"{X.md5_int(d, gram)} AS gram_h FROM {pos})"
    )


def decontaminate_sql(d: str, table: str = "documents") -> str:
    """Per non-eval document: total n-grams, distinct n-grams overlapping the
    eval set, contamination ratio, and the drop flag.

    The eval side is reduced to DISTINCT hashed grams (benchmark-sized) and
    broadcast; corpus grams probe it without a shuffle.  COUNT(DISTINCT)
    per doc then shuffles only the *hit* rows on doc_id.
    """
    hint = "/*+ BROADCAST(e) */ " if d == X.SPARK else ""
    return f"""
WITH grams AS (SELECT doc_id, gram_h FROM {word_grams_cte(d, DECON_NGRAM, table)} g),
eval_grams AS (
  SELECT DISTINCT gram_h FROM grams WHERE doc_id % {EVAL_MOD} = 0
),
corpus AS (SELECT doc_id, gram_h FROM grams WHERE doc_id % {EVAL_MOD} <> 0),
hits AS (
  SELECT {hint}c.doc_id, COUNT(DISTINCT c.gram_h) AS n_hit_grams
  FROM corpus c JOIN eval_grams e ON c.gram_h = e.gram_h
  GROUP BY c.doc_id
),
totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id)
SELECT t.doc_id, t.n_grams,
  COALESCE(h.n_hit_grams, CAST(0 AS BIGINT)) AS n_hit_grams,
  {X.fround("CAST(COALESCE(h.n_hit_grams, 0) AS DOUBLE) / t.n_grams", 6)}
    AS contamination,
  CASE WHEN COALESCE(h.n_hit_grams, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
"""


def repetition_sql(d: str, table: str = "documents") -> str:
    """Per document: Gopher-style repetition fractions over word n-grams.

    - ``top_2gram_frac``: characters covered by occurrences of the most
      character-covering 2-gram (count × gram length, spaces included)
      relative to ``n_chars``.
    - ``dup_3gram_frac``: characters inside 3-grams occurring more than
      once, relative to all 3-gram characters.
    - ``repetitive``: either fraction above its Gopher threshold.

    MAX/SUM over ``count × length`` are integer-exact — no float
    discipline needed until the final division, which is rounded with
    ``dialect.fround`` for cross-engine hash identity.
    """
    return f"""
WITH g2 AS (
  SELECT doc_id, n_chars, gram, COUNT(*) AS c
  FROM {word_grams_cte(d, 2, table)} g GROUP BY doc_id, n_chars, gram
),
g3 AS (
  SELECT doc_id, gram, COUNT(*) AS c
  FROM {word_grams_cte(d, 3, table)} g GROUP BY doc_id, gram
),
top2 AS (
  SELECT doc_id, n_chars,
    MAX(c * CAST(length(gram) AS BIGINT)) AS top2_chars
  FROM g2 GROUP BY doc_id, n_chars
),
dup3 AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN c > 1 THEN c * CAST(length(gram) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS dup_chars,
    CAST(SUM(c * CAST(length(gram) AS BIGINT)) AS BIGINT) AS all_chars
  FROM g3 GROUP BY doc_id
)
SELECT t.doc_id,
  {X.fround("CAST(t.top2_chars AS DOUBLE) / t.n_chars", 6)} AS top_2gram_frac,
  {X.fround(
      "CASE WHEN d.all_chars > 0 THEN CAST(d.dup_chars AS DOUBLE) / d.all_chars "
      "ELSE 0.0 END", 6)} AS dup_3gram_frac,
  CASE WHEN CAST(t.top2_chars AS DOUBLE) / t.n_chars > {TOP_2GRAM_MAX_FRAC}
         OR (d.all_chars > 0 AND
             CAST(d.dup_chars AS DOUBLE) / d.all_chars > {DUP_3GRAM_MAX_FRAC})
       THEN 1 ELSE 0 END AS repetitive
FROM top2 t JOIN dup3 d ON t.doc_id = d.doc_id
"""
