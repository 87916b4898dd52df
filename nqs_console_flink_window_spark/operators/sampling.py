"""Training-corpus assembly: the C4-style cleanup pipeline as one two-dialect
SQL template — exact dedup → quality filter → per-source cap → deterministic
stratified sampling.

Every stage is the scale-correct shape:
- exact dedup: ROW_NUMBER over md5(text) — one hash shuffle, no self-join.
- quality: tokenize once per row, own-language stopword density + length
  saturation (operators/text.py), pure JVM-side expressions.
- per-source cap: ROW_NUMBER over (source) ordered by quality — the
  common-crawl "max N pages per domain" rule; one shuffle on source (salt the
  window key if one source dominates — operators/skew.py playbook).
- stratified sample: md5-derived 60-bit hash mod 100 against a per-language
  rate — deterministic (reproducible corpus builds, no RNG state), exactly
  the same rows on any cluster size, and cross-engine-identical so the whole
  pipeline stays value-hash checkable against the DuckDB oracle.
"""

from __future__ import annotations

from ..functions import dialect as X
from . import text as TX

CAP_PER_SOURCE = 20
MIN_QUALITY = 15.0
# per-language keep percentages: downsample the dominant language, keep the
# long tail (the usual corpus-balancing move)
LANG_PCT = {"en": 40, "de": 60, "es": 60, "fr": 60, "zh": 60}
DEFAULT_PCT = 80


def _pct_case() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(LANG_PCT.items()))
    return f"CASE lang {whens} ELSE {DEFAULT_PCT} END"


def training_sample_sql(d: str, table: str = "documents") -> str:
    own_hits = "CASE lang WHEN 'de' THEN hits_de WHEN 'es' THEN hits_es ELSE hits_en END"
    quality = TX.quality_score_from(own_hits, "n_tokens")
    sample_hash = X.md5_int(d, "CAST(doc_id AS STRING)")
    return f"""
WITH dedup AS (
  SELECT doc_id, lang, source, text, n_chars,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn_dup
  FROM {table}
),
tokenized AS (
  SELECT doc_id, lang, source, n_chars, {TX.tokens_expr(d)} AS toks
  FROM dedup WHERE rn_dup = 1
),
scored AS (
  SELECT doc_id, lang, source, n_chars,
         {X.arr_size(d, 'toks')} AS n_tokens,
         {TX.stopword_hits_from(d, 'en', 'toks')} AS hits_en,
         {TX.stopword_hits_from(d, 'de', 'toks')} AS hits_de,
         {TX.stopword_hits_from(d, 'es', 'toks')} AS hits_es
  FROM tokenized
),
quality AS (
  SELECT doc_id, lang, source, n_chars, n_tokens,
         {quality} AS quality_score
  FROM scored
),
capped AS (
  SELECT doc_id, lang, source, n_chars, n_tokens, quality_score,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY quality_score DESC, doc_id
         ) AS rn_src
  FROM quality
  WHERE quality_score >= {MIN_QUALITY}E0
)
SELECT doc_id, lang, source, n_tokens, quality_score,
       {_pct_case()} AS sample_pct
FROM capped
WHERE rn_src <= {CAP_PER_SOURCE}
  AND {sample_hash} % 100 < {_pct_case()}
"""
