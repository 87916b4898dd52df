"""Perceived-quality score compiler (SURVEY §2.8, operators Q1-Q4).

The reference computes a weighted 0-100 quality score per record with a
reflection-driven, per-record Java loop (util/ScoreHelper.java:29-95,
score/PQMath.java).  Here the same semantics are *compiled once* into a SQL
expression — Catalyst constant-folds the band constants and the whole thing
runs inside whole-stage codegen; no UDF, no Python on the hot path.

The compiler emits ANSI SQL text (CASE/comparisons/arithmetic only), which

1. Spark executes via ``F.expr`` — the idiomatic "client-side codegen" path,
2. DuckDB executes verbatim as the correctness oracle,

so engine and oracle share one source of truth and agree bit-for-bit in
double precision.

Semantics reproduced from the reference (file:line cited inline):

- SPEED records hard-score 0 (ScoreHelper.java:30-33).
- Unknown protocol -> 0 (criteria==null leaves sum 0, ScoreHelper.java:37,56).
- Any metric matching its ``outlier`` spec zeroes the whole record
  (PQMath.eqOutlier, ScoreHelper.java:49-52).
- Band selection is first-match in config order; a value outside every band
  takes the *last* band's ``lower`` un-interpolated (ScoreHelper.java:78-89).
- In-band interpolation (ScoreHelper.java:90-94, PQMath.java:96-112):
    direction 'up'   (lower is better):  lo + (hi-lo)*(bmax-x)/(bmax-bmin)
    direction 'down' (higher is better): lo + (hi-lo)*(x-bmin)/(bmax-bmin)
  with unbounded band edges substituted by Float.MIN_VALUE /
  Float.MAX_VALUE/100 (score/Score.java:getMinVal/getMaxVal) — kept verbatim,
  quirks included.
- Final: clamp to [0,100] then round half-up to 2 decimals
  (ScoreHelper.java:54-60).

Deliberate delta: the reference computes in Java ``float`` and would NPE on a
missing metric field; this engine computes in double (documented tolerance,
SURVEY §7.4) and treats a NULL metric as contributing 0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .pq_criteria import CRITERIA, Band, Metric


def _lit(v: float) -> str:
    """Render a double literal that Spark SQL and DuckDB parse identically.

    Plain decimal literals (``85.41``) parse as DECIMAL on Spark but DOUBLE on
    DuckDB; exponent-form literals parse as DOUBLE on both.  ``repr`` already
    emits an exponent for very small/large magnitudes — append ``E0`` only to
    the plain forms.
    """
    r = repr(float(v))
    return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "E0"


def _band_cond(x: str, b: Band) -> str:
    conds = []
    if b.lo is not None:
        conds.append(f"{x} {'>=' if b.lo_incl else '>'} {_lit(b.lo)}")
    if b.hi is not None:
        conds.append(f"{x} {'<=' if b.hi_incl else '<'} {_lit(b.hi)}")
    return " AND ".join(conds) if conds else "TRUE"


def _band_value(x: str, m: Metric, b: Band) -> str:
    """Interpolated, weight-multiplied score for value `x` inside band `b`."""
    bmin, bmax = b.interp_lo, b.interp_hi
    rng = bmax - bmin
    if m.direction == "down":
        frac = f"(({x}) - {_lit(bmin)})"
    else:
        frac = f"({_lit(bmax)} - ({x}))"
    return f"({_lit(b.lower)} + {_lit(b.upper - b.lower)} * {frac} / {_lit(rng)}) * {_lit(m.weight)}"


def outlier_cond_sql(x: str, outlier: str) -> str:
    """PQMath.eqOutlier (score/PQMath.java:53-84) as a boolean SQL expr."""
    if not outlier:
        return "FALSE"
    parts = []
    for clause in outlier.split(","):
        op, val = clause.split(":")
        op = op.strip()
        if op not in (">", "<", ">=", "<="):
            op = "="  # default branch: equality
        parts.append(f"{x} {op} {_lit(float(val))}")
    return "(" + " OR ".join(parts) + ")"


def metric_term_sql(m: Metric, x: str) -> str:
    """Weighted score contribution of one metric (NULL value -> 0)."""
    whens = [f"WHEN ({x}) IS NULL THEN 0.0"]
    for b in m.bands:
        whens.append(f"WHEN {_band_cond(f'({x})', b)} THEN {_band_value(x, m, b)}")
    worst = m.bands[-1]
    # Out-of-every-band: last band's lower * weight, no interpolation
    # (ScoreHelper.java:84-89).
    fallback = worst.lower * m.weight
    return "(CASE " + " ".join(whens) + f" ELSE {_lit(fallback)} END)"


def record_score_sql(protocol: str, colmap: dict[str, str] | None = None) -> str:
    """Full record score expression for one protocol.

    ``colmap`` maps metric name -> SQL expression supplying that metric's
    value (defaults to the metric name itself as a column reference).
    """
    if protocol == "SPEED":  # ScoreHelper.java:30-33
        return "0.0"
    crit = CRITERIA.get(protocol)
    if crit is None:  # unknown protocol -> 0 (ScoreHelper.java:37,56-60)
        return "0.0"
    colmap = colmap or {}
    xs = {m.name: colmap.get(m.name, m.name) for m in crit.metrics}
    outliers = [
        f"(({xs[m.name]}) IS NOT NULL AND {outlier_cond_sql(f'({xs[m.name]})', m.outlier)})"
        for m in crit.metrics
        if m.outlier
    ]
    any_outlier = " OR ".join(outliers) if outliers else "FALSE"
    total = " + ".join(metric_term_sql(m, xs[m.name]) for m in crit.metrics)
    from .dialect import fround

    clamped = f"LEAST(GREATEST({total}, 0.0), 100.0)"
    return f"(CASE WHEN {any_outlier} THEN 0.0 ELSE {fround(clamped, 2)} END)"


def record_score_col(protocol: str, colmap: dict[str, str] | None = None) -> Column:
    return F.expr(record_score_sql(protocol, colmap))


def dispatch_score_sql(
    protocol_expr: str,
    colmaps: dict[str, dict[str, str]],
) -> str:
    """Protocol-dispatched score: one CASE over ``protocol_expr`` covering the
    given ``{protocol: colmap}`` set.  Mirrors the reference's per-record
    ``criteriaMap.get(taskTypeName)`` dispatch (ScoreHelper.java:34-37)."""
    whens = [
        f"WHEN {protocol_expr} = '{p}' THEN {record_score_sql(p, cm)}"
        for p, cm in colmaps.items()
    ]
    return "(CASE " + " ".join(whens) + " ELSE 0.0 END)"


def dispatch_score_col(protocol_expr: str, colmaps: dict[str, dict[str, str]]) -> Column:
    return F.expr(dispatch_score_sql(protocol_expr, colmaps))
