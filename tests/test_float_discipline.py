"""Fleet-wide float-discipline lint over every registered oracle SQL.

The round-6 three-scale gate caught a raw double SUM (semantic_pairs'
dot product) flipping an fround(6) tie at sf0.1 — double addition is
association-order-dependent, so ANY ``SUM(expr)`` whose argument does
float arithmetic without an exact accumulator (DECIMAL per-term cast,
integer cast, or integer ``DIV``) is a latent cross-engine hash failure
that fixture luck can hide for rounds.  This test extracts every SUM
argument from every registered oracle SQL (the engine side shares the
same fragments) and requires each arithmetic-bearing argument to be
either exactly-accumulated or on the reviewed integer whitelist below.
A new unguarded sum fails here the day it is registered, not the day a
corpus lands on a tie."""

from __future__ import annotations

import re

from nqs_console_flink_window_spark.plans import all as _all  # noqa: F401
from nqs_console_flink_window_spark.plans.registry import REGISTRY

# SUM arguments that DO contain * or / but are verified integer-exact
# (int64 x {0,1,-1,+-small-int} products / integer subtraction): each entry
# is a substring that uniquely identifies the reviewed site.
INTEGER_EXACT_WHITELIST = (
    "q * pl.s",          # SRP signature dot: quantized BIGINT x ±1
    "q * s",             # JL projection dot: quantized BIGINT x ±1
    "(1 << p)",          # LSH bucket bit weights: 0/1 x power of two
    "xc * xc",           # per_user_trend: integer-second offsets squared
    "tokens - alloc1",   # mixture_allocation: BIGINT difference
    "c * CAST(floor(ln", # token_entropy: BIGINT count x qln_micro BIGINT
)

EXACT_MARKERS = ("DECIMAL", "AS BIGINT", "AS INT", " DIV ", "//")


def _sum_args(sql: str) -> list[tuple[str, str]]:
    """Every SUM(...) argument with balanced parentheses, plus the text
    right after the closing paren (a ``CAST(SUM(int*int) AS BIGINT)``
    wrapper marks an integer-exact sum from the outside)."""
    out = []
    for m in re.finditer(r"\bSUM\s*\(", sql, re.IGNORECASE):
        i, depth = m.end(), 1
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        out.append((sql[m.end() : i - 1], sql[i : i + 16]))
    return out


def test_no_unguarded_float_arithmetic_in_any_registered_sum() -> None:
    offenders = []
    for name, q in REGISTRY.items():
        if q.sql is None:
            continue
        for arg, suffix in _sum_args(q.sql):
            if "*" not in arg and "/" not in arg:
                continue  # plain column sums are checked by type elsewhere
            if any(mark in arg for mark in EXACT_MARKERS):
                continue
            if "AS BIGINT" in suffix or "AS INT" in suffix:
                continue  # integer-product sum, cast-asserted from outside
            if any(w in arg for w in INTEGER_EXACT_WHITELIST):
                continue
            offenders.append((name, arg.strip()[:90]))
    assert not offenders, offenders
