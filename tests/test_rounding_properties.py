"""Property tests for the cross-engine exact-rounding contract.

Every displayed ratio in the repo is round-half-up (non-negative) or
round-half-away-from-zero (signed) micro-units computed as integer
arithmetic: ``(2·a·S + b) div (2·b)`` with a sign CASE for negative
numerators. These tests pin that formula — in BOTH engines — against
an independent Fraction-based definition, over hypothesis-generated
operands, so a regression in the arithmetic convention (or an engine
semantics change in div/// on edge values) fails loudly instead of as
a one-in-a-million hash mismatch at some ungraded scale factor.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


def _round_half_away(a: int, b: int, scale: int = 1_000_000) -> int:
    """Reference: round(a/b * scale), ties away from zero, exact."""
    f = Fraction(a * scale, b)
    if f >= 0:
        return int((f + Fraction(1, 2)).__floor__())
    return -int((-f + Fraction(1, 2)).__floor__())


_SIGNED_SQL = (
    "CASE WHEN a >= 0"
    " THEN (2 * a * 1000000 + b) {div} (2 * b)"
    " ELSE -((2 * -a * 1000000 + b) {div} (2 * b)) END"
)

pairs = st.tuples(
    st.integers(min_value=-10**9, max_value=10**9),
    st.integers(min_value=1, max_value=10**9),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(pairs, min_size=1, max_size=300))
def test_signed_micro_division_matches_fraction_in_spark(spark, cases):
    df = spark.createDataFrame(cases, "a LONG, b LONG")
    got = [
        r.m
        for r in df.selectExpr(
            _SIGNED_SQL.format(div="div") + " AS m"
        ).collect()
    ]
    assert got == [_round_half_away(a, b) for a, b in cases]


@settings(max_examples=10, deadline=None)
@given(st.lists(pairs, min_size=1, max_size=300))
def test_signed_micro_division_matches_fraction_in_duckdb(cases):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (i INTEGER, a BIGINT, b BIGINT)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, a, b) for i, (a, b) in enumerate(cases)],
    )
    got = [
        r[0]
        for r in con.execute(
            "SELECT "
            + _SIGNED_SQL.format(div="//")
            + " FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got == [_round_half_away(a, b) for a, b in cases]


@given(
    st.lists(
        st.integers(min_value=0, max_value=500_000_000),
        min_size=1,
        max_size=16,
    ),
)
def test_ewma_telescoped_equals_untelescoped_floor(hist):
    """The Spark plan folds Σ vqᵢ·2ⁱ / (2ᴸ−1) (telescoped) while the
    DuckDB twin sums Σ vq·2^(16−d) / Σ 2^(16−d): both are the same
    rational scaled by 2^(16−L), so the half-up integer divisions must
    agree for EVERY history — the exact property the oracle parity of
    event_ewma_spikes rests on."""
    L = len(hist)
    num_t = sum(x << i for i, x in enumerate(hist))
    den_t = (1 << L) - 1
    # untelescoped: distance d = L - i, weight 2^(16 - d)
    num_u = sum(x << (16 - (L - i)) for i, x in enumerate(hist))
    den_u = sum(1 << (16 - (L - i)) for i in range(L))
    assert (2 * num_t + den_t) // (2 * den_t) == (
        2 * num_u + den_u
    ) // (2 * den_u)
    f = Fraction(num_t, den_t)
    assert Fraction(num_u, den_u) == f
