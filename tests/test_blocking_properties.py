"""Property tests for the pure math behind two round-3 operators.

These hold OUTSIDE any engine: if they fail, the operator's guarantee
is broken even when both Spark and DuckDB agree with each other.

1. Deletion-neighborhood blocking (fuzzy_name_matches): ANY two strings
   within edit distance 1 share a variant ({s} ∪ single-deletions(s)),
   so the blocked equi-join has perfect recall at distance 1 — the
   SymSpell completeness property.
2. The exact half-up rational division ``(2a + b) div (2b)`` used for
   every micro-unit mean/share (quality score, mixture report, LSH
   calibration, confusion shares) equals true round-half-up of a/b.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def _variants(s: str) -> set[str]:
    # pure twin of the Spark/DuckDB variant construction in
    # plans.analytics.fuzzy_name_matches
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


_ALPHA = "ab#0"  # tiny alphabet → frequent collisions and edge shapes


@st.composite
def _edit1_pair(draw):
    s = draw(st.text(alphabet=_ALPHA, min_size=0, max_size=12))
    kind = draw(st.sampled_from(["sub", "del", "ins", "eq"]))
    if kind == "eq" or (kind in ("sub", "del") and not s):
        return s, s
    i = draw(st.integers(0, len(s) - 1 if kind != "ins" else len(s)))
    c = draw(st.sampled_from(_ALPHA))
    if kind == "sub":
        return s, s[:i] + c + s[i + 1 :]
    if kind == "del":
        return s, s[:i] + s[i + 1 :]
    return s, s[:i] + c + s[i:]


@settings(max_examples=300, deadline=None)
@given(_edit1_pair())
def test_deletion_blocking_is_complete_at_distance_1(pair):
    s, t = pair
    assert _variants(s) & _variants(t), (
        f"edit-distance-1 pair shares no variant: {s!r} vs {t!r}"
    )


@settings(max_examples=500, deadline=None)
@given(st.integers(0, 10**12), st.integers(1, 10**6))
def test_half_up_integer_division_matches_fraction(a, b):
    got = (2 * a + b) // (2 * b)
    fr = Fraction(a, b)
    expect = int(fr + Fraction(1, 2))  # floor(a/b + 1/2) = round half up
    assert got == expect, f"{a}/{b}: {got} != {expect}"


@settings(max_examples=300, deadline=None)
@given(
    st.integers(1, 2000),  # n_tokens
    st.integers(0, 2000),  # n_stop (may exceed n_tokens only artificially)
    st.integers(0, 20000),  # total_len
)
def test_quality_micro_formula_matches_rational(n_tokens, n_stop, total_len):
    # integer expression from operators.text.quality_lineage
    n_stop = min(n_stop, n_tokens)
    n1 = min(n_tokens * 5000, 500000)
    n3 = min(20000 * total_len, 200000 * n_tokens)
    got = n1 + (2 * (300000 * n_stop + n3) + n_tokens) // (2 * n_tokens)
    # rational reference: term1 + round_half_up of the shared-denominator
    # rational (term1 is an exact micro integer, so this equals rounding
    # the full sum)
    fr = Fraction(300000 * n_stop + n3, n_tokens)
    expect = n1 + int(fr + Fraction(1, 2))
    assert got == expect


def _winnow_py(s: str, k: int = 5, w: int = 4) -> set[int]:
    """Pure twin of operators.text.winnow_fingerprints: normalize,
    hash every k-gram with the cross-engine h60 family, keep each
    w-window's min (full windows, plus the single global min when the
    doc is shorter than one window)."""
    import re

    from big_data_2021_spark_streaming_spark.operators.similarity import (
        _h60_py,
    )

    norm = re.sub(r"\s+", " ", s).strip().lower()
    if len(norm) < k:
        hashes = [_h60_py(norm)]
    else:
        hashes = [_h60_py(norm[i : i + k]) for i in range(len(norm) - k + 1)]
    n = len(hashes)
    if n <= w:
        return {min(hashes)}
    return {min(hashes[i : i + w]) for i in range(n - w + 1)}


@settings(max_examples=150, deadline=None)
@given(
    # space-free: whitespace inside the block would collapse under the
    # \s+ normalization and could shrink the shared run below w+k-1
    st.text(alphabet="abcd", min_size=8, max_size=20),  # shared substring
    st.text(alphabet="wxyz", min_size=0, max_size=10),
    st.text(alphabet="wxyz", min_size=0, max_size=10),
)
def test_winnowing_guarantee_shared_substring_shares_fingerprint(
    shared, pre, post
):
    """The Schleimer/Wilkerson/Aiken guarantee for (k=5, w=4): any two
    documents sharing a run of ≥ w+k-1 = 8 identical characters share
    at least one selected fingerprint. The shared block uses a disjoint
    alphabet from the noise so normalization can't merge across the
    boundary."""
    a = pre + shared + post
    b = post + shared + pre
    assert _winnow_py(a) & _winnow_py(b), (
        f"no shared fingerprint: {a!r} vs {b!r}"
    )


# ---------------------------------------------------------------------
# Prefix-filter exact-join losslessness on ADVERSARIAL corpora: tiny
# alphabets force shingle collisions, and hypothesis explores empty
# docs, one-token docs (no shingles), identical docs, and length mixes
# the fixed testdata corpus never produces.
# ---------------------------------------------------------------------

_pf_doc = st.lists(
    st.sampled_from(["a", "b", "ab", "ba", "x"]),
    min_size=0,
    max_size=12,
).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(_pf_doc, min_size=2, max_size=12))
def test_prefix_filter_join_lossless_on_generated_corpora(
    spark, tmp_path_factory, texts
):
    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.dedup import (
        PF_TAU_MICRO,
        prefix_filter_join,
    )

    d = tmp_path_factory.mktemp("pf_prop")
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(d / "documents.parquet")

    sets = {}
    for i, t in enumerate(texts):
        toks = t.strip().split()
        sets[i] = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
    expected = set()
    ids = sorted(sets)
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            inter = len(sets[da] & sets[db])
            union = len(sets[da] | sets[db])
            if union and inter * 1_000_000 >= PF_TAU_MICRO * union:
                expected.add((da, db))

    rows = prefix_filter_join(spark, str(d)).collect()
    got = {(r.doc_id_a, r.doc_id_b) for r in rows}
    assert got == expected
    for r in rows:
        assert r.n_a == len(sets[r.doc_id_a])
        assert r.n_b == len(sets[r.doc_id_b])
        assert r.n_inter == len(sets[r.doc_id_a] & sets[r.doc_id_b])


def test_fs_weights_match_pure_python(spark):
    """Third-engine recompute of the Fellegi–Sunter scorer at sf0.001:
    deletion-neighborhood candidates, data-estimated u-probabilities,
    half-up micro field ratios, and the pinned left-to-right double
    product — plus the FS sanity law: agreement on a field always
    yields a larger weight than disagreement."""
    import pandas as pd

    from big_data_2021_spark_streaming_spark.plans.analytics import (
        FS_M_BAL,
        FS_M_NATION,
        FS_M_SEGMENT,
        linkage_fs_weights,
    )

    sf = "/root/testdata/sf0.001"
    cust = pd.read_parquet(f"{sf}/customer.parquet")

    def band(b: float) -> int:
        cents = int(round(abs(b) * 100)) * (1 if b >= 0 else -1)
        return int(cents / 100000)  # truncation toward zero, as both engines

    recs = {
        int(r["c_custkey"]): (
            str(r["c_name"]),
            int(r["c_nationkey"]),
            str(r["c_mktsegment"]),
            band(float(r["c_acctbal"])),
        )
        for _, r in cust.iterrows()
    }
    # deletion-neighborhood candidates with exact lev == 1
    from collections import defaultdict

    block = defaultdict(set)
    for k, (name, *_rest) in recs.items():
        block[name].add(k)
        for i in range(len(name)):
            block[name[:i] + name[i + 1 :]].add(k)

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    cand = set()
    for ks in block.values():
        for a in ks:
            for b in ks:
                if a < b and lev(recs[a][0], recs[b][0]) == 1:
                    cand.add((a, b))

    n = len(recs)
    u_den = n * (n - 1)

    def u_num(idx: int) -> int:
        c = defaultdict(int)
        for rec in recs.values():
            c[rec[idx]] += 1
        return sum(v * (v - 1) for v in c.values())

    u = {1: u_num(1), 2: u_num(2), 3: u_num(3)}
    ms = {1: FS_M_NATION, 2: FS_M_SEGMENT, 3: FS_M_BAL}

    def w(idx: int, agree: bool) -> int:
        mn, md = ms[idx]
        if agree:
            return (2 * mn * u_den * 10**6 + md * u[idx]) // (2 * md * u[idx])
        return (2 * (md - mn) * u_den * 10**6 + md * (u_den - u[idx])) // (
            2 * md * (u_den - u[idx])
        )

    expected = {}
    for a, b in cand:
        ags = [recs[a][i] == recs[b][i] for i in (1, 2, 3)]
        ws = [w(i, ag) for i, ag in zip((1, 2, 3), ags)]
        odds = float(ws[0]) * float(ws[1]) * float(ws[2]) / 1e18
        expected[(a, b)] = (
            tuple(int(x) for x in ags),
            tuple(x / 1e6 for x in ws),
            odds,
        )

    rows = linkage_fs_weights(spark, sf).collect()
    got = {
        (r.custkey_a, r.custkey_b): (
            (r.agree_nation, r.agree_segment, r.agree_balance),
            (r.w_nation, r.w_segment, r.w_balance),
            r.match_odds,
        )
        for r in rows
    }
    assert got == expected
    assert expected, "no candidate pairs at sf0.001 — scorer untested"
    for idx in (1, 2, 3):
        assert w(idx, True) > w(idx, False)


# ---------------------------------------------------------------------
# scale_up rep-mode name marker: cross-copy levenshtein >= 2
# ---------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        m[i][0] = i
    for j in range(len(b) + 1):
        m[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            m[i][j] = min(
                m[i - 1][j] + 1,
                m[i][j - 1] + 1,
                m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return m[len(a)][len(b)]


def test_rep_name_marker_keeps_copies_outside_edit1_blocking():
    """tools/scale_up.py rep mode's contract is that per-copy dup
    density matches the source corpus — which requires every pair of
    copy markers (and the unmarked k=0 original) to sit at levenshtein
    >= 2, or the deletion-neighborhood-blocked family
    (fuzzy_name_matches, linkage_fs_weights) gains K-1 artificial
    cross-copy twins per base name and its pair frame grows ~K^2 (the
    round-5 x50 sweep failure: >1 GiB of result rows). The doubled-
    digit marker pins that property; the dense mode keeps the old
    distance-1 markers as its deliberately adversarial corpus.

    Two properties pinned, because edit distance >= 2 alone does NOT
    imply no blocking collision (transposition-shaped distance-2 pairs
    like 'XY1'/'X1Y' still share a single-deletion variant): (1) the
    levenshtein bound, and (2) the ACTUAL blocking contract — the
    single-deletion variant sets of any two marked copies are
    disjoint, so the blocked equi-join admits no cross-copy candidate
    at all."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "scale_up_for_test",
        Path(__file__).resolve().parent.parent / "tools" / "scale_up.py",
    )
    scale_up = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(scale_up)
    _name_marker = scale_up._name_marker

    marks = {0: ""}
    marks.update({k: _name_marker(k, "rep") for k in range(1, 65)})
    # ADVICE r05: a one-char base under-exercises the marker boundary —
    # deletions INSIDE a longer digit-ending base (the TPC-H name shape,
    # e.g. 'Customer#000000001') can collide with marker-edge deletions
    # in ways 'X' never produces. Pin both shapes.
    for base in ("X", "Customer#000000001"):
        named = {k: base + m for k, m in marks.items()}
        for a in marks:
            for b in marks:
                if a < b:
                    d = _lev(named[a], named[b])
                    assert d >= 2, (base, a, b, marks[a], marks[b], d)
                    # the real contract: no shared single-deletion variant
                    assert not (_variants(named[a]) & _variants(named[b])), (
                        base, a, b, marks[a], marks[b],
                    )
    # dense mode is UNCHANGED: adjacent copies stay at distance 1
    assert _lev("X" + _name_marker(1, "dense"), "X" + _name_marker(2, "dense")) == 1
