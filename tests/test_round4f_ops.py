"""Engine-independent pins for the round-4f operator batch: pure-
Python third-engine recomputation (histogram quantiles, t-closeness,
RAKE) and geometry invariants (resize plan) — guards against a bug
shared by both SQL engines that parity checking cannot see."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

SF = "/root/testdata/sf0.001"


def _micro(x: float) -> int:
    m = int(math.floor(abs(float(x)) * 1_000_000 + 0.5))
    return m if x >= 0 else -m


def test_histogram_quantiles_match_pure_python(spark):
    from big_data_2021_spark_streaming_spark.operators.sketches import (
        HQ_BUCKETS,
        HQ_QUANTILES,
        sketch_histogram_quantiles,
    )

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ms = sorted(_micro(v) for v in ev["value"])
    n = len(ms)
    mn, mx = ms[0], ms[-1]
    rng = mx - mn + 1
    cells = Counter((m - mn) * HQ_BUCKETS // rng for m in ms)
    expected = {}
    for q in HQ_QUANTILES:
        r = (q * n + 99) // 100
        cum = 0
        for cell in sorted(cells):
            cum += cells[cell]
            if cum >= r:
                break
        lo = cell * rng // HQ_BUCKETS
        hi = max(lo, (cell + 1) * rng // HQ_BUCKETS - 1)
        est = mn + (lo + hi) // 2
        exact = ms[r - 1]
        expected[q] = (n, est, exact, abs(est - exact))

    rows = sketch_histogram_quantiles(spark, SF).collect()
    assert {r.q for r in rows} == set(expected)
    for r in rows:
        assert (r.n, r.est_micro, r.exact_micro, r.abs_err_micro) == expected[
            r.q
        ], r.q


def test_t_closeness_matches_pure_python(spark):
    from big_data_2021_spark_streaming_spark.operators.audit import (
        T_CLOSE_MICRO,
        t_closeness_audit,
    )

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    cust = cust.assign(band=(cust["c_acctbal"] / 1000).apply(math.floor))
    glob = Counter(cust["band"])
    bands = sorted(glob)
    n_total = len(cust)
    expected = {}
    for (nk, seg), grp in cust.groupby(["c_nationkey", "c_mktsegment"]):
        gcnt = Counter(grp["band"])
        gsize = len(grp)
        cum_n = cum_g = absdiff = 0
        for b in bands:
            cum_n += gcnt.get(b, 0)
            cum_g += glob[b]
            absdiff += abs(cum_n * n_total - cum_g * gsize)
        denom = gsize * n_total * (len(bands) - 1)
        emd = (2 * absdiff * 1_000_000 + denom) // (2 * denom)
        expected[(nk, seg)] = (gsize, emd, emd > T_CLOSE_MICRO)

    rows = t_closeness_audit(spark, SF).collect()
    assert {(r.c_nationkey, r.c_mktsegment) for r in rows} == set(expected)
    for r in rows:
        gsize, emd, breached = expected[(r.c_nationkey, r.c_mktsegment)]
        assert (r.group_size, r.emd_micro, r.breached) == (
            gsize,
            emd,
            breached,
        ), (r.c_nationkey, r.c_mktsegment)


def test_resize_plan_geometry_invariants(spark):
    from big_data_2021_spark_streaming_spark.operators.multimodal import (
        RESIZE_TARGET,
        multimodal_resize_plan,
    )

    rows = multimodal_resize_plan(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.doc_id % 3 == 0  # image assets only
        if r.skip:
            assert r.out_w is None and r.out_h is None
            continue
        # the longer side lands exactly on the target; nothing exceeds it
        assert max(r.out_w, r.out_h) == RESIZE_TARGET
        assert 0 < r.out_w <= RESIZE_TARGET
        assert 0 < r.out_h <= RESIZE_TARGET
        # centering pad: non-negative, and pad*2 within 1 of the slack
        assert r.pad_left >= 0 and r.pad_top >= 0
        assert 0 <= (RESIZE_TARGET - r.out_w) - 2 * r.pad_left <= 1
        assert 0 <= (RESIZE_TARGET - r.out_h) - 2 * r.pad_top <= 1
        # aspect preserved to half-up rounding of the scaled short side
        mx = max(r.meta_width, r.meta_height)
        assert r.out_w == (2 * r.meta_width * RESIZE_TARGET + mx) // (2 * mx)
        assert r.out_h == (2 * r.meta_height * RESIZE_TARGET + mx) // (2 * mx)


def test_rake_keywords_match_pure_python(spark):
    from big_data_2021_spark_streaming_spark.operators.text import (
        RAKE_MAX_WORDS,
        RAKE_TOPN,
        STOPWORDS,
        rake_keywords,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    phrases = []  # (doc, list-of-words)
    for _, row in docs.iterrows():
        toks = [t.lower() for t in row["text"].strip().split() if t]
        cur: list[str] = []
        for t in toks:
            if t in STOPWORDS:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(cur)
    phrases = [p for p in phrases if len(p) <= RAKE_MAX_WORDS]
    freq: Counter = Counter()
    degree: Counter = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            degree[w] += len(p)
    word_score = {
        w: (2 * degree[w] * 1_000_000 + freq[w]) // (2 * freq[w])
        for w in freq
    }
    by_text: dict[str, list[int]] = defaultdict(list)
    for p in phrases:
        by_text[" ".join(p)].append(sum(word_score[w] for w in p))
    ranked = sorted(
        ((min(ss), t, len(ss)) for t, ss in by_text.items()),
        key=lambda x: (-x[0], x[1]),
    )[:RAKE_TOPN]
    expected = {t: (n, s) for s, t, n in ranked}

    rows = rake_keywords(spark, SF).collect()
    assert len(rows) == min(RAKE_TOPN, len(by_text))
    assert {r.phrase for r in rows} == set(expected)
    for r in rows:
        n, s = expected[r.phrase]
        assert (r.n_occurrences, r.score_micro) == (n, s), r.phrase


def test_kcore_fixed_point_and_pure_python_peel(spark):
    """Recompute the peeling in pure Python from the operator's own
    pair frame (pins the iteration logic independently of both SQL
    engines), and assert the fixed rounds actually converged — every
    survivor keeps degree >= KCORE_K inside the final core."""
    from big_data_2021_spark_streaming_spark.operators.dedup import (
        KCORE_K,
        KCORE_ROUNDS,
        kcore_nodes,
        minhash_lsh_pairs,
    )

    pairs = [
        (r.doc_id_a, r.doc_id_b)
        for r in minhash_lsh_pairs(spark, SF)
        .select("doc_id_a", "doc_id_b")
        .collect()
    ]
    edges = pairs + [(b, a) for a, b in pairs]
    surv = None
    for _ in range(KCORE_ROUNDS):
        deg = Counter()
        for s, d in edges:
            if surv is None or (s in surv and d in surv):
                deg[s] += 1
        surv = {n for n, c in deg.items() if c >= KCORE_K}
    final = Counter()
    for s, d in edges:
        if s in surv and d in surv:
            final[s] += 1

    rows = kcore_nodes(spark, SF).collect()
    got = {r.doc_id: r.core_deg for r in rows}
    assert got == dict(final)
    # convergence: one more peel changes nothing
    assert all(c >= KCORE_K for c in final.values()), "rounds did not converge"


def test_power_iteration_matches_pure_python(spark):
    """Full third-engine recomputation: exact integer covariance
    numerator, 3 fixed HUGEINT matvec rounds with half-away
    renormalization, Rayleigh quotient — pins every intermediate bit
    independently of both SQL engines."""
    from big_data_2021_spark_streaming_spark.operators.similarity import (
        PCA_DIMS,
        PCA_ROUNDS,
        power_iteration_pca,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")

    def milli(x: float) -> int:
        m = int(math.floor(abs(float(x)) * 1000 + 0.5))
        return m if x >= 0 else -m

    comps = [
        [milli(x) for x in row["embedding"][:PCA_DIMS]]
        for _, row in emb.iterrows()
    ]
    n = len(comps)
    s = [sum(c[i] for c in comps) for i in range(PCA_DIMS)]
    M = [
        [
            n * sum(c[i] * c[j] for c in comps) - s[i] * s[j]
            for j in range(PCA_DIMS)
        ]
        for i in range(PCA_DIMS)
    ]

    def half_away(w: int, mx: int) -> int:
        if w < 0:
            return -((2 * (-w) * 1_000_000 + mx) // (2 * mx))
        return (2 * w * 1_000_000 + mx) // (2 * mx)

    v = [1_000_000] * PCA_DIMS
    for _ in range(PCA_ROUNDS):
        w = [sum(M[i][j] * v[j] for j in range(PCA_DIMS)) for i in range(PCA_DIMS)]
        mx = max(abs(x) for x in w)
        v = [half_away(x, mx) for x in w]
    w = [sum(M[i][j] * v[j] for j in range(PCA_DIMS)) for i in range(PCA_DIMS)]
    num = sum(v[i] * w[i] for i in range(PCA_DIMS))
    den = sum(v[i] * v[i] for i in range(PCA_DIMS))
    lam = (
        -((2 * (-num) + den) // (2 * den))
        if num < 0
        else (2 * num + den) // (2 * den)
    )

    rows = power_iteration_pca(spark, SF).collect()
    assert len(rows) == PCA_DIMS
    for r in rows:
        assert r.loading_micro == v[r.gd], r.gd
        assert r.lambda_scaled == lam
    # the dominant eigenvalue of a covariance numerator is positive
    assert lam > 0


def test_shard_plan_matches_pure_python(spark):
    """Third-engine recomputation of the hash-order bin packing, plus
    the packing invariants: payload conservation and every shard except
    possibly the last cut at/after the target boundary."""
    import hashlib

    from big_data_2021_spark_streaming_spark.operators.curation import (
        SHARD_BYTES,
        corpus_shard_plan,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = sorted(
        (
            (h60(f"shard:{r.doc_id}"), r.doc_id, r.source, int(r.n_chars))
            for r in docs.itertuples()
        )
    )
    expected: dict[int, list] = {}
    cum = 0
    for _, doc_id, source, nb in rows:
        sid = cum // SHARD_BYTES
        e = expected.setdefault(sid, [0, 0, set()])
        e[0] += 1
        e[1] += nb
        e[2].add(source)
        cum += nb

    got = {
        r.shard_id: (r.n_docs, r.payload_chars, r.n_sources)
        for r in corpus_shard_plan(spark, SF).collect()
    }
    assert got == {
        sid: (n, p, len(srcs)) for sid, (n, p, srcs) in expected.items()
    }
    # conservation: payloads reassemble the corpus
    assert sum(p for _, p, _ in got.values()) == int(docs["n_chars"].sum())


def test_quality_dup_profile_invariants(spark):
    """Deciles cover the corpus evenly (±1), dup counts bound by doc
    counts, and the decile totals reassemble the corpus and its
    non-canonical population exactly."""
    from big_data_2021_spark_streaming_spark.operators.curation import (
        QD_DECILES,
        quality_dup_profile,
    )
    from big_data_2021_spark_streaming_spark.operators.dedup import (
        near_dup_clusters,
    )

    rows = quality_dup_profile(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    assert sum(r.n_docs for r in rows) == n
    assert {r.decile for r in rows} <= set(range(1, QD_DECILES + 1))
    lo, hi = n // QD_DECILES, n // QD_DECILES + 1
    for r in rows:
        assert lo <= r.n_docs <= hi, r.decile
        assert 0 <= r.n_dups <= r.n_docs
        assert r.dup_micro == (2 * r.n_dups * 1_000_000 + r.n_docs) // (
            2 * r.n_docs
        )
    n_dups_total = sum(
        0 if r.is_canonical else 1
        for r in near_dup_clusters(spark, SF).collect()
    )
    assert sum(r.n_dups for r in rows) == n_dups_total


def test_recall_sweep_consistent_with_standalone_reports(spark):
    """The sweep's per-method recall must reproduce what the dedicated
    acceptance queries compute: mean of similarity_ann_recall's
    per-query PQ recall, and the matryoshka report's aggregate — and
    every recall is a valid micro-rational over n_exact_pairs."""
    from big_data_2021_spark_streaming_spark.operators.similarity import (
        TOPK,
        matryoshka_recall,
        recall_sweep,
    )

    rows = {r.method: r for r in recall_sweep(spark, SF).collect()}
    assert set(rows) == {
        "lsh", "ivf", "pq", "ivf_pq", "ivfpq_res", "sq", "bq", "mrl",
    }
    for r in rows.values():
        assert r.n_exact_pairs > 0 and r.n_exact_pairs % TOPK == 0
        assert 0 <= r.n_hits <= r.n_exact_pairs
        assert r.recall_micro == (
            2 * r.n_hits * 1_000_000 + r.n_exact_pairs
        ) // (2 * r.n_exact_pairs)

    mrl = matryoshka_recall(spark, SF).collect()
    assert rows["mrl"].n_hits == sum(r.n_hits for r in mrl)
    assert rows["mrl"].n_exact_pairs == sum(r.n_exact for r in mrl)
    # full-code-scan methods must find true neighbors even on the tiny
    # test corpus; bucket-pruned methods (lsh/ivf*) may legitimately
    # hit zero there (one 8-bit bucket of ~2 vectors) — their recall is
    # graded at real scale by the oracle gate instead
    for m in ("pq", "sq", "bq", "mrl"):
        assert rows[m].n_hits > 0, m


def test_join_advisor_matches_pure_python_rules(spark):
    from collections import Counter

    from big_data_2021_spark_streaming_spark.operators.audit import (
        ADV_BROADCAST_ROWS,
        ADV_SALT_SHARE_MICRO,
        ADV_SHJ_RATIO,
        FK_EDGES,
        join_strategy_advisor,
    )

    tables = {
        t: pd.read_parquet(f"{SF}/{t}.parquet")
        for t in {e[0] for e in FK_EDGES} | {e[2] for e in FK_EDGES}
    }
    expected = {}
    for child_t, fk, parent_t, pk in FK_EDGES:
        child, parent = tables[child_t], tables[parent_t]
        cnt = Counter(child[fk])
        child_rows, top = len(child), max(cnt.values())
        parent_rows = len(parent)
        share = (2 * top * 1_000_000 + child_rows) // (2 * child_rows)
        if parent_rows <= ADV_BROADCAST_ROWS:
            strat = "broadcast"
        elif max(child_rows, parent_rows) >= ADV_SHJ_RATIO * min(
            child_rows, parent_rows
        ):
            strat = "shuffle_hash"
        else:
            strat = "sort_merge"
        expected[f"{child_t}.{fk}->{parent_t}.{pk}"] = (
            child_rows,
            parent_rows,
            share,
            strat,
            share > ADV_SALT_SHARE_MICRO,
        )

    rows = join_strategy_advisor(spark, SF).collect()
    assert {r.relationship for r in rows} == set(expected)
    for r in rows:
        assert (
            r.child_rows,
            r.parent_rows,
            r.top_key_share_micro,
            r.strategy,
            r.salt_recommended,
        ) == expected[r.relationship], r.relationship
