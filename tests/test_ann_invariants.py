"""Semantic invariants of the approximate-NN stack, independent of the
DuckDB oracle: if both engines shared a bug, parity would still pass —
these pin what top-k output must look like regardless of engine."""

from __future__ import annotations

from collections import defaultdict

from big_data_2021_spark_streaming_spark.operators.similarity import (
    TOPK,
    ivf_pq_topk,
    pq_topk,
    topk_bruteforce,
)

SF = "/root/testdata/sf0.001"


def _check_topk_frame(rows, dist_field: str, ascending: bool) -> None:
    per_query = defaultdict(list)
    for r in rows:
        assert r.neighbor_id != r.query_id, "self-match leaked"
        per_query[r.query_id].append(r)
    assert per_query, "no queries produced results"
    for q, rs in per_query.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1)), (
            f"query {q}: ranks not contiguous"
        )
        assert len(rs) <= TOPK
        dists = [getattr(r, dist_field) for r in rs]
        ordered = sorted(dists) if ascending else sorted(dists, reverse=True)
        assert dists == ordered, f"query {q}: ranks disagree with {dist_field}"


def test_bruteforce_topk_invariants(spark):
    _check_topk_frame(
        topk_bruteforce(spark, SF).collect(), "cos_sim", ascending=False
    )


def test_pq_topk_invariants(spark):
    _check_topk_frame(
        pq_topk(spark, SF).collect(), "approx_dist", ascending=True
    )


def test_ivf_pq_is_subset_of_pq_candidates(spark):
    """IVF-PQ scores the same ADC metric as plain PQ but over a probe-
    bounded candidate set, so any (query, neighbor) it returns must
    carry the identical distance PQ computed for that pair."""
    ivf = ivf_pq_topk(spark, SF).collect()
    _check_topk_frame(ivf, "approx_dist", ascending=True)
    full = {
        (r.query_id, r.neighbor_id): r.approx_dist
        for r in pq_topk(spark, SF).collect()
    }
    overlap = [
        r for r in ivf if (r.query_id, r.neighbor_id) in full
    ]
    assert overlap, "IVF-PQ shares no pairs with PQ top-k on the fixture"
    for r in overlap:
        assert full[(r.query_id, r.neighbor_id)] == r.approx_dist


def test_semantic_dedup_invariants(spark):
    """SemDeDup verdict frame: one row per vector; canonical_id is
    never above the vector's own id; is_dup holds exactly when a
    lower-id close neighbor exists (canonical_id < vec_id); kept
    vectors are their own canonical; and close-neighbor counts are
    symmetric (a pair contributes to both endpoints), so the n_close
    total is even."""
    from big_data_2021_spark_streaming_spark.operators.dedup import (
        semantic_dedup,
    )

    rows = semantic_dedup(spark, SF).collect()
    assert len(rows) == len({r.vec_id for r in rows})
    total_close = 0
    for r in rows:
        assert r.canonical_id <= r.vec_id
        assert r.is_dup == (r.canonical_id < r.vec_id)
        if not r.is_dup:
            assert r.canonical_id == r.vec_id
        if r.n_close == 0:
            assert not r.is_dup
        total_close += r.n_close
    assert total_close % 2 == 0


def test_sq_topk_invariants(spark):
    from big_data_2021_spark_streaming_spark.operators.similarity import (
        sq_quality,
        sq_topk,
    )

    rows = sq_topk(spark, SF).collect()
    _check_topk_frame(rows, "sq_dist", ascending=True)
    for r in rows:
        assert r.sq_dist >= 0
    # half-up quantization guarantee: per-component reconstruction
    # error never exceeds half a quantization step — max_err <= rng/2
    # in the same 255*milli units ((rng+1)//2 allows the half-up tie)
    q = sq_quality(spark, SF).collect()
    assert len(q) == 64
    for d in q:
        rng = d.mx - d.mn
        assert 0 <= d.avg_err_255milli <= d.max_err_255milli
        assert d.max_err_255milli <= (rng + 1) // 2, d


def test_range_search_invariants(spark):
    """Radius search: no self-matches, every hit clears the τ cutoff,
    and the result agrees with brute-force top-k wherever they overlap
    (same metric, same arithmetic)."""
    from big_data_2021_spark_streaming_spark.operators.similarity import (
        RANGE_TAU,
        range_search,
    )

    rows = range_search(spark, SF).collect()
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in topk_bruteforce(spark, SF).collect()
    }
    for r in rows:
        assert r.neighbor_id != r.query_id
        assert r.cos_sim >= round(RANGE_TAU, 6) - 1e-6
        if (r.query_id, r.neighbor_id) in exact:
            assert exact[(r.query_id, r.neighbor_id)] == r.cos_sim


def test_diverse_topk_respects_cell_quota(spark):
    """Diversity-quota top-k: ranks contiguous per query, scores
    non-increasing, and no query takes more than DIVERSE_PER_CELL
    results from any one IVF cell — the invariant that distinguishes
    it from plain top-k."""
    from big_data_2021_spark_streaming_spark.operators.similarity import (
        DIVERSE_PER_CELL,
        DIVERSE_TOPK,
        diverse_topk,
    )

    rows = diverse_topk(spark, SF).collect()
    per_query = defaultdict(list)
    for r in rows:
        assert r.neighbor_id != r.query_id
        per_query[r.query_id].append(r)
    assert per_query
    for q, rs in per_query.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= DIVERSE_TOPK
        dists = [r.cos_sim for r in rs]
        assert dists == sorted(dists, reverse=True)
        cells = defaultdict(int)
        for r in rs:
            cells[r.cell_id] += 1
        assert max(cells.values()) <= DIVERSE_PER_CELL, (q, dict(cells))


def test_rrf_fusion_scores_are_consistent(spark):
    """RRF: the fused score must equal the sum of the reciprocal
    contributions recomputable from the emitted ranks, every listed
    rank must be positive, and ordering must follow rrf_micro."""
    from big_data_2021_spark_streaming_spark.operators.text import (
        RRF_K,
        rrf_fusion,
    )

    rows = rrf_fusion(spark, SF).collect()
    assert rows

    def rr(rank):
        if rank is None:
            return 0
        return (2 * 1_000_000 + (RRF_K + rank)) // (2 * (RRF_K + rank))

    prev = None
    for r in sorted(rows, key=lambda r: r.rank):
        assert r.lex_rank is not None or r.dense_rank is not None
        assert r.rrf_micro == rr(r.lex_rank) + rr(r.dense_rank)
        if prev is not None:
            assert (prev.rrf_micro, -prev.doc_id) >= (r.rrf_micro, -r.doc_id)
        prev = r


def test_centroid_drift_matches_pure_python(spark):
    """Full third-engine recomputation of the parity-split centroid
    shift from the raw parquet in integer milli-units — pins the exact
    arithmetic (ROUND half-away, t_d = s1A*nB - s1B*nA, exact square
    sum) independently of both SQL engines."""
    import math

    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.similarity import (
        centroid_drift,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    sums: dict[tuple[int, int, int], int] = {}
    counts: dict[tuple[int, int], int] = {}
    for _, row in emb.iterrows():
        label, half = int(row["label"]), int(row["vec_id"]) % 2
        counts[(label, half)] = counts.get((label, half), 0) + 1
        for d, x in enumerate(row["embedding"]):
            # ROUND half-away-from-zero, matching both engines
            xq = int(math.floor(abs(float(x)) * 1000 + 0.5))
            xq = xq if x >= 0 else -xq
            k = (label, half, d)
            sums[k] = sums.get(k, 0) + xq

    expected = {}
    dim = len(emb.iloc[0]["embedding"])
    for label in sorted({int(x) for x in emb["label"]}):
        n_a, n_b = counts.get((label, 0), 0), counts.get((label, 1), 0)
        if n_a == 0 or n_b == 0:
            continue
        ssq = sum(
            (
                sums.get((label, 0, d), 0) * n_b
                - sums.get((label, 1, d), 0) * n_a
            )
            ** 2
            for d in range(dim)
        )
        expected[label] = (
            n_a,
            n_b,
            round(math.sqrt(ssq) / (n_a * n_b * 1000.0), 6),
        )

    rows = centroid_drift(spark, SF).collect()
    assert {r.label for r in rows} == set(expected)
    for r in rows:
        n_a, n_b, shift = expected[r.label]
        assert (r.n_vecs_a, r.n_vecs_b) == (n_a, n_b)
        assert r.centroid_shift >= 0
        assert abs(r.centroid_shift - shift) < 1e-9, (r.label, r.centroid_shift, shift)


def test_bq_topk_invariants_and_pure_python_codes(spark):
    """BQ top-k: ranks contiguous / rerank-cosine ordered, Hamming
    distances in [0, DIM], and the packed sign words recomputed by a
    pure-Python third engine from the raw parquet agree with what the
    candidate stage must have used (any (q, n) pair the operator
    returns must be inside the top-BQ_CANDIDATES Hamming short-list
    recomputed independently)."""
    import math

    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.similarity import (
        BQ_CANDIDATES,
        DIM,
        N_QUERIES,
        bq_topk,
    )

    rows = bq_topk(spark, SF).collect()
    _check_topk_frame(rows, "cos_sim", ascending=False)
    assert all(0 <= r.hamming <= DIM for r in rows)

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")

    def milli(x: float) -> int:
        xq = int(math.floor(abs(float(x)) * 1000 + 0.5))
        return xq if x >= 0 else -xq

    bits = {
        int(r["vec_id"]): [milli(x) >= 0 for x in r["embedding"]]
        for _, r in emb.iterrows()
    }

    def ham(a: int, b: int) -> int:
        return sum(x != y for x, y in zip(bits[a], bits[b]))

    shortlist: dict[int, set[int]] = {}
    for q in range(N_QUERIES):
        others = sorted(
            (v for v in bits if v != q), key=lambda v: (ham(q, v), v)
        )
        shortlist[q] = set(others[:BQ_CANDIDATES])

    for r in rows:
        assert r.hamming == ham(r.query_id, r.neighbor_id)
        assert r.neighbor_id in shortlist[r.query_id], (
            r.query_id,
            r.neighbor_id,
        )


def test_matryoshka_recall_matches_pure_python(spark):
    """Third-engine recomputation of prefix-vs-full top-k recall from
    the raw parquet: exact cosine in Python floats (sequential sum —
    the engines' contract), half-up 2-decimal recall division."""
    import math

    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.similarity import (
        MRL_DIM,
        N_QUERIES,
        TOPK,
        matryoshka_recall,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for _, r in emb.iterrows()
    }

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    def topk(q: int, dims: int) -> set[int]:
        scored = sorted(
            (
                (-cos(vecs[q][:dims], vecs[v][:dims]), v)
                for v in vecs
                if v != q
            ),
        )[:TOPK]
        return {v for _, v in scored}

    expected = {}
    for q in range(N_QUERIES):
        exact = topk(q, len(vecs[q]))
        prefix = topk(q, MRL_DIM)
        n_hits = len(exact & prefix)
        expected[q] = (
            len(exact),
            n_hits,
            ((2 * n_hits * 100 + len(exact)) // (2 * len(exact))) / 100.0,
        )

    rows = matryoshka_recall(spark, SF).collect()
    assert {r.query_id for r in rows} == set(expected)
    for r in rows:
        n_exact, n_hits, recall = expected[r.query_id]
        assert (r.n_exact, r.n_hits, float(r.recall)) == (
            n_exact,
            n_hits,
            recall,
        ), (r.query_id, r.n_hits, n_hits)


def test_ndcg_eval_matches_pure_python_recompute(spark):
    # NDCG recomputed row-by-row in Python from the same two ranked
    # frames: pins the join/aggregate arithmetic (gains, literal
    # discount table, half-up micro division) independently of DuckDB.
    from big_data_2021_spark_streaming_spark.operators.similarity import (
        _NDCG_DISC_MICRO,
        _NDCG_IDCG_MICRO,
        ndcg_eval,
    )

    exact_rank = {
        (r.query_id, r.neighbor_id): r.rank
        for r in topk_bruteforce(spark, SF).collect()
    }
    dcg = defaultdict(int)
    hits = defaultdict(int)
    approx_rows = ivf_pq_topk(spark, SF).collect()
    for r in approx_rows:
        er = exact_rank.get((r.query_id, r.neighbor_id))
        gain = (TOPK + 1 - er) if er is not None else 0
        if er is not None:
            hits[r.query_id] += 1
        dcg[r.query_id] += gain * _NDCG_DISC_MICRO[r.rank - 1]

    rows = ndcg_eval(spark, SF).collect()
    assert {r.query_id for r in rows} == {r.query_id for r in approx_rows}
    for r in rows:
        want_dcg = dcg[r.query_id]
        want_ndcg = (
            (2 * want_dcg * 1_000_000 + _NDCG_IDCG_MICRO)
            // (2 * _NDCG_IDCG_MICRO)
        ) / 1e6
        assert r.n_rel_hits == hits[r.query_id], r.query_id
        assert r.dcg_micro == want_dcg, r.query_id
        assert float(r.ndcg) == want_ndcg, r.query_id
        assert 0.0 <= r.ndcg <= 1.0
        assert r.dcg_micro <= _NDCG_IDCG_MICRO


def test_label_consensus_matches_pure_python(spark):
    # bucket/label accounting recomputed from the raw vectors with the
    # pure-Python signature twin
    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.similarity import (
        N_PLANES,
        hyperplane,
        label_consensus,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    planes = [hyperplane(j) for j in range(N_PLANES)]

    def sig(v) -> int:
        return sum(
            (1 << j)
            for j in range(N_PLANES)
            if sum(x * w for x, w in zip(v, planes[j])) >= 0
        )

    per = defaultdict(int)  # (sig, label) -> c
    for r in emb.itertuples():
        per[(sig(list(r.embedding)), r.label)] += 1
    tot = defaultdict(int)
    for (s, _), c in per.items():
        tot[s] += c

    want = defaultdict(lambda: [0, 0, 0, 0, 0])
    for (s, lab), c in per.items():
        t = tot[s]
        w = want[lab]
        w[0] += c
        if t >= 2:
            w[1] += c
            if 2 * (c - 1) < t - 1:
                w[2] += c
            w[3] += c * (c - 1)
            w[4] += c * (t - 1)

    rows = label_consensus(spark, SF).collect()
    assert {r.label for r in rows} == set(want)
    for r in rows:
        n_vec, n_aud, n_sus, num, den = want[r.label]
        assert (r.n_vectors, r.n_audited, r.n_suspect) == (
            n_vec,
            n_aud,
            n_sus,
        ), r.label
        if den == 0:
            assert r.agreement is None
        else:
            assert float(r.agreement) == (
                (2 * num * 1_000_000 + den) // (2 * den)
            ) / 1e6, r.label


def test_mrr_eval_consistent_with_topk_frames(spark):
    """MRR invariants recomputed from the operator's own top-k frames:
    first_rank must equal the smallest approx rank holding an
    exact-top-k member, the reciprocal must be the exact half-up
    micro-unit 1/rank (0 on a total miss), and every query appears
    exactly once."""
    from big_data_2021_spark_streaming_spark.operators.similarity import (
        ivf_pq_topk,
        mrr_eval,
        topk_bruteforce,
    )

    exact = defaultdict(set)
    for r in topk_bruteforce(spark, SF).collect():
        exact[r.query_id].add(r.neighbor_id)
    first = {}
    for r in ivf_pq_topk(spark, SF).collect():
        if r.neighbor_id in exact[r.query_id]:
            first[r.query_id] = min(
                first.get(r.query_id, r.rank), r.rank
            )

    rows = mrr_eval(spark, SF).collect()
    assert sorted(r.query_id for r in rows) == sorted(exact)
    for r in rows:
        assert r.first_rank == first.get(r.query_id)
        if r.first_rank is None:
            assert r.reciprocal_rank == 0.0
        else:
            fr = r.first_rank
            assert r.reciprocal_rank == (
                (2 * 1_000_000 + fr) // (2 * fr) / 1e6
            )


def test_ivfpq_residual_topk_matches_pure_python(spark):
    """Full third-engine recomputation of residual IVF-PQ from the raw
    parquet: assignment/probes by sequential-fold cosine, residuals and
    ADC in exact integer milli² — pins the Faiss-style per-list
    residual semantics independently of both SQL engines."""
    import math

    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.similarity import (
        N_QUERIES,
        NLIST,
        NPROBE,
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        ivfpq_residual_topk,
        pq_centroid,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for _, r in emb.iterrows()
    }

    def milli(x: float) -> int:
        q = int(math.floor(abs(x) * 1000 + 0.5))
        return q if x >= 0 else -q

    def cos(a, b):  # sequential fold, same order as _cos / list_cosine
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    cells = {
        cid: vecs[cid]
        for cid in range(N_QUERIES, N_QUERIES + NLIST)
        if cid in vecs
    }
    assert cells, "sf too small for the seed centroid window"

    def nearest(v, n):
        scored = sorted(
            ((-cos(v, c), cid) for cid, c in cells.items())
        )
        return [cid for _, cid in scored[:n]]

    assigned = {vid: nearest(v, 1)[0] for vid, v in vecs.items()}
    probes = {
        q: nearest(vecs[q], NPROBE) for q in vecs if q < N_QUERIES
    }
    book = {
        (m, k): [milli(c) for c in pq_centroid(m, k)]
        for m in range(PQ_M)
        for k in range(PQ_K)
    }

    def residual(vid: int, cid: int) -> list[int]:
        cv = cells[cid]
        return [
            milli(x) - milli(c) for x, c in zip(vecs[vid], cv)
        ]

    def codes(res: list[int]) -> list[int]:
        out = []
        for m in range(PQ_M):
            sub = res[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
            best = min(
                (
                    sum((r - c) ** 2 for r, c in zip(sub, book[(m, k)])),
                    k,
                )
                for k in range(PQ_K)
            )[1]
            out.append(best)
        return out

    corpus_codes = {
        vid: codes(residual(vid, assigned[vid])) for vid in vecs
    }
    expected = {}
    for q, probed in probes.items():
        cand = []
        for cid in probed:
            qres = residual(q, cid)
            qtab = {
                (m, k): sum(
                    (r - c) ** 2
                    for r, c in zip(
                        qres[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM],
                        book[(m, k)],
                    )
                )
                for m in range(PQ_M)
                for k in range(PQ_K)
            }
            for vid, acell in assigned.items():
                if acell != cid or vid == q:
                    continue
                adc = sum(
                    qtab[(m, corpus_codes[vid][m])] for m in range(PQ_M)
                )
                cand.append((adc, vid))
        cand.sort()
        expected[q] = [
            (rank + 1, vid, round(adc / 1e6, 6))
            for rank, (adc, vid) in enumerate(cand[:TOPK])
        ]

    rows = ivfpq_residual_topk(spark, SF).collect()
    got = defaultdict(list)
    for r in rows:
        got[r.query_id].append((r.rank, r.neighbor_id, r.approx_dist))
    for q in got:
        got[q].sort()
    expected = {q: v for q, v in expected.items() if v}
    assert dict(got) == expected


def test_jl_distortion_matches_pure_python(spark):
    """Third-engine recompute of the JL ±1-projection norm audit in
    exact integer milli-units, including the half-up micro divisions —
    and the semantic JL sanity bound: every per-label mean ratio sits
    in a loose (0.2, 5) band around the unbiased expectation 1."""
    import math

    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.similarity import (
        JL_K,
        jl_distortion,
        jl_sign,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.iloc[0]["embedding"])
    signs = [[jl_sign(j, d) for d in range(dim)] for j in range(JL_K)]

    def milli(x: float) -> int:
        q = int(math.floor(abs(x) * 1000 + 0.5))
        return q if x >= 0 else -q

    per_label: dict[int, list[int]] = {}
    for _, row in emb.iterrows():
        vq = [milli(float(x)) for x in row["embedding"]]
        sx2 = sum(x * x for x in vq)
        if sx2 == 0:
            continue
        sy2 = 0
        for j in range(JL_K):
            y = sum(s * x for s, x in zip(signs[j], vq))
            sy2 += y * y
        r_micro = (2 * 1_000_000 * sy2 + JL_K * sx2) // (2 * JL_K * sx2)
        per_label.setdefault(int(row["label"]), []).append(r_micro)

    expected = {
        label: (
            len(rs),
            ((2 * sum(rs) + len(rs)) // (2 * len(rs))) / 1e6,
            min(rs) / 1e6,
            max(rs) / 1e6,
        )
        for label, rs in per_label.items()
    }
    rows = jl_distortion(spark, SF).collect()
    got = {
        r.label: (r.n_vecs, r.avg_ratio, r.min_ratio, r.max_ratio)
        for r in rows
    }
    assert got == expected
    for label, (_, avg, _, _) in got.items():
        assert 0.2 < avg < 5, (label, avg)
