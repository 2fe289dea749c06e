"""Third-engine invariants for the substring-dedup and encoding-audit
operators: pure-Python recomputation from the raw parquet, independent
of both SQL engines (the DuckDB oracle parity runs separately in
test_oracle_parity)."""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd

from big_data_2021_spark_streaming_spark.operators.text import (
    SUBDUP_L,
    SUBDUP_STRIDE,
    encoding_audit,
    substring_dedup,
)

SF = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_substring_dedup_matches_pure_python(spark):
    docs = _docs()
    # sampled windows, then grams shared across >=2 distinct docs
    positions: list[tuple[int, int, str]] = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if len(text) < SUBDUP_L:
            continue
        for pos in range(1, len(text) - SUBDUP_L + 2, SUBDUP_STRIDE):
            positions.append((int(doc_id), pos, text[pos - 1 : pos - 1 + SUBDUP_L]))
    docs_per_gram: dict[str, set[int]] = defaultdict(set)
    for doc_id, _, gram in positions:
        docs_per_gram[gram].add(doc_id)
    shared = {g for g, ds in docs_per_gram.items() if len(ds) >= 2}

    hits_by_doc: dict[int, list[int]] = defaultdict(list)
    for doc_id, pos, gram in positions:
        if gram in shared:
            hits_by_doc[doc_id].append(pos)

    expected: dict[int, tuple[int, int, int]] = {}
    for doc_id, hit_list in hits_by_doc.items():
        hit_list.sort()
        islands = 0
        covered = 0
        start = end = None
        for pos in hit_list:
            if end is None or pos > end:
                if end is not None:
                    covered += end - start
                islands += 1
                start = pos
            end = max(end or 0, pos + SUBDUP_L)
        covered += end - start
        expected[doc_id] = (len(hit_list), islands, covered)

    rows = substring_dedup(spark, SF).collect()
    assert len(rows) == len(docs)
    n_with_dups = 0
    for r in rows:
        n_hits, n_islands, dup_chars = expected.get(r.doc_id, (0, 0, 0))
        assert (r.n_hits, r.n_islands, r.dup_chars) == (n_hits, n_islands, dup_chars)
        assert r.dup_permille == (2 * 1000 * dup_chars + r.n_chars) // (2 * r.n_chars)
        assert 0 <= r.dup_permille <= 1000
        n_with_dups += dup_chars > 0
    # the synthetic word-soup corpus genuinely repeats across docs:
    # the operator must find signal, not vacuously pass on zeros
    assert n_with_dups > 0


def test_encoding_audit_matches_pure_python(spark):
    docs = _docs()
    agg: dict[str, Counter] = defaultdict(Counter)
    for doc_id, text, source in zip(docs["doc_id"], docs["text"], docs["source"]):
        t = text
        if doc_id % 7 == 0:
            t += " cafÃ©"
        if doc_id % 9 == 0:
            t += " �"
        if doc_id % 11 == 0:
            t += " x\x07y"
        c = agg[source]
        c["n_docs"] += 1
        c["mojibake_docs"] += "Ã©" in t
        c["replacement_docs"] += "�" in t
        c["ctrl_chars"] += sum(
            1 for ch in t if ord(ch) < 0x20 and ch not in "\t\n\r"
        )
        c["nonascii_chars"] += sum(1 for ch in t if ord(ch) > 0x7F)
        c["total_chars"] += len(t)

    rows = encoding_audit(spark, SF).collect()
    assert len(rows) == len(agg)
    assert any(r.mojibake_docs > 0 for r in rows)
    assert any(r.replacement_docs > 0 for r in rows)
    assert any(r.ctrl_chars > 0 for r in rows)
    for r in rows:
        c = agg[r.source]
        assert (
            r.n_docs,
            r.mojibake_docs,
            r.replacement_docs,
            r.ctrl_chars,
            r.nonascii_chars,
            r.total_chars,
        ) == (
            c["n_docs"],
            c["mojibake_docs"],
            c["replacement_docs"],
            c["ctrl_chars"],
            c["nonascii_chars"],
            c["total_chars"],
        )
        num = 2 * 1_000_000 * c["nonascii_chars"] + c["total_chars"]
        assert r.nonascii_ppm == num // (2 * c["total_chars"])


def test_rfm_scores_match_pure_python(spark):
    """The banded two-phase global rank must equal a plain sorted rank:
    recompute RFM from raw orders in pandas and compare exactly."""
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    corpus_max = orders["o_orderdate"].max().date()
    g = orders.groupby("o_custkey")
    base = {}
    for ck, sub in g:
        last = sub["o_orderdate"].max().date()
        micro = int(sum(round(p * 1_000_000) for p in sub["o_totalprice"]))
        base[int(ck)] = (
            (corpus_max - last).days,
            len(sub),
            (2 * micro + 10_000) // 20_000,
        )
    n = len(base)

    def ranks(metric_idx):
        order = sorted(base, key=lambda ck: (base[ck][metric_idx], ck))
        return {ck: i + 1 for i, ck in enumerate(order)}

    r_rank, f_rank, m_rank = ranks(0), ranks(1), ranks(2)
    from big_data_2021_spark_streaming_spark.plans.analytics import (
        customer_rfm_scores,
    )

    rows = customer_rfm_scores(spark, SF).collect()
    assert len(rows) == n
    assert {r.rfm_cell for r in rows} > {"555"} or n < 25  # real spread
    for r in rows:
        rec, freq, mon = base[r.o_custkey]
        assert (r.recency_days, r.frequency, r.monetary_cents) == (rec, freq, mon)
        assert r.r_score == 5 - ((r_rank[r.o_custkey] - 1) * 5) // n
        assert r.f_score == 1 + ((f_rank[r.o_custkey] - 1) * 5) // n
        assert r.m_score == 1 + ((m_rank[r.o_custkey] - 1) * 5) // n
        assert r.rfm_cell == f"{r.r_score}{r.f_score}{r.m_score}"


def test_bpe_train_matches_pure_python(spark):
    """Textbook BPE (chars -> 4 greedy merges, left-to-right
    non-overlapping) recomputed in pure Python must give the same
    merge table."""
    from big_data_2021_spark_streaming_spark.operators.text import (
        BPE_ROUNDS,
        bpe_train,
    )

    docs = _docs()
    toks = []
    for text in docs["text"]:
        toks.extend(tuple(t) for t in text.strip().split() if t)

    expected = []
    for _ in range(BPE_ROUNDS):
        counts: Counter = Counter()
        for t in toks:
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] += 1
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((a, b, a + b, n))
        merged_toks = []
        for t in toks:
            out = []
            i = 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            merged_toks.append(tuple(out))
        toks = merged_toks

    rows = sorted(bpe_train(spark, SF).collect(), key=lambda r: r.round)
    assert [(r.a, r.b, r.merged, r.n_occ) for r in rows] == expected
    assert [r.round for r in rows] == list(range(1, BPE_ROUNDS + 1))


def test_bpe_encode_matches_pure_python(spark):
    """Tokenizer apply: encoding the corpus under the trained merges
    (including the final round's) must reproduce the pure-Python
    vocabulary — pieces, counts, ranks, and exact micro-unit shares."""
    from big_data_2021_spark_streaming_spark.operators.text import (
        BPE_ROUNDS,
        bpe_encode,
    )

    docs = _docs()
    toks = []
    for text in docs["text"]:
        toks.extend(tuple(t) for t in text.strip().split() if t)

    for _ in range(BPE_ROUNDS):
        counts: Counter = Counter()
        for t in toks:
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] += 1
        (a, b), _n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged_toks = []
        for t in toks:
            out = []
            i = 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            merged_toks.append(tuple(out))
        toks = merged_toks

    vocab: Counter = Counter()
    for t in toks:
        vocab.update(t)
    tot = sum(vocab.values())
    ranked = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = {
        piece: (
            len(piece),
            n,
            rank,
            (2 * n * 1_000_000 + tot) // (2 * tot),
        )
        for rank, (piece, n) in enumerate(ranked, start=1)
    }

    rows = bpe_encode(spark, SF).collect()
    got = {
        r.piece: (r.piece_len, r.n_occ, r.piece_rank, r.share_micro)
        for r in rows
    }
    assert got == expected
    assert sum(r.n_occ for r in rows) == tot


def test_multimodal_dedup_matches_pure_python(spark):
    """Byte-exact asset dedup and frame-signature near-dup recomputed
    from the raw parquet with the same keyed payload injection."""
    import hashlib

    from big_data_2021_spark_streaming_spark.operators.multimodal import (
        N_FRAMES,
        multimodal_exact_dedup,
        multimodal_frame_neardup,
    )

    docs = _docs()
    payloads = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        d = int(doc_id)
        if d % 41 == 0:
            t = f"CANONICAL-ASSET-{d % 3}"
        elif d % 43 == 0:
            t = "frame-chunk-" * 25 + ("X" if d % 2 == 0 else "Y") * 100
        else:
            t = text
        payloads[d] = t.encode()

    groups = defaultdict(list)
    for d, b in payloads.items():
        groups[(hashlib.md5(b).hexdigest(), len(b))].append(d)
    expected_dups = {
        k: (len(v), min(v), (len(v) - 1) * k[1])
        for k, v in groups.items()
        if len(v) >= 2
    }
    rows = multimodal_exact_dedup(spark, SF).collect()
    got = {
        (r.content_md5, r.n_bytes): (r.n_copies, r.keep_doc_id, r.reclaimable_bytes)
        for r in rows
    }
    assert got == expected_dups
    assert len(got) > 0  # injection must produce real duplicate groups

    sig_docs = defaultdict(set)
    for d, b in payloads.items():
        L = len(b)
        for i in range(N_FRAMES):
            s, e = i * L // N_FRAMES, (i + 1) * L // N_FRAMES
            if e > s:
                sig_docs[hashlib.md5(b[s:e]).hexdigest()].add(d)
    pair_shared = Counter()
    for ds in sig_docs.values():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b2 in ds[i + 1 :]:
                pair_shared[(a, b2)] += 1
    rows = multimodal_frame_neardup(spark, SF).collect()
    assert len(rows) == len(pair_shared)
    partial = 0
    for r in rows:
        n = pair_shared[(r.doc_a, r.doc_b)]
        assert r.shared_frames == n
        assert r.overlap_permille == (2 * 1000 * n + N_FRAMES) // (2 * N_FRAMES)
        partial += 0 < n < N_FRAMES
    assert partial > 0  # the X/Y variants share exactly 3 of 4 frames


def test_feature_hashing_audit_matches_pure_python(spark):
    import hashlib
    import re

    from big_data_2021_spark_streaming_spark.operators.text import (
        FH_BUCKETS,
        FH_SIGN_SEED,
        feature_hashing_audit,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    vocab = Counter()
    for text in _docs()["text"]:
        for term in re.split(r"\s+", text.strip()):
            if term:
                vocab[term] += 1

    buckets = defaultdict(lambda: [0, 0, 0])  # n_terms, occ, net_occ
    for term, n in vocab.items():
        b = buckets[h60(term) % FH_BUCKETS]
        sign = 1 if h60(f"{FH_SIGN_SEED}:{term}") % 2 == 0 else -1
        b[0] += 1
        b[1] += n
        b[2] += sign * n

    total_occ = sum(occ for _, occ, _ in buckets.values())
    collided_occ = sum(occ for t, occ, _ in buckets.values() if t >= 2)
    net_l1 = sum(abs(net) for _, _, net in buckets.values())

    row = feature_hashing_audit(spark, SF).collect()[0]
    assert row.n_terms == len(vocab)
    assert row.n_buckets == FH_BUCKETS
    assert row.n_used_buckets == len(buckets)
    assert row.n_collided_buckets == sum(
        1 for t, _, _ in buckets.values() if t >= 2
    )
    assert row.max_bucket_terms == max(t for t, _, _ in buckets.values())
    assert row.max_bucket_occ == max(occ for _, occ, _ in buckets.values())
    assert float(row.collided_occ_share) == (
        (2 * collided_occ * 1_000_000 + total_occ) // (2 * total_occ)
    ) / 1e6
    assert float(row.signed_l1_share) == (
        (2 * net_l1 * 1_000_000 + total_occ) // (2 * total_occ)
    ) / 1e6
    # the sign hash must actually cancel something at this width
    assert row.signed_l1_share <= 1.0


def test_value_frontier_matches_pure_python(spark):
    from big_data_2021_spark_streaming_spark.plans.analytics import (
        customer_value_frontier,
    )

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    spend = (
        (orders["o_totalprice"] * 100)
        .round()
        .astype("int64")
        .groupby(orders["o_custkey"])
        .sum()
    )
    pts = {
        int(r.c_custkey): (
            int(spend.get(r.c_custkey, 0)),
            int(round(r.c_acctbal * 100)),
        )
        for r in cust.itertuples()
    }
    front = {
        k
        for k, (sp, ab) in pts.items()
        if not any(
            s2 >= sp and a2 >= ab and (s2 > sp or a2 > ab)
            for k2, (s2, a2) in pts.items()
            if k2 != k
        )
    }

    rows = customer_value_frontier(spark, SF).collect()
    assert {r.c_custkey for r in rows} == front
    for r in rows:
        sp, ab = pts[r.c_custkey]
        assert float(r.total_spend) == sp / 100.0
        assert float(r.acctbal) == ab / 100.0


def test_prefix_filter_join_matches_pure_python(spark):
    """Brute-force every doc pair in Python (no prefix logic, no
    length filter) and assert the prefix-filtered Spark plan returns
    exactly the pairs with shingle-Jaccard >= tau — i.e. the pruning
    is lossless."""
    from big_data_2021_spark_streaming_spark.operators.dedup import (
        PF_TAU_MICRO,
        prefix_filter_join,
    )

    docs = _docs()
    sets: dict[int, set[str]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.strip().split()
        sets[int(doc_id)] = {
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        }
    ids = sorted(sets)
    expected = {}
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            inter = len(sets[da] & sets[db])
            union = len(sets[da] | sets[db])
            if union and inter * 1_000_000 >= PF_TAU_MICRO * union:
                jac = (2 * inter * 1_000_000 + union) // (2 * union) / 1e6
                expected[(da, db)] = (
                    len(sets[da]), len(sets[db]), inter, jac
                )

    rows = prefix_filter_join(spark, SF).collect()
    got = {
        (r.doc_id_a, r.doc_id_b): (r.n_a, r.n_b, r.n_inter, r.jaccard)
        for r in rows
    }
    assert got == expected
    # the corpus genuinely contains near-dups at this threshold: the
    # operator must find signal, not vacuously pass on the empty set
    assert len(expected) > 0


def test_bpe_fertility_matches_pure_python(spark):
    """Per-language fertility (pieces per word under the trained
    tokenizer) recomputed in pure Python with the same greedy merge
    loop as the trainer tests."""
    from big_data_2021_spark_streaming_spark.operators.text import (
        BPE_ROUNDS,
        bpe_fertility,
    )

    docs = _docs()
    occurrences = []  # (lang, token tuple)
    for lang, text in zip(docs["lang"], docs["text"]):
        for t in text.strip().split():
            if t:
                occurrences.append((lang, tuple(t)))

    toks = [t for _, t in occurrences]
    for _ in range(BPE_ROUNDS):
        counts: Counter = Counter()
        for t in toks:
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] += 1
        (a, b), _n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged_toks = []
        for t in toks:
            out = []
            i = 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            merged_toks.append(tuple(out))
        toks = merged_toks

    words: Counter = Counter()
    pieces: Counter = Counter()
    for (lang, _), seg in zip(occurrences, toks):
        words[lang] += 1
        pieces[lang] += len(seg)
    expected = {
        lang: (
            words[lang],
            pieces[lang],
            (2 * pieces[lang] * 1_000_000 + words[lang])
            // (2 * words[lang])
            / 1e6,
        )
        for lang in words
    }

    rows = bpe_fertility(spark, SF).collect()
    got = {r.lang: (r.n_words, r.n_pieces, r.fertility) for r in rows}
    assert got == expected
    # fertility is pieces-per-word: never below 1 for nonempty words
    assert all(r.fertility >= 1.0 for r in rows)


def test_lang_kappa_matches_pure_python(spark):
    """Cohen's kappa recomputed from scratch: pure-Python argmax
    language ID (same markers, same tie order) + textbook kappa with
    exact signed micro-unit rounding."""
    from big_data_2021_spark_streaming_spark.operators.text import (
        LANG_MARKERS,
        lang_id_kappa,
    )

    docs = _docs()
    order = ["en", "es", "fr", "de"]
    n_docs = 0
    n_agree = 0
    row_t: Counter = Counter()
    col_t: Counter = Counter()
    for lang, text in zip(docs["lang"], docs["text"]):
        toks = text.strip().split()
        counts = {
            m: sum(t in LANG_MARKERS[m] for t in toks) for m in order
        }
        best = max(counts.values())
        if best == 0:
            pred = "und"
        else:
            pred = next(m for m in order if counts[m] == best)
        n_docs += 1
        n_agree += pred == lang
        row_t[lang] += 1
        col_t[pred] += 1
    e_sum = sum(row_t[c] * col_t.get(c, 0) for c in row_t)

    def half_up(a: int, b: int) -> float:
        if a >= 0:
            return (2 * a * 1_000_000 + b) // (2 * b) / 1e6
        return -((2 * -a * 1_000_000 + b) // (2 * b)) / 1e6

    row = lang_id_kappa(spark, SF).collect()[0]
    assert (row.n_docs, row.n_agree, row.e_sum) == (n_docs, n_agree, e_sum)
    assert row.po == half_up(n_agree, n_docs)
    assert row.pe == half_up(e_sum, n_docs * n_docs)
    assert row.kappa == half_up(
        n_agree * n_docs - e_sum, n_docs * n_docs - e_sum
    )


def test_source_chi2_drift_matches_pure_python(spark):
    """Recompute the top-terms chi-square in exact big-int arithmetic
    (Python ints are unbounded, so this independently pins the
    DECIMAL(38)/HUGEINT leaf rounding) plus the chi² sanity law:
    every statistic is non-negative."""
    import re
    from collections import Counter

    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.text import (
        CHI2_TERMS,
        source_chi2_drift,
    )

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    occ = Counter()
    for _, row in docs.iterrows():
        for t in re.split(r"\s+", str(row["text"]).strip()):
            occ[(row["source"], t)] += 1
    corpus = Counter()
    for (_, t), c in occ.items():
        corpus[t] += c
    top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:CHI2_TERMS]
    top_terms = {t: c for t, c in top}
    r = Counter()
    for (s, t), c in occ.items():
        if t in top_terms:
            r[s] += c
    n = sum(r.values())
    expected = {}
    for s in r:
        chi2_micro = 0
        for t, c in top_terms.items():
            o = occ.get((s, t), 0)
            d = o * n - r[s] * c
            den = n * r[s] * c
            chi2_micro += (2 * d * d * 10**6 + den) // (2 * den)
        expected[s] = (r[s], CHI2_TERMS - 1, chi2_micro / 1e6)
    rows = source_chi2_drift(spark, sf).collect()
    got = {rr.source: (rr.n_top_tokens, rr.dof, rr.chi2) for rr in rows}
    assert got == expected
    assert all(v[2] >= 0 for v in got.values())


def test_char_class_whitespace_is_engine_identical_on_vt(spark):
    # ADVICE r07: Java \s includes U+000B vertical tab, RE2 \s does
    # not — char_class_profile now uses the explicit literal class
    # [ \t\n\x0B\f\r] in BOTH engines. Pin the definition on a string
    # containing every member (including VT) so a regression to \s in
    # either engine fails here instead of on a future VT-bearing corpus.
    import duckdb
    from pyspark.sql import functions as F

    s = "a\x0bb c\td\ne\ff\rg"  # 6 whitespace chars under Java \s
    spark_n = (
        spark.createDataFrame([(s,)], "text string")
        .select(
            (
                F.length("text")
                - F.length(
                    F.regexp_replace("text", r"[ \t\n\x0B\f\r]", "")
                )
            ).alias("n")
        )
        .collect()[0]["n"]
    )
    duck_n = duckdb.connect().execute(
        "SELECT length(?) - length(regexp_replace(?,"
        " '[ \\t\\n\\x0B\\f\\r]', '', 'g'))",
        [s, s],
    ).fetchone()[0]
    assert spark_n == duck_n == 6


def test_minhash_cardinality_matches_pure_python(spark):
    # KMV estimator (round-8): recompute per-source distinct-3-gram
    # hash sets in pure python, the K-th smallest, and the exact
    # integer estimate (K-1)*2^60 // h_K — including the small-set
    # convention (fewer than K distinct shingles => est == exact),
    # which is the path sf0.001 exercises for some sources.
    import hashlib
    import re

    from big_data_2021_spark_streaming_spark.operators.dedup import (
        KMV_K,
        NGRAM_N,
        minhash_cardinality,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    per_source: dict[str, set[int]] = defaultdict(set)
    docs = _docs()
    for source, text in zip(docs["source"], docs["text"]):
        norm = re.sub(r"\s+", " ", text.strip()).lower()
        for i in range(max(len(norm) - NGRAM_N + 1, 0)):
            per_source[source].add(h60(norm[i : i + NGRAM_N]))

    rows = minhash_cardinality(spark, SF).collect()
    assert {r.source for r in rows} == set(per_source)
    exercised_estimator = 0
    for r in rows:
        hs = sorted(per_source[r.source])
        assert r.n_exact == len(hs)
        if len(hs) >= KMV_K:
            want = (KMV_K - 1) * (1 << 60) // hs[KMV_K - 1]
            exercised_estimator += 1
        else:
            want = len(hs)  # small-set convention
        assert r.est_kmv == want
        n = r.n_exact
        assert r.rel_err_micro == (
            2 * abs(r.est_kmv - n) * 1_000_000 + n
        ) // (2 * n)
    # the estimator path (not just the small-set fallback) must be
    # exercised somewhere, or the query is vacuous
    assert exercised_estimator > 0
