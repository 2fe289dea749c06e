"""Structural invariants of the release-engineering curation tail:
cluster-aware train/val/test splits, per-source caps, dedup-aware
contrastive negative mining, and PII redaction — checked independently
of the DuckDB oracle so a violation fails with a diagnosable message
instead of a hash mismatch."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from big_data_2021_spark_streaming_spark.operators.curation import (
    ANCHOR_MOD,
    NEG_PER_ANCHOR,
    SOURCE_CAP,
    contrastive_negatives,
    source_cap_report,
    split_leakage_report,
    train_split_assign,
)
from big_data_2021_spark_streaming_spark.operators.dedup import (
    near_dup_clusters,
)
from big_data_2021_spark_streaming_spark.operators.text import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    PII_SSN_RE,
    pii_redact,
)
from big_data_2021_spark_streaming_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"


def test_split_assignment_is_total_and_cluster_consistent(spark):
    rows = train_split_assign(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert len(rows) == n_docs  # every document assigned exactly once
    assert {r.split for r in rows} <= {"train", "val", "test"}
    by_cluster: dict[int, set[str]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    # the leakage guarantee: a cluster never spans splits
    assert all(len(s) == 1 for s in by_cluster.values())


def test_split_leakage_report_totals(spark):
    rows = split_leakage_report(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert all(r.leaked_clusters == 0 for r in rows)
    # cluster counts per split partition the cluster set
    n_clusters = (
        near_dup_clusters(spark, SF).select("cluster_id").distinct().count()
    )
    assert sum(r.n_clusters for r in rows) == n_clusters


def test_source_cap_enforced(spark):
    docs = load_table(spark, SF, "documents")
    totals = {
        r.source: (r.n, r.chars)
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
        )
        .collect()
    }
    for r in source_cap_report(spark, SF).collect():
        n, chars = totals[r.source]
        assert r.n_kept <= SOURCE_CAP
        assert r.n_kept == min(n, SOURCE_CAP)
        assert r.n_kept + r.n_dropped == r.n_docs == n
        assert 0 < r.kept_chars <= chars


def test_contrastive_negatives_are_cross_cluster(spark):
    clusters = {
        r.doc_id: r.cluster_id
        for r in near_dup_clusters(spark, SF).collect()
    }
    per_anchor: dict[int, int] = {}
    for r in contrastive_negatives(spark, SF).collect():
        assert r.anchor_id % ANCHOR_MOD == 0
        assert 0 <= r.k < NEG_PER_ANCHOR
        assert r.neg_id != r.anchor_id
        # a near-dup of the anchor must never be used as a negative
        assert clusters[r.neg_id] != clusters[r.anchor_id]
        per_anchor[r.anchor_id] = per_anchor.get(r.anchor_id, 0) + 1
    assert per_anchor, "fixture corpus should yield anchors"
    assert all(n <= NEG_PER_ANCHOR for n in per_anchor.values())


def test_pii_redact_removes_every_match(spark):
    rows = pii_redact(spark, SF).collect()
    pats = [
        re.compile(p)
        for p in (PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE, PII_SSN_RE)
    ]
    masked = 0
    for r in rows:
        for p in pats:
            assert not p.search(r.redacted), (r.doc_id, p.pattern)
        assert r.chars_removed >= 0 or "[" in r.redacted
        if "[EMAIL]" in r.redacted:
            masked += 1
            assert r.doc_id % 7 == 0  # only the injected subset has email
    assert masked > 0


def test_cross_source_overlap_matches_pure_python(spark):
    """Full third-engine recomputation: pairwise source Jaccard over
    distinct whitespace 3-gram sets rebuilt in pure Python from the raw
    parquet — if Spark and DuckDB ever shared a tokenization or join
    bug, this still fails."""
    import itertools

    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.curation import (
        cross_source_overlap,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    by_source: dict[str, set[str]] = {}
    for _, row in docs.iterrows():
        toks = [t for t in row["text"].strip().split() if t]
        grams = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        by_source.setdefault(row["source"], set()).update(grams)

    expected = {}
    for sa, sb in itertools.combinations(sorted(by_source), 2):
        a, b = by_source[sa], by_source[sb]
        inter = len(a & b)
        union = len(a) + len(b) - inter
        jac = 0 if union == 0 else (2 * 1000 * inter + union) // (2 * union)
        expected[(sa, sb)] = (len(a), len(b), inter, jac)

    rows = cross_source_overlap(spark, SF).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert r.source_a < r.source_b
        exp = expected[(r.source_a, r.source_b)]
        got = (r.grams_a, r.grams_b, r.inter_grams, r.jaccard_permille)
        assert got == exp, (r.source_a, r.source_b, got, exp)
        assert r.inter_grams <= min(r.grams_a, r.grams_b)
        assert 0 <= r.jaccard_permille <= 1000


def test_source_minhash_signature_is_mergeable(spark):
    """The property the dataset-level sketch rests on: MIN-merging a
    source's per-doc signatures must equal the signature computed
    directly from the union of the source's token sets — and the pair
    frame's matching_members must agree with recomputing the match
    count from those per-source signatures."""
    import pyspark.sql.functions as F2

    from big_data_2021_spark_streaming_spark.operators.curation import (
        source_minhash_similarity,
    )
    from big_data_2021_spark_streaming_spark.operators.dedup import (
        NUM_PERM,
        _minhash_signatures,
    )
    from big_data_2021_spark_streaming_spark.functions.hashing import (
        h60_packed_md5,
        h60_packed_member,
    )

    mh = _minhash_signatures(spark, SF)
    merged = {
        r.source: [r[f"mh{j}"] for j in range(NUM_PERM)]
        for r in mh.groupBy("source")
        .agg(*[F2.min(f"mh{j}").alias(f"mh{j}") for j in range(NUM_PERM)])
        .collect()
    }
    # direct signature of the union token set per source
    docs = load_table(spark, SF, "documents")
    direct_rows = (
        docs.select(
            "source",
            F2.explode(
                F2.array_distinct(F2.split(F2.trim("text"), r"\s+"))
            ).alias("sh"),
        )
        .select(
            "source",
            *[
                h60_packed_md5(s, F2.col("sh")).alias(f"d{s}")
                for s in range(NUM_PERM // 2)
            ],
        )
        .groupBy("source")
        .agg(
            *[
                F2.min(
                    h60_packed_member(F2.col(f"d{j // 2}"), j % 2)
                ).alias(f"mh{j}")
                for j in range(NUM_PERM)
            ]
        )
        .collect()
    )
    direct = {
        r.source: [r[f"mh{j}"] for j in range(NUM_PERM)] for r in direct_rows
    }
    assert merged == direct  # element-wise MIN merge == union signature

    out = source_minhash_similarity(spark, SF).collect()
    assert out, "no source pairs"
    for r in out:
        expect = sum(
            int(x == y)
            for x, y in zip(merged[r.source_a], merged[r.source_b])
        )
        assert r.matching_members == expect
        assert 0 <= r.exact_jaccard_micro <= 1_000_000
        assert r.inter_toks <= min(r.toks_a, r.toks_b)


def test_quality_auc_matches_pure_python_pair_counting(spark):
    """Recompute the AUC by LITERALLY enumerating every (dup, non-dup)
    doc pair in Python — the O(P*N) definition the group-frame algebra
    is supposed to equal — using the operator's own quality scores and
    dup labels as inputs, so the test isolates the Mann-Whitney
    identity itself."""
    from big_data_2021_spark_streaming_spark.operators.curation import (
        quality_auc_eval,
    )
    from big_data_2021_spark_streaming_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from big_data_2021_spark_streaming_spark.operators.text import (
        quality_score,
    )

    q = {
        r.doc_id: round(r.quality * 1_000_000)
        for r in quality_score(spark, SF).collect()
    }
    paired = set()
    for r in minhash_lsh_pairs(spark, SF).collect():
        paired.add(r.doc_id_a)
        paired.add(r.doc_id_b)
    dup_scores = [s for d, s in q.items() if d in paired]
    non_scores = [s for d, s in q.items() if d not in paired]
    assert dup_scores and non_scores  # both classes populated

    concordant2 = sum(
        2 * (n > d) + (n == d) for d in dup_scores for n in non_scores
    )
    pn = len(dup_scores) * len(non_scores)
    expected_auc = (2 * concordant2 * 1_000_000 + 2 * pn) // (4 * pn) / 1e6

    row = quality_auc_eval(spark, SF).collect()[0]
    assert row.n_dup == len(dup_scores)
    assert row.n_nondup == len(non_scores)
    assert row.concordant2 == concordant2
    assert row.auc == expected_auc


def test_token_budget_plan_matches_pure_python(spark):
    """Recompute the token-budget cut in pure Python: per-doc quality
    via the Spark quality lineage itself (already pinned elsewhere),
    then the inclusive prefix-sum rule over (q_micro DESC, doc_id) and
    the per-stratum rollup — pins the banded two-phase cumsum against
    a flat single-ordered walk."""
    from big_data_2021_spark_streaming_spark.operators.curation import (
        BUDGET_DEN,
        BUDGET_NUM,
        token_budget_plan,
    )
    from big_data_2021_spark_streaming_spark.operators.text import (
        quality_lineage,
    )

    docs = load_table(spark, SF, "documents")
    q = [
        (
            r.doc_id,
            r.lang,
            r.source,
            int(r.n_tokens),
            int(round(r.quality * 1e6)),
        )
        for r in quality_lineage(docs, keep=("lang", "source")).collect()
    ]
    total = sum(r[3] for r in q)
    order = sorted(q, key=lambda r: (-r[4], r[0]))
    kept_ids = set()
    cum = 0
    for doc_id, _, _, n_tokens, _ in order:
        cum += n_tokens
        # inclusive prefix test per row (no early break: a 0-token doc
        # past the boundary still fits, exactly as the plan's filter)
        if cum * BUDGET_DEN <= total * BUDGET_NUM:
            kept_ids.add(doc_id)
    expected = {}
    for doc_id, lang, source, n_tokens, _ in q:
        key = (lang, source)
        tot = expected.setdefault(key, [0, 0, 0, 0])
        tot[0] += 1
        tot[2] += n_tokens
        if doc_id in kept_ids:
            tot[1] += 1
            tot[3] += n_tokens
    rows = token_budget_plan(spark, SF).collect()
    got = {
        (r.lang, r.source): [
            r.n_docs_total,
            r.n_docs_kept,
            r.tokens_total,
            r.tokens_kept,
        ]
        for r in rows
    }
    assert got == expected
    for r in rows:
        exp_share = (
            (2 * r.tokens_kept * 1_000_000 + r.tokens_total)
            // (2 * r.tokens_total)
        ) / 1e6
        assert r.kept_share == exp_share
    assert kept_ids, "budget kept nothing — fixture too small"
