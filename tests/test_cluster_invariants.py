"""Structural invariants of near-dup clustering, checked independently
of the DuckDB oracle so a propagation bug fails with a diagnosable
message instead of a hash mismatch."""

from __future__ import annotations

from big_data_2021_spark_streaming_spark.operators.dedup import (
    minhash_lsh_pairs,
    near_dup_clusters,
)

SF = "/root/testdata/sf0.001"


def test_pairs_share_cluster_and_canonical_is_min(spark):
    clusters = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in near_dup_clusters(spark, SF).collect()
    }
    pairs = [
        (r.doc_id_a, r.doc_id_b) for r in minhash_lsh_pairs(spark, SF).collect()
    ]
    assert pairs, "fixture corpus should contain near-dup pairs"
    for a, b in pairs:
        assert clusters[a][0] == clusters[b][0], f"pair {(a, b)} split"
    # cluster ids are the component minimum and the canonical member
    by_cluster: dict[int, list[int]] = {}
    for doc, (cid, _) in clusters.items():
        by_cluster.setdefault(cid, []).append(doc)
    for cid, members in by_cluster.items():
        assert cid == min(members)
        assert clusters[cid][1] is True  # the min member is canonical
        for m in members:
            assert clusters[m][1] == (m == cid)
