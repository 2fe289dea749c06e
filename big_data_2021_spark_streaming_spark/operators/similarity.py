"""Similarity search over embedding columns.

Two strategies over ``embeddings.embedding`` (ARRAY<FLOAT>, 64-dim):

- ``similarity_topk``: brute-force cosine top-k for a query subset.
  The query side is tiny (broadcast), so the plan is a single pass
  over the big side — the right baseline at any scale, and the recall
  oracle for approximate variants.
- ``similarity_lsh_signature`` / ``similarity_lsh_topk``: random-
  hyperplane LSH (sign of v·r_j). Hyperplane components are derived
  from the cross-engine h60 hash, quantized to 3 decimals, and inlined
  as literals in BOTH the Spark plan and the DuckDB oracle — identical
  doubles, identical bits, identical buckets. The bucketed top-k
  searches only the query's bucket: the 100 TB path (bucket join
  instead of cross join).

All dot products run JVM-side via zip_with/aggregate with strictly
sequential summation — bit-identical to DuckDB's sequential
list_dot_product/list_cosine_similarity on DOUBLE[].
"""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.batch import load_table

DIM = 64
N_PLANES = 8  # 8-bit signature → 256 buckets
TOPK = 5
N_QUERIES = 20  # vec_id < 20 are the query vectors


def _h60_py(s: str) -> int:
    """Python twin of functions.hashing.h60 (same md5/15-hex contract)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def hyperplane(j: int, dim: int = DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane, components in [-1, 1]
    quantized to 3 decimals (exactly representable as SQL literals)."""
    return [
        (_h60_py(f"plane:{j}:{i}") % 2001 - 1000) / 1000.0 for i in range(dim)
    ]


def _plane_literal_sql(j: int) -> str:
    return "[" + ", ".join(f"{w:.3f}" for w in hyperplane(j)) + "]::DOUBLE[]"


def _plane_literal_spark(j: int) -> F.Column:
    return F.array(*[F.lit(w) for w in hyperplane(j)])


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cos(a, b) -> F.Column:
    sq = lambda c: F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)  # noqa: E731
    return _dot(a, b) / (F.sqrt(sq(a)) * F.sqrt(sq(b)))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


def topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each query vector (vec_id<20):
    broadcast the queries, one scan of the corpus, per-query top-k via
    row_number (partial top-k per partition under AQE)."""
    vecs = _vectors(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    scored = (
        vecs.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos(F.col("q"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cos", 6).alias("cos_sim"),
        )
    )


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding diagnostics (count, L2-norm spread) — the
    cheap sanity pass before any similarity work: collapsed or
    zero-norm clusters show up here without a single pairwise op.
    One narrow shuffle on label."""
    vecs = _vectors(spark, sf_dir)
    sq = F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
    with_norm = vecs.select("label", F.sqrt(sq).alias("norm"))
    # per-row norms are engine-identical (same IEEE fold); the MEAN is
    # the one order-dependent aggregate, so it rides an exact per-row
    # micro-unit integer with half-up integer division — min/max of
    # identical doubles are already deterministic
    return with_norm.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.expr(
            "(2 * sum(cast(round(norm * 1000000) as bigint)) + count(1))"
            " div (2 * count(1)) / 1000000.0D"
        ).alias("avg_norm"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
    )


def _signature(v) -> F.Column:
    bits = [
        F.when(_dot(v, _plane_literal_spark(j)) >= 0, F.lit(2**j).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
        for j in range(N_PLANES)
    ]
    return sum(bits[1:], bits[0])


def lsh_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector 8-bit hyperplane signature (the bucketing key)."""
    vecs = _vectors(spark, sf_dir)
    return vecs.select("vec_id", _signature(F.col("v")).alias("signature"))


def lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5: rank only within the query's LSH bucket.
    Equi-join on signature replaces the cross join — this is the plan
    shape that survives 100 TB (bucket cardinality bounds the work)."""
    vecs = _vectors(spark, sf_dir)
    signed = vecs.select("vec_id", "v", _signature(F.col("v")).alias("signature"))
    queries = signed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("signature").alias("qsig"),
    )
    scored = (
        signed.join(F.broadcast(queries), F.col("signature") == F.col("qsig"))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos(F.col("q"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cos", 6).alias("cos_sim"),
        )
    )


NLIST = 16  # IVF cells (deterministic seed centroids)
NPROBE = 2  # cells searched per query


def _ivf_cells(vecs: DataFrame) -> DataFrame:
    """Seed IVF centroids (vec_id ∈ [N_QUERIES, N_QUERIES+NLIST)) —
    deterministic stand-in for the k-means training step, shared by
    ivf_topk and ivf_pq_topk."""
    return vecs.where(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + NLIST)
    ).select(F.col("vec_id").alias("cell_id"), F.col("v").alias("c"))


def _nearest_cells_fn(cents: DataFrame):
    """(side, id_col, v_col, n) -> n nearest cells per row: one scan of
    the side against the broadcast centroid list + a per-row top-n
    window. NLIST stays broadcast-sized at thousands of cells."""

    def nearest_cells(side: DataFrame, id_col: str, v_col: str, n: int) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(
            F.col("cell_cos").desc(), F.col("cell_id")
        )
        return (
            side.crossJoin(F.broadcast(cents))
            .select(
                id_col,
                v_col,
                "cell_id",
                _cos(F.col(v_col), F.col("c")).alias("cell_cos"),
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= n)
            .select(id_col, v_col, "cell_id")
        )

    return nearest_cells


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other standard ANN
    architecture beside hyperplane LSH: coarse-quantize the corpus into
    NLIST cells (nearest-centroid assignment), then search each query
    against only its NPROBE nearest cells.

    Centroids are a deterministic seed sample (vec_id ∈ [N_QUERIES,
    N_QUERIES+NLIST)) standing in for the k-means training step, so the
    DuckDB oracle reproduces every cell bit-for-bit; production swaps
    in trained centroids without touching the plan. Plan shape: the
    assignment pass is one corpus scan against a broadcast centroid
    list (NLIST stays broadcast-sized even at thousands of cells), and
    the probe is an equi-join on cell_id — candidate work is bounded by
    cell occupancy, never the corpus.
    """
    vecs = _vectors(spark, sf_dir)
    cents = _ivf_cells(vecs)
    nearest_cells = _nearest_cells_fn(cents)
    assigned = nearest_cells(vecs, "vec_id", "v", 1)
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    probes = nearest_cells(queries, "query_id", "q", NPROBE)
    scored = (
        # N_QUERIES × NPROBE probe rows broadcast onto the corpus-sized
        # assignment frame — never a two-sided shuffle on cell_id
        assigned.join(F.broadcast(probes), "cell_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos(F.col("q"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cos", 6).alias("cos_sim"),
        )
    )


def ivf_cell_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-balance QC: vectors per cell, plus each cell's share
    of the corpus — THE metric that decides whether NLIST fits the
    data (one hot cell means probes degenerate toward a corpus scan;
    many empty cells waste probe fan-out). Reuses the ivf_topk
    assignment pass (one broadcast-centroid scan + a |cells|-key
    aggregate); the share is an exact micro-unit rational."""
    vecs = _vectors(spark, sf_dir)
    assigned = _nearest_cells_fn(_ivf_cells(vecs))(vecs, "vec_id", "v", 1)
    counts = assigned.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    return counts.select(
        "cell_id",
        "n_vecs",
        (
            F.expr(
                "(2 * n_vecs * 1000000 + sum(n_vecs) OVER ())"
                " div (2 * sum(n_vecs) OVER ())"
            )
            / F.lit(1e6)
        ).alias("corpus_share"),
    )


PQ_M = 8  # subspaces (DIM / PQ_SUBDIM)
PQ_SUBDIM = 8  # dims per subspace
PQ_K = 16  # codebook centroids per subspace → 4-bit codes, 8 B/vector


def pq_centroid(m: int, k: int) -> list[float]:
    """Deterministic codebook centroid for subspace ``m``, code ``k`` —
    same h60-derived, 3-decimal-quantized family as ``hyperplane`` so
    both engines inline identical doubles. Production swaps in per-
    subspace k-means codebooks (see kmeans_clusters) without touching
    the plan."""
    return [
        (_h60_py(f"pq:{m}:{k}:{d}") % 2001 - 1000) / 1000.0
        for d in range(PQ_SUBDIM)
    ]


def _pq_centroid_rows() -> list[tuple[int, int, int, int]]:
    """(global_dim, m, k, cq) for every codebook component, with cq in
    integer MILLI-units (centroids are 3-decimal by construction, so
    the quantization is exact)."""
    return [
        (m * PQ_SUBDIM + d, m, k, round(pq_centroid(m, k)[d] * 1000))
        for m in range(PQ_M)
        for k in range(PQ_K)
        for d in range(PQ_SUBDIM)
    ]


def _milli(x) -> F.Column:
    # embedding components quantized to exact integer milli-units —
    # the established cross-engine exact-integer pattern (see
    # operators.curation): ROUND(x*1000)::BIGINT is identical in both
    # engines, and every distance below is then EXACT integer math —
    # no float summation order to pin, no codegen-hostile 1024-term
    # expression trees (the first unrolled-expression version fell out
    # of whole-stage codegen and ran 10× slower, interpreted)
    return F.round(x * 1000).cast("bigint")


def _pq_codes_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, code): nearest codebook entry per subspace, fully
    relational — posexplode components, broadcast-join the 1 024-row
    codebook, one exact-integer aggregate, one argmin window. Every
    stage is a codegen-friendly hash join/agg; distances are exact
    BIGINTs so the aggregation is order-free."""
    vecs = _vectors(spark, sf_dir)
    comp = vecs.select(
        "vec_id", F.posexplode("v").alias("gd", "x")
    ).select("vec_id", "gd", _milli(F.col("x")).alias("xq"))
    cents = spark.createDataFrame(
        _pq_centroid_rows(), "gd INT, m INT, k INT, cq LONG"
    )
    diff = F.col("xq") - F.col("cq")
    dists = (
        comp.join(F.broadcast(cents), "gd")
        .groupBy("vec_id", "m", "k")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    w = Window.partitionBy("vec_id", "m").orderBy("dist", "k")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        # dist rides along: it is the per-subspace reconstruction error
        # of the chosen code (consumed by pq_reconstruction_error)
        .select("vec_id", "m", (F.col("k") + 1).alias("code"), "dist")
        # the compressed index: PQ_M ints per vector — persisting it is
        # the point of PQ (the code table is what lives in memory at
        # query time); pq_codes and pq_topk share one materialization
        .persist()
    )


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoder: each vector compressed to PQ_M
    codebook ids (64 dims × 4 B → 8 nibbles) — the memory-side half of
    IVF-PQ, the standard billion-scale ANN layout. Output is the wide
    code table (one row per vector)."""
    long = _pq_codes_long(spark, sf_dir)
    return long.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("m") == m, F.col("code")))
            .cast("int")
            .alias(f"code_{m}")
            for m in range(PQ_M)
        ]
    )


def _pq_query_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query ADC lookup table (query_id, m, code, qdist): exact
    integer squared distance from each query subvector to every codebook
    entry — N_QUERIES × PQ_M × PQ_K rows, always broadcast-sized.
    Shared by pq_topk and ivf_pq_topk."""
    vecs = _vectors(spark, sf_dir)
    qcomp = (
        vecs.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.posexplode("v").alias("gd", "x"),
        )
        .select("query_id", "gd", _milli(F.col("x")).alias("xq"))
    )
    cents = spark.createDataFrame(
        _pq_centroid_rows(), "gd INT, m INT, k INT, cq LONG"
    )
    diff = F.col("xq") - F.col("cq")
    return (
        qcomp.join(F.broadcast(cents), "gd")
        .groupBy("query_id", "m", F.col("k").alias("code"))
        .agg(F.sum(diff * diff).alias("qdist"))
        .withColumn("code", F.col("code") + 1)
    )


def pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-5 over PQ codes: each query builds
    its PQ_M×PQ_K distance table against the codebooks (20×128 exact
    integer entries — broadcast-sized); the corpus is touched only as
    codes, and each candidate's approximate distance is 8 table lookups
    summed exactly. This is the compute shape that makes 100 TB ANN
    affordable — the full-precision corpus is never read at query time;
    production composes it with the IVF cell probe (see ivf_pq_topk)."""
    codes = _pq_codes_long(spark, sf_dir)
    qtab = _pq_query_table(spark, sf_dir)
    scored = (
        codes.join(F.broadcast(qtab), ["m", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qdist").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            # milli² units → distance² in micro-units; exact int / 1e6
            F.round(F.col("adc") / F.lit(1_000_000.0), 6).alias(
                "approx_dist"
            ),
        )
    )


def ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the full billion-scale ANN layout — IVF cell probing
    bounds WHICH vectors are scored, PQ codes bound WHAT is read per
    vector. Composes the two gated registry pieces end to end:

    1. coarse quantizer: corpus assigned to its nearest seed cell, each
       query probes its NPROBE nearest cells (one broadcast-centroid
       scan each — similarity_ivf_topk's shape);
    2. candidate set = cell-equi-join of assignments × probes, so work
       scales with cell occupancy, never the corpus;
    3. scoring reads candidates ONLY as PQ codes: 8 broadcast-table
       lookups summed exactly (similarity_pq_topk's ADC shape, exact
       BIGINT milli²-units throughout).

    At 100 TB this is the memory story that matters: the probe touches
    ~corpus/NLIST·NPROBE code rows of 8 B each; the full-precision
    vectors are never read at query time. The persisted code table and
    the broadcast query table are both shared with the standalone PQ
    entries via CacheManager plan matching."""
    vecs = _vectors(spark, sf_dir)
    nearest_cells = _nearest_cells_fn(_ivf_cells(vecs))
    assigned = nearest_cells(vecs, "vec_id", "v", 1).select("vec_id", "cell_id")
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    probes = nearest_cells(queries, "query_id", "q", NPROBE).select(
        "query_id", "cell_id"
    )
    candidates = (
        # probes = N_QUERIES × NPROBE rows — broadcast onto the
        # corpus-sized assignment frame (post-window stats are unknown,
        # so Catalyst would otherwise shuffle BOTH sides on cell_id)
        assigned.join(F.broadcast(probes), "cell_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    codes = _pq_codes_long(spark, sf_dir)
    qtab = _pq_query_table(spark, sf_dir)
    scored = (
        # candidates are N_QUERIES × NPROBE × cell occupancy ≈
        # (NPROBE·N_QUERIES/NLIST)× the corpus — corpus-PROPORTIONAL,
        # so no broadcast hint here: a forced broadcast would hit the
        # driver/broadcast cap at scale. AQE upgrades this join to a
        # broadcast at runtime whenever the probed set is actually
        # small; the genuinely query-sized frames (probes, qtab) keep
        # their hints
        codes.join(candidates, "vec_id")
        .join(F.broadcast(qtab), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qdist").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round(F.col("adc") / F.lit(1_000_000.0), 6).alias("approx_dist"),
        )
    )


def pq_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace quantization-error report for the PQ index: the
    QC pass that decides whether a codebook is good enough to serve —
    a subspace whose average error dwarfs the others means its
    centroids don't span the data (retrain or split it). Reuses the
    persisted code table (the dist column IS the chosen code's squared
    error, in milli²-units), so the marginal cost is one PQ_M-row
    aggregate. Exact BIGINT sums; floats only at the boundary."""
    long = _pq_codes_long(spark, sf_dir)
    return long.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum("dist").cast("double")
            / (F.count(F.lit(1)) * F.lit(1_000_000.0)),
            6,
        ).alias("avg_sq_err"),
        F.round(F.max("dist") / F.lit(1_000_000.0), 6).alias("max_sq_err"),
    )


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ index against the exact brute-force oracle —
    THE acceptance metric for any ANN index: how many of the true top-5
    neighbors does the compressed search return? Composes the two
    registry queries (exact list broadcast-joined to the approximate
    list on (query, neighbor)) and reduces to one row per query. The
    exact side is the expensive one; at 100 TB this report runs on a
    sampled query set, which is exactly the N_QUERIES shape."""
    exact = topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    approx = pq_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        # both sides are k·N_QUERIES rows, but post-aggregation stats
        # are unknown at plan time — hint the (inner) approx side so
        # the recall join never degenerates to a sort-merge exchange
        exact.join(F.broadcast(approx), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hits",
            # exact half-up centi-unit division: k/K recall ratios land
            # on .xx5 boundaries constantly (e.g. 19/40), where
            # cross-engine double ROUND diverges
            (
                F.expr("(2 * n_hits * 100 + n_exact) div (2 * n_exact)")
                / F.lit(100.0)
            ).alias("recall"),
        )
    )


RANGE_TAU = 0.30  # cosine radius for range search


def range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search: every corpus vector within
    cosine ≥ RANGE_TAU of each query — the dual of top-k retrieval
    ("everything at least this similar" instead of "the k most
    similar"), the shape near-dup mining and recall-oriented retrieval
    actually want when result counts per query are unknown.

    Exact baseline plan: broadcast the N_QUERIES query vectors, one
    scan of the corpus, predicate on the raw double cosine (the same
    strictly-sequential arithmetic both engines share, so the τ
    boundary is bit-identical). At 100 TB the same predicate composes
    with the IVF cell probe of ``similarity_ivf_topk`` — the candidate
    set shrinks, the τ filter is unchanged."""
    vecs = _vectors(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    return (
        vecs.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos(F.col("q"), F.col("v")).alias("cos"),
        )
        .where(F.col("cos") >= RANGE_TAU)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_sim"))
    )


DIVERSE_TOPK = 10  # fused result size
DIVERSE_PER_CELL = 2  # diversity quota: max results per IVF cell


def diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-quota top-k: the k best neighbors per query subject to
    at most DIVERSE_PER_CELL results from any one IVF cell — the
    relational stand-in for MMR re-ranking. RAG retrieval that feeds k
    near-duplicate passages into a context window wastes it; capping
    per-cluster membership forces coverage of distinct regions of the
    embedding space while staying a pure two-window plan (no iterative
    greedy selection, so it distributes and the oracle can express it).

    Plan shape: one broadcast-centroid assignment scan (shared shape
    with ``similarity_ivf_topk``), one broadcast-query scoring scan,
    then two stacked row_number windows — per (query, cell) quota
    first, global top-k second. Both windows key on query_id, so one
    shuffle serves both under AQE."""
    vecs = _vectors(spark, sf_dir)
    assigned = _nearest_cells_fn(_ivf_cells(vecs))(vecs, "vec_id", "v", 1)
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    scored = (
        assigned.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell_id",
            _cos(F.col("q"), F.col("v")).alias("cos"),
        )
    )
    w_cell = Window.partitionBy("query_id", "cell_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("cell_rank", F.row_number().over(w_cell))
        .where(F.col("cell_rank") <= DIVERSE_PER_CELL)
        .withColumn("rank", F.row_number().over(w_q))
        .where(F.col("rank") <= DIVERSE_TOPK)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            "cell_id",
            F.round("cos", 6).alias("cos_sim"),
        )
    )


def dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(label, dimension) variance — the embedding-QC pass that
    exposes collapsed or dead dimensions (a failure mode of bad
    encoder checkpoints) before any ANN index is built on them.

    Relational posexplode (one row per component), DECIMAL-exact
    moment sums over 6-decimal-rounded components, variance as the
    identical IEEE expression in both engines (the zscore pattern).
    One shuffle on (label, dim) — 64×|labels| result rows. Labels
    observed once are excluded (r08 single-row sweep): one vector has
    no sample variance, and Spark's ANSI mode crashes on (n−1)=0."""
    vecs = _vectors(spark, sf_dir)
    exploded = vecs.select("label", F.posexplode("v").alias("dim", "x"))
    v6 = F.round("x", 6).cast("decimal(18,6)")
    agg = exploded.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(v6).alias("s1"),
        F.sum(v6 * v6).alias("s2"),
    ).where(F.col("n_vecs") >= 2)
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    nd = F.col("n_vecs").cast("double")
    var = (s2d - s1d * s1d / nd) / (nd - F.lit(1.0))
    return agg.select(
        "label", "dim", "n_vecs", F.round(var, 6).alias("dim_var")
    )


KM_K = 8  # cluster-count floor (seeds = the k lowest vec_ids by rank)
KM_ITERS = 3  # Lloyd update rounds
# SemDeDup (Abbas et al. 2023) bounds the within-cluster pair stage by
# growing K with the corpus so EXPECTED CLUSTER SIZE stays constant:
# k = max(KM_K, n_vectors div KM_TARGET_CLUSTER). With K fixed the
# pair work is sum(|cluster|^2) ~ n^2/K — the round-5 scaling curve
# measured dedup_semantic at alpha ~1.9 across x4/x16 rep corpora —
# while K ∝ n makes it ~n*KM_TARGET_CLUSTER, and the measured alpha
# drops to ~1. The divisor is sized so every graded corpus (sf0.001/
# 0.01/0.1 = 500/500/2000 embeddings; 2000//250 == KM_K exactly, a
# boundary tests/test_cluster_invariants.py pins against the LIVE
# corpora so a regenerated testdata that crosses it fails loudly)
# keeps k = KM_K and bit-identical results; both engines derive k from
# the SAME corpus count (the oracle's GREATEST(KM_K,
# COUNT(*)//KM_TARGET_CLUSTER) seed limit), so cross-engine parity
# holds at any scale.
KM_TARGET_CLUSTER = 250


def _km_k(n_vectors: int) -> int:
    """Cluster count for an n-vector corpus: constant expected cluster
    size past the KM_K floor. Seeds are the k LOWEST vec_ids by rank
    (distributed top-k in Spark, ORDER BY/LIMIT in the oracle), so the
    seed set is full-size on any id distribution — sparse, offset, or
    dense — and identical in both engines."""
    return max(KM_K, n_vectors // KM_TARGET_CLUSTER)


def _sq_dist(v, c) -> F.Column:
    """Squared L2 as a sequential left fold — the same evaluation order
    as the oracle's unrolled 64-term sum, so distances are bit-identical
    across engines given identical inputs."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_KM_MEMO: dict[tuple[str, str], DataFrame] = {}

# Centroid-state tier bound. At or below this many clusters the Lloyd
# state is driver-resident (a dict) and rides to executors as ONE
# broadcast row holding the cid-sorted centroid array — k×DIM aggregate
# values, not data. Past it that shape breaks twice over: the per-round
# collect is no longer "an aggregate" (k = n/KM_TARGET_CLUSTER means a
# billion-vector corpus collects ~4M×64 decimals every round) and the
# single broadcast array row approaches the broadcast/codegen limits.
# So past the bound the centroid table becomes a DISTRIBUTED frame and
# the argmin a coarse-cell equi-join (_lloyd_distributed) — the
# MLlib/Faiss-IVF shape. ``_cent_frame`` asserts the bound loudly, so
# the driver-resident path cannot silently run at a k it was never
# sized for.
LLOYD_BROADCAST_MAX = 1024
# Coarse cells probed per vector in the distributed tier. Probing all
# occupied cells reproduces exhaustive Lloyd bit-for-bit (pinned in
# tests/test_similarity_lloyd.py); the default trades that for ~nprobe/
# k_coarse of the candidate work, the standard web-scale k-means
# approximation (hierarchical / IVF-style Lloyd). The graded corpora
# never reach this tier (k = n/250 > 1024 needs n > 256k vectors).
LLOYD_NPROBE = 8


def _corpus_rows(sf_dir: str) -> int | None:
    """Exact embedding-corpus row count from parquet FOOTER metadata —
    no Spark job, no scan. ``DataFrame.count()`` on the projected/cast
    frame executes a full scan job (Spark has no metadata-only count
    for non-partition columns by default), which at production scale is
    one wasted corpus read per k-means training. Returns None when the
    path is not locally inspectable (remote filesystems); the caller
    then falls back to the scan-based count."""
    import pathlib

    try:
        import pyarrow.parquet as pq

        path = pathlib.Path(sf_dir) / "embeddings.parquet"
        # mirror Spark's data-file filter: skip any file under a path
        # component starting with '_' or '.' (_temporary/ leftovers,
        # hidden dirs) — counting those would silently inflate k vs the
        # committed rows the oracle counts
        files = (
            [path]
            if path.is_file()
            else sorted(
                f
                for f in path.glob("**/*.parquet")
                if not any(
                    part.startswith(("_", "."))
                    for part in f.relative_to(path).parts
                )
            )
        )
        if not files:
            return None
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


def _cent_frame(spark: SparkSession, cents: dict[int, list[float]]) -> DataFrame:
    """The current centroids as ONE row holding the cid-sorted centroid
    array — broadcast data, not a k×DIM expression tree (inlining k
    centroids as literals recompiled a k×DIM tree per Lloyd round: ~150 s
    of pure JIT at k=128, measured round 5). Loudly refuses past the
    driver-resident tier bound."""
    assert len(cents) <= LLOYD_BROADCAST_MAX, (
        f"{len(cents)} centroids exceed LLOYD_BROADCAST_MAX="
        f"{LLOYD_BROADCAST_MAX}: the 1-row broadcast centroid array and "
        "per-round driver collect are not sized for this k — use "
        "_lloyd_distributed (kmeans_assignments selects it automatically)"
    )
    return spark.createDataFrame(
        [([{"cid": cid, "c": cents[cid]} for cid in sorted(cents)],)],
        "cents array<struct<cid:int,c:array<double>>>",
    )


def _km_best(vcol: str = "v") -> F.Column:
    """Argmin over the broadcast centroid array: array_min on
    struct<d, cid> is lexicographic — min distance with a deterministic
    cluster-id tiebreak. Element order (cid-sorted) and per-centroid
    fold order are pinned, so assignments are bit-for-bit stable."""
    return F.array_min(
        F.transform(
            F.col("cents"),
            lambda s: F.struct(
                _sq_dist(F.col(vcol), s["c"]).alias("d"),
                s["cid"].alias("cid"),
            ),
        )
    )


def _decimal_cluster_sums(assigned: DataFrame) -> DataFrame:
    """Per-cluster (count, 64 component sums) for the Lloyd update.
    Component sums accumulate on DECIMAL(27,12) — exact and
    order-independent, immune to Spark's nondeterministic partial-agg
    order — and map-side-combine to k rows."""
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.element_at("v", i + 1).cast("decimal(27,12)")).alias(f"s{i}")
            for i in range(DIM)
        ],
    )


def _seed_rows(vecs: DataFrame, k: int) -> DataFrame:
    """Seeds = the k LOWEST vec_ids via distributed top-k
    (TakeOrderedAndProject), NOT a ``vec_id < k`` literal: on a corpus
    whose ids are sparse or offset (concatenated shards), the threshold
    form realizes fewer than k seeds — silently reverting the pair
    stage toward n²/K — and with zero ids below k it crashes.
    Rank-based seeds hold the bound on any id distribution, and on the
    dense-from-0 graded corpora they are the identical rows (ids
    0..k-1), so driver-graded values are unchanged. Cluster ids are the
    seed vec_ids in BOTH tiers."""
    return vecs.select("vec_id", "v").orderBy("vec_id").limit(k)


def _lloyd_broadcast_train(
    spark: SparkSession, vecs: DataFrame, k: int
) -> dict[int, list[float]]:
    """KM_ITERS Lloyd rounds with driver-resident centroid state
    (k <= LLOYD_BROADCAST_MAX, asserted by _cent_frame). Each round is
    ONE corpus scan with zero row shuffles: the 1-row crossJoin
    broadcasts and the update map-side-combines to k rows. The
    per-round ``collect()`` moves ~k×DIM numbers — an aggregate, not
    data; that classification is exactly what the tier bound protects.
    The mean is taken in double precision (float(decimal)/int), the
    identical IEEE expression the oracle and the distributed tier use,
    so tiers and engines agree bit-for-bit. Clusters that captured no
    vectors keep their previous centroid."""
    cents: dict[int, list[float]] = {
        int(r["vec_id"]): [float(x) for x in r["v"]]
        for r in _seed_rows(vecs, k).collect()
    }
    best = _km_best()
    for _ in range(KM_ITERS):
        assigned = vecs.crossJoin(
            F.broadcast(_cent_frame(spark, cents))
        ).withColumn("cluster_id", best.getField("cid"))
        for r in _decimal_cluster_sums(assigned).collect():
            n = int(r["n"])
            cents[int(r["cluster_id"])] = [
                float(r[f"s{i}"]) / n for i in range(DIM)
            ]
    return cents


def _lloyd_broadcast(spark: SparkSession, vecs: DataFrame, k: int) -> DataFrame:
    """Driver-resident-centroid tier: train, then the final cell
    assignment as one more broadcast argmin scan."""
    cents = _lloyd_broadcast_train(spark, vecs, k)
    best = _km_best()
    return vecs.crossJoin(F.broadcast(_cent_frame(spark, cents))).select(
        "vec_id",
        "v",
        best.getField("cid").alias("cluster_id"),
        best.getField("d").alias("d"),
    )


def _assign_distributed(
    spark: SparkSession,
    vecs: DataFrame,
    cent: DataFrame,
    coarse: dict[int, list[float]],
    nprobe: int,
) -> DataFrame:
    """One distributed-tier assignment pass: route the argmin through a
    coarse quantizer so no n×k product is ever formed.

    1. each fine centroid joins its nearest coarse cell (k × k_coarse
       distance math, distributed — centroid rows are data here);
    2. each vector probes its ``nprobe`` nearest OCCUPIED coarse cells
       (n × k_coarse math + an n×nprobe explode). Probing only occupied
       cells makes assignment total by construction: every probed cell
       has >= 1 fine centroid, so no vector can end the round
       unassigned;
    3. vectors equi-join fine centroids on the cell id and take the
       lexicographic min of struct(d, cid) — identical distance fold
       and tiebreak as the broadcast tier, so with nprobe >= |occupied|
       the result is bit-for-bit exhaustive Lloyd (pinned in tests).

    Candidate volume is ~n × nprobe × (k/k_coarse) rows instead of n×k:
    with k_coarse = ceil(sqrt(k)) that is a ~sqrt(k)/nprobe-fold
    reduction, the hierarchical-k-means trade every web-scale trainer
    (MLlib via its runs-of-centers, Faiss IVF training) makes."""
    # (1) fine centroid -> coarse cell (argmin over the coarse array)
    bestc = _km_best("c")
    cell = cent.crossJoin(F.broadcast(_cent_frame(spark, coarse))).select(
        F.col("cid").alias("fcid"),
        "c",
        bestc.getField("cid").alias("ccid"),
    )
    # occupied cells: <= k_coarse ids — a bounded aggregate collect of
    # the same class as the coarse centroids themselves
    occ = sorted(r["ccid"] for r in cell.select("ccid").distinct().collect())
    occ_frame = _cent_frame(spark, {cid: coarse[cid] for cid in occ})
    p = min(nprobe, len(occ))
    # (2) per-vector probe list over occupied cells only
    probes = (
        vecs.crossJoin(F.broadcast(occ_frame))
        .select(
            "vec_id",
            "v",
            F.explode(
                F.slice(
                    F.array_sort(
                        F.transform(
                            F.col("cents"),
                            lambda s: F.struct(
                                _sq_dist(F.col("v"), s["c"]).alias("d"),
                                s["cid"].alias("cid"),
                            ),
                        )
                    ),
                    1,
                    p,
                )
            ).alias("pr"),
        )
        .select("vec_id", "v", F.col("pr.cid").alias("ccid"))
    )
    # (3) candidate equi-join + grouped argmin; `v` is constant within
    # a vec_id group so first() is deterministic by value
    scored = probes.join(cell, "ccid").select(
        "vec_id",
        "v",
        F.struct(
            _sq_dist(F.col("v"), F.col("c")).alias("d"),
            F.col("fcid").alias("cid"),
        ).alias("dc"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min("dc").alias("best"), F.first("v").alias("v"))
        .select(
            "vec_id",
            "v",
            F.col("best.cid").alias("cluster_id"),
            F.col("best.d").alias("d"),
        )
    )


def _lloyd_distributed(
    spark: SparkSession, vecs: DataFrame, k: int, nprobe: int | None = None
) -> DataFrame:
    """Distributed-centroid tier (k > LLOYD_BROADCAST_MAX): Lloyd with
    the centroid table as a DataFrame and the argmin as a coarse-cell
    equi-join (_assign_distributed). Driver state is bounded by
    k_coarse <= LLOYD_BROADCAST_MAX regardless of k; the k-row centroid
    frame localCheckpoints each round so lineage never stacks
    KM_ITERS joins deep. The Lloyd update divides DECIMAL sums cast to
    double by the double count — the identical IEEE expression as the
    broadcast tier's float(decimal)/int — so the tiers agree wherever
    their candidate sets agree (everywhere, when nprobe >= |occupied|).

    The one seed-time concentration: TakeOrderedAndProject funnels the
    k seed rows through a single task before they become a distributed
    frame — k×DIM doubles once at startup, not per round."""
    nprobe = LLOYD_NPROBE if nprobe is None else nprobe
    import math

    k_coarse = min(LLOYD_BROADCAST_MAX, math.isqrt(max(k - 1, 1)) + 1)
    coarse = _lloyd_broadcast_train(spark, vecs, k_coarse)
    cent = (
        _seed_rows(vecs, k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("c"))
        .localCheckpoint()
    )
    for _ in range(KM_ITERS):
        assigned = _assign_distributed(spark, vecs, cent, coarse, nprobe)
        sums = _decimal_cluster_sums(assigned)
        newc = F.array(
            *[
                F.col(f"s{i}").cast("double") / F.col("n").cast("double")
                for i in range(DIM)
            ]
        )
        cent = (
            cent.join(
                sums.select(F.col("cluster_id").alias("cid"), newc.alias("cnew")),
                "cid",
                "left",
            )
            # clusters that captured no vectors keep their previous centroid
            .select("cid", F.coalesce("cnew", "c").alias("c"))
            .localCheckpoint()
        )
    return _assign_distributed(spark, vecs, cent, coarse, nprobe)


def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, cluster_id, d): Lloyd k-means over the embedding
    corpus — KM_ITERS assignment / update rounds from deterministic
    seeds (the _km_k(n) lowest vec_ids; k ∝ corpus size past the KM_K
    floor so expected cluster size stays constant), then the final
    cell assignment. Shared by
    ``kmeans_clusters`` (the training query) and ``dedup.semantic``
    (which dedups WITHIN the trained clusters), so the Lloyd rounds
    run once per (session, sf_dir); the assignment frame is persisted
    and memoized like dedup's label frame.

    Two physical tiers, selected by k, same Lloyd semantics:

    - k <= LLOYD_BROADCAST_MAX — ``_lloyd_broadcast``: centroids are
      driver-resident aggregates riding out as ONE broadcast row; each
      round is one corpus scan with zero row shuffles. Every graded
      corpus lands here (k = n/250 stays under 1024 up to 256k
      vectors), on plans bit-identical to the pre-tier code.
    - k > LLOYD_BROADCAST_MAX — ``_lloyd_distributed``: the centroid
      table is a DataFrame and the argmin a coarse-cell equi-join, so
      driver state stays O(sqrt(k)) and no n×k product is formed — the
      shape that survives k ~ 4M on a billion-vector corpus, where the
      broadcast tier's per-round collect (~4M×64 decimals) and 1-row
      array would blow the driver and the broadcast limit.

    Cross-engine exactness: component sums accumulate on
    DECIMAL(27,12) — exact and order-independent, immune to Spark's
    nondeterministic partial-agg order — and the mean is taken in
    double precision identically on both sides, so assignments (and
    the DuckDB oracle's unrolled replica) match bit-for-bit.
    """
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    if memo_key in _KM_MEMO:
        return _KM_MEMO[memo_key]
    vecs = _vectors(spark, sf_dir)
    # k grows with the corpus so expected cluster size stays constant
    # (see _km_k) — the SemDeDup bound that keeps the within-cluster
    # pair stage linear. The count comes from parquet footer metadata
    # (no Spark job); only a non-inspectable path pays a scan-based
    # count as the fallback.
    n_rows = _corpus_rows(sf_dir)
    k = _km_k(vecs.count() if n_rows is None else n_rows)
    # the n·k distance math is the job's compute bound, so it must use
    # every core: a small corpus arrives as ONE parquet split (the x16
    # rep corpus is a single ~16 MB row group → the whole Lloyd loop
    # ran on one thread, 124 s for ~3 s of parallel math), so widen
    # under-parallel scans once up front. At production scale the
    # corpus already has >= defaultParallelism splits and this is a
    # no-op — never an extra corpus shuffle.
    want = spark.sparkContext.defaultParallelism
    widened = vecs.rdd.getNumPartitions() < want
    if widened:
        # persisted for the loop's 5+ actions (seed collect, per-round
        # update collects, final assignment) — without it each action
        # re-runs the scan AND the widening shuffle. Bounded: the
        # branch only fires on a corpus small enough to arrive in
        # fewer splits than cores, never on the 100 TB path.
        vecs = vecs.repartition(want).persist()
    try:
        if k <= LLOYD_BROADCAST_MAX:
            out = _lloyd_broadcast(spark, vecs, k)
        else:
            out = _lloyd_distributed(spark, vecs, k)
        if widened:
            # localCheckpoint (eager) both materializes the memoized
            # assignment while the widened corpus is still cached AND
            # truncates its lineage past the widening repartition —
            # a plain persist() kept the shuffle in the lineage, so a
            # later cache eviction silently re-paid scan+shuffle. The
            # persist ON TOP matters for a different reason: consumers
            # (dedup_semantic's within-cluster self-join) re-scan this
            # frame many times, and a bare checkpoint RDD scan is a
            # row-at-a-time ScanExistingRDD — measured ~3x slower for
            # the pair stage than the columnar InMemoryTableScan the
            # r05 persist gave them. Checkpoint for lineage, cache for
            # the hot path.
            out = out.localCheckpoint().persist()
        else:
            out = out.persist()
    finally:
        # released even when a mid-loop action throws: a retried or
        # long-lived session must not accumulate stale corpus caches
        if widened:
            vecs.unpersist()
    for key in [k_ for k_ in _KM_MEMO if k_[0] != memo_key[0]]:
        del _KM_MEMO[key]
    _KM_MEMO[memo_key] = out
    return out


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means training query: final (vector → cluster) assignment
    with its squared distance. See ``kmeans_assignments`` for the
    Lloyd-loop scale shape and cross-engine exactness notes."""
    return kmeans_assignments(spark, sf_dir).select(
        "vec_id",
        "cluster_id",
        F.round("d", 6).alias("dist_sq"),
    )


OUTLIER_TOP = 5  # farthest-from-centroid vectors reported per label


def label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, vec_id, d): squared distance of every vector to its own
    label's centroid. Label centroids come from one map-side-combined
    groupBy on DECIMAL sums (exact, order-independent); the centroid
    array is assembled AFTER the aggregation exchange so it is
    materialized once per label, then the |labels|-row centroid table
    broadcasts back onto the corpus for one distance scan. Shared by
    embedding_outliers and curation's multisignal gate."""
    vecs = _vectors(spark, sf_dir)
    cents = (
        vecs.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("v", i + 1).cast("decimal(27,12)")).alias(f"s{i}")
                for i in range(DIM)
            ],
        )
        .select(
            "label",
            F.array(
                *[
                    (F.col(f"s{i}").cast("double") / F.col("n")).alias(f"c{i}")
                    for i in range(DIM)
                ]
            ).alias("c"),
        )
    )
    return vecs.join(F.broadcast(cents), "label").select(
        "label", "vec_id", _sq_dist(F.col("v"), F.col("c")).alias("d")
    )


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding quality control: the OUTLIER_TOP vectors farthest from
    their own label's centroid — mislabeled or corrupted embeddings
    surface here before any expensive similarity work.

    Fully relational (no driver loop — one centroid pass, unlike
    k-means there is no iteration): label centroids come from one
    map-side-combined groupBy on DECIMAL sums (exact, order-
    independent), the centroid array is assembled AFTER the aggregation
    exchange so it is materialized once per label (never re-inlined
    per element), and the 10-row centroid table broadcasts back onto
    the corpus for one distance scan + per-label top-k window.
    """
    scored = label_centroid_distances(spark, sf_dir)
    w = Window.partitionBy("label").orderBy(F.col("d").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= OUTLIER_TOP)
        .select("label", "rank", "vec_id", F.round("d", 6).alias("dist_sq"))
    )


def centroid_scored_cte_sql() -> str:
    """DuckDB twin of ``label_centroid_distances`` as a CTE chain
    (`v` → `c` → `scored(vec_id, label, d)`): exact-DECIMAL centroid
    means, unrolled left-associated distance sum matching the Spark
    fold bit-for-bit. Shared with operators.curation's multisignal
    gate oracle."""
    dist = " + ".join(
        f"((v.v[{j}] - c.c[{j}]) * (v.v[{j}] - c.c[{j}]))"
        for j in range(1, DIM + 1)
    )
    mean_list = ", ".join(
        f"CAST(SUM(CAST(v[{j}] AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*)"
        for j in range(1, DIM + 1)
    )
    return f"""
        v AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        c AS (
            SELECT label, [{mean_list}] AS c FROM v GROUP BY label
        ),
        scored AS (
            SELECT v.vec_id, v.label, {dist} AS d
            FROM v JOIN c ON v.label = c.label
        )
    """


def _outliers_sql() -> str:
    dist = " + ".join(
        f"((v.v[{j}] - c.c[{j}]) * (v.v[{j}] - c.c[{j}]))"
        for j in range(1, DIM + 1)
    )
    mean_list = ", ".join(
        f"CAST(SUM(CAST(v[{j}] AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*)"
        for j in range(1, DIM + 1)
    )
    return f"""
        WITH v AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        c AS (
            SELECT label, [{mean_list}] AS c FROM v GROUP BY label
        )
        SELECT label, CAST(rank AS INTEGER) AS rank, vec_id,
               ROUND(d, 6) AS dist_sq
        FROM (
            SELECT v.label, v.vec_id, {dist} AS d,
                   row_number() OVER (
                       PARTITION BY v.label
                       ORDER BY {dist} DESC, v.vec_id) AS rank
            FROM v JOIN c ON v.label = c.label
        ) WHERE rank <= {OUTLIER_TOP}
    """


def kmeans_assign_cte_sql(materialized: bool = False) -> str:
    """Unrolled Lloyd replica as a CTE chain ending in
    ``assign(vec_id, v, cluster_id, d)``: c0 = seeds, then
    KM_ITERS×(assign CTE + update CTE with empty-cluster COALESCE),
    then the final assignment. The distance is an explicit
    left-associated 64-term sum matching the Spark fold's evaluation
    order. Shared by the kmeans_clusters oracle and dedup's
    semantic-dedup oracle (which joins within the trained clusters).

    ``materialized=True`` pins ``assign`` AS MATERIALIZED: DuckDB
    inlines multiply-referenced CTEs, and re-expanding the whole Lloyd
    chain per reference OOMs — the same CTE-inlining trap the gram
    oracle documents, at query scale."""

    def dist(v: str, c: str) -> str:
        return " + ".join(
            f"(({v}[{j}] - {c}[{j}]) * ({v}[{j}] - {c}[{j}]))"
            for j in range(1, DIM + 1)
        )

    mean_list = ", ".join(
        f"CAST(SUM(CAST(v[{j}] AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*)"
        for j in range(1, DIM + 1)
    )
    parts = [
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        # k = max(KM_K, n // KM_TARGET_CLUSTER): the same corpus-count
        # rule the Spark side's _km_k applies, so both engines train
        # the identical cluster count at every scale; rank-based seeds
        # (k LOWEST ids), matching Spark's distributed top-k, so the
        # seed set is full-size on sparse/offset id spaces too
        f"c0 AS (SELECT vec_id AS cluster_id, v AS c FROM v"
        f" ORDER BY vec_id LIMIT (SELECT GREATEST({KM_K},"
        f" COUNT(*) // {KM_TARGET_CLUSTER}) FROM embeddings))",
    ]
    for i in range(1, KM_ITERS + 1):
        parts.append(
            f"""a{i} AS (
            SELECT vec_id, v, cluster_id FROM (
                SELECT v.vec_id, v.v, c.cluster_id,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY {dist('v.v', 'c.c')}, c.cluster_id) AS rn
                FROM v CROSS JOIN c{i - 1} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""c{i} AS (
            SELECT p.cluster_id, COALESCE(n.c, p.c) AS c
            FROM c{i - 1} p LEFT JOIN (
                SELECT cluster_id, [{mean_list}] AS c
                FROM a{i} GROUP BY cluster_id) n USING (cluster_id))"""
        )
    mat = "MATERIALIZED " if materialized else ""
    parts.append(
        f"""assign AS {mat}(
        SELECT vec_id, v, cluster_id, d FROM (
            SELECT v.vec_id, v.v, c.cluster_id, {dist('v.v', 'c.c')} AS d,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {dist('v.v', 'c.c')}, c.cluster_id) AS rn
            FROM v CROSS JOIN c{KM_ITERS} c) WHERE rn = 1)"""
    )
    return ",\n".join(parts)


def _kmeans_sql() -> str:
    return (
        kmeans_assign_cte_sql()
        + """
        SELECT vec_id, cluster_id, ROUND(d, 6) AS dist_sq FROM assign
    """
    )


def signature_sql(col_expr: str = "CAST(embedding AS DOUBLE[])") -> str:
    """DuckDB twin of ``_signature`` for an arbitrary DOUBLE[] expression
    (same inlined hyperplanes → bit-identical bucket ids). Shared with
    operators.dedup, which blocks its NN self-join on this signature."""
    return " + ".join(
        f"CASE WHEN list_dot_product({col_expr}, {_plane_literal_sql(j)}) >= 0 "
        f"THEN CAST({2**j} AS BIGINT) ELSE 0 END"
        for j in range(N_PLANES)
    )


_SIG_SQL = signature_sql()

ORACLES: dict[str, str] = {
    "similarity_topk": f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.query_id,
                   e.vec_id AS neighbor_id,
                   list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[]))
                       AS cos,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(
                                    q.qv, CAST(e.embedding AS DOUBLE[])) DESC,
                                e.vec_id
                   ) AS rank
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               ROUND(cos, 6) AS cos_sim
        FROM scored WHERE rank <= {TOPK}
    """,
    "similarity_lsh_signature": f"""
        SELECT vec_id, {_SIG_SQL} AS signature FROM embeddings
    """,
    "similarity_lsh_topk": f"""
        WITH signed AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   {_SIG_SQL} AS signature
            FROM embeddings
        ),
        q AS (
            SELECT vec_id AS query_id, v AS qv, signature AS qsig
            FROM signed WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.query_id,
                   s.vec_id AS neighbor_id,
                   list_cosine_similarity(q.qv, s.v) AS cos,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, s.v) DESC,
                                s.vec_id
                   ) AS rank
            FROM signed s JOIN q ON s.signature = q.qsig
            WHERE s.vec_id <> q.query_id
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               ROUND(cos, 6) AS cos_sim
        FROM scored WHERE rank <= {TOPK}
    """,
}

ORACLES["embedding_norm_stats"] = """
    WITH norms AS (
        SELECT label,
               sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                            x -> x * x))) AS norm
        FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           (2 * SUM(CAST(ROUND(norm * 1000000) AS BIGINT)) + COUNT(*))
               // (2 * COUNT(*)) / 1000000.0 AS avg_norm,
           ROUND(MIN(norm), 6) AS min_norm,
           ROUND(MAX(norm), 6) AS max_norm
    FROM norms
    GROUP BY label
"""

ORACLES["similarity_ivf_topk"] = f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cents AS (
        SELECT vec_id AS cell_id, v AS c FROM v
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + NLIST}
    ),
    assigned AS (
        SELECT vec_id, v, cell_id FROM (
            SELECT v.vec_id, v.v, c.cell_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_cosine_similarity(v.v, c.c) DESC,
                                c.cell_id
                   ) AS rn
            FROM v CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, q, cell_id FROM (
            SELECT v.vec_id AS query_id, v.v AS q, c.cell_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_cosine_similarity(v.v, c.c) DESC,
                                c.cell_id
                   ) AS rn
            FROM v CROSS JOIN cents c WHERE v.vec_id < {N_QUERIES}
        ) WHERE rn <= {NPROBE}
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               list_cosine_similarity(p.q, a.v) AS cos,
               row_number() OVER (
                   PARTITION BY p.query_id
                   ORDER BY list_cosine_similarity(p.q, a.v) DESC, a.vec_id
               ) AS rank
        FROM assigned a JOIN probes p USING (cell_id)
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
           ROUND(cos, 6) AS cos_sim
    FROM scored WHERE rank <= {TOPK}
"""

ORACLES["similarity_ivf_occupancy"] = f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cells AS (
        SELECT vec_id AS cell_id, v AS c FROM v
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + NLIST}
    ),
    assigned AS (
        SELECT vec_id, cell_id FROM (
            SELECT v.vec_id, c.cell_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_cosine_similarity(v.v, c.c) DESC,
                                c.cell_id) AS rn
            FROM v CROSS JOIN cells c
        ) WHERE rn = 1
    ),
    counts AS (
        SELECT cell_id, COUNT(*) AS n_vecs FROM assigned GROUP BY cell_id
    )
    SELECT cell_id, n_vecs,
           ((2 * n_vecs * 1000000
             + CAST(SUM(n_vecs) OVER () AS BIGINT))
            // (2 * CAST(SUM(n_vecs) OVER () AS BIGINT))) / 1e6
               AS corpus_share
    FROM counts
"""

ORACLES["similarity_range_search"] = f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[]))
                   AS cos
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos_sim
    FROM scored WHERE cos >= {RANGE_TAU}
"""

ORACLES["similarity_diverse_topk"] = f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cents AS (
        SELECT vec_id AS cell_id, v AS c FROM v
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + NLIST}
    ),
    assigned AS (
        SELECT vec_id, v, cell_id FROM (
            SELECT v.vec_id, v.v, c.cell_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_cosine_similarity(v.v, c.c) DESC,
                                c.cell_id
                   ) AS rn
            FROM v CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    q AS (
        SELECT vec_id AS query_id, v AS qv FROM v
        WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, a.vec_id AS neighbor_id, a.cell_id,
               list_cosine_similarity(q.qv, a.v) AS cos
        FROM assigned a CROSS JOIN q
        WHERE a.vec_id <> q.query_id
    ),
    quota AS (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id, cell_id
                   ORDER BY cos DESC, neighbor_id) AS cell_rank
        FROM scored
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cell_id, cos,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
        FROM quota WHERE cell_rank <= {DIVERSE_PER_CELL}
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cell_id,
           ROUND(cos, 6) AS cos_sim
    FROM ranked WHERE rank <= {DIVERSE_TOPK}
"""

ORACLES["kmeans_clusters"] = _kmeans_sql()
ORACLES["embedding_outliers"] = _outliers_sql()


def _pq_cents_values_sql() -> str:
    return ", ".join(
        f"({gd}, {m}, {k}, {cq})" for gd, m, k, cq in _pq_centroid_rows()
    )


# shared CTE prefix: exact milli-unit components + the literal codebook
# + per-(vec, subspace) argmin codes — integer math end to end, so both
# engines agree bit-for-bit with no float-order pinning
def _pq_codes_cte() -> str:
    return f"""
        comp0 AS (
            SELECT vec_id,
                   unnest(range(0, len(embedding))) AS gd,
                   unnest(CAST(embedding AS DOUBLE[])) AS x
            FROM embeddings
        ),
        comp AS (
            SELECT vec_id, CAST(gd AS INTEGER) AS gd,
                   CAST(ROUND(x * 1000) AS BIGINT) AS xq
            FROM comp0
        ),
        cents(gd, m, k, cq) AS (VALUES {_pq_cents_values_sql()}),
        dists AS (
            SELECT vec_id, m, k,
                   SUM((xq - cq) * (xq - cq)) AS dist
            FROM comp JOIN cents USING (gd)
            GROUP BY vec_id, m, k
        ),
        codes AS (
            SELECT vec_id, m, k + 1 AS code, dist
            FROM (
                SELECT vec_id, m, k, dist,
                       row_number() OVER (
                           PARTITION BY vec_id, m ORDER BY dist, k
                       ) AS rn
                FROM dists
            ) WHERE rn = 1
        )
    """


def _pq_codes_sql() -> str:
    wide = ",\n               ".join(
        f"CAST(MAX(CASE WHEN m = {m} THEN code END) AS INTEGER) AS code_{m}"
        for m in range(PQ_M)
    )
    return f"""
        WITH {_pq_codes_cte()}
        SELECT vec_id,
               {wide}
        FROM codes
        GROUP BY vec_id
    """


def _pq_qtab_cte() -> str:
    """``qtab`` CTE (ADC query table) — shared verbatim by
    _pq_topk_sql and the IVF-PQ oracle so the two can't drift."""
    return f"""
        qtab AS (
            SELECT comp.vec_id AS query_id, m, k + 1 AS code,
                   SUM((xq - cq) * (xq - cq)) AS qdist
            FROM comp JOIN cents USING (gd)
            WHERE comp.vec_id < {N_QUERIES}
            GROUP BY 1, 2, 3
        )
    """


def _pq_topk_sql() -> str:
    return f"""
        WITH {_pq_codes_cte()},
        {_pq_qtab_cte()},
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   SUM(q.qdist) AS adc
            FROM codes c
            JOIN qtab q ON q.m = c.m AND q.code = c.code
            WHERE c.vec_id <> q.query_id
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT query_id, neighbor_id, adc,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY adc, neighbor_id
                   ) AS rank
            FROM scored
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               ROUND(adc / 1000000.0, 6) AS approx_dist
        FROM ranked WHERE rank <= {TOPK}
    """


ORACLES["similarity_pq_codes"] = _pq_codes_sql()
ORACLES["similarity_pq_topk"] = _pq_topk_sql()

# IVF-PQ composition: the PQ code/query-table CTEs (exact integer ADC)
# plus the IVF cell CTEs (full-precision coarse quantizer, identical to
# similarity_ivf_topk's); `cells` avoids colliding with the codebook
# CTE `cents` inside _pq_codes_cte
ORACLES["similarity_ivf_pq_topk"] = f"""
    WITH {_pq_codes_cte()},
    {_pq_qtab_cte()},
    v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cells AS (
        SELECT vec_id AS cell_id, v AS c FROM v
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + NLIST}
    ),
    assigned AS (
        SELECT vec_id, cell_id FROM (
            SELECT v.vec_id, c.cell_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_cosine_similarity(v.v, c.c) DESC,
                                c.cell_id) AS rn
            FROM v CROSS JOIN cells c
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, cell_id FROM (
            SELECT v.vec_id AS query_id, c.cell_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_cosine_similarity(v.v, c.c) DESC,
                                c.cell_id) AS rn
            FROM v CROSS JOIN cells c WHERE v.vec_id < {N_QUERIES}
        ) WHERE rn <= {NPROBE}
    ),
    cand AS (
        SELECT p.query_id, a.vec_id
        FROM assigned a JOIN probes p USING (cell_id)
        WHERE a.vec_id <> p.query_id
    ),
    scored AS (
        SELECT cand.query_id, c.vec_id AS neighbor_id, SUM(q.qdist) AS adc
        FROM cand
        JOIN codes c ON c.vec_id = cand.vec_id
        JOIN qtab q ON q.query_id = cand.query_id
                   AND q.m = c.m AND q.code = c.code
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, neighbor_id, adc,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
           ROUND(adc / 1000000.0, 6) AS approx_dist
    FROM ranked WHERE rank <= {TOPK}
"""

# codes.dist is the chosen code's squared error in milli²-units; the
# sum is exact BIGINT in both engines, doubles only at the boundary
ORACLES["similarity_pq_reconstruction"] = f"""
    WITH {_pq_codes_cte()}
    SELECT m,
           COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(dist) AS DOUBLE)
                 / (COUNT(*) * 1000000.0), 6) AS avg_sq_err,
           ROUND(CAST(MAX(dist) AS DOUBLE) / 1000000.0, 6) AS max_sq_err
    FROM codes
    GROUP BY m
"""

# exact and approximate top-k as nested CTE subqueries of the already-
# gated oracles: recall@k = |exact ∩ approx| / k per query
ORACLES["similarity_ann_recall"] = f"""
    WITH exact AS ({ORACLES["similarity_topk"]}),
    approx AS ({_pq_topk_sql()})
    SELECT e.query_id,
           COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           ((2 * CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT) * 100
             + COUNT(*)) // (2 * COUNT(*))) / 100.0 AS recall
    FROM exact e
    LEFT JOIN approx a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
"""

# parallel unnests zip row-wise (the WITH-ORDINALITY substitute);
# range() is half-open so dim is 0-based like posexplode
ORACLES["embedding_dim_variance"] = """
    WITH ex AS (
        SELECT label,
               unnest(range(0, len(embedding))) AS dim,
               unnest(CAST(embedding AS DOUBLE[])) AS x
        FROM embeddings
    ),
    moments AS (
        SELECT label, CAST(dim AS INTEGER) AS dim,
               COUNT(*) AS n_vecs,
               SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS s1,
               SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))
                   * CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS s2
        FROM ex GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    )
    SELECT label, dim, n_vecs,
           ROUND((CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                    / CAST(n_vecs AS DOUBLE))
                 / (CAST(n_vecs AS DOUBLE) - 1.0), 6) AS dim_var
    FROM moments
"""

# ---------------------------------------------------------------------
# Scalar quantization (SQ8): per-dimension affine int8 compression
# ---------------------------------------------------------------------

SQ_LEVELS = 255  # codes 0..255


def _sq_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension quantizer parameters learned from the corpus in
    one scan: (gd, mn, mx, rng) in exact milli-units. 64 rows — always
    broadcast-sized, the SQ 'codebook'."""
    vecs = _vectors(spark, sf_dir)
    comp = vecs.select(F.posexplode("v").alias("gd", "x")).select(
        "gd", _milli(F.col("x")).alias("xq")
    )
    return comp.groupBy("gd").agg(
        F.min("xq").alias("mn"),
        F.max("xq").alias("mx"),
        (F.max("xq") - F.min("xq")).alias("rng"),
    )


def _sq_code() -> F.Column:
    """Half-up affine code in 0..SQ_LEVELS from milli component xq and
    broadcast params (mn, rng); constant-range dims collapse to 0."""
    return F.when(F.col("rng") == 0, F.lit(0)).otherwise(
        F.expr(f"(2 * (xq - mn) * {SQ_LEVELS} + rng) div (2 * rng)")
    )


def sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) top-5: each vector compressed to 64
    affine int8 codes against per-dimension corpus min/max; candidate
    distance is the range-weighted integer code distance
    Σ (Δcode_i · rng_i)² — the exact-integer analogue of dequantized
    L2 (common 1/255² factor dropped; units (milli/255)²).

    Scale: the quantizer is ONE corpus scan reduced to a 64-row
    broadcast table; queries contribute a 20×64-row broadcast code
    table; the corpus is then touched once as codes with the distance
    accumulated by partial aggregation — the flat-scan SQ layout
    (4× memory cut vs float32) that composes with IVF pruning the
    same way pq_topk does. Exact BIGINT math end to end, no float
    summation order to pin."""
    vecs = _vectors(spark, sf_dir)
    params = _sq_params(spark, sf_dir)
    comp = vecs.select("vec_id", F.posexplode("v").alias("gd", "x")).select(
        "vec_id", "gd", _milli(F.col("x")).alias("xq")
    )
    codes = comp.join(F.broadcast(params), "gd").select(
        "vec_id", "gd", "rng", _sq_code().alias("code")
    )
    qcodes = (
        codes.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            "gd",
            F.col("code").alias("qcode"),
        )
    )
    dvec = F.col("code") - F.col("qcode")
    scored = (
        codes.join(F.broadcast(qcodes), "gd")
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum(dvec * dvec * F.col("rng") * F.col("rng")).alias("sq_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("sq_dist", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select(
            "query_id", "rank", F.col("vec_id").alias("neighbor_id"), "sq_dist"
        )
    )


def sq_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension SQ8 quantizer audit: learned min/max (milli), and
    the reconstruction error |255·(x−mn) − code·rng| aggregated exactly
    (avg half-up, max) in 255·milli units — the acceptance metric that
    says which dimensions the 8-bit budget serves poorly. One scan +
    one 64-key aggregate."""
    vecs = _vectors(spark, sf_dir)
    params = _sq_params(spark, sf_dir)
    comp = vecs.select("vec_id", F.posexplode("v").alias("gd", "x")).select(
        "vec_id", "gd", _milli(F.col("x")).alias("xq")
    )
    coded = comp.join(F.broadcast(params), "gd").select(
        "gd",
        "mn",
        "mx",
        "rng",
        F.abs(
            (F.col("xq") - F.col("mn")) * SQ_LEVELS - _sq_code() * F.col("rng")
        ).alias("err"),
    )
    return coded.groupBy("gd", "mn", "mx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.expr("(2 * sum(err) + count(1)) div (2 * count(1))").alias(
            "avg_err_255milli"
        ),
        F.max("err").alias("max_err_255milli"),
    )


def _sq_cte() -> str:
    """Shared oracle CTE: milli components, per-dim params, codes."""
    return f"""
        comp0 AS (
            SELECT vec_id,
                   unnest(range(0, len(embedding))) AS gd,
                   unnest(CAST(embedding AS DOUBLE[])) AS x
            FROM embeddings
        ),
        comp AS (
            SELECT vec_id, CAST(gd AS INTEGER) AS gd,
                   CAST(ROUND(x * 1000) AS BIGINT) AS xq
            FROM comp0
        ),
        params AS (
            SELECT gd, MIN(xq) AS mn, MAX(xq) AS mx,
                   MAX(xq) - MIN(xq) AS rng
            FROM comp GROUP BY gd
        ),
        codes AS (
            SELECT vec_id, comp.gd, rng,
                   CASE WHEN rng = 0 THEN 0
                        ELSE (2 * (xq - mn) * {SQ_LEVELS} + rng)
                             // (2 * rng) END AS code
            FROM comp JOIN params ON comp.gd = params.gd
        )
    """


def _sq_topk_sql() -> str:
    return f"""
        WITH {_sq_cte()},
        qcodes AS (
            SELECT vec_id AS query_id, gd, code AS qcode
            FROM codes WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.query_id, c.vec_id,
                   CAST(SUM((c.code - q.qcode) * (c.code - q.qcode)
                            * c.rng * c.rng) AS BIGINT) AS sq_dist
            FROM codes c JOIN qcodes q ON c.gd = q.gd
            WHERE c.vec_id <> q.query_id
            GROUP BY 1, 2
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank,
               vec_id AS neighbor_id, sq_dist
        FROM (
            SELECT query_id, vec_id, sq_dist,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sq_dist, vec_id
                   ) AS rank
            FROM scored
        ) WHERE rank <= {TOPK}
    """


def _sq_quality_sql() -> str:
    return f"""
        WITH {_sq_cte()}
        SELECT c.gd, p.mn, p.mx,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               (2 * CAST(SUM(abs((xq - p.mn) * {SQ_LEVELS} - code * c.rng))
                         AS BIGINT) + COUNT(*))
                   // (2 * COUNT(*)) AS avg_err_255milli,
               CAST(MAX(abs((xq - p.mn) * {SQ_LEVELS} - code * c.rng))
                    AS BIGINT) AS max_err_255milli
        FROM codes c
        JOIN params p ON c.gd = p.gd
        JOIN comp ON comp.vec_id = c.vec_id AND comp.gd = c.gd
        GROUP BY c.gd, p.mn, p.mx
    """


ORACLES["similarity_sq_topk"] = _sq_topk_sql()
ORACLES["similarity_sq_quality"] = _sq_quality_sql()


# ---------------------------------------------------------------------
# Feature covariance (PCA precursor)
# ---------------------------------------------------------------------

COV_TOP_PAIRS = 30


def covariance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top cross-dimension covariances of the embedding space — the
    Gram-matrix pass PCA/whitening starts from, reported as the
    COV_TOP_PAIRS strongest off-diagonal pairs (redundant or entangled
    feature dimensions; the diagonal lives in embedding_dim_variance).

    Exact integer statistics: components in milli-units, covariance
    numerator n·Σxy − Σx·Σy as BIGINT, one signed half-up division to
    milli² units (the |Δ| re-sign idiom, since div/// truncate toward
    zero in both engines).

    Scale: the second-moment pass never shuffles rows at all — each
    Arrow batch is quantized to exact milli ints IN THE JVM
    (``round(x*1000)::bigint``, the engine-identical quantizer) and
    handed to a ``mapInArrow`` kernel that computes the batch's
    DIM×DIM Gram matrix as ONE numpy int64 matmul plus the per-dim
    component sums (guide §4.2: whole batches into vectorized native
    code); only the 2 080 partial cells per batch move, and the DuckDB
    oracle proves the equivalent vec-aligned self-join gives identical
    cells. Replaced the earlier nested-lambda ``transform`` expansion
    (DIM²/2 struct allocations per row inside one scan task — the
    single-file local layout serialized it; 5.2 s → 0.9 s at sf0.1,
    same exact integers because products/sums are ints in both forms).
    Then a tiny top-K sort (TakeOrderedAndProject).
    """
    import numpy as np
    import pyarrow as pa

    vecs = _vectors(spark, sf_dir)
    # NULL vectors contribute nothing in the explode formulation (and
    # unnest(NULL) yields no oracle rows) — drop them before the
    # kernel so reshape(n, DIM) stays rectangular. The size(v) = DIM
    # leg enforces the rectangularity invariant IN THE JVM (ADVICE
    # r08): a ragged vector from corpus drift now surfaces as a
    # visible row-count mismatch against the oracle instead of a
    # worker-side reshape crash. Element-level NULLs never occur (the
    # corpus generators, incl. the NULL-ramp gate corpora, only null
    # events.value/props and documents.lang).
    quant = vecs.where(
        F.col("v").isNotNull() & (F.size("v") == DIM)
    ).select(
        F.expr("transform(v, x -> cast(round(x * 1000) as bigint))").alias(
            "vq"
        )
    )

    def gram_batches(it):
        iu = np.triu_indices(DIM, k=1)
        dims = np.arange(DIM)
        neg = np.full(DIM, -1)
        for batch in it:
            arr = batch.column(0)
            n = len(arr)
            if n == 0:
                continue
            q = arr.flatten().to_numpy(zero_copy_only=False).reshape(n, DIM)
            g = q.T @ q  # int64 matmul: exact, |cell| ≤ n·maxq² ≪ 2⁶³
            s = q.sum(axis=0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.concatenate([iu[0], dims]).astype("int32")
                    ),
                    pa.array(
                        np.concatenate([iu[1], neg]).astype("int32")
                    ),
                    pa.array(np.concatenate([g[iu], s]).astype("int64")),
                    pa.array(
                        np.concatenate(
                            [np.full(len(iu[0]), n), np.zeros(DIM)]
                        ).astype("int64")
                    ),
                ],
                names=["gd1", "gd2", "xy", "n"],
            )

    cells = quant.mapInArrow(
        gram_batches, "gd1 int, gd2 int, xy long, n long"
    )
    prod = (
        cells.where(F.col("gd2") >= 0)
        .groupBy("gd1", "gd2")
        .agg(
            F.sum("xy").alias("s_xy"),
            F.sum("n").cast("bigint").alias("n"),
        )
    )
    sums = (
        cells.where(F.col("gd2") < 0)
        .groupBy(F.col("gd1").alias("gd"))
        .agg(F.sum("xy").alias("s"))
    )
    cov = (
        prod.join(F.broadcast(sums.select(F.col("gd").alias("gd1"), F.col("s").alias("s1"))), "gd1")
        .join(F.broadcast(sums.select(F.col("gd").alias("gd2"), F.col("s").alias("s2"))), "gd2")
        .select(
            "gd1",
            "gd2",
            F.col("n").alias("n_vecs"),
            "s_xy",
            (F.col("n") * F.col("s_xy") - F.col("s1") * F.col("s2")).alias("num"),
        )
    )
    signed = cov.select(
        "gd1",
        "gd2",
        "n_vecs",
        "s_xy",
        F.expr(
            "CASE WHEN num < 0"
            " THEN -((2 * (-num) + n_vecs * n_vecs) div (2 * n_vecs * n_vecs))"
            " ELSE (2 * num + n_vecs * n_vecs) div (2 * n_vecs * n_vecs) END"
        ).alias("cov_milli2"),
        F.abs("num").alias("_absnum"),
    )
    return (
        signed.orderBy(F.desc("_absnum"), "gd1", "gd2")
        .limit(COV_TOP_PAIRS)
        .drop("_absnum")
    )


ORACLES["embedding_covariance_pairs"] = f"""
    WITH comp0 AS (
        SELECT vec_id,
               unnest(range(0, len(embedding))) AS gd,
               unnest(CAST(embedding AS DOUBLE[])) AS x
        FROM embeddings
    ),
    comp AS (
        SELECT vec_id, CAST(gd AS INTEGER) AS gd,
               CAST(ROUND(x * 1000) AS BIGINT) AS xq
        FROM comp0
    ),
    prod AS (
        SELECT a.gd AS gd1, b.gd AS gd2,
               CAST(SUM(a.xq * b.xq) AS BIGINT) AS s_xy,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM comp a JOIN comp b
          ON a.vec_id = b.vec_id AND a.gd < b.gd
        GROUP BY 1, 2
    ),
    sums AS (
        SELECT gd, CAST(SUM(xq) AS BIGINT) AS s FROM comp GROUP BY gd
    ),
    cov AS (
        SELECT gd1, gd2, n_vecs, s_xy,
               n_vecs * s_xy - s1.s * s2.s AS num
        FROM prod
        JOIN sums s1 ON prod.gd1 = s1.gd
        JOIN sums s2 ON prod.gd2 = s2.gd
    )
    SELECT gd1, gd2, n_vecs, s_xy,
           CASE WHEN num < 0
                THEN -((2 * (-num) + n_vecs * n_vecs)
                       // (2 * n_vecs * n_vecs))
                ELSE (2 * num + n_vecs * n_vecs)
                     // (2 * n_vecs * n_vecs) END AS cov_milli2
    FROM cov
    ORDER BY abs(num) DESC, gd1, gd2
    LIMIT {COV_TOP_PAIRS}
"""


def centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding drift between two corpus snapshots: the L2
    distance between each label's centroid in snapshot A (even vec_id)
    and snapshot B (odd vec_id) — the encoder-regression monitor a
    pipeline runs when a new checkpoint re-embeds the corpus (a large
    centroid shift for one label means that region of the space moved
    and every ANN index over it is stale). The parity split stands in
    for the two snapshot tables; on real data A and B are yesterday's
    and today's embedding runs.

    Exact cross-engine arithmetic: components in integer milli-units,
    per-(label, dim, half) sums as BIGINT (one map-side-combined
    aggregation, 64×|labels| result rows), and the mean difference
    cleared of divisions via t_d = s1A·nB − s1B·nA. t_d² is summed on
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact and
    order-independent — and only the final sqrt/normalize runs in
    double, identically on both engines. One corpus scan, no join, no
    window; the 100 TB cost is the scan.
    """
    vecs = _vectors(spark, sf_dir)
    comp = vecs.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("v").alias("dim", "x"),
    ).select("label", "half", "dim", _milli(F.col("x")).alias("xq"))
    by_dim = comp.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("xq")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("s_a"),
        F.sum(F.when(F.col("half") == 1, F.col("xq")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("s_b"),
        F.sum((F.col("half") == 0).cast("bigint")).cast("bigint").alias("n_a"),
        F.sum((F.col("half") == 1).cast("bigint")).cast("bigint").alias("n_b"),
    )
    t = (F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a")).cast(
        "decimal(19,0)"
    )
    per_label = by_dim.groupBy("label").agg(
        F.sum(t * t).alias("ssq"),
        F.max("n_a").alias("n_vecs_a"),
        F.max("n_b").alias("n_vecs_b"),
    )
    return per_label.where(
        (F.col("n_vecs_a") > 0) & (F.col("n_vecs_b") > 0)
    ).select(
        "label",
        "n_vecs_a",
        "n_vecs_b",
        F.round(
            F.sqrt(F.col("ssq").cast("double"))
            / (
                F.col("n_vecs_a").cast("double")
                * F.col("n_vecs_b").cast("double")
                * F.lit(1000.0)
            ),
            6,
        ).alias("centroid_shift"),
    )


ORACLES["embedding_centroid_drift"] = """
    WITH comp0 AS (
        SELECT label, vec_id % 2 AS half,
               unnest(range(0, len(embedding))) AS dim,
               unnest(CAST(embedding AS DOUBLE[])) AS x
        FROM embeddings
    ),
    by_dim AS (
        SELECT label, dim,
               CAST(COALESCE(SUM(CAST(ROUND(x * 1000) AS BIGINT))
                             FILTER (half = 0), 0) AS BIGINT) AS s_a,
               CAST(COALESCE(SUM(CAST(ROUND(x * 1000) AS BIGINT))
                             FILTER (half = 1), 0) AS BIGINT) AS s_b,
               CAST(COUNT(*) FILTER (half = 0) AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (half = 1) AS BIGINT) AS n_b
        FROM comp0 GROUP BY 1, 2
    ),
    per_label AS (
        SELECT label,
               SUM(CAST(s_a * n_b - s_b * n_a AS HUGEINT)
                   * CAST(s_a * n_b - s_b * n_a AS HUGEINT)) AS ssq,
               MAX(n_a) AS n_vecs_a,
               MAX(n_b) AS n_vecs_b
        FROM by_dim GROUP BY label
    )
    SELECT label, n_vecs_a, n_vecs_b,
           ROUND(sqrt(CAST(ssq AS DOUBLE))
                 / (CAST(n_vecs_a AS DOUBLE) * CAST(n_vecs_b AS DOUBLE)
                    * 1000.0), 6) AS centroid_shift
    FROM per_label
    WHERE n_vecs_a > 0 AND n_vecs_b > 0
"""


# ---------------------------------------------------------------------
# Binary quantization (BQ): 1 bit/dim sign codes + Hamming candidates
# ---------------------------------------------------------------------

BQ_WORD_BITS = 32  # dims per packed word (BIGINT-safe, always positive)
BQ_WORDS = DIM // BQ_WORD_BITS
BQ_CANDIDATES = 20  # Hamming short-list size before exact rerank


def _bq_word_spark(w: int) -> F.Column:
    """Packed sign word w: bit i set iff milli(v[32w+i]) >= 0. The
    aggregate-over-sequence form stays one codegen'd expression (the
    unrolled 32-term sum was measured slower — see _milli note)."""
    off = w * BQ_WORD_BITS
    return F.expr(
        f"aggregate(sequence(0, {BQ_WORD_BITS - 1}), 0L, (acc, i) -> "
        f"acc + IF(CAST(ROUND(element_at(v, i + {off + 1}) * 1000) AS BIGINT)"
        f" >= 0, shiftleft(1L, i), 0L))"
    )


def _bq_word_sql(w: int) -> str:
    off = w * BQ_WORD_BITS
    return (
        f"list_sum(list_transform(range(0, {BQ_WORD_BITS}), i -> "
        f"CASE WHEN CAST(ROUND(v[i + {off + 1}] * 1000) AS BIGINT) >= 0 "
        f"THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END))"
    )


def bq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized top-5: each vector compressed to DIM sign bits
    (1 bit/dim, packed 32 dims per BIGINT word — 8 bytes total vs 256
    for float32, the most aggressive quantization tier below SQ8/PQ),
    candidates short-listed by Hamming distance (bit_count of XOR, two
    word ops per comparison), then the short-list ONLY reranked by
    exact cosine.

    Scale: the corpus is touched once to build the 2-word code table
    (at 100 TB of vectors that table is ~0.4% of corpus bytes and the
    Hamming scan is SIMD bit-math — the memory-bandwidth-optimal first
    pass every vector database runs); the rerank joins the 20×20
    candidate ids back to full vectors, touching only |queries|·C rows.
    Sign bits are taken on exact integer milli-units so both engines
    agree at the 0-boundary; Hamming and ranks are exact integers, and
    only the final rerank cosine is float (sequential-sum, identical
    in both engines — the similarity_topk contract)."""
    vecs = _vectors(spark, sf_dir)
    codes = vecs.select(
        "vec_id",
        *[_bq_word_spark(w).alias(f"w{w}") for w in range(BQ_WORDS)],
    )
    qcodes = codes.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"w{w}").alias(f"q{w}") for w in range(BQ_WORDS)],
    )
    ham = sum(
        F.bit_count(F.expr(f"w{w} ^ q{w}"))
        for w in range(BQ_WORDS)
    ).alias("hamming")
    cand_w = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    cands = (
        codes.crossJoin(F.broadcast(qcodes))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", ham)
        .withColumn("crank", F.row_number().over(cand_w))
        .where(F.col("crank") <= BQ_CANDIDATES)
    )
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    rer_w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        cands.join(vecs.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "vec_id",
            "hamming",
            _cos(F.col("q"), F.col("v")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(rer_w))
        .where(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("hamming").cast("int").alias("hamming"),
            F.round("cos", 6).alias("cos_sim"),
        )
    )


ORACLES["similarity_bq_topk"] = f"""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    codes AS (
        SELECT vec_id,
               {", ".join(f"{_bq_word_sql(w)} AS w{w}" for w in range(BQ_WORDS))}
        FROM vecs
    ),
    qcodes AS (
        SELECT vec_id AS query_id,
               {", ".join(f"w{w} AS q{w}" for w in range(BQ_WORDS))}
        FROM codes WHERE vec_id < {N_QUERIES}
    ),
    cands AS (
        SELECT query_id, vec_id, hamming,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY hamming, vec_id
               ) AS crank
        FROM (
            SELECT q.query_id, c.vec_id,
                   {" + ".join(
                       f"bit_count(xor(c.w{w}, q.q{w}))"
                       for w in range(BQ_WORDS)
                   )} AS hamming
            FROM codes c CROSS JOIN qcodes q
            WHERE c.vec_id <> q.query_id
        )
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
           CAST(hamming AS INTEGER) AS hamming, ROUND(cos, 6) AS cos_sim
    FROM (
        SELECT ca.query_id, ca.vec_id AS neighbor_id, ca.hamming,
               list_cosine_similarity(qv.v, cv.v) AS cos,
               row_number() OVER (
                   PARTITION BY ca.query_id
                   ORDER BY list_cosine_similarity(qv.v, cv.v) DESC,
                            ca.vec_id
               ) AS rank
        FROM cands ca
        JOIN vecs cv ON cv.vec_id = ca.vec_id
        JOIN vecs qv ON qv.vec_id = ca.query_id
        WHERE ca.crank <= {BQ_CANDIDATES}
    ) WHERE rank <= {TOPK}
"""


# ---------------------------------------------------------------------
# Matryoshka (MRL) prefix-dimension recall
# ---------------------------------------------------------------------

MRL_DIM = 16  # prefix dims used for the cheap first-stage search


def matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of top-k search on the first MRL_DIM of DIM dimensions
    vs full-dimension exact top-k — the acceptance metric for
    Matryoshka-style truncation, where a prefix of the embedding is
    itself a valid lower-dim embedding and the index stores only that
    prefix (4× memory cut at MRL_DIM=16/64 before any quantization).

    Both stages are broadcast-queries × one corpus scan; at 100 TB the
    prefix pass reads MRL_DIM/DIM of the vector bytes (column pruning
    does NOT help inside an array, which is exactly why a real MRL
    layout stores the prefix as its own column/file — this operator is
    the audit that says whether that layout change pays). Per-query
    output joins the two 5-row top-k sets; recall is half-up exact
    2-decimal division (the ann_recall contract)."""
    vecs = _vectors(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )

    def _topk(score_col: F.Column) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            score_col.desc(), F.col("vec_id")
        )
        return (
            vecs.crossJoin(F.broadcast(queries))
            .where(F.col("vec_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= TOPK)
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
        )

    exact = _topk(_cos(F.col("q"), F.col("v")))
    prefix = _topk(
        _cos(F.slice(F.col("q"), 1, MRL_DIM), F.slice(F.col("v"), 1, MRL_DIM))
    )
    return (
        exact.alias("e")
        .join(
            prefix.alias("p"),
            (F.col("e.query_id") == F.col("p.query_id"))
            & (F.col("e.neighbor_id") == F.col("p.neighbor_id")),
            "left",
        )
        .groupBy(F.col("e.query_id").alias("query_id"))
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(
                F.when(F.col("p.neighbor_id").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_hits"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hits",
            (
                F.expr("(2 * n_hits * 100 + n_exact) div (2 * n_exact)")
                / 100.0
            ).alias("recall"),
        )
    )


ORACLES["similarity_matryoshka_recall"] = f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(
                                    q.qv, CAST(e.embedding AS DOUBLE[])) DESC,
                                e.vec_id
                   ) AS rank
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
        ) WHERE rank <= {TOPK}
    ),
    approx AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(
                                    q.qv[1:{MRL_DIM}],
                                    CAST(e.embedding AS DOUBLE[])[1:{MRL_DIM}]
                                ) DESC,
                                e.vec_id
                   ) AS rank
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
        ) WHERE rank <= {TOPK}
    )
    SELECT e.query_id,
           COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           ((2 * CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT) * 100
             + COUNT(*)) // (2 * COUNT(*))) / 100.0 AS recall
    FROM exact e
    LEFT JOIN approx a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
"""


# ---------------------------------------------------------------------
# Power-iteration PCA (top principal component)
# ---------------------------------------------------------------------

PCA_DIMS = 16  # leading dims the component is fit over
PCA_ROUNDS = 3  # fixed matvec rounds (oracle unrolls the same)


def power_iteration_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance by fixed-
    round power iteration, entirely declarative — the whitening/
    compression prep that tells a pipeline which direction dominates
    its embedding space (a runaway top eigenvalue means the encoder
    collapsed and every cosine similarity is measuring one feature).

    Exactness: components in integer milli-units; the covariance
    NUMERATOR M_ij = n·Σx_i x_j − s_i s_j is exact (scaling by the
    common n² denominator doesn't move the eigenvector); each round is
    w = M·v in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — products
    reach ~1e19, past int64 — renormalized to v' = half-away(1e6·w /
    max|w|). Fixed v0 = 1e6·1 and identical arithmetic make the sign
    and every intermediate bit-equal across engines; the oracle
    unrolls the same PCA_ROUNDS CTE stages. λ is the exact Rayleigh
    quotient vᵀMv/vᵀv on the final v (same M scale).

    Scale: ONE corpus scan builds the PCA_DIMS²-row moment matrix
    (map-side combinable: Σx_i x_j per (i,j) key); every round after
    that is a join of two ≤PCA_DIMS²-row frames — corpus size only
    touches the first aggregate, exactly MLlib's computeSVD shape.
    Rounds are localCheckpoint-ed so plan depth stays constant."""
    vecs = _vectors(spark, sf_dir)
    comp = (
        vecs.select("vec_id", F.posexplode("v").alias("gd", "x"))
        .where(F.col("gd") < PCA_DIMS)
        .select("vec_id", "gd", _milli(F.col("x")).alias("xq"))
        .persist()
    )
    nn = comp.agg(
        (F.count_distinct("vec_id")).cast("bigint").alias("n")
    )
    sums = comp.groupBy("gd").agg(F.sum("xq").cast("bigint").alias("s"))
    prod = (
        comp.alias("a")
        .join(comp.alias("b"), "vec_id")
        .groupBy(
            F.col("a.gd").alias("gd1"), F.col("b.gd").alias("gd2")
        )
        .agg(F.sum(F.col("a.xq") * F.col("b.xq")).cast("bigint").alias("sxy"))
    )
    m = (
        prod.join(
            F.broadcast(sums.select(F.col("gd").alias("gd1"), F.col("s").alias("s1"))),
            "gd1",
        )
        .join(
            F.broadcast(sums.select(F.col("gd").alias("gd2"), F.col("s").alias("s2"))),
            "gd2",
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "gd1",
            "gd2",
            (
                F.col("n").cast("decimal(38,0)") * F.col("sxy").cast("decimal(38,0)")
                - F.col("s1").cast("decimal(38,0)") * F.col("s2").cast("decimal(38,0)")
            ).alias("m"),
        )
        .localCheckpoint()
    )
    v = spark.range(PCA_DIMS).select(
        F.col("id").cast("int").alias("gd"),
        F.lit(1_000_000).cast("bigint").alias("v"),
    )
    # mx = 0 means the moment matrix is identically zero (n = 1: every
    # n·sxy − s·s cancels) — the iterate collapses to the zero vector
    # instead of ANSI-crashing on the renormalizing division (r08
    # single-row sweep)
    half_away = (
        "CASE WHEN mx = 0 THEN cast(0 as bigint)"
        " WHEN w < 0 THEN"
        " -cast((2 * (-w) * 1000000 + mx) div (2 * mx) as bigint)"
        " ELSE cast((2 * w * 1000000 + mx) div (2 * mx) as bigint) END"
    )
    for _ in range(PCA_ROUNDS):
        w = (
            m.join(v.select(F.col("gd").alias("gd2"), "v"), "gd2")
            .groupBy("gd1")
            .agg(F.sum(F.col("m") * F.col("v")).alias("w"))
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("mx"))
        v = (
            w.crossJoin(F.broadcast(mx))
            .select(
                F.col("gd1").alias("gd"), F.expr(half_away).alias("v")
            )
            .localCheckpoint()
        )
    w_final = (
        m.join(v.select(F.col("gd").alias("gd2"), "v"), "gd2")
        .groupBy("gd1")
        .agg(F.sum(F.col("m") * F.col("v")).alias("w"))
    )
    ray = (
        w_final.join(v.select(F.col("gd").alias("gd1"), "v"), "gd1")
        .agg(
            F.sum(F.col("v").cast("decimal(38,0)") * F.col("w")).alias("num"),
            F.sum(
                F.col("v").cast("decimal(38,0)") * F.col("v").cast("decimal(38,0)")
            ).alias("den"),
        )
        .select(
            F.expr(
                "CASE WHEN den = 0 THEN cast(0 as bigint)"
                " WHEN num < 0 THEN"
                " -cast((2 * (-num) + den) div (2 * den) as bigint)"
                " ELSE cast((2 * num + den) div (2 * den) as bigint) END"
            ).alias("lambda_scaled")
        )
    )
    return v.crossJoin(F.broadcast(ray)).select(
        "gd", F.col("v").alias("loading_micro"), "lambda_scaled"
    )


def _power_iteration_sql() -> str:
    half_away = (
        "CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)"
        " WHEN w < 0 THEN"
        " -CAST((2 * (-w) * 1000000 + mx) // (2 * mx) AS BIGINT)"
        " ELSE CAST((2 * w * 1000000 + mx) // (2 * mx) AS BIGINT) END"
    )
    stages = []
    prev = "r0"
    for i in range(1, PCA_ROUNDS + 1):
        stages.append(
            f"""w{i} AS (
        SELECT m.gd1 AS gd, CAST(SUM(m.m * p.v) AS HUGEINT) AS w
        FROM m JOIN {prev} p ON p.gd = m.gd2
        GROUP BY m.gd1
    ),
    r{i} AS (
        SELECT gd, {half_away} AS v
        FROM w{i} CROSS JOIN (SELECT MAX(abs(w)) AS mx FROM w{i})
    )"""
        )
        prev = f"r{i}"
    chained = ",\n    ".join(stages)
    return f"""
    WITH comp0 AS (
        SELECT vec_id,
               unnest(range(0, len(embedding))) AS gd,
               unnest(CAST(embedding AS DOUBLE[])) AS x
        FROM embeddings
    ),
    comp AS (
        SELECT vec_id, CAST(gd AS INTEGER) AS gd,
               CAST(ROUND(x * 1000) AS BIGINT) AS xq
        FROM comp0 WHERE gd < {PCA_DIMS}
    ),
    nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM comp),
    sums AS (
        SELECT gd, CAST(SUM(xq) AS BIGINT) AS s FROM comp GROUP BY gd
    ),
    prod AS (
        SELECT a.gd AS gd1, b.gd AS gd2,
               CAST(SUM(a.xq * b.xq) AS BIGINT) AS sxy
        FROM comp a JOIN comp b USING (vec_id)
        GROUP BY 1, 2
    ),
    m AS (
        SELECT gd1, gd2,
               CAST(n AS HUGEINT) * sxy
               - CAST(s1.s AS HUGEINT) * s2.s AS m
        FROM prod
        JOIN sums s1 ON s1.gd = prod.gd1
        JOIN sums s2 ON s2.gd = prod.gd2
        CROSS JOIN nn
    ),
    r0 AS (
        SELECT CAST(g.gd AS INTEGER) AS gd, CAST(1000000 AS BIGINT) AS v
        FROM (SELECT unnest(range({PCA_DIMS})) AS gd) g
    ),
    {chained},
    wf AS (
        SELECT m.gd1 AS gd, CAST(SUM(m.m * p.v) AS HUGEINT) AS w
        FROM m JOIN r{PCA_ROUNDS} p ON p.gd = m.gd2
        GROUP BY m.gd1
    ),
    ray AS (
        SELECT CASE WHEN den = 0 THEN CAST(0 AS BIGINT)
               WHEN num < 0 THEN
                   -CAST((2 * (-num) + den) // (2 * den) AS BIGINT)
               ELSE CAST((2 * num + den) // (2 * den) AS BIGINT) END
                   AS lambda_scaled
        FROM (
            SELECT CAST(SUM(CAST(p.v AS HUGEINT) * w.w) AS HUGEINT) AS num,
                   CAST(SUM(CAST(p.v AS HUGEINT) * p.v) AS HUGEINT) AS den
            FROM wf w JOIN r{PCA_ROUNDS} p USING (gd)
        )
    )
    SELECT p.gd, p.v AS loading_micro, ray.lambda_scaled
    FROM r{PCA_ROUNDS} p CROSS JOIN ray
    """


ORACLES["embedding_power_iteration"] = _power_iteration_sql()


# ---------------------------------------------------------------------
# Cross-method recall sweep
# ---------------------------------------------------------------------

_SWEEP_METHODS = (
    "lsh",
    "ivf",
    "pq",
    "ivf_pq",
    "ivfpq_res",
    "sq",
    "bq",
    "mrl",
)


def recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One acceptance dashboard for the whole ANN stack: recall@5 of
    every index strategy (hyperplane LSH, IVF, PQ, IVF-PQ, residual
    IVF-PQ, SQ8, 1-bit BQ, Matryoshka prefix) against the same exact
    top-k — the table an
    engineer reads to pick the memory/recall point before a 100 TB
    index build. Each method's candidate pipeline is the SAME builder
    the standalone query uses (shared persisted code tables and
    centroids are materialized once per session), so this is a cheap
    union over already-cached frames plus one exact baseline.

    The aggregate recall is micro-exact: hits and the |queries|·k
    denominator are integers; per-method rows are independent, so the
    plan is a union of bounded per-method joins against the broadcast
    5·|queries|-row exact set."""
    exact = topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")

    def pairs(df: DataFrame) -> DataFrame:
        return df.select("query_id", "neighbor_id")

    approx = {
        "lsh": pairs(lsh_topk(spark, sf_dir)),
        "ivf": pairs(ivf_topk(spark, sf_dir)),
        "pq": pairs(pq_topk(spark, sf_dir)),
        "ivf_pq": pairs(ivf_pq_topk(spark, sf_dir)),
        "ivfpq_res": pairs(ivfpq_residual_topk(spark, sf_dir)),
        "sq": pairs(sq_topk(spark, sf_dir)),
        "bq": pairs(bq_topk(spark, sf_dir)),
        "mrl": _mrl_prefix_pairs(spark, sf_dir),
    }
    frames = []
    for method in _SWEEP_METHODS:
        a = approx[method]
        frames.append(
            exact.alias("e")
            .join(
                a.alias("a"),
                (F.col("e.query_id") == F.col("a.query_id"))
                & (F.col("e.neighbor_id") == F.col("a.neighbor_id")),
                "left",
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_exact_pairs"),
                F.sum(
                    F.when(F.col("a.neighbor_id").isNotNull(), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("n_hits"),
            )
            .select(
                F.lit(method).alias("method"),
                "n_exact_pairs",
                "n_hits",
                F.expr(
                    "(2 * n_hits * 1000000 + n_exact_pairs)"
                    " div (2 * n_exact_pairs)"
                ).alias("recall_micro"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _mrl_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dim top-k pairs (the matryoshka_recall approx side)."""
    vecs = _vectors(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    score = _cos(
        F.slice(F.col("q"), 1, MRL_DIM), F.slice(F.col("v"), 1, MRL_DIM)
    )
    w = Window.partitionBy("query_id").orderBy(score.desc(), F.col("vec_id"))
    return (
        vecs.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )


def _recall_sweep_sql() -> str:
    method_sub = {
        "lsh": ORACLES["similarity_lsh_topk"],
        "ivf": ORACLES["similarity_ivf_topk"],
        "pq": ORACLES["similarity_pq_topk"],
        "ivf_pq": ORACLES["similarity_ivf_pq_topk"],
        **(
            {"ivfpq_res": ORACLES["similarity_ivfpq_residual_topk"]}
            if "similarity_ivfpq_residual_topk" in ORACLES
            else {}
        ),
        "sq": ORACLES["similarity_sq_topk"],
        "bq": ORACLES["similarity_bq_topk"],
        "mrl": f"""
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < {N_QUERIES}
            )
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(
                                        q.qv[1:{MRL_DIM}],
                                        CAST(e.embedding AS DOUBLE[])[1:{MRL_DIM}]
                                    ) DESC,
                                    e.vec_id
                       ) AS rank
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> q.query_id
            ) WHERE rank <= {TOPK}
        """,
    }
    # the residual IVF-PQ oracle is defined LATER in this module; the
    # first module-load call builds the sweep without it and the
    # re-assignment after that definition folds it in
    selects = []
    for method in _SWEEP_METHODS:
        if method not in method_sub:
            continue
        selects.append(
            f"""
    SELECT '{method}' AS method,
           CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST((2 * SUM(CASE WHEN a.neighbor_id IS NOT NULL
                              THEN 1 ELSE 0 END) * 1000000 + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS recall_micro
    FROM ({ORACLES["similarity_topk"]}) e
    LEFT JOIN ({method_sub[method]}) a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id"""
        )
    return "\nUNION ALL\n".join(selects)


ORACLES["similarity_recall_sweep"] = _recall_sweep_sql()


def label_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit via neighborhood consensus: a vector whose
    LSH-bucket neighbors mostly carry a DIFFERENT label is a suspected
    mislabel — the standard cheap screen before training on weak
    labels. Blocking on the shared hyperplane signature means the
    "neighborhood" is the bucket, so agreement needs NO pairwise join
    at all: for a vector with label L in a bucket holding c_L
    same-label and t total vectors, its neighbor agreement is exactly
    (c_L−1)/(t−1). Per label we report micro-averaged agreement
    (Σ c·(c−1) / Σ c·(t−1), exact integers), the audited count
    (bucket size ≥ 2), and the suspect count (strict minority in the
    bucket).

    Plan: one scan → (signature, label) aggregate (the only shuffle,
    ≤ 2^N_PLANES·|labels| rows) → broadcast signature totals back →
    |labels|-row report. Corpus growth only widens the first
    aggregate; add planes to keep buckets tight at scale."""
    vecs = _vectors(spark, sf_dir)
    per = (
        vecs.select("label", _signature(F.col("v")).alias("sig"))
        .groupBy("sig", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = per.groupBy("sig").agg(F.sum("c").cast("bigint").alias("t"))
    audited = F.col("t") >= 2
    suspect = audited & (2 * (F.col("c") - 1) < F.col("t") - 1)
    return (
        per.join(F.broadcast(tot), "sig")
        .groupBy("label")
        .agg(
            F.sum("c").cast("bigint").alias("n_vectors"),
            F.sum(F.when(audited, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_audited"),
            F.sum(F.when(suspect, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_suspect"),
            F.sum(F.when(audited, F.col("c") * (F.col("c") - 1)).otherwise(0))
            .cast("bigint")
            .alias("agree_num"),
            F.sum(F.when(audited, F.col("c") * (F.col("t") - 1)).otherwise(0))
            .cast("bigint")
            .alias("agree_den"),
        )
        .select(
            "label",
            "n_vectors",
            "n_audited",
            "n_suspect",
            F.expr(
                "case when agree_den = 0 then null else"
                " (2 * agree_num * 1000000 + agree_den)"
                " div (2 * agree_den) / 1000000.0D end"
            ).alias("agreement"),
        )
    )


ORACLES["embedding_label_consensus"] = f"""
    WITH per AS (
        SELECT {_SIG_SQL} AS sig, label, CAST(COUNT(*) AS BIGINT) AS c
        FROM embeddings
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT sig, CAST(SUM(c) AS BIGINT) AS t FROM per GROUP BY sig
    )
    SELECT label,
           CAST(SUM(c) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN t >= 2 THEN c ELSE 0 END) AS BIGINT)
               AS n_audited,
           CAST(SUM(CASE WHEN t >= 2 AND 2 * (c - 1) < t - 1
                         THEN c ELSE 0 END) AS BIGINT) AS n_suspect,
           CASE WHEN CAST(SUM(CASE WHEN t >= 2 THEN c * (t - 1)
                                   ELSE 0 END) AS BIGINT) = 0 THEN NULL
                ELSE (2 * CAST(SUM(CASE WHEN t >= 2 THEN c * (c - 1)
                                        ELSE 0 END) AS BIGINT) * 1000000
                      + CAST(SUM(CASE WHEN t >= 2 THEN c * (t - 1)
                                      ELSE 0 END) AS BIGINT))
                     // (2 * CAST(SUM(CASE WHEN t >= 2 THEN c * (t - 1)
                                          ELSE 0 END) AS BIGINT))
                     / 1000000.0 END AS agreement
    FROM per JOIN tot USING (sig)
    GROUP BY label
"""


# NDCG@TOPK discount table: 1/log2(rank+1) in half-up micro-units.
# Rank is bounded by TOPK, so the irrational discounts become a tiny
# LITERAL table both engines share verbatim — the only way a
# log-weighted ranking metric can hash-match across engines (libm log2
# is not guaranteed bit-identical between JVM and DuckDB).
_NDCG_DISC_MICRO = tuple(
    round(1_000_000 / math.log2(r + 1)) for r in range(1, TOPK + 1)
)
# ideal DCG: the exact top-TOPK in perfect order, gain TOPK+1-rank
_NDCG_IDCG_MICRO = sum(
    (TOPK - i) * d for i, d in enumerate(_NDCG_DISC_MICRO)
)


def ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k of the IVF-PQ ranking against the exact cosine ranking —
    the graded-relevance acceptance metric that recall@k cannot
    express: returning the true #1 neighbor at rank 5 and at rank 1
    are the same recall but very different NDCG. Relevance of an
    approx result is derived from the exact list (gain TOPK+1-r for
    the true rank-r neighbor, 0 for a non-top-k impostor), discounted
    by the literal micro-unit 1/log2(rank+1) table, so DCG/IDCG stay
    exact BIGINT arithmetic end-to-end.

    Plan: both sides are the memoized k·N_QUERIES-row frames the
    acceptance stack already shares; the eval is one broadcast join of
    two bounded frames + a N_QUERIES-row aggregate. At 100 TB only
    the (already-audited) index pipelines grow; the metric stays
    query-set-sized."""
    exact = topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("exact_rank")
    )
    approx = ivf_pq_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("approx_rank")
    )
    disc = F.element_at(
        F.array(*[F.lit(d) for d in _NDCG_DISC_MICRO]), F.col("approx_rank")
    )
    gain = F.coalesce(
        F.lit(TOPK + 1) - F.col("exact_rank"), F.lit(0)
    ).cast("bigint")
    return (
        approx.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .select("query_id", (gain * disc).alias("gd"), "exact_rank")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("exact_rank").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rel_hits"),
            F.sum("gd").cast("bigint").alias("dcg_micro"),
        )
        .select(
            "query_id",
            "n_rel_hits",
            "dcg_micro",
            (
                F.expr(
                    f"(2 * dcg_micro * 1000000 + {_NDCG_IDCG_MICRO})"
                    f" div (2 * {_NDCG_IDCG_MICRO})"
                )
                / F.lit(1e6)
            ).alias("ndcg"),
        )
    )


def _ndcg_sql() -> str:
    disc_case = " ".join(
        f"WHEN {r} THEN {d}"
        for r, d in enumerate(_NDCG_DISC_MICRO, start=1)
    )
    return f"""
    WITH exact AS ({ORACLES["similarity_topk"]}),
    approx AS ({ORACLES["similarity_ivf_pq_topk"]})
    SELECT a.query_id,
           CAST(SUM(CASE WHEN e.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_hits,
           CAST(SUM(COALESCE({TOPK} + 1 - e.rank, 0)
                    * CASE a.rank {disc_case} END) AS BIGINT) AS dcg_micro,
           ((2 * CAST(SUM(COALESCE({TOPK} + 1 - e.rank, 0)
                          * CASE a.rank {disc_case} END) AS BIGINT)
             * 1000000 + {_NDCG_IDCG_MICRO})
            // (2 * {_NDCG_IDCG_MICRO})) / 1000000.0 AS ndcg
    FROM approx a
    LEFT JOIN exact e
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY a.query_id
"""


ORACLES["retrieval_ndcg_eval"] = _ndcg_sql()


# reciprocal-rank table in exact half-up micro-units — like the NDCG
# discount table, a literal both engines share verbatim
_RR_MICRO = tuple(
    (2 * 1_000_000 + r) // (2 * r) for r in range(1, TOPK + 1)
)


def mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the FIRST relevant result in the IVF-PQ
    list, relevance = membership in the exact cosine top-k — the
    "how soon does the user see something right" acceptance metric
    that recall@k (order-blind) and NDCG (whole-list) both blur.
    rr = 1/rank as a literal half-up micro-unit table (rank ≤ TOPK,
    shared verbatim with the oracle), 0 when nothing relevant
    surfaces, so the driver-graded values are exact integer
    arithmetic end-to-end.

    The reciprocal is a literal CASE over first_rank, NOT
    ``element_at(array_literal, first_rank)``: on this Spark build,
    element_at over a foldable array with a runtime-NULL index
    returns the LAST element instead of NULL (verified:
    ``element_at(array(10,20,30), null_col)`` → 30), which silently
    awarded every recall miss the rank-TOPK reciprocal. The CASE
    form is also what the oracle runs, verbatim.

    Plan: both sides are the memoized query-set-sized top-k frames
    the acceptance stack shares; the eval is one equi-join + a
    per-query min + one broadcast left join back onto the query
    list."""
    exact = topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    approx = ivf_pq_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", "rank"
    )
    hits = (
        approx.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.min("rank").cast("bigint").alias("first_rank"))
    )
    rr_case = " ".join(
        f"WHEN {r} THEN {d}" for r, d in enumerate(_RR_MICRO, start=1)
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            "first_rank",
            F.expr(
                f"coalesce(CASE first_rank {rr_case} END, 0) / 1000000.0D"
            ).alias("reciprocal_rank"),
        )
    )


def _mrr_sql() -> str:
    rr_case = " ".join(
        f"WHEN {r} THEN {d}" for r, d in enumerate(_RR_MICRO, start=1)
    )
    return f"""
    WITH exact AS ({ORACLES["similarity_topk"]}),
    approx AS ({ORACLES["similarity_ivf_pq_topk"]}),
    hits AS (
        SELECT a.query_id, CAST(MIN(a.rank) AS BIGINT) AS first_rank
        FROM approx a
        JOIN exact e
            ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY a.query_id
    )
    SELECT q.query_id, h.first_rank,
           COALESCE(CASE h.first_rank {rr_case} END, 0) / 1000000.0
               AS reciprocal_rank
    FROM (SELECT DISTINCT query_id FROM exact) q
    LEFT JOIN hits h USING (query_id)
"""


ORACLES["retrieval_mrr_eval"] = _mrr_sql()


# ---------------------------------------------------------------------
# Residual IVF-PQ: the production Faiss IVFPQ layout. The plain
# ivf_pq_topk PQ-encodes RAW vectors, so one global codebook must cover
# the whole space; real IVFPQ encodes the RESIDUAL (vector − its cell
# centroid), which re-centers every inverted list at the origin and
# lets the same codebook spend its 4 bits/subspace on local detail —
# the reason Faiss trains PQ on residuals by default. Same exact-
# integer discipline as the PQ stack: components and centroids in
# milli-units, every distance a BIGINT, doubles only at the boundary.
# ---------------------------------------------------------------------


def _cell_comp_milli(cents: DataFrame) -> DataFrame:
    """(cell_id, gd, ccq): IVF centroid components in exact milli-units
    — NLIST×DIM rows, always broadcast-sized."""
    return cents.select(
        "cell_id", F.posexplode("c").alias("gd", "cx")
    ).select("cell_id", "gd", _milli(F.col("cx")).alias("ccq"))


def ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ top-5 (the Faiss IVFPQ layout): corpus vectors
    are PQ-encoded as residuals against their assigned cell centroid,
    and each query builds one ADC table PER PROBED CELL from its own
    residual in that cell — N_QUERIES × NPROBE × PQ_M × PQ_K exact-
    integer entries, still broadcast-sized.

    Plan shape matches ivf_pq_topk: one broadcast-centroid assignment
    scan, candidate set bounded by cell occupancy via the broadcast
    probe join, candidates read as codes only. The one extra join key
    is cell_id on the ADC lookup (a query's distance table differs per
    cell because its residual does). All arithmetic is BIGINT milli²
    so both engines agree bit-for-bit."""
    vecs = _vectors(spark, sf_dir)
    cents = _ivf_cells(vecs)
    nearest_cells = _nearest_cells_fn(cents)
    assigned = nearest_cells(vecs, "vec_id", "v", 1).select("vec_id", "cell_id")
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    probes = nearest_cells(queries, "query_id", "q", NPROBE).select(
        "query_id", "cell_id"
    )
    cellcomp = _cell_comp_milli(cents)
    comp = vecs.select(
        "vec_id", F.posexplode("v").alias("gd", "x")
    ).select("vec_id", "gd", _milli(F.col("x")).alias("xq"))
    book = spark.createDataFrame(
        _pq_centroid_rows(), "gd INT, m INT, k INT, cq LONG"
    )
    # corpus residual codes: residual = milli(x) − milli(centroid), per
    # the vector's own cell (per-list residuals, exactly as Faiss)
    rcomp = (
        comp.join(assigned, "vec_id")
        .join(F.broadcast(cellcomp), ["cell_id", "gd"])
        .select("vec_id", "cell_id", "gd", (F.col("xq") - F.col("ccq")).alias("rq"))
    )
    rdiff = F.col("rq") - F.col("cq")
    rdists = (
        rcomp.join(F.broadcast(book), "gd")
        .groupBy("vec_id", "cell_id", "m", "k")
        .agg(F.sum(rdiff * rdiff).alias("dist"))
    )
    wcode = Window.partitionBy("vec_id", "m").orderBy("dist", "k")
    rcodes = (
        rdists.withColumn("rn", F.row_number().over(wcode))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell_id", "m", (F.col("k") + 1).alias("code"))
    )
    # per-(query, probed cell) ADC table from the query's residual in
    # THAT cell — the residual layout's one structural difference
    qrcomp = (
        comp.join(
            probes.withColumnRenamed("query_id", "vec_id"), "vec_id"
        )
        .join(F.broadcast(cellcomp), ["cell_id", "gd"])
        .select(
            F.col("vec_id").alias("query_id"),
            "cell_id",
            "gd",
            (F.col("xq") - F.col("ccq")).alias("rq"),
        )
    )
    qtab = (
        qrcomp.join(F.broadcast(book), "gd")
        .groupBy("query_id", "cell_id", "m", F.col("k").alias("code"))
        .agg(F.sum(rdiff * rdiff).alias("qdist"))
        .withColumn("code", F.col("code") + 1)
    )
    candidates = (
        assigned.join(F.broadcast(probes), "cell_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "cell_id", "vec_id")
    )
    scored = (
        # candidate frame is corpus-proportional — no broadcast hint
        # (same reasoning as ivf_pq_topk); the ADC table stays hinted
        rcodes.drop("cell_id")
        .join(candidates, "vec_id")
        .join(F.broadcast(qtab), ["query_id", "cell_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qdist").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round(F.col("adc") / F.lit(1_000_000.0), 6).alias("approx_dist"),
        )
    )


ORACLES["similarity_ivfpq_residual_topk"] = f"""
    WITH comp0 AS (
        SELECT vec_id,
               unnest(range(0, len(embedding))) AS gd,
               unnest(CAST(embedding AS DOUBLE[])) AS x
        FROM embeddings
    ),
    comp AS (
        SELECT vec_id, CAST(gd AS INTEGER) AS gd,
               CAST(ROUND(x * 1000) AS BIGINT) AS xq
        FROM comp0
    ),
    book(gd, m, k, cq) AS (VALUES {_pq_cents_values_sql()}),
    v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cells AS (
        SELECT vec_id AS cell_id, v AS c FROM v
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + NLIST}
    ),
    assigned AS (
        SELECT vec_id, cell_id FROM (
            SELECT v.vec_id, c.cell_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_cosine_similarity(v.v, c.c) DESC,
                                c.cell_id) AS rn
            FROM v CROSS JOIN cells c
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, cell_id FROM (
            SELECT v.vec_id AS query_id, c.cell_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_cosine_similarity(v.v, c.c) DESC,
                                c.cell_id) AS rn
            FROM v CROSS JOIN cells c WHERE v.vec_id < {N_QUERIES}
        ) WHERE rn <= {NPROBE}
    ),
    cellcomp AS (
        SELECT cell_id, CAST(gd AS INTEGER) AS gd,
               CAST(ROUND(x * 1000) AS BIGINT) AS ccq
        FROM (
            SELECT cell_id,
                   unnest(range(0, len(c))) AS gd,
                   unnest(c) AS x
            FROM cells
        )
    ),
    rcomp AS (
        SELECT comp.vec_id, a.cell_id, comp.gd, comp.xq - cc.ccq AS rq
        FROM comp
        JOIN assigned a USING (vec_id)
        JOIN cellcomp cc ON cc.cell_id = a.cell_id AND cc.gd = comp.gd
    ),
    rdists AS (
        SELECT vec_id, cell_id, m, k,
               SUM((rq - cq) * (rq - cq)) AS dist
        FROM rcomp JOIN book USING (gd)
        GROUP BY 1, 2, 3, 4
    ),
    rcodes AS (
        SELECT vec_id, cell_id, m, k + 1 AS code FROM (
            SELECT vec_id, cell_id, m, k,
                   row_number() OVER (
                       PARTITION BY vec_id, m ORDER BY dist, k) AS rn
            FROM rdists
        ) WHERE rn = 1
    ),
    qrcomp AS (
        SELECT p.query_id, p.cell_id, comp.gd, comp.xq - cc.ccq AS rq
        FROM comp
        JOIN probes p ON p.query_id = comp.vec_id
        JOIN cellcomp cc ON cc.cell_id = p.cell_id AND cc.gd = comp.gd
    ),
    qtab AS (
        SELECT query_id, cell_id, m, k + 1 AS code,
               SUM((rq - cq) * (rq - cq)) AS qdist
        FROM qrcomp JOIN book USING (gd)
        GROUP BY 1, 2, 3, 4
    ),
    cand AS (
        SELECT p.query_id, a.vec_id, a.cell_id
        FROM assigned a JOIN probes p USING (cell_id)
        WHERE a.vec_id <> p.query_id
    ),
    scored AS (
        SELECT cand.query_id, rc.vec_id AS neighbor_id, SUM(q.qdist) AS adc
        FROM cand
        JOIN rcodes rc ON rc.vec_id = cand.vec_id
        JOIN qtab q ON q.query_id = cand.query_id
                   AND q.cell_id = cand.cell_id
                   AND q.m = rc.m AND q.code = rc.code
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, neighbor_id, adc,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
           ROUND(adc / 1000000.0, 6) AS approx_dist
    FROM ranked WHERE rank <= {TOPK}
"""


# ---------------------------------------------------------------------
# Johnson-Lindenstrauss projection audit: project every embedding to
# JL_K dims with a deterministic ±1 sign matrix (Achlioptas/database-
# friendly JL — no Gaussians needed) and measure how well squared norms
# survive: ratio = ‖y‖²/(K·‖x‖²), expected 1. This is the acceptance
# metric for replacing 64-dim distance work with a 16-dim sketch in
# coarse filtering/blocking at 100 TB — if the per-label ratio spread
# is tight, the projection is safe; if not, JL_K is too small. All
# arithmetic is exact BIGINT milli-units: the projection is a per-row
# integer fold (no shuffle before the label rollup).
# ---------------------------------------------------------------------

JL_K = 16  # projected dimensions


def jl_sign(j: int, d: int) -> int:
    """Deterministic ±1 sign for projected dim j, input dim d — same
    cross-engine h60 family as hyperplane/pq_centroid."""
    return 1 if _h60_py(f"jl:{j}:{d}") % 2 == 0 else -1


def jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label JL norm-distortion report: n_vecs plus the mean / min /
    max of the exact per-vector ratio ‖y‖²/(JL_K·‖x‖²) in micro-units
    (half-up). Plan: one corpus scan — components quantized to exact
    milli ints in the JVM, then a ``mapInArrow`` kernel computes each
    batch's projections as ONE numpy int64 matmul against the
    JL_K×DIM ±1 sign matrix (built once per task) and emits only
    (label, sx2, sy2) — then a |labels|-key aggregate. Replaced the
    earlier JL_K-fold zip_with expression tree (16 array folds per
    row made analysis+codegen the dominant cost: 3.4 s for 2 M
    multiply-adds at sf0.1; same exact integers, since projections
    and norms are int sums in both forms — guide §4.2)."""
    import numpy as np
    import pyarrow as pa

    vecs = _vectors(spark, sf_dir)
    vq = F.transform(F.col("v"), lambda x: _milli(x))
    # NULL-vector + size(v) = DIM guard: same rationale as
    # covariance_pairs above (rectangular reshape enforced in the JVM)
    df = vecs.where(
        F.col("v").isNotNull() & (F.size("v") == DIM)
    ).select("label", vq.alias("vq"))

    def jl_batches(it):
        signs = np.array(
            [[jl_sign(j, d) for d in range(DIM)] for j in range(JL_K)],
            dtype="int64",
        )
        for batch in it:
            labels = batch.column(0)
            arr = batch.column(1)
            n = len(arr)
            if n == 0:
                continue
            q = arr.flatten().to_numpy(zero_copy_only=False).reshape(n, DIM)
            y = q @ signs.T  # (n, JL_K) exact int64
            yield pa.RecordBatch.from_arrays(
                [
                    labels,
                    pa.array((q * q).sum(axis=1).astype("int64")),
                    pa.array((y * y).sum(axis=1).astype("int64")),
                ],
                names=["label", "sx2", "sy2"],
            )

    per_vec = df.mapInArrow(
        jl_batches, "label int, sx2 long, sy2 long"
    ).where(F.col("sx2") > 0)
    ratio_micro = F.expr(
        f"(2 * 1000000 * sy2 + {JL_K} * sx2) div (2 * {JL_K} * sx2)"
    )
    return (
        per_vec.select("label", ratio_micro.alias("r_micro"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (
                F.expr("(2 * sum(r_micro) + count(1)) div (2 * count(1))")
                / F.lit(1e6)
            ).alias("avg_ratio"),
            (F.min("r_micro") / F.lit(1e6)).alias("min_ratio"),
            (F.max("r_micro") / F.lit(1e6)).alias("max_ratio"),
        )
    )


def _jl_signs_values_sql() -> str:
    return ", ".join(
        f"({j}, {d}, {jl_sign(j, d)})"
        for j in range(JL_K)
        for d in range(DIM)
    )


# relational twin: order-free integer sums, so the oracle need not
# mirror the fold-based plan shape — only the values
ORACLES["embedding_jl_distortion"] = f"""
    WITH comp0 AS (
        SELECT vec_id, label,
               unnest(range(0, len(embedding))) AS gd,
               unnest(CAST(embedding AS DOUBLE[])) AS x
        FROM embeddings
    ),
    comp AS (
        SELECT vec_id, label, CAST(gd AS INTEGER) AS gd,
               CAST(ROUND(x * 1000) AS BIGINT) AS xq
        FROM comp0
    ),
    signs(j, gd, s) AS (VALUES {_jl_signs_values_sql()}),
    proj AS (
        SELECT vec_id, label, j, SUM(s * xq) AS y
        FROM comp JOIN signs USING (gd)
        GROUP BY 1, 2, 3
    ),
    norms AS (
        SELECT vec_id, label, SUM(xq * xq) AS sx2
        FROM comp GROUP BY 1, 2
    ),
    pnorm AS (
        SELECT vec_id, SUM(y * y) AS sy2 FROM proj GROUP BY 1
    ),
    ratio AS (
        SELECT n.label,
               (2 * 1000000 * p.sy2 + {JL_K} * n.sx2)
                   // (2 * {JL_K} * n.sx2) AS r_micro
        FROM norms n JOIN pnorm p USING (vec_id)
        WHERE n.sx2 > 0
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           ((2 * SUM(r_micro) + COUNT(*)) // (2 * COUNT(*))) / 1000000.0
               AS avg_ratio,
           MIN(r_micro) / 1000000.0 AS min_ratio,
           MAX(r_micro) / 1000000.0 AS max_ratio
    FROM ratio GROUP BY label
"""


# rebuild the recall sweep now that the residual IVF-PQ oracle exists —
# the first build at its definition site ran before this section loaded
ORACLES["similarity_recall_sweep"] = _recall_sweep_sql()


# ---------------------------------------------------------------------
# Per-session top-k memo: the acceptance stack (ann_recall, the
# matryoshka report, recall_sweep) and the standalone index queries all
# evaluate the same small per-method top-k frames; memoizing the
# persisted result per (application, sf_dir) makes each pipeline run
# ONCE per session instead of once per consumer (the recall sweep alone
# re-paid all seven). Same lifetime rules as dedup._LABELS_MEMO.
# ---------------------------------------------------------------------

_TOPK_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def _session_memo(name: str):
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            key = (spark.sparkContext.applicationId, sf_dir, name)
            if key not in _TOPK_MEMO:
                for k in [k for k in _TOPK_MEMO if k[0] != key[0]]:
                    del _TOPK_MEMO[k]
                _TOPK_MEMO[key] = fn(spark, sf_dir).persist()
            return _TOPK_MEMO[key]

        return wrapped

    return deco


topk_bruteforce = _session_memo("exact")(topk_bruteforce)
lsh_topk = _session_memo("lsh")(lsh_topk)
ivf_topk = _session_memo("ivf")(ivf_topk)
pq_topk = _session_memo("pq")(pq_topk)
ivf_pq_topk = _session_memo("ivf_pq")(ivf_pq_topk)
ivfpq_residual_topk = _session_memo("ivfpq_res")(ivfpq_residual_topk)
sq_topk = _session_memo("sq")(sq_topk)
bq_topk = _session_memo("bq")(bq_topk)
_mrl_prefix_pairs = _session_memo("mrl_pairs")(_mrl_prefix_pairs)


def cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster label purity of the trained Lloyd clustering: for
    each k-means cell, the vector count, distinct labels present, the
    majority label (ties broken toward the smallest label id), and the
    majority share in exact micro — the clustering-quality report read
    against a supervised label column before trusting the cells for
    SemDeDup or IVF routing.

    Scale: consumes the memoized per-session Lloyd assignment (one
    training per session, shared with kmeans_clusters/dedup_semantic),
    joins labels on vec_id, and reduces to (cluster, label) cells; the
    majority pick is a window PARTITIONED by cluster over ≤|labels|
    cell rows."""
    assign = kmeans_assignments(spark, sf_dir).select("vec_id", "cluster_id")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("bigint").alias("label")
    )
    cell = (
        assign.join(emb, "vec_id")
        .groupBy("cluster_id", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n").desc(), "label"
    )
    top = (
        cell.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("label").alias("top_label"),
            F.col("n").alias("top_n"),
        )
    )
    per = cell.groupBy("cluster_id").agg(
        F.sum("n").cast("bigint").alias("n_vecs"),
        F.count(F.lit(1)).cast("bigint").alias("n_labels"),
    )
    return (
        per.join(top, "cluster_id")
        .select(
            "cluster_id",
            "n_vecs",
            "n_labels",
            "top_label",
            "top_n",
            F.expr(
                "(2 * top_n * 1000000 + n_vecs) div (2 * n_vecs)"
            ).alias("purity_micro"),
        )
        .orderBy("cluster_id")
    )


ORACLES["similarity_cluster_purity"] = (
    "WITH "
    + kmeans_assign_cte_sql(materialized=True).removeprefix("WITH ")
    + """,
    cell AS (
        SELECT a.cluster_id, CAST(e.label AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM assign a JOIN embeddings e USING (vec_id)
        GROUP BY a.cluster_id, e.label
    ),
    top AS (
        SELECT cluster_id, label AS top_label, n AS top_n FROM (
            SELECT cluster_id, label, n,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY n DESC, label) AS rn
            FROM cell) WHERE rn = 1
    ),
    per AS (
        SELECT cluster_id, CAST(SUM(n) AS BIGINT) AS n_vecs,
               CAST(COUNT(*) AS BIGINT) AS n_labels
        FROM cell GROUP BY cluster_id
    )
    SELECT p.cluster_id, p.n_vecs, p.n_labels, t.top_label, t.top_n,
           CAST((2 * t.top_n * 1000000 + p.n_vecs) // (2 * p.n_vecs)
                AS BIGINT) AS purity_micro
    FROM per p JOIN top t USING (cluster_id)
    ORDER BY p.cluster_id
"""
)


def dim_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(label, dimension) mean vs the global per-dimension mean —
    the embedding-drift companion to ``embedding_dim_variance``: a
    label cohort whose mean has moved off the global mean in a few
    dimensions is the signature of encoder drift or a poisoned slice.

    Exactness: 6-decimal-rounded components summed in DECIMAL (the
    dim_variance recipe), then the displayed means are EXACT signed
    half-away micro-unit integers — the first cut displayed
    ROUND(double_mean, 6) and hit the documented cross-engine ROUND
    boundary at sf0.1 (Spark rounds BigDecimal's shortest repr, DuckDB
    the raw double); integer division cannot. Two map-side-combinable
    groupBys on the exploded frame, joined on the ≤DIM-row global
    frame."""
    vecs = _vectors(spark, sf_dir)
    exploded = vecs.select(
        F.col("label").cast("bigint").alias("label"),
        F.posexplode("v").alias("dim", "x"),
    )
    v6 = F.round("x", 6).cast("decimal(18,6)")
    per = exploded.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(v6).alias("s1"),
    )
    glob = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(v6).alias("g1"),
    )

    def mean_micro(s: str, n: str) -> str:
        # signed half-away micro mean of an exact DECIMAL(·,6) sum:
        # S = s·1e6 is integral by construction
        return (
            f"case when {s} >= 0"
            f" then (2 * cast({s} * 1000000 as decimal(38,0)) + {n})"
            f" div (2 * {n})"
            f" else -((-2 * cast({s} * 1000000 as decimal(38,0)) + {n})"
            f" div (2 * {n})) end"
        )

    ml = mean_micro("s1", "n_vecs")
    mg = mean_micro("g1", "n_all")
    return (
        per.join(glob, "dim")
        .select(
            "label",
            "dim",
            "n_vecs",
            F.expr(f"cast({ml} as bigint)").alias("_ml"),
            F.expr(f"cast({mg} as bigint)").alias("_mg"),
        )
        .select(
            "label",
            "dim",
            "n_vecs",
            (F.col("_ml") / F.lit(1e6)).alias("mean_label"),
            (F.col("_mg") / F.lit(1e6)).alias("mean_global"),
            ((F.col("_ml") - F.col("_mg")) / F.lit(1e6)).alias("mean_shift"),
        )
        .orderBy("label", "dim")
    )


def _mean_shift_mm_sql(s: str, n: str) -> str:
    return f"""CASE WHEN {s} >= 0
               THEN (2 * CAST({s} * 1000000 AS HUGEINT) + {n})
                    // (2 * {n})
               ELSE -((-2 * CAST({s} * 1000000 AS HUGEINT) + {n})
                      // (2 * {n})) END"""


ORACLES["embedding_dim_mean_shift"] = f"""
    WITH ex AS (
        SELECT CAST(label AS BIGINT) AS label,
               unnest(range(0, len(embedding))) AS dim,
               unnest(CAST(embedding AS DOUBLE[])) AS x
        FROM embeddings
    ),
    per AS (
        SELECT label, CAST(dim AS INTEGER) AS dim,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS s1
        FROM ex GROUP BY 1, 2
    ),
    gdim AS (
        SELECT CAST(dim AS INTEGER) AS dim,
               CAST(COUNT(*) AS BIGINT) AS n_all,
               SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS g1
        FROM ex GROUP BY 1
    ),
    micro AS (
        SELECT p.label, p.dim, p.n_vecs,
               CAST({_mean_shift_mm_sql('p.s1', 'p.n_vecs')} AS BIGINT)
                   AS ml,
               CAST({_mean_shift_mm_sql('g.g1', 'g.n_all')} AS BIGINT)
                   AS mg
        FROM per p JOIN gdim g USING (dim)
    )
    SELECT label, dim, n_vecs,
           ml / 1e6 AS mean_label,
           mg / 1e6 AS mean_global,
           (ml - mg) / 1e6 AS mean_shift
    FROM micro ORDER BY label, dim
"""


QUERIES = {
    # round-7 entries first: registry order = driver grading order
    "similarity_cluster_purity": cluster_purity,
    "embedding_dim_mean_shift": dim_mean_shift,
    # new-in-round-4 entries
    "similarity_ivfpq_residual_topk": ivfpq_residual_topk,
    "embedding_jl_distortion": jl_distortion,
    "retrieval_mrr_eval": mrr_eval,
    "embedding_label_consensus": label_consensus,
    "retrieval_ndcg_eval": ndcg_eval,
    "similarity_recall_sweep": recall_sweep,
    "embedding_power_iteration": power_iteration_pca,
    "similarity_bq_topk": bq_topk,
    "similarity_matryoshka_recall": matryoshka_recall,
    "embedding_centroid_drift": centroid_drift,
    "similarity_range_search": range_search,
    "similarity_diverse_topk": diverse_topk,
    "similarity_sq_topk": sq_topk,
    "similarity_sq_quality": sq_quality,
    "embedding_covariance_pairs": covariance_pairs,
    # new-in-round-3 entries next
    "similarity_ivf_occupancy": ivf_cell_occupancy,
    "similarity_ivf_pq_topk": ivf_pq_topk,
    "similarity_pq_codes": pq_codes,
    "similarity_pq_topk": pq_topk,
    "similarity_pq_reconstruction": pq_reconstruction_error,
    "similarity_ann_recall": ann_recall_report,
    "embedding_dim_variance": dim_variance,
    "similarity_topk": topk_bruteforce,
    "similarity_ivf_topk": ivf_topk,
    "similarity_lsh_signature": lsh_signature,
    "similarity_lsh_topk": lsh_topk,
    "embedding_norm_stats": embedding_norm_stats,
    "kmeans_clusters": kmeans_clusters,
    "embedding_outliers": embedding_outliers,
}
