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
    return with_norm.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
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
    cents = vecs.where(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + NLIST)
    ).select(F.col("vec_id").alias("cell_id"), F.col("v").alias("c"))

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

    assigned = nearest_cells(vecs, "vec_id", "v", 1)
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    probes = nearest_cells(queries, "query_id", "q", NPROBE)
    scored = (
        assigned.join(probes, "cell_id")
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
           ROUND(AVG(norm), 6) AS avg_norm,
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

QUERIES = {
    "similarity_topk": topk_bruteforce,
    "similarity_ivf_topk": ivf_topk,
    "similarity_lsh_signature": lsh_signature,
    "similarity_lsh_topk": lsh_topk,
    "embedding_norm_stats": embedding_norm_stats,
}
