"""Sequence chunking & context-window packing — the tokenize-adjacent
preprocessing stage of an LLM training pipeline.

``doc_chunking`` slides a fixed token window with overlap across every
document (the long-document split that keeps each training example
inside the context budget); ``doc_packing`` assigns documents to
fixed-token-budget bins by their offset in the concatenated corpus
stream (the concatenate-and-cut packing that keeps context windows
full).

The reference has nothing in this territory (its pipeline is
decode→filter→join→window, ``srapk_structure_streaming.py``); these
are north-star extensions per SURVEY.md §7.4.

Scale posture:
- chunking is a narrow, shuffle-free pass — one corpus scan, a
  bounded ``explode`` (≈ n_tokens/STRIDE rows per doc, linear in
  corpus tokens), every expression JVM-side in whole-stage codegen.
- packing needs a GLOBAL running token count, which a naive
  ``Window.orderBy(doc_id)`` would compute on a single partition —
  the classic 100 TB cliff. Instead it is the two-phase parallel
  prefix scan: per-segment cumulative sums run partitioned (wide and
  parallel), the per-segment totals (one row per ~SEG docs, trivially
  small) take the only global window, and the resulting prefix
  offsets broadcast back. No stage ever holds more than a segment in
  one task.

All outputs are exact-integer (counts, offsets, md5 hex) — no
floating point, so the DuckDB oracle comparison is bit-stable at any
scale factor.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.batch import load_table
from .text import tokens_col, _oracle_tokens

CHUNK = 64  # tokens per training chunk
STRIDE = 48  # window stride (CHUNK - STRIDE = 16 tokens of overlap)
PACK_BUDGET = 2048  # tokens per packed context window
SEG = 1024  # docs per prefix-scan segment


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token windows per document.

    A document with n_tokens ≤ CHUNK yields one chunk; otherwise
    ``1 + ceil((n_tokens - CHUNK)/STRIDE)`` chunks, so the final
    window always reaches the last token (standard sliding-window
    coverage). ``chunk_md5`` hashes the space-rejoined window — the
    stable chunk identity downstream exact-dedup can key on.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    n_chunks = F.when(
        F.col("n_tokens") > CHUNK,
        F.lit(1) + F.expr(f"(n_tokens - {CHUNK} + {STRIDE - 1}) div {STRIDE}"),
    ).otherwise(F.lit(1))
    chunked = base.withColumn("n_chunks", n_chunks).select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
    )
    ctoks = F.slice("toks", F.col("chunk_idx") * STRIDE + 1, CHUNK)
    return chunked.select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * STRIDE).alias("start_tok"),
        F.size(ctoks).alias("n_tok"),
        F.md5(F.array_join(ctoks, " ")).alias("chunk_md5"),
    )


def doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-cut packing: every document joins the bin at
    ``floor(stream_offset / PACK_BUDGET)`` where stream_offset is the
    total token count of all earlier docs (doc_id order). Reported per
    bin: doc/token totals, the id span, and how many member docs
    straddle a bin boundary (the examples a packed-attention mask must
    split).

    The global offset is the two-phase prefix scan described in the
    module docstring — no single-partition window over the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", tokens_col(F.col("text")).alias("t"))
        .select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tokens"),
            F.expr(f"doc_id div {SEG}").alias("seg"),
        )
    )
    w_in = Window.partitionBy("seg").orderBy("doc_id")
    within = toks.withColumn("cum_in_seg", F.sum("n_tokens").over(w_in))
    # one row per segment — the ONLY global-order window runs on this
    # trivially small frame, then broadcasts back. Totals come from the
    # windowed frame (max cumsum per segment), not a second corpus
    # scan: the seg-hash Exchange is then shared (ReusedExchange), so
    # the whole operator tokenizes the corpus exactly once.
    w_seg = Window.orderBy("seg").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        within.groupBy("seg")
        .agg(F.max("cum_in_seg").alias("seg_tokens"))
        .select(
            "seg",
            F.coalesce(F.sum("seg_tokens").over(w_seg), F.lit(0)).alias(
                "seg_prefix"
            ),
        )
    )
    placed = (
        within.join(F.broadcast(prefix), "seg")
        .withColumn(
            "cum_before", F.col("seg_prefix") + F.col("cum_in_seg") - F.col("n_tokens")
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"cum_before div {PACK_BUDGET}").alias("bin_id"),
            (
                F.expr(f"cum_before div {PACK_BUDGET}")
                != F.expr(f"(cum_before + n_tokens - 1) div {PACK_BUDGET}")
            ).alias("straddles"),
        )
    )
    return placed.groupBy("bin_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
        F.sum(F.col("straddles").cast("bigint")).alias("boundary_docs"),
    )


_TOKS = _oracle_tokens()

ORACLES: dict[str, str] = {}

ORACLES["doc_chunking"] = f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n_tokens
        FROM documents
    ),
    nc AS (
        SELECT doc_id, toks,
               CASE WHEN n_tokens > {CHUNK}
                    THEN 1 + (n_tokens - {CHUNK} + {STRIDE - 1}) // {STRIDE}
                    ELSE 1 END AS n_chunks
        FROM base
    ),
    chunks AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
        FROM nc
    )
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(chunk_idx * {STRIDE} AS INTEGER) AS start_tok,
           CAST(len(list_slice(toks, chunk_idx * {STRIDE} + 1,
                               chunk_idx * {STRIDE} + {CHUNK})) AS INTEGER)
               AS n_tok,
           md5(array_to_string(
               list_slice(toks, chunk_idx * {STRIDE} + 1,
                          chunk_idx * {STRIDE} + {CHUNK}), ' ')) AS chunk_md5
    FROM chunks
"""

ORACLES["doc_packing"] = f"""
    WITH toks AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    scanned AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) - n_tokens AS cum_before
        FROM toks
    ),
    placed AS (
        SELECT doc_id, n_tokens,
               cum_before // {PACK_BUDGET} AS bin_id,
               (cum_before // {PACK_BUDGET})
                   <> ((cum_before + n_tokens - 1) // {PACK_BUDGET})
                   AS straddles
        FROM scanned
    )
    SELECT bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc_id,
           MAX(doc_id) AS last_doc_id,
           CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT)
               AS boundary_docs
    FROM placed
    GROUP BY bin_id
"""

QUERIES = {
    "doc_chunking": doc_chunking,
    "doc_packing": doc_packing,
}
