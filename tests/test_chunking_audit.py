"""Invariants for the round-4 chunking/packing and lake-audit
operators, beyond the oracle hash parity test_oracle_parity already
applies to them.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_2021_spark_streaming_spark.operators import audit, chunking
from big_data_2021_spark_streaming_spark.sources.batch import load_table
from big_data_2021_spark_streaming_spark.operators.text import tokens_col


def test_chunking_covers_every_token_exactly(spark, sf_dir):
    # sliding-window guarantee: chunks tile [0, n_tokens) — the first
    # chunk starts at 0, consecutive starts advance by STRIDE, and the
    # last chunk reaches the final token (start + n_tok == n_tokens)
    chunks = chunking.doc_chunking(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("n_tokens")
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.min("start_tok").alias("first_start"),
            F.max(F.col("start_tok") + F.col("n_tok")).alias("reach"),
            F.count("*").alias("n_chunks"),
            F.max("start_tok").alias("last_start"),
        )
        .join(docs, "doc_id")
    )
    bad = per_doc.filter(
        (F.col("first_start") != 0)
        | (F.col("reach") != F.col("n_tokens"))
        | (F.col("last_start") != (F.col("n_chunks") - 1) * chunking.STRIDE)
    )
    assert bad.count() == 0
    # every full-size chunk carries CHUNK tokens; only the last may be short
    short_not_last = (
        chunks.join(per_doc.select("doc_id", "last_start"), "doc_id")
        .filter(
            (F.col("n_tok") != chunking.CHUNK)
            & (F.col("start_tok") != F.col("last_start"))
        )
        .count()
    )
    assert short_not_last == 0


def test_packing_conserves_docs_and_tokens(spark, sf_dir):
    packed = chunking.doc_packing(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_col(F.col("text"))).cast("bigint").alias("n")
    )
    totals = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("toks")
    ).first()
    expect = docs.agg(F.count("*"), F.sum("n")).first()
    assert totals["docs"] == expect[0]
    assert totals["toks"] == expect[1]
    # bins are a partition of the stream: id spans must not interleave
    rows = sorted(
        packed.select("bin_id", "first_doc_id", "last_doc_id").collect(),
        key=lambda r: r.bin_id,
    )
    for a, b in zip(rows, rows[1:]):
        assert a.last_doc_id < b.first_doc_id
    # every bin but the last must be filled to at least the budget by
    # its members plus the doc straddling out of it (i.e. bins are only
    # opened when the previous budget is consumed)
    assert all(b.bin_id == i for i, b in enumerate(rows))


def test_fk_audit_covers_all_edges_and_is_orphan_consistent(spark, sf_dir):
    out = audit.fk_integrity_audit(spark, sf_dir)
    rows = {r.relationship: r for r in out.collect()}
    assert len(rows) == len(audit.FK_EDGES)
    for r in rows.values():
        assert 0 <= r.orphan_rows <= r.child_rows
        # structural edges of the generated star schema hold by
        # construction; only events.user_id may dangle
        if not r.relationship.startswith("events."):
            assert r.orphan_rows == 0, r.relationship


def test_erasure_audit_lineitem_consistent_with_orders(spark, sf_dir):
    out = {r.table_name: r for r in audit.user_erasure_audit(spark, sf_dir).collect()}
    assert set(out) == {"customer", "events", "lineitem", "orders"}
    # erased lineitem rows must be exactly those of erased orders
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % audit.ERASE_MOD == audit.ERASE_REM
    )
    expect = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    ).count()
    assert out["lineitem"].rows_erased == expect


def test_join_key_skew_shares_and_rank(spark, sf_dir):
    rows = audit.join_key_skew(spark, sf_dir).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(r.cnt <= r.max_cnt for r in rows)
    assert rows[0].cnt == rows[0].max_cnt


def test_audio_frame_plan_matches_pure_python(spark):
    """Recompute the STFT framing plan with unbounded ints, plus the
    framing laws: every non-skipped asset's frames fit inside the
    sample count and adding one more frame would overrun."""
    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.multimodal import (
        AUDIO_HOP,
        AUDIO_WIN,
        multimodal_audio_frame_plan,
    )

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    rates = [16000, 22050, 44100]
    expected = {}
    for _, r in docs.iterrows():
        did = int(r["doc_id"])
        if did % 3 != 1:
            continue
        n = (len(str(r["text"])) * 331) % 480000
        sr = rates[(did // 3) % 3]
        skip = n < AUDIO_WIN
        frames = None if skip else 1 + (n - AUDIO_WIN) // AUDIO_HOP
        cov = (
            None
            if skip
            else (
                (2 * min(n, AUDIO_WIN + (frames - 1) * AUDIO_HOP) * 10**6 + n)
                // (2 * n)
            )
            / 1e6
        )
        dur = (2 * n * 1000 + sr) // (2 * sr)
        expected[did] = (n, sr, frames, cov, dur, skip)
    rows = multimodal_audio_frame_plan(spark, sf).collect()
    got = {
        r.doc_id: (
            r.n_samples,
            r.sample_rate,
            r.n_frames,
            r.coverage,
            r.duration_ms,
            r.skip,
        )
        for r in rows
    }
    assert got == expected
    for n, _, frames, _, _, skip in got.values():
        if not skip:
            assert AUDIO_WIN + (frames - 1) * AUDIO_HOP <= n
            assert AUDIO_WIN + frames * AUDIO_HOP > n


def test_length_bucketing_matches_pure_python(spark):
    """Recompute the bucket routing and exact padding-waste share,
    plus the bucketing laws: caps are the declared power-of-two
    ladder, every doc lands in exactly one bucket, and padded ≥
    in-cap tokens."""
    import re

    import pandas as pd

    from big_data_2021_spark_streaming_spark.operators.chunking import (
        BUCKET_CAPS,
        doc_length_bucketing,
    )

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    agg = {}
    for _, r in docs.iterrows():
        n = len(re.split(r"\s+", str(r["text"]).strip()))
        cap = next((c for c in BUCKET_CAPS if n <= c), BUCKET_CAPS[-1])
        a = agg.setdefault(cap, [0, 0, 0])
        a[0] += 1
        a[1] += n
        a[2] += min(n, cap)
    expected = {}
    for cap, (n_docs, real, in_cap) in agg.items():
        padded = n_docs * cap
        waste = ((2 * (padded - in_cap) * 10**6 + padded) // (2 * padded))
        expected[cap] = (n_docs, real, padded, waste / 1e6)
    rows = doc_length_bucketing(spark, sf).collect()
    got = {
        r.cap: (r.n_docs, r.real_tokens, r.padded_tokens, r.padding_waste)
        for r in rows
    }
    assert got == expected
    assert sum(v[0] for v in got.values()) == len(docs)
    assert set(got) <= set(BUCKET_CAPS)
