"""Partitioned copy-on-write MERGE writer (SURVEY §7.4b item 3).

``merge_upsert_partitioned_writer`` is the Delta/Iceberg MERGE file
layout on plain parquet: per micro-batch, only the partitions the
batch's keys touch are read back, merged latest-row-per-key, and
swapped. Pins:

- state equivalence: after any batch sequence, the live state equals
  ``upsert_state_batch_writer``'s (the audited full-rewrite form) on
  the same key/order columns;
- copy-on-write really is partial: a batch touching one partition
  leaves every other partition's FILES byte-identical (same paths,
  same bytes) — the partition-pruning-as-ACID-surrogate claim, made
  checkable;
- replay idempotence WITHOUT versioning: latest-per-key is idempotent
  under re-merging the same batch;
- a real availableNow stream drives it end to end.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

from pyspark.sql import functions as F

from big_data_2021_spark_streaming_spark.sources.batch import load_table
from big_data_2021_spark_streaming_spark.streaming.pipeline import (
    merge_upsert_partitioned_writer,
    read_upsert_state,
    upsert_state_batch_writer,
)

SF = "/root/testdata/sf0.001"
PART_EXPR = "user_id % 8"


def _events(spark):
    return load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def _state_rows(df):
    return sorted(
        (int(r["user_id"]), str(r["ts"]), int(r["event_id"]), r["event_type"])
        for r in df.select("user_id", "ts", "event_id", "event_type").collect()
    )


def _file_digests(state_dir: str) -> dict[str, str]:
    return {
        str(p.relative_to(state_dir)): hashlib.md5(p.read_bytes()).hexdigest()
        for p in sorted(Path(state_dir).rglob("*.parquet"))
    }


def test_state_matches_full_rewrite_writer(spark, tmp_path):
    ev = _events(spark)
    b0 = ev.where("event_id % 3 = 0")
    b1 = ev.where("event_id % 3 = 1")
    b2 = ev.where("event_id % 3 = 2")

    cow = str(tmp_path / "cow")
    wc = merge_upsert_partitioned_writer(
        cow, "p", PART_EXPR, ["user_id"], ["ts", "event_id"]
    )
    full = str(tmp_path / "full")
    wf = upsert_state_batch_writer(full, ["user_id"], ["ts", "event_id"])
    for i, b in enumerate((b0, b1, b2)):
        wc(b, i)
        wf(b, i)
    got = _state_rows(spark.read.parquet(f"{cow}/state"))
    want = _state_rows(read_upsert_state(spark, full))
    assert got == want


def test_untouched_partitions_are_byte_identical(spark, tmp_path):
    ev = _events(spark)
    cow = str(tmp_path / "cow")
    w = merge_upsert_partitioned_writer(
        cow, "p", PART_EXPR, ["user_id"], ["ts", "event_id"]
    )
    w(ev, 0)  # seed all 8 partitions
    before = _file_digests(f"{cow}/state")
    # batch 1 touches exactly one partition (user_id % 8 == 3)
    w(ev.where("user_id % 8 = 3").limit(20), 1)
    after = _file_digests(f"{cow}/state")
    untouched_before = {k: v for k, v in before.items() if "p=3" not in k}
    untouched_after = {k: v for k, v in after.items() if "p=3" not in k}
    assert untouched_before == untouched_after  # same files, same bytes
    assert {k for k in before if "p=3" in k} != {
        k for k in after if "p=3" in k
    } or before != after  # the touched partition DID rewrite


def test_replay_is_idempotent_without_versioning(spark, tmp_path):
    ev = _events(spark)
    cow = str(tmp_path / "cow")
    w = merge_upsert_partitioned_writer(
        cow, "p", PART_EXPR, ["user_id"], ["ts", "event_id"]
    )
    w(ev.where("event_id % 2 = 0"), 0)
    w(ev.where("event_id % 2 = 1"), 1)
    before = _state_rows(spark.read.parquet(f"{cow}/state"))
    w(ev.where("event_id % 2 = 1"), 1)  # replay after simulated failure
    assert _state_rows(spark.read.parquet(f"{cow}/state")) == before


def test_real_stream_drives_the_writer(spark, tmp_path):
    from big_data_2021_spark_streaming_spark.streaming.pipeline import (
        to_foreach_batch_sink,
    )

    rows = _events(spark).limit(200).collect()
    src = tmp_path / "merge_src"
    src.mkdir()
    out = str(tmp_path / "merge_out")
    ckpt = str(tmp_path / "merge_ckpt")

    def drain():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        ).json(str(src))
        q = to_foreach_batch_sink(
            stream,
            merge_upsert_partitioned_writer(
                out, "p", PART_EXPR, ["user_id"], ["ts", "event_id"]
            ),
            ckpt,
            available_now=True,
        )
        q.awaitTermination()

    half = len(rows) // 2
    for name, chunk in (("b0.json", rows[:half]), ("b1.json", rows[half:])):
        (src / name).write_text(
            "\n".join(
                json.dumps(
                    {
                        "event_id": r["event_id"],
                        "ts": str(r["ts"]),
                        "user_id": r["user_id"],
                        "event_type": r["event_type"],
                        "value": r["value"],
                    }
                )
                for r in chunk
            )
        )
        drain()

    state = spark.read.parquet(f"{out}/state")
    # one row per user, and it is that user's latest event
    assert state.groupBy("user_id").count().where("count > 1").count() == 0
    latest = (
        spark.createDataFrame(rows)
        .groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id")).alias("m"))
        .select("user_id", F.col("m.event_id").alias("event_id"))
    )
    got = {
        (int(r["user_id"]), int(r["event_id"]))
        for r in state.select("user_id", "event_id").collect()
    }
    want = {
        (int(r["user_id"]), int(r["event_id"])) for r in latest.collect()
    }
    assert got == want


def test_part_expr_contract_rejects_impure_expressions(spark, tmp_path):
    # ADVICE r07: the purity check must catch more than unresolvable
    # column references — a key-independent expression (a literal, or a
    # zero-arg call Catalyst marks deterministic like current_date())
    # resolves against the keys-only projection yet can move a key's
    # partition between batches, stranding stale rows COW never
    # rewrites. The writer now rejects: non-key column refs (resolution
    # failure), nondeterministic expressions, and expressions that
    # reference no key column at all.
    import pytest

    batch = _events(spark).limit(5)

    def attempt(expr):
        w = merge_upsert_partitioned_writer(
            str(tmp_path / "x"), "p", expr, ["user_id"], ["ts", "event_id"]
        )
        w(batch, 0)

    for bad in ("value % 8", "rand()", "current_date()", "42"):
        with pytest.raises(ValueError, match="pure function"):
            attempt(bad)
    # the legitimate key-derived expression still writes
    ok = merge_upsert_partitioned_writer(
        str(tmp_path / "ok"), "p", PART_EXPR, ["user_id"], ["ts", "event_id"]
    )
    ok(batch, 0)
    # latest-per-key: one state row per distinct user in the batch
    want = batch.select("user_id").distinct().count()
    assert spark.read.parquet(str(tmp_path / "ok/state")).count() == want
