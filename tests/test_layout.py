"""Layout-writer tests: partition pruning and shuffle-free bucketed joins.

These pin the two layout properties that ARE the plan at 100 TB: a
selective predicate on a partition column must scan only its directory
(PartitionFilters), and a join of two co-bucketed tables must run with
zero Exchange operators (the shuffle was paid at write time).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_2021_spark_streaming_spark.sources.batch import load_table
from big_data_2021_spark_streaming_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partitioned_write_enables_partition_pruning(spark, tmp_path):
    events = load_table(spark, SF, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, ["event_type"], sort_cols=["ts"])

    one_type = spark.read.parquet(path).where(F.col("event_type") == "click")
    p = plan_of(one_type)
    pf_line = next(line for line in p.splitlines() if "PartitionFilters" in line)
    assert "event_type" in pf_line  # predicate became a directory lookup
    assert one_type.count() > 0


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil
    from pathlib import Path

    # managed-table locations survive the session's in-memory catalog;
    # clear both the catalog entry and any leftover warehouse dir
    warehouse = Path(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"))
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(warehouse / t, ignore_errors=True)
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", 4, sort_col="o_orderkey")
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 4, sort_col="l_orderkey")
    joined = (
        spark.table("orders_b")
        .join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # broadcast would hide the bucketing — force the shuffle-join path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Arguments: hashpartitioning" not in p  # no shuffle on either side
    assert "SortMergeJoin" in p
    assert joined.count() > 0


def test_join_strategy_hints_are_honored(spark):
    """The three shuffle-join strategies are an explicit knob, not
    folklore: a shuffle_hash hint must produce ShuffledHashJoin (the
    right call when one side is much smaller but exceeds the broadcast
    cap — no sort, build-side hash), merge must produce SortMergeJoin
    (the spill-safe default for two large sides), and broadcast must
    eliminate the fact-side Exchange entirely."""
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hashed = li.join(
            orders.hint("shuffle_hash"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert "ShuffledHashJoin" in plan_of(hashed)
        merged = li.join(
            orders.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert "SortMergeJoin" in plan_of(merged)
        bcast = li.join(
            F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey")
        )
        pb = plan_of(bcast)
        assert "BroadcastHashJoin" in pb
        assert "Arguments: hashpartitioning" not in pb
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_runtime_bloom_filter_prunes_fact_scan_on_selective_dim_join(spark):
    """Scale-posture pin: Spark's runtime Bloom-filter injection is ON
    in this engine's sessions, so at warehouse scale a selective dim
    side semi-filters the fact scan before the shuffle. The feature
    self-gates on a 10 GB application-side scan, which local testdata
    never reaches — the test lowers that threshold to prove the
    injection fires, then restores it."""
    from big_data_2021_spark_streaming_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter"
                   ".creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert (
            spark.conf.get(
                "spark.sql.optimizer.runtime.bloomFilter.enabled"
            )
            == "true"
        )
        orders = (
            load_table(spark, sf, "orders")
            .where("o_orderpriority = '1-URGENT'")
            .select("o_orderkey")
        )
        li = load_table(spark, sf, "lineitem")
        plan = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            ._jdf.queryExecution()
            .toString()
        )
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold",
            "10737418240b",
        )
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter"
                       ".creationSideThreshold", "10485760b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
