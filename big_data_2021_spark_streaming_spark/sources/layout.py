"""Data-layout writers: partitioning, in-file ordering, bucketing.

The reference never touches disk layout (Kafka in, Kafka out), but at
100 TB layout IS the query plan: partition pruning needs directory
partitioning, row-group skipping needs in-file sort, and shuffle-free
joins need bucketing. These writers encode the three techniques; the
bucketed join is pinned by a plan test (no Exchange on either side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style directory partitioning (+ optional in-file sort).

    Partition columns become directories → partition pruning turns a
    full scan into a directory lookup for selective predicates; the
    in-partition sort clusters values so parquet row-group min/max
    stats skip data for range predicates on the sort key.
    """
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows hash-distributed into ``n_buckets``
    files per partition ON WRITE, so a join/aggregation on the bucket
    column needs NO exchange at read time — the shuffle is paid once at
    write instead of once per query. Both join sides must be bucketed
    the same way (same column class, same bucket count).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
