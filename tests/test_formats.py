"""Interchange-format round-trips (sources/formats.py): value-exact
CSV/JSON/ORC export→import, corrupt-record capture, and parquet
schema evolution."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_2021_spark_streaming_spark.sources import formats
from big_data_2021_spark_streaming_spark.sources.batch import load_table

ORDERS_DDL = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"
)


def _orders_sample(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 97 == 0
    )


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(cols[0]).collect()]


def test_csv_round_trip_is_value_exact(spark, sf_dir, tmp_path):
    src = _orders_sample(spark, sf_dir)
    path = str(tmp_path / "orders_csv")
    formats.write_csv(src, path)
    back = formats.read_csv(
        spark, path, ORDERS_DDL + f", {formats.CORRUPT_COL} STRING"
    )
    cols = [c for c in src.columns]
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)
    # corrupt-only projections are disallowed on raw CSV scans
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — keep a data column referenced
    assert back.where(F.col(formats.CORRUPT_COL).isNotNull()).collect() == []


def test_jsonl_round_trip_is_value_exact(spark, sf_dir, tmp_path):
    src = _orders_sample(spark, sf_dir)
    path = str(tmp_path / "orders_jsonl")
    formats.write_jsonl(src, path)
    back = formats.read_jsonl(
        spark, path, ORDERS_DDL + f", {formats.CORRUPT_COL} STRING"
    )
    cols = [c for c in src.columns]
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_orc_round_trip_preserves_schema_and_values(spark, sf_dir, tmp_path):
    src = _orders_sample(spark, sf_dir)
    path = str(tmp_path / "orders_orc")
    formats.write_orc(src, path)
    back = formats.read_orc(spark, path)
    assert dict(back.dtypes) == dict(src.dtypes)
    cols = [c for c in src.columns]
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_csv_corrupt_rows_are_captured_not_fatal(spark, tmp_path):
    # hand-write a CSV with one malformed row: PERMISSIVE must load the
    # good rows and surface the bad one in _corrupt
    d = tmp_path / "bad_csv"
    d.mkdir()
    (d / "part-0.csv").write_text(
        "k,price\n1,10.5\nnot_a_number_row_with,too,many,cols\n3,7.25\n"
    )
    df = formats.read_csv(
        spark, str(d), f"k BIGINT, price DOUBLE, {formats.CORRUPT_COL} STRING"
    )
    rows = df.collect()
    good = [r for r in rows if r[formats.CORRUPT_COL] is None]
    bad = [r for r in rows if r[formats.CORRUPT_COL] is not None]
    assert {r.k for r in good} == {1, 3}
    assert len(bad) == 1 and "too" in bad[0][formats.CORRUPT_COL]


def test_parquet_schema_evolution_union(spark, sf_dir, tmp_path):
    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    src = _orders_sample(spark, sf_dir)
    src.select("o_orderkey", "o_totalprice").write.parquet(v1)
    src.select(
        "o_orderkey", "o_totalprice", F.lit("eu").alias("region_code")
    ).write.parquet(v2)
    merged = formats.read_parquet_evolved(spark, v1, v2)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "region_code"}
    n = src.count()
    assert merged.count() == 2 * n
    # old shard surfaces the evolved column as NULL
    assert merged.where(F.col("region_code").isNull()).count() == n


def test_avro_round_trip_when_module_present(spark, sf_dir, tmp_path):
    """Avro is an EXTERNAL Spark module (spark-avro); this sandbox
    ships only the core avro jars, so the round-trip runs wherever the
    module exists and documents the gate where it doesn't — the same
    contract as the Kafka-broker e2e."""
    import pytest

    if not formats.avro_available(spark):
        pytest.skip("spark-avro data-source module not on the classpath")
    src = _orders_sample(spark, sf_dir)
    path = str(tmp_path / "orders_avro")
    formats.write_avro(src, path)
    back = formats.read_avro(spark, path, ORDERS_DDL)
    cols = list(src.columns)
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)
