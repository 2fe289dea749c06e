"""Interchange-format IO: CSV / JSON-lines / ORC round-trips and
parquet schema evolution — the ingest/export edges of the engine.

The reference's only sources are Kafka and console
(``srapk_structure_streaming.py:12-16,173-187``); batch interchange is
a north-star extension (SURVEY.md §7.4). Design rules, all
100 TB-posture:

- **Schema-on-read, never inferSchema.** Explicit DDL on every read —
  inference is a second full pass over the data and type-unstable
  across shards.
- **PERMISSIVE + corrupt-record capture** for text formats: a bad row
  lands in ``_corrupt`` instead of failing the 1000-executor job
  (same contract as the rsvp_decode_failures lineage).
- **Splittable compression defaults** (ORC/parquet columnar; CSV/JSON
  ship gzip per-file only because test fixtures are single files — at
  scale prefer many moderate files over one giant gzip, which is
  unsplittable and serializes the scan).
- **mergeSchema only at the evolution boundary**: schema union is a
  footer-only operation, but it is O(#files) on the driver — resolve
  a table's canonical schema once, then read with it pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt"


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).option(
        "compression", "gzip"
    ).csv(path)


def read_csv(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    """Schema-pinned CSV read with corrupt-row capture. ``ddl`` must
    include ``_corrupt STRING`` for PERMISSIVE capture to surface."""
    return (
        spark.read.schema(ddl)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("compression", "gzip").json(path)


def read_jsonl(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    return (
        spark.read.schema(ddl)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("compression", "zlib").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC is self-describing columnar — no DDL needed, pushdown works
    return spark.read.orc(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Union-schema read across parquet shards written under different
    schema versions: added columns appear as NULL in older shards.
    Footer-merge only — no data pass."""
    return spark.read.option("mergeSchema", True).parquet(*paths)


def avro_available(spark: SparkSession) -> bool:
    """True when the external ``spark-avro`` data-source module is on
    the classpath. Avro is Spark's standard row-oriented interchange
    format (Kafka schema-registry payloads, streaming handoffs), but
    it ships as an EXTERNAL module (``org.apache.spark:spark-avro``)
    — the core avro jars alone don't register the source, and this
    sandbox has only those, so the Avro path is environment-gated the
    same way the Kafka broker e2e is."""
    import shutil
    import tempfile

    # the avro classes can be present without the source being
    # REGISTERED, so probe the actual lookup path with a 1-row write
    d = tempfile.mkdtemp(prefix="avro_probe_")
    try:
        spark.range(1).write.mode("overwrite").format("avro").save(f"{d}/p")
        return True
    except Exception as e:
        if "Failed to find data source" in str(e):
            return False
        raise
    finally:
        shutil.rmtree(d, ignore_errors=True)


def write_avro(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").format("avro").save(path)


def read_avro(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    # schema pinned like every other read — avro files are
    # self-describing, but reader-schema evolution must be explicit
    return spark.read.schema(ddl).format("avro").load(path)
