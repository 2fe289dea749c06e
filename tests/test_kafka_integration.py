"""Opt-in Kafka end-to-end test — completes S4/S5 beyond the plan-level
contract when a real broker is available.

Skipped unless ``KAFKA_BOOTSTRAP`` is set (e.g. ``localhost:9092``).
The sandbox has no broker and no spark-sql-kafka connector, so CI here
records the skip; on a host with a broker run:

    KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_integration.py

The session fetches the connector via ``spark.jars.packages`` (needs
network on first run). The test round-trips the RSVP fixture: batch
write to a fresh topic → ``read_kafka_stream`` (the reference's exact
source options, ``srapk_structure_streaming.py:12-16``) → memory sink,
then asserts every envelope value survived byte-for-byte.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import SparkSession

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="opt-in integration test: set KAFKA_BOOTSTRAP=<host:port> "
    "to run against a real broker",
)

SPARK_KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"


@pytest.fixture(scope="module")
def kafka_spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-integration")
        .config("spark.jars.packages", SPARK_KAFKA_PACKAGE)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_kafka_source_sink_roundtrip(kafka_spark, tmp_path):
    from big_data_2021_spark_streaming_spark.plans.rsvp_fixture import (
        _envelope_rows,
    )
    from big_data_2021_spark_streaming_spark.streaming.pipeline import (
        read_kafka_stream,
    )

    topic = f"rsvp-it-{uuid.uuid4().hex[:8]}"
    rows = _envelope_rows()
    (
        kafka_spark.createDataFrame(rows, "value STRING, ts STRING")
        .selectExpr("CAST(value AS BINARY) AS value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    stream = read_kafka_stream(kafka_spark, BOOTSTRAP, topic)
    query = (
        stream.writeStream.format("memory")
        .queryName("kafka_roundtrip")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = {
        r.value for r in kafka_spark.table("kafka_roundtrip").collect()
    }
    assert got == {v for v, _ in rows}
