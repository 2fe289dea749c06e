"""Plan-level Kafka contract tests — no broker, no connector jar.

The sandbox has neither a Kafka broker nor the spark-sql-kafka package,
so the source/sink can't be executed. These tests pin the *contract*
instead, so an option typo or a changed cast can't ship silently:

- the exact option set and envelope casts of ``read_kafka_stream``
  (reference ``srapk_structure_streaming.py:12-16``) via a recording
  fake of the reader API;
- the exact sink wiring of ``to_kafka_sink`` (reference
  ``srapk_structure_streaming.py:181-186``) the same way;
- that against a REAL session the only failure mode is the
  missing-connector AnalysisException (i.e. the format string is
  right and dispatch reaches Spark's data-source lookup).
"""

from __future__ import annotations

import pytest

from big_data_2021_spark_streaming_spark.streaming.pipeline import (
    kafka_reader_options,
    read_kafka_stream,
    to_kafka_sink,
)

HOSTS = "h1:9092,h2:9092,h3:9092"


class RecordingReader:
    def __init__(self):
        self.fmt = None
        self.opts: dict[str, str] = {}
        self.loaded = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        self.loaded = True
        return RecordingFrame()


class RecordingFrame:
    def __init__(self):
        self.select_exprs = None

    def selectExpr(self, *exprs):
        self.select_exprs = exprs
        return self


class FakeSparkSession:
    def __init__(self, reader):
        self._reader = reader

    @property
    def readStream(self):
        return self._reader


class RecordingWriter:
    def __init__(self):
        self.fmt = None
        self.opts: dict[str, str] = {}
        self.mode = None
        self.started = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def outputMode(self, mode):
        self.mode = mode
        return self

    def start(self):
        self.started = True
        return self


class FakeFrame:
    def __init__(self, writer):
        self.writeStream = writer


def test_kafka_reader_options_match_reference():
    # srapk_structure_streaming.py:12-16: bootstrap servers + subscribe;
    # plus our explicit replay/robustness options (documented defaults)
    opts = kafka_reader_options(HOSTS, "all_events")
    assert opts == {
        "kafka.bootstrap.servers": HOSTS,
        "subscribe": "all_events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }


def test_read_kafka_stream_plumbs_format_options_and_casts():
    reader = RecordingReader()
    frame = read_kafka_stream(FakeSparkSession(reader), HOSTS, "all_events")
    assert reader.fmt == "kafka"
    assert reader.loaded
    assert reader.opts == kafka_reader_options(HOSTS, "all_events")
    # the reference's envelope cast-projection (srapk:16), verbatim
    assert frame.select_exprs == (
        "CAST(value AS STRING)",
        "CAST(timestamp AS STRING)",
    )


def test_to_kafka_sink_plumbs_topic_checkpoint_and_mode():
    writer = RecordingWriter()
    to_kafka_sink(
        FakeFrame(writer), HOSTS, "window_1_minute", "/tmp/ckpt", "append"
    )
    assert writer.fmt == "kafka"
    assert writer.started
    assert writer.mode == "append"
    assert writer.opts == {
        "kafka.bootstrap.servers": HOSTS,
        "topic": "window_1_minute",
        "checkpointLocation": "/tmp/ckpt",
    }


def test_read_kafka_stream_reaches_source_lookup_on_real_session(spark):
    """Against a real session the build must either succeed (connector
    on classpath) or fail ONLY with the missing-data-source error —
    anything else (option validation, analysis error) is a bug here."""
    try:
        df = read_kafka_stream(spark, HOSTS, "all_events")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        assert "Failed to find data source: kafka" in msg, msg
        pytest.skip("spark-sql-kafka connector not on classpath (expected)")
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["value", "timestamp"]
