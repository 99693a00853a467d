"""Plan-level Kafka connectivity assertions (S1/S2/S7/S8).

No Kafka connector jar ships in this container, so the reader/sink
cannot run end-to-end here; these tests pin the OPTION ASSEMBLY so the
cluster-only paths cannot silently drift from the reference's consumer
and producer configs (SURVEY §2.1: subscribe topic, auto.offset.reset
semantics via startingOffsets, snappy/acks=all producer —
keyword_republisher.py:48-57, main.py:269-278).
"""

from __future__ import annotations

from cdc_pipeline_with_kafka_spark.sources import cdc
from cdc_pipeline_with_kafka_spark.streaming import sinks


class _FakeStreamReader:
    """Captures the DataStreamReader fluent calls read_cdc_kafka makes."""

    def __init__(self):
        self.fmt = None
        self.options: dict[str, str] = {}
        self.loaded = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self):
        self.loaded = True
        return self


class _FakeSpark:
    def __init__(self):
        self.readStream = _FakeStreamReader()


def test_kafka_reader_option_assembly_latest():
    fake = _FakeSpark()
    out = cdc.read_cdc_kafka(fake, "broker1:9092,broker2:9092", "articles.cdc")
    r = fake.readStream
    assert out is r and r.loaded
    assert r.fmt == "kafka"
    assert r.options == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "articles.cdc",
        "startingOffsets": "latest",  # keyword path: auto.offset.reset=latest
        "failOnDataLoss": "false",
    }


def test_kafka_reader_option_assembly_earliest():
    fake = _FakeSpark()
    cdc.read_cdc_kafka(fake, "b:9092", "articles.cdc", starting_offsets="earliest")
    # sync path: auto.offset.reset=earliest (SyncService replays from 0)
    assert fake.readStream.options["startingOffsets"] == "earliest"


def test_kafka_sink_producer_options():
    opts = sinks.kafka_sink_options("keywords.out")
    assert opts == {
        "topic": "keywords.out",
        "kafka.compression.type": "snappy",
        "kafka.acks": "all",
        "kafka.linger.ms": "10",
        "kafka.batch.size": "16384",
    }
