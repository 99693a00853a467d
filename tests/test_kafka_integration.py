"""Kafka INTEGRATION tests — the real-broker twin of the file-source
parity suites (test_kafka_options.py, test_republish.py cover the
semantics without a broker; these prove them against one).

Skipped cleanly unless ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` names a
reachable broker (e.g. ``localhost:9092``) — the test container ships
neither a broker nor the spark-sql-kafka connector, so the day an
environment has one, evidence is one env var away instead of new code:

    SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092 \
        python -m pytest tests/test_kafka_integration.py -q

Optional: ``SPARK_GRAFT_KAFKA_PACKAGES`` overrides the connector
coordinates (default spark-sql-kafka-0-10_2.13 matching the installed
pyspark); resolution needs network or a primed ivy cache.

Covers the three claims the file-twin suites pin indirectly:
source options round-trip (S1-S3), sink round-trip with the
reference's producer options (S7/S8), and checkpoint-supersedes-
group-commit recovery (S2/T5: no loss, no duplicates across restart).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="SPARK_GRAFT_KAFKA_BOOTSTRAP not set — Kafka integration "
    "tests run only against a reachable broker",
)


@pytest.fixture(scope="module")
def kspark():
    """A session with the Kafka connector on the classpath.  Built
    fresh (connector jars cannot be added to a running JVM); reuses
    the repo session config otherwise."""
    import pyspark
    from pyspark.sql import SparkSession

    scala = "2.13"
    pkg = os.environ.get(
        "SPARK_GRAFT_KAFKA_PACKAGES",
        f"org.apache.spark:spark-sql-kafka-0-10_{scala}:"
        f"{pyspark.__version__}",
    )
    active = SparkSession.getActiveSession()
    if active is not None:  # connector must be present at JVM start
        active.stop()
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-integration")
        .config("spark.jars.packages", pkg)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def _topic() -> str:
    return f"it-{uuid.uuid4().hex[:12]}"


def _produce(spark, topic: str, payloads: list[tuple[str, str]]) -> None:
    """Batch-write (key, value) pairs through the SAME producer
    options the streaming sinks use (kafka_sink_options parity)."""
    from cdc_pipeline_with_kafka_spark.streaming.sinks import (
        kafka_sink_options,
    )

    df = spark.createDataFrame(payloads, "key string, value string")
    writer = df.write.format("kafka").option(
        "kafka.bootstrap.servers", BOOTSTRAP
    )
    for k, v in kafka_sink_options(topic).items():
        writer = writer.option(k, v)
    writer.save()


def _drain(stream_df, seconds: float = 30.0):
    """availableNow the stream into an in-memory table and return the
    collected rows."""
    name = f"m{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(seconds)
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_cdc_source_round_trip_earliest(kspark):
    """S1-S3: rows produced with the reference's producer options come
    back byte-identical through read_cdc_kafka(earliest), and
    parse_envelope yields the same after-images the file twin does."""
    from cdc_pipeline_with_kafka_spark.sources import cdc

    from .fixtures import make_articles, make_cdc_events

    events = make_cdc_events(make_articles(20))
    topic = _topic()
    _produce(kspark, topic, [(e["key"], e["value"]) for e in events])

    raw = cdc.read_cdc_kafka(kspark, BOOTSTRAP, topic, "earliest").select(
        "key", "value", "timestamp"
    ).selectExpr(
        "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
        "timestamp AS kafka_ts",
    )
    got = _drain(cdc.parse_envelope(raw))
    assert len(got) > 0
    ids = sorted(r["id"] for r in got if r["id"] is not None)
    want_ids = sorted(
        json.loads(e["value"]).get("payload", {}).get("after", {}).get("id")
        for e in events
        if _has_after(e)
    )
    assert ids == [i for i in want_ids if i is not None]


def _has_after(e) -> bool:
    try:
        p = json.loads(e["value"])
    except Exception:
        return False
    payload = p.get("payload", p)
    return isinstance(payload, dict) and payload.get("after") is not None


def test_sink_republish_round_trip(kspark):
    """S7: the streaming Kafka sink (writeStream.format('kafka') with
    kafka_sink_options) delivers every row; a fresh earliest read
    counts them all back."""
    from pyspark.sql import functions as F

    from cdc_pipeline_with_kafka_spark.streaming.sinks import (
        kafka_sink_options,
    )

    topic = _topic()
    src = kspark.readStream.format("rate").option(
        "rowsPerSecond", "50"
    ).load().select(
        F.col("value").cast("string").alias("key"),
        F.to_json(F.struct("value", "timestamp")).alias("value"),
    )
    writer = src.writeStream.format("kafka").option(
        "kafka.bootstrap.servers", BOOTSTRAP
    ).option(
        "checkpointLocation", f"/tmp/ck-{uuid.uuid4().hex}"
    )
    for k, v in kafka_sink_options(topic).items():
        writer = writer.option(k, v)
    q = writer.start()
    time.sleep(5)
    q.stop()
    q.awaitTermination(30)

    back = kspark.read.format("kafka").option(
        "kafka.bootstrap.servers", BOOTSTRAP
    ).option("subscribe", topic).option(
        "startingOffsets", "earliest"
    ).load()
    n = back.count()
    assert n > 0
    # keys unique — the sink never duplicated within one run
    assert back.selectExpr("CAST(key AS STRING) k").distinct().count() == n


def test_checkpoint_recovery_no_loss_no_dup(kspark, tmp_path):
    """S2/T5: checkpointed offsets supersede group commits — produce,
    drain with a checkpoint, produce more, RESTART the query from the
    same checkpoint: the second drain sees exactly the new rows (no
    replay of batch one, nothing skipped)."""
    from pyspark.sql import functions as F

    topic = _topic()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_once():
        df = kspark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", topic).option(
            "startingOffsets", "earliest"
        ).load().selectExpr("CAST(value AS STRING) AS v")
        q = df.writeStream.format("parquet").option(
            "path", out
        ).option("checkpointLocation", ck).trigger(
            availableNow=True
        ).start()
        q.awaitTermination(60)

    _produce(kspark, topic, [(str(i), f"a{i}") for i in range(10)])
    run_once()
    _produce(kspark, topic, [(str(i), f"b{i}") for i in range(10, 25)])
    run_once()
    vals = sorted(r["v"] for r in kspark.read.parquet(out).collect())
    assert vals == sorted(
        [f"a{i}" for i in range(10)] + [f"b{i}" for i in range(10, 25)]
    )
