"""End-to-end pipeline: CDC replay → keyword explode → windowed
trending alerts → alert-log table → recent-alerts API read, plus
multi-micro-batch decay state (state must survive across batches)."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark import api
from cdc_pipeline_with_kafka_spark.sources import cdc
from cdc_pipeline_with_kafka_spark.streaming import decay, pipeline

from .fixtures import make_articles, make_cdc_events


def test_cdc_to_alert_log_to_api(spark, tmp_path):
    # 1. replay the CDC log (batch mode — same operators as streaming)
    arts = make_articles(200)
    raw = spark.createDataFrame(
        [(e["key"], e["value"], e["kafka_ts"]) for e in make_cdc_events(arts)],
        "key string, value string, kafka_ts string",
    )
    parsed = cdc.parse_envelope(raw)
    articles = cdc.quality_filter(
        cdc.after_image(cdc.for_table(cdc.upsert_ops(parsed), "articles"))
    )
    # 2. trending alerts
    trending = pipeline.trending_query(
        pipeline.keyword_stream(articles), window="30 minutes", min_mentions=2
    )
    # 3. persist the alert log (S12 analog)
    log_path = str(tmp_path / "alerts")
    trending.withColumn("timestamp", F.col("window_start")).write.parquet(log_path)
    # 4. API read: newest 100
    alert_log = spark.read.parquet(log_path)
    recent = api.recent_alerts(alert_log, limit=100).collect()
    assert 0 < len(recent) <= 100
    ts = [r["timestamp"] for r in recent]
    assert ts == sorted(ts, reverse=True)  # newest first
    assert all(r["cnt"] >= 2 for r in recent)


def test_decay_state_survives_micro_batches(spark, tmp_path):
    """Two files + maxFilesPerTrigger=1 → two micro-batches; the
    second batch must decay state accumulated in the first."""
    base = datetime(2024, 3, 1)
    src = tmp_path / "stream"
    src.mkdir()
    with open(src / "a.json", "w") as fh:
        for i in range(8):
            fh.write(json.dumps({"keyword": "hot", "ts": (base + timedelta(minutes=i)).isoformat()}) + "\n")
    with open(src / "b.json", "w") as fh:
        fh.write(json.dumps({"keyword": "hot", "ts": (base + timedelta(minutes=61)).isoformat()}) + "\n")

    stream = (
        spark.readStream.schema("keyword string, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = decay.decayed_counts(stream, window="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("decay_mb")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM decay_mb ORDER BY updated_at").collect()
    by_update = [r["cnt"] for r in rows if r["keyword"] == "hot"]
    # batch 1: 8 events, no decay → 8.0; batch 2: +1 event, two full
    # windows elapsed → (8+1)*0.25 = 2.25
    assert by_update[0] == 8.0
    assert by_update[-1] == 2.25
