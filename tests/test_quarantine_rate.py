"""T7 quarantine path and the rate-source ingestion model (S6)."""

from __future__ import annotations

from cdc_pipeline_with_kafka_spark.sources import cdc
from cdc_pipeline_with_kafka_spark.streaming import pipeline

from .fixtures import make_articles, make_cdc_events


def test_quarantine_splits_good_and_bad(spark):
    arts = make_articles(100)
    events = make_cdc_events(arts)
    raw = spark.createDataFrame(
        [(e["key"], e["value"], e["kafka_ts"]) for e in events],
        "key string, value string, kafka_ts string",
    )
    good, bad = cdc.parse_envelope_with_quarantine(raw)
    n_bad_expected = sum(1 for e in events if e["value"].startswith("{not"))
    assert bad.count() == n_bad_expected
    assert good.count() + bad.count() == len(events)
    # quarantined rows keep the raw value for replay
    assert all(r["value"].startswith("{not") for r in bad.collect())
    assert "quarantined_at" in bad.columns


def test_rate_source_cdc_model_streams(spark):
    """S6: rate source → synthetic envelopes → the same article
    pipeline — proves a readStream source can feed the full path."""
    raw = cdc.synthetic_cdc_rate_stream(spark, rows_per_second=500)
    articles = pipeline.article_stream(raw, watermark="1 minute")
    q = (
        articles.writeStream.format("memory")
        .queryName("rate_articles")
        .outputMode("append")
        .start()
    )
    import time

    deadline = time.time() + 30
    rows = 0
    while time.time() < deadline:
        q.processAllAvailable()
        rows = spark.sql("SELECT count(*) FROM rate_articles").collect()[0][0]
        if rows > 0:
            break
        time.sleep(1)
    q.stop()
    assert rows > 0
    sample = spark.sql("SELECT * FROM rate_articles LIMIT 1").collect()[0]
    assert sample["title"].startswith("기사 제목")
