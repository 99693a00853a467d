"""CDC envelope parsing, filter semantics, keyword pipeline, and the
alert rules on the domain fixtures (SURVEY.md §2.1 S1-S4, §2.2 P1-P5,
§3.1) — batch mode first; streaming covered in test_streaming.py."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.sources import cdc
from cdc_pipeline_with_kafka_spark.streaming import pipeline

from .fixtures import make_articles, make_cdc_events


def _raw_events_df(spark):
    arts = make_articles(200)
    events = make_cdc_events(arts)
    return spark.createDataFrame(
        [(e["key"], e["value"], e["kafka_ts"]) for e in events],
        "key string, value string, kafka_ts string",
    ), arts, events


def test_parse_envelope_tolerates_both_shapes_and_drops_malformed(spark):
    raw, arts, events = _raw_events_df(spark)
    parsed = cdc.parse_envelope(raw)
    n_valid = sum(1 for e in events if not e["value"].startswith("{not"))
    assert parsed.count() == n_valid  # malformed dropped, bare+wrapped kept
    ops = {r["op"] for r in parsed.select("op").distinct().collect()}
    assert ops == {"c", "r", "u", "d"}
    # event time derived from ts_ms
    assert parsed.filter(F.col("ts").isNull()).count() == 0


def test_op_and_table_filters(spark):
    raw, _, _ = _raw_events_df(spark)
    parsed = cdc.parse_envelope(raw)
    kept = cdc.upsert_ops(parsed)
    assert kept.filter(F.col("op") == "d").count() == 0
    assert cdc.inserts_only(parsed).filter(F.col("op") != "c").count() == 0
    assert cdc.for_table(parsed, "articles").count() == parsed.count()
    assert cdc.for_table(parsed, "media").count() == 0


def test_after_image_and_quality_filter(spark):
    raw, _, _ = _raw_events_df(spark)
    parsed = cdc.parse_envelope(raw)
    imgs = cdc.after_image(cdc.upsert_ops(parsed))
    assert imgs.filter(F.col("id").isNull()).count() == 0
    filtered = cdc.quality_filter(imgs)
    # the ~5% short-content articles must be dropped
    assert 0 < filtered.count() < imgs.count()
    assert filtered.filter(F.length("content") < 50).count() == 0


def test_keyword_stream_explodes_keywords(spark):
    raw, _, _ = _raw_events_df(spark)
    parsed = cdc.parse_envelope(raw)
    articles = cdc.quality_filter(cdc.after_image(cdc.upsert_ops(parsed)))
    kw = pipeline.keyword_stream(articles)
    assert set(kw.columns) == {"id", "category", "source", "ts", "keyword"}
    rows = kw.collect()
    assert len(rows) > 0
    assert all(r["keyword"] for r in rows)


def test_trending_query_batch_mode(spark):
    raw, _, _ = _raw_events_df(spark)
    parsed = cdc.parse_envelope(raw)
    articles = cdc.quality_filter(cdc.after_image(cdc.upsert_ops(parsed)))
    kw = pipeline.keyword_stream(articles)
    trending = pipeline.trending_query(kw, window="30 minutes", min_mentions=2)
    out = trending.collect()
    assert all(r["cnt"] >= 2 for r in out)
    # window bounds are exactly 30 minutes apart
    assert all((r["window_end"] - r["window_start"]).total_seconds() == 1800 for r in out)


def test_parse_envelope_null_on_missing_op(spark):
    raw = spark.createDataFrame(
        [("1", json.dumps({"payload": {"before": None, "after": {"id": 1}}}), "2024-03-01T00:00:00")],
        "key string, value string, kafka_ts string",
    )
    assert cdc.parse_envelope(raw).count() == 0  # no op → dropped
