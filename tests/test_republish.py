"""S7 ProcessedKeywordEvent republish payload + T8 wordcloud query."""

from __future__ import annotations

import json

from cdc_pipeline_with_kafka_spark.sources import cdc
from cdc_pipeline_with_kafka_spark.streaming import pipeline

from .fixtures import make_articles, make_cdc_events


def _articles(spark):
    raw = spark.createDataFrame(
        [(e["key"], e["value"], e["kafka_ts"]) for e in make_cdc_events(make_articles(120))],
        "key string, value string, kafka_ts string",
    )
    parsed = cdc.parse_envelope(raw)
    return cdc.quality_filter(
        cdc.after_image(cdc.for_table(cdc.upsert_ops(parsed), "articles"))
    )


def test_enriched_keyword_events_shape(spark):
    out = pipeline.enriched_keyword_events(_articles(spark)).collect()
    assert len(out) > 0
    row = out[0]
    assert row["key"].startswith("article_")
    payload = json.loads(row["value"])
    assert set(payload) >= {
        "article_id", "title", "content", "category", "keywords", "trends",
        "breaking_indicators", "sentiment", "extraction_method", "timestamp",
    }
    assert len(payload["content"] or "") <= 500
    for kw in payload["keywords"]:
        assert set(kw) == {"keyword", "score", "category"}
    # breaking titles carry indicators
    breaking = [json.loads(r["value"]) for r in out if "속보" in json.loads(r["value"])["title"]]
    assert all("속보" in p["breaking_indicators"] for p in breaking)


def test_wordcloud_query_batch_topk(spark):
    arts = _articles(spark)
    kws = pipeline.keyword_stream(arts)
    out = pipeline.wordcloud_query(kws, window="30 minutes", top_k=5)
    rows = out.collect()
    assert len(rows) > 0
    # ≤ top_k rows per window
    from collections import Counter

    per_window = Counter(r["window_start"] for r in rows)
    assert max(per_window.values()) <= 5
