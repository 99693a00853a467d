"""Idempotent MERGE sink semantics (SURVEY.md §2.1 S9-S10, §2.8 T5):
replaying the same CDC batch twice must yield identical target state;
deletes are soft on articles-style tables (FIXTURES.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.sources import cdc
from cdc_pipeline_with_kafka_spark.streaming import sinks

from .fixtures import make_articles, make_cdc_events


def _parsed_batch(spark):
    arts = make_articles(120)
    events = make_cdc_events(arts)
    raw = spark.createDataFrame(
        [(e["key"], e["value"], e["kafka_ts"]) for e in events],
        "key string, value string, kafka_ts string",
    )
    return cdc.parse_envelope(raw)


def _state(df):
    return sorted(
        (r["id"], r["title"], bool(r["is_deleted"]))
        for r in df.select("id", "title", "is_deleted").collect()
    )


def test_merge_upsert_idempotent_replay(spark, tmp_path):
    batch = _parsed_batch(spark)
    target = str(tmp_path / "articles_target")
    first = sinks.merge_upsert(spark, batch, target, key="id", soft_delete=True)
    state1 = _state(first)
    # replaying the identical batch must not change the target
    second = sinks.merge_upsert(spark, batch, target, key="id", soft_delete=True)
    assert _state(second) == state1


def test_merge_applies_soft_delete(spark, tmp_path):
    batch = _parsed_batch(spark)
    target = str(tmp_path / "t2")
    merged = sinks.merge_upsert(spark, batch, target, key="id", soft_delete=True)
    deleted_ids = {
        r["id"]
        for r in batch.filter(F.col("op") == "d").select(F.col("before.id").alias("id")).collect()
        if r["id"] is not None
    }
    # any key whose LAST event is a delete must be soft-deleted
    last = sinks.latest_image_per_key(batch)
    last_deleted = {
        r["id"] for r in last.filter(F.col("op") == "d")
        .select(F.coalesce(F.col("before.id"), F.col("after.id")).alias("id")).collect()
    }
    flagged = {r["id"] for r in merged.filter(F.col("is_deleted")).collect()}
    assert last_deleted <= flagged or not deleted_ids
    # upserted keys must not be missing
    upserted = {r["id"] for r in last.filter(F.col("op") != "d").select("after.id").collect()}
    present = {r["id"] for r in merged.select("id").collect()}
    assert upserted <= present


def test_latest_image_per_key_takes_newest(spark):
    from datetime import datetime

    rows = [
        ("u", {"id": 1, "v": "old"}, None, datetime(2024, 3, 1, 0, 0)),
        ("u", {"id": 1, "v": "new"}, None, datetime(2024, 3, 1, 0, 5)),
        ("c", {"id": 2, "v": "only"}, None, datetime(2024, 3, 1, 0, 1)),
    ]
    df = spark.createDataFrame(
        rows, "op string, after struct<id:long,v:string>, before struct<id:long,v:string>, ts timestamp"
    ).withColumn("id", F.col("after.id"))
    latest = sinks.latest_image_per_key(df, key="id")
    got = {r["id"]: r["after"]["v"] for r in latest.collect()}
    assert got == {1: "new", 2: "only"}
