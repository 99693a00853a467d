"""T3: watermark semantics — an event arriving after its window was
finalized (event time older than the advanced watermark) must be
dropped, and a finalized window emits exactly once (append mode)."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql import functions as F


def test_late_event_dropped_after_watermark(spark, tmp_path):
    base = datetime(2024, 3, 1, 0, 0)
    src = tmp_path / "s"
    src.mkdir()

    # batch 1: 3 events in window [00:00, 00:30) + one far-future event
    # that advances the watermark (event-time 02:00 → watermark 01:50
    # with a 10-min delay, far past 00:30)
    with open(src / "a.json", "w") as fh:
        for m in (1, 2, 3):
            fh.write(json.dumps({"kw": "k", "ts": (base + timedelta(minutes=m)).isoformat()}) + "\n")
        fh.write(json.dumps({"kw": "k", "ts": (base + timedelta(hours=2)).isoformat()}) + "\n")

    stream = (
        spark.readStream.schema("kw string, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
    )
    counts = stream.groupBy(F.window("ts", "30 minutes").alias("w"), "kw").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    q = (
        counts.select(F.col("w.start").alias("ws"), "kw", "cnt")
        .writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()

    # batch 2: a LATE event for the already-finalized 00:00 window
    with open(src / "b.json", "w") as fh:
        fh.write(json.dumps({"kw": "k", "ts": (base + timedelta(minutes=5)).isoformat()}) + "\n")
    q.processAllAvailable()
    q.stop()

    rows = {
        (r["ws"].isoformat(), r["kw"]): r["cnt"]
        for r in spark.sql("SELECT * FROM late_test").collect()
    }
    # window 00:00 emitted once with the on-time count; the late event
    # neither re-emits the window nor bumps the count
    assert rows[("2024-03-01T00:00:00", "k")] == 3
    # no duplicate emission for the same window
    n_rows = spark.sql(
        "SELECT count(*) FROM late_test WHERE ws = '2024-03-01 00:00:00'"
    ).collect()[0][0]
    assert n_rows == 1
