"""CDC change-stream source (SURVEY.md §2.1 S1-S4, §2.2 P1-P5).

The reference consumes Debezium JSON from Kafka in three places
(keyword-extraction/main.py:259-376, targetDB1/SyncService.py:339-452,
crawler-service/.../alert/AlertTopology.java:36-38).  Here the source
is one function family:

- ``read_cdc_kafka``  : Structured Streaming Kafka source (checkpointed
  offsets replace consumer-group commits; exactly-once state).
- ``read_cdc_files``  : file-based stream (tests / replay) with the
  same downstream schema.
- ``parse_envelope``  : tolerant Debezium JSON parsing — enveloped or
  bare payload, malformed JSON → dropped (S4 semantics: the reference
  logs-and-skips, keyword-extraction/main.py:346-357).

All transforms are batch/stream agnostic DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import ARTICLES_SCHEMA, debezium_envelope_schema


def read_cdc_kafka(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1/S2/S3: Kafka streaming source.  `startingOffsets` mirrors the
    reference's auto.offset.reset (latest for the keyword path
    main.py:269-278, earliest for the sync path SyncService.py:339-452);
    checkpointing at the sink supersedes group-offset commits.

    Requires the spark-sql-kafka-0-10 connector on the classpath
    (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``);
    this test container ships without it, so CI covers the identical
    downstream pipeline through the file source (read_cdc_files)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .load()
    )


def read_cdc_files(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """File-source replay of a CDC event log (tests, backfill).  Each
    line/row carries a JSON `value` column like the Kafka wire format."""
    schema = schema or T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("kafka_ts", T.TimestampType()),
        ]
    )
    return spark.readStream.schema(schema).json(path)


def parse_envelope(
    df: DataFrame,
    value_col: str = "value",
    row_schema: T.StructType = ARTICLES_SCHEMA,
) -> DataFrame:
    """S4 + envelope flattening: parse the Debezium JSON, accepting both
    ``{payload: {...}}`` and bare ``{op, before, after, ...}`` shapes
    (main.py:110, SyncService.py:164-167).  Malformed JSON → from_json
    yields null → row dropped.

    Output columns: op, before, after (typed structs), table, ts
    (event time from ts_ms — the basis for all watermarks, a documented
    improvement over the reference's processing-time, SURVEY §2.8 T3).
    """
    env = debezium_envelope_schema(row_schema)
    # explode(array(...)) is a Generate barrier: it stops projection
    # collapse from inlining from_json into every downstream field
    # reference (which re-parses the JSON once per referenced field —
    # measured 2.6× slower on the hot path)
    parsed = df.select(
        *df.columns, F.explode(F.array(F.from_json(F.col(value_col), env))).alias("_env")
    )
    pick = lambda field: F.coalesce(  # noqa: E731
        F.col(f"_env.payload.{field}"), F.col(f"_env.{field}")
    )
    return (
        parsed.filter(F.col("_env").isNotNull())
        .select(
            *df.columns,
            pick("op").alias("op"),
            pick("before").alias("before"),
            pick("after").alias("after"),
            pick("source").getField("table").alias("table"),
            F.timestamp_millis(pick("ts_ms")).alias("ts"),
        )
        .filter(F.col("op").isNotNull())
    )


def parse_envelope_with_quarantine(
    df: DataFrame,
    value_col: str = "value",
    row_schema: T.StructType = ARTICLES_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """T7: like parse_envelope, but malformed/op-less events are
    RETURNED (raw) instead of silently dropped — the badRecordsPath-
    style quarantine.  The reference logs-and-counts failures
    (main.py:355-367, SyncService.py:433-438); quarantined rows keep
    the raw value for replay after a parser fix."""
    env = debezium_envelope_schema(row_schema)
    tagged = df.withColumn("_env", F.from_json(F.col(value_col), env))
    op = F.coalesce(F.col("_env.payload.op"), F.col("_env.op"))
    bad = tagged.filter(F.col("_env").isNull() | op.isNull()).select(
        *df.columns, F.current_timestamp().alias("quarantined_at")
    )
    good = parse_envelope(df, value_col, row_schema)
    return good, bad


def synthetic_cdc_rate_stream(
    spark: SparkSession, rows_per_second: int = 100, n_categories: int = 6
) -> DataFrame:
    """S6 modeling: the reference's crawler is an external ingestion
    process; tests and demos model it as Spark's `rate` source emitting
    synthetic Debezium envelopes at a controlled rate."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return rate.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.lit("c").alias("op"),
                    F.struct(
                        F.col("value").alias("id"),
                        F.concat(F.lit("기사 제목 "), F.col("value")).alias("title"),
                        F.concat(F.lit("내용 "), F.repeat(F.lit("본문 "), 20)).alias("content"),
                        F.concat(F.lit("cat"), (F.col("value") % n_categories)).alias("category"),
                        F.concat(F.lit("src"), (F.col("value") % 10)).alias("source"),
                    ).alias("after"),
                    F.struct(F.lit("articles").alias("table")).alias("source"),
                    F.unix_millis(F.col("timestamp")).alias("ts_ms"),
                ).alias("payload")
            )
        ).alias("value")
    )


def upsert_ops(df: DataFrame) -> DataFrame:
    """P1: keep create/snapshot/update events
    (keyword-extraction/main.py:116-118)."""
    return df.filter(F.col("op").isin("c", "r", "u"))


def inserts_only(df: DataFrame) -> DataFrame:
    """P5: Kafka-Streams alert path keeps only inserts
    (AlertTopology.java:53,84)."""
    return df.filter(F.col("op") == "c")


def for_table(df: DataFrame, table: str) -> DataFrame:
    """P4: route by source table (AlertTopology.java:54,85;
    SyncService.py:198-220)."""
    return df.filter(F.col("table") == table)


def after_image(df: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
    """P2: project the after-image, dropping rows without an id
    (main.py:121-123)."""
    cols = [F.col("after.*")] + [F.col(c) for c in (extra_cols or ["op", "ts"])]
    return df.select(*cols).filter(F.col("id").isNotNull())


def quality_filter(df: DataFrame, min_content_len: int = 50) -> Column | DataFrame:
    """P3: drop articles with missing title/content or short content
    (main.py:130-132)."""
    return df.filter(
        F.col("title").isNotNull()
        & (F.col("title") != "")
        & F.col("content").isNotNull()
        & (F.length(F.col("content")) >= min_content_len)
    )
