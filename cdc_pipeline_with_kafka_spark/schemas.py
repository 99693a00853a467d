"""Typed schemas for the reference data model and CDC envelope.

Derived from the reference DDL and DTOs (SURVEY.md §1):
- articles      : crawler-service/init-postgres/init.sql:15-33 (+ JPA
                  ``keywords`` column, entity/Article.java:67-68)
- media         : init.sql:36-45
- categories    : init.sql:7-12
- Debezium JSON envelope (schemas disabled):
                  infra/connector-config.json:18-21; consumers accept
                  both enveloped and bare payloads
                  (keyword-extraction/main.py:110,
                  targetDB1/SyncService.py:164-167)
- KeywordEvent / ProcessedKeywordEvent:
                  keyword-extraction/keyword_republisher.py:14-38
- AlertEvent    : crawler-service/.../dto/AlertEvent.java:16-27

Everything is declared nullable — the reference's consumers defensively
``.get()`` every field because Debezium ships schemaless JSON.
"""

from __future__ import annotations

from pyspark.sql import types as T

ARTICLES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("category_id", T.IntegerType()),
        T.StructField("category", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("published_at", T.TimestampType()),
        T.StructField("stored_date", T.StringType()),  # CHAR(8) yyyyMMdd
        T.StructField("views_count", T.IntegerType()),
        T.StructField("sentiment_score", T.DoubleType()),
        T.StructField("article_text_length", T.IntegerType()),
        T.StructField("keywords", T.StringType()),  # comma-joined (JPA mirror)
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("is_deleted", T.BooleanType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("article_id", T.LongType()),
        T.StructField("stored_date", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("caption", T.StringType()),
    ]
)

CATEGORIES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

# The six seeded categories (init.sql:69-70).
CATEGORY_NAMES = ["정치", "경제", "사회", "생활문화", "세계", "IT과학"]


def debezium_envelope_schema(row_schema: T.StructType = ARTICLES_SCHEMA) -> T.StructType:
    """Debezium JSON envelope with schemas disabled.

    ``{payload?: {op, before, after, source:{table,...}, ts_ms}}`` —
    some producers ship the payload bare (no ``payload`` wrapper), so
    the parser (sources.cdc) tries both shapes, mirroring
    keyword-extraction/main.py:110 / targetDB1/SyncService.py:164-167.
    """
    payload = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("table", T.StringType()),
                        T.StructField("db", T.StringType()),
                        T.StructField("lsn", T.LongType()),
                    ]
                ),
            ),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    return T.StructType([T.StructField("payload", payload), *payload.fields])


KEYWORD_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("article_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("content", T.StringType()),  # truncated to 500 chars
        T.StructField("category", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("extraction_method", T.StringType()),
        T.StructField("confidence_scores", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

ALERT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),  # 'breaking' | 'trending'
        T.StructField("title", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("severity", T.DoubleType()),  # 0-1
        T.StructField("category", T.StringType()),
        T.StructField("sources", T.ArrayType(T.StringType())),
    ]
)

# article_changes audit rows (targetDB1/SyncService.py:127-139).
ARTICLE_CHANGES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("article_id", T.LongType()),
        T.StructField("operation", T.StringType()),  # INSERT|UPDATE|DELETE
        T.StructField("changed_at", T.StringType()),  # ISO-8601, possibly 'Z'
        T.StructField("old_data", T.StringType()),  # JSON
        T.StructField("new_data", T.StringType()),  # JSON
    ]
)
