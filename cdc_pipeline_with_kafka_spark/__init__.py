"""PySpark-native analytics engine with the query/data-processing
capabilities of JunYupK/CDC-PipeLine-With-Kafka (see SURVEY.md).

The reference is a CDC news-analytics pipeline (Debezium → Kafka →
keyword extraction → multi-window trend analytics → alerting →
idempotent replication).  This package re-expresses those semantics
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the change stream, and scale-oriented extensions
(dedup, similarity search, text analysis, multimodal plumbing) for
100 TB training-data pipelines.

Layout
------
- ``session``    : tuned SparkSession factory
- ``schemas``    : StructTypes for the reference data model + CDC envelope
- ``sources``    : batch table loaders, CDC (file/kafka) readers
- ``functions``  : scalar column functions (text/date/scoring)
- ``operators``  : relational / windowed / trend / alert / dedup /
                   spans / similarity / classify / curation / sketch /
                   text-stats / multimodal operator library
- ``streaming``  : watermarked streaming pipelines + foreachBatch MERGE sinks
"""

__version__ = "0.1.0"
