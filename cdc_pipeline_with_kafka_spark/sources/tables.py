"""Batch table loaders for the driver-generated parquet tables.

These are plain parquet scans — Catalyst pushes filters and prunes
columns into the scan (verify with ``df.explain('formatted')`` →
``PushedFilters`` / ``ReadSchema``).  At 100 TB the same loader works
unchanged against a partitioned data-lake layout; nothing here assumes
single-node data volumes.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# DataFrame cache keyed weakly by session: spark.read.parquet costs
# ~100 ms of driver time (footer/schema read via py4j) per call, paid
# on EVERY query build otherwise.  DataFrames are immutable, so
# returning the same object is safe; entries die with their session.
_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    per_session = _DF_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    if key not in per_session:
        per_session[key] = _load_table(spark, name, sf_dir)
    return per_session[key]


def _load_table(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    # Defensive runtime confs: the caller may hand us a session built
    # without session.get_spark() (e.g. the round driver's own session).
    # Both are runtime-settable; required for TIMESTAMP(NANOS) columns
    # and for UTC-stable timestamp values vs the DuckDB oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) parquet columns arrive as long (see session.py);
    # convert to micro-precision TIMESTAMP_NTZ (matches DuckDB's read).
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so ``spark.sql`` queries work."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
