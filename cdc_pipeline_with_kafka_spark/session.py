"""SparkSession factory tuned for both local testing and cluster scale.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores);
the same settings are what we would ship on a 1000-executor cluster:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
explicit shuffle partitioning, Arrow for the single pandas-UDF path,
UTC session time so results are engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB the shuffle partition count is sized so a partition is
# ~128-256 MB post-compression; AQE coalesces small ones at runtime, so
# we set a generous static default and let AQE shrink it.  Locally the
# driver overrides via SPARK_GRAFT_CPUS.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(app_name: str = "cdc-pipeline-spark", *, extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Settings are chosen for scale-out behavior, not just local speed:

    - ``spark.sql.adaptive.enabled``: runtime re-optimization — coalesce
      post-shuffle partitions, convert sort-merge→broadcast when a side
      turns out small, split skewed partitions (AQE skew join).
    - ``spark.sql.session.timeZone=UTC``: deterministic event-time math
      regardless of host TZ (the reference pinned Asia/Seoul per-host;
      we normalize to UTC and convert at the edges).
    - Arrow enabled for the pandas-UDF tier (SURVEY §2.9 U1).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # test tables carry TIMESTAMP(NANOS) parquet columns (not in the
        # parquet spec Spark supports natively); read them as long and
        # convert in the loader (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
