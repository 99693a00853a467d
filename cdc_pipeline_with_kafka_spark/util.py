"""Shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure compute-heavy per-row work uses the whole cluster: small
    inputs (a single parquet file → a single input partition) are
    repartitioned to defaultParallelism BEFORE expensive expressions.

    No-op when the input already has enough partitions (the 100 TB
    case) — the partition-count check needs no job, and skipping the
    repartition avoids a pointless full shuffle at scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in cols]) if cols else df.repartition(target)
