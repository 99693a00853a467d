"""Shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure compute-heavy per-row work uses the whole cluster: small
    inputs (a single parquet file → a single input partition) are
    repartitioned to defaultParallelism BEFORE expensive expressions.

    No-op when the input already has enough source files (the 100 TB
    case — datasets there are thousands of files), so no shuffle is
    added at scale.  The probe is `inputFiles()` rather than
    `df.rdd.getNumPartitions()`: the RDD conversion materializes the
    physical plan and costs ~100 ms of driver time PER QUERY BUILD,
    while the file listing is ~1 ms.  Non-file sources (createDataFrame
    literals, post-shuffle streams) report no files and get spread —
    correct for the small local inputs they are."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    return df.repartition(target, *[F.col(c) for c in cols]) if cols else df.repartition(target)
