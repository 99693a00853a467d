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


def plan_facts(df: DataFrame) -> dict:
    """Mechanical facts about a DataFrame's EXECUTED physical plan —
    the engine's plan-pinning discipline (PLANS.md) as a reusable
    assertion surface instead of ad-hoc string matching in each test:
    counts of exchanges (shuffles), sorts, window nodes, per-join
    strategies, aggregate kinds, scans with their pushed filters, and
    whether any nested-loop join appears.

    Counts come from node-name occurrences in the plan tree string —
    the same source the ad-hoc pins read, made uniform.  AQE plans
    are resolved (`executedPlan` after `isFinalPlan` when adaptive).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()

    def _count(token: str) -> int:
        return plan.count(token)

    return {
        "exchanges": _count("Exchange "),
        "single_partition_exchanges": _count("Exchange SinglePartition"),
        "sorts": _count("+- Sort ") + (1 if plan.startswith("Sort ") else 0),
        "windows": _count("Window ["),
        "hash_aggregates": _count("HashAggregate"),
        "sort_aggregates": _count("SortAggregate"),
        "object_hash_aggregates": _count("ObjectHashAggregate"),
        "broadcast_hash_joins": _count("BroadcastHashJoin"),
        "sort_merge_joins": _count("SortMergeJoin"),
        "nested_loop_joins": _count("NestedLoopJoin"),
        "file_scans": _count("FileScan"),
        "pushed_filters": _count("PushedFilters: ["),
        "generates": _count("Generate "),
        "plan": plan,
    }


def assert_plan(df: DataFrame, **bounds) -> dict:
    """Assert upper bounds (or exact `_eq` values) on plan_facts keys:
    ``assert_plan(df, exchanges=2, sort_aggregates=0,
    nested_loop_joins=0)`` reads as the operator's shuffle contract.
    Returns the facts so tests can make further custom assertions.
    Raises AssertionError naming the violated bound AND embedding the
    plan, so a failed pin is diagnosable from the test log alone."""
    facts = plan_facts(df)
    for key, bound in bounds.items():
        if key not in facts:
            raise KeyError(f"unknown plan fact {key!r}")
        got = facts[key]
        if got > bound:
            raise AssertionError(
                f"plan bound violated: {key}={got} > {bound}\n"
                f"{facts['plan']}"
            )
    return facts
