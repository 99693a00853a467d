"""Plan inspection helpers — used in tests and tuning to assert the
physical plan is the one we want at scale (pushed filters, pruned
columns, broadcast joins, partial aggregation, top-k pushdown)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def formatted_plan(df: DataFrame) -> str:
    return explain_str(df, "formatted")


def has_pushed_filters(df: DataFrame) -> bool:
    p = formatted_plan(df)
    return "PushedFilters: [" in p and "PushedFilters: []" not in p


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    import re

    p = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p):
        cols.extend(part.split(":")[0] for part in m.group(1).split(",") if part)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present (partial_* before the shuffle)."""
    return "partial_" in explain_str(df, "simple")


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def has_window_group_limit(df: DataFrame) -> bool:
    """Top-k-per-group executed as partial group-limit before shuffle
    (Spark ≥3.5 WindowGroupLimit pushdown)."""
    return "WindowGroupLimit" in formatted_plan(df)


def exchange_count(df: DataFrame) -> int:
    return formatted_plan(df).count("Exchange")
