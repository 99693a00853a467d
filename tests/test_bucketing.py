"""Bucketed co-located joins: same-bucketed tables must join without
a shuffle (the 100 TB repeated-join strategy)."""

from __future__ import annotations

import pytest

from cdc_pipeline_with_kafka_spark import plans
from cdc_pipeline_with_kafka_spark.sources import bucketing

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    bucketing.write_bucketed(
        orders, "orders_b", "o_orderkey", num_buckets=8, path=str(warehouse / "orders_b")
    )
    bucketing.write_bucketed(
        lineitem, "lineitem_b", "o_orderkey", num_buckets=8,
        path=str(warehouse / "lineitem_b"),
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_shuffle(bucketed_tables):
    spark = bucketed_tables
    # disable broadcast so the join strategy is the bucketed SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = plans.formatted_plan(joined)
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # correctness: same result as the plain join
        plain = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").join(
            spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
