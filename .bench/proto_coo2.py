# Variant B: keep eager n_baskets literal (as shipped), only drop the
# pre-distinct and derive marginal rows from baskets.
from pyspark.sql import functions as F


def cooccurrence_pairs_vb(df, basket_col, item_col, min_pairs=1, max_basket_items=None):
    baskets = (
        df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .groupBy("_b")
        .agg(F.sort_array(F.collect_set("_i")).alias("items"))
    )
    if max_basket_items is not None:
        baskets = baskets.filter(
            F.size("items") <= max_basket_items
        ).localCheckpoint(eager=False)
    rows = baskets.select("_b", F.explode("items").alias("_i"))
    pairs = baskets.selectExpr(
        "items", "posexplode(items) AS (p, item_a)"
    ).selectExpr("item_a", "explode(slice(items, p + 2, size(items))) AS item_b")
    support = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_ab")
    ).filter(F.col("n_ab") >= min_pairs)
    item_counts = rows.groupBy("_i").agg(
        F.count(F.lit(1)).cast("long").alias("n_i")
    )
    n_baskets = baskets.count()
    dec = "decimal(38,0)"
    return (
        support
        .join(item_counts.select(F.col("_i").alias("item_a"),
                                 F.col("n_i").alias("n_a")), "item_a")
        .join(item_counts.select(F.col("_i").alias("item_b"),
                                 F.col("n_i").alias("n_b")), "item_b")
        .select(
            "item_a", "item_b", "n_ab", "n_a", "n_b",
            F.expr(
                f"CAST(CAST({int(n_baskets)} AS {dec}) * n_ab * 1000000 "
                f"div (CAST(n_a AS {dec}) * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


from cdc_pipeline_with_kafka_spark.operators import curation as CU

li = spark.read.parquet(SF + "/lineitem.parquet").select(
    F.col("l_orderkey").alias("b"), (F.col("l_partkey") % 97).alias("it")
)
old = CU.cooccurrence_pairs(li, "b", "it", min_pairs=2)
vb = cooccurrence_pairs_vb(li, "b", "it", min_pairs=2)
print("hash old:", hashdf(old))
print("hash vb: ", hashdf(vb))
for _ in range(3):
    print("old t:", time_noop(old), "vb t:", time_noop(vb))
