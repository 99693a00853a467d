# where does 'coo' spend its 0.7s? time successive prefixes
from pyspark.sql import functions as F

li = spark.read.parquet(SF + "/lineitem.parquet").select(
    F.col("l_orderkey").alias("b"), (F.col("l_partkey") % 97).alias("it")
)
rows = li.select(F.col("b").alias("_b"), F.col("it").alias("_i")).distinct()
baskets = rows.groupBy("_b").agg(F.sort_array(F.collect_set("_i")).alias("items"))
pairs = baskets.selectExpr("items", "posexplode(items) AS (p, item_a)").selectExpr(
    "item_a", "explode(slice(items, p + 2, size(items))) AS item_b")
support = pairs.groupBy("item_a", "item_b").agg(
    F.count(F.lit(1)).cast("long").alias("n_ab")).filter(F.col("n_ab") >= 2)
item_counts = rows.groupBy("_i").agg(F.count(F.lit(1)).cast("long").alias("n_i"))
print("scan      :", time_noop(li))
print("rows dist :", time_noop(rows))
print("baskets   :", time_noop(baskets))
print("pairs     :", time_noop(pairs))
print("support   :", time_noop(support))
print("item_cnt  :", time_noop(item_counts))
