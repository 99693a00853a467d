# corr under openCost=128K fresh plans: shipped (spread) vs no-spread
from pyspark.sql import functions as F
import cdc_pipeline_with_kafka_spark.operators.sketch as SK

cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
micro = 1_000_000
pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
dec = "decimal(38,0)"

def aggs():
    out = []
    for p, (i, j) in enumerate(pairs):
        qx, qy = F.col(f"_q{i}"), F.col(f"_q{j}")
        both = qx.isNotNull() & qy.isNotNull()
        gx = F.when(both, qx.cast(dec)); gy = F.when(both, qy.cast(dec))
        out += [F.count(F.when(both, F.lit(1))).cast(dec).alias(f"_n_{p}"),
                F.sum(gx).alias(f"_sx_{p}"), F.sum(gy).alias(f"_sy_{p}"),
                F.sum(gx * qy).alias(f"_sxy_{p}"), F.sum(gx * qx).alias(f"_sxx_{p}"),
                F.sum(gy * qy).alias(f"_syy_{p}")]
    return out

spark.conf.set("spark.sql.files.openCostInBytes", "131072")
li = spark.read.parquet(SF + "/lineitem.parquet").select(*cols)
print("scan parts:", li.rdd.getNumPartitions())
qn = li.select(*[F.expr(f"CAST(round({c} * {micro}, 0) AS BIGINT)").alias(f"_q{i}") for i, c in enumerate(cols)])
nos = qn.agg(*aggs())
full = SK.corr_matrix(spark.read.parquet(SF + "/lineitem.parquet"), cols)  # still spreads
for _ in range(3):
    print("agg noSpread32:", time_noop(nos), " full(spread):", time_noop(full))
spark.conf.set("spark.sql.files.openCostInBytes", "4194304")
full3 = SK.corr_matrix(spark.read.parquet(SF + "/lineitem.parquet"), cols)
print("full spread oc4M:", time_noop(full3), time_noop(full3))
