# effect of files.openCostInBytes on scan parallelism + corr cost
from pyspark.sql import functions as F
import cdc_pipeline_with_kafka_spark.operators.sketch as SK

cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
li = spark.read.parquet(SF + "/lineitem.parquet").select(*cols)
micro = 1_000_000
quant_nospread = li.select(
    *[F.expr(f"CAST(round({c} * {micro}, 0) AS BIGINT)").alias(f"_q{i}") for i, c in enumerate(cols)]
)
pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
dec = "decimal(38,0)"
aggs = []
for p, (i, j) in enumerate(pairs):
    qx, qy = F.col(f"_q{i}"), F.col(f"_q{j}")
    both = qx.isNotNull() & qy.isNotNull()
    gx = F.when(both, qx.cast(dec)); gy = F.when(both, qy.cast(dec))
    aggs += [F.count(F.when(both, F.lit(1))).cast(dec).alias(f"_n_{p}"),
             F.sum(gx).alias(f"_sx_{p}"), F.sum(gy).alias(f"_sy_{p}"),
             F.sum(gx * qy).alias(f"_sxy_{p}"), F.sum(gx * qx).alias(f"_sxx_{p}"),
             F.sum(gy * qy).alias(f"_syy_{p}")]

for oc in ["4194304", "131072"]:
    spark.conf.set("spark.sql.files.openCostInBytes", oc)
    print("openCost", oc, "scan partitions:", li.rdd.getNumPartitions())
    print("  agg nospread:", time_noop(quant_nospread.agg(*aggs)),
          time_noop(quant_nospread.agg(*aggs)))
    print("  full corr   :", time_noop(SK.corr_matrix(spark.read.parquet(SF + "/lineitem.parquet"), cols)))
spark.conf.set("spark.sql.files.openCostInBytes", "4194304")
