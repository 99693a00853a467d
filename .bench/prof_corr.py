# where does 'corr' spend 1.2s? scan vs quantize vs spread vs decimal agg
from pyspark.sql import functions as F
from cdc_pipeline_with_kafka_spark.util import spread
import cdc_pipeline_with_kafka_spark.operators.sketch as SK

cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
li = spark.read.parquet(SF + "/lineitem.parquet").select(*cols)
micro = 1_000_000
quant_nospread = li.select(
    *[F.expr(f"CAST(round({c} * {micro}, 0) AS BIGINT)").alias(f"_q{i}") for i, c in enumerate(cols)]
)
quant = spread(quant_nospread)
full = SK.corr_matrix(spark.read.parquet(SF + "/lineitem.parquet"), cols)
print("scan        :", time_noop(li))
print("quantize    :", time_noop(quant_nospread))
print("quant+spread:", time_noop(quant))
print("full corr   :", time_noop(full))
# decimal agg on spread rows only
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
print("agg w spread:", time_noop(quant.agg(*aggs)))
print("agg nospread:", time_noop(quant_nospread.agg(*aggs)))
# long-sum control: how much of the agg cost is Decimal?
laggs = []
for p, (i, j) in enumerate(pairs):
    qx, qy = F.col(f"_q{i}"), F.col(f"_q{j}")
    both = qx.isNotNull() & qy.isNotNull()
    lx = F.when(both, qx); ly = F.when(both, qy)
    laggs += [F.count(F.when(both, F.lit(1))).alias(f"_n_{p}"),
              F.sum(lx).alias(f"_sx_{p}"), F.sum(ly).alias(f"_sy_{p}"),
              F.sum(lx * qy).alias(f"_sxy_{p}"), F.sum(lx * qx).alias(f"_sxx_{p}"),
              F.sum(ly * qy).alias(f"_syy_{p}")]
print("agg longctrl:", time_noop(quant.agg(*laggs)))
