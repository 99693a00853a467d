# Validate adopted batch 1: table_profile split, corr quantize-after-
# spread + hash spread, winnow zip-slice argmin.  Hashes vs captured
# pre-change values; map-only agg smoke; timings.
from pyspark.sql import functions as F
import cdc_pipeline_with_kafka_spark.operators.sketch as SK
import cdc_pipeline_with_kafka_spark.operators.spans as SP

docs = spark.read.parquet(SF + "/documents.parquet")
prof = SK.table_profile(docs)
h = hashdf(prof)
print("profile hash:", h, "MATCH" if h == ('2911258238528604438', 5) else "MISMATCH(expect ('2911258238528604438', 5))")
print("profile t:", time_noop(prof), time_noop(prof), time_noop(prof))

# map-only frame: agg of only literal exprs must not raise
mo = spark.createDataFrame([({'a': 1},)], "m map<string,int>")
print("map-only profile:", SK.table_profile(mo).collect())

corr = SK.corr_matrix(spark.read.parquet(SF + "/lineitem.parquet"),
                      ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
print("corr hash:", hashdf(corr))
print("corr t:", time_noop(corr), time_noop(corr), time_noop(corr))

wf = SP.winnow_fingerprints(docs, k=4, w=4)
hw = hashdf(wf)
print("winnow hash:", hw, "MATCH" if hw == ('57183284113049652842232', 99296) else "MISMATCH(expect ('57183284113049652842232', 99296))")
print("winnow t:", time_noop(wf), time_noop(wf))
