# where does 'mat' spend ~1s? components of materialize_epoch_plan
from pyspark.sql import functions as F
from cdc_pipeline_with_kafka_spark.operators import curation as CU
from cdc_pipeline_with_kafka_spark.sources.tables import load_table

mat_three = ("src0", "src1", "src2")
docs = load_table(spark, "documents", SF)
mat_parts = {
    s: docs.filter(F.col("source") == s).select("doc_id", "source", "n_chars")
    for s in mat_three
}
mat_src = (
    docs.filter(F.col("source").isin(*mat_three))
    .groupBy("source")
    .agg(F.sum("n_chars").alias("n_tokens"))
    .withColumn("w", F.lit(1) + F.substring("source", 4, 10).cast("long") % 7)
)
import time
s = time.perf_counter()
mat_plan = CU.plan_epoch_mixture(mat_src, budget_tokens=80_000, weight_col="w")
mat = CU.materialize_epoch_plan(mat_parts, mat_plan, "n_chars", salt="mat:")
print("build s:", round(time.perf_counter() - s, 3))
print("mat t:", time_noop(mat), time_noop(mat), time_noop(mat))
one = CU.sample_token_budget(mat_parts["src0"].withColumn("source", F.lit("src0")), 20000, "n_chars", "doc_id", salt="mat:src0:e0:")
print("one carve t:", time_noop(one), time_noop(one))
