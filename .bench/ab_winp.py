# A/B winnow_pairs: distinct()+collect_list vs collect_set postings
from pyspark.sql import functions as F
from cdc_pipeline_with_kafka_spark.operators import spans as SP
from cdc_pipeline_with_kafka_spark import queries as Q

_WINNOW_K = Q._WINNOW_K
_WINNOW_W = Q._WINNOW_W
_WINNOW_TWIN = Q._WINNOW_TWIN
docs = spark.read.parquet(SF + "/documents.parquet")
planted = docs.select(
    "doc_id",
    F.concat(F.substring("text", 1, 100), F.lit(" tail alpha variant")).alias("text"),
).unionByName(
    docs.select(
        (F.col("doc_id") + _WINNOW_TWIN).alias("doc_id"),
        F.concat(F.substring("text", 1, 100), F.lit(" tail beta variant")).alias("text"),
    )
)

def winnow_pairs_v2(df, k=4, w=4, min_shared=1, text_col="text", id_col="doc_id", max_fp_df=None, fps=None):
    if fps is None:
        fps = SP.winnow_fingerprints(df, k=k, w=w, text_col=text_col, id_col=id_col)
    postings = (
        fps.select("id", "fp")
        .groupBy("fp")
        .agg(F.collect_set("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_fp_df is not None:
        postings = postings.filter(F.size("ids") <= max_fp_df)
    pairs = postings.selectExpr("ids", "posexplode(ids) AS (p, a)").selectExpr(
        "a", "explode(slice(ids, p + 2, size(ids))) AS b"
    )
    return (
        pairs.selectExpr("least(a, b) AS id_a", "greatest(a, b) AS id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )

old = SP.winnow_pairs(planted, k=_WINNOW_K, w=_WINNOW_W)
new = winnow_pairs_v2(planted, k=_WINNOW_K, w=_WINNOW_W)
print("hash old:", hashdf(old))
print("hash new:", hashdf(new))
for _ in range(3):
    print("old t:", time_noop(old), "new t:", time_noop(new))
