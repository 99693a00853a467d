def winnow_pairs_v2(df, k=4, w=4, min_shared=1, text_col="text", id_col="doc_id", max_fp_df=None, fps=None):
    from cdc_pipeline_with_kafka_spark.operators import spans as SP
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

from cdc_pipeline_with_kafka_spark.operators import spans as SP
old = SP.winnow_pairs(planted, k=_WINNOW_K, w=_WINNOW_W)
new = winnow_pairs_v2(planted, k=_WINNOW_K, w=_WINNOW_W)
print('hash old:', hashdf(old))
print('hash new:', hashdf(new))
print('old t:', time_noop(old), 'new t:', time_noop(new))
from cdc_pipeline_with_kafka_spark.util import plan_facts
po, pn = plan_facts(old), plan_facts(new)
print('old exchanges:', po['exchanges'], 'new exchanges:', pn['exchanges'])
