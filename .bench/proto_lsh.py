# A/B: old dedup-then-score lsh_ann_topk vs r12 score-then-dedup module
# code — value equality (hashdf over the full gate output) + speed.
from pyspark.sql import Window
import cdc_pipeline_with_kafka_spark.operators.similarity as SIM


def lsh_old(corpus, queries, dim, k=10, n_planes=6, n_tables=4,
            id_col="vec_id", vec_col="embedding", query_id_col="query_id",
            seed=42):
    plane_sets = [SIM._hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    sig = SIM._signature_udf(plane_sets)
    c = (
        SIM.spread(corpus, id_col)
        .select(F.col(id_col), F.col(vec_col), sig(F.col(vec_col)).alias("_sigs"))
        .select(F.col(id_col), F.col(vec_col), F.posexplode_outer("_sigs").alias("_table", "_bucket"))
    )
    qb = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
        .select(F.col(query_id_col), F.col("_qvec"), sig(F.col("_qvec")).alias("_sigs"))
        .select(F.col(query_id_col), F.col("_qvec"), F.posexplode_outer("_sigs").alias("_table", "_bucket"))
    )
    candidates = (
        c.join(qb, ["_table", "_bucket"])
        .select(query_id_col, id_col, vec_col, "_qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = candidates.select(
        F.col(query_id_col), F.col(id_col),
        F.round(SIM.cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rnk")
    )


emb = q._t(spark, SF, "embeddings")
qrs = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
old = lsh_old(emb, qrs, dim=64, k=10, n_planes=6)
new = SIM.lsh_ann_topk(emb, qrs, dim=64, k=10, n_planes=6)
print("lsh hash old:", hashdf(old))
print("lsh hash new:", hashdf(new))
print("lsh", [(time_noop(old, 2), time_noop(new, 2)) for _ in range(3)])
