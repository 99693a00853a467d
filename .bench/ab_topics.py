# A/B cluster_topics: duplicated corpus agg (old) vs third window (new)
from pyspark.sql import functions as F, Window
import cdc_pipeline_with_kafka_spark.operators.curation as CU

def cluster_topics_old(assigned, docs, *, k=5, min_count=2, id_col="doc_id",
                       assign_id_col="vec_id", cluster_col="centroid_id",
                       text_col="text"):
    base = (
        assigned.select(F.col(assign_id_col).alias(id_col), cluster_col)
        .join(docs.select(id_col, text_col), id_col)
        .select(
            cluster_col,
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("term"),
        )
        .groupBy(cluster_col, "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = base.agg(F.sum("cnt").alias("corpus_tokens"))
    enr = (
        base.withColumn("cl_tok", F.sum("cnt").over(Window.partitionBy(cluster_col)))
        .withColumn("term_total", F.sum("cnt").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(tot))
    )
    scored = enr.select(
        cluster_col, "term", "cnt",
        F.expr(
            "((CAST(cnt AS DECIMAL(20,0)) * 1000000000 div cl_tok) * 1000) div "
            "greatest(CAST(term_total AS DECIMAL(20,0)) * 1000000000 div corpus_tokens, 1)"
        ).alias("lift_milli"),
    ).filter(F.col("cnt") >= min_count)
    w = Window.partitionBy(cluster_col).orderBy(
        F.col("lift_milli").desc(), F.col("cnt").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(cluster_col, "term", "cnt", "lift_milli", "rnk")
    )

# same inputs as the semdedup 'topic' branch: pinned assignment + docs
import cdc_pipeline_with_kafka_spark.queries as Qm
docs = spark.read.parquet(SF + "/documents.parquet").select("doc_id", "text")
corpus = Qm._semdedup_corpus(spark, SF)
import cdc_pipeline_with_kafka_spark.operators.similarity as SIM
# reproduce the gate's `assigned` cheaply: read the gate code path
sd = Qm.semdedup(spark, SF)
print("semdedup topic branch steady:", time_branch(sd, 'topic'), time_branch(sd, 'topic'))
# direct operator A/B on a synthetic assignment (doc_id % 7 clusters)
assigned = docs.select(F.col("doc_id").alias("vec_id"), (F.col("doc_id") % 7).alias("centroid_id"))
old = cluster_topics_old(assigned, docs, k=5, min_count=2)
new = CU.cluster_topics(assigned, docs, k=5, min_count=2)
print("hash old:", hashdf(old))
print("hash new:", hashdf(new))
for _ in range(3):
    print("old t:", time_noop(old), "new t:", time_noop(new))
