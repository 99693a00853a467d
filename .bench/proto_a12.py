# A/B breaking_word_stats_factored: two ev_cnt passes (no AQE exchange
# reuse fires -> the fact is scanned+window-aggregated twice) vs ONE
# fact pass: ev_cnt joined once to a combined dim payload (per-doc word
# counts + meta), a NULL-word SENTINEL row per (w, doc) carrying
# (source, ev_cnt), then two stacked aggs:
#   g1 (w,cat,word): word_cnt = sum(ev_cnt*wcnt),
#                    ds  = countDistinct(source | sentinel),
#                    ac  = sum(ev_cnt | sentinel)
#   g2 (w,cat):      max_word_cnt over real words; ds/ac from sentinel
# A (w,cat) whose docs have no words has only the sentinel group ->
# max_word_cnt NULL -> filtered, matching the old inner join between
# per_group and sources.
from pyspark.sql import functions as F
from cdc_pipeline_with_kafka_spark.util import spread
from cdc_pipeline_with_kafka_spark.operators import windows as W


def factored_v2(fact, dim, join_key, ts_col, category_col, text_col,
                source_col, duration="5 minutes", dim_key="doc_id"):
    win = F.window(F.col(ts_col), duration).alias("w")
    ev_cnt = (
        spread(fact)
        .select(win, join_key.alias(dim_key))
        .groupBy("w", dim_key)
        .agg(F.count(F.lit(1)).alias("ev_cnt"))
    )
    doc_words = (
        dim.select(
            F.col(dim_key),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy(dim_key, "word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
        .groupBy(dim_key)
        .agg(F.collect_list(F.struct("word", "wcnt")).alias("_words"))
    )
    combined = (
        dim.select(F.col(dim_key), F.col(category_col).alias("category"),
                   F.col(source_col).alias("source"))
        .join(doc_words, dim_key, "left")
        .select(
            dim_key, "category", "source",
            F.concat(
                F.coalesce(F.col("_words"),
                           F.expr("CAST(array() AS array<struct<word:string,wcnt:bigint>>)")),
                F.array(F.struct(
                    F.lit(None).cast("string").alias("word"),
                    F.lit(0).cast("bigint").alias("wcnt"),
                )),
            ).alias("_words"),
        )
    )
    exploded = (
        ev_cnt.join(F.broadcast(combined), dim_key)
        .select("w", "category", "source", "ev_cnt",
                F.explode("_words").alias("_wd"))
        .select("w", "category", "source", "ev_cnt",
                F.col("_wd.word").alias("word"), F.col("_wd.wcnt").alias("wcnt"))
    )
    sent = F.col("word").isNull()
    g1 = exploded.groupBy("w", "category", "word").agg(
        F.sum(F.col("ev_cnt") * F.col("wcnt")).alias("word_cnt"),
        F.count_distinct(F.when(sent, F.col("source"))).alias("_ds"),
        F.sum(F.when(sent, F.col("ev_cnt"))).alias("_ac"),
    )
    g2 = g1.groupBy("w", "category").agg(
        F.max(F.when(F.col("word").isNotNull(), F.col("word_cnt"))).alias("max_word_cnt"),
        F.max(F.when(F.col("word").isNull(), F.col("_ds"))).alias("distinct_sources"),
        F.max(F.when(F.col("word").isNull(), F.col("_ac"))).alias("article_cnt"),
    )
    return g2.filter(F.col("max_word_cnt").isNotNull()).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "category", "max_word_cnt", "distinct_sources", "article_cnt",
    )


ev = spread(spark.read.parquet(SF + "/events.parquet"))
from cdc_pipeline_with_kafka_spark.sources.tables import load_table
ev = spread(load_table(spark, "events", SF))
docs = load_table(spark, "documents", SF)
n_docs = docs.count()
old = W.breaking_word_stats_factored(ev, docs, F.col("event_id") % n_docs, "ts", "lang", "text", "source", "1 hour")
new = factored_v2(ev, docs, F.col("event_id") % n_docs, "ts", "lang", "text", "source", "1 hour")
cols = ["window_start", "category", "max_word_cnt", "distinct_sources", "article_cnt"]
print("hash old:", hashdf(old.select(cols)))
print("hash new:", hashdf(new.select(cols)))
for _ in range(3):
    print("old t:", time_noop(old), "new t:", time_noop(new))
# edge: dim doc with empty text (no words) + category with only wordless docs
edge_dim = spark.createDataFrame(
    [(0, "hello world hello", "catA", "s1"), (1, "", "catB", "s2"),
     (2, "  ", "catB", "s3"), (3, "solo words here", "catA", "s2")],
    "doc_id long, text string, lang string, source string")
edge_fact = spark.createDataFrame(
    [(i, f"2024-01-01 0{i % 4}:00:00") for i in range(16)],
    "event_id long, tss string").select("event_id", F.col("tss").cast("timestamp_ntz").alias("ts"))
eo = W.breaking_word_stats_factored(edge_fact, edge_dim, F.col("event_id") % 4, "ts", "lang", "text", "source", "1 hour")
en = factored_v2(edge_fact, edge_dim, F.col("event_id") % 4, "ts", "lang", "text", "source", "1 hour")
print("edge old:", sorted(eo.collect()))
print("edge new:", sorted(en.collect()))
