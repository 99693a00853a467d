# A/B winnow_fingerprints: O(n*w) interpreted aggregate-fold argmin vs
# w shifted slices zipped once + least() + rightmost-position when-chain.
from pyspark.sql import functions as F
from cdc_pipeline_with_kafka_spark.operators import spans as SP
from cdc_pipeline_with_kafka_spark.operators.spans import _tokens
from cdc_pipeline_with_kafka_spark.operators.textstats import _word_ngrams
from cdc_pipeline_with_kafka_spark.util import spread
from cdc_pipeline_with_kafka_spark import queries as Q


def winnow_fingerprints_v2(df, k=4, w=4, text_col="text", id_col="doc_id"):
    toks = _tokens(F.col(text_col))
    hs_expr = F.transform(
        _word_ngrams(toks, k),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint"),
    )
    base = spread(df, id_col).select(
        F.col(id_col).alias("id"), F.explode(F.array(hs_expr)).alias("hs")
    )
    hs = F.col("hs")
    n = F.size(hs)
    m = F.greatest(n - F.lit(w - 1), F.lit(1))
    zipped = F.arrays_zip(
        *[F.slice(hs, 1 + i, m).alias(f"t{i}") for i in range(w)]
    )

    def pick(g, j):
        fp = F.least(*[g[f"t{i}"] for i in range(w)])
        pos = j
        chain = F.when(g[f"t{w-1}"] == fp, F.lit(w - 1))
        for i in range(w - 2, 0, -1):
            chain = chain.when(g[f"t{i}"] == fp, F.lit(i))
        chain = chain.otherwise(F.lit(0))
        return F.struct(
            fp.alias("fp"), (j + chain).cast("int").alias("pos")
        )

    sel = F.when(
        n > 0, F.array_distinct(F.transform(zipped, pick))
    ).otherwise(F.array().cast("array<struct<fp:bigint,pos:int>>"))
    return base.select("id", F.explode(sel).alias("s")).select(
        "id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp")
    )


docs = spark.read.parquet(SF + "/documents.parquet")
planted = docs.select(
    "doc_id",
    F.concat(F.substring("text", 1, 100), F.lit(" tail alpha variant")).alias("text"),
).unionByName(
    docs.select(
        (F.col("doc_id") + Q._WINNOW_TWIN).alias("doc_id"),
        F.concat(F.substring("text", 1, 100), F.lit(" tail beta variant")).alias("text"),
    )
)
for name, d in (("docs", docs), ("planted", planted)):
    old = SP.winnow_fingerprints(d, k=4, w=4)
    new = winnow_fingerprints_v2(d, k=4, w=4)
    print(name, "hash old:", hashdf(old))
    print(name, "hash new:", hashdf(new))
    for _ in range(3):
        print(name, "old t:", time_noop(old), "new t:", time_noop(new))
# short-doc edge cases incl. ties and <w grams
edge = spark.createDataFrame(
    [(1, "a b c d e"), (2, "a a a a a a"), (3, "x y"), (4, None), (5, ""),
     (6, "p q r s t u v w x y z"), (7, "m m m m m m m m m m")],
    "doc_id long, text string")
print("edge old:", sorted(SP.winnow_fingerprints(edge, k=2, w=3).collect()))
print("edge new:", sorted(winnow_fingerprints_v2(edge, k=2, w=3).collect()))
