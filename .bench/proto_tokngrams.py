# A/B: old sequence-transform token_ngrams / classify bigrams vs the
# r12 zip-slice module code — value equality (hashdf) + interleaved speed.
from cdc_pipeline_with_kafka_spark.operators.dedup import (
    normalized_text, token_ngrams,
)


def token_ngrams_old(col, n=3):
    tokens = F.split(normalized_text(col), " ")
    count = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(1)))
    grams = F.when(
        count > 0,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n))),
    ).otherwise(F.array())
    return F.array_distinct(grams)


docs = q._t(spark, SF, "documents")
old_g = docs.select("doc_id", F.explode(token_ngrams_old(F.col("text"), 3)).alias("g")).select("doc_id", F.md5("g").alias("h"))
new_g = docs.select("doc_id", F.explode(token_ngrams(F.col("text"), 3)).alias("g")).select("doc_id", F.md5("g").alias("h"))
print("tok hash old:", hashdf(old_g))
print("tok hash new:", hashdf(new_g))
print("tok", [(time_noop(old_g, 2), time_noop(new_g, 2)) for _ in range(3)])

from cdc_pipeline_with_kafka_spark.operators.classify import _tokens as _ctoks

toks = _ctoks(F.col("text"))
big_old = F.when(
    F.size(toks) >= 2,
    F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
    ),
).otherwise(F.array().cast("array<string>"))
_bcnt = F.size(toks) - F.lit(1)
big_new = F.when(
    F.size(toks) >= 2,
    F.transform(
        F.arrays_zip(
            F.slice(toks, 1, _bcnt).alias("t0"), F.slice(toks, 2, _bcnt).alias("t1")
        ),
        lambda g: F.concat_ws(" ", g["t0"], g["t1"]),
    ),
).otherwise(F.array().cast("array<string>"))
b_old = docs.select("doc_id", F.posexplode(big_old).alias("p", "g")).select("doc_id", "p", F.md5("g").alias("h"))
b_new = docs.select("doc_id", F.posexplode(big_new).alias("p", "g")).select("doc_id", "p", F.md5("g").alias("h"))
print("big hash old:", hashdf(b_old))
print("big hash new:", hashdf(b_new))
print("big", [(time_noop(b_old, 2), time_noop(b_new, 2)) for _ in range(3)])
