"""Triage the mid-bench span_dedup.rep flag (0.99 -> 1.73 raw): interleaved
A/B of repeated_spans over the rep_docs corpus with the OLD (slice-per-element
lambda) vs NEW (zip-slice) _word_ngrams, monkeypatched in one session so host
drift cancels.  Also hashes both outputs to re-confirm value identity."""
import time
from pyspark.sql import functions as F

exec(open('.bench/harness.py').read())  # noqa: F821 — provides spark, q, SF, time_df, hashdf

from cdc_pipeline_with_kafka_spark.operators import textstats, spans as spans_ops
from cdc_pipeline_with_kafka_spark.queries import _t

docs = _t(spark, SF, "documents")
rep_docs = docs.select(
    "doc_id",
    F.concat_ws(
        " ",
        F.substring("text", 1, 80),
        F.substring("text", 1, 80),
        F.lit("closing unique tail words"),
    ).alias("text"),
)

new_ngrams = textstats._word_ngrams


def old_ngrams(tokens, n):
    cnt = F.size(tokens) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def build(impl):
    textstats._word_ngrams = impl
    spans_ops._word_ngrams = impl
    try:
        return spans_ops.repeated_spans(rep_docs, k=5, min_count=2, policy="keep_first")
    finally:
        textstats._word_ngrams = new_ngrams
        spans_ops._word_ngrams = new_ngrams


df_old = build(old_ngrams)
df_new = build(new_ngrams)
print("hash old:", hashdf(df_old))  # noqa: F821
print("hash new:", hashdf(df_new))  # noqa: F821

for rnd in range(3):
    a = time_df(df_old, n=2, label=f"rep-old-{rnd}")  # noqa: F821
    b = time_df(df_new, n=2, label=f"rep-new-{rnd}")  # noqa: F821
    print(f"round {rnd}: old={a}  new={b}")
