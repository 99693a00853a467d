# Interleaved A/B: classify chi2/dsir branches, zip-slice bigrams (new,
# shipped) vs the old slice-per-element transform — monkeypatch swap.
from pyspark.sql import functions as F
import cdc_pipeline_with_kafka_spark.operators.classify as CL

_new_doc_features = CL._doc_features

def _doc_features_old(df, text_col, id_col, hash_buckets):
    toks = CL._tokens(F.col(text_col))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    return CL.spread(df, id_col).select(
        F.col(id_col).alias("id"), F.explode_outer(feats).alias("feat")
    ).filter(F.col("feat").isNotNull()).select(
        "id", CL._feature_hash(F.col("feat"), hash_buckets).alias("bucket")
    )

res = {"old": {"chi2": [], "dsir": []}, "new": {"chi2": [], "dsir": []}}
for rnd in range(3):
    for tag, fn in (("old", _doc_features_old), ("new", _new_doc_features)):
        CL._doc_features = fn
        df = q.classify_suite(spark, SF)
        res[tag]["chi2"].append(time_branch(df, 'chi2'))
        res[tag]["dsir"].append(time_branch(df, 'dsir'))
CL._doc_features = _new_doc_features
print("AB RESULT", res)
