"""Trainable BPE tokenizer: deterministic training, merge semantics,
Spark-UDF ≡ pure-Python apply, and corpus token accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.operators import tokenize

from .conftest import SF_SMOKE


def test_train_bpe_learns_frequent_word(spark):
    # 'the' appears constantly → its full merge chain should be learned
    df = spark.createDataFrame(
        [(i, "the cat and the dog and the bird") for i in range(20)],
        "doc_id long, text string",
    )
    merges = tokenize.train_bpe(df, num_merges=50)
    assert merges  # learned something
    toks = tokenize.bpe_tokenize_py("the the", merges)
    assert toks == [f"the{tokenize.EOW}", f"the{tokenize.EOW}"]  # one token per word
    # unseen word falls back to learned subwords/chars, never crashes
    assert "".join(tokenize.bpe_tokenize_py("zzzq", merges)).rstrip(tokenize.EOW) == "zzzq"


def test_train_bpe_deterministic_and_capped(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    m1 = tokenize.train_bpe(docs, num_merges=60)
    m2 = tokenize.train_bpe(docs, num_merges=60)
    assert m1 == m2
    # cap changes the sample → (very likely) different merges, but both valid
    m_cap = tokenize.train_bpe(docs, num_merges=60, max_train_rows=50)
    assert len(m_cap) <= 60
    with pytest.raises(ValueError):
        tokenize.train_bpe(docs, num_merges=10, max_train_rows=0)


def test_bpe_udf_matches_python_model(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    merges = tokenize.train_bpe(docs, num_merges=80)
    tok_udf, _ = tokenize.make_bpe_udfs(merges)
    got = {
        r["doc_id"]: list(r["toks"])
        for r in docs.select("doc_id", tok_udf(F.col("text")).alias("toks")).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == tokenize.bpe_tokenize_py(r["text"], merges)


def test_bpe_token_counts_reconstruction(spark):
    """Every doc's tokens re-join to its lowercased words (BPE is a
    partition of the word, never lossy), and counts match tokenize."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(30)
    merges = tokenize.train_bpe(docs, num_merges=40)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in tokenize.bpe_token_counts(docs, merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        toks = tokenize.bpe_tokenize_py(r["text"], merges)
        assert counts[r["doc_id"]] == len(toks)
        rebuilt = "".join(toks).replace(tokenize.EOW, " ").strip()
        assert rebuilt == " ".join((r["text"] or "").lower().split())
