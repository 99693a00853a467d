"""Bigram-LM perplexity scoring: fluent text scores lower than
shuffled/gibberish text, training is deterministic, the filter keeps
the plausible docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.operators import lm

_SENTS = [
    "the cat sat on the mat",
    "the dog ran in the park",
    "a cat and a dog played in the park",
    "the bird sat in a tree near the park",
    "a dog sat near the cat on the mat",
] * 8


def _train_df(spark):
    return spark.createDataFrame(
        list(enumerate(_SENTS)), "doc_id long, text string"
    )


def test_fluent_beats_gibberish(spark):
    model = lm.train_bigram_lm(_train_df(spark))
    fluent = model.perplexity("the cat sat in the park")
    scrambled = model.perplexity("park the in sat cat the")
    gibberish = model.perplexity("zxq qlm wvb trk pld nfg")
    # the ordering that makes the filter useful — and specifically the
    # gibberish ≫ scrambled half, which plain add-k gets BACKWARDS
    # without the UNK open-vocab mass spreading (lm.BigramLM docstring)
    assert fluent < scrambled < gibberish
    assert model.perplexity("") == float("inf")


def test_training_deterministic_and_capped(spark):
    df = _train_df(spark)
    m1, m2 = lm.train_bigram_lm(df), lm.train_bigram_lm(df)
    assert m1.uni == m2.uni and m1.bi == m2.bi and m1.vocab == m2.vocab
    small = lm.train_bigram_lm(df, max_vocab=3)
    assert len(small.vocab) == 3  # top-3 by frequency, rest folded to UNK
    with pytest.raises(ValueError):
        lm.train_bigram_lm(df, max_train_rows=0)


def test_doc_perplexity_udf_matches_model(spark):
    df = _train_df(spark)
    model = lm.train_bigram_lm(df)
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "qq zz xx"), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["ppl"] for r in lm.doc_perplexity(docs, model).collect()}
    assert got[1] == round(model.perplexity("the cat sat on the mat"), 6)
    assert got[2] == round(model.perplexity("qq zz xx"), 6)
    assert got[3] == float("inf")  # null text


def test_perplexity_filter_keeps_plausible(spark):
    df = _train_df(spark)
    model = lm.train_bigram_lm(df)
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zxq qlm wvb trk pld nfg")],
        "doc_id long, text string",
    )
    cutoff = model.perplexity("the cat sat on the mat") + 1.0
    kept = [r["doc_id"] for r in lm.perplexity_filter(docs, model, cutoff).collect()]
    assert kept == [1]


def test_perplexity_buckets_terciles(spark):
    df = _train_df(spark)
    model = lm.train_bigram_lm(df)
    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_SENTS[:5])]
        + [(100, "park the in sat cat the"), (101, "zxq qlm wvb trk pld nfg")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bucket"] for r in lm.perplexity_buckets(docs, model).collect()}
    assert out[101] == "tail"        # gibberish lands in the worst tercile
    assert out[0] in ("head", "middle")  # training sentence scores well
    from collections import Counter

    counts = Counter(out.values())
    assert set(counts) <= {"head", "middle", "tail"} and len(counts) >= 2
    # exact and approx cuts agree on this tiny corpus
    exact = {r["doc_id"]: r["bucket"]
             for r in lm.perplexity_buckets(docs, model, approx=False).collect()}
    assert exact == out


def test_buckets_exact_vs_gk_equivalence_at_tolerance(spark):
    """The GK-sketch terciles (100 TB path) must agree with the exact
    rank-based cuts up to sketch accuracy: both branches return actual
    data values (no interpolation), so at n ≪ accuracy=10k the sketch
    is lossless and bucket assignment may differ only on docs tied at
    a cut boundary."""
    from .conftest import SF_CORRECT

    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    model = lm.train_bigram_lm(docs)
    exact = {r.doc_id: r.bucket
             for r in lm.perplexity_buckets(docs, model, approx=False).collect()}
    gk = {r.doc_id: r.bucket
          for r in lm.perplexity_buckets(docs, model).collect()}
    assert exact.keys() == gk.keys()
    n = len(exact)
    n_diff = sum(1 for k in exact if exact[k] != gk[k])
    assert n_diff / n <= 0.02, f"{n_diff}/{n} bucket disagreements"
