"""Curation operators (sampling / packing / TF-IDF) and near-dup
connected-components clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.operators import curation, dedup


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3 + pair 10-11 + isolated (absent from pairs)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["cluster_id"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # worst-case diameter: a 12-node path — needs multiple rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "id_a long, id_b long"
    )
    comp = dedup.connected_components(pairs).collect()
    assert {r["cluster_id"] for r in comp} == {1}
    assert len(comp) == 12


def test_dedup_survivors_marks_one_canonical_per_cluster(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame([(2, 5), (5, 6)], "id_a long, id_b long")
    out = dedup.dedup_survivors(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["cluster_id"] == by_id[5]["cluster_id"] == by_id[6]["cluster_id"] == 2
    assert by_id[2]["is_canonical"] and not by_id[5]["is_canonical"]
    # singletons are their own canonical cluster
    assert by_id[1]["cluster_id"] == 1 and by_id[1]["is_canonical"]
    n_canonical = sum(1 for r in out if r["is_canonical"])
    assert n_canonical == 5  # 4 singletons + 1 cluster survivor


def test_hash_sample_reproducible_and_stratified(spark):
    df = spark.range(1, 2001).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    s1 = {r["doc_id"] for r in curation.hash_sample(df, 20, "doc_id", salt="x:").collect()}
    s2 = {r["doc_id"] for r in curation.hash_sample(df, 20, "doc_id", salt="x:").collect()}
    assert s1 == s2  # reproducible
    assert 0.15 < len(s1) / 2000 < 0.25  # ≈20%
    # a higher rate strictly contains the lower rate (nested samples)
    s_half = {r["doc_id"] for r in curation.hash_sample(df, 50, "doc_id", salt="x:").collect()}
    assert s1 <= s_half
    # stratified: en at 5%, zh at 50%
    strat = curation.hash_sample(
        df, 20, "doc_id", salt="x:", stratum_col="lang",
        stratum_rates={"en": 5, "zh": 50},
    )
    counts = {r["lang"]: r["cnt"] for r in strat.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert counts["zh"] > counts["en"] * 3


def test_pack_sequential_blocks(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 50), (5, 300)],
        "doc_id long, n_tokens long",
    )
    out = {
        r["doc_id"]: (r["start_block"], r["end_block"], r["block_offset"])
        for r in curation.pack_sequential(df, "n_tokens", 250, "doc_id").collect()
    }
    # cum: 100,200,300,350,650 → budget 250
    assert out[1] == (0, 0, 0)
    assert out[2] == (0, 0, 100)
    assert out[3] == (0, 1, 200)  # spans the 250 boundary
    assert out[4] == (1, 1, 50)
    assert out[5] == (1, 2, 100)
    # invariant: blocks are contiguous and offsets stay inside budget
    assert all(0 <= off < 250 for _, _, off in out.values())


def test_tfidf_rare_term_outranks_common(spark):
    rows = [(i, "common shared words everywhere") for i in range(1, 10)]
    rows.append((10, "common rareword rareword"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = curation.tfidf_top_terms(df, k=1).collect()
    by_id = {r["doc_id"]: r["term"] for r in top}
    assert by_id[10] == "rareword"  # tf=2 AND rare beats the shared terms


def test_connected_components_raises_when_not_converged(spark):
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=2)


def test_curate_corpus_end_to_end(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8, n=3)
    out = curation.curate_corpus(
        docs,
        min_quality=0.3,
        near_dup_pairs=pairs,
        sample_rate_pct=50,
        stratum_col="lang",
        pack_budget=4096,
        token_col="n_chars",
        salt="e2e:",
    )
    rows = out.collect()
    assert 0 < len(rows) < docs.count()
    # packed columns present and sane
    assert all(0 <= r["block_offset"] < 4096 for r in rows)
    assert all(r["end_block"] >= r["start_block"] for r in rows)
    # deterministic: same inputs → identical output
    again = curation.curate_corpus(
        docs, min_quality=0.3, near_dup_pairs=pairs, sample_rate_pct=50,
        stratum_col="lang", pack_budget=4096, token_col="n_chars", salt="e2e:",
    ).collect()
    key = lambda r: r["doc_id"]
    assert sorted(rows, key=key) == sorted(again, key=key)


def test_curate_corpus_with_repetition_and_decontamination(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique words alpha beta gamma delta epsilon zeta eta theta"),
            (2, "spam spam spam spam spam spam spam spam"),  # repetition-filtered
            (3, "held out secret eval phrase plus other words here too"),
            (4, "contains the held out secret eval phrase embedded inside"),  # contaminated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "held out secret eval phrase")], "doc_id long, text string"
    )
    out = curation.curate_corpus(
        docs.filter(F.col("doc_id") != 3),
        min_quality=None,
        repetition_ppm_max=500_000,
        benchmark=bench,
        decontam_n=4,
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1]  # 2 repetition-filtered, 4 decontaminated
