"""Round-4 tier: SemDeDup (similarity.semantic_dedup), bloom-filter
membership (sketch.bloom_*), and C4 heuristic cleaning
(textstats.c4_clean)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.operators import similarity as sim
from cdc_pipeline_with_kafka_spark.operators import sketch as sk
from cdc_pipeline_with_kafka_spark.operators import textstats as ts


def _clustered_vectors():
    """Three well-separated clusters; two contain near-identical pairs."""
    rng = np.random.default_rng(7)
    base = {
        0: np.array([10.0, 0.0, 0.0, 0.0]),
        1: np.array([0.0, 10.0, 0.0, 0.0]),
        2: np.array([0.0, 0.0, 10.0, 0.0]),
    }
    rows = []
    vid = 0
    for c, center in base.items():
        for i in range(6):
            v = center + rng.normal(0, 1.0, 4)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    # near-duplicates: copies of vectors 0 and 6 with tiny noise
    for src in (0, 6):
        v = np.array(rows[src][1]) + rng.normal(0, 1e-4, 4)
        rows.append((vid, [float(x) for x in v], rows[src][2]))
        vid += 1
    return rows


def test_semantic_dedup_finds_near_identical_pairs(spark):
    rows = _clustered_vectors()
    df = spark.createDataFrame([(r[0], r[1]) for r in rows], ["vec_id", "embedding"])
    centroids = sim.train_ivf_codebook(df, nlist=3, iters=8)
    pairs = sim.semantic_dedup_pairs(df, centroids, threshold=0.9999).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 18) in found
    assert (6, 19) in found
    # pairs never straddle clusters
    out = sim.semantic_dedup(df, centroids, threshold=0.9999)
    survivors = out.filter(F.col("is_canonical")).count()
    assert survivors == 18  # 20 vectors - 2 duplicates
    clusters = {r.vec_id: r.cluster_id for r in out.collect()}
    assert clusters[18] == clusters[0] == 0
    assert clusters[19] == clusters[6] == 6


def test_semantic_dedup_max_cluster_size_drops_giant_clusters(spark):
    rows = _clustered_vectors()
    df = spark.createDataFrame([(r[0], r[1]) for r in rows], ["vec_id", "embedding"])
    centroids = sim.train_ivf_codebook(df, nlist=3, iters=8)
    # every cluster has 6-8 members; cap at 2 -> no pairs at all
    assert sim.semantic_dedup_pairs(df, centroids, threshold=0.9, max_cluster_size=2).count() == 0


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    n, num_bits, k = 2000, 1 << 15, 5
    keys = spark.range(n).select(F.concat(F.lit("key"), F.col("id")).alias("k"))
    bloom = sk.bloom_build(keys, "k", num_bits=num_bits, k=k)
    # every inserted key must be found
    probed = sk.bloom_probe(keys, "k", bloom, num_bits=num_bits, k=k)
    assert probed.filter(~F.col("might_contain")).count() == 0
    # fresh keys: FP rate within 3x theoretical
    fresh = spark.range(n).select(F.concat(F.lit("absent"), F.col("id")).alias("k"))
    fp = sk.bloom_probe(fresh, "k", bloom, num_bits=num_bits, k=k).filter(
        F.col("might_contain")
    ).count()
    expected = (1 - math.exp(-k * n / num_bits)) ** k
    assert fp / n <= max(3 * expected, 0.02), (fp / n, expected)


def test_bloom_merge_equals_combined_build(spark):
    a = spark.range(100).select(F.concat(F.lit("a"), F.col("id")).alias("k"))
    b = spark.range(100).select(F.concat(F.lit("b"), F.col("id")).alias("k"))
    nb = 1 << 12
    merged = sk.bloom_merge(
        sk.bloom_build(a, "k", num_bits=nb), sk.bloom_build(b, "k", num_bits=nb)
    )
    direct = sk.bloom_build(a.unionByName(b), "k", num_bits=nb)
    got = {(r.word_idx, r.word) for r in merged.collect()}
    want = {(r.word_idx, r.word) for r in direct.collect()}
    assert got == want


def test_bloom_to_bytes_roundtrip(spark):
    keys = spark.range(50).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
    nb = 1 << 10
    bloom = sk.bloom_build(keys, "k", num_bits=nb, k=3)
    dense = np.frombuffer(sk.bloom_to_bytes(bloom, nb), dtype=np.uint64)
    sparse = {r.word_idx: r.word for r in bloom.collect()}
    for idx in range(nb // 64):
        assert int(dense[idx]) == (sparse.get(idx, 0) & 0xFFFFFFFFFFFFFFFF)


def test_bloom_validates_word_alignment(spark):
    keys = spark.range(3).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        sk.bloom_build(keys, "k", num_bits=100)


C4_DOCS = [
    (1, "This is a perfectly normal sentence with enough words.\n"
        "Another good line that also ends with terminal punctuation!\n"
        "And a third proper sentence closes the document."),
    (2, "short line.\nno punctuation here at all\n"
        "Enable javascript to view this page properly please.\n"
        "Only one good line survives in this document here."),
    (3, "Lorem ipsum dolor sit amet consectetur adipiscing elit sed.\n"
        "A second fine sentence that would otherwise be kept here.\n"
        "A third fine sentence that would otherwise be kept here."),
    (4, "function f() { return 1; } with several words here.\n"
        "A second fine sentence that would otherwise be kept here.\n"
        "A third fine sentence that would otherwise be kept here."),
]


def test_c4_clean_line_and_doc_rules(spark):
    df = spark.createDataFrame(C4_DOCS, ["doc_id", "text"])
    out = {r.doc_id: r for r in ts.c4_clean(df).collect()}
    # doc 1: all three lines kept, doc passes
    assert out[1].n_kept_lines == 3 and out[1].keep
    assert out[1].cleaned_text == C4_DOCS[0][1]
    # doc 2: 'short line.' (<5 words), bare line (no punct), javascript
    # line all drop; only one survivor -> document flagged
    assert out[2].n_kept_lines == 1 and not out[2].keep
    assert out[2].cleaned_text == "Only one good line survives in this document here."
    # doc 3: lorem ipsum anywhere kills the doc even with 3 kept lines
    assert out[3].n_kept_lines == 3 and not out[3].keep
    # doc 4: curly brace kills the doc
    assert not out[4].keep


def test_c4_clean_no_shuffle_in_plan(spark):
    df = spark.createDataFrame(C4_DOCS, ["doc_id", "text"])
    plan = ts.c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bloom_probe_bytes_matches_join_probe(spark):
    n, nb, k = 500, 1 << 13, 4
    keys = spark.range(n).select(F.concat(F.lit("key"), F.col("id")).alias("k"))
    mixed = spark.range(2 * n).select(
        F.when(F.col("id") < n, F.concat(F.lit("key"), F.col("id")))
        .otherwise(F.concat(F.lit("no"), F.col("id"))).alias("k")
    )
    bloom = sk.bloom_build(keys, "k", num_bits=nb, k=k)
    via_join = {
        r.k: r.might_contain
        for r in sk.bloom_probe(mixed, "k", bloom, num_bits=nb, k=k).collect()
    }
    dense = sk.bloom_to_bytes(bloom, nb)
    via_bytes = {
        r.k: r.might_contain
        for r in sk.bloom_probe_bytes(mixed, "k", dense, num_bits=nb, k=k).collect()
    }
    assert via_join == via_bytes
    assert all(via_bytes[f"key{i}"] for i in range(n))  # no false negatives
    with pytest.raises(ValueError):
        sk.bloom_probe_bytes(mixed, "k", dense[:-1], num_bits=nb, k=k)


def test_bloom_probe_bytes_nonstring_and_null_keys_match_join_probe(spark):
    """Build and both probes share ONE key normalization (JVM
    cast('string')): boolean keys hash as 'true'/'false' everywhere,
    and NULL keys NULL-propagate in both probe variants."""
    nb, k = 1 << 10, 3
    base = spark.createDataFrame([(True,), (None,)], "k boolean")
    bloom = sk.bloom_build(base.filter("k is not null"), "k", num_bits=nb, k=k)
    probe = spark.createDataFrame([(True,), (False,), (None,)], "k boolean")
    via_join = {
        r.k: r.might_contain
        for r in sk.bloom_probe(probe, "k", bloom, num_bits=nb, k=k).collect()
    }
    dense = sk.bloom_to_bytes(bloom, nb)
    via_bytes = {
        r.k: r.might_contain
        for r in sk.bloom_probe_bytes(probe, "k", dense, num_bits=nb, k=k).collect()
    }
    assert via_join == via_bytes
    assert via_bytes[True] is True
    assert via_bytes[None] is None


def test_bloom_probe_bytes_has_no_python_hashing(spark):
    """The dense probe's Python stage must be a numpy gather only: the
    k md5 positions appear in the JVM plan (conv/substring/md5 chain),
    shipped into mapInPandas as a column — not recomputed per row in
    Python."""
    nb, k = 1 << 10, 3
    keys = spark.range(4).select(F.col("id").cast("string").alias("k"))
    dense = sk.bloom_to_bytes(sk.bloom_build(keys, "k", num_bits=nb, k=k), nb)
    df = sk.bloom_probe_bytes(keys, "k", dense, num_bits=nb, k=k)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" in plan  # positions computed JVM-side
    import inspect

    src = inspect.getsource(sk.bloom_probe_bytes)
    assert "hashlib" not in src
