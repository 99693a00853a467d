"""Winnowing fingerprints (Schleimer et al. 2003) — twin parity,
the substring-match guarantee, density, and pair candidates."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.operators import spans

from .conftest import SF_SMOKE

K, W = 4, 4


def test_winnow_matches_pure_python_twin_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = sorted(
        (r["id"], r["pos"], r["fp"])
        for r in spans.winnow_fingerprints(docs, k=K, w=W).collect()
    )
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text,'') FROM "
        f"'{SF_SMOKE}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    want = sorted(
        (d, pos, fp)
        for d, t in rows
        for pos, fp in spans.winnow_fps_py(t, k=K, w=W)
    )
    assert got == want and len(got) > 0


@settings(max_examples=60, deadline=None)
@given(
    shared=st.lists(st.sampled_from("abcdefg"), min_size=W + K - 1, max_size=12),
    pre=st.lists(st.sampled_from("xyzuvw"), max_size=6),
    post=st.lists(st.sampled_from("mnopqr"), max_size=6),
)
def test_guarantee_shared_passage_shares_a_fingerprint(shared, pre, post):
    """Any shared passage of ≥ w+k−1 tokens must yield ≥1 common
    fingerprint (the winnowing guarantee) — pure-twin property."""
    a = " ".join(pre + shared)
    b = " ".join(shared + post)
    fa = {fp for _, fp in spans.winnow_fps_py(a, k=K, w=W)}
    fb = {fp for _, fp in spans.winnow_fps_py(b, k=K, w=W)}
    assert fa & fb


def test_density_is_bounded(spark):
    """Fingerprints per doc ≈ 2/(w+1) of grams — never more than the
    gram count, never fewer than 1/w of windows (selection emits at
    least one fp per disjoint window block)."""
    rows = duckdb.sql(
        f"SELECT coalesce(text,'') FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    for (t,) in rows[:50]:
        toks = spans.winnow_fps_py(t, k=K, w=W)
        n_grams = max(len(t.split()) - K + 1, 0)
        if n_grams == 0:
            assert toks == []
            continue
        assert 1 <= len(toks) <= n_grams
        assert len(toks) >= (max(n_grams - W + 1, 1)) // W


def test_short_doc_single_window_fp(spark):
    # 4 tokens = exactly one gram (< w windows) → exactly one fp
    assert len(spans.winnow_fps_py("a b c d", k=K, w=W)) == 1
    assert spans.winnow_fps_py("a b c", k=K, w=W) == []


def test_winnow_pairs_finds_planted_overlap(spark):
    """Two docs share a 7-token passage (= w+k−1); a third is
    disjoint — the sharing pair MUST appear, the disjoint doc must
    pair with nobody."""
    passage = "alpha beta gamma delta epsilon zeta eta"
    docs = spark.createDataFrame(
        [
            (0, f"one two {passage} three"),
            (1, f"{passage} four five six"),
            (2, "totally different words everywhere all the time"),
        ],
        "doc_id long, text string",
    )
    pairs = spans.winnow_pairs(docs, k=K, w=W).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}
    assert pairs[0]["shared_fps"] >= 1


def test_winnow_pairs_max_fp_df_caps_hot_lists(spark):
    """A fingerprint shared by every doc is a hot posting list —
    max_fp_df must drop it (no pairs survive)."""
    passage = "alpha beta gamma delta epsilon zeta eta"
    docs = spark.createDataFrame(
        [(i, passage) for i in range(6)], "doc_id long, text string"
    )
    assert spans.winnow_pairs(docs, k=K, w=W).count() == 15  # 6C2
    assert spans.winnow_pairs(docs, k=K, w=W, max_fp_df=3).count() == 0


def test_winnow_plan_is_shuffle_free_until_pairing(spark):
    """The fingerprint stage is in-row JVM work: its plan must contain
    no Exchange (spread() may add one only for tiny single-file local
    inputs — use a multi-partition literal frame)."""
    docs = spark.range(0, 64).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit("t"), (F.col("id") * 7 + i) % 13).cast("string")
                   for i in range(12)]
        ).alias("text"),
    )
    plan = (
        spans.winnow_fingerprints(docs, k=K, w=W)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only allowed Exchange is spread()'s REPARTITION_BY_NUM over
    # the tiny no-file local input (a no-op at scale); the winnow
    # computation itself must add no shuffle and no window
    import re

    exchanges = re.findall(r"Exchange \w+\([^)]*\), (\w+)", plan)
    assert exchanges and all(k == "REPARTITION_BY_NUM" for k in exchanges), plan
    assert "Window" not in plan and "SortMergeJoin" not in plan
    # the hash array must be pinned by the explode barrier: md5/conv
    # hashing is evaluated ONCE per document, not re-inlined into every
    # sliding-argmin lambda reference (which would be O(n²·w) work)
    assert plan.count("md5(") <= 2, f"hash pipeline re-inlined {plan.count('md5(')}x"


def test_winnow_pairs_incremental_equals_full_restriction(spark):
    """The incremental-family contract for the winnowing tier: a shard
    paired against the persisted fingerprint index must equal the full
    pair set restricted to shard-touching pairs — boundary cutoffs
    included — and never pay index×index cost."""
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, f"{passage} filler{i} more{i}") for i in range(8)]
        + [(8, "entirely different content with no overlap at all here")],
        "doc_id long, text string",
    )
    full = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in spans.winnow_pairs(docs, k=K, w=W).collect()
    }
    n = 9
    for cutoff in (0, 4, n):
        index = spans.winnow_fingerprints(
            docs.filter(F.col("doc_id") < cutoff), k=K, w=W
        )
        got = {
            (r["id_a"], r["id_b"]): r["shared_fps"]
            for r in spans.winnow_pairs_incremental(
                docs.filter(F.col("doc_id") >= cutoff), index, k=K, w=W
            ).collect()
        }
        want = {
            p: s for p, s in full.items() if p[0] >= cutoff or p[1] >= cutoff
        }
        assert got == want, f"cutoff={cutoff}"


def test_winnow_pairs_incremental_readmitted_doc_no_self_pair(spark):
    """A doc present in BOTH the shard and the index must not pair
    with itself or double-count shared fingerprints."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    index = spans.winnow_fingerprints(docs, k=K, w=W)
    pairs = spans.winnow_pairs_incremental(docs, index, k=K, w=W).collect()
    assert pairs == []


def test_winnow_novelty_grades_overlap(spark):
    """A verbatim re-submission scores 0 novelty, a fresh doc 1e6, a
    half-overlapping doc in between; cold start = all novel."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame([(0, base)], "doc_id long, text string")
    index = spans.winnow_fingerprints(docs, k=K, w=W)
    shard = spark.createDataFrame(
        [
            (10, base),                                   # exact resubmit
            (11, f"{base} mu nu xi omicron pi rho sigma"),  # extended
            (12, "completely different words all over the place now"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r
        for r in spans.winnow_novelty(shard, index, k=K, w=W).collect()
    }
    assert rows[10]["novelty_ppm"] == 0
    assert rows[12]["novelty_ppm"] == 1_000_000 and rows[12]["known_fps"] == 0
    assert 0 < rows[11]["novelty_ppm"] < 1_000_000
    # exactness: ppm is the integral div of the counts it reports
    r11 = rows[11]
    assert r11["novelty_ppm"] == (r11["n_fps"] - r11["known_fps"]) * 1_000_000 // r11["n_fps"]
    # cold start: everything novel
    cold = spans.winnow_novelty(shard, None, k=K, w=W).collect()
    assert all(r["novelty_ppm"] == 1_000_000 for r in cold)


def test_interval_join_with_key_cols(spark):
    """Keyed interval join: points only match intervals of the SAME
    key (sessions-of-this-user shape)."""
    from cdc_pipeline_with_kafka_spark.operators import relational

    points = spark.createDataFrame(
        [(0, "u1", 15), (1, "u2", 15)], "pid long, user string, v long"
    )
    intervals = spark.createDataFrame(
        [(100, "u1", 10, 20)], "iid long, user string, s long, e long"
    )
    got = relational.interval_join(
        points, intervals, "v", "s", "e", bucket_width=8, key_cols=["user"]
    ).collect()
    assert [(r["pid"], r["iid"]) for r in got] == [(0, 100)]


def test_novelty_weighted_sample_soft_dedup(spark):
    """Fully novel docs always survive; verbatim resubmissions survive
    at ~floor_ppm; the decision is deterministic under a fixed salt."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame([(0, base)], "doc_id long, text string")
    index = spans.winnow_fingerprints(corpus, k=K, w=W)
    shard = spark.createDataFrame(
        [(i, base) for i in range(100, 160)]          # 60 resubmissions
        + [(i, f"fresh text number {i} with unique tokens {i*3} {i*7} {i*11}")
           for i in range(200, 220)],                  # 20 novel docs
        "doc_id long, text string",
    )
    kept = spans.novelty_weighted_sample(
        shard, index, floor_ppm=100_000, k=K, w=W, salt="nv:"
    )
    rows = kept.collect()
    kept_ids = {r["doc_id"] for r in rows}
    # every novel doc survives (keep_ppm = 1e6 > any bucket)
    assert set(range(200, 220)) <= kept_ids
    # resubmissions are heavily down-sampled (expected ~6 of 60)
    n_resub = sum(1 for i in kept_ids if i < 200)
    assert n_resub < 20
    ppms = {r["doc_id"]: (r["novelty_ppm"], r["keep_ppm"]) for r in rows}
    for i in kept_ids:
        if i < 200:
            assert ppms[i] == (0, 100_000)
        else:
            assert ppms[i][1] == 1_000_000
    # determinism: same salt → same subset
    again = {
        r["doc_id"]
        for r in spans.novelty_weighted_sample(
            shard, index, floor_ppm=100_000, k=K, w=W, salt="nv:"
        ).collect()
    }
    assert again == kept_ids
