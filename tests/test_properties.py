"""Property-based tests (hypothesis): column-expression operators vs
pure-Python models on arbitrary inputs — the correctness net under the
oracle gate."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.functions import text as textfn
from cdc_pipeline_with_kafka_spark.operators import textstats

# hypothesis + Spark: one Spark job per example is slow, so examples
# are batched into a single DataFrame per property.

_WORD = st.text(
    alphabet=st.sampled_from(
        "가나다라마바사아자차대통령경제금리은는이가을를의에서와과도만"
        "밖뿐라서한테께부터마저조차다가면서지만거나든지로"
    ),
    min_size=1,
    max_size=12,
)

# The reference's four groups, verbatim (hybrid_keyword_extractor.py:59-64).
_JOSA_PATTERNS = [
    r"(을|를|이|가|은|는|에|에서|에게|한테|께|으로|로|와|과|랑|이랑)$",
    r"(의|도|만|까지|부터|마저|조차|밖에|뿐|라도|라서)$",
    r"(에서|에게|한테서|로부터|으로부터)$",
    r"(다가|면서|지만|거나|든지)$",
]


def _py_strip_josa(word: str) -> str:
    for pat in _JOSA_PATTERNS:
        word = re.sub(pat, "", word)
    return word.strip()


@settings(max_examples=20, deadline=None)
@given(st.lists(_WORD, min_size=1, max_size=30))
def test_strip_josa_matches_python(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = [r["s"] for r in df.select(textfn.strip_josa(F.col("w")).alias("s")).collect()]
    assert got == [_py_strip_josa(w) for w in words]


def _py_merge_capped(a: list[str], b: list[str], cap: int = 6) -> list[str]:
    out, seen = [], set()
    for w in a + b:
        if w.lower() not in seen:
            seen.add(w.lower())
            out.append(w)
    return out[:cap]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.text(alphabet="abcABC가나", min_size=1, max_size=4), max_size=8),
    st.lists(st.text(alphabet="abcABC가나", min_size=1, max_size=4), max_size=8),
)
def test_merge_keywords_capped_matches_python(spark, a, b):
    df = spark.createDataFrame([(a, b)], "a array<string>, b array<string>")
    got = df.select(
        textfn.merge_keywords_capped(F.col("a"), F.col("b")).alias("m")
    ).collect()[0]["m"]
    assert got == _py_merge_capped(a, b)


@settings(max_examples=15, deadline=None)
@given(st.text(alphabet="abc def 가나다 .!?19 ", min_size=0, max_size=200))
def test_quality_score_bounded(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        textstats.quality_score(F.col("t")).alias("q"),
        textstats.token_count(F.col("t")).alias("n"),
        textstats.stopword_ratio(F.col("t")).alias("sw"),
    ).collect()[0]
    assert 0.0 <= row["q"] <= 1.0
    assert row["n"] >= 0
    assert 0.0 <= row["sw"] <= 1.0


def _py_token_jaccard(a: str, b: str) -> float:
    sa = set(re.sub(r"\s+", " ", a.lower()).strip().split(" ")) - {""}
    sb = set(re.sub(r"\s+", " ", b.lower()).strip().split(" ")) - {""}
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab cd ef gh ", min_size=5, max_size=60), min_size=2, max_size=6
    )
)
def test_minhash_estimate_tracks_true_jaccard(spark, texts):
    """MinHash estimated Jaccard stays within a coarse band of true
    Jaccard (16 hashes → ±~0.35 at 95%); exact-dup pairs estimate 1.0."""
    from cdc_pipeline_with_kafka_spark.operators import dedup

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(df, threshold=0.0, num_hashes=16, bands=16, shingle_n=1)
    for r in pairs.collect():
        true_j = _py_token_jaccard(texts[r["id_a"]], texts[r["id_b"]])
        assert abs(r["est_jaccard"] - true_j) <= 0.45
        if texts[r["id_a"]].strip() and _py_token_jaccard(texts[r["id_a"]], texts[r["id_b"]]) == 1.0:
            assert r["est_jaccard"] == 1.0


def _py_jaccard_pairs(docs: list[tuple[int, str]], n: int, threshold: float):
    """Pure-Python n-gram Jaccard over normalized text (the model for
    dedup.ngram_jaccard_pairs' posting-list plan)."""
    sets = {}
    for i, text in docs:
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        toks = norm.split(" ")
        grams = {
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        } if len(toks) >= n else set()
        sets[i] = grams
    out = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= threshold:
                out[(a, b)] = round(j, 6)
    return out


_DOC_TEXT = st.lists(
    st.sampled_from(["the", "quick", "fox", "jumps", "over", "dog", "데이터", "엔진"]),
    min_size=0,
    max_size=12,
).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(st.lists(_DOC_TEXT, min_size=2, max_size=8), st.sampled_from([1, 2, 3]))
def test_ngram_jaccard_pairs_match_python(spark, texts, n):
    from cdc_pipeline_with_kafka_spark.operators import dedup

    docs = [(i + 1, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.3, n=n).collect()
    }
    want = _py_jaccard_pairs(docs, n, 0.3)
    assert got == want


def _py_asof(left, right):
    """Pure-Python backward as-of: latest right (ts, val) per key with
    rts <= ts, else None."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, rts, val in right:
        by_key[k].append((rts, val))
    for k in by_key:
        by_key[k].sort()
    out = {}
    for k, ts, lid in left:
        best = None
        for rts, val in by_key.get(k, []):
            if rts <= ts:
                best = val
            else:
                break
        out[lid] = best
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 50), st.integers(0, 10_000)),
        min_size=1, max_size=25, unique_by=lambda t: t[2],
    ),
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 50), st.floats(0, 100, allow_nan=False)),
        min_size=0, max_size=25, unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_asof_join_matches_python_model(spark, left_rows, right_rows):
    from cdc_pipeline_with_kafka_spark.operators.relational import asof_join

    left = spark.createDataFrame(left_rows, "k string, ts long, lid long")
    right = (
        spark.createDataFrame(right_rows, "k string, rts long, val double")
        if right_rows
        else spark.createDataFrame([], "k string, rts long, val double")
    )
    got = {
        r["lid"]: r["val"]
        for r in asof_join(left, right, ["k"], "ts", "rts", ["val"]).collect()
    }
    assert got == _py_asof(left_rows, right_rows)


def _py_repetition(text: str, top_n=2, dup_n=5):
    from collections import Counter

    toks = [t for t in text.lower().split() if t]
    tot = sum(len(t) for t in toks)
    if tot == 0:
        return (0, 0)

    def grams(n):
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)] if len(toks) >= n else []

    c2, c5 = Counter(grams(top_n)), Counter(grams(dup_n))
    top = max((cnt * len(g.replace(" ", "")) for g, cnt in c2.items()), default=0)
    dup = sum(cnt * len(g.replace(" ", "")) for g, cnt in c5.items() if cnt >= 2)
    return (top * 1_000_000 // tot, min(dup * 1_000_000 // tot, 1_000_000))


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "b", "ccc", "dd", "e"]), min_size=0, max_size=30)
        .map(" ".join),
        min_size=1, max_size=10,
    )
)
def test_repetition_stats_matches_python_model(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["top_ngram_ppm"], r["dup_ngram_ppm"])
        for r in textstats.repetition_stats(df).collect()
    }
    want = {i: _py_repetition(t) for i, t in enumerate(texts)}
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["tok%d" % i for i in range(9)]), min_size=1, max_size=200)
        .map(" ".join),
        min_size=1, max_size=5,
    )
)
def test_chunk_documents_invariants(spark, texts):
    from cdc_pipeline_with_kafka_spark.operators.curation import chunk_documents

    chunk, overlap, step = 16, 4, 12
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        toks = t.split()
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # invariants: first chunk starts the doc, last covers the tail,
        # chunk k is exactly tokens [k*step, k*step+chunk), size ≤ chunk
        assert chunks[0]["chunk_text"].split()[0] == toks[0]
        assert chunks[-1]["chunk_text"].split()[-1] == toks[-1]
        for r in chunks:
            ctoks = r["chunk_text"].split()
            assert ctoks == toks[r["chunk_idx"] * step : r["chunk_idx"] * step + chunk]
            assert r["n_tokens"] == len(ctoks) <= chunk


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-1e3, 1e3, allow_nan=False, width=32), min_size=1, max_size=16),
        min_size=1, max_size=8,
    )
)
def test_quantize_int8_error_bound(spark, vectors):
    from cdc_pipeline_with_kafka_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(list(enumerate(vectors)), "vec_id long, v array<double>")
    got = {
        r["vec_id"]: r["q"]
        for r in df.select("vec_id", quantize_int8(F.col("v")).alias("q")).collect()
    }
    for i, vec in enumerate(vectors):
        amax = max(abs(x) for x in vec)
        scale = amax / 127.0 if amax else 1.0
        q = got[i]
        assert all(abs(x) <= 127 for x in q)
        # dequantization error within half a quantization step
        assert all(abs(xq * scale - x) <= scale / 2 + 1e-9 for xq, x in zip(q, vec))
        if amax:
            assert 127.0 in [abs(x) for x in q]  # max element saturates


_COS_DIM = 6


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=_COS_DIM, max_size=_COS_DIM,
        ),
        min_size=2, max_size=10,
    )
)
def test_cosine_rounding_parity_spark_vs_duckdb(spark, vectors):
    """The invariant the round-2 gate failures broke: for float32-stored
    vectors, Spark's vectorized cosine scorer and the DuckDB oracle
    formula (double casts, dot-then-divide, round 6) agree EXACTLY —
    not within epsilon — because both compute the identical float64
    expression.  Random float32 vectors, query = vector 0."""
    import math as _math

    import duckdb as _duckdb
    import numpy as _np

    from hypothesis import assume
    from cdc_pipeline_with_kafka_spark.operators.similarity import cosine_topk

    # store as float32 exactly like the parquet FLOAT[] column
    vecs = [[float(_np.float32(x)) for x in v] for v in vectors]
    assume(all(_math.sqrt(sum(x * x for x in v)) > 0 for v in vecs))

    corpus = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    queries = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        r["vec_id"]: r["cos_sim"]
        for r in cosine_topk(corpus, queries, k=len(vecs)).collect()
    }

    rows = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in v)}]::DOUBLE[])"
        for i, v in enumerate(vecs)
    )
    sql = f"""
    WITH e(vec_id, v) AS (VALUES {rows}),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_dot_product(e.v, q.qv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
    FROM e CROSS JOIN q
    """
    want = {int(i): float(c) for i, c in _duckdb.sql(sql).fetchall()}
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(
            st.one_of(
                st.sampled_from(["hello", "x1", "v2.3", "a@b.io", "10.0.0.1",
                                 "12-345-678-9012", "no-pii", "w"]),
            ),
            min_size=0, max_size=12,
        ).map(" ".join),
        min_size=1, max_size=8,
    )
)
def test_scrub_pii_matches_python_re(spark, texts):
    import re as _re

    from cdc_pipeline_with_kafka_spark.operators.textstats import PII_PATTERNS, scrub_pii

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in scrub_pii(df).collect()}
    for i, t in enumerate(texts):
        scrubbed = t
        for name, pat in PII_PATTERNS.items():
            assert got[i][f"n_{name}"] == len(_re.findall(pat, t)), (name, t)
            scrubbed = _re.sub(pat, "[REDACTED]", scrubbed)
        assert got[i]["scrubbed"] == scrubbed, t


def _py_strip_html(raw: str) -> str:
    import re as _re

    c = _re.sub(r"(?is)<script[^>]*>.*?</script>", " ", raw)
    c = _re.sub(r"(?is)<style[^>]*>.*?</style>", " ", c)
    c = _re.sub(r"(?s)<!--.*?-->", " ", c)
    c = _re.sub(r"(?s)<[^>]*>", " ", c)
    for ent, rep in [("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'")]:
        c = c.replace(ent, rep)
    return _re.sub(r"\s+", " ", c).strip()


_HTML_CHUNK = st.sampled_from([
    "plain words here", "<b>bold</b>", "<script>alert('x')</script>",
    "<STYLE media='a'>p,q</STYLE>", "<!-- note -->", "a &amp; b",
    "&lt;tag&gt;", "<div class='c'>", "</div>", "&nbsp;", "text < math",
    "5 > 3", "&quot;quoted&quot;", "tail",
])


@settings(max_examples=20, deadline=None)
@given(st.lists(_HTML_CHUNK, min_size=0, max_size=12))
def test_strip_html_matches_python_model(spark, chunks):
    """Java-regex strip_html == Python-re model on arbitrary markup
    compositions (incl. unclosed tags, bare < and >, mixed-case
    blocks) — pins the engine-portability of the pattern set."""
    from cdc_pipeline_with_kafka_spark.operators import textstats

    raw = " ".join(chunks)
    df = spark.createDataFrame([(raw,)], "t string")
    got = df.select(textstats.strip_html(F.col("t")).alias("s")).collect()[0]["s"]
    assert got == _py_strip_html(raw)


# ---------------------------------------------------------------- spans


def _py_span_removal(docs, k, min_docs, policy):
    """Brute-force substring-dedup model mirroring operators/spans.py."""
    holders: dict[tuple, set] = {}
    for did, text in docs:
        toks = text.lower().split()
        for i in range(len(toks) - k + 1):
            holders.setdefault(tuple(toks[i : i + k]), set()).add(did)
    out = {}
    for did, text in docs:
        toks = text.lower().split()
        removed = set()
        for i in range(len(toks) - k + 1):
            ids = holders[tuple(toks[i : i + k])]
            if len(ids) >= min_docs and (policy == "all" or min(ids) != did):
                removed.update(range(i, i + k))
        kept = [t for j, t in enumerate(toks) if j not in removed]
        out[did] = (" ".join(kept), len(removed))
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    st.sampled_from(["all", "keep_first"]),
)
def test_span_removal_matches_bruteforce(spark, doc_texts, policy):
    from cdc_pipeline_with_kafka_spark.operators import spans as S

    docs = list(enumerate(doc_texts))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.cleaned_text, r.n_removed_tokens)
        for r in S.remove_duplicated_spans(df, k=3, min_docs=2, policy=policy).collect()
    }
    assert got == _py_span_removal(docs, 3, 2, policy)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),   # width
    st.integers(min_value=1, max_value=20),   # height
    st.booleans(),                            # grayscale vs color
    st.integers(min_value=0, max_value=2**31 - 1),  # pixel seed
    st.sampled_from([0, 3]),                  # restart interval
)
def test_jpeg_codec_roundtrip_property(w, h, gray, seed, dri):
    """encode_jpeg_baseline → _jpeg_decode_pixels recovers ANY small
    image to within flat-quant error (±0.5/255 per DCT coefficient →
    ≲0.02 pixel error), for arbitrary sizes (incl. non-multiple-of-8),
    gray and color, with and without restart markers."""
    import numpy as np

    from cdc_pipeline_with_kafka_spark.operators import multimodal as mm

    rng = np.random.RandomState(seed % (2**31))
    img = rng.rand(h, w) if gray else rng.rand(h, w, 3)
    payload = mm.encode_jpeg_baseline(img, qtable_value=1, restart_interval=dri)
    dw, dh, prec, rgb = mm._jpeg_decode_pixels(payload)
    assert (dw, dh, prec) == (w, h, 8)
    got = rgb[:, :, 0] if gray else rgb
    # random (noisy) content stresses every AC coefficient; quant=1
    # bounds each coefficient error at 0.5, giving ~0.03 worst-case
    # pixel error after the IDCT for color (chroma transform adds ~1.8x)
    assert np.abs(got - img).max() < (0.05 if gray else 0.09)


@settings(max_examples=120, deadline=None)
@given(
    st.sampled_from([
        b"", b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n", b"P6\n", b"RIFF",
        b"YUV4MPEG2 ", b"ID3", b"\xff\xfb",
        b"\x00\x00\x00\x10ftyp", b"\x00\x00\x00\x01moov",
    ]),
    st.binary(max_size=48),
)
def test_media_parsers_raise_only_valueerror(prefix, tail):
    """Decoder quarantine contract (the round-5 review's bug class):
    on ARBITRARY malformed bytes — including payloads that pass the
    magic-byte sniff — every media parser either returns a feature
    list or raises ValueError.  struct.error / IndexError / KeyError
    escaping a decoder fails a whole Spark task instead of
    quarantining one asset."""
    from cdc_pipeline_with_kafka_spark.operators import multimodal as mm

    payload = prefix + tail
    for fn in (
        mm.decode_jpeg_features, mm.decode_png_features,
        mm.decode_ppm_features, mm.decode_wav_features,
        mm.decode_mp3_features, mm.decode_mp4_features,
        mm.decode_y4m_features, mm.decode_image_features,
        mm.decode_audio_features, mm.decode_video_features,
    ):
        try:
            out = fn(payload)
        except ValueError:
            continue
        assert isinstance(out, list) and all(isinstance(x, float) for x in out)


@settings(max_examples=8, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=25),
    budget=st.integers(min_value=0, max_value=4000),
)
def test_token_budget_two_pass_matches_model(spark, toks, budget):
    """The r6 two-pass boundary-bucket carve ≡ the reference model
    (sort by (md5, key), keep every row whose running total fits the
    budget) — including zero-token docs, budget=0, and a budget larger
    than the corpus.  Also invariant to the bucket granularity: 16
    buckets and 4096 buckets must produce identical rows (the
    boundary-bucket carve is a pure partitioning of the same total
    order)."""
    import hashlib

    from cdc_pipeline_with_kafka_spark.operators import curation

    rows = list(enumerate(toks))
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    ranked = sorted(rows, key=lambda r: (hashlib.md5(f"h:{r[0]}".encode()).hexdigest(), r[0]))
    want, cum = set(), 0
    for did, nt in ranked:
        cum += nt
        if cum <= budget:
            want.add((did, cum))
    outs = []
    for hex_chars in (1, 3):
        out = curation.sample_token_budget(
            df, budget, "n_tok", "doc_id", salt="h:",
            bucket_hex_chars=hex_chars,
        )
        outs.append({(r.doc_id, r._cum_tokens) for r in out.collect()})
    assert outs[0] == want
    assert outs[1] == want


@settings(max_examples=8, deadline=None)
@given(
    srcs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=50_000),
                  st.integers(min_value=0, max_value=9)),
        min_size=1, max_size=8,
    ),
    budget=st.integers(min_value=0, max_value=400_000),
)
def test_epoch_mixture_waterfill_optimality(spark, srcs, budget):
    """KKT characterization of the water-filling allocation: at the
    final λ = B'/W', every capped source's weight satisfies
    B'·w ≥ max_e·W', every uncapped source's is ≤ it with
    epochs = B'·w // W' exactly, and the capped tier alone never
    overruns the budget."""
    from cdc_pipeline_with_kafka_spark.operators import curation

    MAXE = 4_000_000
    rows = [(f"s{i}", t, w) for i, (t, w) in enumerate(srcs)]
    df = spark.createDataFrame(rows, "source string, n_tokens long, w long")
    out = curation.plan_epoch_mixture(df, budget, weight_col="w").collect()
    assert len(out) == len(rows)
    by = {r.source: r for r in out}
    b_ppm = budget * 1_000_000
    capped = [r for r in out if r.capped]
    uncapped = [r for r in out if not r.capped]
    b_rem = b_ppm - sum(r.n_tokens * MAXE for r in capped)
    w_rem = sum(r.n_tokens * r.weight for r in uncapped)
    assert b_rem >= 0  # capping alone never overruns
    for r in capped:
        assert r.epochs_ppm == MAXE
        assert b_rem * r.weight >= MAXE * w_rem
    for r in uncapped:
        if w_rem > 0:
            assert r.epochs_ppm == (b_rem * r.weight) // w_rem
            assert b_rem * r.weight <= MAXE * w_rem or r.weight == 0
        else:
            assert r.epochs_ppm == 0
        assert r.epochs_ppm <= MAXE
    for r in out:
        assert r.alloc_tokens == (r.n_tokens * r.epochs_ppm) // 1_000_000
    assert sum(r.alloc_tokens for r in out) <= budget


@given(
    st.lists(st.integers(min_value=0, max_value=10**12),
             min_size=1, max_size=40),
    st.sampled_from([0.0, 0.2, 0.3, 0.5, 0.7, 1.0]),
)
@settings(max_examples=60, deadline=None)
def test_temperature_weights_core_invariants(tokens, alpha):
    """Pure-core invariants of the alpha-sampling weights: ppm sums to
    exactly the scale whenever any source is non-empty; empty sources
    get 0; weights are monotone in size; alpha=1 ppm matches the exact
    proportional largest-remainder apportionment; epoch_weight is the
    documented floor-division of ppm."""
    from cdc_pipeline_with_kafka_spark.operators.curation import (
        temperature_weights_core,
    )

    pairs = [(f"s{i:03d}", t) for i, t in enumerate(tokens)]
    out = temperature_weights_core(pairs, alpha, 1_000_000)
    assert [s for s, *_ in out] == sorted(s for s, _ in pairs)
    by = {s: (t, ppm, ew) for s, t, ppm, ew in out}
    total = sum(tokens)
    if total == 0 or (alpha > 0 and all(t == 0 for t in tokens)):
        assert all(ppm == 0 for _, ppm, _ in by.values())
    else:
        assert sum(ppm for _, ppm, _ in by.values()) == 1_000_000
    for s, t, ppm, ew in out:
        if t == 0 and alpha >= 0:
            assert ppm == 0 and ew == 0
        assert ew == ((ppm * 10**12) // t if t > 0 else 0)
    # monotone in the IDEAL WEIGHT t^alpha (not raw tokens: at alpha=0
    # every non-empty source has equal weight, so the ±1 largest-
    # remainder bump can legitimately cross different token counts);
    # strict weight order is preserved exactly by largest remainder —
    # equal floors imply ordered remainders, so a bumped smaller quota
    # forces the larger quota's bump too
    def _w(t):
        return 0.0 if t == 0 else float(t) ** alpha

    ranked = sorted(out, key=lambda r: (_w(r[1]), r[2]))
    for (s1, t1, p1, _), (s2, t2, p2, _) in zip(ranked, ranked[1:]):
        assert p1 <= p2 if _w(t1) < _w(t2) else abs(p1 - p2) <= 1
    # alpha=1: proportional apportionment within largest-remainder
    if alpha == 1.0 and total > 0:
        for s, t, ppm, _ in out:
            exact = t / total * 1_000_000
            assert abs(ppm - exact) < 1.0 + 1e-6


def test_canonical_url_idempotent_and_param_order_free(spark):
    """canonical_url is IDEMPOTENT (canon(canon(u)) == canon(u)) and
    insensitive to query-parameter order — the two properties a dedup
    key must have.  r13: the former hypothesis form ran one Spark
    job per drawn example (40 × ~4 s of pure driver round-trips);
    the same input space — every (scheme, port, frag) combination ×
    seeded-random hosts/paths/param subsets, MORE cases than the 40
    draws — now lands in ONE DataFrame and one collect, with the
    identical per-case assertions."""
    import itertools
    import random
    import string

    from cdc_pipeline_with_kafka_spark.operators import textstats

    rng = random.Random(7)
    param_pool = ["a=1", "b=2", "z=9", "utm_source=x", "utm_campaign=c",
                  "gclid=g", "fbclid=f", "ref=r", "q=term"]
    host_chars = string.ascii_letters + string.digits + ".-"
    path_chars = string.ascii_letters + string.digits + "._~-"
    cases = []
    for scheme, port, frag in itertools.product(
        ["http", "HTTP", "https", "HTTPS", "ftp"],
        ["", ":80", ":443", ":8080"],
        ["", "#top", "#a/b?c=d"],
    ):
        host = rng.choice(string.ascii_letters) + "".join(
            rng.choice(host_chars) for _ in range(rng.randint(0, 12))
        )
        path = "".join(
            "/" + "".join(rng.choice(path_chars)
                          for _ in range(rng.randint(0, 6)))
            for _ in range(rng.randint(0, 3))
        ) + rng.choice(["", "/"])
        params = [rng.choice(param_pool) for _ in range(rng.randint(0, 5))]
        q1 = "&".join(params)
        shuffled = params[:]
        rng.shuffle(shuffled)
        q2 = "&".join(shuffled)
        u1 = f"{scheme}://{host}{port}{path}" + (f"?{q1}" if q1 else "") + frag
        u2 = f"{scheme}://{host}{port}{path}" + (f"?{q2}" if q2 else "") + frag
        cases.append((u1, u2))
    # the empty-ish edge hypothesis liked to shrink to
    cases += [("http://A", "http://A"), ("ftp://A/?a=1#top", "ftp://A/?a=1#top")]
    df = spark.createDataFrame(cases, "u1 string, u2 string")
    rows = df.select(
        "u1",
        textstats.canonical_url(F.col("u1")).alias("c1"),
        textstats.canonical_url(F.col("u2")).alias("c2"),
        textstats.canonical_url(
            textstats.canonical_url(F.col("u1"))
        ).alias("cc1"),
    ).collect()
    assert len(rows) == len(cases)
    for row in rows:
        assert row.c1 == row.c2, row.u1   # param order free
        assert row.cc1 == row.c1, row.u1  # idempotent


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    nbytes=st.integers(1, 12_000),
    pos=st.floats(0.0, 1.0),
    ins_len=st.integers(1, 32),
)
def test_cdc_chunks_invariants(seed, nbytes, pos, ins_len):
    """Gear-CDC invariants on arbitrary (entropy-rich) payloads:
    chunk lengths in [min, max] except the final tail; spans tile the
    payload exactly; an insert preserves all chunk hashes outside the
    edit's resync neighborhood.  (Degenerate constant payloads never
    trigger a content boundary by design — every chunk is max_size and
    an insert shifts everything; sha-expanded payloads model real
    data, where resync is the property that makes CDC useful.)"""
    import hashlib

    from cdc_pipeline_with_kafka_spark.operators.multimodal import cdc_chunks

    body = b""
    i = 0
    while len(body) < nbytes:
        body += hashlib.sha256(f"cdcprop:{seed}:{i}".encode()).digest()
        i += 1
    payload = body[:nbytes]
    chunks = cdc_chunks(payload)
    off = 0
    for ci, (o, ln, _h) in enumerate(chunks):
        assert o == off
        off += ln
        if ci < len(chunks) - 1:
            assert 128 <= ln <= 2048
        else:
            assert 1 <= ln <= 2048
    assert off == nbytes
    p = int(pos * nbytes)
    edited = payload[:p] + bytes(range(ins_len % 256))[:ins_len] + payload[p:]
    ha = [h for *_s, h in chunks]
    hb = {h for *_s, h in cdc_chunks(edited)}
    # chunks strictly before the edited one are untouched; chunks
    # after resync are shared — allow a 4-chunk resync neighborhood
    assert len([h for h in ha if h in hb]) >= len(ha) - 4


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_nodes=st.integers(2, 25),
    n_edges=st.integers(1, 80),
    iters=st.integers(0, 12),
)
def test_pagerank_replay_mass_and_floor_invariants(seed, n_nodes, n_edges, iters):
    """Pure-engine invariants of the integer PageRank core: mass is
    never created (Σ scores ≤ n·1e6 after any iterations — division
    remainders and dangling nodes only LEAK), every node holds at
    least the teleport base after ≥1 iteration, and the replay is
    deterministic."""
    import random

    from cdc_pipeline_with_kafka_spark.operators.graph import (
        MICRO,
        pagerank_replay,
    )

    rng = random.Random(seed)
    edges = list(
        {
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        edges = [(0, 1)]
    score = pagerank_replay(edges, iters=iters)
    n = len(score)
    assert sum(score.values()) <= n * MICRO
    if iters >= 1:
        base = MICRO - 850_000
        assert all(v >= base for v in score.values())
        assert all(v <= n * MICRO for v in score.values())
    assert score == pagerank_replay(edges, iters=iters)  # deterministic


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000),
             min_size=1, max_size=60),
    st.integers(min_value=0, max_value=500),
)
def test_cusum_closed_form_equals_recursion(xs, k):
    """Pure-math property behind trends.cusum_changepoints: with
    prefix sums P_t of d_t and P_0 = 0, the textbook recursion
    s_t = max(0, s_{t-1} + d_t) equals P_t - min(0, min_{j<=t} P_j)
    for ANY integer series and slack."""
    mu = sum(xs) // len(xs)
    ds = [x - mu - k for x in xs]
    s, prefix, runmin = 0, 0, 0
    for d in ds:
        s = max(0, s + d)
        prefix += d
        runmin = min(runmin, prefix)
        assert s == prefix - min(0, runmin)


@given(
    st.text(alphabet="abcdef", max_size=12),
    st.text(alphabet="abcdef", max_size=12),
)
def test_jw_core_symmetry_bounds_identity(a, b):
    """Pure-math properties of the exact-integer Jaro–Winkler kernel
    (relational.jw_core): symmetric (the matching window is built on
    max(|a|,|b|), and greedy left-to-right matching yields the same
    match multiset both ways), bounded in [0, 1e6], exactly 1e6 iff
    the strings are equal, and 0 when no character is shared."""
    from cdc_pipeline_with_kafka_spark.operators.relational import jw_core

    ab, ba = jw_core(a, b), jw_core(b, a)
    assert ab == ba
    assert 0 <= ab <= 1_000_000
    if a == b:
        assert ab == 1_000_000
    elif not set(a) & set(b):
        assert ab == 0


@given(
    st.text(alphabet="abcd", max_size=12),
    st.text(alphabet="abcd", max_size=12),
    st.sampled_from([0, 50_000, 100_000, 250_000]),
)
def test_jw_core_integer_equals_fraction_reference(a, b, ps):
    """The common-denominator integer kernel lands the IDENTICAL
    floored ppm as the original rational (Fraction) formulation for
    any strings and prefix scale — the seam the 'jw' gate integers
    depend on.  The reference is the Fraction form inlined verbatim
    (same greedy matcher, jaro as true rationals, one truncation)."""
    from fractions import Fraction

    from cdc_pipeline_with_kafka_spark.operators.relational import jw_core

    def reference(a, b, ppm, max_prefix=4):
        la, lb = len(a), len(b)
        if la == 0 and lb == 0:
            return 1_000_000
        if la == 0 or lb == 0:
            return 0
        window = max(max(la, lb) // 2 - 1, 0)
        used = [False] * lb
        ma, mb = [], []
        for i, ca in enumerate(a):
            for j in range(max(0, i - window), min(lb, i + window + 1)):
                if not used[j] and b[j] == ca:
                    used[j] = True
                    ma.append(ca)
                    mb.append(j)
                    break
        m = len(ma)
        if m == 0:
            return 0
        mb_chars = [b[j] for j in sorted(mb)]
        t2 = sum(1 for x, y in zip(ma, mb_chars) if x != y)
        jaro = (Fraction(m, la) + Fraction(m, lb)
                + Fraction(2 * m - t2, 2 * m)) / 3
        ell = 0
        for x, y in zip(a[:max_prefix], b[:max_prefix]):
            if x != y:
                break
            ell += 1
        jw = jaro + ell * Fraction(ppm, 1_000_000) * (1 - jaro)
        return int(jw * 1_000_000)

    assert jw_core(a, b, ps) == reference(a, b, ps)


@given(
    st.lists(
        st.tuples(st.integers(0, 999),
                  st.one_of(st.none(), st.text("xyz", max_size=3))),
        max_size=40, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=12, deadline=None)
def test_sorted_neighborhood_equals_naive_property(spark, rows, window):
    """Property form of the sorted-neighborhood pin: for ANY id/key
    table (duplicate keys, NULLs, empty) the pair set equals the
    naive global-sort successor pairing — boundary-straddling pairs
    included, NULL keys excluded."""
    from cdc_pipeline_with_kafka_spark.operators import relational

    df = spark.createDataFrame(rows, "rid int, k string") if rows else \
        spark.createDataFrame([], "rid int, k string")
    got = sorted(
        (r.id_a, r.id_b, r.gap)
        for r in relational.sorted_neighborhood_pairs(
            df, "rid", "k", window=window
        ).collect()
    )
    ordered = sorted((k, i) for i, k in rows if k is not None)
    want = sorted(
        (ordered[i][1], ordered[j][1], j - i)
        for i in range(len(ordered))
        for j in range(i + 1, min(i + window + 1, len(ordered)))
    )
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(0, 999),
            st.one_of(st.none(), st.text("xy", max_size=2)),
            st.one_of(st.none(), st.text("xy", max_size=2)),
        ),
        max_size=30, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=10, deadline=None)
def test_sorted_neighborhood_multi_equals_naive_union(spark, rows, window):
    """Multi-pass sorted neighborhood ≡ the naive reference: run the
    successor pairing per key, canonicalize to unordered pairs, then
    count passes and take the closest gap per pair — for ANY table
    with NULLs in either key, duplicates, or no rows at all."""
    from cdc_pipeline_with_kafka_spark.operators import relational

    df = spark.createDataFrame(rows, "rid int, k1 string, k2 string") \
        if rows else spark.createDataFrame([], "rid int, k1 string, k2 string")
    got = sorted(
        (r.id_a, r.id_b, r.n_keys, r.min_gap)
        for r in relational.sorted_neighborhood_pairs_multi(
            df, "rid", ["k1", "k2"], window=window
        ).collect()
    )

    def one_pass(key_ix):
        ordered = sorted(
            (t[key_ix], t[0]) for t in rows if t[key_ix] is not None
        )
        return [
            (min(ordered[i][1], ordered[j][1]),
             max(ordered[i][1], ordered[j][1]), j - i)
            for i in range(len(ordered))
            for j in range(i + 1, min(i + window + 1, len(ordered)))
        ]

    agg = {}
    for ia, ib, gap in one_pass(1) + one_pass(2):
        n, g = agg.get((ia, ib), (0, None))
        agg[(ia, ib)] = (n + 1, gap if g is None else min(g, gap))
    want = sorted((ia, ib, n, g) for (ia, ib), (n, g) in agg.items())
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 5)),
        min_size=0, max_size=40,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=8, deadline=None)
def test_cooccurrence_capped_equals_prefiltered_property(
    spark, rows, cap
):
    """For ANY (basket, item) table and cap, cooccurrence under
    max_basket_items must equal running uncapped on the manually
    pre-filtered table (baskets with ≤ cap distinct items) — all
    four counts (n_ab, n_a, n_b, and the lift's basket total) from
    one universe."""
    from cdc_pipeline_with_kafka_spark.operators import curation

    df = spark.createDataFrame(rows, "b long, it long") if rows else \
        spark.createDataFrame([], "b long, it long")
    per_basket = {}
    for b, it in rows:
        per_basket.setdefault(b, set()).add(it)
    keep = {b for b, items in per_basket.items() if len(items) <= cap}
    manual_rows = [r for r in rows if r[0] in keep]
    manual = spark.createDataFrame(manual_rows, "b long, it long") \
        if manual_rows else spark.createDataFrame([], "b long, it long")
    got = sorted(map(tuple, curation.cooccurrence_pairs(
        df, "b", "it", max_basket_items=cap
    ).collect()))
    want = sorted(map(tuple, curation.cooccurrence_pairs(
        manual, "b", "it"
    ).collect()))
    assert got == want


def _py_soundex(name):
    """Pure-Python American Soundex model (the chain the column
    expression mirrors step for step)."""
    code = {**{c: "0" for c in "AEIOUY"},
            **{c: "1" for c in "BFPV"}, **{c: "2" for c in "CGJKQSXZ"},
            **{c: "3" for c in "DT"}, "L": "4", "M": "5", "N": "5",
            "R": "6"}
    u = re.sub(r"[^A-Z]", "", name.upper())
    if not u:
        return None
    first = u[0]
    coded = "".join(code[c] for c in u if c not in "HW")
    collapsed = re.sub(r"(\d)\1+", r"\1", coded)
    if first not in "HW":
        collapsed = collapsed[1:]
    return (first + collapsed.replace("0", "") + "000")[:4]


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyzHW '-1", max_size=12),
    min_size=1, max_size=25,
))
def test_soundex_key_matches_python_model(spark, names):
    from cdc_pipeline_with_kafka_spark.operators.relational import (
        soundex_key,
    )

    df = spark.createDataFrame([(n,) for n in names], "n string")
    got = [
        r["s"]
        for r in df.select(soundex_key(F.col("n")).alias("s")).collect()
    ]
    assert got == [_py_soundex(n) for n in names]
