"""Naive Bayes classifier + DSIR importance weighting —
operators/classify.py.

Pinned against brute-force Python models computing the identical
micro-nat fixed-point arithmetic, so any drift in smoothing, vocab
capping, or quantization order fails loudly.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.operators import classify as C

TRAIN = [
    (1, "spam", "buy cheap pills now buy now"),
    (2, "spam", "cheap pills cheap deals"),
    (3, "ham", "meeting notes for the quarterly review"),
    (4, "ham", "please review the meeting agenda notes"),
]
SCORE = [
    (10, "buy cheap deals now"),
    (11, "quarterly meeting review notes"),
    (12, ""),  # empty doc -> prior-only
]


def _micro_ln(x: float) -> int:
    return round(math.log(x) * 1e6)


def _py_nb(train, docs, max_vocab=None):
    """Reference model mirroring train_nb/nb_score exactly."""
    tok_counts: dict[tuple, int] = {}
    label_docs: dict[str, int] = {}
    freq: dict[str, int] = {}
    for _, lbl, text in train:
        label_docs[lbl] = label_docs.get(lbl, 0) + 1
        for t in text.lower().split():
            tok_counts[(lbl, t)] = tok_counts.get((lbl, t), 0) + 1
            freq[t] = freq.get(t, 0) + 1
    if max_vocab is not None:
        kept = set(
            t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
        )
        tok_counts = {k: v for k, v in tok_counts.items() if k[1] in kept}
    else:
        kept = set(freq)
    vocab = len({t for (_, t) in tok_counts})
    n_tok = {}
    for (lbl, _), c in tok_counts.items():
        n_tok[lbl] = n_tok.get(lbl, 0) + c
    total_docs = len(train)
    out = {}
    for did, text in docs:
        toks = [t for t in text.lower().split()]
        scores = {}
        for lbl in label_docs:
            s = _micro_ln(label_docs[lbl] / total_docs)
            unseen = _micro_ln(1 / (n_tok.get(lbl, 0) + vocab))
            for t in toks:
                if (lbl, t) in tok_counts:
                    s += _micro_ln((tok_counts[(lbl, t)] + 1) / (n_tok[lbl] + vocab))
                else:
                    s += unseen
            scores[lbl] = s
        out[did] = scores
    return out


def test_nb_scores_match_python_model(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "label", "text"])
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    tl, cs = C.train_nb(train, "label")
    got = {
        (r.id, r.label): r.score_micro for r in C.nb_score(docs, tl, cs).collect()
    }
    want = _py_nb(TRAIN, SCORE)
    for did, scores in want.items():
        for lbl, s in scores.items():
            assert got[(did, lbl)] == s, (did, lbl)


def test_nb_predicts_the_obvious_classes(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "label", "text"])
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    tl, cs = C.train_nb(train, "label")
    pred = {r.id: r.predicted_label for r in C.nb_predict(docs, tl, cs).collect()}
    assert pred[10] == "spam"
    assert pred[11] == "ham"
    assert 12 in pred  # empty doc predicted from priors (tie -> 'ham' < 'spam')
    assert pred[12] == "ham"


def test_nb_vocab_cap_drops_rare_tokens(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "label", "text"])
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    tl, cs = C.train_nb(train, "label", max_vocab=3)
    assert tl.select("token").distinct().count() <= 3
    got = {
        (r.id, r.label): r.score_micro for r in C.nb_score(docs, tl, cs).collect()
    }
    want = _py_nb(TRAIN, SCORE, max_vocab=3)
    for did, scores in want.items():
        for lbl, s in scores.items():
            assert got[(did, lbl)] == s, (did, lbl)


def _py_dsir(raw, target, hash_buckets):
    import hashlib

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % hash_buckets

    def feats(text):
        toks = text.lower().split()
        return [bucket(t) for t in toks] + [
            bucket(f"{a} {b}") for a, b in zip(toks, toks[1:])
        ]

    raw_counts: dict[int, int] = {}
    t_counts: dict[int, int] = {}
    raw_total = t_total = 0
    for _, text in raw:
        for b in feats(text):
            raw_counts[b] = raw_counts.get(b, 0) + 1
            raw_total += 1
    for _, text in target:
        for b in feats(text):
            t_counts[b] = t_counts.get(b, 0) + 1
            t_total += 1
    out = {}
    for did, text in raw:
        fs = feats(text)
        s = 0
        for b in fs:
            lt = _micro_ln((t_counts.get(b, 0) + 1) / (t_total + hash_buckets))
            lr = _micro_ln((raw_counts.get(b, 0) + 1) / (raw_total + hash_buckets))
            s += lt - lr
        out[did] = (len(fs), s)
    return out


RAW = [
    (1, "python spark cluster data pipeline"),
    (2, "casino poker jackpot casino win"),
    (3, "spark sql window functions data"),
    (4, "lottery jackpot win win win"),
]
TARGET = [
    (100, "spark data engineering pipeline"),
    (101, "data cluster spark sql"),
]


def test_dsir_weights_match_python_model(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    got = {
        r.id: (r.n_feats, r.logw_micro)
        for r in C.dsir_weights(raw, target, hash_buckets=256).collect()
    }
    assert got == _py_dsir(RAW, TARGET, 256)


def test_dsir_select_prefers_target_like_docs(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    top2 = {r.id for r in C.dsir_select(raw, target, k=2, hash_buckets=256).collect()}
    assert top2 == {1, 3}  # the spark/data docs outrank casino/lottery spam


def test_dsir_rank_is_deterministic(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    a = [(r.id, r.rnk) for r in C.dsir_select(raw, target, k=4, hash_buckets=64).orderBy("rnk").collect()]
    b = [(r.id, r.rnk) for r in C.dsir_select(raw, target, k=4, hash_buckets=64).orderBy("rnk").collect()]
    assert a == b


def test_nb_model_side_is_broadcast(spark):
    """The scoring join must broadcast the model, never shuffle the
    corpus against it."""
    train = spark.createDataFrame(TRAIN, ["doc_id", "label", "text"])
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    tl, cs = C.train_nb(train, "label")
    plan = C.nb_score(docs, tl, cs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_nb_filter_composes_with_streaming(spark, tmp_path):
    """The NB filter stage works per micro-batch (foreachBatch admits a
    shard the same way the batch pipeline would): a stream of docs is
    filtered against a pre-trained broadcast model, matching the batch
    nb_filter output exactly."""
    import json as _json

    train = spark.createDataFrame(TRAIN, ["doc_id", "label", "text"])
    tl, cs = C.train_nb(train, "label")
    # pin the model: tiny frames, re-read per micro-batch otherwise
    tl, cs = tl.localCheckpoint(), cs.localCheckpoint()

    rows = [
        {"doc_id": 10, "text": "buy cheap deals now"},
        {"doc_id": 11, "text": "quarterly meeting review notes"},
        {"doc_id": 12, "text": "meeting agenda review please"},
    ]
    src = tmp_path / "nb_stream_src"
    src.mkdir()
    with open(src / "part-0.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")

    docs = spark.createDataFrame([(r["doc_id"], r["text"]) for r in rows], ["doc_id", "text"])
    batch_kept = {r.doc_id for r in C.nb_filter(docs, tl, cs, "ham").collect()}

    got = []
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))

    def sink(bdf, _bid):
        got.extend(r.doc_id for r in C.nb_filter(bdf, tl, cs, "ham").collect())

    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable(); q.stop()
    assert set(got) == batch_kept == {11, 12}


def test_reliability_report_buckets_and_monotone_signal(spark):
    """Equal-population percentile bands, tie-stable; a score that IS
    the label (perfect ranking) puts all positives in the top bands
    with pos_ppm 1e6 and zeros elsewhere; sums are exact."""
    from cdc_pipeline_with_kafka_spark.operators import classify

    rows = [(i, i * 1000, i >= 80) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, score long, y boolean")
    out = {r["bucket"]: r for r in classify.reliability_report(
        df, "score", "y", 10).collect()}
    assert sorted(out) == list(range(1, 11))
    assert all(out[b]["n"] == 10 for b in out)
    # perfectly ranked: exactly the top two bands carry positives
    assert out[10]["pos_ppm"] == 1_000_000 and out[9]["pos_ppm"] == 1_000_000
    assert all(out[b]["pos_ppm"] == 0 for b in range(1, 9))
    assert out[1]["lo_micro"] == 0 and out[10]["hi_micro"] == 99_000
    assert out[1]["sum_score_micro"] == sum(i * 1000 for i in range(10))
    # NULL rows excluded
    withnull = df.union(spark.createDataFrame([(999, None, True)],
                                              "id long, score long, y boolean"))
    assert sum(r["n"] for r in classify.reliability_report(
        withnull, "score", "y", 10).collect()) == 100

    import pytest as _pytest
    with _pytest.raises(ValueError):
        classify.reliability_report(df, "score", "y", 1)
