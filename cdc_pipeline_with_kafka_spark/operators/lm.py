"""N-gram language-model perplexity scoring for corpus quality
filtering — the CCNet recipe (Wenzek et al. 2020): score every
document against a small LM trained on a trusted sample; outlier
perplexity means boilerplate, gibberish, or the wrong register.
Complements the rule-based `textstats.quality_score` (which catches
length/punctuation pathologies but not fluent-looking junk).

Same scale contract as the other trainable artifacts (IVF/PQ/BPE):
TRAIN on a driver-side hard-capped sample, SHIP the count tables in
the UDF closure, SCORE in one Arrow-batched map stage — no shuffle.

The model is a word-bigram LM with add-k smoothing and a top-V
vocabulary (everything else → UNK): deliberately simple, fully
deterministic, and dependency-free.  KenLM-style Kneser-Ney would be
a drop-in upgrade behind the same `score` interface.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

BOS = "<s>"
UNK = "<unk>"


def _toks(text: str) -> list[str]:
    return [t for t in (text or "").lower().split() if t]


class BigramLM:
    """Picklable bigram model: unigram/bigram counts over a capped
    vocabulary, add-k smoothed conditional log-probs.

    Out-of-vocabulary targets fold to UNK and their probability is
    divided by `unk_vocab_size`: UNK aggregates the entire open
    vocabulary, and WITHOUT spreading its mass an all-OOV gibberish
    doc scores BETTER than fluent-but-reordered text (the UNK context
    has zero observed mass, so add-k hands it near-uniform probability
    — measured 16 vs 59 ppl on the test corpus).  Spreading over an
    assumed open-vocab size restores gibberish ≫ scrambled ≫ fluent."""

    def __init__(self, uni: dict, bi: dict, vocab: set, add_k: float,
                 unk_vocab_size: int = 10_000):
        self.uni = uni
        self.bi = bi
        self.vocab = vocab
        self.add_k = add_k
        self.unk_vocab_size = unk_vocab_size
        self._v = len(vocab) + 1  # + UNK

    def _norm(self, tok: str) -> str:
        return tok if tok in self.vocab else UNK

    def logprob(self, prev: str, tok: str) -> float:
        prev = self._norm(prev)
        is_oov = tok not in self.vocab
        tok = self._norm(tok)
        num = self.bi.get((prev, tok), 0) + self.add_k
        den = self.uni.get(prev, 0) + self.add_k * self._v
        lp = math.log(num / den)
        if is_oov:
            lp -= math.log(self.unk_vocab_size)
        return lp

    def perplexity(self, text: str) -> float:
        toks = _toks(text)
        if not toks:
            return float("inf")
        lp = 0.0
        prev = BOS
        for t in toks:
            lp += self.logprob(prev, t)
            prev = self._norm(t)
        return math.exp(-lp / len(toks))


def train_bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_train_rows: int = 50_000,
    max_vocab: int = 50_000,
    add_k: float = 0.5,
) -> BigramLM:
    """Train on a deterministic capped sample (ordered limit).  The
    vocabulary keeps the `max_vocab` most frequent tokens (count desc,
    token asc on ties — deterministic); everything else folds to UNK
    BEFORE bigram counting, bounding the shipped tables."""
    if max_train_rows <= 0:
        raise ValueError(f"max_train_rows must be positive, got {max_train_rows}")
    rows = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(max_train_rows)
        .select(text_col)
        .collect()
    )
    return train_bigram_lm_from_texts(
        [r[text_col] for r in rows], max_vocab=max_vocab, add_k=add_k
    )


def train_bigram_lm_from_texts(
    texts: list, max_vocab: int = 50_000, add_k: float = 0.5
) -> BigramLM:
    """Pure-Python trainer core shared by `train_bigram_lm` (after its
    ordered-limit collect) and the pinned-model DuckDB oracle
    (queries._classify_suite_sql) — the BPE `train_bpe_from_counts`
    pattern."""
    raw_uni: Counter = Counter()
    docs_toks = []
    for text in texts:
        toks = _toks(text)
        docs_toks.append(toks)
        raw_uni.update(toks)
    vocab = {
        t for t, _ in sorted(raw_uni.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    }
    uni: Counter = Counter()
    bi: Counter = Counter()
    for toks in docs_toks:
        prev = BOS
        uni[BOS] += 1
        for t in toks:
            t = t if t in vocab else UNK
            uni[t] += 1
            bi[(prev, t)] += 1
            prev = t
    return BigramLM(dict(uni), dict(bi), vocab, add_k)


def doc_perplexity(
    docs: DataFrame,
    model: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, ppl) per document — one Arrow map stage, model in closure."""

    @F.pandas_udf(DoubleType())
    def ppl(texts: pd.Series) -> pd.Series:
        return pd.Series([round(model.perplexity(t), 6) for t in texts.fillna("")])

    return docs.select(F.col(id_col), ppl(F.col(text_col)).alias("ppl"))


def perplexity_filter(
    docs: DataFrame,
    model: BigramLM,
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents the LM finds plausible (ppl ≤ max_ppl)."""
    keep = doc_perplexity(docs, model, text_col, id_col).filter(
        F.col("ppl") <= max_ppl
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def perplexity_buckets(
    docs: DataFrame,
    model: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    approx: bool = True,
    scored_df: DataFrame | None = None,
) -> DataFrame:
    """CCNet head/middle/tail: (id, ppl, bucket) with bucket cut at the
    corpus's perplexity terciles.  `approx=True` computes the two cut
    points with the mergeable GK sketch (the 100 TB path — exact
    percentile buffers every value per group); the cuts are two scalar
    doubles broadcast into the bucket expression, so the whole pass is
    score → tiny agg → map.

    `approx=False` is the EXACT small-regime branch: each cut is the
    ppl value at rank ceil(k·n/3) of the sorted finite scores — a
    type-1 (no-interpolation) quantile computed as ORDER BY + LIMIT →
    TakeOrderedAndProject + max, so it is rank-deterministic and
    replayable verbatim by a SQL oracle (no engine-specific
    interpolation arithmetic, and both branches return actual data
    values, never synthesized midpoints).

    Pass ``scored_df`` (a `doc_perplexity` output, possibly pinned
    with localCheckpoint) to reuse already-computed scores — a caller
    that also reports the raw perplexities halves the Arrow scoring
    passes (the `remove_duplicated_spans(spans_df=…)` pattern)."""
    scored = (
        scored_df
        if scored_df is not None
        else doc_perplexity(docs, model, text_col, id_col)
    )
    finite = scored.filter(F.col("ppl") != float("inf"))
    if approx:
        probs = F.array(F.lit(1.0 / 3.0), F.lit(2.0 / 3.0))
        qs = finite.agg(
            F.approx_percentile(F.col("ppl"), probs, F.lit(10_000)).alias("qs")
        ).collect()[0]["qs"]
        lo, hi = (float(qs[0]), float(qs[1])) if qs else (float("inf"), float("inf"))
    else:
        n = finite.count()
        if n == 0:
            lo = hi = float("inf")
        else:
            def _cut(rank: int) -> float:
                row = (
                    finite.orderBy(F.col("ppl").asc())
                    .limit(rank)
                    .agg(F.max("ppl"))
                    .collect()[0][0]
                )
                return float(row)

            lo = _cut(-(-n // 3))
            hi = _cut(-(-2 * n // 3))
    bucket = (
        F.when(F.col("ppl") <= lo, F.lit("head"))
        .when(F.col("ppl") <= hi, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.withColumn("bucket", bucket)
