"""Trainable BPE tokenizer for corpus token accounting.

`textstats.word_token_count` is a cheap BPE-ish ESTIMATE (regex word
pieces); this module is the real thing: learn byte-pair merges from a
corpus sample, then tokenize/count at scale with an Arrow-batched UDF.
Token counts drive packing budgets (curation.pack_sequential), price
estimates and dataset cards, so "estimate" vs "actual tokenizer" is a
real accuracy difference for a training-data pipeline.

Scale shape mirrors the IVF/PQ codebooks: TRAIN on a driver-side
hard-capped sample (merges are the ~vocab_size-row artifact), SHIP the
merge table to executors in the UDF closure, APPLY in one map stage —
no shuffle, no per-row Python beyond the vectorized batch loop.

The algorithm is standard BPE (Sennrich et al. 2016): start from
characters + an end-of-word marker, repeatedly merge the most frequent
adjacent symbol pair.  Ties break lexicographically so training is
deterministic for the oracle/replay story.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

EOW = "▁"  # end-of-word marker (SentencePiece-style block char)


def _words(text: str) -> list[str]:
    return [w for w in text.lower().split() if w]


def train_bpe(
    corpus: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_train_rows: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from a hard-capped, deterministic
    corpus sample (ordered limit — same contract as train_ivf_codebook
    / train_pq_codebook).  Returns the ordered merge list; order IS the
    merge priority at apply time."""
    if max_train_rows <= 0:
        raise ValueError(f"max_train_rows must be positive, got {max_train_rows}")
    rows = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(max_train_rows)
        .select(text_col)
        .collect()
    )
    word_freq: Counter = Counter()
    for r in rows:
        word_freq.update(_words(r[text_col] or ""))
    return train_bpe_from_counts(word_freq, num_merges)


def train_bpe_from_counts(
    word_freq: Counter, num_merges: int
) -> list[tuple[str, str]]:
    """The pure training kernel behind `train_bpe`: learn merges from a
    word-frequency table.  Exposed separately so the driver-side oracle
    replay can train from the same counts without a SparkSession."""
    # word -> current symbol tuple (chars + EOW on the last char)
    symbols = {
        w: tuple(list(w[:-1]) + [w[-1] + EOW]) for w in word_freq if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_freq: Counter = Counter()
        for w, syms in symbols.items():
            f_w = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] += f_w
        if not pair_freq:
            break
        # max by (freq, then lexicographically SMALLEST pair) — fully
        # deterministic across runs/hosts
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] < 2:
            break  # nothing left that actually repeats
        merges.append(best)
        merged = best[0] + best[1]
        new_symbols = {}
        for w, syms in symbols.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_symbols[w] = tuple(out)
        symbols = new_symbols
    return merges


def _bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by rank priority (GPT-2-style apply)."""
    syms = list(word[:-1]) + [word[-1] + EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize_py(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python tokenize (the UDF kernel and the test model)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out: list[str] = []
    for w in _words(text or ""):
        out.extend(_bpe_word(w, ranks))
    return out


def make_bpe_udfs(merges: list[tuple[str, str]]):
    """Build (tokenize_udf, count_udf) sharing one merge table shipped
    via closure.  Arrow-batched; per-word results are memoized per
    batch (corpus text repeats words heavily, so the cache hit rate is
    the win over naive per-call application)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _tokenize_series(texts: pd.Series) -> list[list[str]]:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts.fillna(""):
            toks: list[str] = []
            for w in _words(t):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _bpe_word(w, ranks)
                toks.extend(got)
            out.append(toks)
        return out

    @F.pandas_udf(ArrayType(StringType()))
    def tokenize(texts: pd.Series) -> pd.Series:
        return pd.Series(_tokenize_series(texts))

    @F.pandas_udf(IntegerType())
    def count(texts: pd.Series) -> pd.Series:
        return pd.Series([len(t) for t in _tokenize_series(texts)])

    return tokenize, count


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bpe_tokens) for every document — the packing-budget /
    dataset-card input.  One map stage, merges broadcast in closure."""
    _, count = make_bpe_udfs(merges)
    return docs.select(F.col(id_col), count(F.col(text_col)).alias("n_bpe_tokens"))
