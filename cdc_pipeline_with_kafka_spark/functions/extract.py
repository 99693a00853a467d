"""Keyword extraction tier (SURVEY.md §2.9 U1-U3).

The reference's HybridKeywordExtractor
(keyword-extraction/hybrid_keyword_extractor.py:33-171) embeds text
with KeyBERT/KoBERT and falls back to regex noun extraction; LLM
refinement (U2) is applied selectively for important articles
(views>10000 or comments>100, hybrid_keyword_extractor.py:23-26).

Spark-first layering:
- ``extract_keywords_column`` — the deterministic regex mode as PURE
  column expressions (F2+F5+O6, JVM-side).  This is the correctness-
  tested path and the default.
- ``extract_keywords_pandas_udf`` — the Arrow-batched pandas UDF slot
  for a real embedding model.  The model loader is pluggable; without
  a model it applies the same deterministic algorithm (so the UDF
  plumbing — batching, schema, broadcast — is real and tested), and a
  KeyBERT-style scorer can be dropped in per executor.
- ``llm_refine_stub`` — U2 interface, disabled by default: selective
  enrichment belongs in foreachBatch outside the streaming hot path.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .text import (
    _JOSA_PATTERNS,
    KOREAN_STOPWORDS,
    extract_korean_nouns,
    is_valid_keyword,
    weighted_text,
)

MAX_KEYWORDS = 6  # hybrid_keyword_extractor.py:243-260 cap

_HANGUL_RE = re.compile(r"[가-힣]{2,8}")
# Same four reference groups as the column path (text._JOSA_PATTERNS,
# hybrid_keyword_extractor.py:59-64) — imported, not re-transcribed, so
# the Python mirror can't drift from the Spark expression again.
_JOSA_RES = [re.compile(p) for p in _JOSA_PATTERNS]
_VERB_RE = re.compile(r"(하다|되다|있다|없다)$")
_STOPWORDS = set(KOREAN_STOPWORDS)


def extract_keywords_column(title: Column, content: Column, cap: int = MAX_KEYWORDS) -> Column:
    """Deterministic extraction as column expressions: title-weighted
    text → Hangul noun candidates → validity filter → ordered distinct
    → cap.  Whole-stage-codegen, no Python."""
    nouns = extract_korean_nouns(weighted_text(title, content))
    valid = F.filter(nouns, lambda x: is_valid_keyword(x))
    return F.slice(F.array_distinct(valid), 1, cap)


def _extract_py(text: str, cap: int = MAX_KEYWORDS) -> list[str]:
    """Pure-Python mirror of extract_keywords_column (used by the
    pandas UDF fallback scorer and unit tests)."""
    out: list[str] = []
    seen: set[str] = set()
    for word in _HANGUL_RE.findall(text or ""):
        for josa in _JOSA_RES:
            word = josa.sub("", word)
        if (
            2 <= len(word) <= 8
            and not word.isdigit()
            and word not in _STOPWORDS
            and not _VERB_RE.search(word)
            and word not in seen
        ):
            seen.add(word)
            out.append(word)
        if len(out) >= cap:
            break
    return out


# Per-executor model cache (broadcast-like lazy init; U1's "model per
# executor" pattern without shipping the model through the closure).
# Keyed per built UDF so two UDFs with different loaders never share a
# scorer within one executor process.
_MODEL: dict[str, object] = {}
_UDF_SEQ = 0


def _default_scorer(texts: Iterable[str]) -> list[list[str]]:
    return [_extract_py(t) for t in texts]


def make_extract_udf(
    model_loader: Callable[[], Callable[[Iterable[str]], list[list[str]]]] | None = None,
):
    """Build the Arrow-batched extraction UDF (U1).

    `model_loader` runs once per executor process and returns a batch
    scorer (e.g. a KeyBERT wrapper).  Heavy model libs are not in this
    container, so the default scorer is the deterministic algorithm —
    the UDF plumbing (Arrow batches, schema, lazy per-executor init)
    is identical either way.  `make_hashing_model_loader` below is a
    complete in-container example of the loader contract.
    """
    global _UDF_SEQ
    _UDF_SEQ += 1
    cache_key = f"scorer-{_UDF_SEQ}"

    @F.pandas_udf(ArrayType(StringType()))
    def extract_udf(texts: pd.Series) -> pd.Series:
        if cache_key not in _MODEL:
            _MODEL[cache_key] = model_loader() if model_loader else _default_scorer
        scorer = _MODEL[cache_key]
        return pd.Series(scorer(texts.fillna("").tolist()))

    return extract_udf


def mmr_select(
    doc_sims,  # np.ndarray: relevance of each candidate to the document
    cand_matrix,  # np.ndarray: candidate embedding rows (L2-normalized)
    cap: int,
    diversity: float = 0.3,
) -> list[int]:
    """Maximal Marginal Relevance: greedy selection trading relevance
    against max-similarity-to-already-selected — the re-rank the
    reference's KeyBERT path runs with use_mmr=True, diversity=0.3
    (keyword-extraction/hybrid_keyword_extractor.py:33-54,101-171).

    score(c) = (1 - diversity)·rel(c) − diversity·max_{s∈selected} sim(c, s)

    First pick = highest relevance; ties break on candidate index
    (first appearance).  Returns selected candidate indices in pick
    order.  Pure numpy, runs inside the Arrow batch — no extra Spark
    stage."""
    import numpy as np

    n = len(doc_sims)
    if n == 0:
        return []
    selected = [int(np.lexsort((np.arange(n), -doc_sims))[0])]
    remaining = [i for i in range(n) if i != selected[0]]
    while remaining and len(selected) < cap:
        sel_m = cand_matrix[selected]  # |S| × dim
        max_sim = (cand_matrix[remaining] @ sel_m.T).max(axis=1)
        mmr = (1.0 - diversity) * doc_sims[remaining] - diversity * max_sim
        best = int(np.lexsort((np.array(remaining), -mmr))[0])
        selected.append(remaining.pop(best))
    return selected


def word_candidates(text: str, cap: int = 64) -> list[str]:
    """Language-agnostic candidate generator for the hashing loader:
    distinct lowercase word tokens (≥2 chars) in first-appearance
    order.  The default `_extract_py` candidates are Hangul-only
    (mirroring the reference's Korean news domain); this is the drop-in
    for multilingual corpora."""
    out: list[str] = []
    seen: set[str] = set()
    for w in re.findall(r"\w{2,}", (text or "").lower()):
        if w not in seen:
            seen.add(w)
            out.append(w)
        if len(out) >= cap:
            break
    return out


def make_hashing_model_loader(
    dim: int = 256,
    cap: int = MAX_KEYWORDS,
    mmr_diversity: float | None = 0.3,
    candidates: Callable[[str], list[str]] | None = None,
):
    """Worked example of the U1 `model_loader` contract: a KeyBERT-style
    embedding scorer built from in-container parts (numpy + a hashing
    vectorizer — no model weights needed).

    The reference ranks candidate nouns by embedding similarity to the
    document and MMR-re-ranks with diversity 0.3
    (hybrid_keyword_extractor.py:33-54,101-171, KeyBERT with KoBERT
    vectors); this loader does exactly that shape with a deterministic
    char-bigram hashing embedder standing in for the sentence encoder:

      1. candidates = the same regex noun extraction,
      2. embed document + candidates (L2-normalized hashed bigrams),
      3. rank candidates by cosine(document, candidate),
      4. MMR re-rank (diversity=`mmr_diversity`, reference default 0.3)
         so near-duplicate candidates don't crowd the top-cap; pass
         mmr_diversity=None for pure-relevance order.

    Output therefore ORDERS BY (MMR-adjusted) RELEVANCE, unlike the
    default scorer's first-appearance order — tests assert the orders
    diverge, proving a real model changes results through this seam,
    and that MMR diverges from pure relevance on near-dup candidates.
    Swapping in an actual encoder = replacing `_embed` with
    `model.encode`.  `candidates` overrides the candidate generator
    (default: the reference's Hangul noun extraction; pass
    `word_candidates` for multilingual corpora).
    """
    import hashlib

    import numpy as np

    cand_fn = candidates if candidates is not None else (
        lambda t: _extract_py(t, cap=64)
    )

    def loader():
        def _embed(texts: list[str]) -> np.ndarray:
            m = np.zeros((len(texts), dim), dtype=np.float64)
            for i, t in enumerate(texts):
                for j in range(len(t) - 1):
                    h = int.from_bytes(
                        hashlib.md5(t[j : j + 2].encode("utf-8")).digest()[:4], "big"
                    )
                    m[i, h % dim] += 1.0
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            return m / norms

        def scorer(texts: Iterable[str]) -> list[list[str]]:
            out = []
            for t in texts:
                cands = cand_fn(t)
                if not cands:
                    out.append([])
                    continue
                vecs = _embed([t] + cands)
                sims = vecs[1:] @ vecs[0]
                if mmr_diversity is not None:
                    picks = mmr_select(sims, vecs[1:], cap, mmr_diversity)
                else:
                    picks = sorted(range(len(cands)), key=lambda i: (-sims[i], i))[:cap]
                out.append([cands[i] for i in picks])
            return out

        return scorer

    return loader


def extract_keywords(
    df,
    title_col: str = "title",
    content_col: str = "content",
    out_col: str = "keywords",
    use_udf: bool = False,
    model_loader=None,
):
    """Apply extraction: column-expression mode by default (fast,
    deterministic), pandas-UDF mode when a model is configured."""
    if not use_udf:
        return df.withColumn(
            out_col, extract_keywords_column(F.col(title_col), F.col(content_col))
        )
    udf = make_extract_udf(model_loader)
    return df.withColumn(out_col, udf(weighted_text(F.col(title_col), F.col(content_col))))


def is_important(views: Column, comments: Column | None = None) -> Column:
    """U2 gate: views>10000 or comments>100
    (hybrid_keyword_extractor.py:23-26)."""
    cond = views > 10000
    if comments is not None:
        cond = cond | (comments > 100)
    return cond


def llm_refine_stub(keywords: Column) -> Column:
    """U2 stub: identity refinement (the OpenAI call is an external
    enrichment, disabled in tests — hybrid_keyword_extractor.py:204-241).
    Kept as the seam where a foreachBatch enrichment would slot in."""
    return keywords
