"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM-side, codegen) — a 100 TB corpus pass
is a single map stage with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language detector.  Deliberately small and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "des"],
    "es": ["el", "la", "los", "y", "es", "que", "una", "de"],
}

ENGLISH_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "for", "on", "with", "as", "was", "are"]


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


def word_token_count(col: Column) -> Column:
    """BPE-ish token estimate: count word pieces + digit runs +
    punctuation marks separately (a cheap proxy for subword tokenizers)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"([A-Za-z]+|\d+|[^\sA-Za-z\d])"), 1))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are (English) stopwords."""
    sw = F.array(*[F.lit(s) for s in (stopwords or ENGLISH_STOPWORDS)])
    tokens = F.split(F.lower(F.trim(col)), r"\s+")
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(tokens) > 0, hits / F.size(tokens)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars."""
    n = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[^\.,!\?;:'\"]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    tokens = F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != F.lit(""))
    total = F.aggregate(tokens, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(tokens) > 0, total / F.size(tokens)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite document quality in [0,1]: length band + stopword
    presence + sane mean word length.  Mirrors the shape of common
    corpus-filtering heuristics (C4/Gopher-style rules), deterministic
    and SQL-expressible for the oracle."""
    n_tokens = token_count(col)
    len_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.least(sw / F.lit(0.2), F.lit(1.0))
    mwl = mean_word_length(col)
    mwl_score = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_score * 0.4 + sw_score * 0.4 + mwl_score * 0.2, 6)


def detect_language(col: Column) -> Column:
    """Marker-stopword language heuristic: score each language by its
    marker-token hit count; argmax with deterministic tiebreak order
    en>de>fr>es; 'und' (unknown) when no markers hit."""
    tokens = F.split(F.lower(F.trim(col)), r"\s+")

    def marker_hits(markers: list[str]) -> Column:
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    out = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def doc_fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (rolling-hash equivalent for identity; for near-dup use
    operators.dedup.simhash64)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document text profile: tokens, est. subword tokens,
    stopword/punct ratios, quality, detected language, fingerprint.

    The text column is carried through a Generate barrier so the
    per-metric expressions (each of which tokenizes) operate on one
    materialized value rather than re-inlining the scan expression."""
    from ..util import spread

    base = spread(df, id_col).select(
        F.col(id_col),
        F.explode(F.array(F.col(text_col))).alias("_text"),
    )
    c = F.col("_text")
    return base.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        word_token_count(c).alias("n_subtokens"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(mean_word_length(c), 6).alias("mean_word_len"),
        quality_score(c).alias("quality"),
        detect_language(c).alias("lang_detected"),
        doc_fingerprint(c).alias("fingerprint"),
    )
