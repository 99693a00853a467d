"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM-side, codegen) — a 100 TB corpus pass
is a single map stage with no Python in the loop.
"""

from __future__ import annotations

import pandas as pd
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


def _tokens(col: Column) -> Column:
    """Non-empty whitespace tokens of the lowercased text."""
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != F.lit("")
    )


def _word_ngrams(tokens: Column, n: int) -> Column:
    """Space-joined word n-grams as a JVM array expression (no Python).

    Zip-slice construction (the `gram_rows` trick, r12): n shifted
    slices of the token array are zipped once and each struct is
    concatenated — flat array ops instead of a slice-per-element
    interpreted `transform(sequence, i -> slice(tokens, i+1, n))`
    (measured 2.3× faster on the window-occurrence path at sf0.1,
    identical output).  Empty array when the document has fewer than
    n tokens (slice would otherwise produce short/negative spans),
    including NULL input (size(NULL) = -1 takes the otherwise arm,
    exactly like the old guard)."""
    cnt = F.size(tokens) - F.lit(n - 1)
    zipped = F.arrays_zip(
        *[F.slice(tokens, i + 1, cnt).alias(f"t{i}") for i in range(n)]
    )
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            zipped, lambda g: F.concat_ws(" ", *[g[f"t{i}"] for i in range(n)])
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
    top_ppm_max: int = 300_000,
    dup_ppm_max: int = 300_000,
) -> DataFrame:
    """Gopher-style repetition quality filter (Rae et al. 2021, §A1.1):

    - ``top_ngram_ppm``  — parts-per-million of non-whitespace
      characters covered by the single most-repeated word
      ``top_n``-gram (count × gram chars / total chars).
    - ``dup_ngram_ppm``  — ppm of characters covered by word
      ``dup_n``-grams occurring ≥ 2 times (sum of count × gram chars /
      total chars, clamped to 1e6 — overlapping occurrences are counted
      per-occurrence, a documented simplification of the paper's
      character-overlap dedup).
    - ``keep``           — both fractions under their thresholds.

    Fractions are BIGINT ppm via integer division (``DIV``) — exact and
    engine-identical, where a float ``round(x, 6)`` diverges between
    Spark (HALF_UP) and DuckDB (HALF_EVEN) whenever ``tot_chars`` is a
    power of two.

    100 TB shape: one explode of per-doc n-gram arrays (both sizes in a
    single Generate via tagged concat), one (doc, tag, gram) partial-agg
    shuffle, one per-doc agg, then a narrow join back to the doc list —
    no self-joins, no Python.  Reference computes no such filter; this
    is part of the training-data extension set (BASELINE.json).
    """
    toks = _tokens(F.col(text_col))
    tot_chars = F.length(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", ""))
    tagged = F.concat(
        F.transform(
            _word_ngrams(toks, top_n),
            lambda g: F.struct(F.lit("top").alias("tag"), g.alias("gram")),
        ),
        F.transform(
            _word_ngrams(toks, dup_n),
            lambda g: F.struct(F.lit("dup").alias("tag"), g.alias("gram")),
        ),
    )
    from ..util import spread

    grams = (
        spread(df, id_col)
        .select(F.col(id_col), F.explode(tagged).alias("tg"))
        .select(id_col, F.col("tg.tag").alias("tag"), F.col("tg.gram").alias("gram"))
    )
    counts = grams.groupBy(id_col, "tag", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    gram_chars = F.length(F.regexp_replace(F.col("gram"), " ", ""))
    per_doc = counts.groupBy(id_col).agg(
        F.max(F.when(F.col("tag") == "top", F.col("cnt") * gram_chars)).alias("_top_chars"),
        F.sum(
            F.when(
                (F.col("tag") == "dup") & (F.col("cnt") >= 2), F.col("cnt") * gram_chars
            ).otherwise(F.lit(0))
        ).alias("_dup_chars"),
    )
    base = df.select(F.col(id_col), tot_chars.alias("_tot_chars"))
    out = base.join(per_doc, id_col, "left")
    top_ppm = F.expr(
        "CAST((coalesce(_top_chars, 0) * 1000000) DIV greatest(_tot_chars, 1) AS BIGINT)"
    )
    dup_ppm = F.expr(
        "CAST(least((coalesce(_dup_chars, 0) * 1000000) DIV greatest(_tot_chars, 1), 1000000) AS BIGINT)"
    )
    return out.select(
        F.col(id_col),
        top_ppm.alias("top_ngram_ppm"),
        dup_ppm.alias("dup_ngram_ppm"),
        ((top_ppm <= F.lit(top_ppm_max)) & (dup_ppm <= F.lit(dup_ppm_max))).alias("keep"),
    )


# HTML entity map for strip_html (the common named entities; numeric
# entities beyond &#39; are left as-is — rare in crawl text and cheap
# to extend).
_HTML_ENTITIES = [
    ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
]


def encoding_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_bad_ppm: int = 5_000,
) -> DataFrame:
    """Per-doc encoding-health signals for crawl cleaning: replacement
    characters (U+FFFD — a decoder already gave up), C0 control chars
    (binary junk in 'text'), and the classic UTF-8-read-as-Latin-1
    mojibake digraphs (Ã©-style, â€™-style).  Integer ppm like
    repetition_stats (exact, engine-portable), plus a keep flag at
    `max_bad_ppm` total badness.  One codegen map stage."""
    c = F.col(text_col)
    n = F.length(c)
    repl = F.length(c) - F.length(F.regexp_replace(c, "�", ""))
    ctrl = F.length(c) - F.length(
        F.regexp_replace(c, r"[\x00-\x08\x0B\x0C\x0E-\x1F]", "")
    )
    moji = F.size(
        F.regexp_extract_all(c, F.lit("(Ã[©¨«¯±¼½¾€‚„†‰‘’“”]|â€[™œ˜\"]|Â[ °«»])"), 1)
    )
    def ppm(cnt):
        return F.when(n > 0, (cnt * 1_000_000 / n).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return df.select(
        F.col(id_col),
        ppm(repl).alias("replacement_ppm"),
        ppm(ctrl).alias("control_ppm"),
        ppm(moji).alias("mojibake_ppm"),
        (ppm(repl) + ppm(ctrl) + ppm(moji) <= max_bad_ppm).alias("keep"),
    )


def strip_html(col: Column) -> Column:
    """Visible text from raw HTML: drop script/style/comment blocks,
    strip tags, unescape the common entities, collapse whitespace —
    the boilerplate-removal step between a crawl dump and every other
    text operator (quality, dedup, language ID all assume visible
    text, not markup).

    Pure codegen regexp_replace chain — a 100 TB crawl pass is one map
    stage, no Python.  Patterns avoid backreferences and lookarounds
    so the same expressions run on Java regex and RE2-style engines
    (script and style get separate passes instead of a `\\1` backref).
    """
    c = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def visible_text_ratio(col: Column) -> Column:
    """len(visible text) / len(raw) — low values mean markup-dominated
    pages (nav shells, link farms); a standard crawl-quality filter
    alongside quality_score."""
    n = F.length(col)
    return F.when(
        n > 0, F.round(F.length(strip_html(col)) / n, 6)
    ).otherwise(F.lit(0.0))


# PII patterns deliberately restricted to syntax with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): no lookarounds, no
# backrefs, non-capturing groups only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{2,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token: str = "[REDACTED]",
) -> DataFrame:
    """PII scrubbing for training corpora: redact emails, phone
    numbers, and IPv4 addresses; report per-category match counts and
    a has_pii flag (counts taken on the ORIGINAL text, before any
    redaction, so categories don't mask each other).

    Pure column expressions (regexp_count / regexp_replace) — a 100 TB
    corpus pass is one codegen map stage, no shuffle, no Python.
    Patterns apply in deterministic dict order (email → phone → ipv4).
    """
    c = F.col(text_col)
    scrubbed = c
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(F.regexp_count(c, F.lit(pat)).cast("bigint").alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    total = None
    for name in PII_PATTERNS:
        col = F.regexp_count(c, F.lit(PII_PATTERNS[name]))
        total = col if total is None else total + col
    return df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed"),
        *counts,
        (total > 0).alias("has_pii"),
    )


# ---------------------------------------------------------------- C4 heuristics


C4_LINE_BLOCKLIST = ["javascript", "cookie policy", "terms of use", "privacy policy"]


# Gopher required words (Rae et al. 2021, arXiv:2112.11446 A1.1): a
# document must contain ≥2 of these to pass the "stop word" rule
GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_hits: int = 2,
) -> DataFrame:
    """Gopher quality heuristics (Rae et al. 2021, arXiv:2112.11446
    Appendix A1.1), as ONE codegen map stage per document — the
    companion page-level filter to `c4_clean`'s line-level rules:

    - word count in [min_words, max_words];
    - mean word length in [min_mean_word_len, max_mean_word_len];
    - symbol-to-word ratio (# and ellipsis) ≤ max_symbol_word_ratio;
    - ≤ max_bullet_line_frac of lines start with a bullet;
    - ≤ max_ellipsis_line_frac of lines end with an ellipsis;
    - ≥ min_alpha_word_frac of words contain an alphabetic char;
    - ≥ min_required_hits of the GOPHER_REQUIRED_WORDS present.

    Output: input columns + (n_words, mean_word_len,
    symbol_word_ratio, bullet_line_frac, ellipsis_line_frac,
    alpha_word_frac, required_hits, keep).  Every ratio — including
    symbol_word_ratio, whose numerator is kept in 3×-scaled integer
    units — is a SINGLE int/int float division with no intermediate
    float additions, so the rule booleans are bit-identical across
    float64 engines (DuckDB oracle replays them exactly).  No explode,
    no shuffle, no Python.
    """
    text = F.col(text_col)
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    sum_len = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_wl = F.when(n_words > 0, sum_len.cast("double") / n_words).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    # All-integer numerator scaled by 3 (a '...' contributes its 3
    # removed chars directly; '#' and '…' are tripled), so the ratio is
    # ONE int/int double division — no intermediate float additions
    # whose association could differ from the oracle's.
    dots_chars = F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    n_uni = F.length(text) - F.length(F.regexp_replace(text, "…", ""))
    sym3 = F.lit(3) * n_hash + dots_chars + F.lit(3) * n_uni
    symbol_ratio = F.when(
        n_words > 0, sym3.cast("double") / (F.lit(3) * n_words)
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"^[•\-\*▪●]")))
        .cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
        .cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))).cast("double") / n_words,
    ).otherwise(F.lit(0.0))
    lower_words = F.transform(words, lambda w: F.lower(w))
    required_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_WORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    keep = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_word_ratio)
        & (bullet_frac <= max_bullet_line_frac)
        & (ellipsis_frac <= max_ellipsis_line_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (required_hits >= min_required_hits)
    )
    return df.select(
        *df.columns,
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        required_hits.cast("long").alias("required_hits"),
        keep.alias("keep"),
    )


CODE_KEYWORDS = [
    "def", "class", "import", "return", "function", "const", "var",
    "let", "void", "public", "static", "struct", "#include", "fn",
    "lambda", "elif", "endif", "null", "true;", "false;",
]


def code_stats(
    df: DataFrame,
    text_col: str = "text",
    min_signals: int = 2,
    punct_line_ppm: int = 300_000,
    indent_line_ppm: int = 200_000,
    symbol_char_ppm: int = 40_000,
    min_kw_hits: int = 2,
    ident_token_ppm: int = 150_000,
) -> DataFrame:
    """Source-code detection heuristics — the router a mixed crawl
    needs before prose-only filters (Gopher/C4 reject most code, and a
    training mixture wants code COUNTED, not silently filtered).

    Five signals, every one an EXACT integer ppm / count (an integral
    `div`, no floats anywhere, so the DuckDB oracle replays them
    bit-for-bit):

    - punct_lines_ppm:  lines ending in ``;`` ``{`` ``}`` ``(`` ``)``;
    - indent_lines_ppm: lines starting with ≥2 spaces or a tab;
    - symbol_chars_ppm: chars from ``()[]{};=<>|&`` over all chars;
    - kw_hits:          distinct CODE_KEYWORDS present as whole tokens;
    - ident_tokens_ppm: identifier-shaped tokens (snake_case,
      camelCase, or call-like ``name(``).

    ``is_code`` fires when ≥ min_signals of the five cross their
    thresholds.  One codegen map stage per document: no explode, no
    shuffle, no Python.  Patterns avoid lookarounds/backrefs so Java
    regex and RE2 agree."""
    text = F.col(text_col)
    total_chars = F.length(text)

    def ppm(cnt: Column, total: Column) -> Column:
        return F.when(
            total > 0,
            F.call_function("div", cnt.cast("bigint") * F.lit(1_000_000), total.cast("bigint")),
        ).otherwise(F.lit(0)).cast("long")

    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.rtrim(l)),
        lambda l: F.trim(l) != F.lit(""),
    )
    n_lines = F.size(lines)
    punct_lines = F.size(F.filter(lines, lambda l: l.rlike(r"[;{}()]$")))
    indent_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"^(  |\t)"))
    )
    symbol_chars = total_chars - F.length(
        F.regexp_replace(text, r"[()\[\]{};=<>|&]", "")
    )
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    lower_words = F.transform(words, lambda w: F.lower(w))
    kw_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in CODE_KEYWORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    ident_tokens = F.size(
        F.filter(
            words,
            lambda w: w.rlike(r"(_[a-z0-9])|([a-z][A-Z])|(^[A-Za-z_][A-Za-z0-9_]*\()"),
        )
    )
    p_punct = ppm(punct_lines, n_lines)
    p_indent = ppm(indent_lines, n_lines)
    p_symbol = ppm(symbol_chars, total_chars)
    p_ident = ppm(ident_tokens, n_words)
    signals = (
        (p_punct >= punct_line_ppm).cast("int")
        + (p_indent >= indent_line_ppm).cast("int")
        + (p_symbol >= symbol_char_ppm).cast("int")
        + (kw_hits >= min_kw_hits).cast("int")
        + (p_ident >= ident_token_ppm).cast("int")
    )
    return df.select(
        *df.columns,
        p_punct.alias("punct_lines_ppm"),
        p_indent.alias("indent_lines_ppm"),
        p_symbol.alias("symbol_chars_ppm"),
        kw_hits.cast("long").alias("kw_hits"),
        p_ident.alias("ident_tokens_ppm"),
        signals.cast("long").alias("n_signals"),
        (signals >= min_signals).alias("is_code"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    line_blocklist: list[str] | None = None,
) -> DataFrame:
    """C4-style heuristic cleaning (Raffel et al. 2020, §2.2 of
    arXiv:1910.10683), as one codegen map stage per document:

    - keep only lines that end in terminal punctuation (. ! ? ")
      and have ≥ `min_words_per_line` words;
    - drop lines containing a blocklist phrase (case-insensitive;
      'javascript' etc.);
    - flag the whole document for removal when it contains
      'lorem ipsum' or a curly brace, or keeps < `min_kept_lines`
      lines.

    Output: input columns + (cleaned_text, n_lines, n_kept_lines,
    keep).  All higher-order array functions on the line split — no
    explode, no shuffle, no Python.
    """
    bl = [p.lower() for p in (line_blocklist or C4_LINE_BLOCKLIST)]
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )

    def line_ok(l: Column) -> Column:
        words = F.size(F.filter(F.split(l, r"\s+"), lambda t: t != F.lit("")))
        terminal = l.rlike(r'[.!?"]$')
        blocked = F.lit(False)
        for p in bl:
            blocked = blocked | F.lower(l).contains(p)
        return (words >= min_words_per_line) & terminal & ~blocked

    kept = F.filter(lines, line_ok)
    lowered = F.lower(F.col(text_col))
    doc_ok = (
        (F.size(kept) >= min_kept_lines)
        & ~lowered.contains("lorem ipsum")
        & ~F.col(text_col).contains("{")
    )
    return df.select(
        *df.columns,
        F.concat_ws("\n", kept).alias("cleaned_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        doc_ok.alias("keep"),
    )


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL for crawl-grain dedup (the tier BEFORE
    content dedup: C4/RefinedWeb drop exact-URL revisits first):

      · scheme and host lowercased; userinfo kept verbatim
      · default port stripped (:80 for http, :443 for https)
      · fragment dropped
      · tracking params removed (utm_*, gclid, fbclid, ref), the rest
        SORTED for order-insensitivity; empty query drops its '?'
      · trailing slash stripped from non-root paths; empty path → '/'

    Inputs without a '://' scheme pass through trimmed but otherwise
    unchanged (relative links are resolvable only with a base URL);
    NULL stays NULL.  Pure codegen — patterns avoid lookarounds and
    backrefs so the DuckDB RE2 replay is expression-for-expression
    identical."""
    raw = F.trim(col)
    has_scheme = raw.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    scheme = F.lower(F.regexp_extract(raw, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(
        F.regexp_replace(raw, r"#.*$", ""), r"^[A-Za-z][A-Za-z0-9+.-]*://", ""
    )
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)
    hostport = F.regexp_replace(authority, r"^.*@", "")
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port_sfx = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    # strip ALL trailing slashes (one pass must reach the fixed point —
    # '///' taught us single-slash stripping isn't idempotent), then
    # restore the root slash
    stripped = F.regexp_replace(path, r"/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike("^(utm_[^=]*|gclid|fbclid|ref)(=|$)"),
        )
    )
    q_sfx = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    canon = F.concat(
        scheme, F.lit("://"), userinfo, host, port_sfx, path, q_sfx
    )
    return F.when(has_scheme, canon).otherwise(raw)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_ratio_ppm: int = 200_000,
    level: int = 6,
) -> DataFrame:
    """DEFLATE compression ratio as a repetitiveness signal (the
    Gopher/RedPajama-family filter the n-gram repetition stats
    approximate): ratio_ppm = floor(len(zlib(text)) · 10⁶ /
    len(utf8(text))).  Boilerplate, keyword-stuffed, and
    template-looped pages compress far below natural prose
    (~350-600k ppm for English); keep = ratio_ppm ≥ min_ratio_ppm.

    Integer ppm keeps the gate comparison exact; zlib with a pinned
    level is deterministic for a given zlib build, and the oracle
    replays THE SAME interpreter's zlib (pinned-Python VALUES), so no
    cross-build hazard reaches the driver gate.  Arrow-batched
    pandas_udf — one Python pass per batch, no shuffle."""
    from pyspark.sql.types import LongType, StructField, StructType

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                raw = (t or "").encode("utf-8")
                out.append(
                    len(zlib.compress(raw, level)) * 1_000_000 // len(raw)
                    if raw else 0
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "compress_ratio_ppm": out}
            )

    schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType),
         StructField("compress_ratio_ppm", LongType())]
    )
    return (
        df.select(id_col, text_col)
        .mapInPandas(run, schema=schema)
        .withColumn("keep", F.col("compress_ratio_ppm") >= F.lit(min_ratio_ppm))
    )


def pii_column_report(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Column-level PII exposure report — the data-governance sweep a
    pipeline runs over a NEW table before anything downstream touches
    it: for every (string column × PII category), how many rows match
    and what fraction (exact integer ppm).  scrub_pii cleans a known
    text column; this finds WHICH columns need it.

    One scan, one aggregate row (the table_profile shape): every
    (column, category) count is a parallel aggregate expression over
    regexp_count of the shared PII_PATTERNS, stack-unpivoted to long
    form.  Output: (column, category, n_rows, n_matching_rows,
    match_ppm), string columns only."""
    dtypes = dict(df.dtypes)
    cols = [c for c in (cols or df.columns) if dtypes.get(c) == "string"]
    if not cols:
        raise ValueError("no string columns to scan")
    exprs = [F.count(F.lit(1)).alias("_rows")]
    pairs = []
    for c in cols:
        for name, pat in PII_PATTERNS.items():
            alias = f"_m_{c}__{name}"
            exprs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.regexp_count(F.col(c), F.lit(pat)) > 0, 1
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias(alias)
            )
            pairs.append((c, name, alias))
    one = df.agg(*exprs)
    stacked = ", ".join(f"'{c}', '{n}', {a}" for c, n, a in pairs)
    return one.selectExpr(
        "_rows AS n_rows",
        f"stack({len(pairs)}, {stacked}) AS (column, category, n_matching_rows)",
    ).select(
        "column",
        "category",
        F.col("n_rows").cast("long"),
        F.col("n_matching_rows").cast("long"),
        F.when(
            F.col("n_rows") > 0,
            F.expr("CAST(n_matching_rows * 1000000 div n_rows AS BIGINT)"),
        ).otherwise(F.lit(0)).cast("long").alias("match_ppm"),
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    strip_invisible: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Unicode normalization for dedup keys and tokenizer input: NFC
    (default) folds composed/decomposed encodings of the SAME text to
    one byte sequence — 'café' typed as e+acute vs é defeats every
    hash-based dedup tier upstream of this call.  `strip_invisible`
    additionally removes zero-width characters (ZWSP/ZWNJ/ZWJ/BOM,
    U+200B-200D/U+FEFF) and soft hyphens (U+00AD) — the classic
    watermark/paste artifacts that make visually identical documents
    hash apart.

    Spark has no built-in Unicode normalizer, so this is an Arrow
    batch pass (mapInPandas-free: one pandas_udf column op — stays a
    projection, composes with any plan).  Idempotent: applying it
    twice is a no-op (hypothesis-tested), which is THE property a
    dedup-key transform must have."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError("form must be NFC|NFD|NFKC|NFKD")
    drop = dict.fromkeys((0x200B, 0x200C, 0x200D, 0xFEFF, 0x00AD))

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            t = unicodedata.normalize(form, t)
            return t.translate(drop) if strip_invisible else t

        return s.map(one)

    target = out_col or text_col
    return df.withColumn(target, _norm(F.col(text_col)))


def _quasi_keys(quasi_cols: list[str]) -> list:
    """Per quasi column, the CLASS KEY PAIR: the rendered string
    (NULL → '∅', display only) plus an is-null flag — so a literal
    '∅' value never merges with the NULL class (merging could
    inflate a violating class past k), and the enforce semi-join has
    no NULL keys to mismatch on."""
    out = []
    for i, c in enumerate(quasi_cols):
        out.append(
            F.coalesce(F.col(c).cast("string"), F.lit("∅")).alias(f"_q{i}")
        )
        out.append(F.col(c).isNull().alias(f"_n{i}"))
    return out


def _quasi_names(quasi_cols: list[str]) -> list[str]:
    return [f"_q{i}" for i in range(len(quasi_cols))] + [
        f"_n{i}" for i in range(len(quasi_cols))
    ]


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l_distinct: int | None = None,
) -> DataFrame:
    """k-anonymity (and optional l-diversity) audit before a data
    release — the structural privacy check the PII column report
    (pii_column_report above) does not cover: PII scrubbing removes
    DIRECT identifiers, but a quasi-identifier combination (zip ×
    birth-date × segment) can still single people out.  A class of
    size < k is a re-identification risk; with `sensitive_col`, a
    class whose sensitive values have < l distinct values leaks the
    attribute even at size ≥ k (homogeneity attack).

    Exact counts end to end; NULL quasi-values form their own class
    (NULL is a fingerprint too) — classed by a (rendered-string,
    is_null) KEY PAIR, so a column that actually contains the
    rendering sentinel '∅' still classes separately from NULL (the
    two render identically in `quasi_values` but never merge).  Plan
    shape: ONE groupBy on the quasi columns with map-side combine
    (+ a distinct-count per class when l-diversity is requested) —
    the output is violating-classes-sized, with one 'TOTAL' summary
    row carrying class/row totals and the violating shares as exact
    ppm.

    Output rows: (class_kind ∈ class/TOTAL, …quasi values as one
    '|'-joined string, n_rows, n_sensitive_distinct [NULL without
    sensitive_col], k_violation, l_violation); classes appear ONLY if
    they violate (the release gate reads the TOTAL row; the class
    rows are the work list).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if (sensitive_col is None) != (l_distinct is None):
        raise ValueError("give sensitive_col and l_distinct together")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    qs = _quasi_keys(quasi_cols)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("n_sens")
        )
    classes = df.select(*qs, *(
        [F.col(sensitive_col)] if sensitive_col else []
    )).groupBy(*_quasi_names(quasi_cols)).agg(*aggs)
    if sensitive_col is None:
        classes = classes.withColumn("n_sens", F.lit(None).cast("long"))
    kv = F.col("n_rows") < k
    lv = (
        F.col("n_sens") < l_distinct
        if l_distinct is not None else F.lit(False)
    )
    marked = classes.withColumn("k_violation", kv).withColumn(
        "l_violation", lv
    )
    qcat = F.concat_ws("|", *[f"_q{i}" for i in range(len(quasi_cols))])
    viol = marked.filter(F.col("k_violation") | F.col("l_violation")).select(
        F.lit("class").alias("class_kind"),
        qcat.alias("quasi_values"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_sens").cast("long").alias("n_sensitive_distinct"),
        "k_violation", "l_violation",
    )
    total = marked.agg(
        F.count(F.lit(1)).alias("_classes"),
        F.sum("n_rows").alias("_rows"),
        F.sum(F.when(F.col("k_violation"), F.col("n_rows"))
              .otherwise(F.lit(0))).alias("_krows"),
        F.sum(F.when(F.col("l_violation"), F.col("n_rows"))
              .otherwise(F.lit(0))).alias("_lrows"),
    ).select(
        F.lit("TOTAL").alias("class_kind"),
        F.concat_ws(
            "|", F.col("_classes").cast("string"),
            F.expr("CAST(CASE WHEN _rows > 0 THEN _krows * 1000000 "
                   "div _rows ELSE 0 END AS BIGINT)").cast("string"),
            F.expr("CAST(CASE WHEN _rows > 0 THEN _lrows * 1000000 "
                   "div _rows ELSE 0 END AS BIGINT)").cast("string"),
        ).alias("quasi_values"),
        F.col("_rows").cast("long").alias("n_rows"),
        F.lit(None).cast("long").alias("n_sensitive_distinct"),
        (F.col("_krows") > 0).alias("k_violation"),
        (F.col("_lrows") > 0).alias("l_violation"),
    )
    return viol.unionByName(total)


def enforce_k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l_distinct: int | None = None,
    generalize: dict | None = None,
) -> DataFrame:
    """The TRANSFORM companion to `k_anonymity_report`: return df
    restricted to rows whose quasi-identifier class satisfies the
    release policy — size ≥ k and (when sensitive_col/l_distinct are
    given) ≥ l distinct sensitive values — i.e. SUPPRESSION, the only
    anonymization step that needs no domain knowledge.  The output is
    k-anonymous (and l-diverse) BY CONSTRUCTION: re-auditing it
    yields zero violating classes (pytest-pinned invariant).

    `generalize` ({col: coarser Column expression}, e.g. zip →
    substr(zip, 1, 3), age → 10·floor(age/10)) applies ONE rung of
    the caller's generalization ladder BEFORE classing, trading
    precision for retention; iterate ladder rungs externally,
    re-auditing between rungs — the ladder IS domain knowledge and
    stays the caller's.  Suppression bias warning in the output's
    nature: dropped rows are by definition the rare combinations, so
    downstream statistics under-represent exactly the minorities k
    protects — report the suppressed share (the report's TOTAL row)
    next to any released aggregate.

    Plan shape: one classes-sized groupBy (same as the report) + one
    left-semi join of the rows against the passing classes — NULL
    quasi values class by the same (rendered, is_null) key pair as
    the report, so a literal '∅' value never merges with the NULL
    class and the semi-join never compares NULL keys."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if (sensitive_col is None) != (l_distinct is None):
        raise ValueError("give sensitive_col and l_distinct together")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    base = df
    if generalize:
        unknown = set(generalize) - set(df.columns)
        if unknown:
            raise ValueError(f"generalize targets unknown columns {sorted(unknown)}")
        for c, expr in generalize.items():
            base = base.withColumn(c, expr)
    qs = _quasi_keys(quasi_cols)
    qnames = _quasi_names(quasi_cols)
    aggs = [F.count(F.lit(1)).alias("_n")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("_l"))
    classes = base.select(*qs, *(
        [F.col(sensitive_col)] if sensitive_col else []
    )).groupBy(*qnames).agg(*aggs)
    ok = classes.filter(F.col("_n") >= k)
    if l_distinct is not None:
        ok = ok.filter(F.col("_l") >= l_distinct)
    tagged = base.select("*", *qs)
    return tagged.join(ok.select(*qnames), qnames, "left_semi") \
        .drop(*qnames)


def anonymize_with_ladder(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    ladders: dict[str, list],
    sensitive_col: str | None = None,
    l_distinct: int | None = None,
    max_suppressed_ppm: int = 0,
):
    """The packaged generalization-ladder driver around
    `enforce_k_anonymity`: walk rungs of the caller's ladders —
    ``{col: [coarser Column, even coarser Column, ...]}`` — from no
    generalization (rung 0) upward, enforcing the (k, l) policy at
    each rung, until the SUPPRESSED share drops to
    `max_suppressed_ppm` or the ladders are exhausted.  The ladder
    itself stays domain knowledge (zip → substr(zip,1,3) → '*',
    age → decade → '*'); this packages only the loop the enforce
    docstring told callers to run by hand.

    Rung r applies each column's r-th ladder step (columns with a
    shorter ladder hold at their coarsest step).  Retention is
    MONOTONE in the rung by construction — coarsening only merges
    classes, a merged class's size is the sum of its parts and its
    sensitive-distinct count is ≥ each part's, so rows can only flip
    from suppressed to released (pytest-pinned) — which is what
    makes first-rung-under-target the optimal stop.

    Returns ``(released_df, rung_chosen, stats)`` where stats is one
    dict per TRIED rung: {rung, kept, suppressed_ppm}.  If no rung
    meets the target, the coarsest rung's release is returned (its
    stats row shows the shortfall — the caller decides whether to
    ship, extend the ladder, or lower k).  Cost: one enforce plan +
    two counts per tried rung, driver-looped over a handful of rungs
    (the ladder is human-sized by nature)."""
    if not ladders:
        raise ValueError("ladders must map at least one column")
    unknown = set(ladders) - set(quasi_cols)
    if unknown:
        raise ValueError(
            f"ladder columns {sorted(unknown)} are not quasi columns"
        )
    if any(not steps for steps in ladders.values()):
        raise ValueError("every ladder needs at least one rung")
    if not 0 <= max_suppressed_ppm <= 1_000_000:
        raise ValueError("max_suppressed_ppm must be in [0, 1e6]")
    n_rungs = max(len(steps) for steps in ladders.values())
    total = df.count()
    stats: list[dict] = []
    released = None
    rung_used = 0
    for rung in range(n_rungs + 1):
        gen = None
        if rung > 0:
            gen = {
                c: steps[min(rung, len(steps)) - 1]
                for c, steps in ladders.items()
            }
        released = enforce_k_anonymity(
            df, quasi_cols, k,
            sensitive_col=sensitive_col, l_distinct=l_distinct,
            generalize=gen,
        )
        # pin the rung's release before counting (lazy localCheckpoint:
        # the count below materializes it) — the walk already executes
        # each rung's enforce plan once for its `kept`; without the pin
        # the CALLER's first action re-executed the winning rung's
        # whole plan a second time (classes groupBy + semi-join).  One
        # enforce execution per returned frame, job-count pytest-pinned.
        # Non-winning rungs' blocks are dropped by the ContextCleaner
        # when their frames go out of scope.
        released = released.localCheckpoint(eager=False)
        kept = released.count()
        suppressed_ppm = (
            (total - kept) * 1_000_000 // total if total else 0
        )
        stats.append(
            {"rung": rung, "kept": kept, "suppressed_ppm": suppressed_ppm}
        )
        rung_used = rung
        if suppressed_ppm <= max_suppressed_ppm:
            break
    return released, rung_used, stats
