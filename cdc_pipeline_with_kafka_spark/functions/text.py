"""Text scalar functions (SURVEY.md §2.7 F1-F8, F15-F18) as pure
column expressions — JVM-side, whole-stage-codegen friendly, no Python
UDFs in the hot path.

Reference semantics they reproduce:
- F1 josa strip          : keyword-extraction/hybrid_keyword_extractor.py:56-69
- F2 Korean noun extract : hybrid_keyword_extractor.py:71-83
- F3 title weighting     : hybrid_keyword_extractor.py:85-99
- F4 text normalize      : hybrid_keyword_extractor.py:96-97
- F5 keyword validity    : hybrid_keyword_extractor.py:173-188
- F6 tokenize            : crawler-service/.../alert/AlertTopology.java:111-121
- F7 breaking indicators : keyword-extraction/keyword_republisher.py:145-176
- F8 keyword classifier  : keyword_republisher.py:245-253
- F15 author first token : crawler-service/.../CrawlerServiceImpl.java:495-498
- F16 CSV split/zip      : CrawlerServiceImpl.java:656-680
- F18 truncate           : keyword_republisher.py:93
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 45-term stopword set, hybrid_keyword_extractor.py:124-130.
KOREAN_STOPWORDS = [
    "그리고", "하지만", "그러나", "따라서", "그래서", "또한", "이를", "통해",
    "위해", "대해", "관련", "이번", "지난", "오늘", "내일", "어제", "올해",
    "작년", "내년", "현재", "최근", "이후", "이전", "당시", "동안", "통한",
    "대한", "위한", "있는", "없는", "같은", "다른", "새로운", "기자", "뉴스",
    "기사", "사진", "영상", "제공", "무단", "전재", "재배포", "금지", "저작권", "연합뉴스",
]

# Breaking-news keyword list (13 terms), keyword_republisher.py:145-176.
BREAKING_KEYWORDS = [
    "속보", "긴급", "사망", "화재", "사고", "지진", "태풍", "폭발",
    "붕괴", "추락", "충돌", "전쟁", "테러",
]

URGENT_CATEGORIES = ["정치", "사회", "세계"]

# Josa (Korean particle) suffix patterns — the reference's 4 groups,
# verbatim content and order (hybrid_keyword_extractor.py:56-69). The
# chain is order-sensitive: e.g. 학교까지도 loses 도 (group 2) leaving
# 학교까지, and 사람들밖에 loses 에 (group 1) leaving 사람들밖.
_JOSA_PATTERNS = [
    r"(을|를|이|가|은|는|에|에서|에게|한테|께|으로|로|와|과|랑|이랑)$",
    r"(의|도|만|까지|부터|마저|조차|밖에|뿐|라도|라서)$",
    r"(에서|에게|한테서|로부터|으로부터)$",
    r"(다가|면서|지만|거나|든지)$",
]


def strip_josa(col: Column) -> Column:
    """F1: strip Korean postposition suffixes — one `regexp_replace`
    per group, in the reference's order, then trim, mirroring its
    sequential `re.sub` chain + ``.strip()`` exactly
    (hybrid_keyword_extractor.py:56-69)."""
    out = col
    for pat in _JOSA_PATTERNS:
        out = F.regexp_replace(out, pat, "")
    return F.trim(out)


def extract_korean_nouns(col: Column) -> Column:
    """F2: array of candidate nouns — runs of 2-8 Hangul chars, josa
    stripped, length ≥ 2 after stripping."""
    raw = F.regexp_extract_all(col, F.lit(r"([가-힣]{2,8})"), 1)
    stripped = F.transform(raw, strip_josa)
    return F.filter(stripped, lambda x: F.length(x) >= 2)


def weighted_text(title: Column, content: Column, content_limit: int = 1000) -> Column:
    """F3: title×3 + first 1000 chars of content (title-weighted corpus)."""
    c = F.substring(F.coalesce(content, F.lit("")), 1, content_limit)
    t = F.coalesce(title, F.lit(""))
    return F.concat_ws(" ", t, t, t, c)


def normalize_text(col: Column) -> Column:
    """F4: drop non-word/non-Hangul chars, collapse whitespace, trim."""
    cleaned = F.regexp_replace(col, r"[^\w\s가-힣]", " ")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def is_valid_keyword(col: Column, *, min_len: int = 2, max_len: int = 8) -> Column:
    """F5: boolean validity — length in [2,8], not pure digits, not a
    stopword, no verb ending (하다/되다/있다/없다)."""
    return (
        F.length(col).between(min_len, max_len)
        & ~col.rlike(r"^\d+$")
        & ~col.isin(KOREAN_STOPWORDS)
        & ~col.rlike(r"(하다|되다|있다|없다)$")
    )


def tokenize(col: Column) -> Column:
    """F6: lowercase whitespace tokenization (AlertTopology.java:111-121),
    with empty tokens removed."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != F.lit(""))


def breaking_indicators(title: Column, keywords: Column | None = None) -> Column:
    """F7: array of matched breaking-news indicator terms found in the
    title (substring containment) plus overlap with the keyword array."""
    terms = F.array(*[F.lit(t) for t in BREAKING_KEYWORDS])
    in_title = F.filter(terms, lambda t: F.contains(F.coalesce(title, F.lit("")), t))
    if keywords is None:
        return in_title
    in_kw = F.filter(terms, lambda t: F.array_contains(F.coalesce(keywords, F.array()), t))
    return F.array_distinct(F.concat(in_title, in_kw))


def is_breaking(title: Column) -> Column:
    """F7 predicate form: does the title contain any breaking term."""
    terms = F.array(*[F.lit(t) for t in BREAKING_KEYWORDS])
    return F.exists(terms, lambda t: F.contains(F.coalesce(title, F.lit("")), t))


def classify_keyword(col: Column) -> Column:
    """F8: digit-containing → 'numeric'; len≤2 → 'short'; else 'general'."""
    return (
        F.when(col.rlike(r"\d"), F.lit("numeric"))
        .when(F.length(col) <= 2, F.lit("short"))
        .otherwise(F.lit("general"))
    )


def author_first_token(col: Column) -> Column:
    """F15: first whitespace token of the author field."""
    return F.split(col, " ").getItem(0)


def split_csv(col: Column) -> Column:
    """F16/P7: split a comma-joined string into a trimmed, non-empty array
    (ArticleServiceImpl.java:252-258)."""
    parts = F.transform(F.split(F.coalesce(col, F.lit("")), ","), lambda x: F.trim(x))
    return F.filter(parts, lambda x: x != F.lit(""))


def truncate(col: Column, n: int) -> Column:
    """F18: first n characters."""
    return F.substring(col, 1, n)


def sentiment_stub() -> Column:
    """U5: constant sentiment distribution (the reference ships a stub,
    keyword_republisher.py:212); the seam where a model-backed pandas
    UDF would slot in."""
    return F.struct(
        F.lit(0.3).alias("pos"), F.lit(0.4).alias("neg"), F.lit(0.3).alias("neu")
    )


def trend_score_stub(keywords: Column) -> Column:
    """U6: constant per-keyword trend score map
    (keyword_republisher.py:255-261); replaced by a join against the
    real trend metrics (operators.trends) in the full pipeline."""
    return F.map_from_arrays(
        keywords, F.transform(keywords, lambda _: F.lit(0.5))
    )


def merge_keywords_capped(primary: Column, secondary: Column, cap: int = 6) -> Column:
    """O5: order-preserving case-insensitive dedup union of two keyword
    arrays, capped (hybrid_keyword_extractor.py:243-260).

    The reference keeps first-seen casing; we lower-case fold for the
    seen-set and keep original order primary-then-secondary.
    """
    merged = F.concat(F.coalesce(primary, F.array()), F.coalesce(secondary, F.array()))
    # aggregate with an accumulator array, appending only unseen (case-folded)
    return F.slice(
        F.aggregate(
            merged,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                F.exists(acc, lambda y: F.lower(y) == F.lower(x)), acc
            ).otherwise(F.concat(acc, F.array(x))),
        ),
        1,
        cap,
    )
