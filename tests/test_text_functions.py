"""Scalar text-function parity with the reference semantics
(SURVEY.md §2.7): josa stripping, noun extraction, validity,
breaking indicators, classifier, merge-capped union."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.functions import dates, text


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_strip_josa(spark):
    cases = {
        "대통령이": "대통령",
        "경제를": "경제",
        "부동산에서": "부동산",
        "금리와": "금리",
        "올림픽도": "올림픽",
        "반도체": "반도체",  # no josa → unchanged
    }
    df = spark.createDataFrame([(k,) for k in cases], "w string")
    got = {r["w"]: r["s"] for r in df.select("w", text.strip_josa(F.col("w")).alias("s")).collect()}
    assert got == cases


def test_strip_josa_reference_chain_parity(spark):
    """F1 fixture parity: Spark `strip_josa` must equal the reference's
    sequential `re.sub` chain + ``.strip()``
    (hybrid_keyword_extractor.py:56-69) on a word list covering every
    particle in all four groups plus order-sensitive compounds."""
    import re

    from cdc_pipeline_with_kafka_spark.queries import _KOREAN_WORDS

    # Transcribed verbatim from the reference (content and order).
    josa_patterns = [
        r"(을|를|이|가|은|는|에|에서|에게|한테|께|으로|로|와|과|랑|이랑)$",
        r"(의|도|만|까지|부터|마저|조차|밖에|뿐|라도|라서)$",
        r"(에서|에게|한테서|로부터|으로부터)$",
        r"(다가|면서|지만|거나|든지)$",
    ]

    def reference_remove_josa(text_in: str) -> str:
        for pattern in josa_patterns:
            text_in = re.sub(pattern, "", text_in)
        return text_in.strip()

    df = spark.createDataFrame([(w,) for w in _KOREAN_WORDS], "w string")
    got = {
        r["w"]: r["s"]
        for r in df.select("w", text.strip_josa(F.col("w")).alias("s")).collect()
    }
    expected = {w: reference_remove_josa(w) for w in _KOREAN_WORDS}
    assert got == expected
    # spot-check the order-sensitive compounds the old inventory got wrong
    assert expected["학교까지도"] == "학교까지"
    assert expected["사람들밖에"] == "사람들밖"
    assert expected["친구한테서는"] == "친구"


def test_extract_korean_nouns_filters_length(spark):
    out = _one(
        spark,
        text.extract_korean_nouns(F.lit("대통령이 오늘 경제 정책을 발표했다 a b")),
    )
    assert "대통령" in out and "경제" in out
    assert all(2 <= len(w) <= 8 for w in out)


def test_is_valid_keyword_rules(spark):
    words = ["경제", "그리고", "12345", "하다", "발표하다", "반도체산업동향분석보고", "인공지능"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["ok"]
        for r in df.select("w", text.is_valid_keyword(F.col("w")).alias("ok")).collect()
    }
    assert got["경제"] and got["인공지능"]
    assert not got["그리고"]  # stopword
    assert not got["12345"]  # digits
    assert not got["발표하다"]  # verb ending
    assert not got["반도체산업동향분석보고"]  # >8 chars


def test_breaking_indicators_and_predicate(spark):
    hit = _one(spark, text.breaking_indicators(F.lit("속보: 서울 화재 발생")))
    assert set(hit) == {"속보", "화재"}
    assert _one(spark, text.is_breaking(F.lit("속보입니다"))) is True
    assert _one(spark, text.is_breaking(F.lit("평범한 기사"))) is False


def test_classify_keyword(spark):
    assert _one(spark, text.classify_keyword(F.lit("2024년"))) == "numeric"
    assert _one(spark, text.classify_keyword(F.lit("AI"))) == "short"
    assert _one(spark, text.classify_keyword(F.lit("인공지능"))) == "general"


def test_merge_keywords_capped_order_preserving_dedup(spark):
    out = _one(
        spark,
        text.merge_keywords_capped(
            F.array(F.lit("AI"), F.lit("경제"), F.lit("ai")),
            F.array(F.lit("금리"), F.lit("경제"), F.lit("부동산"), F.lit("선거"), F.lit("태풍"), F.lit("화재")),
            cap=6,
        ),
    )
    assert out == ["AI", "경제", "금리", "부동산", "선거", "태풍"]  # case-folded dedup, capped


def test_weighted_text_and_normalize(spark):
    w = _one(spark, text.weighted_text(F.lit("제목"), F.lit("본문내용"), content_limit=4))
    assert w == "제목 제목 제목 본문내용"[: len(w)] and w.count("제목") == 3
    n = _one(spark, text.normalize_text(F.lit("안녕!!!   세계?? ok")))
    assert n == "안녕 세계 ok"


def test_author_first_token_and_truncate(spark):
    assert _one(spark, text.author_first_token(F.lit("홍길동 기자"))) == "홍길동"
    assert _one(spark, text.truncate(F.lit("abcdef"), 3)) == "abc"


def test_tokenize_drops_empties(spark):
    assert _one(spark, text.tokenize(F.lit("  Hello   World  "))) == ["hello", "world"]


def test_parse_iso_ts_handles_z_suffix(spark):
    got = _one(spark, dates.parse_iso_ts(F.lit("2024-03-01T12:00:00Z")))
    assert got.hour == 12 and got.year == 2024


def test_empty_to_null(spark):
    assert _one(spark, dates.empty_to_null(F.lit("  "))) is None
    assert _one(spark, dates.empty_to_null(F.lit("x"))) == "x"


def test_strip_html_visible_text(spark):
    from cdc_pipeline_with_kafka_spark.operators import textstats

    html = (
        "<html><head><STYLE>body{color:red}</STYLE>"
        "<script type='text/js'>var x = '<b>not text</b>';</script></head>"
        "<body><!-- hidden comment --><h1>Title&nbsp;here</h1>"
        "<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>\n"
        "<div>  spaced   out  </div></body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, "plain text"), (3, "")],
                               "id long, text string")
    got = {
        r["id"]: (r["s"], r["ratio"])
        for r in df.select(
            "id",
            textstats.strip_html(F.col("text")).alias("s"),
            textstats.visible_text_ratio(F.col("text")).alias("ratio"),
        ).collect()
    }
    assert got[1][0] == "Title here A & B <tag> \"q\" 's' spaced out"
    assert 0.0 < got[1][1] < 0.25  # markup-dominated page
    assert got[2] == ("plain text", 1.0)
    assert got[3] == ("", 0.0)
    # case-insensitive + multiline script/style removal really fired
    assert "color" not in got[1][0] and "var x" not in got[1][0]
    assert "hidden" not in got[1][0]


def test_encoding_stats_flags_mojibake_and_junk(spark):
    from cdc_pipeline_with_kafka_spark.operators import textstats

    clean = "a perfectly normal sentence with words in it"
    docs = spark.createDataFrame(
        [
            (1, clean),
            (2, "cafÃ© visit â€™tis broken"),  # Ã© + â€™ mojibake
            (3, "bad � bytes � here"),                        # replacement chars
            (4, "ctrl\x00chars\x01embedded"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in textstats.encoding_stats(docs).collect()}
    assert got[1]["replacement_ppm"] == got[1]["control_ppm"] == got[1]["mojibake_ppm"] == 0
    assert got[1]["keep"] is True
    assert got[2]["mojibake_ppm"] > 0 and not got[2]["keep"]
    assert got[3]["replacement_ppm"] > 0 and not got[3]["keep"]
    assert got[4]["control_ppm"] > 0 and not got[4]["keep"]
    assert got[5]["keep"] is True  # empty doc: nothing bad in it


def test_canonical_url_edge_cases(spark):
    from cdc_pipeline_with_kafka_spark.operators import textstats

    cases = {
        "HTTP://WWW.Example.COM:80/Path/Sub/?utm_source=x&b=2&a=1#frag":
            "http://www.example.com/Path/Sub?a=1&b=2",
        "https://example.com:443/": "https://example.com/",
        "https://example.com:8443/a/": "https://example.com:8443/a",  # non-default port kept
        "http://user:pw@Site.org/page?ref=abc&z=9&utm_campaign=c":
            "http://user:pw@site.org/page?z=9",
        "ftp://Files.example.com:21/dir/": "ftp://files.example.com:21/dir",
        "example.com/no-scheme": "example.com/no-scheme",  # pass-through
        "  http://a.b/  ": "http://a.b/",                  # trimmed, root slash kept
        "http://a.b/x?&&": "http://a.b/x",                 # empty params drop the '?'
        "http://A.b": "http://a.b/",                       # empty path → '/'
    }
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)], "i int, u string"
    )
    got = {
        r.i: r.c
        for r in df.select(
            "i", textstats.canonical_url(F.col("u")).alias("c")
        ).collect()
    }
    for i, (raw, want) in enumerate(cases.items()):
        assert got[i] == want, raw
    # NULL stays NULL
    ndf = spark.createDataFrame([(1, None)], "i int, u string")
    assert ndf.select(textstats.canonical_url(F.col("u")).alias("c")).collect()[0].c is None


def test_url_dedup_composition(spark):
    """canonical_url + dedup_by_key = the crawl-revisit dedup tier:
    tracking-param and case variants of one page collapse to a single
    survivor."""
    from cdc_pipeline_with_kafka_spark.operators import relational, textstats

    df = spark.createDataFrame(
        [
            (1, "http://Example.com/a?utm_source=x"),
            (2, "HTTP://example.COM:80/a"),
            (3, "http://example.com/a?b=1"),
        ],
        "doc_id long, url string",
    )
    canon = df.withColumn("canon", textstats.canonical_url(F.col("url")))
    out = relational.dedup_by_key(canon, ["canon"])
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 3]  # 2 collapses into 1; 3 differs by real param


def test_compression_ratio_separates_repetitive_text(spark):
    from cdc_pipeline_with_kafka_spark.operators import textstats

    natural = (
        "The committee reviewed seventeen proposals during the autumn "
        "session and, after considerable debate about funding priorities, "
        "selected three pilot programs for the coming fiscal year."
    )
    df = spark.createDataFrame(
        [
            (1, natural),
            (2, "spam " * 200),   # template loop → compresses to almost nothing
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.compression_ratio(df).collect()}
    assert out[1].compress_ratio_ppm > 500_000 and out[1].keep
    assert out[2].compress_ratio_ppm < 50_000 and not out[2].keep
    assert out[3].compress_ratio_ppm == 0 and out[4].compress_ratio_ppm == 0
    # exact integer contract vs the same zlib
    import zlib

    raw = natural.encode()
    assert out[1].compress_ratio_ppm == len(zlib.compress(raw, 6)) * 1_000_000 // len(raw)
