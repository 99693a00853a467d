"""U1 extraction tier (column mode ≡ pandas-UDF mode), W7 decay
operator, multimodal plumbing, and the batch API surface."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark import api
from cdc_pipeline_with_kafka_spark.functions import extract
from cdc_pipeline_with_kafka_spark.operators import multimodal

from .fixtures import make_articles

TEXTS = [
    (1, "대통령이 경제 정책을 발표했다", "금리와 부동산 시장에 대한 내용"),
    (2, "속보 태풍 북상", "태풍이 빠르게 북상하고 있다 " * 10),
    (3, "hello world", "english only text"),
]


def test_extract_column_vs_udf_identical(spark):
    df = spark.createDataFrame(TEXTS, "id long, title string, content string")
    col_mode = {
        r["id"]: r["keywords"]
        for r in extract.extract_keywords(df, use_udf=False).collect()
    }
    udf_mode = {
        r["id"]: r["keywords"]
        for r in extract.extract_keywords(df, use_udf=True).collect()
    }
    assert col_mode == udf_mode
    assert all(len(v) <= extract.MAX_KEYWORDS for v in col_mode.values())
    assert "대통령" in col_mode[1] and "경제" in col_mode[1]
    assert col_mode[3] == []  # no Hangul → empty


def test_extract_py_mirror(spark):
    got = extract._extract_py("대통령이 경제 정책을 발표했다 그리고 2024")
    assert got[0] == "대통령" and "그리고" not in got and "2024" not in got


def test_extract_with_real_model_loader(spark):
    """U1 loader contract, worked end-to-end: a non-default model
    (hashing-embedder KeyBERT-style scorer) wired through
    make_extract_udf produces relevance-ordered output distinct from
    the default first-appearance order, over the same candidate set."""
    arts = make_articles(40)
    df = spark.createDataFrame(
        [(a["id"], a["title"], a["content"] + " " + a["title"]) for a in arts],
        "id long, title string, content string",
    )
    default = {
        r["id"]: r["keywords"]
        for r in extract.extract_keywords(df, use_udf=True).collect()
    }
    model = {
        r["id"]: r["keywords"]
        for r in extract.extract_keywords(
            df, use_udf=True, model_loader=extract.make_hashing_model_loader()
        ).collect()
    }
    # same candidate universe (the model re-ranks, it doesn't invent):
    # every model keyword also appears in the default (uncapped)
    # candidate extraction for that document
    import re

    for i in default:
        assert len(model[i]) <= extract.MAX_KEYWORDS
        for kw in model[i]:
            assert re.fullmatch(r"[가-힣]{2,8}", kw), kw
    assert set().union(*model.values()) <= {
        kw for i in default for kw in extract._extract_py(
            " ".join([arts[i - 1]["title"]] * 3) + " "
            + (arts[i - 1]["content"] + " " + arts[i - 1]["title"])[:1000],
            cap=64,
        )
    }
    # ...but the model changes the result for at least some documents
    assert any(default[i] != model[i] for i in default)


def test_model_loader_cache_is_per_udf(spark):
    """Two UDFs built with different loaders must not share a cached
    scorer within one executor process."""
    df = spark.createDataFrame(TEXTS, "id long, title string, content string")
    u_default = extract.make_extract_udf()
    u_model = extract.make_extract_udf(extract.make_hashing_model_loader(cap=2))
    out = df.select(
        u_default(F.col("content")).alias("a"), u_model(F.col("content")).alias("b")
    ).collect()
    caps = {len(r["b"]) for r in out}
    assert max(caps) <= 2  # the capped model actually ran (no cache bleed)
    assert any(len(r["a"]) > 2 for r in out)  # default ran uncapped


def test_mmr_select_demotes_near_duplicate():
    """MMR (reference KeyBERT diversity=0.3 semantics): a candidate
    nearly identical to the first pick is demoted below a less-relevant
    but dissimilar candidate; pure relevance would keep it second."""
    import numpy as np

    cand = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])  # 0 ≡ 1, 2 ⟂
    rel = np.array([0.9, 0.88, 0.6])
    assert extract.mmr_select(rel, cand, cap=3, diversity=0.3) == [0, 2, 1]
    # diversity off (0.0) degenerates to pure relevance order
    assert extract.mmr_select(rel, cand, cap=3, diversity=0.0) == [0, 1, 2]
    assert extract.mmr_select(np.array([]), cand[:0], cap=3) == []


def test_mmr_scorer_diverges_from_pure_relevance(spark):
    """A crafted doc whose top candidates are near-duplicates under the
    bigram-hash embedder: the MMR loader (default, diversity 0.3) and
    the pure-relevance loader (mmr_diversity=None) produce different
    orders through the same Arrow seam."""
    # 경제성장 / 경제성장률 share almost all char bigrams → near-dup
    # candidates; the rest are dissimilar but document-relevant, so MMR
    # pushes 경제성장 to the back while relevance keeps it second.
    text = "경제성장 경제성장률 금리인상 물가상승 수출호조"
    df = spark.createDataFrame([(1, text, text)], "id long, title string, content string")

    def run(loader):
        return extract.extract_keywords(
            df, use_udf=True, model_loader=loader
        ).collect()[0]["keywords"]

    mmr = run(extract.make_hashing_model_loader())
    rel = run(extract.make_hashing_model_loader(mmr_diversity=None))
    assert set(mmr) == set(rel)  # same candidate universe, re-ranked
    assert mmr != rel  # MMR demoted a near-duplicate
    assert mmr[0] == rel[0]  # first pick = highest relevance in both


def test_is_important_threshold(spark):
    df = spark.createDataFrame([(100,), (20000,)], "views int")
    got = [r[0] for r in df.select(extract.is_important(F.col("views"))).collect()]
    assert got == [False, True]


def test_multimodal_feature_extraction(spark):
    rows = [
        (1, 10, "image", bytearray(b"imgbytes-1"), "image/jpeg", 640, 480, None),
        (2, 10, "image", bytearray(b"imgbytes-1"), "image/jpeg", 640, 480, None),  # dup payload
        (3, 11, "audio", bytearray(b"wavbytes"), "audio/wav", None, None, 2000),
        (4, 12, "video", bytearray(b"mp4"), "video/mp4", 1280, 720, 3500),
    ]
    assets = spark.createDataFrame(rows, multimodal.MEDIA_ASSET_SCHEMA)
    feats = multimodal.extract_features(assets).collect()
    assert len(feats) == 4
    by_id = {r["asset_id"]: r for r in feats}
    assert by_id[1]["feature"] == by_id[2]["feature"]  # deterministic fake decoder
    assert by_id[1]["content_hash"] == by_id[2]["content_hash"]
    assert by_id[1]["payload_bytes"] == 10
    assert len(by_id[3]["feature"]) == 8

    deduped = multimodal.dedup_assets_exact(assets)
    assert deduped.count() == 3  # payload dup collapsed, lowest id kept
    assert {r["asset_id"] for r in deduped.collect()} == {1, 3, 4}


def test_multimodal_real_decoder_stub_raises(spark):
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.real_decode_unavailable(b"x")


def _make_wav(n_ch=1, rate=8000, bits=16, samples=(0, 16384, -16384, 32767)):
    import struct

    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes((s % 256) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * bits // 8,
                      n_ch * bits // 8, bits)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def _make_ppm(w=2, h=2, maxval=255, px=None):
    px = px if px is not None else bytes(range(w * h * 3))
    return f"P6\n# comment\n{w} {h}\n{maxval}\n".encode() + bytes(px)


def test_decode_wav_real_bytes(spark):
    import math

    import pytest

    feat = multimodal.decode_wav_features(_make_wav())
    n_ch, rate, bits, frames, dur, rms, peak, zcr = feat
    assert (n_ch, rate, bits, frames) == (1.0, 8000.0, 16.0, 4.0)
    assert dur == round(4 / 8000, 6)
    want_rms = math.sqrt((0 + 0.5**2 + 0.5**2 + (32767 / 32768) ** 2) / 4)
    assert abs(rms - want_rms) < 1e-6
    assert abs(peak - 32767 / 32768) < 1e-6
    # sign changes: 0→+ no, +→- yes, -→+ yes → 2/3
    assert abs(zcr - 2 / 3) < 1e-6

    # 8-bit path
    feat8 = multimodal.decode_wav_features(_make_wav(bits=8, samples=(128, 255, 0, 128)))
    assert feat8[2] == 8.0 and feat8[3] == 4.0

    with pytest.raises(ValueError):
        multimodal.decode_wav_features(b"not a wav")
    with pytest.raises(ValueError):
        multimodal.decode_wav_features(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks


def test_decode_ppm_real_bytes(spark):
    import pytest

    # 1x1 pure red at maxval 255
    feat = multimodal.decode_ppm_features(_make_ppm(w=1, h=1, px=bytes([255, 0, 0])))
    w, h, maxval, mr, mg, mb, lmean, lstd = feat
    assert (w, h, maxval) == (1.0, 1.0, 255.0)
    assert (mr, mg, mb) == (1.0, 0.0, 0.0)
    assert abs(lmean - 0.299) < 1e-6 and lstd == 0.0

    # 16-bit maxval path (big-endian samples per netpbm spec)
    feat16 = multimodal.decode_ppm_features(
        _make_ppm(w=1, h=1, maxval=65535, px=b"\xff\xff\x00\x00\x00\x00")
    )
    assert feat16[2] == 65535.0 and feat16[3] == 1.0

    with pytest.raises(ValueError):
        multimodal.decode_ppm_features(b"P3\n1 1\n255\n1 2 3")  # ascii PPM
    with pytest.raises(ValueError):
        multimodal.decode_ppm_features(b"P6\n1 1\n")  # truncated header


def _make_png(w=2, h=2, color=2, depth=8, pixels=None, filters=None, palette=None):
    """Hand-build a PNG: IHDR + (PLTE) + IDAT(zlib of filtered scanlines)
    + IEND.  `pixels` is the raw per-row sample bytes (post-recon);
    `filters` picks the filter byte per row (default all 0 = None)."""
    import struct
    import zlib

    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bpp = n_ch * depth // 8
    stride = w * bpp
    if pixels is None:
        pixels = bytes(range(h * stride))
    filters = filters or [0] * h
    raw = b""
    prev = bytes(stride)
    for y in range(h):
        row = pixels[y * stride : (y + 1) * stride]
        f = filters[y]
        if f == 0:
            enc = row
        elif f == 1:  # sub
            enc = bytes((row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF
                        for x in range(stride))
        elif f == 2:  # up
            enc = bytes((row[x] - prev[x]) & 0xFF for x in range(stride))
        elif f == 3:  # average
            enc = bytes((row[x] - ((row[x - bpp] if x >= bpp else 0) + prev[x]) // 2)
                        & 0xFF for x in range(stride))
        else:  # paeth
            def pred(x):
                a = row[x - bpp] if x >= bpp else 0
                b, c = prev[x], (prev[x - bpp] if x >= bpp else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc = bytes((row[x] - pred(x)) & 0xFF for x in range(stride))
        raw += bytes([f]) + enc
        prev = row

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def _make_jpeg(w=4, h=3, n_comp=3, progressive=False, scan=b"\x12\x34\x56\x78"):
    import struct

    sof = 0xC2 if progressive else 0xC0
    dqt_body = b"\x00" + bytes(64)  # one 8-bit table, id 0
    sof_body = struct.pack(">BHHB", 8, h, w, n_comp) + bytes(3 * n_comp)
    sos_body = bytes([n_comp]) + bytes(2 * n_comp) + b"\x00\x3f\x00"
    return (b"\xff\xd8"
            + b"\xff\xdb" + struct.pack(">H", 2 + len(dqt_body)) + dqt_body
            + bytes([0xFF, sof]) + struct.pack(">H", 2 + len(sof_body)) + sof_body
            + b"\xff\xda" + struct.pack(">H", 2 + len(sos_body)) + sos_body
            + scan + b"\xff\xd9")


def test_decode_png_real_bytes(spark):
    import pytest

    # 1x1 pure red RGB, filter None
    feat = multimodal.decode_png_features(_make_png(w=1, h=1, pixels=bytes([255, 0, 0])))
    w, h, depth, mr, mg, mb, lmean, lstd = feat
    assert (w, h, depth) == (1.0, 1.0, 8.0)
    assert (mr, mg, mb) == (1.0, 0.0, 0.0)
    assert abs(lmean - 0.299) < 1e-6 and lstd == 0.0

    # every filter type reconstructs to the same pixels as filter-None
    px = bytes([10, 200, 30, 40, 5, 250] * 2)  # 2x2 RGB
    want = multimodal.decode_png_features(_make_png(pixels=px, filters=[0, 0]))
    for f in (1, 2, 3, 4):
        got = multimodal.decode_png_features(_make_png(pixels=px, filters=[f, f]))
        assert got == want, f"filter {f} mismatch"

    # grayscale replicates into RGB means
    g = multimodal.decode_png_features(_make_png(w=2, h=1, color=0, pixels=bytes([0, 255])))
    assert g[3] == g[4] == g[5] == 0.5 and g[6] == 0.5

    # palette PNG routes indices through PLTE
    p = multimodal.decode_png_features(
        _make_png(w=2, h=1, color=3, pixels=bytes([0, 1]),
                  palette=bytes([255, 0, 0, 0, 0, 255]))
    )
    assert (p[3], p[4], p[5]) == (0.5, 0.0, 0.5)  # half red, half blue

    # RGBA alpha dropped; 16-bit depth path
    a = multimodal.decode_png_features(
        _make_png(w=1, h=1, color=6, pixels=bytes([255, 0, 0, 7]))
    )
    assert (a[3], a[4], a[5]) == (1.0, 0.0, 0.0)
    d16 = multimodal.decode_png_features(
        _make_png(w=1, h=1, color=0, depth=16, pixels=b"\xff\xff")
    )
    assert d16[2] == 16.0 and d16[3] == 1.0

    with pytest.raises(ValueError):
        multimodal.decode_png_features(b"\x89PNG\r\n\x1a\njunk")
    with pytest.raises(ValueError):
        multimodal.decode_png_features(b"not a png")


def test_decode_jpeg_real_bytes(spark):
    import math

    import pytest

    feat = multimodal.decode_jpeg_features(_make_jpeg())
    decoded, w, h, prec, n_comp, n_dqt, prog, smean, sent = feat
    assert decoded == 0.0  # header+stats profile (no Huffman tables)
    assert (w, h, prec, n_comp, n_dqt, prog) == (4.0, 3.0, 8.0, 3.0, 1.0, 0.0)
    scan = [0x12, 0x34, 0x56, 0x78]
    assert abs(smean - sum(scan) / 4 / 255.0) < 1e-6
    assert abs(sent - math.log2(4) / 8.0) < 1e-6  # 4 distinct bytes

    prog_feat = multimodal.decode_jpeg_features(_make_jpeg(progressive=True, n_comp=1))
    assert prog_feat[0] == 0.0 and prog_feat[4] == 1.0 and prog_feat[6] == 1.0

    # 0xFF00 stuffing stays in-stream; EOI terminates the stats window
    stuffed = multimodal.decode_jpeg_features(_make_jpeg(scan=b"\xff\x00\x01"))
    assert stuffed[7] > 0

    with pytest.raises(ValueError):
        multimodal.decode_jpeg_features(b"\xff\xd8\xff\xc0\x00\x02")  # truncated SOF
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_features(b"GIF89a")


def test_decode_image_dispatch(spark):
    import pytest

    assert multimodal.decode_image_features(_make_ppm()) == \
        multimodal.decode_ppm_features(_make_ppm())
    assert multimodal.decode_image_features(_make_png()) == \
        multimodal.decode_png_features(_make_png())
    assert multimodal.decode_image_features(_make_jpeg()) == \
        multimodal.decode_jpeg_features(_make_jpeg())
    with pytest.raises(ValueError):
        multimodal.decode_image_features(b"GIF89a...")

    # the dispatcher runs through the mapInPandas pipeline: one
    # registered 'image' decoder handles a mixed PPM/PNG/JPEG column
    rows = [
        (1, 10, "image", bytearray(_make_ppm()), "image/x-portable-pixmap", 2, 2, None),
        (2, 10, "image", bytearray(_make_png()), "image/png", 2, 2, None),
        (3, 11, "image", bytearray(_make_jpeg()), "image/jpeg", 4, 3, None),
    ]
    assets = spark.createDataFrame(rows, multimodal.MEDIA_ASSET_SCHEMA)
    multimodal.set_decoder("image", multimodal.decode_image_features)
    try:
        by_id = {r["asset_id"]: r for r in multimodal.extract_features(assets).collect()}
    finally:
        multimodal._DECODERS.pop("image", None)
    assert by_id[1]["feature"] == multimodal.decode_ppm_features(_make_ppm())
    assert by_id[2]["feature"] == multimodal.decode_png_features(_make_png())
    assert by_id[3]["feature"] == multimodal.decode_jpeg_features(_make_jpeg())


def _make_y4m(w=4, h=2, frames=2, chroma=b"C420", fps=b"F25:1"):
    """Tiny YUV4MPEG2 clip: frame i's Y plane = bytes(i*10 .. i*10+w*h),
    chroma planes constant 128."""
    y_size = w * h
    c_size = {b"C420": y_size // 2, b"C422": y_size, b"C444": 2 * y_size,
              b"Cmono": 0}[chroma]
    out = b"YUV4MPEG2 W%d H%d %s Ip A1:1 %s\n" % (w, h, fps, chroma)
    for i in range(frames):
        out += b"FRAME\n"
        out += bytes((i * 10 + j) % 256 for j in range(y_size))
        out += b"\x80" * c_size
    return out


def test_decode_y4m_real_bytes(spark):
    import numpy as np
    import pytest

    clip = _make_y4m(w=4, h=2, frames=3)
    w, h, fps, n, dur, mean, std, motion = multimodal.decode_y4m_features(clip)
    assert (w, h, fps, n) == (4.0, 2.0, 25.0, 3.0)
    assert dur == round(3 / 25, 6)
    # Y planes are 0..7, 10..17, 20..27 → mean 13.5, every pixel moves 10/frame
    planes = np.array([[i * 10 + j for j in range(8)] for i in range(3)], float)
    assert mean == round(float(planes.mean()), 6)
    assert std == round(float(planes.std()), 6)
    assert motion == 10.0
    # static single frame: zero motion, zero-safe
    one = multimodal.decode_y4m_features(_make_y4m(frames=1))
    assert one[3] == 1.0 and one[7] == 0.0
    # all supported chroma layouts parse to the same luma stats
    for chroma in (b"C422", b"C444", b"Cmono"):
        f = multimodal.decode_y4m_features(_make_y4m(frames=3, chroma=chroma))
        assert f[:2] == [4.0, 2.0] and f[7] == 10.0

    with pytest.raises(ValueError):
        multimodal.decode_y4m_features(b"not a y4m")
    with pytest.raises(ValueError):
        multimodal.decode_y4m_features(_make_y4m(frames=2)[:-3])  # truncated
    with pytest.raises(ValueError):
        multimodal.decode_y4m_features(b"YUV4MPEG2 W4 H2 F25:1 C411\nFRAME\n")


def test_real_decoders_through_spark_pipeline(spark):
    """The registered WAV/PPM/Y4M codecs run through the same
    mapInPandas plumbing as the fake decoder — the feature column
    carries real decoded signal/pixel stats, per media type, in one
    pass."""
    wav, ppm, y4m = _make_wav(), _make_ppm(), _make_y4m()
    rows = [
        (1, 10, "audio", bytearray(wav), "audio/wav", None, None, 1),
        (2, 10, "image", bytearray(ppm), "image/x-portable-pixmap", 2, 2, None),
        (3, 11, "video", bytearray(y4m), "video/x-yuv4mpeg", 4, 2, 80),
    ]
    assets = spark.createDataFrame(rows, multimodal.MEDIA_ASSET_SCHEMA)
    multimodal.set_decoder("audio", multimodal.decode_wav_features)
    multimodal.set_decoder("image", multimodal.decode_ppm_features)
    multimodal.set_decoder("video", multimodal.decode_y4m_features)
    try:
        by_id = {r["asset_id"]: r for r in multimodal.extract_features(assets).collect()}
    finally:
        multimodal._DECODERS.pop("audio", None)
        multimodal._DECODERS.pop("image", None)
        multimodal._DECODERS.pop("video", None)
    assert by_id[1]["feature"] == multimodal.decode_wav_features(wav)
    assert by_id[2]["feature"] == multimodal.decode_ppm_features(ppm)
    assert by_id[3]["feature"] == multimodal.decode_y4m_features(y4m)
    assert by_id[1]["payload_bytes"] == len(wav)


def test_frame_sample_plan(spark):
    rows = [(4, 12, "video", bytearray(b"mp4"), "video/mp4", 1280, 720, 3500)]
    assets = spark.createDataFrame(rows, multimodal.MEDIA_ASSET_SCHEMA)
    frames = multimodal.frame_sample_plan(assets, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000]


def _articles_df(spark):
    rows = make_articles(200)
    return spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "id long, title string, content string, link string, category_id int, "
        "category string, source string, author string, published_at string, "
        "stored_date string, views_count int, sentiment_score double, "
        "article_text_length int, keywords string, created_at string, "
        "updated_at string, version int, is_deleted boolean",
    ).withColumn("created_at", F.to_timestamp("created_at"))


def test_api_get_articles_pagination_and_projection(spark):
    arts = _articles_df(spark)
    page0 = api.get_articles(arts, sort_by="created_at", page=0, size=10).collect()
    page1 = api.get_articles(arts, sort_by="created_at", page=1, size=10).collect()
    assert len(page0) == 10 and len(page1) == 10
    assert {r["id"] for r in page0}.isdisjoint({r["id"] for r in page1})
    # non-deleted only, keyword_list is a clean array
    assert all(not r["is_deleted"] for r in page0)
    assert all(isinstance(r["keyword_list"], list) for r in page0)


def test_api_get_articles_total_count(spark):
    """Page contract: total_count = filtered cardinality (pre-page),
    constant across pages, honoring the dynamic predicate."""
    arts = _articles_df(spark)
    n_live = arts.filter(~F.col("is_deleted")).count()
    page0 = api.get_articles(arts, sort_by="created_at", page=0, size=10, with_total=True).collect()
    page1 = api.get_articles(arts, sort_by="created_at", page=1, size=10, with_total=True).collect()
    assert {r["total_count"] for r in page0} == {n_live}
    assert {r["total_count"] for r in page1} == {n_live}
    # predicate narrows the total, not just the page
    filt = api.get_articles(
        arts, keyword="속보", sort_by="created_at", size=10, with_total=True
    ).collect()
    if filt:
        assert filt[0]["total_count"] < n_live


def test_api_search_and_stats(spark):
    arts = _articles_df(spark)
    hits = api.search(arts, "속보", limit=50).collect()
    assert all("속보" in r["title"].lower() or "속보" in r["content"].lower() for r in hits)
    s = api.stats(arts).collect()[0]
    assert s["total_articles"] == arts.filter(~F.col("is_deleted")).count()
    assert s["categories"] >= 1
    cc = api.count_by_category(arts)
    assert cc.agg(F.sum("cnt")).collect()[0][0] == s["total_articles"]


def test_api_trending_over_hourly_counts(spark):
    # synthetic hourly counts with one surging keyword
    rows = []
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1)
    for h in range(48):
        bucket = base + timedelta(hours=h)
        rows.append((bucket, "steady", 10))
        rows.append((bucket, "surging", 5 if h < 47 else 80))
    hourly = spark.createDataFrame(rows, "bucket timestamp_ntz, keyword string, cnt long")
    out = api.trending(hourly, as_of="2024-03-02 23:00:00", limit=2).collect()
    assert out[0]["keyword"] == "surging"
    assert out[0]["compound_score"] > out[1]["compound_score"]
    # full TrendMetrics shape: velocities, direction, anomaly present
    assert out[0]["velocity_1h"] == 80 - 5  # adjacent-window delta
    assert out[0]["direction"] == "rising"
    assert out[1]["direction"] == "stable"
    assert 0.0 <= out[0]["anomaly"] <= 1.0


def test_api_trending_brand_new_keyword_boost(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 2, 23)  # activity ONLY in the as_of hour
    hourly = spark.createDataFrame(
        [(base, "fresh", 7)], "bucket timestamp_ntz, keyword string, cnt long"
    )
    out = api.trending(hourly, as_of="2024-03-02 23:00:00", limit=1).collect()[0]
    assert out["velocity_1h"] == 14.0  # brand-new boost: current × 2


def test_api_get_articles_with_media(spark):
    arts = _articles_df(spark)
    media = spark.createDataFrame(
        [(1, 1, "image", "http://m/1", None), (2, 1, "video", "http://m/2", "cap")],
        "id long, article_id long, type string, url string, caption string",
    )
    out = api.get_articles(arts, media=media, sort_by="id", ascending=True, size=5)
    rows = {r["id"]: r for r in out.collect()}
    assert rows, "page not empty"
    with_media = rows.get(1)
    if with_media is not None:  # article 1 on page 0 when not deleted
        assert len(with_media["media_items"]) == 2


def test_api_wordcloud(spark):
    counts = spark.createDataFrame(
        [("a", 10), ("b", 5), ("c", 1)], "keyword string, cnt long"
    )
    out = api.wordcloud(counts, top_k=2).collect()
    assert len(out) == 2
    assert out[0]["total_count"] == 16 and out[0]["unique_keywords"] == 3


def test_resize_ppm_real_bytes():
    from cdc_pipeline_with_kafka_spark.operators import multimodal as mm

    # 4x2 image, distinct corner colors
    raster = bytes(
        [255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 0,
         10, 10, 10,  20, 20, 20,  30, 30, 30,  40, 40, 40]
    )
    ppm = b"P6\n4 2\n255\n" + raster
    small = mm.resize_ppm(ppm, 2, 1)
    w, h, maxval, r = mm._ppm_raster(small)
    assert (w, h, maxval) == (2, 1, 255)
    # nearest-neighbor keeps source pixels (0,0) and (0,2)
    assert r[0, 0].tolist() == [255, 0, 0]
    assert r[0, 1].tolist() == [0, 0, 255]
    up = mm.resize_ppm(ppm, 8, 4)
    w2, h2, _, r2 = mm._ppm_raster(up)
    assert (w2, h2) == (8, 4)
    assert r2[0, 0].tolist() == [255, 0, 0]  # upscale replicates
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.resize_ppm(b"P6 garbage", 2, 2)
    with _pytest.raises(ValueError):
        mm.resize_ppm(ppm, 0, 2)


def test_transform_assets_resize_passthrough_and_quarantine(spark):
    from cdc_pipeline_with_kafka_spark.operators import multimodal as mm

    raster = bytes(range(48))
    ppm = b"P6\n4 4\n255\n" + raster
    rows = [
        (1, "image", bytearray(ppm)),
        (2, "audio", bytearray(b"RIFFxxxx")),   # no transform registered
        (3, "image", bytearray(b"not a ppm")),  # quarantined
    ]
    df = spark.createDataFrame(rows, "asset_id long, media_type string, payload binary")
    mm.set_transform("image", lambda p: mm.resize_ppm(p, 2, 2))
    try:
        out = {r.asset_id: r for r in mm.transform_assets(df).collect()}
    finally:
        mm._TRANSFORMS.pop("image", None)
    assert out[1].transform_applied and out[1].error is None
    w, h, _, _ = mm._ppm_raster(bytes(out[1].payload))
    assert (w, h) == (2, 2)
    assert out[1].n_bytes_out < out[1].n_bytes_in
    assert not out[2].transform_applied and bytes(out[2].payload) == b"RIFFxxxx"
    assert out[3].payload is None and "ValueError" in out[3].error


def test_transform_assets_honors_target_size_params(spark):
    """transform_assets(df, w, h) resizes images with NO registered
    transform (the params are load-bearing, not decorative); an
    explicit set_transform('image', ...) still wins."""
    from cdc_pipeline_with_kafka_spark.operators import multimodal as mm

    ppm = b"P6\n4 4\n255\n" + bytes(range(48))
    df = spark.createDataFrame(
        [(1, "image", bytearray(ppm))],
        "asset_id long, media_type string, payload binary",
    )
    out = mm.transform_assets(df, 2, 2).collect()[0]
    assert out.transform_applied
    w, h, _, _ = mm._ppm_raster(bytes(out.payload))
    assert (w, h) == (2, 2)
    # explicit registration overrides the implied resize
    mm.set_transform("image", lambda p: mm.resize_ppm(p, 3, 3))
    try:
        out2 = mm.transform_assets(df, 2, 2).collect()[0]
    finally:
        mm._TRANSFORMS.pop("image", None)
    w2, h2, _, _ = mm._ppm_raster(bytes(out2.payload))
    assert (w2, h2) == (3, 3)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.transform_assets(df, 2, None)


def test_jpeg_baseline_pixel_roundtrip(spark):
    """Full baseline-JPEG pixel decode: encode_jpeg_baseline →
    _jpeg_decode_pixels recovers the pixels to within quantization
    error, and decode_jpeg_features emits the PNG/PPM-shaped
    pixel-stat vector for baseline payloads."""
    import numpy as np
    import pytest

    g = np.linspace(0.0, 1.0, 16 * 24).reshape(16, 24)
    jp = multimodal.encode_jpeg_baseline(g, qtable_value=1)
    w, h, prec, rgb = multimodal._jpeg_decode_pixels(jp)
    assert (w, h, prec) == (24, 16, 8)
    assert np.abs(rgb[:, :, 0] - g).max() < 0.005

    # color, non-multiple-of-8 dims (edge-replicated padding blocks)
    rgbi = np.zeros((10, 13, 3))
    rgbi[:, :, 0] = np.linspace(0, 1, 10)[:, None]
    rgbi[:, :, 1] = 0.5
    rgbi[:, :, 2] = np.linspace(1, 0, 13)[None, :]
    jp2 = multimodal.encode_jpeg_baseline(rgbi, qtable_value=1)
    w2, h2, _, rgb2 = multimodal._jpeg_decode_pixels(jp2)
    assert (w2, h2) == (13, 10)
    assert np.abs(rgb2 - rgbi).max() < 0.01

    # restart markers reset DC predictors and byte-align
    jp3 = multimodal.encode_jpeg_baseline(g, qtable_value=1, restart_interval=2)
    _, _, _, rgb3 = multimodal._jpeg_decode_pixels(jp3)
    assert np.abs(rgb3[:, :, 0] - g).max() < 0.005

    # feature vector is the flagged pixel-stat shape with known values
    feat = multimodal.decode_jpeg_features(jp2)
    assert feat[:4] == [1.0, 13.0, 10.0, 8.0]
    assert abs(feat[4] - rgb2[:, :, 0].mean()) < 1e-5  # mean_r
    luma = 0.299 * rgb2[:, :, 0] + 0.587 * rgb2[:, :, 1] + 0.114 * rgb2[:, :, 2]
    assert abs(feat[7] - luma.mean()) < 1e-5
    assert abs(feat[8] - luma.std()) < 1e-5

    # coarser quantization still reconstructs approximately
    jp4 = multimodal.encode_jpeg_baseline(rgbi, qtable_value=8)
    assert len(jp4) < len(jp2)
    _, _, _, rgb4 = multimodal._jpeg_decode_pixels(jp4)
    assert np.abs(rgb4 - rgbi).max() < 0.06

    # the pixel path refuses what it can't decode (falls back upstream)
    with pytest.raises(ValueError):
        multimodal._jpeg_decode_pixels(_make_jpeg())  # no DHT/zero sampling
    with pytest.raises(ValueError):
        multimodal._jpeg_decode_pixels(_make_jpeg(progressive=True))


def test_reencode_jpeg_transform(spark):
    import numpy as np
    import pytest

    rgbi = np.zeros((8, 8, 3))
    rgbi[:, :, 0] = np.linspace(0, 1, 8)[:, None]
    src = multimodal.encode_jpeg_baseline(rgbi, qtable_value=1)
    small = multimodal.reencode_jpeg(src, qtable_value=16)
    assert len(small) < len(src)
    _, _, _, rgb = multimodal._jpeg_decode_pixels(small)
    assert np.abs(rgb - rgbi).max() < 0.12
    with pytest.raises(ValueError):
        multimodal.reencode_jpeg(b"not a jpeg")


def _make_mp3(n_frames=3, bitrate_idx=9, version_bits=3, layer_bits=1,
              sr_idx=0, mono=False, id3=False, vary_bitrate=False):
    """Hand-built MPEG-audio frame chain (headers + zero payload)."""
    out = bytearray()
    if id3:
        out += b"ID3\x04\x00\x00\x00\x00\x00\x0a" + bytes(10)
    for i in range(n_frames):
        bi = bitrate_idx + (i % 2 if vary_bitrate else 0)
        b1 = 0xE0 | (version_bits << 3) | (layer_bits << 1) | 1
        b2 = (bi << 4) | (sr_idx << 2)
        b3 = 0xC0 if mono else 0x00
        hdr = bytes([0xFF, b1, b2, b3])
        # V1 L3 frame length = 144 * br / sr
        br = multimodal._MP3_BITRATES[(1, 3)][bi - 1] * 1000
        flen = 144 * br // 44100
        out += hdr + bytes(flen - 4)
    return bytes(out)


def _box(btype, body):
    import struct

    return struct.pack(">I", 8 + len(body)) + btype + body


def _make_mp4(dur=90, ts=30, w=640, h=360, v1=False):
    import struct

    if v1:
        mvhd = bytes([1]) + bytes(3) + bytes(16) + struct.pack(">IQ", ts, dur * ts) + bytes(80)
    else:
        mvhd = bytes([0]) + bytes(3) + bytes(8) + struct.pack(">II", ts, dur * ts) + bytes(80)
    tkhd = bytes(4) + bytes(76) + struct.pack(">II", w << 16, h << 16)
    trak = _box(b"tkhd", tkhd)
    moov = _box(b"mvhd", mvhd) + _box(b"trak", trak)
    return (_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
            + _box(b"moov", moov) + _box(b"mdat", bytes(100)))


def test_decode_mp3_real_bytes(spark):
    import pytest

    v, lyr, nf, dur, br, sr, ch, vbr, frac = multimodal.decode_mp3_features(_make_mp3())
    assert (v, lyr, nf) == (1.0, 3.0, 3.0)
    assert sr == 44100.0 and ch == 2.0 and vbr == 0.0
    assert br == 128.0  # index 9 in the V1L3 table
    assert abs(dur - 3 * 1152 / 44100) < 1e-5
    assert frac == 1.0  # whole payload is a valid frame chain

    # ID3v2 tag skipped; mono + VBR detected
    f = multimodal.decode_mp3_features(_make_mp3(id3=True, mono=True, vary_bitrate=True))
    assert f[2] == 3.0 and f[6] == 1.0 and f[7] == 1.0

    # truncated chain: garbage tail after the valid frames lowers the
    # parsed-bytes fraction instead of silently vanishing
    trunc = multimodal.decode_mp3_features(_make_mp3() + b"\x00" * 400)
    assert trunc[2] == 3.0 and trunc[8] < 1.0

    with pytest.raises(ValueError):
        multimodal.decode_mp3_features(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError):
        multimodal.decode_mp3_features(b"\xff\xfb")  # sync but no frame


def test_decode_mp4_real_bytes(spark):
    import pytest

    dur, ts, nt, w, h, nb, mdat, ver = multimodal.decode_mp4_features(_make_mp4())
    assert (dur, ts, nt) == (90.0, 30.0, 1.0)
    assert (w, h) == (640.0, 360.0)
    assert nb == 3.0 and mdat == 100.0 and ver == 0.0

    f1 = multimodal.decode_mp4_features(_make_mp4(v1=True, dur=7))
    assert f1[0] == 7.0 and f1[7] == 1.0

    with pytest.raises(ValueError):
        multimodal.decode_mp4_features(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        multimodal.decode_mp4_features(_box(b"moov", b"\x00\x00\x00\x03badbytes"))


def test_audio_video_dispatchers(spark):
    import pytest

    assert multimodal.decode_audio_features(_make_mp3()) == \
        multimodal.decode_mp3_features(_make_mp3())
    assert multimodal.decode_video_features(_make_mp4()) == \
        multimodal.decode_mp4_features(_make_mp4())
    with pytest.raises(ValueError):
        multimodal.decode_audio_features(b"OggS....")
    with pytest.raises(ValueError):
        multimodal.decode_video_features(b"MKV.....")


def test_wav_single_sample_and_short_tkhd_robustness(spark):
    """Edge hardening: a 1-sample WAV yields zcr 0.0 (not NaN), and a
    truncated tkhd box never reads header bytes as width/height."""
    import math
    import struct

    wav = (b"RIFF" + struct.pack("<I", 40) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", 3) + b"abc")
    feat = multimodal.decode_wav_features(wav)
    assert all(not math.isnan(x) for x in feat)
    assert feat[3] == 1.0 and feat[7] == 0.0  # one frame, zcr 0

    mp4 = (_box(b"ftyp", b"isom")
           + _box(b"moov", _box(b"trak", _box(b"tkhd", b"\x00\x00\x00"))))
    f = multimodal.decode_mp4_features(mp4)
    assert f[3] == 0.0 and f[4] == 0.0  # width/height stay unset


def test_decode_mp3_rate_switching_duration(spark):
    """A sample-rate-switching chain (V1L3 at 44100 then 32000) must
    report duration accumulated per frame at EACH frame's own rate —
    the r5 bug divided total samples by the first frame's rate."""
    def frame(sr_idx, srate):
        b1 = 0xE0 | (3 << 3) | (1 << 1) | 1
        b2 = (9 << 4) | (sr_idx << 2)
        hdr = bytes([0xFF, b1, b2, 0x00])
        br = multimodal._MP3_BITRATES[(1, 3)][8] * 1000
        flen = 144 * br // srate
        return hdr + bytes(flen - 4)

    payload = frame(0, 44100) * 2 + frame(1, 48000)
    f = multimodal.decode_mp3_features(payload)
    assert f[2] == 3.0  # all three frames parsed
    want = 2 * 1152 / 44100 + 1152 / 48000
    assert abs(f[3] - want) < 1e-5
    assert f[5] == 44100.0  # reported sr = FIRST frame's rate
    assert f[8] == 1.0


def test_resample_wav_rate_and_duration(spark):
    import numpy as np
    import pytest

    # 1 kHz ramp, 100 frames stereo at 8000 Hz
    frames = 100
    samples = []
    for i in range(frames):
        samples += [i * 200 - 10000, 10000 - i * 200]  # L ramp up, R down
    src = _make_wav(n_ch=2, rate=8000, bits=16, samples=samples)
    out = multimodal.resample_wav(src, 16000)
    ch, rate, bits, frames_o, dur, rms, peak, zcr = multimodal.decode_wav_features(out)
    assert (ch, rate, bits) == (2.0, 16000.0, 16.0)
    assert frames_o == 200  # 2× the frames at 2× the rate
    src_dur = multimodal.decode_wav_features(src)[4]
    assert abs(dur - src_dur) < 1e-3  # duration preserved
    # downsample halves the frame count; monotone ramp stays monotone
    down = multimodal.resample_wav(src, 4000)
    assert multimodal.decode_wav_features(down)[3] == 50.0
    import struct as _st
    pcm = np.frombuffer(down[-50 * 4:], dtype="<i2").reshape(50, 2)
    assert (np.diff(pcm[:, 0].astype(int)) >= 0).all()
    # 8-bit input comes out as 16-bit PCM
    out8 = multimodal.resample_wav(_make_wav(bits=8, samples=(0, 64, 128, 192)), 8000)
    assert multimodal.decode_wav_features(out8)[2] == 16.0
    with pytest.raises(ValueError):
        multimodal.resample_wav(src, 0)
    with pytest.raises(ValueError):
        multimodal.resample_wav(b"RIFFxxxxJUNK", 8000)


def test_resize_y4m_geometry_and_content(spark):
    import pytest

    clip = _make_y4m(w=4, h=2, frames=3)
    out = multimodal.resize_y4m(clip, 8, 4)
    w, h, fps, nf, dur, mean_l, std_l, motion = multimodal.decode_y4m_features(out)
    src_feat = multimodal.decode_y4m_features(clip)
    assert (w, h) == (8.0, 4.0)
    assert (fps, nf, dur) == (src_feat[2], src_feat[3], src_feat[4])
    # nearest-neighbor upsample preserves mean luma exactly (each
    # source pixel is replicated the same number of times: 4|8, 2|4)
    assert abs(mean_l - src_feat[5]) < 1e-9
    # mono and 444 paths
    mono = multimodal.resize_y4m(_make_y4m(chroma=b"Cmono"), 2, 2)
    assert multimodal.decode_y4m_features(mono)[:2] == [2.0, 2.0]
    c444 = multimodal.resize_y4m(_make_y4m(chroma=b"C444"), 3, 5)
    assert multimodal.decode_y4m_features(c444)[:2] == [3.0, 5.0]
    with pytest.raises(ValueError):
        multimodal.resize_y4m(clip, 3, 2)  # odd width on C420
    with pytest.raises(ValueError):
        multimodal.resize_y4m(b"nope", 2, 2)
    # registry seam: the transform drops into set_transform('video')
    multimodal.set_transform("video", lambda p: multimodal.resize_y4m(p, 2, 2))
    try:
        assert multimodal._TRANSFORMS["video"](clip).startswith(b"YUV4MPEG2 W2 H2")
    finally:
        multimodal._TRANSFORMS.pop("video", None)
