"""Audio fingerprinting (multimodal.ahash64 / ahash_assets): the WAV
counterpart of the pHash tier — envelope + zero-crossing 64-bit hash,
level- and resample-invariant, pairs reused from phash_pairs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cdc_pipeline_with_kafka_spark.operators import multimodal as mm


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _wav(samples, rate=8000, n_ch=1, bits=16):
    a = np.asarray(samples)
    data = a.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * bits // 8,
                      n_ch * bits // 8, bits)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _noise_clip(seed: str, n=2048) -> np.ndarray:
    """sha-noise samples (the gate's synth): iid window energies and
    crossing counts → ~independent hash bits across seeds."""
    import hashlib

    body = b""
    i = 0
    while len(body) < n * 2:
        body += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    return (np.frombuffer(body[: n * 2], dtype="<i2").astype(np.int64)) // 2


def _tone_mix(seed: str, n=4000, rate=8000) -> np.ndarray:
    import hashlib

    rng = np.random.default_rng(
        int.from_bytes(hashlib.sha256(seed.encode()).digest()[:4], "big")
    )
    t = np.arange(n) / rate
    f1, f2 = rng.uniform(100, 900, 2)
    env = np.abs(np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t))
    x = env * (np.sin(2 * np.pi * f1 * t) + 0.5 * np.sin(2 * np.pi * f2 * t)) / 1.6
    return np.round(x * 20000).astype(np.int64)


def test_ahash_volume_invariant():
    s = _tone_mix("vol")
    assert mm.ahash64(_wav(s)) == mm.ahash64(_wav(s // 2))


def test_ahash_stereo_mono_consistent():
    s = _tone_mix("stereo")
    stereo = np.column_stack([s, s]).ravel()
    assert mm.ahash64(_wav(s)) == mm.ahash64(_wav(stereo, n_ch=2))


def test_ahash_resample_robust():
    """Upsampling preserves the hash (envelope and per-second ZCR both
    survive); a 2× DOWNSAMPLE may drop crossings near Nyquist, so it
    only stays within the broad near-dup band."""
    s = _tone_mix("resample")
    base = mm.ahash64(_wav(s))
    up = mm.resample_wav(_wav(s), 16000)
    assert _ham(base, mm.ahash64(up)) <= 2
    down = mm.resample_wav(_wav(s), 4000)
    assert _ham(base, mm.ahash64(down)) <= 16


def test_ahash_discriminates():
    """Independent noise clips → near-independent bits.  (Structured
    clips that genuinely share envelope/ZCR shape hash close together
    — that's the near-dup semantics, not a defect.)"""
    hashes = [mm.ahash64(_wav(_noise_clip(f"clip{i}"))) for i in range(10)]
    dists = [
        _ham(hashes[i], hashes[j]) for i in range(10) for j in range(i + 1, 10)
    ]
    assert min(dists) > 12


def test_ahash_assets_pairs_via_phash_pairs(spark):
    rows = []
    for i in range(8):
        s = _tone_mix(f"pair{i}")
        rows.append((2 * i, _wav(s)))
        rows.append((2 * i + 1, _wav(s // 2)))  # volume twin
    rows.append((99, b"RIFF\x00\x00\x00\x00WAVE"))  # malformed → quarantine
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    hashes = mm.ahash_assets(df)
    out = {r.asset_id: r for r in hashes.collect()}
    assert out[99].ahash is None and out[99].ahash_error
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.phash_pairs(hashes, max_hamming=6, hash_col="ahash").collect()
    }
    for i in range(8):
        assert pairs.get((2 * i, 2 * i + 1)) == 0


def test_ahash_too_short_clip_raises():
    with pytest.raises(ValueError, match="too short"):
        mm.ahash64(_wav(np.zeros(8, dtype=np.int64)))


def test_audio_overlap_pairs_detects_embedded_jingle(spark):
    """Clip B embeds clip A's 1-second jingle at an arbitrary sample
    offset: whole-clip hashes differ (content mostly disjoint) but a
    window at 50% hop re-covers the jingle; clip C is unrelated."""
    jingle = _tone_mix("jingle", n=8000)       # 1s @ 8k
    # embeds are HOP-ALIGNED (4000-sample grid at hop=500ms) — the
    # operator's documented contract; unaligned byte-identical embeds
    # are cdc_chunks territory (see docstring)
    a = np.concatenate([_tone_mix("a-head", n=4000), jingle])
    b = np.concatenate(
        [_tone_mix("b-head", n=8000), jingle, _tone_mix("b-tail", n=4000)]
    )
    c = _tone_mix("unrelated", n=16000)
    df = spark.createDataFrame(
        [(1, _wav(a)), (2, _wav(b)), (3, _wav(c)), (4, b"not audio")],
        "asset_id long, payload binary",
    )
    base_a, base_b = mm.ahash64(_wav(a)), mm.ahash64(_wav(b))
    assert _ham(base_a, base_b) > 6  # whole-clip vote dilutes the overlap
    out = {
        (r.id_a, r.id_b): (r.shared_segments, r.min_hamming)
        for r in mm.audio_overlap_pairs(df, max_hamming=4).collect()
    }
    assert (1, 2) in out
    assert all(3 not in p and 4 not in p for p in out)


def test_segment_ahash_windows_and_quarantine(spark):
    s = _tone_mix("segs", n=16000)  # 2s @ 8k
    df = spark.createDataFrame(
        [(1, _wav(s)), (2, b"junk")], "asset_id long, payload binary"
    )
    rows = mm.segment_ahash_assets(df, seg_ms=1000, hop_ms=500).collect()
    by = {}
    for r in rows:
        by.setdefault(r.asset_id, []).append(r.seg_idx)
    # 2s clip, 1s window, 0.5s hop → starts at 0/0.5/1.0 s = 3 windows
    assert sorted(by[1]) == [0, 1, 2]
    assert 2 not in by


def test_unaligned_byte_identical_embed_caught_by_cdc_chunks(spark):
    """The coverage hand-off the audio_overlap_pairs docstring
    promises: a byte-identical jingle at an UNALIGNED offset defeats
    the positional segment hash but is found by content-defined
    chunking over the PCM bytes (boundaries resync at any offset)."""
    jingle = _tone_mix("jingle2", n=8000)
    a = np.concatenate([_tone_mix("ha", n=4000), jingle])
    b = np.concatenate([_tone_mix("hb", n=9123), jingle, _tone_mix("tb", n=3001)])
    df = spark.createDataFrame(
        [(1, _wav(a)), (2, _wav(b))], "asset_id long, payload binary"
    )
    chunks = mm.cdc_chunk_assets(df)
    out = {
        (r.id_a, r.id_b): r.shared_bytes
        for r in mm.shared_chunk_pairs(chunks, min_shared_bytes=1024).collect()
    }
    assert (1, 2) in out and out[(1, 2)] >= 8000  # ≥half the 16 KB jingle


def test_audio_align_pairs_unaligned_perceptual_overlap(spark):
    """The Haitsma-Kalker tier closes the third overlap class: a
    2-second jingle embedded at an UNALIGNED 1234-sample offset is
    recovered with the correct frame alignment; the unrelated clip
    stays below the vote floor."""
    jingle = _tone_mix("hk-jingle", n=16000)  # 2 s @ 8 kHz
    a = np.concatenate([_tone_mix("hk-ha", n=8000), jingle])
    b = np.concatenate(
        [_tone_mix("hk-hb", n=8000 + 1234), jingle, _tone_mix("hk-tb", n=4000)]
    )
    c = _tone_mix("hk-unrelated", n=28000)
    df = spark.createDataFrame(
        [(1, _wav(a)), (2, _wav(b)), (3, _wav(c)), (4, b"junk")],
        "asset_id long, payload binary",
    )
    sub = mm.audio_subfp_assets(df).localCheckpoint()
    out = {
        (r.id_a, r.id_b): r
        for r in mm.audio_align_pairs(sub, min_votes=8).collect()
    }
    assert (1, 2) in out
    # true offset: jingle starts at frame ~8000/200=40 in A and
    # ~9234/200≈46 in B → offset ≈ +6 frames (±1 for grid blur);
    # this content peaks at 10 coherent votes vs a 2-3 vote noise
    # floor — the separation the Hough vote relies on
    assert abs(out[(1, 2)].offset_frames - 6) <= 1
    assert out[(1, 2)].votes >= 8
    assert all(3 not in p and 4 not in p for p in out)


def test_audio_subfp_common_value_cap(spark):
    """Near-silence collapses frames to one sub-fingerprint; the
    max_fp_df cap drops those values before the join (stopword
    removal), so a silence-heavy pair produces no spurious alignment."""
    silence = np.zeros(24000, dtype=np.int64)
    df = spark.createDataFrame(
        [(1, _wav(silence)), (2, _wav(silence.copy()))],
        "asset_id long, payload binary",
    )
    sub = mm.audio_subfp_assets(df)
    out = mm.audio_align_pairs(sub, min_votes=2, max_fp_df=10).collect()
    assert out == []


def test_vote_key_packs_lexicographic_ordering(spark):
    """r13: the packed-bigint vote key must rank exactly like the
    (votes desc, displacement asc…) struct ordering it replaced —
    negative displacements included — and raise loudly when a
    component leaves the asserted range instead of mis-ranking."""
    import itertools

    import pyspark.sql.functions as F
    import pytest as _pt

    from cdc_pipeline_with_kafka_spark.operators import multimodal as mm

    vals = [-1048575, -17, -1, 0, 1, 17, 1048575]
    votes = [0, 1, 5, 1048575]
    rows = [(v, d) for v, d in itertools.product(votes, vals)]
    df = spark.createDataFrame(rows, "votes long, off int")
    got = [
        (r["votes"], r["off"])
        for r in df.select(
            "votes", "off",
            mm._vote_key(F.col("votes"), F.col("off")).alias("k"),
        ).orderBy("k").collect()
    ]
    want = sorted(rows, key=lambda t: (t[0], -t[1]))
    assert got == want
    # two components: (votes desc, dy asc, dx asc)
    rows2 = [(v, dy, dx) for v, dy, dx in
             itertools.product([1, 7], [-3, 0, 3], [-2, 2])]
    df2 = spark.createDataFrame(rows2, "votes long, dy int, dx int")
    out2 = df2.select(
        mm._vote_key(F.col("votes"), F.col("dy"), F.col("dx")).alias("k"),
        "votes", "dy", "dx",
    ).orderBy(F.col("k").desc())
    top = out2.first()
    assert (top["votes"], top["dy"], top["dx"]) == (7, -3, -2)
    # unpack round-trips
    r = out2.select(
        mm._vote_key_votes(F.col("k"), 2).alias("v"),
        mm._vote_key_part(F.col("k"), 2, 0).alias("dy2"),
        mm._vote_key_part(F.col("k"), 2, 1).alias("dx2"),
        "votes", "dy", "dx",
    ).collect()
    assert all(x["v"] == x["votes"] and x["dy2"] == x["dy"]
               and x["dx2"] == x["dx"] for x in r)
    # out-of-range displacement raises instead of silently wrapping
    bad = spark.createDataFrame([(1, 1 << 20)], "votes long, off int")
    with _pt.raises(Exception, match="packable range"):
        bad.select(mm._vote_key(F.col("votes"), F.col("off"))).collect()
