"""Video fingerprinting (multimodal.vhash64 / vhash_assets): per-frame
luma pHash + tie-free majority vote — the Y4M member of the
image/audio/video near-dup family, pairable via phash_pairs."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from cdc_pipeline_with_kafka_spark.operators import multimodal as mm


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _block_frames(seed: str, n=12, w=32, h=32, blk=8, shift=0):
    out = []
    bw, bh = w // blk, h // blk
    for f in range(n):
        body = b""
        i = 0
        while len(body) < bw * bh:
            body += hashlib.sha256(f"{seed}:{f}:{i}".encode()).digest()
            i += 1
        small = np.frombuffer(body[: bw * bh], dtype=np.uint8).reshape(bh, bw)
        big = np.kron(small, np.ones((blk, blk), dtype=np.uint8))
        if shift:
            big = np.minimum(big.astype(np.int64) + shift, 255).astype(np.uint8)
        out.append(big.tobytes())
    return out


def _y4m(frames, w=32, h=32):
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1 Cmono\n".encode()
    return hdr + b"".join(b"FRAME\n" + f for f in frames)


def _noise_frames(seed: str, n=12, w=32, h=32, shift=0):
    out = []
    for f in range(n):
        body = b""
        i = 0
        while len(body) < w * h:
            body += hashlib.sha256(f"n:{seed}:{f}:{i}".encode()).digest()
            i += 1
        a = np.frombuffer(body[: w * h], dtype=np.uint8)
        if shift:
            a = np.minimum(a.astype(np.int64) + shift, 255).astype(np.uint8)
        out.append(a.tobytes())
    return out


def test_vhash_brightness_and_single_frame_robust():
    """Full-rank noise frames: the brightness twin is bit-identical
    (only DC moves); block texture leaves borderline coefficients, so
    its twin may drift a couple of bits — the gate synth uses noise
    frames for exactly this reason."""
    base = mm.vhash64(_y4m(_noise_frames("c1")))
    assert base == mm.vhash64(_y4m(_noise_frames("c1", shift=3)))
    corrupted = _noise_frames("c1")
    corrupted[5] = bytes(32 * 32)  # one black frame — outvoted
    assert _ham(base, mm.vhash64(_y4m(corrupted))) <= 2
    blk = mm.vhash64(_y4m(_block_frames("c1")))
    assert _ham(blk, mm.vhash64(_y4m(_block_frames("c1", shift=3)))) <= 4


def test_vhash_resize_invariant_on_block_texture():
    clip = _y4m(_block_frames("c1"))
    base = mm.vhash64(clip)
    assert _ham(base, mm.vhash64(mm.resize_y4m(clip, 16, 16))) <= 2
    assert _ham(base, mm.vhash64(mm.resize_y4m(clip, 64, 64))) <= 2


def test_vhash_discriminates():
    hashes = [mm.vhash64(_y4m(_block_frames(f"c{i}"))) for i in range(8)]
    dists = [_ham(hashes[i], hashes[j]) for i in range(8) for j in range(i + 1, 8)]
    assert min(dists) > 12


def test_vhash_short_clip_and_quarantine(spark):
    # a 2-frame clip still hashes (k = min(9, n)); empty clip raises
    short = mm.vhash64(_y4m(_block_frames("s", n=2)))
    assert isinstance(short, int)
    with pytest.raises(ValueError, match="no frames"):
        mm.vhash64("YUV4MPEG2 W4 H4 F25:1 Cmono\n".encode())
    df = spark.createDataFrame(
        [(1, _y4m(_block_frames("ok"))), (2, b"not video")],
        "asset_id long, payload binary",
    )
    out = {r.asset_id: r for r in mm.vhash_assets(df).collect()}
    assert out[1].vhash is not None and out[1].vhash_error is None
    assert out[2].vhash is None and out[2].vhash_error


def test_vhash_pairs_find_twins(spark):
    rows = []
    for i in range(6):
        rows.append((2 * i, _y4m(_noise_frames(f"p{i}"))))
        rows.append((2 * i + 1, _y4m(_noise_frames(f"p{i}", shift=3))))
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.phash_pairs(
            mm.vhash_assets(df), max_hamming=6, hash_col="vhash"
        ).collect()
    }
    for i in range(6):
        assert pairs.get((2 * i, 2 * i + 1)) == 0


def test_frame_phash_assets_shapes_and_sampling(spark):
    clip = _y4m(_noise_frames("frames", n=12))
    df = spark.createDataFrame(
        [(1, clip), (2, b"not video")], "asset_id long, payload binary"
    )
    rows = mm.frame_phash_assets(df, max_frames=5).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == {1}  # undecodable emits no rows
    assert len(by_asset[1]) == 5
    assert [r.frame_idx for r in sorted(by_asset[1], key=lambda r: r.frame_idx)] == [
        1, 3, 6, 8, 10
    ]


def test_video_overlap_pairs_detects_shared_footage(spark):
    """Clip B embeds 4 of clip A's 12 frames (a re-cut) — whole-clip
    vhash64 majority vote dilutes this, but frame-grain matching finds
    it; clip C is unrelated."""
    a_frames = _noise_frames("shared", n=12)
    b_frames = _noise_frames("bnoise", n=8) + a_frames[4:8]
    c_frames = _noise_frames("unrelated", n=10)
    df = spark.createDataFrame(
        [(1, _y4m(a_frames)), (2, _y4m(b_frames)), (3, _y4m(c_frames))],
        "asset_id long, payload binary",
    )
    # whole-clip hashes: A vs B is NOT a near-dup pair (vote diluted)
    va = mm.vhash64(_y4m(a_frames))
    vb = mm.vhash64(_y4m(b_frames))
    assert _ham(va, vb) > 6
    out = {
        (r.id_a, r.id_b): (r.shared_frames, r.min_hamming)
        for r in mm.video_overlap_pairs(
            df, min_shared_frames=2, max_frames=64
        ).collect()
    }
    assert (1, 2) in out
    shared, min_h = out[(1, 2)]
    assert shared >= 2 and min_h == 0
    assert all(3 not in pair for pair in out)
    # temporal coherence: B embeds A's frames 4..7 starting at its
    # frame 8 → matches concentrate at offset +4 (Hough vote)
    full = {
        (r.id_a, r.id_b): r
        for r in mm.video_overlap_pairs(df, min_shared_frames=2, max_frames=64).collect()
    }
    r = full[(1, 2)]
    assert r.best_offset == 4 and r.coherent_frames >= 2


def test_set_fingerprinter_seam(spark):
    mm.set_fingerprinter("hologram", lambda raw: len(raw))
    try:
        df = spark.createDataFrame(
            [(1, "hologram", b"abcd")], "asset_id long, media_type string, payload binary"
        )
        out = mm.fingerprint_assets(df).collect()
        assert out[0].fp == 4 and out[0].fp_error is None
    finally:
        mm._FINGERPRINTERS.pop("hologram", None)
