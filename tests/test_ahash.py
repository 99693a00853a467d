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
