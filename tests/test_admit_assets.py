"""Multimodal asset admission (multimodal.admit_assets +
streaming.make_admit_assets_sink): rolling perceptual dedup across
image/audio/video shards against a persisted 16-byte/asset
fingerprint index — the asset twin of the text admission tier."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.operators import multimodal as mm
from cdc_pipeline_with_kafka_spark.streaming import pipeline

ASSET_SCHEMA = "asset_id long, media_type string, payload binary"


def _ppm(seed: str, shift=0, w=24, h=24) -> bytes:
    body = b""
    i = 0
    while len(body) < w * h * 3:
        body += hashlib.sha256(f"img:{seed}:{i}".encode()).digest()
        i += 1
    a = np.frombuffer(body[: w * h * 3], dtype=np.uint8)
    if shift:
        a = np.minimum(a.astype(np.int64) + shift, 255).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _wav(seed: str, halve=False, n=2048) -> bytes:
    body = b""
    i = 0
    while len(body) < n * 2:
        body += hashlib.sha256(f"wav:{seed}:{i}".encode()).digest()
        i += 1
    samples = np.frombuffer(body[: n * 2], dtype="<i2").astype(np.int64) // 2
    if halve:
        samples = samples // 2
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _y4m(seed: str, shift=0, n=6, w=24, h=24) -> bytes:
    frames = []
    for f in range(n):
        body = b""
        i = 0
        while len(body) < w * h:
            body += hashlib.sha256(f"y4m:{seed}:{f}:{i}".encode()).digest()
            i += 1
        a = np.frombuffer(body[: w * h], dtype=np.uint8)
        if shift:
            a = np.minimum(a.astype(np.int64) + shift, 255).astype(np.uint8)
        frames.append(a.tobytes())
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1 Cmono\n".encode()
    return hdr + b"".join(b"FRAME\n" + f for f in frames)


def test_fingerprint_assets_dispatches_by_type(spark):
    df = spark.createDataFrame(
        [
            (1, "image", _ppm("a")),
            (2, "audio", _wav("a")),
            (3, "video", _y4m("a")),
            (4, "hologram", b"???"),
        ],
        ASSET_SCHEMA,
    )
    out = {r.asset_id: r for r in mm.fingerprint_assets(df).collect()}
    assert out[1].fp == mm.phash64(_ppm("a"))
    assert out[2].fp == mm.ahash64(_wav("a"))
    assert out[3].fp == mm.vhash64(_y4m("a"))
    assert out[4].fp is None and "hologram" in out[4].fp_error


def test_fingerprint_assets_quarantines_garbage_not_crashes(spark):
    """Truncated / garbage payloads through EVERY registered
    fingerprinter quarantine (fp NULL + error string) instead of
    failing the job: decoders wrap malformed input in ValueError by
    convention, but struct.error / IndexError / zlib.error from an
    unwrapped depth must be caught too — one bad asset must never
    kill the whole pass."""
    import hashlib

    good = {"image": _ppm("g"), "audio": _wav("g"), "video": _y4m("g")}
    rows, rid = [], 0
    for mt, payload in good.items():
        variants = [
            b"",                                  # empty
            payload[:3],                          # truncated header
            payload[: len(payload) // 2],         # truncated body
            payload[:8] + b"\xff" * 64,           # corrupt after magic
            hashlib.sha256(mt.encode()).digest() * 40,  # pure garbage
        ]
        for v in variants:
            rows.append((rid, mt, v))
            rid += 1
        rows.append((rid, mt, payload))           # one good control
        rid += 1
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = {r.asset_id: r for r in mm.fingerprint_assets(df).collect()}
    assert len(out) == len(rows)  # nothing dropped, job survived
    goods = {i for i, (_, mt, p) in enumerate(rows) if p == good[mt]}
    for i, r in out.items():
        if i in goods:
            assert r.fp is not None and r.fp_error is None
        elif r.fp is None:
            assert r.fp_error  # quarantined with the error type


def test_admit_assets_within_shard_and_against_index(spark):
    shard = spark.createDataFrame(
        [
            (10, "image", _ppm("x")),
            (11, "image", _ppm("x", shift=3)),   # near-dup of 10 → lower id wins
            (12, "audio", _wav("y")),
            (13, "video", _y4m("z")),
            (14, "image", b"garbage"),
        ],
        ASSET_SCHEMA,
    )
    out = mm.admit_assets(shard, index_fps=None)
    admitted = {r.asset_id for r in out["admitted"].collect()}
    reasons = {r.asset_id: r.reason for r in out["rejected"].collect()}
    assert admitted == {10, 12, 13}
    assert reasons[11] in ("exact_dup", "near_dup")
    assert reasons[14] == "undecodable"
    fps_delta = {r.asset_id for r in out["fps_delta"].collect()}
    assert fps_delta == {10, 12, 13}

    # second shard against the first shard's index: volume-scaled audio
    # twin rejected as exact_dup; cross-type fp collisions cannot pair
    idx = out["fps_delta"]
    shard2 = spark.createDataFrame(
        [
            (20, "audio", _wav("y", halve=True)),  # level twin of 12
            (21, "image", _ppm("new")),
        ],
        ASSET_SCHEMA,
    )
    out2 = mm.admit_assets(shard2, index_fps=idx)
    assert {r.asset_id for r in out2["admitted"].collect()} == {21}
    reasons2 = {r.asset_id: r.reason for r in out2["rejected"].collect()}
    assert reasons2[20] == "exact_dup"


def test_streaming_asset_admission_two_batches(spark, tmp_path):
    """Two micro-batches through make_admit_assets_sink: the second
    batch's perceptual twins are rejected against the index the first
    batch appended — cross-batch state via the persisted fingerprint
    parquet, no streaming state store, payload bytes never re-read."""
    import os
    import time

    src = tmp_path / "assets_src"
    src.mkdir()
    b0 = spark.createDataFrame(
        [(1, "image", _ppm("p")), (2, "audio", _wav("q")), (3, "video", _y4m("r"))],
        ASSET_SCHEMA,
    )
    b1 = spark.createDataFrame(
        [
            (11, "image", _ppm("p", shift=3)),  # near-dup of asset 1
            (12, "video", _y4m("r", shift=3)),  # near-dup of asset 3
            (13, "image", _ppm("fresh")),
        ],
        ASSET_SCHEMA,
    )
    b0.coalesce(1).write.parquet(str(src / "b0"))
    b1.coalesce(1).write.parquet(str(src / "b1"))
    now = time.time()
    for root, _dirs, files in os.walk(src / "b0"):
        for f in files:
            os.utime(os.path.join(root, f), (now - 60, now - 60))

    assets = str(tmp_path / "assets")
    fps = str(tmp_path / "fps")
    rejected = str(tmp_path / "rejected")
    stream = (
        spark.readStream.schema(ASSET_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            pipeline.make_admit_assets_sink(assets, fps, rejected)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    admitted = {r.asset_id for r in spark.read.parquet(assets).collect()}
    assert admitted == {1, 2, 3, 13}
    reasons = {
        r.asset_id: r.reason for r in spark.read.parquet(rejected).collect()
    }
    assert set(reasons) == {11, 12} and all(
        v in ("exact_dup", "near_dup") for v in reasons.values()
    )
    idx = {r.asset_id for r in spark.read.parquet(fps).collect()}
    assert idx == admitted


def test_asset_sink_replay_is_idempotent(spark, tmp_path):
    """Replaying a batch (same batch_id) after a crash between the fps
    write and the assets write must not reject the batch's own assets
    against their partially-written first attempt."""
    assets = str(tmp_path / "assets")
    fps = str(tmp_path / "fps")
    rejected = str(tmp_path / "rejected")
    sink = pipeline.make_admit_assets_sink(assets, fps, rejected)
    b0 = spark.createDataFrame([(1, "image", _ppm("solo"))], ASSET_SCHEMA)
    sink(b0, 0)
    sink(b0, 0)  # full replay — overwrite, not append
    rows = spark.read.parquet(assets).collect()
    assert {r.asset_id for r in rows} == {1} and len(rows) == 1
    fp_rows = spark.read.parquet(fps).collect()
    assert len(fp_rows) == 1
    assert spark.read.parquet(rejected).count() == 0


def test_cdc_chunks_shift_robust_and_exact_cover():
    """Content-defined boundaries: a 7-byte insert near the head
    re-chunks only its neighborhood (fixed-size blocking would lose
    every block after the edit); spans tile the payload exactly."""
    import hashlib as _h

    def blob(seed, n=8192):
        body = b""
        i = 0
        while len(body) < n:
            body += _h.sha256(f"{seed}:{i}".encode()).digest()
            i += 1
        return body[:n]

    a = blob("cdc-base")
    ca = mm.cdc_chunks(a)
    off = 0
    for o, ln, _hx in ca:
        assert o == off
        off += ln
    assert off == len(a)
    b = a[:100] + b"INSERT7" + a[100:]
    ha = {h for *_s, h in ca}
    hb = {h for *_s, h in mm.cdc_chunks(b)}
    assert len(ha & hb) >= len(ha) - 3
    assert mm.cdc_chunks(a) == ca  # deterministic
    with pytest.raises(ValueError, match="min"):
        mm.cdc_chunks(a, min_size=0)
    with pytest.raises(ValueError, match="min"):
        mm.cdc_chunks(a, min_size=1024, avg_size=512)


def test_shared_chunk_pairs_finds_embedded_segment(spark):
    """Payload B embeds a 4 KB segment of payload A behind a different
    header: whole-file hashes differ, perceptual hashing is the wrong
    tool (opaque binary), but shared CDC chunks expose the overlap."""
    import hashlib as _h

    def blob(seed, n):
        body = b""
        i = 0
        while len(body) < n:
            body += _h.sha256(f"{seed}:{i}".encode()).digest()
            i += 1
        return body[:n]

    seg = blob("shared-seg", 4096)
    a = blob("head-a", 512) + seg
    b = blob("head-b", 2048) + seg
    c = blob("unrelated", 6000)
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "asset_id long, payload binary"
    )
    chunks = mm.cdc_chunk_assets(df)
    out = {
        (r.id_a, r.id_b): (r.shared_chunks, r.shared_bytes)
        for r in mm.shared_chunk_pairs(chunks, min_shared_bytes=1024).collect()
    }
    assert (1, 2) in out
    shared, nbytes = out[(1, 2)]
    assert nbytes >= 2048  # most of the embedded segment recovered
    assert all(3 not in p for p in out)


def test_release_assets_one_call(spark, tmp_path):
    """One-call multimodal release: perceptual twins collapse to one
    survivor per cluster, the lake is partitioned by media_type, and
    the data card carries exact per-type counts/bytes + an
    order-independent checksum."""
    import json
    import os

    out = str(tmp_path / "asset_lake")
    df = spark.createDataFrame(
        [
            (1, "image", _ppm("r1")),
            (2, "image", _ppm("r1", shift=3)),  # twin of 1 → dropped
            (3, "image", _ppm("r2")),
            (4, "audio", _wav("r3")),
            (5, "audio", _wav("r3", halve=True)),  # twin of 4 → dropped
            (6, "video", _y4m("r4")),
            (7, "image", b"undecodable"),          # passes through
        ],
        ASSET_SCHEMA,
    )
    released = mm.release_assets(df, out)
    kept = {r.asset_id for r in released.collect()}
    assert kept == {1, 3, 4, 6, 7}
    # partitioned layout by media_type
    assert sorted(
        d for d in os.listdir(out) if d.startswith("media_type=")
    ) == ["media_type=audio", "media_type=image", "media_type=video"]
    card = json.load(open(os.path.join(out, "_ASSETS_MANIFEST.json")))
    assert card["types"]["image"]["n_assets"] == 3
    assert card["types"]["audio"]["n_assets"] == 1
    assert card["duplicate_clusters_removed"] == 2
    # checksum is order-independent and content-tied: re-release a
    # row-reordered input → identical card entry
    out2 = str(tmp_path / "asset_lake2")
    mm.release_assets(df.orderBy(F.col("asset_id").desc()), out2)
    card2 = json.load(open(os.path.join(out2, "_ASSETS_MANIFEST.json")))
    assert card2["types"]["image"]["content_checksum"] == card["types"]["image"]["content_checksum"]


def test_overlap_report_all_classes(spark):
    """The one-call report surfaces every overlap class at once:
    a perceptual image twin ('whole'), a byte-identical embedded
    audio segment ('bytes'), and an image crop ('space')."""
    import hashlib as _h

    rgb_body = b""
    i = 0
    while len(rgb_body) < 96 * 96:
        rgb_body += _h.sha256(f"rep:{i}".encode()).digest()
        i += 1
    g = np.frombuffer(rgb_body[: 96 * 96], dtype=np.uint8).reshape(96, 96)
    base_ppm = b"P6\n96 96\n255\n" + np.repeat(g[:, :, None], 3, axis=2).tobytes()
    crop = g[13 : 13 + 64, 7 : 7 + 64]
    crop_ppm = b"P6\n64 64\n255\n" + np.repeat(crop[:, :, None], 3, axis=2).tobytes()
    wav_a = _wav("rep-audio")
    wav_twin = _wav("rep-audio", halve=True)
    rows = [
        (1, "image", base_ppm),
        (2, "image", crop_ppm),
        (3, "image", _ppm("rep-img")),
        (4, "image", _ppm("rep-img", shift=3)),  # perceptual twin of 3
        (5, "audio", wav_a),
        (6, "audio", wav_twin),                  # level twin of 5
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    rep = mm.overlap_report(df, min_votes=4, min_shared_bytes=512)
    by_class = {}
    for r in rep.collect():
        by_class.setdefault(r.overlap_class, set()).add((r.id_a, r.id_b))
    assert (3, 4) in by_class.get("whole", set())
    assert (5, 6) in by_class.get("whole", set())
    assert (1, 2) in by_class.get("space", set())
    # (no 'bytes' expectation for the crop: raster rows of a crop are
    # not byte-contiguous, so CDC chunks legitimately differ)


def test_overlap_drop_list_merges_classes(spark):
    """An asset chained through DIFFERENT evidence classes (perceptual
    twin + crop) collapses into one duplication group with a single
    survivor."""
    import hashlib as _h

    body = b""
    i = 0
    while len(body) < 96 * 96:
        body += _h.sha256(f"dl:{i}".encode()).digest()
        i += 1
    g = np.frombuffer(body[: 96 * 96], dtype=np.uint8).reshape(96, 96)
    base = b"P6\n96 96\n255\n" + np.repeat(g[:, :, None], 3, axis=2).tobytes()
    bright = np.minimum(g.astype(np.int64) + 3, 255).astype(np.uint8)
    twin = b"P6\n96 96\n255\n" + np.repeat(bright[:, :, None], 3, axis=2).tobytes()
    crop = g[13 : 13 + 64, 7 : 7 + 64]
    crop_ppm = b"P6\n64 64\n255\n" + np.repeat(crop[:, :, None], 3, axis=2).tobytes()
    df = spark.createDataFrame(
        [(1, "image", base), (2, "image", twin), (3, "image", crop_ppm),
         (4, "image", _ppm("solo-dl"))],
        ASSET_SCHEMA,
    )
    rep = mm.overlap_report(df, min_votes=4, min_shared_bytes=512)
    out = {r.asset_id: r for r in mm.overlap_drop_list(df, rep).collect()}
    # 1-2 via 'whole', 1-3 via 'space' → one group {1,2,3}; 4 solo
    assert out[1].is_canonical
    assert not out[2].is_canonical and not out[3].is_canonical
    assert out[2].cluster_id == out[3].cluster_id == out[1].cluster_id
    assert out[4].is_canonical


def test_cdc_fast_path_equals_sequential_reference():
    """The vectorized log-doubling boundary scan is bit-identical to
    the per-byte rolling-hash reference for min_size ≥ 64 (the
    64-byte-window closed form's validity condition), including
    constant payloads and several size configs."""
    import hashlib as _h

    def blob(seed, nb):
        parts, total, i = [], 0, 0
        while total < nb:
            parts.append(_h.sha256(f"{seed}:{i}".encode()).digest())
            total += 32
            i += 1
        return b"".join(parts)[:nb]

    def seq(payload, min_size, avg_size, max_size):
        gear = mm._GEAR or mm._gear_table()
        mask = ((1 << 64) - 1) ^ ((1 << (64 - (avg_size.bit_length() - 1))) - 1)
        out, start, h, i, n = [], 0, 0, 0, len(payload)
        while i < n:
            h = ((h << 1) + gear[payload[i]]) & ((1 << 64) - 1)
            i += 1
            length = i - start
            if (length >= min_size and (h & mask) == 0) or length >= max_size:
                out.append(
                    (start, length, _h.md5(payload[start:i]).hexdigest())
                )
                start = i
                h = 0
        if start < n:
            out.append(
                (start, n - start, _h.md5(payload[start:]).hexdigest())
            )
        return out

    cases = [blob(f"fp{i}", 1 + (i * 7919) % 20000) for i in range(6)]
    cases.append(bytes(5000))
    # tiny payloads: the log-doubling pass with step >= n used to
    # negative-slice and broadcast-fail (3, 5-7, 9-15, 17-31, 33-63
    # bytes); every size 0..70 must match the sequential reference
    cases.extend(blob("tiny", k) for k in range(0, 71))
    for p in cases:
        for sizes in ((128, 512, 2048), (64, 256, 1024), (1024, 4096, 16384)):
            assert mm.cdc_chunks(p, *sizes) == seq(p, *sizes), (len(p), sizes)
