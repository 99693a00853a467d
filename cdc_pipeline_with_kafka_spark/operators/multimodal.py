"""Multimodal column handling for training-data pipelines.

The reference's `media` table (init.sql:36-45) stores typed URLs; a
100 TB corpus pipeline instead carries the payload inline: an opaque
``binary`` column plus typed metadata, processed by Arrow-batched
Pandas functions over ``mapInPandas``.

The image/audio codecs are NOT in this container, so the decode kernels
are STUBS behind ``set_decoder`` (a deterministic fake decoder is the
default in tests) — but the Spark-side plumbing is real and tested:
schema contracts, binary batching, partition sizing, UDF signatures.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("content_hash", T.StringType()),
        # double, not float32: features here are hash-derived doubles
        # (real model embeddings would be float32; the fake-decoder tier
        # keeps full precision so results are bit-reproducible across
        # engines)
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

# Pluggable decoder registry: media_type -> bytes -> list[float].
_DECODERS: dict[str, Callable[[bytes], list[float]]] = {}


def set_decoder(media_type: str, fn: Callable[[bytes], list[float]]) -> None:
    _DECODERS[media_type] = fn


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' from the payload hash — stands in
    for a real decode→model feature extraction (which would import
    PIL/torchvision here; NotImplementedError in this container)."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def real_decode_unavailable(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "no codec for this media type in this container; register a "
        "decoder with set_decoder(media_type, fn) — pure-Python WAV "
        "(decode_wav_features) and PPM (decode_ppm_features) codecs "
        "ship in-container; JPEG/MP3/MP4 need external libs"
    )


def decode_wav_features(payload: bytes, dim: int = 8) -> list[float]:
    """REAL in-container audio decoder: parses RIFF/WAVE PCM bytes
    (stdlib struct + numpy, no external codec) and extracts a fixed
    8-dim signal-level feature vector:

      [n_channels, sample_rate, bits_per_sample, frames,
       duration_s, rms, peak, zero_crossing_rate]

    Supports PCM 8-bit unsigned and 16-bit signed little-endian (the
    canonical uncompressed WAV encodings).  Raises ValueError on
    malformed payloads so the quarantine path (not silent garbage)
    handles corrupt media.  Register with set_decoder('audio', ...).
    """
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_body = data_body = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data_body = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_body is None or len(fmt_body) < 16 or data_body is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _brate, _balign, bits = struct.unpack(
        "<HHIIHH", fmt_body[:16]
    )
    if audio_fmt != 1 or n_ch < 1 or rate < 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV: fmt={audio_fmt} ch={n_ch} bits={bits}")
    if bits == 16:
        n = len(data_body) // 2
        samples = np.frombuffer(data_body[: n * 2], dtype="<i2").astype(np.float64)
        norm = samples / 32768.0
    else:
        norm = (np.frombuffer(data_body, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    frames = len(norm) // n_ch
    if frames == 0:
        return [float(n_ch), float(rate), float(bits), 0.0, 0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt(np.mean(norm * norm)))
    peak = float(np.abs(norm).max())
    zcr = float(np.mean(np.signbit(norm[1:]) != np.signbit(norm[:-1])))
    return [
        float(n_ch), float(rate), float(bits), float(frames),
        round(frames / rate, 6), round(rms, 6), round(peak, 6), round(zcr, 6),
    ]


def decode_ppm_features(payload: bytes, dim: int = 8) -> list[float]:
    """REAL in-container image decoder: parses binary PPM (P6) bytes —
    header tokens (width, height, maxval, '#' comments skipped) then a
    raw RGB raster — and extracts a fixed 8-dim feature vector:

      [width, height, maxval, mean_r, mean_g, mean_b,
       luma_mean, luma_std]          (channel stats normalized 0-1)

    Pure numpy; maxval ≤ 255 (1 byte/channel) and 256-65535
    (2 bytes/channel, big-endian per the netpbm spec) both supported.
    Raises ValueError on malformed payloads.  Register with
    set_decoder('image', ...)."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = 4 whitespace-separated tokens (magic, w, h, maxval) with
    # optional '#' comments; the raster starts after ONE whitespace byte
    # following maxval
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 3 or i >= len(payload):
        raise ValueError("truncated PPM header")
    i += 1  # the single whitespace after maxval
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError as exc:
        raise ValueError("non-numeric PPM header") from exc
    if w < 1 or h < 1 or not 0 < maxval < 65536:
        raise ValueError(f"bad PPM dimensions {w}x{h} maxval={maxval}")
    n_vals = w * h * 3
    if maxval < 256:
        raster = np.frombuffer(payload, dtype=np.uint8, count=n_vals, offset=i)
    else:
        raster = np.frombuffer(payload, dtype=">u2", count=n_vals, offset=i)
    px = raster.reshape(h, w, 3).astype(np.float64) / float(maxval)
    means = px.mean(axis=(0, 1))
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return [
        float(w), float(h), float(maxval),
        round(float(means[0]), 6), round(float(means[1]), 6),
        round(float(means[2]), 6),
        round(float(luma.mean()), 6), round(float(luma.std()), 6),
    ]


def extract_features(assets: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Decode/feature-extract every asset via mapInPandas.

    Arrow ships the binary column in batches; the decoder runs once per
    row inside the batch loop.  At 100 TB the input is repartitioned so
    a task holds ~batch_hint assets (binary payloads dominate memory —
    size partitions by bytes, not rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for mt, payload in zip(pdf["media_type"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                decoder = _DECODERS.get(mt, _fake_feature)
                feats.append(decoder(raw))
                hashes.append(hashlib.md5(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": sizes,
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def dedup_assets_exact(assets: DataFrame) -> DataFrame:
    """Exact binary dedup by payload md5 — same groupBy-hash strategy
    as text (operators.dedup), hashing JVM-side on the binary column."""
    hashed = assets.withColumn("content_hash", F.md5(F.coalesce(F.col("payload"), F.lit(b""))))
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_hash").orderBy(F.col("asset_id").asc())
    return hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode each video asset into frame
    timestamps (decode itself is the stubbed kernel).  Shows the
    explode-then-process shape: frames become rows BEFORE the decode
    UDF so Spark parallelizes across frames, not videos."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        assets.filter(F.col("media_type") == "video")
        .select(
            "asset_id",
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )
