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
        "image/audio codecs are not installed in this container; "
        "register a decoder with set_decoder('image', fn)"
    )


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
