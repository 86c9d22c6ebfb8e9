"""Multimodal columns: opaque binary media + typed metadata, Spark plumbing.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the same pattern the pages table uses for ``html``.
Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` (the only
sane shape for per-item Python work: one Python roundtrip per *batch*, not
per row; batch size is governed by ``spark.sql.execution.arrow.
maxRecordsPerBatch`` and should be lowered for large blobs).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed: ``deterministic_fake_features`` derives a fake
feature vector from the bytes' md5 (stable, testable), and
:func:`decode_image` raises ``NotImplementedError`` unless
``allow_stub=True``. The Spark-side plumbing — schema, partitioning, UDF
signature, batch iteration — is real and tested; swapping in a real codec
touches ONE function.

Scale notes: media blobs dominate row size → (a) never shuffle the blob:
extract features first, drop the binary, shuffle the narrow result;
(b) partition input by size-bucket so one task doesn't get all the 100 MB
videos (``repartitionByRange`` on ``size_bytes``); (c) feature extraction
is a map-only stage — zero shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("size_bytes", LongType()),
        StructField("src_url", StringType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("size_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def deterministic_fake_features(data: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Stable stand-in for a real decoder: md5(bytes) → dim floats in [0,1).

    Exists so tests pin the *plumbing* (schema, batching, null handling)
    to exact values; a real model replaces only this function.
    """
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        d = hashlib.md5(data + counter.to_bytes(4, "little")).digest()
        for i in range(0, 16, 4):
            out.append(int.from_bytes(d[i : i + 4], "little") / 2**32)
            if len(out) == dim:
                break
        counter += 1
    return out


def decode_image(data: bytes, allow_stub: bool = False) -> list[float]:
    """Decode an image to a feature vector. REAL CODEC NOT AVAILABLE HERE —
    stubbed behind ``allow_stub`` (PIL/opencv absent in this container)."""
    if not allow_stub:
        raise NotImplementedError(
            "image decoding requires PIL/opencv (not in this container); "
            "pass allow_stub=True for the deterministic fake"
        )
    return deterministic_fake_features(data)


def frame_sample(data: bytes, every_n: int = 10, allow_stub: bool = False) -> list[bytes]:
    """Sample video frames. Stubbed: slices the byte stream deterministically
    (a real impl shells out to ffmpeg over the same batch iterator)."""
    if not allow_stub:
        raise NotImplementedError("video decoding requires ffmpeg (not in this container)")
    chunk = max(1, len(data) // max(every_n, 1))
    return [data[i : i + chunk] for i in range(0, len(data), chunk * every_n)]


def resize_image(data: bytes, width: int, height: int, allow_stub: bool = False) -> bytes:
    """Resize an image to width×height. REAL CODEC NOT AVAILABLE HERE —
    stubbed behind ``allow_stub`` (PIL/opencv absent). The stub preserves
    the real op's contract — output is a pure function of
    ``(bytes, width, height)`` with size proportional to the target dims
    (fake 64:1 compression) — so the Spark plumbing and tests are real."""
    if not allow_stub:
        raise NotImplementedError(
            "image resizing requires PIL/opencv (not in this container); "
            "pass allow_stub=True for the deterministic fake"
        )
    target = max(1, (width * height * 3) // 64)
    out = bytearray()
    counter = 0
    while len(out) < target:
        out.extend(hashlib.md5(data + f":{width}x{height}:{counter}".encode()).digest())
        counter += 1
    return bytes(out[:target])


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized_md5", StringType()),
        StructField("resized_bytes", LongType()),
    ]
)


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, allow_stub: bool = True
) -> DataFrame:
    """image rows → one narrow row per resized image (blob dropped ASAP).

    Same scale shape as :func:`extract_features`: map-only ``mapInPandas``
    stage, emits the resized blob's fingerprint/size instead of the pixels
    so no shuffle ever carries image bytes. A real pipeline that must KEEP
    the resized blob writes it straight to a sink from this same stage
    (foreachPartition / parquet binary column partitioned by size bucket)
    rather than returning it through a shuffle. Non-image rows are
    filtered out up front, so Spark prunes them at the scan."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["content"].map(
                lambda b: resize_image(
                    bytes(b) if b is not None else b"", width, height, allow_stub=allow_stub
                )
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized_md5": resized.map(lambda b: hashlib.md5(b).hexdigest()),
                    "resized_bytes": resized.map(len).astype("int64"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(batches, RESIZED_SCHEMA)


def extract_features(media: DataFrame, allow_stub: bool = True) -> DataFrame:
    """binary media rows → narrow feature rows (drops the blob ASAP).

    mapInPandas so each Arrow batch is one Python roundtrip; the output is
    blob-free, so everything downstream (dedup by content_md5, ANN over
    ``features``) shuffles narrow rows only.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "size_bytes": content.map(len).astype("int64"),
                    "content_md5": content.map(lambda b: hashlib.md5(b).hexdigest()),
                    "features": content.map(
                        lambda b: decode_image(b, allow_stub=allow_stub)
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame_md5", StringType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10, allow_stub: bool = True) -> DataFrame:
    """video rows → one narrow row per sampled frame (blob dropped ASAP).

    The decode is the stub in :func:`frame_sample` (ffmpeg absent here);
    the Spark side is the real shape a frame-sampling stage has at scale:
    `mapInPandas` fan-OUT (one input row → many output rows, which a
    pandas_udf cannot express), emitting per-frame metadata/fingerprints
    instead of frame blobs so the downstream shuffle (frame dedup,
    per-video rollups) moves hashes, not pixels. Non-video rows pass
    through with zero frames (filter upstream if undesired).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, md5s, sizes = [], [], [], []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video" or content is None:
                    continue
                frames = frame_sample(bytes(content), every_n, allow_stub=allow_stub)
                for j, fr in enumerate(frames):
                    ids.append(mid)
                    nos.append(j)
                    md5s.append(hashlib.md5(fr).hexdigest())
                    sizes.append(len(fr))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype=object),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, FRAMES_SCHEMA)


def make_fake_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table (for tests/benches only)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.md5(f"{seed}:{i}".encode()).digest() * (1 + i % 7)
        kind = kinds[i % 3]
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                len(payload),
                f"https://media.example.com/{kind}/{i}",
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
