"""Multimodal columns: opaque binary media + typed metadata, Spark plumbing.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the same pattern the pages table uses for ``html``.
Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` (the only
sane shape for per-item Python work: one Python roundtrip per *batch*, not
per row; batch size is governed by ``spark.sql.execution.arrow.
maxRecordsPerBatch`` and should be lowered for large blobs).

Codecs: the compressed-format libraries (PIL/ffmpeg/librosa) are NOT in
this container, so three REAL codecs are implemented from scratch —
24-bit BI_RGB **BMP** (:func:`bmp_decode` / :func:`bmp_encode`, bottom-up
and top-down row order, 4-byte row padding), 8-bit **PNG**
(:func:`png_decode` / :func:`png_encode` on stdlib ``zlib``: chunk walk +
CRC, multi-IDAT inflate, all five Sub/Up/Average/Paeth defilters;
grey/RGB/RGBA), and **Y4M** / YUV4MPEG2 (:func:`y4m_frames`, C444/C420
plane sizing). :func:`resize_images`, :func:`sample_frames`, and
:func:`image_stats` operate on real pixels for those formats via the
:func:`decode_pixels` magic-byte dispatcher; JPEG/MP4 still raise
``NotImplementedError`` unless ``allow_stub`` routes them to the
deterministic md5 fakes, which remain for plumbing tests.

Scale notes: media blobs dominate row size → (a) never shuffle the blob:
extract features first, drop the binary, shuffle the narrow result;
(b) partition input by size-bucket so one task doesn't get all the 100 MB
videos (``repartitionByRange`` on ``size_bytes``); (c) feature extraction
is a map-only stage — zero shuffle.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------------------
# real from-scratch codecs (pure NumPy, no external libraries)
# ---------------------------------------------------------------------------

def bmp_encode(pixels: np.ndarray) -> bytes:
    """Encode an H×W×3 RGB uint8 array as a 24-bit uncompressed BI_RGB BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, 4-byte-padded
    strides) — a REAL file any image viewer opens."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected H x W x 3 RGB array")
    h, w = pixels.shape[:2]
    pad = (-(w * 3)) % 4
    stride = w * 3 + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + body.tobytes()


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BI_RGB BMP to an H×W×3 RGB uint8 array.
    Handles bottom-up (biHeight > 0) and top-down (biHeight < 0) row order
    and 4-byte row padding. Compressed/paletted BMPs are rejected."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={comp})")
    topdown, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, np.uint8, stride * h, off).reshape(h, stride)
    rows = arr[:, : w * 3].reshape(h, w, 3)
    if not topdown:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with pure integer index math —
    src_x = (dst_x * W) // width — so the mapping is exactly reproducible
    in any engine's integer arithmetic (the DuckDB oracle replays it)."""
    src_h, src_w = img.shape[:2]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return img[ys][:, xs]


def _hex_md5(data: bytes) -> str:
    """Payload fingerprint = md5 of the lowercase-hex serialization.
    Hex-then-hash (not raw-bytes md5) because DuckDB's md5() is
    VARCHAR-only — this keeps every media fingerprint replayable in the
    oracle (the portable-hash discipline of dedup.md5h60, CLAUDE.md)."""
    return hashlib.md5(data.hex().encode()).hexdigest()


_Y4M_MAGIC = b"YUV4MPEG2"


def y4m_frames(data: bytes) -> list[bytes]:
    """Parse a YUV4MPEG2 (Y4M) stream and return the raw per-frame plane
    bytes (Y then U then V, concatenated — exactly as stored). Supports
    C444 (3·W·H bytes/frame) and C420 family (3·W·H/2); frame-level FRAME
    parameter strings are tolerated and skipped."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a Y4M stream")
    nl = data.index(b"\n")
    w = h = 0
    colorspace = "C420"
    for tok in data[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok.decode("ascii")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    frame_size = 3 * w * h if colorspace.startswith("C444") else (3 * w * h) // 2
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = data.index(b"\n", pos) + 1  # skip optional frame params
        frames.append(data[pos : pos + frame_size])
        pos += frame_size
    return frames


# ---------------------------------------------------------------------------
# from-scratch PNG codec (stdlib zlib only — IHDR/IDAT parse, inflate,
# Sub/Up/Average/Paeth defilter; no PIL, no pip)
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9, filter type 4), vectorized. a=left,
    b=above, c=upper-left, all int32; ties break a, then b (spec order)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_encode(pixels: np.ndarray, idat_chunk_size: int = 8192) -> bytes:
    """Encode an H×W×{1,3,4} uint8 array as an 8-bit PNG (greyscale / RGB /
    RGBA). Each scanline is filtered with type ``row % 5`` — a valid
    stream that deterministically exercises ALL five defilter paths
    (None/Sub/Up/Average/Paeth) in any decoder, which is the point of the
    fixture. IDAT is split into ``idat_chunk_size`` pieces so multi-IDAT
    reassembly is exercised too."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    raw = pixels.astype(np.int32)
    flat = raw.reshape(h, w * ch)
    left = np.zeros_like(raw)
    left[:, 1:] = raw[:, :-1]  # pixel to the left (0 at x=0), per spec bpp offset
    left = left.reshape(h, w * ch)
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    ul = np.zeros_like(raw)
    ul[1:, 1:] = raw[:-1, :-1]
    ul = ul.reshape(h, w * ch)
    out = bytearray()
    for y in range(h):
        f = y % 5
        if f == 0:
            filt = flat[y]
        elif f == 1:
            filt = flat[y] - left[y]
        elif f == 2:
            filt = flat[y] - up[y]
        elif f == 3:
            filt = flat[y] - (left[y] + up[y]) // 2
        else:
            filt = flat[y] - _paeth(left[y], up[y], ul[y])
        out.append(f)
        out += (filt % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    comp = zlib.compress(bytes(out), 6)
    idats = b"".join(
        _png_chunk(b"IDAT", comp[i : i + idat_chunk_size])
        for i in range(0, max(len(comp), 1), idat_chunk_size)
    )
    return _PNG_MAGIC + _png_chunk(b"IHDR", ihdr) + idats + _png_chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit greyscale/RGB/RGBA PNG to an H×W×C uint8 array —
    from scratch on stdlib ``zlib``: chunk walk with CRC verification,
    multi-IDAT reassembly, inflate, and per-scanline defiltering for all
    five filter types. Interlaced (Adam7), paletted, and 16-bit images are
    rejected (the fixture generator never emits them; real CC-scale data
    routing is by magic bytes in :func:`decode_pixels`).

    Defilter vectorization: None/Up are whole-row NumPy; Sub is a
    per-channel cumulative sum (recon[i] = filt[i] + recon[i-bpp] ⇒ cumsum
    mod 256 per residue class); Average/Paeth depend on the just-
    reconstructed left pixel, so they walk pixels within the row with
    NumPy ops per bpp-slice — O(W) Python steps per such row, fine for
    thumbnails; large-image hot paths should pre-convert to BMP/raw."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace}); only 8-bit grey/RGB/RGBA non-interlaced"
        )
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch after inflate")
    scan = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, rows = scan[:, 0], scan[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, row = int(filters[y]), rows[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: cumsum per residue class mod bpp
            rec = np.cumsum(row.reshape(w, ch), axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (row + prior) % 256
        elif f == 3:  # Average — needs reconstructed left, walk pixels
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = (row[s] + (left + prior[s]) // 2) % 256
                rec[s] = left
        elif f == 4:  # Paeth — needs reconstructed left, walk pixels
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            ul = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = (row[s] + _paeth(left, prior[s], ul)) % 256
                rec[s] = left
                ul = prior[s]
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = prior = rec
    return out.astype(np.uint8).reshape(h, w, ch)


def decode_pixels(data: bytes) -> np.ndarray:
    """Magic-byte dispatch to the from-scratch codecs: BMP (``BM``) or PNG
    (8-byte signature) → H×W×C uint8 pixel array. The single entry point
    the Spark-side media operators use, so adding a codec is one branch."""
    if data[:2] == b"BM":
        return bmp_decode(data)
    if data[:8] == _PNG_MAGIC:
        return png_decode(data)
    raise ValueError("unknown image format (no BMP/PNG magic)")


def _is_decodable_image(data: bytes) -> bool:
    return data[:2] == b"BM" or data[:8] == _PNG_MAGIC


# ---------------------------------------------------------------------------
# from-scratch WAV codec (RIFF/PCM, stdlib struct + NumPy only)
# ---------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode an (n_samples, n_channels) int16 array as a 16-bit PCM WAV
    (RIFF header + fmt + data chunks, little-endian interleaved frames) —
    a REAL file any audio player opens."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("expected int16 samples")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()  # interleaved: row-major (frame, channel)
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV to ((n_samples, n_channels) int16, rate) —
    from scratch: RIFF envelope check, chunk walk (unknown chunks like
    LIST/INFO are skipped, word-aligned per spec), fmt parse restricted to
    uncompressed PCM. Compressed codecs (MP3/AAC/float WAV) are rejected —
    the CC-scale route for those is the env-gated stub, same as JPEG."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        if cid == b"fmt ":
            if len(payload) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", payload)
        elif cid == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (format={audio_format}, bits={bits})")
    frames = len(pcm) // (ch * 2)
    arr = np.frombuffer(pcm, "<i2", frames * ch).reshape(frames, ch)
    return arr.copy(), rate


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("sum_ch0", LongType()),
        StructField("sum_abs_ch0", LongType()),
        StructField("peak_abs", LongType()),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL sample statistics over PCM WAV audio: decoded frame/channel
    counts plus integer sums over channel 0 and the global peak. Integer
    outputs make the decode hard-gateable cross-engine (the fixture's
    samples are a pure function of (media_id, frame, channel), so a SQL
    oracle recomputes every value); producing them requires actually
    walking the RIFF chunks and deinterleaving frames — a fake can't
    pass. Map-only mapInPandas, blob dropped in-stage (the scale contract
    shared by image_stats)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr, rate = wav_decode(bytes(content))
                a = arr.astype(np.int64)
                rows.append(
                    (
                        mid,
                        arr.shape[0],
                        arr.shape[1],
                        rate,
                        int(a[:, 0].sum()),
                        int(np.abs(a[:, 0]).sum()),
                        int(np.abs(a).max(initial=0)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "n_channels", "sample_rate",
                    "sum_ch0", "sum_abs_ch0", "peak_abs",
                ],
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(batches, AUDIO_STATS_SCHEMA)


def wav_test_samples(media_id: int, n: int, ch: int = 2) -> np.ndarray:
    """Deterministic test audio: frame k, channel c of clip ``media_id``
    has sample ((37·id + 11·k + 5·c) % 4096) − 2048 — pure integer
    arithmetic a SQL oracle replays exactly."""
    k = np.arange(n).reshape(n, 1)
    c = np.arange(ch).reshape(1, ch)
    return ((media_id * 37 + k * 11 + c * 5) % 4096 - 2048).astype(np.int16)


def make_wav_media(spark, n: int = 60) -> DataFrame:
    """REAL-codec audio fixture: n tiny 16-bit PCM WAVs (400+20·(i%5)
    frames, 1+i%2 channels, 8000 Hz) with :func:`wav_test_samples`
    content. Tests/benches only."""
    rows = []
    for i in range(n):
        data = wav_encode(wav_test_samples(i, 400 + 20 * (i % 5), 1 + i % 2), 8000)
        rows.append(
            (i, "audio", data, "audio/wav", len(data), f"https://media.example.com/wav/{i}.wav")
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(data: bytes, allow_stub: bool = False) -> list[float]:
    """Decode an image to a feature vector. BMP/PNG take the REAL decode
    path (:func:`decode_pixels`); the featurizer is the deterministic
    stand-in applied to the *decoded pixel buffer*, so two encodings of
    the same pixels featurize identically — swapping in a real model
    changes only the featurizer. Other formats (JPEG/WebP) would need
    PIL/opencv, absent here — stubbed behind ``allow_stub``."""
    if _is_decodable_image(data):
        return deterministic_fake_features(decode_pixels(data).tobytes())
    if not allow_stub:
        raise NotImplementedError(
            "compressed-image decoding requires PIL/opencv (not in this "
            "container); BMP/PNG decode for real, or pass allow_stub=True "
            "for the deterministic fake"
        )
    return deterministic_fake_features(data)


def frame_sample(data: bytes, every_n: int = 10, allow_stub: bool = False) -> list[bytes]:
    """Sample every ``every_n``-th video frame. Y4M streams get the REAL
    from-scratch parser (:func:`y4m_frames`); compressed containers (mp4…)
    would need ffmpeg, absent here — stubbed byte-slicing behind
    ``allow_stub`` for those."""
    if data[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
        return y4m_frames(data)[:: max(every_n, 1)]
    if not allow_stub:
        raise NotImplementedError(
            "compressed video requires ffmpeg (not in this container); "
            "Y4M input is decoded for real, or pass allow_stub=True"
        )
    chunk = max(1, len(data) // max(every_n, 1))
    return [data[i : i + chunk] for i in range(0, len(data), chunk * every_n)]


def resize_image(data: bytes, width: int, height: int, allow_stub: bool = False) -> bytes:
    """Resize an image to width×height. BMP and PNG input take the REAL
    path — :func:`decode_pixels` → :func:`resize_nearest` → re-encode in
    the source format on actual pixels. Remaining compressed formats
    (JPEG/WebP) would need PIL/opencv, absent here — stubbed behind
    ``allow_stub`` with the same (bytes,w,h)→bytes contract."""
    if data[:2] == b"BM":
        return bmp_encode(resize_nearest(bmp_decode(data), width, height))
    if data[:8] == _PNG_MAGIC:
        return png_encode(resize_nearest(png_decode(data), width, height))
    if not allow_stub:
        raise NotImplementedError(
            "compressed-image resizing requires PIL/opencv (not in this "
            "container); BMP/PNG input is resized for real, or pass allow_stub=True"
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

    def fingerprint(b) -> tuple[str, int]:
        data = bytes(b) if b is not None else b""
        if _is_decodable_image(data):
            # REAL path (BMP or PNG): decode → nearest-neighbor resize →
            # fingerprint the raw pixel buffer (format-independent: two
            # encodings of the same pixels fingerprint equal, and the
            # DuckDB oracle can rebuild the buffer from the pixel function
            # + integer index math without an image writer)
            pix = resize_nearest(decode_pixels(data), width, height)
            return _hex_md5(pix.tobytes()), int(pix.nbytes)
        out = resize_image(data, width, height, allow_stub=allow_stub)
        return _hex_md5(out), len(out)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fp = pdf["content"].map(fingerprint)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized_md5": fp.map(lambda t: t[0]),
                    "resized_bytes": fp.map(lambda t: t[1]).astype("int64"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(batches, RESIZED_SCHEMA)


STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """REAL pixel statistics over BMP/PNG images: per-channel integer sums
    + decoded dimensions. Integer outputs make the decode hard-gateable
    cross-engine (float means would drift in the value hash); producing
    them requires actually parsing the format (BMP header/padding/
    bottom-up/BGR swap, or PNG inflate + Sub/Up/Average/Paeth defilter) —
    a fake can't pass. Greyscale broadcasts to r=g=b; an RGBA alpha plane
    is ignored. Map-only mapInPandas, blob dropped in-stage, nothing wide
    ever shuffles."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                pix = decode_pixels(bytes(content))
                if pix.shape[2] == 1:
                    pix = np.repeat(pix, 3, axis=2)
                sums = pix[:, :, :3].reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows.append(
                    (mid, pix.shape[1], pix.shape[0], int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "sum_r", "sum_g", "sum_b"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(batches, STATS_SCHEMA)


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
                    md5s.append(_hex_md5(fr))
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


def bmp_test_pixels(media_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic test image: pixel (x,y) of image ``media_id`` has
    r=(7x+13y+id)%256, g=(3x+5y+2id)%256, b=(x+y+3id)%256 — pure integer
    arithmetic a SQL oracle replays exactly (per-pixel, per-channel)."""
    xx = np.arange(w).reshape(1, w)
    yy = np.arange(h).reshape(h, 1)
    r = (xx * 7 + yy * 13 + media_id) % 256
    g = (xx * 3 + yy * 5 + 2 * media_id) % 256
    b = (xx + yy + 3 * media_id) % 256
    return np.stack(np.broadcast_arrays(r, g, b), axis=-1).astype(np.uint8)


def make_bmp_media(spark, n: int = 60) -> DataFrame:
    """REAL-codec media fixture: n tiny 24-bit BMPs (w=16+i%9, h=12+i%7)
    with :func:`bmp_test_pixels` content. Tests/benches only."""
    rows = []
    for i in range(n):
        w, h = 16 + i % 9, 12 + i % 7
        data = bmp_encode(bmp_test_pixels(i, w, h))
        rows.append(
            (i, "image", data, "image/bmp", len(data), f"https://media.example.com/bmp/{i}.bmp")
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def make_png_media(spark, n: int = 60, id_offset: int = 100) -> DataFrame:
    """REAL-codec media fixture: n tiny 8-bit RGB PNGs (w=16+i%9, h=12+i%7)
    with :func:`bmp_test_pixels` content keyed on media_id=id_offset+i —
    the same integer pixel function the BMP fixture uses, so a SQL oracle
    replays both from one formula. :func:`png_encode` filters scanline y
    with type y%5, so decoding these exercises every defilter path.
    Tests/benches only."""
    rows = []
    for i in range(n):
        mid = id_offset + i
        w, h = 16 + i % 9, 12 + i % 7
        data = png_encode(bmp_test_pixels(mid, w, h))
        rows.append(
            (mid, "image", data, "image/png", len(data), f"https://media.example.com/png/{mid}.png")
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def y4m_test_stream(media_id: int, w: int = 8, h: int = 6, n_frames: int = 6) -> bytes:
    """Deterministic C444 Y4M stream: frame f, plane p (Y/U/V), offset k has
    byte value (31·id + 17·f + 7·p + k) % 256."""
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode())
    k = np.arange(w * h)
    for f in range(n_frames):
        out += b"FRAME\n"
        vals = (media_id * 31 + f * 17 + (np.arange(3).reshape(3, 1) * 7 + k)) % 256
        out += vals.astype(np.uint8).tobytes()
    return bytes(out)


def make_y4m_media(spark, n: int = 60) -> DataFrame:
    """REAL-codec video fixture: n tiny Y4M streams (8×6 C444, 6+i%5
    frames) with :func:`y4m_test_stream` content. Tests/benches only."""
    rows = []
    for i in range(n):
        data = y4m_test_stream(i, 8, 6, 6 + i % 5)
        rows.append(
            (i, "video", data, "video/x-y4m", len(data), f"https://media.example.com/y4m/{i}.y4m")
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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
