"""Multimodal columns: opaque binary payloads + typed metadata, with REAL
pure-python decoders for three uncompressed public formats.

The container has no media libraries, so the decoders are written from the
public format specifications (no third-party code):

  * PPM P6  — netpbm binary portable pixmap: ASCII header
    `P6 <w> <h> <maxval>` (whitespace-separated, `#` comments allowed),
    then w*h RGB byte triplets row-major top-down.
  * BMP     — Windows bitmap, BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER
    (40 B), 24 bpp uncompressed (BI_RGB), rows bottom-up, each padded to
    4 bytes, pixels stored BGR.
  * WAV     — RIFF/WAVE, chunk walk to `fmt ` (PCM, 16-bit) and `data`,
    little-endian int16 samples.

Everything stays vectorized: decode slices/reshapes numpy views of the
payload bytes inside Arrow-batched mapInPandas — no per-row Python in the
pixel/sample path (the per-ROW loop is over media files, matching the
reference's per-file model; the per-BYTE work is numpy).

Payloads in synth_media_df are genuine encoded files whose pixels/samples
come from pure integer formulas, so a SQL oracle can recompute every
extracted feature (and each payload's exact byte length) without parsing
binary — see __spark_entry__.q_mm_features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               StringType, StructField, StructType)

FEATURE_DIM = 16

MEDIA_SCHEMA = StructType([
    StructField("media_id", IntegerType()),
    StructField("kind", StringType()),       # image | audio
    StructField("fmt", StringType()),        # ppm | bmp | wav
    StructField("payload", BinaryType()),    # real encoded file bytes
    StructField("width", IntegerType()),     # metadata travels beside payload
    StructField("height", IntegerType()),    # audio rows: width=n_samples, height=1
])

FEATURES_SCHEMA = StructType([
    StructField("media_id", IntegerType()),
    StructField("kind", StringType()),
    StructField("fmt", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])


# --------------------------------------------------------------------------
# encoders (deterministic synthesis; also exercise the decoders' inverses)
# --------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bpp uncompressed BMP (BGR, bottom-up,
    4-byte row padding)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    stride = (3 * w + 3) // 4 * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up rows, BGR order
    body[:, :3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    size = 14 + 40 + h * stride
    head = bytearray()
    head += b"BM"
    head += int(size).to_bytes(4, "little")
    head += b"\x00\x00\x00\x00"
    head += int(54).to_bytes(4, "little")          # pixel data offset
    head += int(40).to_bytes(4, "little")          # BITMAPINFOHEADER size
    head += int(w).to_bytes(4, "little", signed=True)
    head += int(h).to_bytes(4, "little", signed=True)  # positive: bottom-up
    head += int(1).to_bytes(2, "little")           # planes
    head += int(24).to_bytes(2, "little")          # bpp
    head += int(0).to_bytes(4, "little")           # BI_RGB (uncompressed)
    head += int(h * stride).to_bytes(4, "little")  # image size
    head += int(2835).to_bytes(4, "little") * 2    # 72 dpi x/y
    head += int(0).to_bytes(4, "little") * 2       # palette counts
    return bytes(head) + body.tobytes()


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM 16-bit."""
    assert samples.dtype == np.int16
    data = samples.astype("<i2").tobytes()
    n = len(data)
    out = bytearray()
    out += b"RIFF" + int(36 + n).to_bytes(4, "little") + b"WAVE"
    out += b"fmt " + int(16).to_bytes(4, "little")
    out += int(1).to_bytes(2, "little")            # PCM
    out += int(1).to_bytes(2, "little")            # mono
    out += int(rate).to_bytes(4, "little")
    out += int(rate * 2).to_bytes(4, "little")     # byte rate
    out += int(2).to_bytes(2, "little")            # block align
    out += int(16).to_bytes(2, "little")           # bits/sample
    out += b"data" + n.to_bytes(4, "little") + data
    return bytes(out)


# --------------------------------------------------------------------------
# decoders (pure python/numpy, from the public specs)
# --------------------------------------------------------------------------

def _ppm_header_tokens(buf: bytes, count: int) -> tuple[list[int], int]:
    """Read `count` ASCII integers after the magic, honoring whitespace
    and `#`-to-end-of-line comments. Returns (values, body offset)."""
    vals, i, n = [], 2, len(buf)  # skip the 2-byte magic
    while len(vals) < count:
        while i < n and buf[i:i + 1].isspace():
            i += 1
        if i < n and buf[i] == 0x23:                     # '#' comment
            while i < n and buf[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not buf[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(buf[i:j]))
        i = j
    if i >= n or not buf[i:i + 1].isspace():
        raise ValueError("PPM header not terminated")
    return vals, i + 1  # exactly ONE whitespace byte before the raster


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8."""
    buf = bytes(payload)
    if buf[:2] != b"P6":
        raise ValueError("not a binary PPM (P6)")
    (w, h, maxval), off = _ppm_header_tokens(buf, 3)
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    need = w * h * 3
    raster = np.frombuffer(buf, dtype=np.uint8, count=need, offset=off)
    return raster.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bpp uncompressed BMP → (h, w, 3) uint8 RGB."""
    buf = bytes(payload)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(buf[10:14], "little")
    hdr_size = int.from_bytes(buf[14:18], "little")
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bpp uncompressed BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    body = np.frombuffer(buf, dtype=np.uint8, count=h * stride,
                         offset=data_off).reshape(h, stride)
    px = body[:, :3 * w].reshape(h, w, 3)[:, :, ::-1]    # BGR → RGB
    return px if top_down else px[::-1]


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM 16-bit mono/stereo → (int16 samples [n] or [n, ch],
    sample rate). Walks chunks, so extra chunks (LIST, fact) are fine."""
    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(buf)
    rate = channels = None
    data = None
    while i + 8 <= n:
        cid = buf[i:i + 4]
        sz = int.from_bytes(buf[i + 4:i + 8], "little")
        body = buf[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM 16-bit WAV supported")
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)                           # chunks pad to even
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:
        samples = samples[:len(samples) - len(samples) % channels] \
            .reshape(-1, channels)
    return samples, rate


# --------------------------------------------------------------------------
# deterministic synthesis + feature extraction
# --------------------------------------------------------------------------

def _image_pixels(i: int, w: int, h: int) -> np.ndarray:
    """pixel(p, c) = (i*131 + p*31 + c*97 + 7) % 256, p = y*w + x."""
    p = np.arange(w * h, dtype=np.int64)[:, None]
    c = np.arange(3, dtype=np.int64)[None, :]
    return ((i * 131 + p * 31 + c * 97 + 7) % 256) \
        .astype(np.uint8).reshape(h, w, 3)


def _audio_samples(i: int, n: int) -> np.ndarray:
    """sample(j) = ((i*211 + j*13) % 4096) - 2048."""
    j = np.arange(n, dtype=np.int64)
    return (((i * 211 + j * 13) % 4096) - 2048).astype(np.int16)


def media_dims(i: int) -> tuple[int, int, int]:
    """(w, h, n_samples) for media_id i — shared with the SQL oracle."""
    return 8 + i % 5, 8 + (i * 3) % 7, 256 + (i * 37) % 512


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL media files: even ids are images (alternating
    PPM / BMP), odd ids are 16 kHz PCM WAVs. Pixels/samples come from the
    pure integer formulas above so a SQL oracle can recompute any derived
    feature — but the payload column holds genuine encoded bytes that the
    decoders above (and any standard viewer) parse."""
    rows = []
    for i in range(n):
        w, h, ns = media_dims(i)
        if i % 2 == 0:
            px = _image_pixels(i, w, h)
            fmt = "ppm" if i % 4 == 0 else "bmp"
            payload = encode_ppm(px) if fmt == "ppm" else encode_bmp(px)
            rows.append((i, "image", fmt, payload, w, h))
        else:
            payload = encode_wav(_audio_samples(i, ns))
            rows.append((i, "audio", "wav", payload, ns, 1))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(payload: bytes, fmt: str) -> np.ndarray:
    """One call per media FILE (the per-byte work is numpy). Returns the
    flat decoded signal: RGB bytes row-major for images, int16 samples
    for audio."""
    if fmt == "ppm":
        return decode_ppm(payload).reshape(-1)
    if fmt == "bmp":
        return decode_bmp(payload).reshape(-1)
    if fmt == "wav":
        return decode_wav(payload)[0].reshape(-1)
    raise NotImplementedError(f"unsupported media format: {fmt!r}")


def _strided_sums(flat: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """feature[d] = sum of decoded values at positions ≡ d (mod dim).
    Integer-exact in float32: image sums < 255·ceil(3wh/16) < 2^24 and
    audio sums < 2048·ceil(n/16) < 2^24 at the synthesized sizes."""
    v = flat.astype(np.int64)
    pad = (-v.size) % dim
    return np.pad(v, (0, pad)).reshape(-1, dim).sum(axis=0) \
        .astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over REAL decoded pixels/samples:
    Arrow-batched, one decode per file, numpy for every byte."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_strided_sums(decode_media(p, f))
                     for p, f in zip(pdf["payload"], pdf["fmt"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "fmt": pdf["fmt"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": feats,
            })

    return media.mapInPandas(fn, FEATURES_SCHEMA)
