"""Per-chunk block compression — the reference's codec registry
(/root/reference/compress/compress.go:8-30: UNCOMPRESSED/GZIP/SNAPPY/ZSTD/
LZ4/LZ4_RAW `Compressor`s applied to each page's encoded bytes after value
encoding, /root/reference/layout/page.go:240) re-expressed over the chunk
container: an optional final stage on the encoded payload section.

Backends are pyarrow's bundled block codecs (no extra installs); GZIP maps
to stdlib zlib for byte-parity with the reference's pooled gzip writer
(/root/reference/compress/gzip.go:17-42).
"""

from __future__ import annotations

import zlib

import numpy as np

UNCOMPRESSED = 0
GZIP = 1
SNAPPY = 2
ZSTD = 3
LZ4_RAW = 4
BROTLI = 5
LZ4 = 6  # LZ4 FRAME format — the reference's LZ4 codec is pierrec
         # lz4.Writer frames (compress/lz4.go:21), distinct from LZ4_RAW
         # blocks (compress/lz4_raw.go:15); pyarrow has both

COMP_NAMES = {UNCOMPRESSED: "uncompressed", GZIP: "gzip", SNAPPY: "snappy",
              ZSTD: "zstd", LZ4_RAW: "lz4_raw", BROTLI: "brotli", LZ4: "lz4"}
COMP_IDS = {v: k for k, v in COMP_NAMES.items()}

_ARROW_NAME = {SNAPPY: "snappy", ZSTD: "zstd", LZ4_RAW: "lz4_raw",
               BROTLI: "brotli", LZ4: "lz4"}


def _codec(comp_id: int):
    import pyarrow as pa

    return pa.Codec(_ARROW_NAME[comp_id])


def available(name: str) -> bool:
    if name in ("uncompressed", "gzip"):
        return True
    import pyarrow as pa

    cid = COMP_IDS.get(name)
    return cid in _ARROW_NAME and pa.Codec.is_available(_ARROW_NAME[cid])


def compress(payload: bytes, comp_id: int) -> bytes:
    """→ framed section: u8 comp_id | u32 raw_len | compressed bytes."""
    if comp_id == UNCOMPRESSED:
        body = payload
    elif comp_id == GZIP:
        # a real RFC-1952 gzip member (wbits=31), not a bare zlib stream —
        # external readers dispatching on the GZIP id expect the 10-byte
        # gzip header (decompress accepts BOTH via wbits=47, so sections
        # written before this fix still decode)
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        body = co.compress(payload) + co.flush()
    else:
        body = bytes(_codec(comp_id).compress(payload))
    return bytes([comp_id]) + len(payload).to_bytes(4, "little") + body


def decompress(section: bytes | np.ndarray) -> bytes:
    buf = section.tobytes() if isinstance(section, np.ndarray) else bytes(section)
    comp_id = buf[0]
    raw_len = int.from_bytes(buf[1:5], "little")
    body = buf[5:]
    if comp_id == UNCOMPRESSED:
        return body
    if comp_id == GZIP:
        return zlib.decompress(body, wbits=47)  # auto: gzip OR legacy zlib
    out = _codec(comp_id).decompress(body, raw_len)
    return bytes(out)
