"""LSB-first bit packing, vectorized.

Reproduces the byte layout of Parquet's RLE/bit-packed hybrid "bit-packed run"
(the reference implements it scalar-loop at
/root/reference/encoding/encodingwrite.go:216-270).

Values are packed LSB-first: value 0's bit 0 is bit 0 of byte 0.

Implementation notes: this numpy build's `unpackbits`/`bitorder='little'`
paths are slow, so
  * pack   = slabbed bit-matrix build (w vectorized shift/mask passes) →
    big-endian packbits (fast C) → per-byte bit-reversal lookup table;
  * unpack = pure arithmetic word gather: view the stream as little-endian
    uint64 words, each value is (words[p/64] >> p%64 | words[p/64+1] <<
    (64-p%64)) & mask — ~8 vectorized passes, no bit matrix at all.
"""

from __future__ import annotations

import numpy as np

_SLAB = 1 << 20  # values per pack slab (bounds bit-matrix temp)

# byte bit-reversal table: MSB-first packbits output → LSB-first stream
_REV = np.array([int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8)


def pack(vals: np.ndarray, width: int) -> bytes:
    """Pack `vals` (non-negative ints < 2**width) into ceil(n*width/8) bytes."""
    if width == 0 or vals.size == 0:
        return b""
    if width < 0 or width > 64:
        raise ValueError(f"bad bit width {width}")
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    n = vals.size
    step = (_SLAB // 8) * 8  # slab boundary stays byte-aligned (8 | step)
    if n <= step:
        return _pack_slab(vals, width).tobytes()
    parts = [_pack_slab(vals[i:i + step], width) for i in range(0, n, step)]
    return b"".join(p.tobytes() for p in parts)


def _pack_slab(vals: np.ndarray, width: int) -> np.ndarray:
    n = vals.size
    bits = np.empty((n, width), dtype=np.uint8)
    for k in range(width):
        np.bitwise_and(vals >> np.uint64(k), np.uint64(1), out=bits[:, k], casting="unsafe")
    return _REV[np.packbits(bits.reshape(-1))]


def unpack(buf: bytes | np.ndarray, width: int, count: int, bit_offset: int = 0) -> np.ndarray:
    """Unpack `count` values of `width` bits starting at `bit_offset`. → uint64."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if raw.size * 8 < bit_offset + count * width:
        raise ValueError("bitpack buffer underrun")
    # pad to whole uint64 words + one spill word
    nwords = (raw.size + 7) // 8 + 1
    padded = np.zeros(nwords * 8, dtype=np.uint8)
    padded[: raw.size] = raw
    words = padded.view("<u8")
    p = np.arange(count, dtype=np.uint64) * np.uint64(width) + np.uint64(bit_offset)
    wi = (p >> np.uint64(6)).astype(np.int64)
    sh = p & np.uint64(63)
    lo = words[wi] >> sh
    spill = sh > np.uint64(64 - width) if width < 64 else sh > np.uint64(0)
    hi = np.zeros_like(lo)
    if spill.any():
        hi[spill] = words[wi[spill] + 1] << (np.uint64(64) - sh[spill])
    out = lo | hi
    if width < 64:
        out &= np.uint64((1 << width) - 1)
    return out


def bit_width(max_val: int) -> int:
    """Number of bits needed for max_val (0 → 0)."""
    return int(max_val).bit_length() if max_val > 0 else 0
