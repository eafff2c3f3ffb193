"""LSB-first bit packing, vectorized.

Reproduces the byte layout of Parquet's RLE/bit-packed hybrid "bit-packed run"
(the reference implements it scalar-loop at
/root/reference/encoding/encodingwrite.go:216-270).

Values are packed LSB-first: value 0's bit 0 is bit 0 of byte 0.

Implementation: word-lane kernels. Values are viewed as (m, 64) rows; each
row of 64 values maps to exactly `width` little-endian uint64 output words,
so lane i (a column of m values) contributes to at most two word columns via
shift/OR — ~64+2·width vectorized ops total regardless of m, i.e. ~1.5
uint64 ops per value instead of `width` byte ops per value. No per-bit
matrices, no numpy packbits/unpackbits (which are slow in this build).
"""

from __future__ import annotations

import numpy as np

_FULL = np.uint64(0xFFFFFFFFFFFFFFFF)


def pack(vals: np.ndarray, width: int) -> bytes:
    """Pack `vals` (non-negative ints < 2**width) into ceil(n*width/8) bytes."""
    if width == 0 or vals.size == 0:
        return b""
    if width < 0 or width > 64:
        raise ValueError(f"bad bit width {width}")
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    n = vals.size
    m = (n + 63) // 64
    if n == m * 64:
        V = vals.reshape(m, 64)
    else:
        padded = np.zeros(m * 64, np.uint64)
        padded[:n] = vals
        V = padded.reshape(m, 64)
    # transposed lanes (see unpack): contiguous row passes + 2 transposes
    VT = np.ascontiguousarray(V.T)
    outT = np.zeros((width, m), np.uint64)
    for i in range(64):
        t, off = divmod(i * width, 64)
        outT[t] |= VT[i] << np.uint64(off)
        if off + width > 64 and t + 1 < width:
            outT[t + 1] |= VT[i] >> np.uint64(64 - off)
    return np.ascontiguousarray(outT.T).reshape(-1) \
        .tobytes()[: (n * width + 7) // 8]


def unpack(buf: bytes | np.ndarray, width: int, count: int, bit_offset: int = 0) -> np.ndarray:
    """Unpack `count` values of `width` bits starting at `bit_offset`. → uint64."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if bit_offset % 8:
        return _unpack_gather(raw, width, count, bit_offset)
    raw = raw[bit_offset // 8:]
    if raw.size * 8 < count * width:
        raise ValueError("bitpack buffer underrun")
    m = (count + 63) // 64
    need = m * width * 8
    if raw.size >= need:
        W = np.frombuffer(raw.tobytes()[:need], "<u8").reshape(m, width) \
            if not raw.flags.c_contiguous else raw[:need].view("<u8").reshape(m, width)
    else:
        pw = np.zeros(need, np.uint8)
        pw[: raw.size] = raw
        W = pw.view("<u8").reshape(m, width)
    # transposed lanes: WT rows and outT rows are CONTIGUOUS, so every one
    # of the 64 shift/OR passes streams sequential memory instead of
    # striding by `width` words — 2-3× faster than the (m, 64)-major form
    # at 4M values (two extra transpose copies, 64 cheap passes)
    WT = np.ascontiguousarray(W.T)
    outT = np.empty((64, m), np.uint64)
    mask = np.uint64((1 << width) - 1) if width < 64 else _FULL
    for i in range(64):
        t, off = divmod(i * width, 64)
        v = WT[t] >> np.uint64(off)
        if off + width > 64 and t + 1 < width:
            v = v | (WT[t + 1] << np.uint64(64 - off))
        outT[i] = v
    outT &= mask
    return np.ascontiguousarray(outT.T).reshape(-1)[:count]


def _unpack_gather(raw: np.ndarray, width: int, count: int, bit_offset: int) -> np.ndarray:
    """Arbitrary-bit-offset fallback: per-value word gather."""
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


def pack32(vals: np.ndarray, width: int) -> bytes:
    """32-bit-lane variant for width ≤ 32: identical byte layout to pack()
    (an LSB-first bitstream in little-endian memory is word-size invariant)
    at half the memory traffic — the int32 token hot path."""
    if width == 0 or vals.size == 0:
        return b""
    if width < 0 or width > 32:
        raise ValueError(f"bad bit width {width} for pack32")
    vals = np.ascontiguousarray(vals, dtype=np.uint32)
    n = vals.size
    m = (n + 31) // 32
    if n == m * 32:
        V = vals.reshape(m, 32)
    else:
        padded = np.zeros(m * 32, np.uint32)
        padded[:n] = vals
        V = padded.reshape(m, 32)
    # transposed lanes (see unpack): contiguous row passes + 2 transposes
    VT = np.ascontiguousarray(V.T)
    outT = np.zeros((width, m), np.uint32)
    for i in range(32):
        t, off = divmod(i * width, 32)
        outT[t] |= VT[i] << np.uint32(off)
        if off + width > 32 and t + 1 < width:
            outT[t + 1] |= VT[i] >> np.uint32(32 - off)
    return np.ascontiguousarray(outT.T).reshape(-1) \
        .tobytes()[: (n * width + 7) // 8]


def unpack32(buf: bytes | np.ndarray, width: int, count: int) -> np.ndarray:
    """32-bit-lane unpack for width ≤ 32 (byte-aligned start). → uint32."""
    if count == 0:
        return np.empty(0, dtype=np.uint32)
    if width == 0:
        return np.zeros(count, dtype=np.uint32)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if raw.size * 8 < count * width:
        raise ValueError("bitpack buffer underrun")
    m = (count + 31) // 32
    need = m * width * 4
    if raw.size >= need and raw.flags.c_contiguous:
        W = raw[:need].view("<u4").reshape(m, width)
    else:
        pw = np.zeros(need, np.uint8)
        pw[: min(raw.size, need)] = raw[:need]
        W = pw.view("<u4").reshape(m, width)
    # transposed lanes (see unpack): contiguous row passes + 2 transposes
    WT = np.ascontiguousarray(W.T)
    outT = np.empty((32, m), np.uint32)
    mask = np.uint32((1 << width) - 1) if width < 32 else np.uint32(0xFFFFFFFF)
    for i in range(32):
        t, off = divmod(i * width, 32)
        v = WT[t] >> np.uint32(off)
        if off + width > 32 and t + 1 < width:
            v = v | (WT[t + 1] << np.uint32(32 - off))
        outT[i] = v
    outT &= mask
    return np.ascontiguousarray(outT.T).reshape(-1)[:count]


def bit_width(max_val: int) -> int:
    """Number of bits needed for max_val (0 → 0)."""
    return int(max_val).bit_length() if max_val > 0 else 0
