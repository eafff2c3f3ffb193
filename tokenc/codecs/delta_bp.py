"""DELTA_BINARY_PACKED (frame-of-reference + delta + bit-pack), vectorized.

Format-identical to Parquet's spec, which the reference implements scalar at
/root/reference/encoding/encodingwrite.go:287-401 and decodes at
encodingread.go:270-383:

    header    := uvarint(block_size=128) uvarint(miniblocks_per_block=4)
                 uvarint(total_value_count) zigzag_varint(first_value)
    block     := zigzag_varint(min_delta) byte[4] miniblock_bit_widths
                 miniblock_data...   (each miniblock = 32 values bit-packed
                                      LSB-first at its width)

Deltas in the trailing partial block are padded with min_delta (so the
normalized pad is 0 and never widens a miniblock); the decoder truncates to
total_value_count. Bit widths up to 64 are supported, so the same kernel
serves int32 and int64 (deltas are computed in modular uint64 space, which
cannot overflow).

Vectorization strategy (no per-value Python, no per-block byte assembly):
  * encode: deltas → (nblocks, 4, 32) frame; per-miniblock widths; miniblocks
    grouped BY WIDTH and packed per group in one numpy call each (≤65 widths);
    the final stream is materialized with a single scatter using precomputed
    per-block output offsets (block header varints included, via the
    vectorized uvarint matrix).
  * decode: a cheap sequential walk parses only the per-block varint +
    width bytes (O(nblocks) tiny steps), then all miniblock payloads are
    gathered and unpacked grouped by width, min_deltas broadcast-added, one
    cumsum reconstructs values.
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .plain import _ranges_to_indices
from .varint import (
    decode_uvarint,
    encode_uvarint,
    uvarint_matrix,
    zigzag_decode_scalar,
    zigzag_encode,
    zigzag_encode_scalar,
)

BLOCK = 128
MINIBLOCKS = 4
MB_VALUES = BLOCK // MINIBLOCKS  # 32
_MAXV = 10


def _bit_widths(mb_max: np.ndarray) -> np.ndarray:
    """Per-miniblock bit widths for uint64 maxima, exact (no float error)."""
    widths = np.zeros(mb_max.shape, dtype=np.uint8)
    nz = mb_max > 0
    if nz.any():
        m = mb_max[nz]
        w = np.clip(np.ceil(np.log2(m.astype(np.float64) + 1)), 1, 64).astype(np.uint64)
        # float rounding guards (both directions); shifts stay < 64
        too_small = (w < 64) & ((m >> np.minimum(w, np.uint64(63))) > 0)
        w[too_small] += np.uint64(1)
        can_shrink = (w > 1) & ((m >> (w - np.uint64(1))) == 0)
        w[can_shrink] -= np.uint64(1)
        widths[nz] = w.astype(np.uint8)
    return widths


def encode(vals: np.ndarray, bits: int = 32) -> bytes:
    """Encode an int array (int32 semantics when bits=32, else int64)."""
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    n = vals.size
    header = (
        encode_uvarint(BLOCK)
        + encode_uvarint(MINIBLOCKS)
        + encode_uvarint(n)
        + encode_uvarint(zigzag_encode_scalar(int(vals[0]) if n else 0, 64))
    )
    if n <= 1:
        return header
    u = vals.view(np.uint64)
    deltas = (u[1:] - u[:-1]).view(np.int64)
    nd = deltas.size
    nblocks = (nd + BLOCK - 1) // BLOCK
    padded = np.empty(nblocks * BLOCK, dtype=np.int64)
    padded[:nd] = deltas
    padded[nd:] = np.iinfo(np.int64).max  # sentinel; real deltas exist per block
    frame = padded.reshape(nblocks, BLOCK)
    min_delta = frame.min(axis=1)
    norm = frame.view(np.uint64) - min_delta[:, None].view(np.uint64)
    if nd % BLOCK:
        norm.reshape(-1)[nd:] = 0  # pad slots → 0 bits
    mb = norm.reshape(nblocks * MINIBLOCKS, MB_VALUES)
    widths = _bit_widths(mb.max(axis=1)).reshape(nblocks, MINIBLOCKS)

    # ---- layout computation ----
    flat_w = widths.reshape(-1).astype(np.int64)
    mb_bytes = flat_w * (MB_VALUES // 8)  # 4*w bytes per miniblock
    zz = zigzag_encode(min_delta)
    zmat, zlen = uvarint_matrix(zz)  # per-block varint bytes
    block_payload = mb_bytes.reshape(nblocks, MINIBLOCKS).sum(axis=1)
    block_total = zlen + MINIBLOCKS + block_payload
    block_off = np.zeros(nblocks, dtype=np.int64)
    np.cumsum(block_total[:-1], out=block_off[1:])
    total = int(block_total.sum())
    out = np.empty(total, dtype=np.uint8)

    # block header varints (masked scatter; fixed 10-wide matrix, no cumsum)
    j = np.arange(_MAXV)
    keep = j[None, :] < zlen[:, None]
    dstm = block_off[:, None] + j[None, :]
    out[dstm[keep]] = zmat[keep]
    # width bytes
    wdst = (block_off + zlen)[:, None] + j[None, :4]
    out[wdst.reshape(-1)] = widths.reshape(-1)
    # miniblock payloads grouped by width
    mb_off = np.zeros(nblocks * MINIBLOCKS, dtype=np.int64)
    mb_off_2d = mb_off.reshape(nblocks, MINIBLOCKS)
    mb_b2 = mb_bytes.reshape(nblocks, MINIBLOCKS)
    mb_off_2d[:, 0] = block_off + zlen + MINIBLOCKS
    for k in range(1, MINIBLOCKS):
        mb_off_2d[:, k] = mb_off_2d[:, k - 1] + mb_b2[:, k - 1]
    for w in np.unique(flat_w):
        if w == 0:
            continue
        idx = np.flatnonzero(flat_w == w)
        blob = np.frombuffer(bitpack.pack(mb[idx].reshape(-1), int(w)), dtype=np.uint8)
        nb = int(w) * 4  # constant bytes per miniblock → broadcast, no cumsum
        dst = (mb_off[idx][:, None] + np.arange(nb)[None, :]).reshape(-1)
        out[dst] = blob
    return header + out.tobytes()


def decode(buf, bits: int = 32, pos: int = 0) -> tuple[np.ndarray, int]:
    """Decode. Returns (np.int32 or np.int64 array, next_pos)."""
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    block, pos = decode_uvarint(raw, pos)
    mbs, pos = decode_uvarint(raw, pos)
    count, pos = decode_uvarint(raw, pos)
    first_zz, pos = decode_uvarint(raw, pos)
    first = zigzag_decode_scalar(first_zz)
    mb_vals = block // mbs
    dtype = np.int32 if bits == 32 else np.int64
    if count == 0:
        return np.empty(0, dtype=dtype), pos
    if count == 1:
        return np.array([first], dtype=np.int64).astype(dtype), pos
    nd = count - 1
    nblocks = (nd + block - 1) // block
    tot_mbs = nblocks * mbs
    # phase 1: walk block headers (tiny sequential steps), record layout
    min_delta = np.empty(nblocks, dtype=np.int64)
    widths = np.empty((nblocks, mbs), dtype=np.int64)
    payload_pos = np.empty(tot_mbs, dtype=np.int64)
    mb_nbytes_flat = np.empty(tot_mbs, dtype=np.int64)
    rawbytes = raw  # local
    for b in range(nblocks):
        md_zz, pos = decode_uvarint(rawbytes, pos)
        min_delta[b] = zigzag_decode_scalar(md_zz)
        wrow = rawbytes[pos:pos + mbs]
        pos += mbs
        base = b * mbs
        for m in range(mbs):
            w = int(wrow[m])
            widths[b, m] = w
            payload_pos[base + m] = pos
            nb = mb_vals * w // 8
            mb_nbytes_flat[base + m] = nb
            pos += nb
    # phase 2: unpack all miniblocks grouped by width
    deltas = np.zeros(tot_mbs * mb_vals, dtype=np.uint64)
    dmat = deltas.reshape(tot_mbs, mb_vals)
    flat_w = widths.reshape(-1)
    for w in np.unique(flat_w):
        if w == 0:
            continue
        idx = np.flatnonzero(flat_w == w)
        nb = mb_vals * int(w) // 8  # constant bytes per miniblock in this group
        src = (payload_pos[idx][:, None] + np.arange(nb)[None, :]).reshape(-1)
        vals = bitpack.unpack(np.ascontiguousarray(raw[src]), int(w), idx.size * mb_vals)
        dmat[idx] = vals.reshape(idx.size, mb_vals)
    # add min_delta per block (modular)
    dview = deltas.reshape(nblocks, block)
    dview += min_delta[:, None].view(np.uint64)
    first_u = np.uint64(first & 0xFFFFFFFFFFFFFFFF)
    out = np.empty(count, dtype=np.uint64)
    out[0] = first_u
    np.cumsum(deltas[:nd], out=out[1:])
    out[1:] += first_u
    signed = out.view(np.int64)
    return signed.astype(np.int32) if bits == 32 else signed, pos
