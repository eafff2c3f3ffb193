"""Dictionary encoding: uniques (PLAIN) + RLE/bit-packed hybrid indices.

Mirrors the reference's dict machinery semantics
(/root/reference/layout/dictpage.go:74-225): first-occurrence-ordered
dictionary per chunk, int32 codes, codes RLE/bit-pack-hybrid encoded with a
leading bit-width byte. Unlike the reference (one shared dict per row group
under a mutex, writer/writer.go:315-325), our dict scope is a single chunk —
no cross-task coordination, no shuffle, embarrassingly parallel at 1000
executors.

Payload layout:
    u32 dict_byte_len + dict_blob(PLAIN uniques)
    u8 bit_width + hybrid(codes)
"""

from __future__ import annotations

import numpy as np

from . import bitpack, plain, rle


def factorize_numeric(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """First-occurrence factorize → (codes int64, uniques).

    Small-range integers (token ids: vocab ≪ values) take an O(n) dense
    lookup-table path — one scatter + one gather instead of the O(n log n)
    argsorts inside np.unique; that was the single hottest spot of the
    whole encode profile (dict pages re-factorize per page)."""
    n = vals.size
    if n and vals.dtype.kind in "iu":
        vmin, vmax = int(vals.min()), int(vals.max())
        rng = vmax - vmin + 1
        if rng <= max(1 << 20, 4 * n):
            shifted = vals.astype(np.int64) - vmin
            first = np.full(rng, -1, dtype=np.int64)
            # reversed scatter: the LAST write per slot is the value's FIRST
            # occurrence position in original order
            first[shifted[::-1]] = np.arange(n - 1, -1, -1, dtype=np.int64)
            present = np.flatnonzero(first >= 0)
            order = np.argsort(first[present], kind="stable")  # O(card)
            uniq_shifted = present[order]
            rank = np.empty(rng, dtype=np.int64)
            rank[uniq_shifted] = np.arange(order.size)
            return rank[shifted], (uniq_shifted + vmin).astype(vals.dtype)
    uniq_sorted, inv = np.unique(vals, return_inverse=True)
    # reorder uniques to first occurrence for deterministic, reference-like dicts
    first_pos = np.full(uniq_sorted.size, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_pos, inv, np.arange(vals.size, dtype=np.int64))
    order = np.argsort(first_pos, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    return rank[inv], uniq_sorted[order]


def encode_numeric(vals: np.ndarray, phys: str) -> bytes:
    codes, uniques = factorize_numeric(np.asarray(vals))
    dict_blob = plain.encode_numeric(uniques, phys)
    width = bitpack.bit_width(uniques.size - 1) if uniques.size > 1 else 0
    idx_blob = rle.encode(codes.astype(np.uint64), width)
    return (
        len(dict_blob).to_bytes(4, "little") + dict_blob
        + uniques.size.to_bytes(4, "little")
        + bytes([width]) + idx_blob
    )


def decode_numeric(buf, phys: str, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    dlen = int.from_bytes(raw[pos:pos + 4].tobytes(), "little")
    pos += 4
    card = int.from_bytes(raw[pos + dlen:pos + dlen + 4].tobytes(), "little")
    uniques, _ = plain.decode_numeric(raw[pos:pos + dlen].tobytes(), phys, card)
    pos += dlen + 4
    width = int(raw[pos])
    pos += 1
    codes, pos = rle.decode(raw, width, count, pos)
    return uniques[codes.astype(np.int64)], pos


def encode_binary(data: np.ndarray, offsets: np.ndarray) -> bytes:
    """Dictionary-encode a byte-array column (Arrow data+offsets layout)."""
    import pyarrow as pa

    from ..arrow_util import binary_array

    arr = binary_array(data, offsets)  # large_binary when offsets > 2 GiB
    d = arr.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uq = d.dictionary
    u_off_dt = np.int64 if pa.types.is_large_binary(uq.type) else np.int32
    u_off = np.frombuffer(uq.buffers()[1], dtype=u_off_dt)[: len(uq) + 1].astype(np.int64)
    u_data = np.frombuffer(uq.buffers()[2], dtype=np.uint8) if uq.buffers()[2] else np.empty(0, np.uint8)
    dict_blob = plain.encode_byte_array(u_data, u_off)
    width = bitpack.bit_width(len(uq) - 1) if len(uq) > 1 else 0
    idx_blob = rle.encode(codes.astype(np.uint64), width)
    return (
        len(dict_blob).to_bytes(4, "little") + dict_blob
        + len(uq).to_bytes(4, "little")
        + bytes([width]) + idx_blob
    )


def decode_binary(buf, count: int, pos: int = 0) -> tuple[np.ndarray, np.ndarray, int]:
    """→ (data uint8, offsets int64, next_pos)."""
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    dlen = int.from_bytes(raw[pos:pos + 4].tobytes(), "little")
    pos += 4
    card = int.from_bytes(raw[pos + dlen:pos + dlen + 4].tobytes(), "little")
    u_data, u_off, _ = plain.decode_byte_array(raw[pos:pos + dlen], card)
    pos += dlen + 4
    width = int(raw[pos])
    pos += 1
    codes, pos = rle.decode(raw, width, count, pos)
    codes = codes.astype(np.int64)
    lens = np.diff(u_off)
    out_lens = lens[codes]
    out_off = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_off[1:])
    idx = plain._ranges_to_indices(u_off[codes], out_lens)
    out_data = u_data[idx] if idx.size else np.empty(0, dtype=np.uint8)
    return out_data, out_off, pos
