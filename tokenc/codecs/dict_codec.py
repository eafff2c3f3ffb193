"""Dictionary encoding: uniques (PLAIN) + layout-tagged codes.

Mirrors the reference's dict machinery semantics
(/root/reference/layout/dictpage.go:74-225): first-occurrence-ordered
dictionary per chunk, integer codes, a leading bit-width byte. Unlike the
reference (one shared dict per row group under a mutex,
writer/writer.go:315-325), our dict scope is a single chunk — no cross-task
coordination, no shuffle, embarrassingly parallel at 1000 executors.

Codes layout (tag in the top 2 bits of the width byte; width ≤ 32 fits the
low 6): the reference's interleaved RLE/bit-packed hybrid decodes through a
sequential header walk — the hottest decode kernel on dict-heavy tables
(17–72 Mvals/s depending on run mix). The encoder instead measures the
codes' run structure and picks one of two walk-free layouts:

    CODES_RLES   runs-heavy codes → structure-of-arrays runs (rle_soa:
                 FOR lens + FOR values; decode = 2 FOR decodes + repeat)
    CODES_DENSE  run-free codes → ONE dense bit-packed group, no headers
                 (decode = one word-lane unpack of a known byte span)

CODES_HYBRID (tag 0) remains decodable for parity and old blobs.

Payload layout:
    u32 dict_byte_len + dict_blob(PLAIN uniques)
    u32 cardinality
    u8 (layout_tag << 6 | bit_width) + codes payload
"""

from __future__ import annotations

import numpy as np

from . import bitpack, plain, rle, rle_soa

CODES_HYBRID = 0
CODES_RLES = 1
CODES_DENSE = 2


_RUN_PROBE = 65536


def _encode_codes(codes: np.ndarray, width: int) -> bytes:
    """Tag byte + codes payload; layout picked from measured run structure.

    The run probe is a contiguous centered slice (preserves run structure,
    like the selector's sampling) — a full `_run_bounds` pass on run-free
    codes costs more than the dense pack itself."""
    n = codes.size
    if width == 0 or n == 0:
        return bytes([CODES_DENSE << 6])  # all-zero codes: zero payload bytes
    s0 = max(0, (n - _RUN_PROBE) // 2)
    s = codes[s0:s0 + _RUN_PROBE]
    n_runs = 1 + int(np.count_nonzero(s[1:] != s[:-1]))
    if n >= 64 and s.size / n_runs >= 4.0:
        return bytes([CODES_RLES << 6 | width]) + rle_soa.encode(codes)
    # code width ≤ 32 always (int32 indices): 32-bit lanes, half the traffic
    return (bytes([CODES_DENSE << 6 | width])
            + bitpack.pack32(codes.astype(np.uint32), width))


def _decode_codes(raw: np.ndarray, count: int, pos: int) -> tuple[np.ndarray, int]:
    """→ (codes int64, next_pos)."""
    tag = int(raw[pos])
    pos += 1
    layout, width = tag >> 6, tag & 0x3F
    if layout == CODES_RLES:
        return rle_soa.decode(raw, count, pos)
    if layout == CODES_DENSE:
        nbytes = (count * width + 7) // 8
        codes = bitpack.unpack32(raw[pos:pos + nbytes], width, count)
        return codes.astype(np.int64), pos + nbytes
    if layout != CODES_HYBRID:  # corrupt tag — fail loudly, not misparse
        raise ValueError(f"unknown dict codes layout {layout}")
    codes, pos = rle.decode(raw, width, count, pos)
    return codes.astype(np.int64), pos


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
    # wide-range ints and floats: Arrow's hash-based dictionary_encode —
    # O(n) with first-occurrence dictionary order built in, vs the old
    # np.unique fallback's O(n log n) argsort + an extra reorder pass
    # (the argsorts on float dict columns were the top chunk-encode cost).
    # NaNs collapse to one dictionary slot, same as np.unique's
    # equal_nan default.
    import pyarrow as pa

    d = pa.array(vals).dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = d.dictionary.to_numpy(zero_copy_only=False)
    return codes, np.asarray(uniques, dtype=vals.dtype)


def assemble_numeric(codes: np.ndarray, uniques: np.ndarray,
                     phys: str) -> bytes:
    """Payload from a pre-computed factorization (codes index uniques).
    Page encoders use this to avoid re-factorizing raw values per page:
    the chunk factorizes once, each page derives its local dict by
    re-factorizing its CODE slice (dense O(page+card) int path)."""
    dict_blob = plain.encode_numeric(uniques, phys)
    width = bitpack.bit_width(uniques.size - 1) if uniques.size > 1 else 0
    return (
        len(dict_blob).to_bytes(4, "little") + dict_blob
        + uniques.size.to_bytes(4, "little")
        + _encode_codes(codes, width)
    )


def encode_numeric(vals: np.ndarray, phys: str) -> bytes:
    codes, uniques = factorize_numeric(np.asarray(vals))
    return assemble_numeric(codes, uniques, phys)


def decode_numeric(buf, phys: str, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    dlen = int.from_bytes(raw[pos:pos + 4].tobytes(), "little")
    pos += 4
    card = int.from_bytes(raw[pos + dlen:pos + dlen + 4].tobytes(), "little")
    uniques, _ = plain.decode_numeric(raw[pos:pos + dlen].tobytes(), phys, card)
    pos += dlen + 4
    codes, pos = _decode_codes(raw, count, pos)
    return uniques[codes], pos


def factorize_binary(data: np.ndarray,
                     offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (codes int64, uniques data uint8, uniques offsets int64) via
    Arrow's hash-based dictionary_encode (no sort)."""
    import pyarrow as pa

    from ..arrow_util import binary_array

    arr = binary_array(data, offsets)  # large_binary when offsets > 2 GiB
    d = arr.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uq = d.dictionary
    u_off_dt = np.int64 if pa.types.is_large_binary(uq.type) else np.int32
    u_off = np.frombuffer(uq.buffers()[1], dtype=u_off_dt)[: len(uq) + 1].astype(np.int64)
    u_data = np.frombuffer(uq.buffers()[2], dtype=np.uint8) if uq.buffers()[2] else np.empty(0, np.uint8)
    return codes, u_data, u_off


def assemble_binary(codes: np.ndarray, u_data: np.ndarray,
                    u_off: np.ndarray) -> bytes:
    """Payload from a pre-computed binary factorization (see
    assemble_numeric)."""
    card = u_off.size - 1
    dict_blob = plain.encode_byte_array(u_data, u_off)
    width = bitpack.bit_width(card - 1) if card > 1 else 0
    return (
        len(dict_blob).to_bytes(4, "little") + dict_blob
        + card.to_bytes(4, "little")
        + _encode_codes(codes, width)
    )


def encode_binary(data: np.ndarray, offsets: np.ndarray) -> bytes:
    """Dictionary-encode a byte-array column (Arrow data+offsets layout)."""
    codes, u_data, u_off = factorize_binary(data, offsets)
    return assemble_binary(codes, u_data, u_off)


def decode_binary(buf, count: int, pos: int = 0) -> tuple[np.ndarray, np.ndarray, int]:
    """→ (data uint8, offsets int64, next_pos)."""
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    dlen = int.from_bytes(raw[pos:pos + 4].tobytes(), "little")
    pos += 4
    card = int.from_bytes(raw[pos + dlen:pos + dlen + 4].tobytes(), "little")
    u_data, u_off, _ = plain.decode_byte_array(raw[pos:pos + dlen], card)
    pos += dlen + 4
    codes, pos = _decode_codes(raw, count, pos)
    lens = np.diff(u_off)
    out_lens = lens[codes]
    out_off = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_off[1:])
    idx = plain._ranges_to_indices(u_off[codes], out_lens)
    out_data = u_data[idx] if idx.size else np.empty(0, dtype=np.uint8)
    return out_data, out_off, pos
