"""FOR (frame-of-reference) encoding: subtract the chunk minimum, store the
residuals byte-aligned at the narrowest byte width that holds the range.

The north rule names frame-of-reference as a first-class codec for bounded
int32 token streams (vocab-bounded token ids: range < 2^17 → 3 bytes/value
at most, 2 for a 64Ki vocab). DELTA_BINARY_PACKED (delta_bp.py) already
applies FOR *per miniblock over deltas* — this codec is the no-delta form,
the right pick when values are bounded but NOT locally correlated (random
token ids): deltas of random values span twice the value range (one extra
bit), while plain FOR packs to exactly the range's width and decodes with a
single vectorized widen + add, no prefix sum.

Byte-aligned on purpose: tight bit-packing (bitpack.py) saves at most 7
bits/value but (a) is 20-35× slower both ways than the byte-lane kernels
here and (b) destroys the byte-level match structure the container codec's
LZ stage feeds on — on zipf-distributed token ids, 2-byte-aligned FOR +
zstd measures ~6% SMALLER than 15-bit tight packing + zstd. The selector's
measured refinement ranks final (encoded + container) bytes, so FOR is
chosen exactly when this layout wins end-to-end.

Layout:
    u8              byte width w in 1..8
    uvarint         zigzag(reference) — the chunk minimum as int64
    n_values * w    little-endian residuals (v - reference), low bytes first

The reference engine has no FOR codec (its encodings are the Parquet set,
/root/reference/encoding/encodingwrite.go); this is an upgrade permitted by
the north rule's "dict, RLE, FSST, bit-pack, frame-of-reference" list.
"""

from __future__ import annotations

import numpy as np

from . import varint

# power-of-two widths narrow/widen via dtype casts (vectorized, 4-20×
# faster than a strided byte-slice); only odd widths pay the slice
_NARROW = {1: "<u1", 2: "<u2", 4: "<u4", 8: "<u8"}


def _narrow_bytes(resid: np.ndarray, w: int, lanes: int) -> bytes:
    """Low w LE bytes of each lane-wide unsigned residual."""
    if w == lanes:
        return resid.tobytes()
    if w in _NARROW:
        return resid.astype(_NARROW[w]).tobytes()
    return np.ascontiguousarray(
        resid.view(np.uint8).reshape(-1, lanes)[:, :w]).tobytes()


def _widen(body: np.ndarray, count: int, w: int, lanes: int,
           out_u) -> np.ndarray:
    """Zero-extend w-byte LE rows back to lane-wide unsigned."""
    if w == lanes:
        return np.ascontiguousarray(body).view(f"<u{lanes}")
    if w in _NARROW:
        return np.ascontiguousarray(body).view(_NARROW[w]).astype(out_u)
    wide = np.zeros((count, lanes), np.uint8)
    wide[:, :w] = body.reshape(count, w)
    return wide.reshape(-1).view(f"<u{lanes}")


def encode(vals: np.ndarray) -> bytes:
    """Encode an int32/int64 array. Empty input → header-only blob."""
    a = np.asarray(vals)
    if a.dtype == np.int32 and a.size:
        # int32 fast path (the token hot path): no widen-to-int64 copy —
        # residuals computed in uint32 lanes, sliced from 4-byte rows.
        # Bit-identical output: span < 2^32 → same w, same LE low bytes.
        a = np.ascontiguousarray(a)
        ref = int(a.min())
        resid = a.view(np.uint32) - np.uint32(ref & 0xFFFFFFFF)
        span = int(resid.max())
        w = max(1, (span.bit_length() + 7) // 8)
        head = bytes([w]) + varint.encode_uvarint(
            varint.zigzag_encode_scalar(ref))
        return head + _narrow_bytes(resid, w, 4)
    d = np.ascontiguousarray(a, dtype=np.int64)
    ref = int(d.min()) if d.size else 0
    # residuals mod 2^64: correct for any int64 span, incl. full range
    resid = d.view(np.uint64) - np.uint64(np.int64(ref).astype(np.uint64))
    span = int(resid.max()) if d.size else 0
    w = max(1, (span.bit_length() + 7) // 8)
    head = bytes([w]) + varint.encode_uvarint(
        varint.zigzag_encode_scalar(ref))
    if d.size == 0:
        return head
    return head + _narrow_bytes(resid, w, 8)


def decode(buf: bytes | np.ndarray, count: int, pos: int = 0,
           out_dtype=np.int64) -> tuple[np.ndarray, int]:
    """→ (values, next_pos). `out_dtype=np.int32` takes the uint32-lane
    fast path (half the fill/add traffic, no downcast copy later) — valid
    whenever the encoded column is int32-physical, because then w ≤ 4 and
    ref + residual stays in int32 by construction."""
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    w = int(raw[pos])
    zz, pos = varint.decode_uvarint(raw, pos + 1)
    ref = varint.zigzag_decode_scalar(zz)
    end = pos + count * w
    if count == 0:
        return np.empty(0, out_dtype), end
    body = np.asarray(raw[pos:end], dtype=np.uint8)
    if body.size != count * w:
        raise ValueError("for_bp buffer underrun")
    if out_dtype == np.int32 and w <= 4:
        resid = _widen(body, count, w, 4, np.uint32)
        # modular: (uint32(ref) + resid) mod 2^32 == the original int32
        out = (resid + np.uint32(ref & 0xFFFFFFFF)).view(np.int32)
        return out, end
    resid = _widen(body, count, w, 8, np.uint64)
    out = (resid + np.uint64(np.int64(ref).astype(np.uint64))).view(np.int64)
    if out_dtype != np.int64:
        out = out.astype(out_dtype)
    return out, end
