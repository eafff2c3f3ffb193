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


def encode(vals: np.ndarray) -> bytes:
    """Encode an int32/int64 array. Empty input → header-only blob."""
    d = np.ascontiguousarray(vals, dtype=np.int64)
    ref = int(d.min()) if d.size else 0
    # residuals mod 2^64: correct for any int64 span, incl. full range
    resid = d.view(np.uint64) - np.uint64(np.int64(ref).astype(np.uint64))
    span = int(resid.max()) if d.size else 0
    w = max(1, (span.bit_length() + 7) // 8)
    head = bytes([w]) + varint.encode_uvarint(
        varint.zigzag_encode_scalar(ref))
    if d.size == 0:
        return head
    if w == 8:
        body = resid.tobytes()
    else:
        # view each u64 as 8 LE bytes, keep the low w — vectorized slice
        body = np.ascontiguousarray(
            resid.view(np.uint8).reshape(-1, 8)[:, :w]).tobytes()
    return head + body


def decode(buf: bytes | np.ndarray, count: int,
           pos: int = 0) -> tuple[np.ndarray, int]:
    """→ (int64 values, next_pos)."""
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    w = int(raw[pos])
    zz, pos = varint.decode_uvarint(raw, pos + 1)
    ref = varint.zigzag_decode_scalar(zz)
    end = pos + count * w
    if count == 0:
        return np.empty(0, np.int64), end
    body = np.asarray(raw[pos:end], dtype=np.uint8)
    if body.size != count * w:
        raise ValueError("for_bp buffer underrun")
    if w == 8:
        resid = np.ascontiguousarray(body).view("<u8")
    else:
        wide = np.zeros((count, 8), np.uint8)
        wide[:, :w] = body.reshape(count, w)
        resid = wide.reshape(-1).view("<u8")
    out = (resid + np.uint64(np.int64(ref).astype(np.uint64))).view(np.int64)
    return out, end
