"""DELTA_LENGTH_BYTE_ARRAY and DELTA_BYTE_ARRAY (front coding), vectorized.

Reference scalar implementations:
  DELTA_LENGTH_BYTE_ARRAY  /root/reference/encoding/encodingwrite.go:403-418
  DELTA_BYTE_ARRAY         /root/reference/encoding/encodingwrite.go:468-502

DLBA: lengths DELTA_BINARY_PACKED, then all value bytes concatenated.
DBA:  shared-prefix lengths (vs previous value) DELTA_BINARY_PACKED, then the
      suffixes as DLBA. Great for sorted/sequential ids like doc_id.

Columns are in Arrow layout (data uint8 concat + offsets int64).
"""

from __future__ import annotations

import numpy as np

from . import delta_bp


def encode_dlba(data: np.ndarray, offsets: np.ndarray) -> bytes:
    lens = np.diff(np.asarray(offsets, dtype=np.int64))
    lens_blob = delta_bp.encode(lens, bits=32)
    payload = np.ascontiguousarray(data, dtype=np.uint8)[offsets[0]:offsets[-1]].tobytes()
    return len(lens_blob).to_bytes(4, "little") + lens_blob + payload


def decode_dlba(buf, count: int, pos: int = 0) -> tuple[np.ndarray, np.ndarray, int]:
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    llen = int.from_bytes(raw[pos:pos + 4].tobytes(), "little")
    pos += 4
    lens, _ = delta_bp.decode(raw[pos:pos + llen], bits=32)
    pos += llen
    lens = lens.astype(np.int64)
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    data = raw[pos:pos + total].copy()
    return data, offsets, pos + total


def _common_prefix_lens(data: np.ndarray, offsets: np.ndarray, cap: int = 1024) -> np.ndarray:
    """prefix_len[i] = shared prefix of value i with value i-1 (prefix_len[0]=0)."""
    n = offsets.size - 1
    out = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return out
    lens = np.diff(offsets)
    maxcmp = np.minimum(np.minimum(lens[1:], lens[:-1]), cap)
    m = int(maxcmp.max()) if maxcmp.size else 0
    if m == 0:
        return out
    # pad into (n, m) matrices for prev and cur, compare columns vectorized
    idx = np.minimum(np.arange(m)[None, :], (lens - 1)[:, None])
    mat = data[offsets[:-1, None] + idx]  # (n, m) with clamped tail repeats
    valid = np.arange(m)[None, :] < lens[:, None]
    eq = (mat[1:] == mat[:-1]) & valid[1:] & valid[:-1]
    # first False position per row = prefix len
    neq = ~eq
    has = neq.any(axis=1)
    first = np.where(has, neq.argmax(axis=1), m)
    out[1:] = np.minimum(first, maxcmp)
    return out


def encode_dba(data: np.ndarray, offsets: np.ndarray) -> bytes:
    data = np.asarray(data, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.size - 1
    if offsets[0] != 0:
        data = data[offsets[0]:offsets[-1]]
        offsets = offsets - offsets[0]
    pre = _common_prefix_lens(data, offsets)
    pre_blob = delta_bp.encode(pre, bits=32)
    # suffixes
    suf_starts = offsets[:-1] + pre
    suf_lens = np.diff(offsets) - pre
    from .plain import _ranges_to_indices

    idx = _ranges_to_indices(suf_starts, suf_lens)
    suf_data = data[idx] if idx.size else np.empty(0, dtype=np.uint8)
    suf_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(suf_lens, out=suf_off[1:])
    suf_blob = encode_dlba(suf_data, suf_off)
    return len(pre_blob).to_bytes(4, "little") + pre_blob + suf_blob


def decode_dba(buf, count: int, pos: int = 0) -> tuple[np.ndarray, np.ndarray, int]:
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    plen = int.from_bytes(raw[pos:pos + 4].tobytes(), "little")
    pos += 4
    pre, _ = delta_bp.decode(raw[pos:pos + plen], bits=32)
    pos += plen
    pre = pre.astype(np.int64)
    suf_data, suf_off, pos = decode_dlba(raw, count, pos)
    suf_lens = np.diff(suf_off)
    out_lens = pre + suf_lens
    out_off = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_off[1:])
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    maxlen = int(out_lens.max()) if count else 0
    # vectorized cost is O(maxlen · count) regardless of actual bytes, so
    # gate on estimated work vs output size: a chunk of short keys with
    # one long outlier (maxlen ≫ mean) would pay maxlen full-column
    # passes and lose badly to the sequential fallback
    if count and maxlen <= 512 and maxlen * count <= 8 * int(out_off[-1]):
        # vectorized reconstruction, one pass per BYTE POSITION j: byte j
        # of value i always originates in the SUFFIX of the last value
        # k ≤ i with pre[k] ≤ j (every value between k and i has pre > j
        # and just carries the byte forward; j < len[k] is guaranteed by
        # the front-coding invariant pre[m] ≤ len[m-1]). That k is a
        # running maximum over `pre <= j`, so each position costs O(count)
        # vector ops instead of count Python-level slice copies — measured
        # ~10× on 16-24-byte key chunks, which made decode_dba the
        # hottest kernel of the whole headline decode.
        ar = np.arange(count, dtype=np.int64)
        starts = out_off[:-1]
        for j in range(maxlen):
            k = np.maximum.accumulate(np.where(pre <= j, ar, -1))
            live = out_lens > j  # pre[0] == 0 ⇒ k[live] ≥ 0
            kl = k[live]
            out[starts[live] + j] = suf_data[suf_off[kl] + (j - pre[kl])]
        return out, out_off, pos
    # long-value fallback: sequential reconstruction; each value copies
    # its prefix from the previous value (vectorized slice per step)
    for i in range(count):
        s = out_off[i]
        if pre[i]:
            out[s:s + pre[i]] = out[out_off[i - 1]:out_off[i - 1] + pre[i]]
        ss, se = suf_off[i], suf_off[i + 1]
        out[s + pre[i]:s + pre[i] + (se - ss)] = suf_data[ss:se]
    return out, out_off, pos
