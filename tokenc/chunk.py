"""Chunk container: header + validity + list offsets + encoded payload + stats.

The reference's page/chunk machinery (null stripping layout/page.go:196-216,
RL/DL encode :218-238, stats accumulation :87-123, chunk roll-up
layout/chunk.go:18-80) re-expressed for the Arrow data model:

  * Dremel repetition/definition levels collapse to (validity bitmap, list
    offsets) for the one nested shape we support (`tokens: array<int32>`,
    max RL 1). null-list vs empty-list: null rows are absent from the
    offsets (validity bit 0); empty lists are zero-length offset spans —
    provably equivalent to DL∈{0,1,2} of a nullable one-level LIST.
  * Values are stored null-stripped (only valid slots), like the reference.
  * Per-chunk stats (min/max/null_count/sizes) ride in the manifest, the
    ColumnIndex/OffsetIndex analog (reference writer/writer.go:418-481).

Blob layout (little-endian):
    magic 'TKC1' | u8 version=1 | u8 codec_id | u8 phys | u8 flags
    u32 n_rows | u32 n_values | u32 null_count
    [flags&1 HAS_NULLS]  u32 len + validity bitmap (LSB-first, over rows)
    [flags&2 IS_LIST]    u32 len + delta_bp(list lengths, one per valid row)
    u32 len + payload
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import codecs
from . import compress as compress_mod
from .codecs import bss, delta_ba, delta_bp, dict_codec, fsst, plain, rle

MAGIC = b"TKC1"
VERSION = 1
F_HAS_NULLS = 1
F_IS_LIST = 2
F_COMPRESSED = 4  # payload section is block-compressed (compress.py framing)

_NUMERIC_PHYS = {codecs.PHYS_INT32: "int32", codecs.PHYS_INT64: "int64",
                 codecs.PHYS_FLOAT: "float", codecs.PHYS_DOUBLE: "double"}
_NUMERIC_DTYPE = {codecs.PHYS_INT32: np.int32, codecs.PHYS_INT64: np.int64,
                  codecs.PHYS_FLOAT: np.float32, codecs.PHYS_DOUBLE: np.float64}
_ITEMSIZE = {codecs.PHYS_INT32: 4, codecs.PHYS_INT64: 8, codecs.PHYS_FLOAT: 4,
             codecs.PHYS_DOUBLE: 8, codecs.PHYS_BOOL: 1}


@dataclass
class ChunkData:
    """Decoded chunk: null-stripped values + row structure."""
    phys: int
    n_rows: int
    validity: np.ndarray | None          # bool per row, None = all valid
    list_lengths: np.ndarray | None      # int64 per valid row (lists only)
    values: np.ndarray | None = None     # numeric/bool leaf values
    ba_data: np.ndarray | None = None    # byte_array payloads
    ba_offsets: np.ndarray | None = None


@dataclass
class ChunkStats:
    codec: int
    phys: int
    n_rows: int
    n_values: int
    null_count: int
    raw_bytes: int
    enc_bytes: int
    min_val: object = None
    max_val: object = None


def _encode_payload(codec: int, phys: int, values, ba_data, ba_offsets) -> bytes:
    if phys == codecs.PHYS_BYTE_ARRAY:
        if codec == codecs.PLAIN:
            return plain.encode_byte_array(ba_data, ba_offsets)
        if codec == codecs.DICT:
            return dict_codec.encode_binary(ba_data, ba_offsets)
        if codec == codecs.FSST:
            return fsst.encode(ba_data, ba_offsets)
        if codec == codecs.DLBA:
            return delta_ba.encode_dlba(ba_data, ba_offsets)
        if codec == codecs.DBA:
            return delta_ba.encode_dba(ba_data, ba_offsets)
        raise ValueError(f"codec {codec} unsupported for byte_array")
    if phys == codecs.PHYS_BOOL:
        if codec == codecs.PLAIN:
            return plain.encode_bool(values)
        if codec == codecs.RLE:
            return rle.encode(np.asarray(values, dtype=np.uint64), 1)
        raise ValueError(f"codec {codec} unsupported for bool")
    pname = _NUMERIC_PHYS[phys]
    if codec == codecs.PLAIN:
        return plain.encode_numeric(values, pname)
    if codec == codecs.DICT:
        return dict_codec.encode_numeric(np.asarray(values, _NUMERIC_DTYPE[phys]), pname)
    if codec == codecs.DELTA_BP:
        if phys == codecs.PHYS_INT32:
            return delta_bp.encode(np.asarray(values, np.int32), bits=32)
        return delta_bp.encode(np.asarray(values, np.int64), bits=64)
    if codec == codecs.RLE:
        vals = np.asarray(values, np.int64)
        width = int(vals.max()).bit_length() if vals.size and vals.max() > 0 else 0
        return bytes([width]) + rle.encode(vals.view(np.uint64), width)
    if codec == codecs.BSS:
        return bss.encode(values, pname)
    raise ValueError(f"codec {codec} unsupported for {pname}")


def _decode_payload(codec: int, phys: int, buf: np.ndarray, n_values: int):
    """→ (values, ba_data, ba_offsets)."""
    if phys == codecs.PHYS_BYTE_ARRAY:
        if codec == codecs.PLAIN:
            d, o, _ = plain.decode_byte_array(buf, n_values)
        elif codec == codecs.DICT:
            d, o, _ = dict_codec.decode_binary(buf, n_values)
        elif codec == codecs.FSST:
            d, o, _ = fsst.decode(buf, n_values)
        elif codec == codecs.DLBA:
            d, o, _ = delta_ba.decode_dlba(buf, n_values)
        elif codec == codecs.DBA:
            d, o, _ = delta_ba.decode_dba(buf, n_values)
        else:
            raise ValueError(f"codec {codec} unsupported for byte_array")
        return None, d, o
    if phys == codecs.PHYS_BOOL:
        if codec == codecs.PLAIN:
            v, _ = plain.decode_bool(buf, n_values)
        else:
            v = rle.decode(buf, 1, n_values)[0].astype(bool)
        return v, None, None
    pname = _NUMERIC_PHYS[phys]
    if codec == codecs.PLAIN:
        v, _ = plain.decode_numeric(np.ascontiguousarray(buf), pname, n_values)
    elif codec == codecs.DICT:
        v, _ = dict_codec.decode_numeric(buf, pname, n_values)
    elif codec == codecs.DELTA_BP:
        bits = 32 if phys == codecs.PHYS_INT32 else 64
        v, _ = delta_bp.decode(buf, bits=bits)
        if phys in (codecs.PHYS_FLOAT, codecs.PHYS_DOUBLE):
            raise ValueError("delta_bp on float")
    elif codec == codecs.RLE:
        width = int(buf[0])
        v = rle.decode(buf, width, n_values, pos=1)[0].view(np.int64).copy()
        v = v.astype(_NUMERIC_DTYPE[phys])
    elif codec == codecs.BSS:
        v, _ = bss.decode(buf, pname, n_values)
    else:
        raise ValueError(f"codec {codec} unsupported for {pname}")
    return np.asarray(v, _NUMERIC_DTYPE[phys]), None, None


def _minmax(phys: int, values, ba_data, ba_offsets, n_values: int):
    if n_values == 0:
        return None, None
    if phys == codecs.PHYS_BYTE_ARRAY:
        lens = np.diff(ba_offsets)
        cap = 64
        # cheap exact min/max via python over a sorted sample is wrong; do exact:
        # compare as bytes via numpy void view when fixed-width padded
        m = int(lens.max()) if lens.size else 0
        if m == 0:
            return b"", b""
        mm = min(m, cap)
        idxm = np.minimum(np.arange(mm)[None, :], np.maximum(lens - 1, 0)[:, None])
        mat = np.asarray(ba_data)[np.asarray(ba_offsets[:-1])[:, None] + idxm]
        mat[np.arange(mm)[None, :] >= lens[:, None]] = 0
        order = np.lexsort(mat.T[::-1])
        lo, hi = order[0], order[-1]
        getv = lambda i: bytes(np.asarray(ba_data)[ba_offsets[i]:ba_offsets[i + 1]].tobytes())
        return getv(lo)[:cap], getv(hi)[:cap]
    vmin = values.min()
    vmax = values.max()
    return (vmin.item(), vmax.item())


def encode_chunk(*, phys: int, codec: int, n_rows: int,
                 values: np.ndarray | None = None,
                 ba_data: np.ndarray | None = None,
                 ba_offsets: np.ndarray | None = None,
                 validity: np.ndarray | None = None,
                 list_lengths: np.ndarray | None = None,
                 omit_stats: bool = False,
                 compression: str | None = None) -> tuple[bytes, ChunkStats]:
    """Encode one column chunk. `values`/`ba_*` cover only VALID rows
    (null-stripped, like the reference's DL==MaxDL rule)."""
    flags = 0
    null_count = 0
    sections: list[bytes] = []
    if validity is not None and not validity.all():
        flags |= F_HAS_NULLS
        null_count = int((~validity).sum())
        sections.append(np.packbits(validity.astype(np.uint8), bitorder="little").tobytes())
    if list_lengths is not None:
        flags |= F_IS_LIST
        sections.append(delta_bp.encode(np.asarray(list_lengths, np.int64), bits=64))
    if phys == codecs.PHYS_BYTE_ARRAY:
        n_values = ba_offsets.size - 1
        raw_bytes = int(ba_offsets[-1] - ba_offsets[0]) + 4 * n_values
    else:
        n_values = values.size
        raw_bytes = n_values * _ITEMSIZE[phys]
    payload = _encode_payload(codec, phys, values, ba_data, ba_offsets)
    if compression and compression != "uncompressed":
        # final optional stage after lightweight encoding, like the
        # reference's per-page Compress (layout/page.go:240); kept only when
        # it actually shrinks the payload
        framed = compress_mod.compress(payload, compress_mod.COMP_IDS[compression])
        if len(framed) < len(payload):
            payload = framed
            flags |= F_COMPRESSED
    sections.append(payload)
    head = (
        MAGIC + bytes([VERSION, codec, phys, flags])
        + n_rows.to_bytes(4, "little") + n_values.to_bytes(4, "little")
        + null_count.to_bytes(4, "little")
    )
    body = b"".join(len(s).to_bytes(4, "little") + s for s in sections)
    blob = head + body
    if omit_stats:
        mn = mx = None
    else:
        mn, mx = _minmax(phys, values, ba_data, ba_offsets, n_values)
    stats = ChunkStats(codec=codec, phys=phys, n_rows=n_rows, n_values=n_values,
                       null_count=null_count, raw_bytes=raw_bytes,
                       enc_bytes=len(blob), min_val=mn, max_val=mx)
    return blob, stats


def decode_chunk(blob: bytes | np.ndarray) -> ChunkData:
    raw = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    if raw.size < 20:
        raise ValueError(f"truncated chunk: {raw.size} bytes < 20-byte header")
    if raw[:4].tobytes() != MAGIC:
        raise ValueError("bad chunk magic")
    version, codec, phys, flags = (int(raw[4]), int(raw[5]), int(raw[6]), int(raw[7]))
    if version != VERSION:
        raise ValueError(f"unsupported chunk version {version}")
    n_rows = int.from_bytes(raw[8:12].tobytes(), "little")
    n_values = int.from_bytes(raw[12:16].tobytes(), "little")
    pos = 20  # skip null_count (12:16 is n_values, 16:20 null_count)
    null_count = int.from_bytes(raw[16:20].tobytes(), "little")
    validity = None
    list_lengths = None
    def _take(pos):
        ln = int.from_bytes(raw[pos:pos + 4].tobytes(), "little")
        if pos + 4 + ln > raw.size:
            raise ValueError(
                f"truncated chunk: section of {ln} bytes at {pos} exceeds blob size {raw.size}")
        return ln, pos + 4

    if flags & F_HAS_NULLS:
        ln, pos = _take(pos)
        bits = np.unpackbits(raw[pos:pos + ln], bitorder="little")[:n_rows]
        validity = bits.astype(bool)
        pos += ln
    if flags & F_IS_LIST:
        ln, pos = _take(pos)
        list_lengths, _ = delta_bp.decode(raw[pos:pos + ln], bits=64)
        pos += ln
    ln, pos = _take(pos)
    payload = raw[pos:pos + ln]
    if flags & F_COMPRESSED:
        payload = np.frombuffer(compress_mod.decompress(payload), dtype=np.uint8)
    values, ba_data, ba_offsets = _decode_payload(codec, phys, payload, n_values)
    return ChunkData(phys=phys, n_rows=n_rows, validity=validity,
                     list_lengths=list_lengths, values=values,
                     ba_data=ba_data, ba_offsets=ba_offsets)
