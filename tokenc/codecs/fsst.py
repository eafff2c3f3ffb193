"""FSST-style symbol-table compression for string-like byte streams.

Public-design inspiration: "FSST: Fast Random Access String Compression"
(Boncz, Neumann, Leis — VLDB 2020): a static table of up to 255 byte symbols
(length 1..8), codes 0..254, code 255 = escape + literal byte. The reference
repo has no FSST; this fills its DELTA_BYTE_ARRAY niche for string columns
(/root/reference/encoding/encodingwrite.go:468-502) with O(1) random access
per value and a vectorizable decoder.

Our trainer is a deterministic mini-BPE over a sample of the chunk: iterative
most-frequent adjacent-pair merges (bounded symbol length 8, merges never
cross value boundaries), then codes are assigned to all merged symbols plus
the most frequent single bytes. Everything — training passes, encode token
mapping, escape-aware decode — is vectorized numpy; no per-row Python.

Payload layout:
    u32 table_len + table( u8 n_symbols, then per symbol u8 len + bytes )
    u32 lens_len  + delta_bp(per-value encoded byte lengths)
    payload bytes
"""

from __future__ import annotations

import numpy as np

from . import delta_bp

MAX_SYMBOLS = 255  # codes 0..254; 255 = escape
MAX_SYM_LEN = 8
ESC = 255
_SEP = -1


def _apply_merge(tok: np.ndarray, a: int, b: int, new_id: int) -> np.ndarray:
    m = np.flatnonzero((tok[:-1] == a) & (tok[1:] == b))
    if m.size == 0:
        return tok
    if a == b:
        # greedy left-to-right: within each chain of consecutive matches,
        # keep every other match
        starts = np.empty(m.size, dtype=bool)
        starts[0] = True
        starts[1:] = np.diff(m) != 1
        first_idx = np.flatnonzero(starts)
        cid = np.cumsum(starts) - 1
        within = np.arange(m.size) - first_idx[cid]
        m = m[(within % 2) == 0]
    tok[m] = new_id
    keep = np.ones(tok.size, dtype=bool)
    keep[m + 1] = False
    return tok[keep]


def train(data: np.ndarray, offsets: np.ndarray, sample_bytes: int = 1 << 16,
          max_merges: int = 240, min_count: int = 4):
    """→ (symbols: list[bytes] in code order, merges: list[(a,b,new_id)])."""
    data = np.asarray(data, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.size - 1
    if n == 0 or offsets[-1] == offsets[0]:
        return [], []
    # sample: prefix of values covering up to sample_bytes
    end_val = int(np.searchsorted(offsets, offsets[0] + sample_bytes, side="left"))
    end_val = max(1, min(n, end_val))
    lens = np.diff(offsets[: end_val + 1])
    total = int(lens.sum())
    tok = np.full(total + end_val, _SEP, dtype=np.int64)
    # interleave values with separators
    pos = (np.arange(total) + np.repeat(np.arange(end_val), lens))
    tok[pos] = data[offsets[0]:offsets[end_val]]
    sym_len = np.ones(256, dtype=np.int64)
    symbols: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    merges: list[tuple[int, int, int]] = []
    next_id = 256
    for _ in range(max_merges):
        if tok.size < 2:
            break
        left, right = tok[:-1], tok[1:]
        ok = (left != _SEP) & (right != _SEP)
        if not ok.any():
            break
        lv, rv = left[ok], right[ok]
        # pair length constraint
        lenok = (sym_len[lv] + sym_len[rv]) <= MAX_SYM_LEN
        lv, rv = lv[lenok], rv[lenok]
        if lv.size == 0:
            break
        keys = lv * np.int64(1 << 20) + rv
        uk, counts = np.unique(keys, return_counts=True)
        best = int(np.argmax(counts))
        if counts[best] < min_count:
            break
        a = int(uk[best] >> 20)
        b = int(uk[best] & ((1 << 20) - 1))
        new_sym = symbols[a] + symbols[b]
        symbols[next_id] = new_sym
        if next_id >= sym_len.size:
            sym_len = np.concatenate((sym_len, np.zeros(256, dtype=np.int64)))
        sym_len[next_id] = len(new_sym)
        merges.append((a, b, next_id))
        tok = _apply_merge(tok, a, b, next_id)
        next_id += 1
    # assign codes: merged symbols first (≤240), then most frequent single bytes
    code_syms: list[bytes] = [symbols[i] for i in range(256, next_id)]
    used = tok[tok != _SEP]
    singles = used[used < 256]
    freq = np.bincount(singles.astype(np.int64), minlength=256) if singles.size else np.zeros(256, dtype=np.int64)
    order = np.argsort(-freq, kind="stable")
    room = MAX_SYMBOLS - len(code_syms)
    for byte in order[:room]:
        if freq[byte] == 0:
            break
        code_syms.append(bytes([int(byte)]))
    return code_syms, merges


def serialize_table(code_syms: list[bytes]) -> bytes:
    out = bytearray([len(code_syms)])
    for s in code_syms:
        out.append(len(s))
        out += s
    return bytes(out)


def parse_table(raw: np.ndarray, pos: int = 0):
    """→ (sym_data uint8, sym_offsets int64, next_pos)."""
    nsym = int(raw[pos])
    pos += 1
    lens = np.empty(nsym, dtype=np.int64)
    chunks = []
    for i in range(nsym):
        ln = int(raw[pos])
        pos += 1
        lens[i] = ln
        chunks.append(raw[pos:pos + ln])
        pos += ln
    sym_off = np.zeros(nsym + 1, dtype=np.int64)
    np.cumsum(lens, out=sym_off[1:])
    sym_data = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint8)
    return sym_data, sym_off, pos


def encode(data: np.ndarray, offsets: np.ndarray) -> bytes:
    data = np.asarray(data, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.size - 1
    code_syms, merges = train(data, offsets)
    table_blob = serialize_table(code_syms)
    # tokenize the whole column with separators
    lens = np.diff(offsets)
    total = int(lens.sum())
    tok = np.full(total + n, _SEP, dtype=np.int64)
    if n:
        pos_idx = np.arange(total) + np.repeat(np.arange(n), lens)
        tok[pos_idx] = data[offsets[0]:offsets[-1]]
    for a, b, nid in merges:
        tok = _apply_merge(tok, a, b, nid)
    next_id = 256 + len(merges)
    # code lookup
    code_of = np.full(next_id, -1, dtype=np.int64)
    sym_to_code: dict[bytes, int] = {s: c for c, s in enumerate(code_syms)}
    # merged ids
    merged_syms: dict[int, bytes] = {}
    base = {i: bytes([i]) for i in range(256)}
    for a, b, nid in merges:
        sa = merged_syms.get(a, base.get(a))
        sb = merged_syms.get(b, base.get(b))
        merged_syms[nid] = sa + sb
    for i in range(256):
        c = sym_to_code.get(bytes([i]))
        if c is not None:
            code_of[i] = c
    for nid, s in merged_syms.items():
        c = sym_to_code.get(s)
        if c is not None:
            code_of[nid] = c
    is_sep = tok == _SEP
    body = ~is_sep
    codes = np.where(body, code_of[np.where(body, tok, 0)], -2)
    coded = body & (codes >= 0)
    escaped = body & (codes < 0)
    if (tok[escaped] >= 256).any():
        raise AssertionError("uncoded merged symbol cannot be escaped")
    out_len = np.zeros(tok.size, dtype=np.int64)
    out_len[coded] = 1
    out_len[escaped] = 2
    starts = np.zeros(tok.size, dtype=np.int64)
    np.cumsum(out_len[:-1], out=starts[1:])
    out = np.empty(int(out_len.sum()), dtype=np.uint8)
    out[starts[coded]] = codes[coded].astype(np.uint8)
    out[starts[escaped]] = ESC
    out[starts[escaped] + 1] = tok[escaped].astype(np.uint8)
    # per-value encoded lengths
    vid = np.cumsum(is_sep)  # value id per slot (separator closes a value)
    enc_lens = np.bincount(vid[body], weights=out_len[body], minlength=n).astype(np.int64)[:n]
    lens_blob = delta_bp.encode(enc_lens, bits=32)
    return (
        len(table_blob).to_bytes(4, "little") + table_blob
        + len(lens_blob).to_bytes(4, "little") + lens_blob
        + out.tobytes()
    )


def decode(buf, count: int, pos: int = 0) -> tuple[np.ndarray, np.ndarray, int]:
    """→ (data uint8, offsets int64, next_pos)."""
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    tlen = int.from_bytes(raw[pos:pos + 4].tobytes(), "little")
    sym_data, sym_off, _ = parse_table(raw[pos + 4:pos + 4 + tlen])
    pos += 4 + tlen
    llen = int.from_bytes(raw[pos:pos + 4].tobytes(), "little")
    pos += 4
    enc_lens, _ = delta_bp.decode(raw[pos:pos + llen], bits=32)
    pos += llen
    enc_lens = enc_lens.astype(np.int64)
    if count == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64), pos
    total_enc = int(enc_lens.sum())
    if total_enc == 0:
        # count > 0 values, all empty strings: no stream bytes at all —
        # the run-start classifier below indexes stream[0] and would
        # IndexError on the size-0 arrays
        return (np.empty(0, dtype=np.uint8),
                np.zeros(count + 1, dtype=np.int64), pos)
    stream = raw[pos:pos + total_enc]
    # classify bytes: escape markers are 255s at even index within a 255-run,
    # runs reset at value boundaries
    enc_off = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(enc_lens, out=enc_off[1:])
    is255 = stream == ESC
    val_start = np.zeros(total_enc, dtype=bool)
    val_start[enc_off[:-1][enc_lens > 0]] = True
    run_start = is255.copy()
    run_start[1:] &= (~is255[:-1]) | val_start[1:]
    run_start[0] = is255[0] if total_enc else False
    # parity within run: index - last run start
    run_id = np.cumsum(run_start)
    # compute index within run for 255 bytes
    idx = np.arange(total_enc)
    start_pos = np.zeros(total_enc, dtype=np.int64)
    rs_positions = np.flatnonzero(run_start)
    if rs_positions.size:
        start_pos = rs_positions[np.maximum(run_id - 1, 0)]
    within = idx - start_pos
    marker = is255 & (run_id > 0) & ((within % 2) == 0)
    literal = np.zeros(total_enc, dtype=bool)
    mpos = np.flatnonzero(marker)
    literal[mpos + 1] = True
    code_byte = ~marker & ~literal
    # output length per stream byte
    sym_lens = np.diff(sym_off)
    out_len = np.zeros(total_enc, dtype=np.int64)
    cb = np.flatnonzero(code_byte)
    out_len[cb] = sym_lens[stream[cb]]
    out_len[literal] = 1
    out_total = int(out_len.sum())
    out = np.empty(out_total, dtype=np.uint8)
    ostarts = np.zeros(total_enc, dtype=np.int64)
    np.cumsum(out_len[:-1], out=ostarts[1:])
    # literals
    lpos = np.flatnonzero(literal)
    out[ostarts[lpos]] = stream[lpos]
    # codes: gather symbol bytes
    from .plain import _ranges_to_indices

    src = _ranges_to_indices(sym_off[stream[cb]], sym_lens[stream[cb]])
    dst = _ranges_to_indices(ostarts[cb], out_len[cb])
    out[dst] = sym_data[src]
    # output offsets per value: sum out_len within each enc segment
    cum = np.zeros(total_enc + 1, dtype=np.int64)
    np.cumsum(out_len, out=cum[1:])
    out_off = cum[enc_off]
    return out, out_off, pos + total_enc
