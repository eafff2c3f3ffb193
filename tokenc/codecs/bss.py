"""BYTE_STREAM_SPLIT: transpose value bytes into k planes (SoA).

Reference scalar loop: /root/reference/encoding/encodingwrite.go:504-554.
Pairs well with downstream block compression for float/double columns
(e.g. embeddings): exponent/sign bytes land together and compress hard.
"""

from __future__ import annotations

import numpy as np

_WIDTH = {"float": 4, "double": 8}
_DTYPE = {"float": "<f4", "double": "<f8"}


def encode(vals: np.ndarray, phys: str) -> bytes:
    k = _WIDTH[phys]
    a = np.ascontiguousarray(vals, dtype=_DTYPE[phys])
    return a.view(np.uint8).reshape(-1, k).T.tobytes()


def decode(buf, phys: str, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    k = _WIDTH[phys]
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    total = count * k
    planes = raw[pos:pos + total].reshape(k, count)
    interleaved = np.ascontiguousarray(planes.T).reshape(-1)
    return interleaved.view(_DTYPE[phys]).copy(), pos + total
