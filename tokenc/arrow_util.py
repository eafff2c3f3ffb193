"""Shared Arrow construction helpers used by the encode/stat kernels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_I32_MAX = (1 << 31) - 1


def binary_array(data, offsets) -> pa.Array:
    """Zero-validity binary Array over (data uint8, offsets) — offsets are
    used as given (callers pass base-0 chunk-part layouts).

    Picks `binary` (int32 offsets) only when every offset provably fits,
    else `large_binary` (int64): a silent int64→int32 offset cast on a
    >2 GiB chunk wraps into garbage offsets — corrupt dictionaries,
    wrong distinct sets, a wrong sorted flag — with no error anywhere.
    Every site that builds a binary array from chunk parts must go
    through here (the engine caps chunks via target_raw_bytes, but the
    cap is a tuning knob, not a format limit).
    """
    offs = np.ascontiguousarray(np.asarray(offsets), np.int64)
    n = max(offs.size - 1, 0)
    buf = np.ascontiguousarray(np.asarray(data), np.uint8)
    if offs.size == 0 or int(offs[-1]) <= _I32_MAX:
        return pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offs.astype(np.int32)),
             pa.py_buffer(buf)])
    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offs), pa.py_buffer(buf)])
