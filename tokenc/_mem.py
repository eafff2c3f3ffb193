"""Allocator tuning for page-fault-expensive sandboxes.

In this environment, first-touch page faults on fresh mmap'd memory run at
~25 MB/s while warmed pages run at GB/s. glibc hands every large numpy temp
a fresh mmap (cold pages) and unmaps it on free. Raising the mmap/trim
thresholds keeps big allocations on the heap, so freed pages are reused warm.
Executed at `import tokenc`, which also covers Spark's Python UDF workers.

Equivalent env vars (used by bench scripts for full coverage before the
interpreter's first malloc): MALLOC_MMAP_THRESHOLD_ / MALLOC_TRIM_THRESHOLD_.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_M_MMAP_THRESHOLD = -3
_M_TRIM_THRESHOLD = -1


def apply_malloc_tuning() -> bool:
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6", use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, 0x7FFFFFFF)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, 0x7FFFFFFF)
        return bool(ok1 and ok2)
    except Exception:
        return False
