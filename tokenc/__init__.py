"""tokenc — a PySpark-native per-column lightweight-compression engine.

Built from scratch against the *behavior* of xitongsys/parquet-go's encoding
layer (see SURVEY.md): PLAIN, RLE/bit-packed hybrid, DELTA_BINARY_PACKED
(frame-of-reference + delta), dictionary, DELTA_(LENGTH_)BYTE_ARRAY,
BYTE_STREAM_SPLIT — plus an FSST-style symbol-table codec and a per-chunk
codec auto-selector that the reference leaves to manual tags
(reference: common/common.go:221-275, layout/page.go:167-191).

All kernels are vectorized numpy/pyarrow; the Spark integration runs them
inside Arrow-batched ``mapInPandas`` (no per-row Python).
"""

from tokenc._mem import apply_malloc_tuning as _apply_malloc_tuning

_apply_malloc_tuning()

__version__ = "0.1.0"
