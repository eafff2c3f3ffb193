"""Codec registry.

Codec ids are stable (persisted in chunk headers):
    0 PLAIN
    1 RLE              (RLE/bit-packed hybrid over raw small ints)
    2 DELTA_BP         (DELTA_BINARY_PACKED: frame-of-reference + delta)
    3 DICT             (dictionary + RLE/bit-packed codes)
    4 FSST             (symbol-table compression, byte arrays)
    5 DLBA             (DELTA_LENGTH_BYTE_ARRAY)
    6 DBA              (DELTA_BYTE_ARRAY, front coding)
    7 BSS              (BYTE_STREAM_SPLIT, float/double)
    8 FOR              (frame-of-reference: min + byte-aligned residuals)
    9 RLES             (run-length, structure-of-arrays: FOR lens + FOR values)

Physical types: int32 int64 float double byte_array bool
(reference enum: /root/reference/parquet/parquet.go Type; mapping table
SURVEY.md §1.2).
"""

from . import bitpack, bss, delta_ba, delta_bp, dict_codec, for_bp, fsst, plain, rle, rle_soa, varint  # noqa: F401

PLAIN = 0
RLE = 1
DELTA_BP = 2
DICT = 3
FSST = 4
DLBA = 5
DBA = 6
BSS = 7
FOR = 8
RLES = 9

CODEC_NAMES = {
    PLAIN: "plain",
    RLE: "rle",
    DELTA_BP: "delta_bp",
    DICT: "dict",
    FSST: "fsst",
    DLBA: "dlba",
    DBA: "dba",
    BSS: "bss",
    FOR: "for",
    RLES: "rles",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}

PHYS_INT32 = 0
PHYS_INT64 = 1
PHYS_FLOAT = 2
PHYS_DOUBLE = 3
PHYS_BYTE_ARRAY = 4
PHYS_BOOL = 5

PHYS_NAMES = {
    PHYS_INT32: "int32",
    PHYS_INT64: "int64",
    PHYS_FLOAT: "float",
    PHYS_DOUBLE: "double",
    PHYS_BYTE_ARRAY: "byte_array",
    PHYS_BOOL: "bool",
}
PHYS_IDS = {v: k for k, v in PHYS_NAMES.items()}
