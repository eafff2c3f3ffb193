"""Golden-byte parity with the reference's own test vectors (FIXTURES.md §F2,
derived from /root/reference/encoding/encodingwrite_test.go — format-defined
bytes, so our kernels must reproduce them exactly)."""

from __future__ import annotations

import numpy as np

from tokenc.codecs import bitpack, delta_bp, plain, rle, varint


class TestReferenceVectors:
    def test_varint_sequence(self):
        # encodingwrite_test.go:33-67
        cases = [
            (0x0, b"\x00"),
            (0x7F, b"\x7f"),
            (0x80, b"\x80\x01"),
            (0x2000, b"\x80\x40"),
            (0x3FFF, b"\xff\x7f"),
            (0x4000, b"\x80\x80\x01"),
            (0x1FFFFF, b"\xff\xff\x7f"),
            (0x200000, b"\x80\x80\x80\x01"),
            (0x8000000, b"\x80\x80\x80\x40"),
            (0xFFFFFFF, b"\xff\xff\xff\x7f"),
        ]
        for num, expect in cases:
            assert varint.encode_uvarint(num) == expect, hex(num)

    def test_rle_all_zero_run(self):
        # encodingwrite_test.go:69-85: [0,0,0] at bw 0 → header only
        assert rle.encode(np.zeros(3, np.uint64), 0) == bytes([6])

    def test_rle_single_value(self):
        # [3] at bw 2 → header 2, value byte 3
        assert rle.encode(np.array([3], np.uint64), 2) == bytes([2, 3])

    def test_rle_short_runs(self):
        # [1,2,3,3] at bw 2 → (1×1)(1×2)(2×3) as rle-runs
        got = rle.encode(np.array([1, 2, 3, 3], np.uint64), 2)
        assert got == bytes([2, 1, 2, 2, 4, 3])

    def test_bitpacked_run_with_header(self):
        # encodingwrite_test.go:87-102: [0..7] bw=3 → header 3 + 0x88 0xC6 0xFA
        payload = bitpack.pack(np.arange(8, dtype=np.uint64), 3)
        assert bytes([3]) + payload == bytes([3, 0x88, 0xC6, 0xFA])
        # and the hybrid decoder consumes that exact stream
        out, _ = rle.decode(bytes([3, 0x88, 0xC6, 0xFA]), 3, 8)
        np.testing.assert_array_equal(out, np.arange(8))

    def test_plain_bool_vector(self):
        # encodingwrite_test.go:104-121: [t,f,f,t,f] → 0b01001
        assert plain.encode_bool(np.array([1, 0, 0, 1, 0], bool)) == bytes([9])

    def test_plain_fixed_width(self):
        # encodingwrite_test.go:123-157
        assert plain.encode_numeric(np.array([0, 1, 2], np.int32), "int32") == \
            b"\x00\x00\x00\x00\x01\x00\x00\x00\x02\x00\x00\x00"
        assert plain.encode_numeric(np.array([0, 1, 2], np.int64), "int64") == \
            b"\x00" * 8 + b"\x01" + b"\x00" * 7 + b"\x02" + b"\x00" * 7

    def test_plain_byte_array(self):
        # encodingwrite_test.go:182-197: ["a","abc"]
        strs = [b"a", b"abc"]
        data = np.frombuffer(b"".join(strs), np.uint8)
        offsets = np.array([0, 1, 4], np.int64)
        assert plain.encode_byte_array(data, offsets) == \
            b"\x01\x00\x00\x00a\x03\x00\x00\x00abc"

    def test_delta_int32_monotone(self):
        # encodingwrite_test.go:216-234: [1,2,3,4,5] →
        # 128(block) 4(mb) 5(count) zz(1)=2 | zz(minΔ=1)=2, widths 0,0,0,0
        got = delta_bp.encode(np.arange(1, 6, dtype=np.int64), bits=32)
        assert got == bytes([128, 1, 4, 5, 2, 2, 0, 0, 0, 0])

    def test_delta_int32_mixed(self):
        # [7,5,3,1,2,3,4,5] → header 128,1,4,8,zz(7)=14 | zz(-2)=3,
        # widths 2,0,0,0, payload 0xC0 0x3F + zero padding for the 2-bit block
        got = delta_bp.encode(np.array([7, 5, 3, 1, 2, 3, 4, 5], np.int64), bits=32)
        assert got[:10] == bytes([128, 1, 4, 8, 14, 3, 2, 0, 0, 0])
        assert got[10] == 0xC0 and got[11] == 0x3F
        assert all(b == 0 for b in got[12:])
        out, _ = delta_bp.decode(got, bits=32)
        np.testing.assert_array_equal(out, [7, 5, 3, 1, 2, 3, 4, 5])

    def test_delta_int64_same_bytes(self):
        # encodingwrite_test.go:236-254: int64 path produces identical bytes
        a = delta_bp.encode(np.arange(1, 6, dtype=np.int64), bits=32)
        b = delta_bp.encode(np.arange(1, 6, dtype=np.int64), bits=64)
        assert a == b

    def test_zigzag_negative_int32(self):
        # encodingread_test.go:169-188: zigzag roundtrip of -1570499385
        v = -1570499385
        assert varint.zigzag_decode_scalar(varint.zigzag_encode_scalar(v, 64)) == v
