"""Chunk container + selector tests: roundtrip with nulls/lists, stats, auto-pick."""

from __future__ import annotations

import numpy as np
import pytest

from tokenc import codecs, selector
from tokenc.chunk import ChunkStats, decode_chunk, encode_chunk


class TestChunkRoundtrip:
    def test_int32_plain_with_nulls(self):
        rng = np.random.default_rng(0)
        validity = rng.random(1000) > 0.1
        values = rng.integers(-5000, 5000, int(validity.sum()), dtype=np.int32)
        blob, st = encode_chunk(phys=codecs.PHYS_INT32, codec=codecs.PLAIN,
                                n_rows=1000, values=values, validity=validity)
        out = decode_chunk(blob)
        np.testing.assert_array_equal(out.values, values)
        np.testing.assert_array_equal(out.validity, validity)
        assert st.null_count == int((~validity).sum())
        assert st.min_val == values.min() and st.max_val == values.max()

    def test_tokens_list_chunk(self):
        """The flagship shape: tokens array<int32> with null and empty lists."""
        rng = np.random.default_rng(1)
        n_rows = 500
        validity = np.ones(n_rows, dtype=bool)
        validity[[3, 77, 400]] = False
        lengths = rng.integers(0, 90, int(validity.sum())).astype(np.int64)
        lengths[5] = 0  # empty list, distinct from null
        tokens = rng.integers(0, 50000, int(lengths.sum()), dtype=np.int32)
        blob, st = encode_chunk(phys=codecs.PHYS_INT32, codec=codecs.DELTA_BP,
                                n_rows=n_rows, values=tokens, validity=validity,
                                list_lengths=lengths)
        out = decode_chunk(blob)
        np.testing.assert_array_equal(out.values, tokens)
        np.testing.assert_array_equal(out.list_lengths, lengths)
        np.testing.assert_array_equal(out.validity, validity)
        assert st.n_values == tokens.size and st.n_rows == n_rows

    @pytest.mark.parametrize("codec", [codecs.PLAIN, codecs.DICT, codecs.FSST, codecs.DLBA, codecs.DBA])
    def test_byte_array_codecs(self, codec):
        strs = [f"doc_{i % 100:05d}".encode() for i in range(800)]
        data = np.frombuffer(b"".join(strs), np.uint8)
        offsets = np.cumsum([0] + [len(s) for s in strs]).astype(np.int64)
        blob, st = encode_chunk(phys=codecs.PHYS_BYTE_ARRAY, codec=codec,
                                n_rows=800, ba_data=data, ba_offsets=offsets)
        out = decode_chunk(blob)
        np.testing.assert_array_equal(out.ba_data, data)
        np.testing.assert_array_equal(out.ba_offsets, offsets)
        assert st.min_val == b"doc_00000"

    @pytest.mark.parametrize("phys,codec,dtype", [
        (codecs.PHYS_INT64, codecs.DELTA_BP, np.int64),
        (codecs.PHYS_INT64, codecs.DICT, np.int64),
        (codecs.PHYS_DOUBLE, codecs.BSS, np.float64),
        (codecs.PHYS_FLOAT, codecs.BSS, np.float32),
        (codecs.PHYS_INT32, codecs.RLE, np.int32),
        (codecs.PHYS_INT32, codecs.RLES, np.int32),
        (codecs.PHYS_INT64, codecs.RLES, np.int64),
    ])
    def test_numeric_codecs(self, phys, codec, dtype):
        rng = np.random.default_rng(2)
        if codec == codecs.RLE:
            values = np.repeat(rng.integers(0, 100, 50), 20).astype(dtype)
        elif codec == codecs.RLES:
            # mixed run lengths incl. singletons and negatives (span-based
            # FOR needs no non-negativity, unlike the hybrid)
            values = np.repeat(rng.integers(-500, 500, 200),
                               rng.integers(1, 30, 200)).astype(dtype)
        else:
            values = rng.integers(-1000, 1000, 1000).astype(dtype)
        blob, _ = encode_chunk(phys=phys, codec=codec, n_rows=values.size, values=values)
        out = decode_chunk(blob)
        np.testing.assert_array_equal(out.values, values)
        assert out.values.dtype == dtype

    def test_bool(self):
        vals = np.array([True, False] * 250)
        blob, _ = encode_chunk(phys=codecs.PHYS_BOOL, codec=codecs.RLE, n_rows=500, values=vals)
        np.testing.assert_array_equal(decode_chunk(blob).values, vals)


class TestSelector:
    def test_monotone_ints_pick_delta(self):
        vals = np.arange(100_000, dtype=np.int64) * 3 + 7
        assert selector.choose(codecs.PHYS_INT64, values=vals) == codecs.DELTA_BP

    def test_low_card_pick_dict(self):
        rng = np.random.default_rng(3)
        vals = rng.choice(np.array([10**9, 2 * 10**9, -5], np.int64), 50_000)
        assert selector.choose(codecs.PHYS_INT64, values=vals) == codecs.DICT

    def test_long_runs_pick_rle_or_dict(self):
        vals = np.repeat(np.arange(50, dtype=np.int32), 1000)
        pick = selector.choose(codecs.PHYS_INT32, values=vals)
        assert pick in (codecs.RLE, codecs.RLES, codecs.DICT, codecs.DELTA_BP)
        # whatever it picks must be tiny when encoded
        from tokenc.chunk import encode_chunk
        blob, st = encode_chunk(phys=codecs.PHYS_INT32, codec=pick,
                                n_rows=vals.size, values=vals)
        assert st.enc_bytes < st.raw_bytes / 50

    def test_random_floats_pick_bss(self):
        rng = np.random.default_rng(4)
        vals = rng.standard_normal(10_000).astype(np.float32)
        assert selector.choose(codecs.PHYS_FLOAT, values=vals) == codecs.BSS

    def test_low_card_strings_pick_dict_or_measured_winner(self):
        """Low-cardinality strings shortlist DICT; the measured refinement
        may keep PLAIN instead when raw-bytes+container compresses smaller
        (the artifact's final size is the selection criterion)."""
        strs = [f"src{i % 20}".encode() for i in range(5000)]
        data = np.frombuffer(b"".join(strs), np.uint8)
        offsets = np.cumsum([0] + [len(s) for s in strs]).astype(np.int64)
        pick = selector.choose(codecs.PHYS_BYTE_ARRAY, ba_data=data,
                               ba_offsets=offsets)
        assert pick in (codecs.DICT, codecs.PLAIN)

    def test_sequential_ids_pick_dba(self):
        strs = [f"document-id-{i:09d}".encode() for i in range(5000)]
        data = np.frombuffer(b"".join(strs), np.uint8)
        offsets = np.cumsum([0] + [len(s) for s in strs]).astype(np.int64)
        assert selector.choose(codecs.PHYS_BYTE_ARRAY, ba_data=data, ba_offsets=offsets) == codecs.DBA

    def test_texty_strings_pick_fsst(self):
        rng = np.random.default_rng(5)
        words = ["the", "quick", "brown", "fox", "jumps", "data", "spark"]
        strs = [(" ".join(rng.choice(words, 12).tolist())).encode() for _ in range(2000)]
        data = np.frombuffer(b"".join(strs), np.uint8)
        offsets = np.cumsum([0] + [len(s) for s in strs]).astype(np.int64)
        pick = selector.choose(codecs.PHYS_BYTE_ARRAY, ba_data=data, ba_offsets=offsets)
        assert pick == codecs.FSST

    def test_every_pick_roundtrips_smaller(self):
        """Auto-picked codec must beat PLAIN on codec-friendly data."""
        rng = np.random.default_rng(6)
        cases = [
            (codecs.PHYS_INT32, np.cumsum(rng.integers(0, 5, 20000)).astype(np.int32)),
            (codecs.PHYS_INT64, rng.choice(np.arange(10, dtype=np.int64), 20000)),
        ]
        for phys, vals in cases:
            pick = selector.choose(phys, values=vals)
            blob, st = encode_chunk(phys=phys, codec=pick, n_rows=vals.size, values=vals)
            out = decode_chunk(blob)
            np.testing.assert_array_equal(out.values, vals)
            assert st.enc_bytes < st.raw_bytes


class TestBlockCompression:
    """Reference compress/ registry parity (compress/compress.go:8-30,
    gzip_test.go:9-21, lz4_raw_test.go): roundtrip through every backend."""

    @pytest.mark.parametrize("comp", ["gzip", "snappy", "zstd", "lz4",
                                      "lz4_raw", "brotli"])
    def test_numeric_roundtrip(self, comp):
        from tokenc import compress as cmod
        if not cmod.available(comp):
            pytest.skip(f"{comp} not available")
        values = np.repeat(np.arange(200, dtype=np.int32), 50)
        blob, st = encode_chunk(phys=codecs.PHYS_INT32, codec=codecs.PLAIN,
                                n_rows=values.size, values=values,
                                compression=comp)
        raw_blob, _ = encode_chunk(phys=codecs.PHYS_INT32, codec=codecs.PLAIN,
                                   n_rows=values.size, values=values)
        assert len(blob) < len(raw_blob)
        out = decode_chunk(blob)
        np.testing.assert_array_equal(out.values, values)

    def test_lz4_is_frame_format(self):
        """Reference LZ4 parity: the LZ4 codec emits LZ4 FRAME streams
        (pierrec lz4.Writer, compress/lz4.go:21 — frame magic 0x184D2204),
        distinct from lz4_raw blocks (compress/lz4_raw.go:15)."""
        from tokenc import compress as cmod
        if not cmod.available("lz4"):
            pytest.skip("lz4 not available")
        payload = bytes(range(256)) * 64
        framed = cmod.compress(payload, cmod.LZ4)
        # section layout: u8 comp_id | u32 raw_len | body
        assert framed[0] == cmod.LZ4
        assert framed[5:9] == bytes.fromhex("04224d18")  # LZ4 frame magic
        assert cmod.decompress(framed) == payload
        raw = cmod.compress(payload, cmod.LZ4_RAW)
        assert raw[5:9] != bytes.fromhex("04224d18")
        assert cmod.decompress(raw) == payload

    @pytest.mark.parametrize("comp", ["gzip", "zstd"])
    def test_byte_array_roundtrip(self, comp):
        strs = [f"document-{i % 37:06d}".encode() for i in range(2000)]
        data = np.frombuffer(b"".join(strs), np.uint8)
        offsets = np.cumsum([0] + [len(s) for s in strs]).astype(np.int64)
        blob, _ = encode_chunk(phys=codecs.PHYS_BYTE_ARRAY, codec=codecs.PLAIN,
                               n_rows=2000, ba_data=data, ba_offsets=offsets,
                               compression=comp)
        out = decode_chunk(blob)
        np.testing.assert_array_equal(out.ba_data, data)
        np.testing.assert_array_equal(out.ba_offsets, offsets)

    def test_incompressible_stays_uncompressed(self):
        """compress-only-if-smaller: random bytes keep the plain payload."""
        rng = np.random.default_rng(7)
        values = rng.integers(-2**31, 2**31 - 1, 4096, dtype=np.int64).astype(np.int32)
        blob, _ = encode_chunk(phys=codecs.PHYS_INT32, codec=codecs.PLAIN,
                               n_rows=values.size, values=values,
                               compression="zstd")
        from tokenc.chunk import F_COMPRESSED
        assert not (blob[7] & F_COMPRESSED)  # flags byte: header offset 7
        out = decode_chunk(blob)
        np.testing.assert_array_equal(out.values, values)

    def test_section_framing(self):
        from tokenc import compress as cmod
        payload = bytes(range(256)) * 100
        for name, cid in cmod.COMP_IDS.items():
            if not cmod.available(name):
                continue
            assert cmod.decompress(cmod.compress(payload, cid)) == payload


class TestCorruptedBlobs:
    """Decoder robustness: every malformed input gets a clear ValueError."""

    def _blob(self):
        vals = np.arange(1000, dtype=np.int32)
        blob, _ = encode_chunk(phys=codecs.PHYS_INT32, codec=codecs.DELTA_BP,
                               n_rows=1000, values=vals)
        return blob

    def test_garbage(self):
        with pytest.raises(ValueError, match="bad chunk magic|truncated"):
            decode_chunk(b"nonsense")

    @pytest.mark.parametrize("cut", [0, 5, 19, 20, 30])
    def test_truncation(self, cut):
        with pytest.raises(ValueError, match="truncated"):
            decode_chunk(self._blob()[:cut])

    def test_unknown_codec_and_version(self):
        blob = self._blob()
        with pytest.raises(ValueError, match="codec 99 unsupported"):
            decode_chunk(blob[:5] + bytes([99]) + blob[6:])
        with pytest.raises(ValueError, match="unsupported chunk version"):
            decode_chunk(blob[:4] + bytes([9]) + blob[5:])


class TestMeasuredBinaryRefinement:
    """choose_binary measures the shortlisted codecs under the container
    block codec (like the numeric path) — the pick's FINAL size must be
    minimal among all binary candidates on each fixture."""

    def _final_size(self, codec, data, offsets, container="zstd"):
        import pyarrow as pa

        from tokenc.chunk import _encode_payload

        try:
            payload = _encode_payload(codec, codecs.PHYS_BYTE_ARRAY,
                                      None, data, offsets)
        except Exception:
            return float("inf")
        return min(len(payload), len(pa.Codec(container).compress(payload)) + 16)

    def _fixtures(self):
        import numpy as np
        rng = np.random.default_rng(11)
        out = {}

        def mk(strings):
            b = b"".join(strings)
            off = np.zeros(len(strings) + 1, np.int64)
            np.cumsum([len(s) for s in strings], out=off[1:])
            return np.frombuffer(b, np.uint8), off

        out["hex_ids"] = mk([bytes(rng.integers(97, 103, 16, dtype=np.uint8))
                             for _ in range(4000)])
        out["texty"] = mk([(b"the quick brown fox %d " % i) * (i % 3 + 1)
                           for i in range(4000)])
        out["seq_keys"] = mk([b"user-%09d" % i for i in range(4000)])
        out["low_card"] = mk([[b"alpha", b"beta", b"gamma"][i % 3]
                              for i in range(4000)])
        return out

    def test_pick_is_final_size_minimal(self):
        cands = [codecs.PLAIN, codecs.DICT, codecs.FSST, codecs.DLBA,
                 codecs.DBA]
        for name, (data, off) in self._fixtures().items():
            pick = selector.choose_binary(data, off)
            sizes = {c: self._final_size(c, data, off) for c in cands}
            best = min(sizes.values())
            # within 5% of the true optimum (model may exclude a candidate
            # from the shortlist only when it is clearly worse)
            assert sizes[pick] <= best * 1.05, (name, pick, sizes)

    def test_memo_stability(self):
        data, off = self._fixtures()["seq_keys"]
        cache = {}
        p1 = selector.choose_binary(data, off, cache=cache, key="k")
        p2 = selector.choose_binary(data, off, cache=cache, key="k")
        assert p1 == p2 and len(cache) == 1


class TestByteArrayStatBounds:
    """Chunk-level byte-array min/max must be SOUND bounds: exact for
    short values, covering (never narrowing) under the 64-byte cap.
    Regressions: the old 64-byte zero-padded lexsort conflated b"ab"
    with b"ab\\x00x" (exact-looking WRONG bound → false prune), and a
    silently truncated max understated values longer than the cap."""

    @staticmethod
    def _stats(vals: list[bytes]):
        data = np.frombuffer(b"".join(vals), np.uint8)
        off = np.cumsum([0] + [len(v) for v in vals]).astype(np.int64)
        _, st = encode_chunk(phys=codecs.PHYS_BYTE_ARRAY, codec=codecs.PLAIN,
                             n_rows=len(vals), ba_data=data, ba_offsets=off)
        return st.min_val, st.max_val

    @staticmethod
    def _invalid_utf8(v: bytes) -> bool:
        try:
            v.decode("utf-8")
            return False
        except UnicodeDecodeError:
            return True

    def test_nul_prefix_tie_exact(self):
        # b"ab" < b"ab\x00x"; zero-padding made them indistinguishable
        mn, mx = self._stats([b"ab\x00x", b"ab"])
        assert mn == b"ab"
        assert mx == b"ab\x00x"
        mn, mx = self._stats([b"ab", b"ab\x00x"])  # either input order
        assert mn == b"ab" and mx == b"ab\x00x"

    def test_short_values_exact(self):
        vals = [f"doc-{i:04d}".encode() for i in (7, 3, 9, 3)]
        mn, mx = self._stats(vals)
        assert mn == b"doc-0003" and mx == b"doc-0009"

    def test_long_max_is_covering(self):
        from tokenc.chunk import STAT_BA_CAP

        big = b"a" * 100 + b"zz"
        mn, mx = self._stats([b"a" * 100, big, b"a"])
        assert mn == b"a"  # short min stays exact
        # widened ASCII upper bound: still >= every value, <= cap bytes
        assert mx is not None and len(mx) <= STAT_BA_CAP
        assert mx >= big
        assert mx == b"a" * 63 + b"b"

    def test_long_min_truncates_on_char_boundary(self):
        from tokenc.chunk import STAT_BA_CAP

        # é = 2 bytes; place one straddling the 64-byte cut
        v = b"x" * 63 + "é".encode() + b"tail"
        mn, mx = self._stats([v, b"zz"])
        assert mn == b"x" * 63  # mid-char cut backed off the lead byte
        assert mn <= v
        assert mx == b"zz"

    def test_non_utf8_chunk_stores_no_stats(self):
        # raw binary (invalid UTF-8): no sound bound exists in the
        # utf-8-replace string space downstream compares in → no stats
        mn, mx = self._stats([b"\xff" * 80, b"q"])
        assert mn is None and mx is None
        mn, mx = self._stats([b"\x81", b"\x80\x00"])  # replace() reorders
        assert mn is None and mx is None

    def test_unwidenable_max_stores_none(self):
        # valid UTF-8 whose 64-byte ASCII prefix is empty → max unbounded
        v = ("é" * 40).encode()  # 80 bytes, no ASCII byte to bump
        mn, mx = self._stats([v, v[:10]])
        assert mn == v[:10]
        assert mx is None  # no sound 64-byte ASCII bound exists → no stat

    def test_upper_bound_helper_ascii_region_only(self):
        from tokenc.chunk import _ba_upper_bound

        # non-ASCII byte before any incrementable ASCII byte → None
        assert _ba_upper_bound(b"\xc3\xa9" + b"a" * 70, cap=64) is None
        # increment happens at the LAST ascii byte below 0x7f
        assert _ba_upper_bound(b"ab\x7fq" + b"x" * 70, cap=64) \
            == b"ab\x7fqx" + b"x" * 58 + b"y"

    def test_stat_bounds_sound_property(self):
        """Hypothesis: for ANY byte values (NULs, long values, empty),
        the stored chunk stats are covering bounds — min ≤ every value,
        max ≥ every value (or max is None), in BOTH the raw byte order
        and the utf-8-replace string order downstream compares in."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=120, deadline=None)
        @given(st.lists(st.binary(min_size=0, max_size=90), min_size=1,
                        max_size=40))
        def prop(vals):
            mn, mx = self._stats(vals)
            svals = [v.decode("utf-8", "replace") for v in vals]
            if mn is not None:
                assert all(mn <= v for v in vals)
                smn = mn.decode("utf-8", "replace")
                assert all(smn <= s for s in svals)
            else:
                # stats are only ever dropped for non-UTF-8 chunks
                assert any(self._invalid_utf8(v) for v in vals)
            if mx is not None:
                assert all(mx >= v for v in vals)
                smx = mx.decode("utf-8", "replace")
                assert all(smx >= s for s in svals)

        prop()
