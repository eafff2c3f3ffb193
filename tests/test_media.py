"""Pure-python media decoders (tokenc/pipeline/multimodal.py): golden
byte fixtures hand-assembled from the public format specs (netpbm P6,
Windows BMP 24-bpp BI_RGB, RIFF/WAVE PCM16), plus encode→decode
roundtrips including the layout traps (BMP row padding + bottom-up +
BGR, PPM header comments, WAV chunk walking + odd-chunk padding)."""

from __future__ import annotations

import numpy as np
import pytest

from tokenc.pipeline.multimodal import (_audio_samples, _image_pixels,
                                        decode_bmp, decode_media,
                                        decode_ppm, decode_wav, encode_bmp,
                                        encode_ppm, encode_wav, media_dims)


class TestPpmGolden:
    def test_golden_2x2(self):
        # P6, 2 wide 1..2 high, raster row-major RGB triplets
        raw = b"P6\n2 2\n255\n" + bytes(
            [255, 0, 0,   0, 255, 0,     # row 0: red, green
             0, 0, 255,   9, 8, 7])      # row 1: blue, (9,8,7)
        px = decode_ppm(raw)
        assert px.shape == (2, 2, 3)
        assert px[0, 0].tolist() == [255, 0, 0]
        assert px[0, 1].tolist() == [0, 255, 0]
        assert px[1, 0].tolist() == [0, 0, 255]
        assert px[1, 1].tolist() == [9, 8, 7]

    def test_header_comments_and_whitespace(self):
        raw = (b"P6 # inline comment\n# full line\n  2\t1 # dims\n255\n"
               + bytes([1, 2, 3, 4, 5, 6]))
        px = decode_ppm(raw)
        assert px.shape == (1, 2, 3)
        assert px[0, 1].tolist() == [4, 5, 6]

    def test_rejects_wrong_magic_and_maxval(self):
        with pytest.raises(ValueError):
            decode_ppm(b"P5\n1 1\n255\n\x00")
        with pytest.raises(NotImplementedError):
            decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)

    def test_roundtrip(self):
        px = _image_pixels(11, 7, 5)
        assert decode_ppm(encode_ppm(px)).tolist() == px.tolist()


class TestBmpGolden:
    def test_golden_2x2_hand_layout(self):
        """Hand-assembled: 2x2, stride = (3*2+3)//4*4 = 8 (2 pad bytes),
        rows bottom-up, pixels BGR."""
        w = h = 2
        stride = 8
        hdr = (b"BM" + (54 + h * stride).to_bytes(4, "little")
               + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
               + (40).to_bytes(4, "little")
               + w.to_bytes(4, "little") + h.to_bytes(4, "little")
               + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
               + (0).to_bytes(4, "little")
               + (h * stride).to_bytes(4, "little")
               + (0).to_bytes(4, "little") * 4)
        # file rows bottom-up: first stored row is IMAGE row 1
        row1 = bytes([255, 0, 0,  0, 255, 0]) + b"\x00\x00"  # blue, green (BGR)
        row0 = bytes([0, 0, 255,  7, 8, 9]) + b"\x00\x00"    # red, (9,8,7)
        px = decode_bmp(hdr + row1 + row0)
        assert px.shape == (2, 2, 3)
        assert px[0, 0].tolist() == [255, 0, 0]   # red (RGB out)
        assert px[0, 1].tolist() == [9, 8, 7]
        assert px[1, 0].tolist() == [0, 0, 255]   # blue
        assert px[1, 1].tolist() == [0, 255, 0]   # green

    def test_rejects_unsupported(self):
        with pytest.raises(ValueError):
            decode_bmp(b"XX" + b"\x00" * 60)
        bad = bytearray(encode_bmp(_image_pixels(1, 2, 2)))
        bad[28:30] = (8).to_bytes(2, "little")    # 8 bpp
        with pytest.raises(NotImplementedError):
            decode_bmp(bytes(bad))

    @pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (4, 4), (5, 7), (12, 14)])
    def test_roundtrip_padding_matrix(self, w, h):
        """Every stride-mod-4 case: 3w % 4 ∈ {0,1,2,3}."""
        px = _image_pixels(w * 17 + h, w, h)
        got = decode_bmp(encode_bmp(px))
        assert got.tolist() == px.tolist()


class TestWavGolden:
    def test_golden_hand_layout(self):
        samples = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
        data = samples.astype("<i2").tobytes()
        raw = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
               + b"fmt " + (16).to_bytes(4, "little")
               + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
               + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
               + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
               + b"data" + len(data).to_bytes(4, "little") + data)
        got, rate = decode_wav(raw)
        assert rate == 8000
        assert got.tolist() == samples.tolist()

    def test_chunk_walk_with_extra_odd_chunk(self):
        """A 3-byte LIST chunk before fmt/data: chunks pad to even, so a
        naive fixed-offset reader breaks and a correct walker doesn't."""
        samples = np.array([5, -5, 7], dtype=np.int16)
        data = samples.astype("<i2").tobytes()
        raw = (b"RIFF" + (4 + 8 + 4 + 8 + 16 + 8 + len(data))
               .to_bytes(4, "little") + b"WAVE"
               + b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"  # pad
               + b"fmt " + (16).to_bytes(4, "little")
               + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
               + (16000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
               + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
               + b"data" + len(data).to_bytes(4, "little") + data)
        got, rate = decode_wav(raw)
        assert got.tolist() == samples.tolist()

    def test_rejects_non_pcm(self):
        raw = bytearray(encode_wav(np.array([1, 2], dtype=np.int16)))
        raw[20:22] = (3).to_bytes(2, "little")    # IEEE float fmt tag
        with pytest.raises(NotImplementedError):
            decode_wav(bytes(raw))
        with pytest.raises(ValueError):
            decode_wav(b"RIFX" + b"\x00" * 40)

    def test_stereo_reshape(self):
        inter = np.array([1, -1, 2, -2], dtype=np.int16)
        data = inter.astype("<i2").tobytes()
        raw = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
               + b"fmt " + (16).to_bytes(4, "little")
               + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
               + (8000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
               + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
               + b"data" + len(data).to_bytes(4, "little") + data)
        got, _ = decode_wav(raw)
        assert got.shape == (2, 2)
        assert got[1].tolist() == [2, -2]

    def test_roundtrip(self):
        s = _audio_samples(9, 300)
        got, rate = decode_wav(encode_wav(s, rate=16000))
        assert rate == 16000
        assert got.tolist() == s.tolist()


class TestDecodeMedia:
    def test_dispatch_and_unknown(self):
        px = _image_pixels(4, 9, 6)
        assert decode_media(encode_ppm(px), "ppm").tolist() == \
            px.reshape(-1).tolist()
        assert decode_media(encode_bmp(px), "bmp").tolist() == \
            px.reshape(-1).tolist()
        s = _audio_samples(3, 64)
        assert decode_media(encode_wav(s), "wav").tolist() == s.tolist()
        with pytest.raises(NotImplementedError):
            decode_media(b"", "jpeg")

    def test_media_dims_formula_stays_small(self):
        for i in range(64):
            w, h, ns = media_dims(i)
            assert 8 <= w <= 12 and 8 <= h <= 14 and 256 <= ns <= 767
