"""L1 utility tests (model: reference test_crc / bit-reader / AutoBuffer tests,
AmatsukazeTestImpl.hpp:15-105)."""

import random

import pytest

from amatsukaze_tpu.types import (
    CMType,
    EncodeFileKey,
    PictureType,
    VideoFormat,
    presenting_time,
)
from amatsukaze_tpu.utils import BitReader, BitWriter, crc32_mpeg2
from amatsukaze_tpu.utils.bits import EOFError_


class TestCrc:
    def test_known_vector(self):
        # Standard CRC-32/MPEG-2 check value for "123456789"
        assert crc32_mpeg2(b"123456789") == 0x0376E6E7

    def test_involution(self):
        # Appending the CRC of a message makes total CRC == 0
        # (property used by PSI section validation; ref test_crc)
        rng = random.Random(1234)
        for _ in range(16):
            msg = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
            c = crc32_mpeg2(msg)
            assert crc32_mpeg2(msg + c.to_bytes(4, "big")) == 0

    def test_empty(self):
        assert crc32_mpeg2(b"") == 0xFFFFFFFF


class TestBits:
    def test_roundtrip_random(self):
        rng = random.Random(99)
        fields = [(rng.randrange(1 << n), n) for n in rng.choices(range(1, 25), k=200)]
        w = BitWriter()
        for v, n in fields:
            w.write(v, n)
        w.byte_align()
        r = BitReader(w.getvalue())
        for v, n in fields:
            assert r.read(n) == v

    def test_msb_first(self):
        r = BitReader(bytes([0b1010_1100, 0xFF]))
        assert r.read(1) == 1
        assert r.read(3) == 0b010
        assert r.read(4) == 0b1100
        assert r.read(8) == 0xFF

    def test_peek_does_not_advance(self):
        r = BitReader(b"\xAB\xCD")
        assert r.peek(12) == 0xABC
        assert r.read(12) == 0xABC

    def test_eof(self):
        r = BitReader(b"\x00")
        r.read(8)
        with pytest.raises(EOFError_):
            r.read(1)

    def test_exp_golomb(self):
        # ue(v) encodings: 0->1, 1->010, 2->011, 3->00100 ...
        w = BitWriter()
        w.write(0b1, 1)
        w.write(0b010, 3)
        w.write(0b011, 3)
        w.write(0b00100, 5)
        w.byte_align()
        r = BitReader(w.getvalue())
        assert [r.ue() for _ in range(4)] == [0, 1, 2, 3]

    def test_se(self):
        # se(v): k=0 -> 0, k=1 -> 1, k=2 -> -1, k=3 -> 2
        w = BitWriter()
        for bits, n in [(0b1, 1), (0b010, 3), (0b011, 3), (0b00100, 5)]:
            w.write(bits, n)
        w.byte_align()
        r = BitReader(w.getvalue())
        assert [r.se() for _ in range(4)] == [0, 1, -1, 2]


class TestTypes:
    def test_encode_file_key_packing(self):
        # Packing layout must match ref StreamUtils.hpp:557-559
        k = EncodeFileKey(video=3, format=7, div=2, cm=CMType.CM)
        assert k.key() == (3 << 24) | (7 << 14) | (2 << 4) | 2

    def test_presenting_time(self):
        fps = 30000 / 1001
        assert presenting_time(PictureType.FRAME, fps) == pytest.approx(1 / fps)
        assert presenting_time(PictureType.TFF_RFF, fps) == pytest.approx(1.5 / fps)
        assert presenting_time(PictureType.FRAME_TRIPLING, fps) == pytest.approx(3 / fps)

    def test_video_format_dar(self):
        f = VideoFormat(
            width=1440, height=1080, display_width=1440, display_height=1080,
            sar_width=4, sar_height=3, frame_rate_num=30000, frame_rate_denom=1001,
        )
        assert f.get_dar() == (16, 9)

    def test_video_format_equality(self):
        a = VideoFormat(width=1920, height=1080, frame_rate_num=30000,
                        frame_rate_denom=1001, sar_width=1, sar_height=1)
        b = VideoFormat(width=1920, height=1080, frame_rate_num=30000,
                        frame_rate_denom=1001, sar_width=4, sar_height=3)
        assert a.is_basic_equals(b)
        assert a != b

    def test_mul_div_fps(self):
        f = VideoFormat(frame_rate_num=30000, frame_rate_denom=1001)
        f.mul_div_fps(2, 1)
        assert (f.frame_rate_num, f.frame_rate_denom) == (60000, 1001)
