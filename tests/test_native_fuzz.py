"""Differential fuzzing of the native parsers against the Python oracles.

The native engines consume untrusted broadcast data; the invariants are
(a) never crash, (b) the AAC decoder agrees with the pure-Python oracle on
accept/reject and on all metadata whenever both accept. Seeds are fixed so
failures reproduce."""

import numpy as np
import pytest

import aac_gen
import mpeg2_gen as G
from amatsukaze_tpu.audio.aac import AacLcDecoder
from amatsukaze_tpu.audio.aac_native import (
    NativeAacDecoder,
    native_available as aac_native,
)
from amatsukaze_tpu.ts.qp_extract import (
    NativeQpExtractor,
    SliceQpExtractor,
    native_available as qp_native,
)
from amatsukaze_tpu.utils.bits import BitWriter

pytestmark = pytest.mark.skipif(not (aac_native() and qp_native()),
                                reason="native library not buildable")

N = 400  # per case class; full sweeps of 3000x ran clean before commit


def _agree(py_res, nat_res):
    assert (py_res is None) == (nat_res is None)
    if py_res is not None:
        assert py_res.elements == nat_res.elements
        assert py_res.element_bits == nat_res.element_bits
        pa = np.frombuffer(py_res.pcm, "<i2").astype(np.int32)
        pb = np.frombuffer(nat_res.pcm, "<i2").astype(np.int32)
        assert np.abs(pa - pb).max() <= 1


class TestAacFuzz:
    def test_random_garbage(self):
        rng = np.random.default_rng(42)
        py, nat = AacLcDecoder(), NativeAacDecoder()
        for _ in range(N):
            buf = bytes(rng.integers(0, 256, int(rng.integers(0, 400)),
                                     dtype=np.uint8))
            _agree(py.decode(buf), nat.decode(buf))

    def test_valid_header_garbage_payload(self):
        rng = np.random.default_rng(43)
        py, nat = AacLcDecoder(), NativeAacDecoder()
        for _ in range(N):
            n = int(rng.integers(7, 300))
            h = BitWriter()
            h.write(0xFFF, 12); h.write(1, 1); h.write(0, 2); h.write(1, 1)
            h.write(1, 2); h.write(int(rng.integers(0, 13)), 4); h.write(0, 1)
            h.write(int(rng.integers(0, 8)), 3); h.write(0, 4)
            h.write(7 + n, 13); h.write(0x7FF, 11); h.write(0, 2)
            buf = h.getvalue() + bytes(rng.integers(0, 256, n,
                                                    dtype=np.uint8))
            _agree(py.decode(buf), nat.decode(buf))

    def test_bitflipped_valid_frames(self):
        rng = np.random.default_rng(44)
        swb = aac_gen.T.SWB_OFFSETS[(1024, 48000)]

        def bands():
            return {s: [int(v) for v in rng.integers(
                -9, 10, swb[s + 1] - swb[s])] for s in range(30)}

        base = aac_gen.make_adts_frame(
            lambda w: aac_gen.make_cpe(w, bands(), bands(), 150),
            channel_config=2)
        py, nat = AacLcDecoder(), NativeAacDecoder()
        for _ in range(N):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 5))):
                buf[int(rng.integers(7, len(buf)))] ^= \
                    1 << int(rng.integers(0, 8))
            a, b = py.decode(bytes(buf)), nat.decode(bytes(buf))
            # PCM may legitimately differ >1 LSB when a flip lands in
            # float-sensitive spectral data both decoders accept, but
            # accept/reject and metadata must agree
            assert (a is None) == (b is None)
            if a is not None:
                assert a.elements == b.elements
                assert a.element_bits == b.element_bits


class TestQpFuzz:
    def test_never_crashes(self):
        rng = np.random.default_rng(45)
        nat, sl = NativeQpExtractor(), SliceQpExtractor()
        base = G.simple_picture(96, 64, 1, [8, 12, 20, 30], {(1, 2): 16})
        for _ in range(N):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(0, len(buf)))] ^= \
                    1 << int(rng.integers(0, 8))
            nat.parse_picture(bytes(buf))
            sl.parse_picture(bytes(buf))
        for _ in range(N):
            buf = bytes(rng.integers(0, 256, int(rng.integers(0, 500)),
                                     dtype=np.uint8))
            nat.parse_picture(buf)
            sl.parse_picture(buf)


class TestH264Fuzz:
    """The native H.264 engine must survive arbitrary corruption (bit
    flips, truncation, garbage blocks) without crashing — errors are
    counted and decoding continues.  Valid streams stay bit-exact vs the
    oracle (tests/test_h264_native.py); a broader mutation sweep runs
    under ASAN+UBSAN before commits (1000s of iterations clean)."""

    def _base_stream(self, interlaced=False, cabac=True):
        from amatsukaze_tpu.video.avdec import avdec_available
        if not avdec_available():
            pytest.skip("FFmpeg bridge unavailable")
        from test_h264_decode import _motion_frames, _x264_stream
        params = (f"cabac={1 if cabac else 0}:8x8dct=1:keyint=4:"
                  "scenecut=0:b-adapt=0:qp=26")
        if interlaced:
            from test_h264_mbaff import mixed_frames
            frames = mixed_frames(4, (96, 96))
            params += ":interlaced=1:tff=1"
        else:
            frames = _motion_frames(4, (96, 96))
        return _x264_stream(96, 96, frames, params, bframes=2)

    def _hammer(self, base: bytes, seed: int, n=60):
        from amatsukaze_tpu.video.native import (NativeH264Decoder,
                                                 h264_native_available)
        if not h264_native_available():
            pytest.skip("native H.264 engine unavailable")
        rng = np.random.default_rng(seed)
        for it in range(n):
            buf = bytearray(base)
            mode = it % 3
            if mode == 0:
                for _ in range(int(rng.integers(1, 12))):
                    buf[int(rng.integers(0, len(buf)))] ^= 1 << int(
                        rng.integers(0, 8))
            elif mode == 1:
                buf = buf[: int(rng.integers(1, len(buf)))]
            else:
                off = int(rng.integers(0, len(buf)))
                ln = int(min(len(buf) - off, rng.integers(0, 256)))
                buf[off : off + ln] = bytes(
                    rng.integers(0, 256, ln, dtype=np.uint8))
            dec = NativeH264Decoder()
            dec.decode(bytes(buf))
            dec.flush()  # must not crash; errors may be counted

    def test_progressive_cabac(self):
        self._hammer(self._base_stream(), 101)

    def test_progressive_cavlc(self):
        self._hammer(self._base_stream(cabac=False), 102)

    def test_mbaff(self):
        self._hammer(self._base_stream(interlaced=True), 103)

    def test_paff(self):
        from amatsukaze_tpu.video.avdec import avdec_available
        if not avdec_available():
            pytest.skip("FFmpeg bridge unavailable")
        import paff_gen
        from test_h264_decode import _motion_frames, _x264_stream
        fields = _motion_frames(8, (96, 48))
        es = _x264_stream(96, 48, fields,
                          "cabac=0:8x8dct=0:bframes=0:keyint=4:scenecut=0:"
                          "ref=2:qp=26")
        self._hammer(paff_gen.rewrite_to_paff(es), 104)

    def test_mbaff_temporal_direct(self):
        from amatsukaze_tpu.video.avdec import avdec_available
        if not avdec_available():
            pytest.skip("FFmpeg bridge unavailable")
        from test_h264_decode import _x264_stream
        from test_h264_mbaff import flip_direct_flag, mixed_frames
        es = flip_direct_flag(_x264_stream(
            128, 96, mixed_frames(8, (128, 96)),
            "cabac=0:8x8dct=0:no-deblock=1:interlaced=1:tff=1:keyint=50:"
            "scenecut=0:b-adapt=0:ref=2:qp=28", bframes=2))
        self._hammer(es, 105, n=40)

    def test_pure_garbage(self):
        from amatsukaze_tpu.video.native import (NativeH264Decoder,
                                                 h264_native_available)
        if not h264_native_available():
            pytest.skip("native H.264 engine unavailable")
        rng = np.random.default_rng(7)
        for _ in range(100):
            buf = b"\x00\x00\x01" + bytes(
                rng.integers(0, 256, int(rng.integers(0, 300)),
                             dtype=np.uint8))
            dec = NativeH264Decoder()
            dec.decode(buf)
            dec.flush()


class TestMpeg2DecoderFuzz:
    """Native MPEG-2 picture decoder on corrupted streams: never crash
    (verified clean under ASAN+UBSAN sweeps before commits)."""

    def test_mutations(self):
        from amatsukaze_tpu.video.native import (NativeMpeg2Decoder,
                                                 native_available)
        if not native_available():
            pytest.skip("native MPEG-2 decoder unavailable")
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks
        from mpeg2_enc import EncConfig, Mpeg2TestEncoder, synth_frames

        cfg = EncConfig(width=96, height=96)
        es = Mpeg2TestEncoder(cfg).encode(synth_frames(96, 96, 6),
                                          "IBBPBP")
        rng = np.random.default_rng(77)
        for it in range(60):
            buf = bytearray(es)
            mode = it % 3
            if mode == 0:
                for _ in range(int(rng.integers(1, 12))):
                    buf[int(rng.integers(0, len(buf)))] ^= 1 << int(
                        rng.integers(0, 8))
            elif mode == 1:
                buf = buf[: int(rng.integers(1, len(buf)))]
            else:
                off = int(rng.integers(0, len(buf)))
                ln = int(min(len(buf) - off, rng.integers(0, 256)))
                buf[off : off + ln] = bytes(
                    rng.integers(0, 256, ln, dtype=np.uint8))
            dec = NativeMpeg2Decoder()
            for chunk in iter_picture_chunks(bytes(buf)):
                dec.decode_picture(chunk)
            dec.flush()


class TestH265Fuzz:
    """The native HEVC engine must survive arbitrary corruption (bit
    flips, truncation, garbage blocks) without crashing — errors are
    counted and decoding continues.  Valid streams stay bit-exact vs the
    oracle (tests/test_h265_native.py); a broader mutation sweep runs
    under ASAN+UBSAN before commits (8000 iterations clean across 8-bit
    and Main10 bases)."""

    def _base_stream(self, bit10=False):
        from amatsukaze_tpu.video.avdec import avdec_available
        if not avdec_available():
            pytest.skip("FFmpeg bridge unavailable")
        from test_h265_decode import (_encode, _encode10, _moving10,
                                      _moving_frames)
        if bit10:
            return _encode10(
                _moving10(96, 64, 8), 96, 64,
                "frame-threads=1:keyint=4:bframes=2:b-adapt=0:wpp=1:qp=30:"
                "ref=2:cu-lossless=1")
        return _encode(
            _moving_frames(96, 64, 8), 96, 64,
            "frame-threads=1:keyint=4:bframes=2:b-adapt=0:wpp=1:qp=30:"
            "ref=2:amp=1:rect=1:tskip=1:signhide=1:aq-mode=2:crf=30")

    def _hammer(self, base: bytes, seed: int, n=60):
        from amatsukaze_tpu.video.native import (NativeH265Decoder,
                                                 h265_native_available)
        if not h265_native_available():
            pytest.skip("native HEVC engine unavailable")
        rng = np.random.default_rng(seed)
        for it in range(n):
            buf = bytearray(base)
            mode = it % 3
            if mode == 0:
                for _ in range(int(rng.integers(1, 12))):
                    buf[int(rng.integers(0, len(buf)))] ^= 1 << int(
                        rng.integers(0, 8))
            elif mode == 1:
                buf = buf[: int(rng.integers(1, len(buf)))]
            else:
                off = int(rng.integers(0, len(buf)))
                ln = int(min(len(buf) - off, rng.integers(0, 256)))
                buf[off : off + ln] = bytes(
                    rng.integers(0, 256, ln, dtype=np.uint8))
            dec = NativeH265Decoder()
            dec.decode(bytes(buf))
            dec.flush()  # must not crash; errors may be counted

    def test_main_8bit(self):
        self._hammer(self._base_stream(), 201)

    def test_main10(self):
        self._hammer(self._base_stream(bit10=True), 202)

    def test_pcm_tiles_dep_lt(self):
        # crafted conformance-edge streams: PCM payloads, tile grids,
        # dependent segments and long-term refs all survive corruption
        import h265_craft as C
        tiles, _ = C.pcm_stream(96, 64, 1, tiles=(2, 2))
        dep, _ = C.pcm_stream(64, 64, 1, segments=[8],
                              dep_segments=True)
        lt = C.lt_stream(64, 48, retention=True)
        self._hammer(tiles, 203, n=40)
        self._hammer(dep, 204, n=40)
        self._hammer(lt, 205, n=40)
