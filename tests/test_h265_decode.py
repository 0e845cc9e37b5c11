"""In-build HEVC decoder vs the system libavcodec (bit-exact).

Mirrors test_h264_decode.py's strategy: libx265 encodes of synthetic
content at scoped feature levels (x265-params pins each tool on/off),
decoded by both libavcodec and the in-build oracle, compared
plane-exactly.  Reference parity: the upstream project decodes HEVC
through FFmpeg (ReaderWriterFFmpeg.hpp); this suite proves the
standalone path.
"""

import numpy as np
import pytest

from amatsukaze_tpu.video import h265_ref as HR
from amatsukaze_tpu.video.avdec import avdec_available

pytestmark = pytest.mark.skipif(
    not avdec_available(), reason="FFmpeg bridge unavailable")

BASE = ("keyint=1:no-wpp=1:no-signhide=1:frame-threads=1:no-sao=1:"
        "no-deblock=1:qp=30")


def _encode(frames, w, h, params, codec="libx265", crf=25):
    from amatsukaze_tpu.video.avdec import AvVideoEncoder
    enc = AvVideoEncoder(w, h, codec=codec, preset="ultrafast", crf=crf,
                         x264_params=params)
    aus = []
    for y, u, v in frames:
        aus += enc.encode(y, u, v)
    aus += enc.flush()
    return b"".join(aus)


def _ff_decode(es: bytes, tmp_path):
    from amatsukaze_tpu.video.avdec import AvVideoDecoder
    p = tmp_path / "probe.h265"
    p.write_bytes(es)
    return [(y.copy(), u.copy(), v.copy())
            for y, u, v in AvVideoDecoder(str(p)).frames()]


def _ref_decode(es: bytes):
    dec = HR.H265RefDecoder()
    return dec.decode(es) + dec.flush()


def _assert_frames_equal(ref, got):
    assert len(ref) == len(got), (len(ref), len(got))
    for i, (rf, gf) in enumerate(zip(ref, got)):
        for name, a, b in zip("YUV", rf[:3], gf[:3]):
            assert a.shape == b.shape, (i, name, a.shape, b.shape)
            assert np.array_equal(a, b), (
                f"frame {i} plane {name}: "
                f"{np.count_nonzero(a.astype(int) != b.astype(int))} diffs"
                f" of {a.size}")


def _smooth_frames(w, h, n, seed=7, amp=255.0):
    import scipy.ndimage as ndi
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        y = ndi.gaussian_filter(rng.uniform(0, amp, (h, w)), 2.5,
                                mode="nearest")
        u = ndi.gaussian_filter(rng.uniform(0, amp, (h // 2, w // 2)), 2,
                                mode="nearest")
        v = ndi.gaussian_filter(rng.uniform(0, amp, (h // 2, w // 2)), 2,
                                mode="nearest")
        out.append(tuple(a.astype(np.uint8) for a in (y, u, v)))
    return out


def _run(frames, w, h, params, tmp_path, crf=25):
    es = _encode(frames, w, h, params, crf=crf)
    _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))


class TestIntra:
    def test_allintra_ctu32(self, tmp_path):
        _run(_smooth_frames(64, 64, 3), 64, 64, BASE + ":ctu=32", tmp_path)

    def test_allintra_ctu16(self, tmp_path):
        _run(_smooth_frames(64, 64, 2), 64, 64,
             BASE + ":ctu=16:min-cu-size=8", tmp_path)

    def test_allintra_ctu64_tu_depth(self, tmp_path):
        _run(_smooth_frames(128, 128, 2), 128, 128,
             BASE + ":ctu=64:min-cu-size=8:tu-intra-depth=3:rdoq-level=0",
             tmp_path)

    def test_noisy_content_many_modes(self, tmp_path):
        import scipy.ndimage as ndi
        rng = np.random.default_rng(11)
        frames = []
        for k in range(2):
            y = (ndi.gaussian_filter(rng.uniform(0, 255, (96, 96)), 1.0)
                 + rng.uniform(-20, 20, (96, 96)))
            xx, yy = np.meshgrid(np.arange(96), np.arange(96))
            y = y + 40 * np.sin(xx / 5 + k) + 40 * np.cos(yy / 7)
            u = ndi.gaussian_filter(rng.uniform(0, 255, (48, 48)), 1.0)
            v = ndi.gaussian_filter(rng.uniform(0, 255, (48, 48)), 1.0)
            frames.append(tuple(np.clip(a, 0, 255).astype(np.uint8)
                                for a in (y, u, v)))
        _run(frames, 96, 96, BASE + ":ctu=32:min-cu-size=8", tmp_path,
             crf=18)

    def test_sign_data_hiding(self, tmp_path):
        _run(_smooth_frames(64, 64, 2, seed=3), 64, 64,
             BASE.replace("no-signhide=1", "signhide=1") + ":ctu=32",
             tmp_path)

    def test_conformance_window_crop(self, tmp_path):
        # 60x52 is not CTU-aligned -> conformance window cropping
        _run(_smooth_frames(60, 52, 2, seed=5), 60, 52,
             BASE + ":ctu=32:min-cu-size=8", tmp_path)

    def test_qp_range(self, tmp_path):
        for qp in (10, 44):
            _run(_smooth_frames(64, 64, 1, seed=qp), 64, 64,
                 BASE.replace("qp=30", f"qp={qp}") + ":ctu=32", tmp_path)

    def test_wpp_entry_points(self, tmp_path):
        # 4 CTU rows -> entropy_coding_sync with per-row substreams
        _run(_smooth_frames(192, 128, 2, seed=9), 192, 128,
             "keyint=1:wpp=1:no-signhide=1:frame-threads=1:no-sao=1:"
             "no-deblock=1:qp=28:ctu=32:min-cu-size=8", tmp_path)

    def test_multi_slice(self, tmp_path):
        _run(_smooth_frames(192, 128, 2, seed=9), 192, 128,
             "keyint=1:wpp=1:slices=2:no-signhide=1:frame-threads=1:"
             "no-sao=1:no-deblock=1:qp=28:ctu=32", tmp_path)

    def test_cu_qp_delta(self, tmp_path):
        # CRF + aq-mode=2 -> per-CU QP deltas and QP prediction
        _run(_smooth_frames(192, 128, 2, seed=9), 192, 128,
             "keyint=1:no-wpp=1:no-signhide=1:frame-threads=1:no-sao=1:"
             "no-deblock=1:ctu=32:aq-mode=2", tmp_path, crf=24)

    def test_transform_skip(self, tmp_path):
        _run(_smooth_frames(192, 128, 2, seed=9), 192, 128,
             "keyint=1:no-wpp=1:no-signhide=1:frame-threads=1:no-sao=1:"
             "no-deblock=1:qp=28:ctu=32:tskip=1", tmp_path)

    def test_transquant_bypass(self, tmp_path):
        # lossless=1 forces cu_transquant_bypass on every CU
        _run(_smooth_frames(96, 64, 2, seed=13), 96, 64,
             "keyint=1:no-wpp=1:no-signhide=1:frame-threads=1:no-sao=1:"
             "no-deblock=1:ctu=32:lossless=1", tmp_path)


class TestDeblock:
    BASE_DB = ("keyint=1:no-wpp=1:no-signhide=1:frame-threads=1:"
               "no-sao=1:ctu=32")

    def test_default(self, tmp_path):
        _run(_smooth_frames(96, 64, 2, seed=21), 96, 64,
             self.BASE_DB + ":deblock=1:qp=30:min-cu-size=8", tmp_path)

    def test_offsets(self, tmp_path):
        # x265 deblock=<tC>,<beta> -> slice tc/beta offset_div2
        for off in ("2,0", "2,-2", "-2,2"):
            _run(_smooth_frames(96, 64, 1, seed=21), 96, 64,
                 self.BASE_DB + f":deblock={off}:qp=34", tmp_path)

    def test_qp_extremes(self, tmp_path):
        for qp in (18, 44):
            _run(_smooth_frames(96, 64, 1, seed=22), 96, 64,
                 self.BASE_DB + f":deblock=1:qp={qp}:min-cu-size=8",
                 tmp_path)

    def test_wpp_and_deblock(self, tmp_path):
        _run(_smooth_frames(96, 64, 2, seed=21), 96, 64,
             "keyint=1:wpp=1:no-signhide=1:frame-threads=1:no-sao=1:"
             "deblock=1:qp=30:ctu=32:min-cu-size=8", tmp_path)

    def test_lossless_cu_excluded(self, tmp_path):
        # bypass CUs must not be touched by the loop filter
        _run(_smooth_frames(96, 64, 2, seed=21), 96, 64,
             self.BASE_DB + ":deblock=1:qp=30:lossless=1", tmp_path)


class TestSao:
    def test_sao_only(self, tmp_path):
        _run(_smooth_frames(96, 64, 2, seed=31), 96, 64,
             "keyint=1:no-wpp=1:no-signhide=1:frame-threads=1:sao=1:"
             "no-deblock=1:qp=34:ctu=32:min-cu-size=8", tmp_path)

    def test_sao_and_deblock(self, tmp_path):
        _run(_smooth_frames(96, 64, 2, seed=31), 96, 64,
             "keyint=1:no-wpp=1:no-signhide=1:frame-threads=1:sao=1:"
             "deblock=1:qp=30:ctu=32:min-cu-size=8", tmp_path)

    def test_sao_high_qp_noisy(self, tmp_path):
        # high QP + noise drives band offsets, merges and all EO classes
        rng = np.random.default_rng(17)
        frames = []
        for _ in range(2):
            y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
            u = rng.integers(0, 256, (32, 48)).astype(np.uint8)
            v = rng.integers(0, 256, (32, 48)).astype(np.uint8)
            frames.append((y, u, v))
        _run(frames, 96, 64,
             "keyint=1:no-wpp=1:no-signhide=1:frame-threads=1:sao=1:"
             "deblock=1:qp=44:ctu=16:min-cu-size=8", tmp_path)

    def test_sao_wpp(self, tmp_path):
        _run(_smooth_frames(96, 64, 2, seed=31), 96, 64,
             "keyint=1:wpp=1:no-signhide=1:frame-threads=1:sao=1:"
             "deblock=1:qp=38:ctu=32", tmp_path)


def _moving_frames(w, h, n, seed=3):
    """Smooth base rolled per frame: real motion plus a wrap seam that
    forces boundary MVs and intra-in-P blocks late in the GOP."""
    base = _smooth_frames(w, h, 1, seed=seed)[0]
    out = []
    for i in range(n):
        y = np.roll(base[0], (3 * i, 7 * i), (0, 1))
        u = np.roll(base[1], (i, 3 * i), (0, 1))
        v = np.roll(base[2], (2 * i, i), (0, 1))
        out.append((y.copy(), u.copy(), v.copy()))
    return out


class TestInterP:
    """P slices: merge/AMVP, quarter-pel MC, TMVP, weighted pred."""

    def test_p_basic_no_loopfilter(self, tmp_path):
        _run(_moving_frames(96, 64, 10), 96, 64,
             "keyint=8:bframes=0:no-wpp=1:no-signhide=1:frame-threads=1:"
             "no-sao=1:no-deblock=1:qp=30:ref=1:no-temporal-mvp=1", tmp_path)

    def test_p_tmvp_multi_ref(self, tmp_path):
        _run(_moving_frames(96, 64, 10), 96, 64,
             "keyint=8:bframes=0:no-wpp=1:no-signhide=1:frame-threads=1:"
             "no-sao=1:no-deblock=1:qp=30:ref=2", tmp_path)

    def test_p_deblock_sao(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=0:no-wpp=1:frame-threads=1:qp=30:ref=3",
             tmp_path)

    def test_p_amp_rect_merge5(self, tmp_path):
        _run(_moving_frames(96, 64, 10), 96, 64,
             "keyint=8:bframes=0:no-wpp=1:frame-threads=1:no-sao=1:"
             "no-deblock=1:qp=26:ref=3:amp=1:rect=1:max-merge=5", tmp_path)

    def test_p_weightp(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=0:no-wpp=1:frame-threads=1:qp=30:ref=2:"
             "weightp=1", tmp_path)

    def test_p_subpel_hex(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=0:no-wpp=1:frame-threads=1:qp=28:ref=2:"
             "subme=2:me=hex:max-merge=3", tmp_path)

    def test_p_cu_qp_delta(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=0:no-wpp=1:frame-threads=1:ref=2:"
             "aq-mode=2:crf=28:qg-size=16", tmp_path)

    def test_p_ctu64(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=0:no-wpp=1:frame-threads=1:qp=30:ref=2:"
             "ctu=64:min-cu-size=8", tmp_path)

    def test_p_wpp(self, tmp_path):
        _run(_moving_frames(96, 64, 10), 96, 64,
             "keyint=8:bframes=0:wpp=1:frame-threads=1:qp=30:ref=2",
             tmp_path)

    def test_p_tskip_lossless(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=0:no-wpp=1:frame-threads=1:qp=30:ref=2:"
             "tskip=1:cu-lossless=1", tmp_path)


class TestInterB:
    """B slices: bi-prediction, combined merge candidates, b-pyramid,
    weighted bi-pred, open-GOP CRA/RASL ordering."""

    def test_b_basic_no_loopfilter(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=3:b-adapt=0:no-b-pyramid=1:no-wpp=1:"
             "no-signhide=1:frame-threads=1:no-sao=1:no-deblock=1:qp=30:"
             "ref=2", tmp_path)

    def test_b_pyramid(self, tmp_path):
        _run(_moving_frames(112, 80, 18), 112, 80,
             "keyint=16:bframes=4:b-adapt=0:b-pyramid=1:no-wpp=1:"
             "frame-threads=1:qp=30:ref=3", tmp_path)

    def test_b_weightb(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=3:b-adapt=0:no-wpp=1:frame-threads=1:"
             "qp=30:ref=2:weightp=1:weightb=1", tmp_path)

    def test_b_amp_rect_merge5(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=3:b-adapt=0:no-wpp=1:frame-threads=1:"
             "qp=26:ref=2:amp=1:rect=1:max-merge=5", tmp_path)

    def test_b_adapt_pyramid_deep(self, tmp_path):
        _run(_moving_frames(112, 80, 24), 112, 80,
             "keyint=16:bframes=8:b-adapt=2:b-pyramid=1:no-wpp=1:"
             "frame-threads=1:qp=30:ref=3:rc-lookahead=10", tmp_path)

    def test_b_open_gop_cra(self, tmp_path):
        _run(_moving_frames(112, 80, 20), 112, 80,
             "keyint=8:min-keyint=8:open-gop=1:bframes=3:b-adapt=0:"
             "no-wpp=1:frame-threads=1:qp=30:ref=2", tmp_path)

    def test_b_closed_gop(self, tmp_path):
        _run(_moving_frames(112, 80, 20), 112, 80,
             "keyint=8:min-keyint=8:no-open-gop=1:bframes=3:b-adapt=0:"
             "no-wpp=1:frame-threads=1:qp=30:ref=2", tmp_path)

    def test_b_no_tmvp(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=3:b-adapt=0:no-wpp=1:frame-threads=1:"
             "qp=30:ref=2:no-temporal-mvp=1", tmp_path)

    def test_b_wpp_sao(self, tmp_path):
        _run(_moving_frames(112, 80, 14), 112, 80,
             "keyint=12:bframes=3:b-adapt=0:wpp=1:frame-threads=1:"
             "qp=32:ref=2", tmp_path)


def _encode10(frames, w, h, params):
    from amatsukaze_tpu.video.avdec import AvVideoEncoder
    enc = AvVideoEncoder(w, h, codec="libx265", preset="ultrafast",
                         crf=25, bframes=0, x264_params=params,
                         bit_depth=10)
    aus = []
    for y, u, v in frames:
        aus += enc.encode(y, u, v)
    aus += enc.flush()
    return b"".join(aus)


def _ff_decode10(es: bytes, tmp_path):
    from amatsukaze_tpu.video.avdec import AvVideoDecoder
    p = tmp_path / "probe.h265"
    p.write_bytes(es)
    return [(y.copy(), u.copy(), v.copy())
            for y, u, v in AvVideoDecoder(str(p), keep_depth=True).frames()]


def _smooth10(w, h, n, seed=7):
    import scipy.ndimage as ndi
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        y = ndi.gaussian_filter(rng.uniform(0, 1023, (h, w)), 2.5,
                                mode="nearest").astype(np.uint16)
        u = ndi.gaussian_filter(rng.uniform(0, 1023, (h // 2, w // 2)), 2,
                                mode="nearest").astype(np.uint16)
        v = ndi.gaussian_filter(rng.uniform(0, 1023, (h // 2, w // 2)), 2,
                                mode="nearest").astype(np.uint16)
        out.append((y, u, v))
    return out


def _moving10(w, h, n, seed=3):
    base = _smooth10(w, h, 1, seed)[0]
    out = []
    for i in range(n):
        out.append((np.roll(base[0], (3 * i, 7 * i), (0, 1)).copy(),
                    np.roll(base[1], (i, 3 * i), (0, 1)).copy(),
                    np.roll(base[2], (2 * i, i), (0, 1)).copy()))
    return out


def _run10(frames, w, h, params, tmp_path):
    es = _encode10(frames, w, h, params)
    _assert_frames_equal(_ff_decode10(es, tmp_path), _ref_decode(es))


class TestMain10:
    """Main10 (10-bit) profile: what BS4K/CS4K broadcast HEVC uses.
    Bit-depth-parameterised residual shifts, MC intermediates, weighted
    prediction, QpBdOffset, deblock beta/tc scaling and SAO bands."""

    B = "frame-threads=1:no-wpp=1"

    def test_10b_intra_no_loopfilter(self, tmp_path):
        _run10(_smooth10(96, 64, 2), 96, 64,
               self.B + ":keyint=1:no-sao=1:no-deblock=1:no-signhide=1:"
               "qp=30", tmp_path)

    def test_10b_intra_deblock_sao(self, tmp_path):
        _run10(_smooth10(96, 64, 2), 96, 64,
               self.B + ":keyint=1:qp=34", tmp_path)

    def test_10b_intra_low_qp(self, tmp_path):
        _run10(_smooth10(96, 64, 2), 96, 64,
               self.B + ":keyint=1:qp=4", tmp_path)

    def test_10b_p_slices(self, tmp_path):
        _run10(_moving10(96, 64, 10), 96, 64,
               self.B + ":keyint=8:bframes=0:qp=30:ref=2", tmp_path)

    def test_10b_b_pyramid(self, tmp_path):
        _run10(_moving10(112, 80, 14), 112, 80,
               self.B + ":keyint=12:bframes=3:b-adapt=0:b-pyramid=1:"
               "qp=30:ref=2", tmp_path)

    def test_10b_weightp(self, tmp_path):
        _run10(_moving10(112, 80, 14), 112, 80,
               self.B + ":keyint=12:bframes=0:qp=30:ref=2:weightp=1",
               tmp_path)

    def test_10b_cu_qp_delta(self, tmp_path):
        _run10(_moving10(112, 80, 10), 112, 80,
               self.B + ":keyint=8:bframes=0:ref=2:aq-mode=2:crf=30:"
               "qg-size=16", tmp_path)

    def test_10b_tskip_lossless(self, tmp_path):
        _run10(_moving10(96, 64, 8), 96, 64,
               self.B + ":keyint=8:bframes=0:qp=30:ref=2:tskip=1:"
               "cu-lossless=1", tmp_path)


class TestInterlacedSignaled:
    def test_field_signaled_stream(self, tmp_path):
        """x265 --interlace: frame-coded with field_seq/pic-struct
        signaling (the HEVC interlaced form x265 emits). Decode must be
        bit-exact; the TS-layer parser reports progressive=False so the
        pipeline routes it through the deinterlacers (the reference's
        fieldMode_ handling, ReaderWriterFFmpeg.hpp:429)."""
        from amatsukaze_tpu.ts.video_h265 import H265VideoParser
        from amatsukaze_tpu.utils.context import AMTContext
        from amatsukaze_tpu.video.avdec import AvVideoEncoder

        frames = _moving_frames(96, 64, 8)
        enc = AvVideoEncoder(96, 64, codec="libx265", preset="ultrafast",
                             crf=25, bframes=0, interlaced=True,
                             x264_params="keyint=8:frame-threads=1:"
                             "no-wpp=1:qp=30:ref=2:interlace=tff")
        es = b"".join(sum([enc.encode(*f) for f in frames], []))
        es += b"".join(enc.flush())
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))
        p = H265VideoParser(AMTContext(level="error"))
        infos = p.input_frame(es, 90000, 90000) or []
        assert infos and not infos[0].progressive


class TestConformanceEdges:
    def test_8x4_merge_uni_conversion(self, tmp_path):
        """8.5.3.2.2: 8x4/4x8 PUs convert bi-predictive merge candidates
        to uni-L0. Without the conversion these streams diverge from
        libavcodec (pre-fix: dozens-to-thousands of pixel diffs)."""
        _run(_moving_frames(128, 96, 16, seed=11), 128, 96,
             "frame-threads=1:no-wpp=1:keyint=12:bframes=3:b-adapt=0:"
             "qp=34:ref=2:rect=1:amp=1:min-cu-size=8:ctu=16:max-merge=5:"
             "no-sao=1:no-deblock=1", tmp_path)
        _run(_moving_frames(128, 96, 16, seed=11), 128, 96,
             "frame-threads=1:no-wpp=1:keyint=12:bframes=4:b-adapt=0:"
             "b-pyramid=1:qp=37:ref=3:rect=1:min-cu-size=8:ctu=16:"
             "max-merge=5:subme=3:me=umh", tmp_path)

    def test_mid_stream_cra_join_drops_rasl(self, tmp_path):
        """Joining at a CRA (broadcast tune-in): RASL pictures reference
        lost history and must be dropped (NoRaslOutputFlag, 8.1.3) —
        output must match libavcodec's."""
        import re

        frames = _moving_frames(112, 80, 24)
        es = _encode(frames, 112, 80,
                     "frame-threads=1:no-wpp=1:keyint=8:min-keyint=8:"
                     "open-gop=1:bframes=3:b-adapt=0:qp=30:ref=2")
        starts = [m.start() for m in re.finditer(b"\x00\x00\x01", es)]
        cras = [s for s in starts if ((es[s + 3] >> 1) & 0x3F) == 21]
        assert len(cras) >= 2
        first_vcl = next(s for s in starts
                         if ((es[s + 3] >> 1) & 0x3F) < 32)
        cut = es[:first_vcl] + es[cras[1]:]
        _assert_frames_equal(_ff_decode(cut, tmp_path), _ref_decode(cut))


class TestScalingLists:
    """Scaling lists (7.3.4/7.4.5/8.6.3): default matrices from x265
    scaling-list=default across intra/inter/CTU64/10-bit/tskip, and the
    explicit-coefficient + pred-copy syntax via the SPS splicer
    (h265_sl_gen) with libavcodec arbitrating both forms."""

    B = "frame-threads=1:no-wpp=1"

    def test_default_lists(self, tmp_path):
        _run(_smooth_frames(96, 64, 2), 96, 64,
             self.B + ":keyint=1:qp=30:scaling-list=default", tmp_path)
        _run(_moving_frames(112, 80, 14), 112, 80,
             self.B + ":keyint=12:bframes=3:b-adapt=0:qp=30:ref=2:"
             "scaling-list=default", tmp_path)
        _run(_smooth_frames(128, 96, 2), 128, 96,
             self.B + ":keyint=1:qp=26:ctu=64:max-tu-size=32:"
             "tu-intra-depth=2:scaling-list=default", tmp_path)
        _run(_smooth_frames(96, 64, 2), 96, 64,
             self.B + ":keyint=1:qp=30:tskip=1:scaling-list=default",
             tmp_path)

    def test_default_lists_main10(self, tmp_path):
        _run10(_moving10(96, 64, 8), 96, 64,
               self.B + ":keyint=8:bframes=0:qp=28:ref=2:"
               "scaling-list=default", tmp_path)

    def test_explicit_and_pred_copy(self, tmp_path):
        import h265_sl_gen as SL

        for params in (
                self.B + ":keyint=1:qp=30:scaling-list=default",
                self.B + ":keyint=12:bframes=3:b-adapt=0:qp=30:ref=2:"
                "scaling-list=default:ctu=64:max-tu-size=32"):
            es = _encode(_moving_frames(112, 80, 10), 112, 80, params)
            patched = SL.patch_stream(es)
            base = _ff_decode(es, tmp_path)
            ffp = _ff_decode(patched, tmp_path)
            # libavcodec: explicit default == flagged default
            _assert_frames_equal(base, ffp)
            _assert_frames_equal(ffp, _ref_decode(patched))
