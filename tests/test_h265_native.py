"""Native C++ HEVC engine (native/h265dec.cpp) vs the Python oracle
(video/h265_ref.py): bit-identical output on every fixture class the
oracle suite covers (the oracle itself is validated bit-exactly against
libavcodec in test_h265_decode.py, so this chain pins the native engine
to libavcodec too)."""

import numpy as np
import pytest

from test_h265_decode import (_encode, _encode10, _moving10, _moving_frames,
                              _ref_decode, _smooth10, _smooth_frames)


def _native_or_skip():
    from amatsukaze_tpu.video.avdec import avdec_available
    from amatsukaze_tpu.video.native import h265_native_available

    if not avdec_available():
        pytest.skip("FFmpeg bridge unavailable")
    if not h265_native_available():
        pytest.skip("native HEVC engine not built")


def _native_decode(es: bytes, chunk: int = 0):
    from amatsukaze_tpu.video.native import NativeH265Decoder

    dec = NativeH265Decoder()
    out = []
    if chunk:
        pos = 0
        while pos < len(es):
            end = min(pos + chunk, len(es))
            cut = es.rfind(b"\x00\x00\x01", 0, end) if end < len(es) \
                else len(es)
            if cut <= pos:
                cut = len(es)
            out += dec.decode(es[pos:cut])
            pos = cut
    else:
        out += dec.decode(es)
    out += dec.flush()
    assert dec.errors == 0
    return out


def _check(es: bytes, chunk: int = 0):
    ref = _ref_decode(es)
    got = _native_decode(es, chunk)
    assert len(ref) == len(got), (len(ref), len(got))
    for i, (rf, gf) in enumerate(zip(ref, got)):
        for name, a, b in zip("YUV", rf[:3], gf[:3]):
            assert np.array_equal(a, b), (
                f"frame {i} plane {name}: "
                f"{np.count_nonzero(a.astype(int) != b.astype(int))} diffs")


B = "frame-threads=1"


class TestIntraNative:
    def test_ctu16(self):
        _native_or_skip()
        _check(_encode(_smooth_frames(96, 64, 2), 96, 64,
                       B + ":keyint=1:no-wpp=1:qp=30:ctu=16"))

    def test_ctu64_tu_depth(self):
        _native_or_skip()
        _check(_encode(_smooth_frames(128, 96, 2), 128, 96,
                       B + ":keyint=1:no-wpp=1:qp=28:ctu=64:min-cu-size=8:"
                       "max-tu-size=32:tu-intra-depth=3"))

    def test_noisy_many_modes(self):
        _native_or_skip()
        rng = np.random.default_rng(5)
        frames = [tuple(rng.integers(0, 256, s).astype(np.uint8)
                        for s in ((64, 96), (32, 48), (32, 48)))
                  for _ in range(2)]
        _check(_encode(frames, 96, 64, B + ":keyint=1:no-wpp=1:qp=22"))

    def test_signhide_crop_qp_extremes(self):
        _native_or_skip()
        _check(_encode(_smooth_frames(100, 60, 2), 100, 60,
                       B + ":keyint=1:no-wpp=1:signhide=1:qp=30"))
        _check(_encode(_smooth_frames(96, 64, 2), 96, 64,
                       B + ":keyint=1:no-wpp=1:qp=4"))
        _check(_encode(_smooth_frames(96, 64, 2), 96, 64,
                       B + ":keyint=1:no-wpp=1:qp=48"))

    def test_multislice_wpp(self):
        _native_or_skip()
        _check(_encode(_smooth_frames(192, 128, 2, seed=9), 192, 128,
                       B + ":keyint=1:wpp=1:slices=2:qp=28:ctu=32"))

    def test_cu_qp_delta(self):
        _native_or_skip()
        _check(_encode(_smooth_frames(96, 64, 2), 96, 64,
                       B + ":keyint=1:no-wpp=1:aq-mode=2:crf=30:qg-size=16"))

    def test_tskip_lossless(self):
        _native_or_skip()
        _check(_encode(_smooth_frames(96, 64, 2), 96, 64,
                       B + ":keyint=1:no-wpp=1:qp=30:tskip=1"))
        _check(_encode(_smooth_frames(96, 64, 2), 96, 64,
                       B + ":keyint=1:no-wpp=1:qp=30:cu-lossless=1"))


class TestInterNative:
    def test_p_no_loopfilter(self):
        _native_or_skip()
        _check(_encode(_moving_frames(96, 64, 10), 96, 64,
                       B + ":keyint=8:bframes=0:no-wpp=1:no-sao=1:"
                       "no-deblock=1:qp=30:ref=1:no-temporal-mvp=1"))

    def test_p_amp_rect_merge5(self):
        _native_or_skip()
        _check(_encode(_moving_frames(96, 64, 10), 96, 64,
                       B + ":keyint=8:bframes=0:no-wpp=1:qp=26:ref=3:"
                       "amp=1:rect=1:max-merge=5"))

    def test_p_weightp_subpel(self):
        _native_or_skip()
        _check(_encode(_moving_frames(112, 80, 14), 112, 80,
                       B + ":keyint=12:bframes=0:no-wpp=1:qp=30:ref=2:"
                       "weightp=1"))
        _check(_encode(_moving_frames(112, 80, 14), 112, 80,
                       B + ":keyint=12:bframes=0:no-wpp=1:qp=28:ref=2:"
                       "subme=2:me=hex:max-merge=3"))

    def test_p_cu_qp_wpp(self):
        _native_or_skip()
        _check(_encode(_moving_frames(112, 80, 14), 112, 80,
                       B + ":keyint=12:bframes=0:no-wpp=1:ref=2:aq-mode=2:"
                       "crf=28:qg-size=16"))
        _check(_encode(_moving_frames(96, 64, 10), 96, 64,
                       B + ":keyint=8:bframes=0:wpp=1:qp=30:ref=2"))

    def test_b_weightb_amp(self):
        _native_or_skip()
        _check(_encode(_moving_frames(112, 80, 14), 112, 80,
                       B + ":keyint=12:bframes=3:b-adapt=0:no-wpp=1:qp=30:"
                       "ref=2:weightp=1:weightb=1"))
        _check(_encode(_moving_frames(112, 80, 14), 112, 80,
                       B + ":keyint=12:bframes=3:b-adapt=0:no-wpp=1:qp=26:"
                       "ref=2:amp=1:rect=1:max-merge=5"))

    def test_b_deep_pyramid_opengop(self):
        _native_or_skip()
        _check(_encode(_moving_frames(112, 80, 24), 112, 80,
                       B + ":keyint=16:bframes=8:b-adapt=2:b-pyramid=1:"
                       "no-wpp=1:qp=30:ref=3:rc-lookahead=10"))
        _check(_encode(_moving_frames(112, 80, 20), 112, 80,
                       B + ":keyint=8:min-keyint=8:open-gop=1:bframes=3:"
                       "b-adapt=0:no-wpp=1:qp=30:ref=2"))

    def test_b_wpp_sao_chunked(self):
        _native_or_skip()
        _check(_encode(_moving_frames(112, 80, 14), 112, 80,
                       B + ":keyint=12:bframes=3:b-adapt=0:wpp=1:qp=32:"
                       "ref=2"), chunk=1024)


class TestMain10Native:
    def test_10_intra(self):
        _native_or_skip()
        _check(_encode10(_smooth10(96, 64, 2), 96, 64,
                         B + ":no-wpp=1:keyint=1:qp=34"))
        _check(_encode10(_smooth10(96, 64, 2), 96, 64,
                         B + ":no-wpp=1:keyint=1:qp=4"))

    def test_10_inter(self):
        _native_or_skip()
        _check(_encode10(_moving10(96, 64, 10), 96, 64,
                         B + ":no-wpp=1:keyint=8:bframes=0:qp=30:ref=2"))
        _check(_encode10(_moving10(112, 80, 14), 112, 80,
                         B + ":no-wpp=1:keyint=12:bframes=3:b-adapt=0:"
                         "b-pyramid=1:qp=30:ref=2"))

    def test_10_weightp_cuqp_lossless(self):
        _native_or_skip()
        _check(_encode10(_moving10(112, 80, 14), 112, 80,
                         B + ":no-wpp=1:keyint=12:bframes=0:qp=30:ref=2:"
                         "weightp=1"))
        _check(_encode10(_moving10(112, 80, 10), 112, 80,
                         B + ":no-wpp=1:keyint=8:bframes=0:ref=2:aq-mode=2:"
                         "crf=30:qg-size=16"))
        _check(_encode10(_moving10(96, 64, 8), 96, 64,
                         B + ":no-wpp=1:keyint=8:bframes=0:qp=30:ref=2:"
                         "tskip=1:cu-lossless=1"))


class TestConformanceEdgesNative:
    def test_8x4_merge_and_rasl(self):
        import re

        _native_or_skip()
        _check(_encode(_moving_frames(128, 96, 16, seed=11), 128, 96,
                       "frame-threads=1:no-wpp=1:keyint=12:bframes=3:"
                       "b-adapt=0:qp=34:ref=2:rect=1:amp=1:min-cu-size=8:"
                       "ctu=16:max-merge=5:no-sao=1:no-deblock=1"))
        es = _encode(_moving_frames(112, 80, 24), 112, 80,
                     "frame-threads=1:no-wpp=1:keyint=8:min-keyint=8:"
                     "open-gop=1:bframes=3:b-adapt=0:qp=30:ref=2")
        starts = [m.start() for m in re.finditer(b"\x00\x00\x01", es)]
        cras = [s for s in starts if ((es[s + 3] >> 1) & 0x3F) == 21]
        first_vcl = next(s for s in starts
                         if ((es[s + 3] >> 1) & 0x3F) < 32)
        cut = es[:first_vcl] + es[cras[1]:]
        _check(cut)

    def test_scaling_lists(self):
        import h265_sl_gen as SL

        _native_or_skip()
        _check(_encode(_moving_frames(112, 80, 14), 112, 80,
                       B + ":no-wpp=1:keyint=12:bframes=3:b-adapt=0:qp=30:"
                       "ref=2:scaling-list=default"))
        _check(_encode10(_moving10(96, 64, 8), 96, 64,
                         B + ":no-wpp=1:keyint=8:bframes=0:qp=28:ref=2:"
                         "scaling-list=default"))
        es = _encode(_moving_frames(112, 80, 10), 112, 80,
                     B + ":no-wpp=1:keyint=12:bframes=3:b-adapt=0:qp=30:"
                     "ref=2:scaling-list=default:ctu=64:max-tu-size=32")
        _check(SL.patch_stream(es))
