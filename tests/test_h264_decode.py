"""In-build H.264 decoder vs the system libavcodec (bit-exact).

Two validation axes, mirroring the MPEG-2 strategy
(test_mpeg2_decode.py / test_mpeg2_crossval.py):

- crafted streams (tests/h264_gen.py): hand-written CAVLC bitstreams with
  *chosen* coefficients probe the exact dequant/transform arithmetic the
  real decoder uses (these pinned down the normAdjust position classes
  and the DC scaling shifts — see h264_ref._luma_dc_dequant).
- libx264 encodes of synthetic content at scoped feature levels, decoded
  by both libavcodec and the in-build decoder, compared bit-exactly.
"""

import numpy as np
import pytest

from amatsukaze_tpu.video import h264_ref as HR
from amatsukaze_tpu.video.avdec import avdec_available

import h264_gen

pytestmark = pytest.mark.skipif(
    not avdec_available(), reason="FFmpeg bridge unavailable")


def _ff_decode(es: bytes, tmp_path):
    from amatsukaze_tpu.video.avdec import AvVideoDecoder
    p = tmp_path / "probe.h264"
    p.write_bytes(es)
    return [(y.copy(), u.copy(), v.copy())
            for y, u, v in AvVideoDecoder(str(p)).frames()]


def _ref_decode(es: bytes):
    dec = HR.H264RefDecoder()
    return dec.decode(es) + dec.flush()


def _assert_frames_equal(ref, got):
    assert len(ref) == len(got)
    for i, (rf, gf) in enumerate(zip(ref, got)):
        for name, a, b in zip("YUV", rf[:3], gf[:3]):
            assert np.array_equal(a, b), (
                f"frame {i} plane {name}: "
                f"{np.count_nonzero(a.astype(int) != b.astype(int))} diffs")


def _smooth_frames(w, h, n, seed=7):
    import scipy.ndimage as ndi
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        y = ndi.gaussian_filter(rng.uniform(0, 255, (h, w)), 2.5) + 2 * i
        u = ndi.gaussian_filter(rng.uniform(0, 255, (h // 2, w // 2)), 2)
        v = ndi.gaussian_filter(rng.uniform(0, 255, (h // 2, w // 2)), 2)
        out.append(tuple(np.clip(p, 0, 255).astype(np.uint8)
                         for p in (y, u, v)))
    return out


def _x264_stream(w, h, frames, params, crf=20, bframes=0, preset="veryfast"):
    from amatsukaze_tpu.video.avdec import AvVideoEncoder
    enc = AvVideoEncoder(w, h, 30, 1, crf=crf, preset=preset,
                        bframes=bframes, x264_params=params)
    pkts = []
    for y, u, v in frames:
        pkts += enc.encode(y, u, v)
    pkts += enc.flush()
    return b"".join(pkts)


class TestCraftedProbes:
    """Crafted single-coefficient streams: the arithmetic ground truth."""

    def test_luma_ac_positions(self, tmp_path):
        # every scan position, a mid and a high qp: nails the per-position
        # normAdjust class mapping and the 4x4 IDCT rounding
        for qp in (10, 23, 40):
            for s in range(16):
                co = [0] * 16
                co[s] = 4
                es = h264_gen.make_stream(2, 2, qp, {"luma_blocks": {0: co}})
                _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_luma_negative_and_multi(self, tmp_path):
        es = h264_gen.make_stream(2, 2, 23, {"luma_blocks": {
            0: [-4, -1, 1] + [0] * 13,
            5: [7, 0, 0, -3, 0, 1, -1] + [0] * 9,
        }})
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_i16_dc(self, tmp_path):
        for qp in (3, 11, 23, 37, 51):
            for co in ([4, 3] + [0] * 14, [-4, 0, -3] + [0] * 13):
                es = h264_gen.make_stream(2, 2, qp, {"i16_dc": list(co)})
                _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_chroma_dc_and_ac(self, tmp_path):
        for qp in (1, 17, 23, 45):
            es = h264_gen.make_stream(2, 2, qp,
                                      {"chroma_dc": ([4, 2, 0, 1], [-3, 0, 0, 0])})
            _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))
        ac = [0] * 15
        ac[0], ac[3] = 4, -2
        es = h264_gen.make_stream(2, 2, 23, {"chroma_ac": {(0, 0): ac,
                                                           (1, 2): ac}})
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_cavlc_level_escapes(self, tmp_path):
        # large levels exercise the suffix-length escalation + escape codes.
        # qp is kept low: the CAVLC codes themselves are qp-independent, and
        # at high qp these magnitudes dequantise past the int16 IDCT
        # intermediate range that real SIMD decoders wrap at (out of the
        # conformance envelope, so bit-exactness there is undefined)
        es = h264_gen.make_stream(2, 2, 4, {"luma_blocks": {
            0: [90, -40, 17, 9, -4, 2, 1, -1] + [0] * 8,
            1: [450, -350] + [0] * 14,
        }})
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))
        # level_prefix 15 escape with a 12-bit suffix at suffix_length 0
        es = h264_gen.make_stream(2, 2, 0, {"luma_blocks": {
            0: [2048] + [0] * 15, 2: [-1800] + [0] * 15}})
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))


class TestX264Intra:
    """libx264 all-intra CAVLC streams, deblocking off."""

    PARAMS = "keyint=1:cabac=0:8x8dct=0:no-deblock=1"

    def test_fixed_qp(self, tmp_path):
        frames = _smooth_frames(64, 64, 3)
        for qp in (10, 26, 40):
            es = _x264_stream(64, 64, frames, self.PARAMS + f":qp={qp}")
            _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_noisy_content_crf(self, tmp_path):
        rng = np.random.default_rng(3)
        frames = [tuple(rng.integers(0, 256, s, dtype=np.uint8).astype(np.uint8)
                        for s in ((48, 48), (24, 24), (24, 24)))
                  for _ in range(2)]
        es = _x264_stream(48, 48, frames, self.PARAMS, crf=30)
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_larger_picture(self, tmp_path):
        frames = _smooth_frames(176, 144, 2, seed=11)
        es = _x264_stream(176, 144, frames, self.PARAMS + ":qp=30")
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))


def _motion_frames(n, size, seed=7, fade=False):
    """Panning crop over a fixed background + per-frame noise: gives x264
    real motion vectors at every subpel phase."""
    import scipy.ndimage as ndi
    rng = np.random.default_rng(seed)
    w, h = size
    base_y = ndi.gaussian_filter(rng.uniform(0, 255, (h * 2, w * 2)), 3)
    base_u = ndi.gaussian_filter(rng.uniform(0, 255, (h, w)), 2)
    base_v = ndi.gaussian_filter(rng.uniform(0, 255, (h, w)), 2)
    frames = []
    for i in range(n):
        dx, dy = (3 * i) % (w // 2), (2 * i) % (h // 2)
        y = np.clip(base_y[dy : dy + h, dx : dx + w]
                    + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(base_u[dy // 2 : dy // 2 + h // 2,
                           dx // 2 : dx // 2 + w // 2], 0, 255).astype(np.uint8)
        v = np.clip(base_v[dy // 2 : dy // 2 + h // 2,
                           dx // 2 : dx // 2 + w // 2], 0, 255).astype(np.uint8)
        if fade:
            f = 0.55 + 0.06 * i
            y, u, v = (np.clip(p.astype(int) * f, 0, 255).astype(np.uint8)
                       for p in (y, u, v))
        frames.append((y, u, v))
    return frames


class TestX264P:
    """IP streams (CAVLC): quarter-pel MC, MV prediction, skip, ref lists,
    weighted prediction, multi-slice, multi-IDR output order."""

    BASE = "cabac=0:8x8dct=0:bframes=0:keyint=50"

    def _check(self, tmp_path, params, n=8, size=(64, 64), fade=False):
        frames = _motion_frames(n, size, fade=fade)
        es = _x264_stream(size[0], size[1], frames, params)
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_basic(self, tmp_path):
        self._check(tmp_path, self.BASE + ":weightp=0:ref=1:qp=28")

    def test_multi_ref_subpel(self, tmp_path):
        self._check(tmp_path, self.BASE + ":weightp=0:ref=5:subme=9:me=umh:qp=24")

    def test_all_partitions(self, tmp_path):
        self._check(tmp_path,
                    self.BASE + ":weightp=0:ref=2:partitions=all:subme=7:qp=26")

    def test_weightp_fade(self, tmp_path):
        # x264 duplicates a reference via RPLM to attach two weight sets
        self._check(tmp_path, self.BASE + ":weightp=2:ref=3:qp=26", fade=True)

    def test_multi_slice(self, tmp_path):
        self._check(tmp_path, self.BASE + ":weightp=0:ref=2:slices=3:qp=30",
                    size=(96, 96))

    def test_qcif(self, tmp_path):
        self._check(tmp_path, self.BASE + ":weightp=0:ref=3:subme=6:qp=30",
                    size=(176, 144))

    def test_qp_extremes(self, tmp_path):
        self._check(tmp_path, self.BASE + ":weightp=0:ref=2:qp=45")
        self._check(tmp_path, self.BASE + ":weightp=0:ref=2:qp=12")

    def test_multi_idr_output_order(self, tmp_path):
        # several IDRs: POC resets; output order must respect IDR epochs
        self._check(tmp_path,
                    "cabac=0:8x8dct=0:bframes=0:keyint=4:weightp=2:ref=3:qp=30",
                    n=16)

    def test_crf_scenecut(self, tmp_path):
        self._check(tmp_path,
                    self.BASE + ":weightp=2:ref=4:crf=25:scenecut=40", n=14)


class TestX264B:
    """IPB streams (CAVLC): bi-prediction, spatial/temporal direct,
    B_Skip, implicit/explicit weighted bipred, B-pyramid reordering."""

    BASE = "cabac=0:8x8dct=0:keyint=50"

    def _check(self, tmp_path, params, n=10, size=(64, 64), fade=False,
               bframes=3):
        frames = _motion_frames(n, size, fade=fade)
        es = _x264_stream(size[0], size[1], frames, params, bframes=bframes)
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_spatial_direct(self, tmp_path):
        self._check(tmp_path, self.BASE
                    + ":bframes=3:direct=spatial:weightp=0:weightb=0:ref=2:qp=28")

    def test_temporal_direct(self, tmp_path):
        self._check(tmp_path, self.BASE
                    + ":bframes=3:direct=temporal:weightp=0:weightb=0:ref=2:qp=28")

    def test_implicit_weightb_fade(self, tmp_path):
        self._check(tmp_path,
                    self.BASE + ":bframes=3:direct=spatial:weightb=1:ref=2:qp=28",
                    fade=True)

    def test_b_pyramid(self, tmp_path):
        self._check(tmp_path, self.BASE
                    + ":bframes=4:b-pyramid=normal:direct=auto:ref=3:qp=26",
                    n=16)

    def test_partitions_subpel(self, tmp_path):
        self._check(tmp_path, self.BASE
                    + ":bframes=3:partitions=all:subme=9:me=tesa:ref=3:qp=24",
                    n=12)

    def test_qcif(self, tmp_path):
        self._check(tmp_path, self.BASE + ":bframes=3:ref=3:subme=7:qp=30",
                    size=(176, 144))

    def test_multi_idr(self, tmp_path):
        self._check(tmp_path,
                    "cabac=0:8x8dct=0:keyint=5:bframes=3:ref=3:qp=28", n=20)

    def test_long_b_runs(self, tmp_path):
        self._check(tmp_path, self.BASE + ":bframes=8:b-adapt=2:ref=4:crf=28",
                    n=24, bframes=8)


class TestCrafted8x8Probes:
    """Hand-written High-profile 8x8-transform streams: these pinned the
    8.5.13.1 dequant rounding (+2^(5-qp/6) >> (6-qp/6) below qp 36) and
    the CAVLC sub-block interleave (coeff k of sub i at scan 4k+i)."""

    def test_dc_scaling(self, tmp_path):
        for qp in (0, 5, 23, 35, 36, 40, 51):
            for c in (1, 2, -3, 7):
                co = [0] * 64
                co[0] = c
                es = h264_gen.make_stream(2, 2, qp, {"luma8_blocks": {0: co}},
                                          transform_8x8=True)
                _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_all_scan_positions(self, tmp_path):
        for qp in (10, 40):
            for s in range(64):
                co = [0] * 64
                co[s] = 5
                es = h264_gen.make_stream(2, 2, qp, {"luma8_blocks": {0: co}},
                                          transform_8x8=True)
                _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_multi_coeff_rounding_interaction(self, tmp_path):
        # >>1 floors in the IDCT make multi-coefficient blocks order-sensitive
        patterns = [{1: 7, 2: -5}, {1: 3, 8: 3, 9: 5}, {5: 9, 17: -7, 30: 3},
                    {0: 4, 1: -1, 2: -1, 3: 1, 11: 2}]
        for pat in patterns:
            co = [0] * 64
            for s, v in pat.items():
                co[s] = v
            es = h264_gen.make_stream(2, 2, 23, {"luma8_blocks": {0: co}},
                                      transform_8x8=True)
            _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))


class TestX264Transform8x8:
    """High profile 8x8 transform (CAVLC): intra 8x8 prediction with
    reference filtering, inter transform_size_8x8_flag, 8x8 deblock bS."""

    def test_intra(self, tmp_path):
        frames = _motion_frames(3, (64, 64))
        for qp in (8, 26, 44):
            es = _x264_stream(64, 64, frames, f"keyint=1:cabac=0:8x8dct=1:qp={qp}")
            _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_p_frames(self, tmp_path):
        frames = _motion_frames(6, (64, 64))
        es = _x264_stream(
            64, 64, frames,
            "cabac=0:8x8dct=1:bframes=0:keyint=50:weightp=0:ref=2:qp=28")
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_qp_shift_boundary(self, tmp_path):
        # dequant switches from rounding right-shift to left-shift at qp 36
        frames = _motion_frames(6, (64, 64))
        for qp in (35, 36):
            es = _x264_stream(
                64, 64, frames,
                f"cabac=0:8x8dct=1:bframes=0:keyint=50:ref=2:qp={qp}")
            _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_b_frames_qcif(self, tmp_path):
        frames = _motion_frames(6, (176, 144))
        es = _x264_stream(176, 144, frames,
                          "cabac=0:8x8dct=1:keyint=50:ref=3:subme=7:crf=28",
                          bframes=3)
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_full_stress(self, tmp_path):
        frames = _motion_frames(16, (64, 64))
        es = _x264_stream(
            64, 64, frames,
            "cabac=0:8x8dct=1:keyint=8:ref=4:partitions=all:subme=9:crf=24",
            bframes=4)
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))


class TestCraftedCabac:
    """Hand-written CABAC streams (tests/h264_gen.py CabacWriter): the
    writer mirrors the decoder's context choices, so libavcodec arbitrates
    both at once.  These probes pinned the 8x8 last-coefficient ctx table,
    the P mb_type binarization, and the partition-ref ctx visibility."""

    def test_i8_cat5_positions(self, tmp_path):
        # every 8x8 scan position exercises SIG/LAST ctx tables
        for s in (0, 5, 15, 16, 23, 24, 31, 32, 47, 48, 55, 60, 62):
            co = [0] * 64
            co[s] = 5
            es = h264_gen.make_cabac_stream(23, {0: co})
            _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_i8_levels(self, tmp_path):
        for co_d in ({0: 1}, {0: 2}, {0: 20}, {0: 3, 3: -2, 10: -1, 21: -1},
                     {0: 1, 1: -1, 2: 1, 3: -1, 4: 1}):
            co = [0] * 64
            for s, v in co_d.items():
                co[s] = v
            es = h264_gen.make_cabac_stream(23, {0: co})
            _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_i8_rem_modes(self, tmp_path):
        for mode_b3 in (0, 1, 4, 6, 8):
            es = h264_gen.make_cabac_stream(
                23, {0: [40, 9, -7] + [0] * 61, 3: [11, 5] + [0] * 62},
                modes=[2, 2, 2, mode_b3])
            _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_p_mb_types(self, tmp_path):
        blk = [5, 0, -3, 1] + [0] * 12
        b8 = [0] * 64
        b8[0], b8[20] = 5, -3
        es = h264_gen.cabac_pslice_stream(26, {
            0: {"type": 0, "mvds": [(1, 1)]},
            1: {"type": 1, "mvds": [(0, 0), (2, -3)]},
            5: {"type": 2, "mvds": [(1, 2), (0, 1)], "blocks": {0: blk}},
            6: {"type": 3, "sub": [0, 0, 0, 0], "mvds": [(0, 0)] * 4,
                "blocks8": {1: b8}},
            10: {"type": 0, "mvds": [(2, 2)], "blocks8": {0: b8}},
            11: {"type": 3, "sub": [1, 2, 3, 0],
                 "mvds": [(1, 0), (1, 1), (2, 1), (0, 1), (-1, 3), (1, 1),
                          (-2, 0), (1, -1), (0, 0)]},
        })
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_p_ref_ctx_visibility(self, tmp_path):
        # partition refs visible to later partitions' ref ctx in-MB
        es = h264_gen.cabac_pslice_stream(
            26, {5: {"type": 1, "refs": [1, 0], "mvds": [(0, 0), (0, 0)]},
                 6: {"type": 3, "sub": [0, 1, 2, 3], "refs": [1, 0, 1, 1],
                     "mvds": [(1, 0), (1, 1), (2, 1), (0, 1), (-1, 3),
                              (1, 1), (-2, 0), (1, -1), (0, 0)]}},
            num_ref=2, n_lead_p=1)
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_big_mvd_ueg3(self, tmp_path):
        es = h264_gen.cabac_pslice_stream(
            26, {5: {"type": 0, "mvds": [(45, -77)]}})
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))


class TestX264Cabac:
    """libx264 CABAC streams across the whole feature surface."""

    def _check(self, tmp_path, params, n=6, size=(64, 64), bframes=0,
               fade=False):
        frames = _motion_frames(n, size, fade=fade)
        es = _x264_stream(size[0], size[1], frames, params, bframes=bframes)
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_intra(self, tmp_path):
        for qp in (6, 26, 45):
            self._check(tmp_path, f"keyint=1:cabac=1:8x8dct=1:qp={qp}", n=3)

    def test_p(self, tmp_path):
        self._check(tmp_path,
                    "cabac=1:8x8dct=1:bframes=0:keyint=50:weightp=0:ref=3:qp=26")

    def test_p_all_partitions(self, tmp_path):
        self._check(tmp_path, "cabac=1:8x8dct=1:bframes=0:keyint=50:ref=4:"
                    "partitions=all:subme=9:me=umh:qp=24", n=10)

    def test_p_weightp_fade(self, tmp_path):
        self._check(tmp_path, "cabac=1:8x8dct=1:bframes=0:keyint=50:"
                    "weightp=2:ref=3:crf=26", fade=True, n=8)

    def test_b_full(self, tmp_path):
        self._check(tmp_path, "cabac=1:8x8dct=1:keyint=50:ref=4:"
                    "partitions=all:subme=9:b-pyramid=normal:b-adapt=2:crf=24",
                    bframes=5, n=16)

    def test_b_temporal_direct(self, tmp_path):
        self._check(tmp_path,
                    "cabac=1:8x8dct=1:keyint=50:ref=3:direct=temporal:crf=26",
                    bframes=3, n=10)

    def test_qcif_long(self, tmp_path):
        self._check(tmp_path, "cabac=1:8x8dct=1:keyint=12:ref=4:subme=7:crf=27",
                    size=(176, 144), bframes=3, n=20)

    def test_qp_extremes(self, tmp_path):
        self._check(tmp_path, "cabac=1:8x8dct=1:keyint=50:ref=2:qp=48",
                    bframes=2)
        self._check(tmp_path, "cabac=1:8x8dct=1:keyint=50:ref=2:qp=4",
                    bframes=2, n=4)

    def test_multi_slice(self, tmp_path):
        self._check(tmp_path,
                    "cabac=1:8x8dct=1:keyint=50:ref=2:slices=4:crf=28",
                    size=(96, 96), bframes=2)

    def test_trellis(self, tmp_path):
        self._check(tmp_path, "cabac=1:8x8dct=1:keyint=50:ref=3:trellis=2:crf=23",
                    bframes=3, n=10)


class TestScalingMatrices:
    """Custom quantisation matrices (cqm=jvt): PPS scaling-list parse and
    the low-qp rounded dequant that only shows with non-flat weights."""

    def _check(self, tmp_path, params, n=6, bframes=2):
        frames = _motion_frames(n, (64, 64))
        es = _x264_stream(64, 64, frames, params, bframes=bframes)
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_intra(self, tmp_path):
        for qp in (10, 26):
            self._check(tmp_path, f"keyint=1:cabac=1:8x8dct=1:cqm=jvt:qp={qp}",
                        n=3)

    def test_cavlc_ip(self, tmp_path):
        self._check(tmp_path, "cabac=0:8x8dct=1:keyint=50:ref=2:cqm=jvt:crf=26")

    def test_cabac_b(self, tmp_path):
        self._check(tmp_path, "cabac=1:8x8dct=1:keyint=50:ref=3:cqm=jvt:crf=24")


class TestX264IntraDeblock:
    """All-intra with the in-loop deblocking filter active (8.7)."""

    PARAMS = "keyint=1:cabac=0:8x8dct=0"

    def test_default_offsets(self, tmp_path):
        frames = _smooth_frames(64, 64, 3)
        for qp in (20, 30, 40):
            es = _x264_stream(64, 64, frames, self.PARAMS + f":qp={qp}")
            _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_offsets(self, tmp_path):
        frames = _smooth_frames(64, 64, 2, seed=5)
        for db in ("2,1", "-3,-2", "6,6"):
            es = _x264_stream(64, 64, frames,
                              self.PARAMS + f":qp=35:deblock={db}")
            _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_noisy_high_qp(self, tmp_path):
        # high qp drives bS=4 strong filtering everywhere
        rng = np.random.default_rng(9)
        frames = [tuple(rng.integers(0, 256, s, dtype=np.uint8)
                        for s in ((48, 48), (24, 24), (24, 24)))
                  for _ in range(2)]
        es = _x264_stream(48, 48, frames, self.PARAMS + ":qp=46")
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_larger_picture(self, tmp_path):
        frames = _smooth_frames(176, 144, 2, seed=13)
        es = _x264_stream(176, 144, frames, self.PARAMS + ":qp=32")
        _assert_frames_equal(_ff_decode(es, tmp_path), _ref_decode(es))
