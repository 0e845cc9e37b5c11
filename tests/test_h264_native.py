"""Native C++ H.264 decoder (native/h264dec.cpp) vs the Python oracle.

Same differential strategy as the MPEG-2 stack (test_mpeg2_native.py):
the pure-Python oracle (video/h264_ref.py, itself held bit-exact against
libavcodec in test_h264_decode.py) is the source of truth; the native
engine must reproduce its output bit-for-bit — planes AND display order
(POC) — on crafted streams and on libx264 encodes across the feature
matrix (CAVLC/CABAC, I/P/B, 8x8 transform, weighted prediction, scaling
matrices, multi-slice, I_PCM).
"""

import numpy as np
import pytest

from amatsukaze_tpu.video import h264_ref as HR
from amatsukaze_tpu.video.avdec import avdec_available
from amatsukaze_tpu.video.native import h264_native_available

import h264_gen
from test_h264_decode import (_motion_frames, _smooth_frames, _x264_stream)

pytestmark = pytest.mark.skipif(
    not h264_native_available(), reason="native H.264 engine unavailable")

needs_x264 = pytest.mark.skipif(
    not avdec_available(), reason="FFmpeg bridge unavailable")


def _diff_check(es: bytes, chunked: bool = False):
    """Decode with oracle and native engine; assert bit-identical frames
    and identical POC order.  Returns the frame count."""
    from amatsukaze_tpu.video.native import NativeH264Decoder

    ref = HR.H264RefDecoder()
    rf = ref.decode(es) + ref.flush()
    nat = NativeH264Decoder()
    if chunked:
        nf = []
        # feed in small pieces cut at NAL boundaries (the decode()
        # contract: whole NALs per call)
        pend = b""
        step = max(256, len(es) // 7)
        for i in range(0, len(es), step):
            pend += es[i : i + step]
            cut = pend.rfind(b"\x00\x00\x01")
            if cut > 0:
                nf += nat.decode(pend[:cut])
                pend = pend[cut:]
        nf += nat.decode(pend)
        nf += nat.flush()
    else:
        nf = nat.decode(es) + nat.flush()
    assert nat.errors == 0
    assert len(rf) == len(nf)
    for i, ((ry, ru, rv, rpoc), (ny, nu, nv, npoc)) in enumerate(zip(rf, nf)):
        assert rpoc == npoc, f"frame {i}: poc {rpoc} != {npoc}"
        for name, a, b in (("Y", ry, ny), ("U", ru, nu), ("V", rv, nv)):
            assert np.array_equal(a, b), (
                f"frame {i} plane {name}: "
                f"{np.count_nonzero(a.astype(int) != b.astype(int))} diffs")
    return len(rf)


class TestCrafted:
    """Hand-written bitstreams (tests/h264_gen.py)."""

    def test_cavlc_probes(self):
        for qp in (0, 10, 23, 37, 51):
            es = h264_gen.make_stream(
                2, 2, qp, {"luma_blocks": {0: {0: 7, 3: -2}, 5: {1: 4}}})
            assert _diff_check(es) == 1

    def test_cavlc_i16_and_chroma(self):
        es = h264_gen.make_stream(2, 2, 28, {"i16_dc": [5, -3] + [0] * 14})
        _diff_check(es)
        es = h264_gen.make_stream(
            2, 2, 23, {"chroma_dc": ([3, -1, 0, 2], [1, 0, 0, -4])})
        _diff_check(es)

    def test_cavlc_level_escapes(self):
        es = h264_gen.make_stream(2, 2, 4, {"luma_blocks": {
            0: {i: (1 << 12) + 700 * i for i in range(4)}}})
        _diff_check(es)

    def test_cavlc_8x8(self):
        co = [0] * 64
        co[0], co[7], co[30] = 9, -5, 2
        es = h264_gen.make_stream(2, 2, 30, {"luma8_blocks": {0: co}},
                                  transform_8x8=True)
        _diff_check(es)

    def test_cabac_crafted(self):
        co = [0] * 64
        co[0], co[5], co[63] = 12, -7, 3
        es = h264_gen.make_cabac_stream(23, {0: co})
        _diff_check(es)

    def test_cabac_pslice_crafted(self):
        blk = [5, 0, -3, 1] + [0] * 12
        es = h264_gen.cabac_pslice_stream(26, {
            0: {"type": 0, "mvds": [(1, 1)]},
            5: {"type": 2, "mvds": [(1, 2), (0, 1)], "blocks": {0: blk}},
        })
        _diff_check(es)

    def test_ipcm_cavlc(self):
        # hand-rolled I_PCM macroblocks (mb_type 25): raw sample write +
        # nnz=16 side effects (h264_ref.py:2565-2580)
        from amatsukaze_tpu.utils.bits import BitWriter

        rng = np.random.default_rng(3)
        w = BitWriter()
        h264_gen._ue(w, 0)   # first_mb
        h264_gen._ue(w, 7)   # slice_type I
        h264_gen._ue(w, 0)   # pps_id
        w.write(0, 4)        # frame_num
        h264_gen._ue(w, 0)   # idr_pic_id
        w.write(0, 1)
        w.write(0, 1)
        h264_gen._se(w, 0)   # slice_qp_delta
        h264_gen._ue(w, 1)   # disable deblocking
        pcm = rng.integers(0, 256, (4, 384)).astype(np.uint8)
        for mb in range(4):
            h264_gen._ue(w, 25)  # I_PCM
            w.byte_align()
            w.write_bytes(pcm[mb].tobytes())
        h264_gen._trailing(w)
        es = (h264_gen.sps_nal(2, 2) + h264_gen.pps_nal()
              + h264_gen._nal(w.getvalue(), 3, 5))
        assert _diff_check(es) == 1


@needs_x264
class TestX264Matrix:
    """libx264 encodes across the feature matrix, both entropy coders."""

    def test_intra_cavlc(self):
        frames = _smooth_frames(64, 64, 4)
        es = _x264_stream(64, 64, frames, "keyint=1:cabac=0:8x8dct=0:qp=24")
        assert _diff_check(es) == 4

    def test_p_multiref_subpel(self):
        frames = _motion_frames(8, (64, 64))
        es = _x264_stream(
            64, 64, frames,
            "cabac=0:8x8dct=0:bframes=0:keyint=50:ref=4:subme=7:qp=22")
        _diff_check(es)

    def test_p_all_partitions(self):
        frames = _motion_frames(8, (64, 64))
        es = _x264_stream(
            64, 64, frames, "cabac=0:8x8dct=0:bframes=0:keyint=50:"
            "partitions=all:subme=9:crf=24")
        _diff_check(es)

    def test_p_weightp_fade(self):
        frames = _motion_frames(8, (64, 64), fade=True)
        es = _x264_stream(
            64, 64, frames,
            "cabac=0:8x8dct=0:bframes=0:keyint=4:weightp=2:ref=3:qp=30")
        _diff_check(es)

    def test_b_spatial_direct(self):
        frames = _motion_frames(10, (64, 64))
        es = _x264_stream(64, 64, frames,
                          "cabac=0:8x8dct=0:keyint=50:b-adapt=0:qp=26",
                          bframes=2)
        _diff_check(es)

    def test_b_temporal_direct(self):
        frames = _motion_frames(10, (64, 64))
        es = _x264_stream(
            64, 64, frames,
            "cabac=0:8x8dct=0:keyint=50:b-adapt=0:direct=temporal:qp=26",
            bframes=2)
        _diff_check(es)

    def test_b_pyramid_weightb(self):
        frames = _motion_frames(16, (64, 64), fade=True)
        es = _x264_stream(
            64, 64, frames, "cabac=0:8x8dct=0:keyint=50:ref=3:"
            "b-pyramid=normal:weightb=1:qp=28", bframes=3)
        _diff_check(es)

    def test_8x8_cavlc(self):
        frames = _motion_frames(8, (64, 64))
        es = _x264_stream(64, 64, frames,
                          "cabac=0:8x8dct=1:keyint=50:ref=2:qp=25")
        _diff_check(es)

    def test_cabac_i_p_b(self):
        frames = _motion_frames(10, (64, 64))
        es = _x264_stream(64, 64, frames,
                          "cabac=1:8x8dct=0:keyint=50:b-adapt=0:qp=26",
                          bframes=2)
        _diff_check(es)

    def test_cabac_8x8_weightp(self):
        frames = _motion_frames(12, (64, 64), fade=True)
        es = _x264_stream(
            64, 64, frames, "cabac=1:8x8dct=1:keyint=50:weightp=2:"
            "b-adapt=0:ref=3:qp=24", bframes=3)
        _diff_check(es)

    def test_scaling_matrices(self):
        frames = _smooth_frames(64, 64, 6)
        es = _x264_stream(64, 64, frames,
                          "cabac=1:8x8dct=1:keyint=50:cqm=jvt:qp=26")
        _diff_check(es)

    def test_multi_slice(self):
        frames = _motion_frames(8, (64, 64))
        es = _x264_stream(64, 64, frames,
                          "cabac=0:8x8dct=0:keyint=50:slices=3:qp=26")
        _diff_check(es)

    def test_multi_idr_display_order(self):
        frames = _motion_frames(12, (64, 64))
        es = _x264_stream(64, 64, frames,
                          "cabac=1:8x8dct=1:keyint=4:b-adapt=0:qp=26",
                          bframes=2)
        _diff_check(es)

    def test_qp_extremes(self):
        frames = _smooth_frames(48, 48, 4)
        for qp in (0, 51):
            es = _x264_stream(48, 48, frames,
                              f"cabac=1:8x8dct=1:keyint=50:qp={qp}")
            _diff_check(es)

    def test_qcif(self):
        frames = _motion_frames(6, (176, 144))
        es = _x264_stream(176, 144, frames,
                          "cabac=1:8x8dct=1:keyint=50:b-adapt=0:crf=26",
                          bframes=2)
        _diff_check(es)

    def test_chunked_feed(self):
        # streaming equivalence: NAL-boundary chunked pushes == one push
        frames = _motion_frames(10, (64, 64))
        es = _x264_stream(64, 64, frames,
                          "cabac=1:8x8dct=1:keyint=6:b-adapt=0:qp=26",
                          bframes=2)
        _diff_check(es, chunked=True)


@needs_x264
class TestMbaffNative:
    """Native engine vs oracle on interlaced (MBAFF) streams."""

    def _frames(self, kind, n, size):
        from test_h264_mbaff import interlaced_frames, mixed_frames

        return (interlaced_frames if kind == "field" else mixed_frames)(
            n, size)

    def test_intra_mixed(self):
        es = _x264_stream(128, 96, self._frames("mixed", 3, (128, 96)),
                          "keyint=1:cabac=0:8x8dct=0:interlaced=1:tff=1:"
                          "qp=30")
        _diff_check(es)

    def test_p_cavlc(self):
        es = _x264_stream(128, 96, self._frames("mixed", 8, (128, 96)),
                          "cabac=0:8x8dct=0:interlaced=1:tff=1:keyint=50:"
                          "scenecut=0:bframes=0:ref=2:qp=28")
        _diff_check(es)

    def test_b_cavlc_deblock(self):
        from amatsukaze_tpu.video.avdec import AvVideoEncoder
        frames = self._frames("mixed", 8, (128, 96))
        enc = AvVideoEncoder(128, 96, 30, 1, crf=20, preset="veryfast",
                             bframes=2, x264_params="cabac=0:8x8dct=1:"
                             "interlaced=1:tff=1:keyint=50:scenecut=0:"
                             "b-adapt=0:ref=2:qp=27")
        es = b"".join(sum([enc.encode(*f) for f in frames], [])
                      + enc.flush())
        _diff_check(es)

    def test_p_cabac_8x8(self):
        es = _x264_stream(128, 96, self._frames("mixed", 8, (128, 96)),
                          "cabac=1:8x8dct=1:interlaced=1:tff=1:keyint=50:"
                          "scenecut=0:bframes=0:ref=3:subme=7:qp=25")
        _diff_check(es)

    def test_b_cabac_pyramid_field(self):
        es = _x264_stream(96, 96, self._frames("field", 8, (96, 96)),
                          "cabac=1:8x8dct=1:interlaced=1:tff=1:keyint=50:"
                          "scenecut=0:b-adapt=0:ref=3:b-pyramid=normal:"
                          "qp=26", bframes=3)
        _diff_check(es)

    def test_multi_idr_chunked(self):
        es = _x264_stream(128, 96, self._frames("mixed", 10, (128, 96)),
                          "cabac=1:8x8dct=1:interlaced=1:tff=1:keyint=4:"
                          "scenecut=0:b-adapt=0:ref=2:qp=26", bframes=2)
        _diff_check(es, chunked=True)
