"""MBAFF (interlaced) H.264 decoding vs libavcodec (bit-exact).

x264's interlaced mode emits MBAFF frames; libavcodec arbitrates every
stage of video/h264_mbaff.py, on content engineered to produce pure
frame-pair, pure field-pair, and MIXED frame/field-pair pictures (the
mixed case exercises the 6.4.10 cross-interleave neighbour derivation).
"""

import numpy as np
import pytest

from amatsukaze_tpu.video import h264_ref as HR
from amatsukaze_tpu.video.avdec import avdec_available

from test_h264_decode import (_ff_decode, _motion_frames, _ref_decode,
                              _smooth_frames, _x264_stream)

pytestmark = pytest.mark.skipif(
    not avdec_available(), reason="FFmpeg bridge unavailable")


def interlaced_frames(n, size):
    """Weave fields from consecutive motion phases: true comb structure
    (x264 codes these pairs as field)."""
    src = _motion_frames(2 * n, size)
    out = []
    for i in range(n):
        (y0, u0, v0), (y1, u1, v1) = src[2 * i], src[2 * i + 1]
        y = y0.copy()
        y[1::2] = y1[1::2]
        u = u0.copy()
        u[1::2] = u1[1::2]
        v = v0.copy()
        v[1::2] = v1[1::2]
        out.append((y, u, v))
    return out


def mixed_frames(n, size):
    """Left half static progressive (frame pairs), right half combed
    motion (field pairs) -> pictures with both pair types."""
    w, h = size
    mv = interlaced_frames(n, size)
    stat = _smooth_frames(w, h, 1, seed=42)[0]
    out = []
    for y, u, v in mv:
        y = y.copy()
        u = u.copy()
        v = v.copy()
        y[:, : w // 2] = stat[0][:, : w // 2]
        u[:, : w // 4] = stat[1][:, : w // 4]
        v[:, : w // 4] = stat[2][:, : w // 4]
        out.append((y, u, v))
    return out


def _assert_equal(ff, rf):
    assert len(ff) == len(rf)
    for i, (a, b) in enumerate(zip(ff, rf)):
        for name, p, q in zip("YUV", a[:3], b[:3]):
            assert np.array_equal(p, q), (
                f"frame {i} plane {name}: "
                f"{np.count_nonzero(p.astype(int) != q.astype(int))} diffs")


def _field_pair_stats(es):
    dec = HR.H264RefDecoder()
    dec.decode(es)
    dec.flush()
    tot = fld = 0
    for pic in dec._out + dec.dpb:
        stt = getattr(pic, "mbaff", None)
        if stt is None:
            continue
        tot += stt.n_pairs
        fld += int(stt.field_flag.sum())
    return fld, tot


def _check(es, tmp_path, want_field=None, want_frame=None):
    _assert_equal(_ff_decode(es, tmp_path), _ref_decode(es))
    fld, tot = _field_pair_stats(es)
    if want_field:
        assert fld > 0, "stream has no field pairs"
    if want_frame:
        assert fld < tot, "stream has no frame pairs"


class TestMbaffIntra:
    def test_frame_pairs(self, tmp_path):
        frames = _smooth_frames(64, 64, 4)
        es = _x264_stream(
            64, 64, frames,
            "keyint=1:cabac=0:8x8dct=0:no-deblock=1:interlaced=1:tff=1:qp=26")
        _check(es, tmp_path)

    def test_field_pairs(self, tmp_path):
        frames = interlaced_frames(4, (96, 96))
        es = _x264_stream(
            96, 96, frames,
            "keyint=1:cabac=0:8x8dct=0:no-deblock=1:interlaced=1:tff=1:qp=26")
        _check(es, tmp_path, want_field=True)

    def test_mixed_pairs(self, tmp_path):
        frames = mixed_frames(4, (128, 96))
        es = _x264_stream(
            128, 96, frames,
            "keyint=1:cabac=0:8x8dct=0:no-deblock=1:interlaced=1:tff=1:qp=30")
        _check(es, tmp_path, want_field=True, want_frame=True)

    def test_mixed_8x8(self, tmp_path):
        frames = mixed_frames(4, (128, 96))
        es = _x264_stream(
            128, 96, frames,
            "keyint=1:cabac=0:8x8dct=1:no-deblock=1:interlaced=1:tff=1:crf=30")
        _check(es, tmp_path, want_field=True, want_frame=True)

    def test_low_qp(self, tmp_path):
        frames = interlaced_frames(3, (64, 64))
        es = _x264_stream(
            64, 64, frames,
            "keyint=1:cabac=0:8x8dct=1:no-deblock=1:interlaced=1:tff=1:qp=8")
        _check(es, tmp_path, want_field=True)


class TestMbaffP:
    BASE = ("cabac=0:8x8dct=0:no-deblock=1:interlaced=1:tff=1:bframes=0:"
            "keyint=50:scenecut=0")

    def _check(self, tmp_path, params, frames=None, size=(128, 96)):
        if frames is None:
            frames = mixed_frames(8, size)
        es = _x264_stream(size[0], size[1], frames, params)
        _assert_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_basic(self, tmp_path):
        self._check(tmp_path, self.BASE + ":ref=1:qp=28")

    def test_multiref_subpel(self, tmp_path):
        self._check(tmp_path, self.BASE + ":ref=4:subme=7:qp=24")

    def test_all_partitions(self, tmp_path):
        self._check(tmp_path, self.BASE + ":partitions=all:subme=9:crf=26")

    def test_8x8dct(self, tmp_path):
        self._check(tmp_path, self.BASE.replace("8x8dct=0", "8x8dct=1")
                    + ":ref=2:qp=26")

    def test_all_field_pairs(self, tmp_path):
        self._check(tmp_path, self.BASE + ":ref=2:qp=26",
                    frames=interlaced_frames(8, (96, 96)), size=(96, 96))

    def test_multi_idr(self, tmp_path):
        self._check(tmp_path, self.BASE + ":ref=2:keyint=4:qp=26")


class TestMbaffB:
    BASE = ("cabac=0:8x8dct=0:no-deblock=1:interlaced=1:tff=1:keyint=50:"
            "scenecut=0:b-adapt=0")

    def _check(self, tmp_path, params, bframes=2, frames=None,
               size=(128, 96)):
        if frames is None:
            frames = mixed_frames(10, size)
        es = _x264_stream(size[0], size[1], frames, params, bframes=bframes)
        _assert_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_basic(self, tmp_path):
        self._check(tmp_path, self.BASE + ":ref=2:qp=28")

    def test_multiref_3bf(self, tmp_path):
        self._check(tmp_path, self.BASE + ":ref=3:subme=7:qp=25", bframes=3)

    def test_partitions_8x8dct(self, tmp_path):
        self._check(tmp_path, self.BASE.replace("8x8dct=0", "8x8dct=1")
                    + ":ref=2:partitions=all:subme=9:crf=27")

    def test_all_field(self, tmp_path):
        self._check(tmp_path, self.BASE + ":ref=2:qp=26",
                    frames=interlaced_frames(10, (96, 96)), size=(96, 96))

    def test_b_pyramid(self, tmp_path):
        self._check(tmp_path, self.BASE + ":ref=3:b-pyramid=normal:qp=27",
                    bframes=3)

    def test_multi_idr(self, tmp_path):
        self._check(tmp_path, self.BASE + ":ref=2:keyint=4:qp=26")


class TestMbaffDeblock:
    """Deblocking ON (8.7 with MbaffFrameFlag): frame/field/mixed edges,
    two-pass mixed top edges, field MV thresholds, slice offsets."""

    BASE = "cabac=0:interlaced=1:tff=1:keyint=50:scenecut=0:b-adapt=0"

    def _check(self, tmp_path, params, bframes=0, frames=None,
               size=(128, 96)):
        if frames is None:
            frames = mixed_frames(8, size)
        es = _x264_stream(size[0], size[1], frames, params, bframes=bframes)
        _assert_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_intra_mixed(self, tmp_path):
        self._check(tmp_path, "keyint=1:cabac=0:8x8dct=0:interlaced=1:"
                    "tff=1:qp=32", frames=mixed_frames(3, (128, 96)))

    def test_intra_8x8(self, tmp_path):
        self._check(tmp_path, "keyint=1:cabac=0:8x8dct=1:interlaced=1:"
                    "tff=1:qp=28", frames=mixed_frames(3, (128, 96)))

    def test_p(self, tmp_path):
        self._check(tmp_path, self.BASE + ":8x8dct=0:bframes=0:ref=2:qp=30")

    def test_p_offsets(self, tmp_path):
        self._check(tmp_path, self.BASE
                    + ":8x8dct=0:bframes=0:ref=2:qp=30:deblock=2,-1")

    def test_p_all_field(self, tmp_path):
        self._check(tmp_path, self.BASE + ":8x8dct=0:bframes=0:ref=2:qp=28",
                    frames=interlaced_frames(8, (96, 96)), size=(96, 96))

    def test_b_8x8_multiref(self, tmp_path):
        self._check(tmp_path, self.BASE + ":8x8dct=1:ref=3:subme=7:crf=28",
                    bframes=2)

    def test_b_pyramid(self, tmp_path):
        self._check(tmp_path, self.BASE
                    + ":8x8dct=1:ref=3:b-pyramid=normal:qp=28", bframes=3)

    def test_b_all_field(self, tmp_path):
        self._check(tmp_path, self.BASE + ":8x8dct=1:ref=2:qp=26",
                    bframes=2, frames=interlaced_frames(10, (96, 96)),
                    size=(96, 96))

    def test_partitions(self, tmp_path):
        self._check(tmp_path, self.BASE
                    + ":8x8dct=1:bframes=0:partitions=all:subme=9:crf=27")


class TestMbaffCabac:
    """CABAC MBAFF: pair-aware skip/field-flag contexts, field residual
    context blocks (277/338, 436/451 + the field 8x8 significance map)."""

    BASE = "cabac=1:interlaced=1:tff=1:keyint=50:scenecut=0:b-adapt=0"

    def _check(self, tmp_path, params, bframes=0, frames=None,
               size=(128, 96)):
        if frames is None:
            frames = mixed_frames(10, size)
        es = _x264_stream(size[0], size[1], frames, params, bframes=bframes)
        _assert_equal(_ff_decode(es, tmp_path), _ref_decode(es))

    def test_intra_mixed(self, tmp_path):
        self._check(tmp_path, "keyint=1:cabac=1:8x8dct=0:interlaced=1:"
                    "tff=1:qp=30", frames=mixed_frames(3, (128, 96)))

    def test_intra_8x8_field(self, tmp_path):
        self._check(tmp_path, "keyint=1:cabac=1:8x8dct=1:interlaced=1:"
                    "tff=1:qp=26", frames=interlaced_frames(3, (96, 96)),
                    size=(96, 96))

    def test_p(self, tmp_path):
        self._check(tmp_path, self.BASE + ":8x8dct=0:bframes=0:ref=2:qp=28")

    def test_p_8x8_multiref(self, tmp_path):
        self._check(tmp_path, self.BASE
                    + ":8x8dct=1:bframes=0:ref=3:subme=7:qp=25")

    def test_b(self, tmp_path):
        self._check(tmp_path, self.BASE + ":8x8dct=1:ref=2:qp=27",
                    bframes=2)

    def test_b_pyramid_field(self, tmp_path):
        self._check(tmp_path, self.BASE
                    + ":8x8dct=1:ref=3:b-pyramid=normal:qp=26",
                    bframes=3, frames=interlaced_frames(10, (96, 96)),
                    size=(96, 96))

    def test_partitions(self, tmp_path):
        self._check(tmp_path, self.BASE
                    + ":8x8dct=1:bframes=0:partitions=all:subme=9:crf=27")

    def test_multi_idr(self, tmp_path):
        self._check(tmp_path, self.BASE + ":8x8dct=1:ref=2:keyint=4:qp=26",
                    bframes=2)


class TestMbaffPipeline:
    def test_interlaced_ts_inbuild_decode(self, tmp_path):
        """An interlaced (MBAFF) H.264 TS decodes through the pipeline's
        in-build chain (conf.h264_decoder='native' routes MBAFF streams
        to the oracle engine); output bit-identical to the libav-bridge
        decode."""
        import stat

        import ts_gen
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.utils.context import AMTContext
        from amatsukaze_tpu.video.avdec import AvH264Encoder

        W, H, n = 96, 64, 10
        frames = mixed_frames(n, (W, H))
        enc = AvH264Encoder(
            W, H, crf=20, bframes=2,
            x264_params="pic-struct=1:nal-hrd=vbr:force-cfr=1:aud=1:"
            "interlaced=1:tff=1:keyint=8:scenecut=0:b-adapt=0")
        aus = []
        for y, u, v in frames:
            aus.extend(enc.encode(y, u, v))
        aus.extend(enc.flush())
        src = tmp_path / "mbaff.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H, video_es_frames=aus, video_stream_type=0x1B))
        fake = tmp_path / "fake_x264"
        fake.write_text(
            '#!/bin/bash\nout=""\nwhile [ $# -gt 0 ]; do case "$1" in '
            '-o) out="$2"; shift 2;; *) shift;; esac; done\ncat > "$out"\n')
        fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

        outs = {}
        for mode, sub in (("avlib", "a"), ("native", "b")):
            wd = tmp_path / sub
            wd.mkdir()
            conf = Config()
            conf.src_file_path = str(src)
            conf.out_video_path = str(wd / "out")
            conf.out_info_json_path = str(wd / "r.json")
            conf.work_dir = str(wd)
            conf.encoder_path = str(fake)
            conf.h264_decoder = mode
            conf.no_remove_tmp = True
            ctx = AMTContext(level="error")
            pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                     decoder_factory=default_decoder_factory())
            report = pipe.run()
            outs[mode] = open(report["outfiles"][0]["path"], "rb").read()
        assert outs["avlib"] == outs["native"]
        assert outs["native"].count(b"FRAME\n") >= n - 3


# ---------------------------------------------------------------------------
# Temporal direct (8.4.1.2.3) in MBAFF frames. x264 forces spatial
# direct for interlaced encodes, so the streams are re-headered:
# direct_spatial_mv_pred_flag is flipped 1->0 in every B slice header
# (a fixed 1-bit field, so the CABAC/CAVLC payload is untouched and
# every direct MB now decodes through the temporal path). libavcodec
# arbitrates the re-headered stream; reference parity:
# Amatsukaze decodes such streams via FFmpeg (ReaderWriterFFmpeg.hpp).
# ---------------------------------------------------------------------------


def _rbsp_escape(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def flip_direct_flag(es: bytes) -> bytes:
    """Flip direct_spatial_mv_pred_flag (1 -> 0) in every B slice."""
    from amatsukaze_tpu.utils.bits import BitReader
    sps_map, pps_map = {}, {}
    out = bytearray()
    flipped = 0
    for nal in HR.split_annexb(es):
        t = nal[0] & 0x1F
        rbsp = HR.ebsp_to_rbsp(nal[1:])
        if t == 7:
            s = HR.parse_sps(rbsp)
            sps_map[s.sps_id] = s
        elif t == 8:
            p = HR.parse_pps(rbsp, sps_map)
            pps_map[p.pps_id] = p
        elif t in (1, 5):
            r = BitReader(rbsp)
            r.ue()                        # first_mb_in_slice
            st = r.ue()
            if st % 5 == 1:               # B slice
                pps = pps_map[r.ue()]
                sps = sps_map[pps.sps_id]
                if sps.separate_colour_plane:
                    r.read(2)
                r.read(sps.log2_max_frame_num)
                field = 0
                if not sps.frame_mbs_only:
                    field = r.read(1)
                    if field:
                        r.read(1)
                if t == 5:
                    r.ue()                # idr_pic_id
                if sps.poc_type == 0:
                    r.read(sps.log2_max_poc_lsb)
                    if pps.bottom_field_pic_order_in_frame_present \
                            and not field:
                        r.se()
                elif sps.poc_type == 1 and \
                        not sps.delta_pic_order_always_zero:
                    r.se()
                    if pps.bottom_field_pic_order_in_frame_present \
                            and not field:
                        r.se()
                if pps.redundant_pic_cnt_present:
                    r.ue()
                pos = r.pos               # direct_spatial_mv_pred_flag
                assert r.read(1) == 1, "expected spatial-direct stream"
                buf = bytearray(rbsp)
                buf[pos >> 3] ^= 0x80 >> (pos & 7)
                nal = nal[:1] + _rbsp_escape(bytes(buf))
                flipped += 1
        out += b"\x00\x00\x01" + nal
    assert flipped > 0, "no B slices found"
    return bytes(out)


def _native_decode(es: bytes):
    from amatsukaze_tpu.video.native import (NativeH264Decoder,
                                             h264_native_available)
    if not h264_native_available():
        return None
    dec = NativeH264Decoder()
    out = list(dec.decode(es))
    out += list(dec.flush())
    return out


class TestMbaffTemporalDirect:
    BASE = ("cabac=0:8x8dct=0:no-deblock=1:interlaced=1:tff=1:keyint=50:"
            "scenecut=0:b-adapt=0")

    def _check(self, tmp_path, params, bframes=2, frames=None,
               size=(128, 96)):
        if frames is None:
            frames = mixed_frames(10, size)
        es = flip_direct_flag(
            _x264_stream(size[0], size[1], frames, params, bframes=bframes))
        ff = _ff_decode(es, tmp_path)
        assert ff, "libavcodec rejected the re-headered stream"
        _assert_equal(ff, _ref_decode(es))
        nat = _native_decode(es)
        if nat is not None:
            _assert_equal(ff, nat)

    def test_mixed_pairs(self, tmp_path):
        # mixed frame/field MB pairs: One_To_One, Frm_To_Fld and
        # Fld_To_Frm colocated scaling all occur
        self._check(tmp_path, self.BASE + ":ref=2:qp=28")

    def test_all_field_pairs(self, tmp_path):
        self._check(tmp_path, self.BASE + ":ref=2:qp=26",
                    frames=interlaced_frames(10, (96, 96)), size=(96, 96))

    def test_multiref(self, tmp_path):
        # ref=3 makes refIdxL0 mapping land beyond index 0
        self._check(tmp_path, self.BASE + ":ref=3:subme=7:qp=25",
                    bframes=3)

    def test_b_pyramid(self, tmp_path):
        # B pictures used as colocated references
        self._check(tmp_path, self.BASE + ":ref=3:b-pyramid=normal:qp=27",
                    bframes=3)

    def test_cabac(self, tmp_path):
        self._check(tmp_path, self.BASE.replace("cabac=0", "cabac=1")
                    + ":ref=2:qp=27")
