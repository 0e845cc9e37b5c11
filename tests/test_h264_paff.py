"""PAFF (field-picture) H.264 decoding vs libavcodec (bit-exact).

No PAFF encoder exists in this environment, so streams are synthesized
by re-heading progressive half-height x264 encodes as coded fields
(tests/paff_gen.py) — the slice data parses identically and libavcodec
arbitrates the FIELD-semantics interpretation (field scans, field
reference lists with per-field reference marking, cross-parity chroma MV
adjustment, field deblocking rules).  CAVLC I/P configurations validate
bit-exactly; B fields and CABAC cannot come from re-heading (B decode
order breaks the pairing; CABAC re-heading desyncs into encoder-side
concealment), so those paths are pinned by HAND-WRITTEN streams that
libavcodec arbitrates: crafted CABAC field pictures for the field
context blocks (crafted_cabac_field_stream) and crafted CAVLC B-field
sequences for field B lists / direct modes / implicit weighting
(crafted_b_field_stream, TestPaffB), on top of the MBAFF suite's
coverage of the shared machinery.
"""

import numpy as np
import pytest

from amatsukaze_tpu.video.avdec import avdec_available

import paff_gen
from test_h264_decode import (_ff_decode, _motion_frames, _ref_decode,
                              _smooth_frames, _x264_stream)

pytestmark = pytest.mark.skipif(
    not avdec_available(), reason="FFmpeg bridge unavailable")


def _native_decode(es):
    from amatsukaze_tpu.video.native import (NativeH264Decoder,
                                             h264_native_available)

    if not h264_native_available():
        return None
    dec = NativeH264Decoder()
    frames = dec.decode(es) + dec.flush()
    assert dec.errors == 0
    return [(y, u, v) for (y, u, v, _poc) in frames]


def _compare_all(tmp_path, paff):
    """libavcodec vs oracle vs native engine, all bit-exact."""
    ff = _ff_decode(paff, tmp_path)
    rf = _ref_decode(paff)
    assert len(ff) == len(rf)
    for i, (a, b) in enumerate(zip(ff, rf)):
        for name, p, q in zip("YUV", a[:3], b[:3]):
            assert np.array_equal(p, q), (
                f"oracle frame {i} plane {name}: "
                f"{np.count_nonzero(p.astype(int) != q.astype(int))} diffs")
    nf = _native_decode(paff)
    if nf is not None:
        assert len(ff) == len(nf)
        for i, (a, b) in enumerate(zip(ff, nf)):
            for name, p, q in zip("YUV", a[:3], b[:3]):
                assert np.array_equal(p, q), (
                    f"native frame {i} plane {name}: "
                    f"{np.count_nonzero(p.astype(int) != q.astype(int))}"
                    " diffs")
    return ff


def _check(tmp_path, params, n=12, size=(96, 48)):
    fields = _motion_frames(n, size)
    es = _x264_stream(size[0], size[1], fields, params)
    paff = paff_gen.rewrite_to_paff(es)
    _compare_all(tmp_path, paff)


class TestPaffIntra:
    def test_all_intra(self, tmp_path):
        _check(tmp_path, "keyint=1:cabac=0:8x8dct=0:no-deblock=1:qp=26",
               n=8)

    def test_all_intra_deblock(self, tmp_path):
        _check(tmp_path, "keyint=1:cabac=0:8x8dct=0:qp=28", n=8)

    def test_intra_smooth(self, tmp_path):
        fields = _smooth_frames(96, 48, 6)
        es = _x264_stream(96, 48, fields,
                          "keyint=1:cabac=0:8x8dct=0:no-deblock=1:qp=20")
        paff = paff_gen.rewrite_to_paff(es)
        ff = _compare_all(tmp_path, paff)
        assert len(ff) == 3


class TestPaffP:
    BASE = "cabac=0:8x8dct=0:bframes=0:keyint=50:scenecut=0"

    def test_ref1(self, tmp_path):
        # single-reference: the first field's sliding-window eviction
        # leaves the complementary field as the only reference
        _check(tmp_path, self.BASE + ":no-deblock=1:ref=1:qp=26")

    def test_multiref_subpel(self, tmp_path):
        _check(tmp_path, self.BASE + ":no-deblock=1:ref=3:subme=7:qp=24")

    def test_deblock(self, tmp_path):
        _check(tmp_path, self.BASE + ":ref=2:qp=28")

    def test_all_partitions(self, tmp_path):
        _check(tmp_path, self.BASE
               + ":no-deblock=1:partitions=all:subme=9:crf=26")

    def test_8x8dct(self, tmp_path):
        _check(tmp_path, "cabac=0:8x8dct=1:bframes=0:keyint=50:scenecut=0:"
               "no-deblock=1:ref=2:qp=26")

    def test_multi_idr(self, tmp_path):
        _check(tmp_path, self.BASE + ":ref=2:keyint=4:qp=26")

    def test_larger(self, tmp_path):
        # field height a multiple of 16 (the in-build decoders emit
        # uncropped planes)
        _check(tmp_path, self.BASE + ":ref=2:qp=27", n=8, size=(176, 80))


class TestPaffB:
    """B FIELD pictures — hand-written CAVLC PAFF streams
    (paff_gen.crafted_b_field_stream: I_PCM anchors, pure-MC P/B
    fields), since the re-heading trick cannot express B fields.
    Exercises field B reference lists (8.2.4.2.5 before/after parity
    alternation), spatial AND temporal direct in coded fields, implicit
    bi-prediction weights from field POCs, B skip, cross-parity
    references and field deblocking over B edges; libavcodec, the
    oracle and the native engine must agree bit-exactly."""

    def _run(self, tmp_path, seed, **kw):
        es = paff_gen.crafted_b_field_stream(seed=seed, **kw)
        ff = _compare_all(tmp_path, es)
        assert len(ff) == 4

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_spatial_direct(self, tmp_path, seed):
        self._run(tmp_path, seed, direct_spatial=1)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_temporal_direct(self, tmp_path, seed):
        self._run(tmp_path, seed, direct_spatial=0)

    def test_implicit_weighting(self, tmp_path):
        self._run(tmp_path, 4, implicit=True)

    def test_implicit_temporal(self, tmp_path):
        self._run(tmp_path, 5, implicit=True, direct_spatial=0)

    def test_deblock(self, tmp_path):
        self._run(tmp_path, 6, deblock=True)

    def test_bottom_field_first(self, tmp_path):
        self._run(tmp_path, 7, parity0=1, direct_spatial=0)


class TestPaffCabac:
    """Hand-written CABAC FIELD pictures: libavcodec arbitrates the field
    CABAC context blocks (sig 436+, last 451+ with SIG_COEFF_8x8_FIELD)
    as exercised by the PAFF field_pic_flag=1 path."""

    def _probe(self, tmp_path, qp, coeffs, parity=0):
        es = paff_gen.crafted_cabac_field_stream(qp, coeffs, parity)
        ff = _compare_all(tmp_path, es)
        assert len(ff) == 1

    @pytest.mark.parametrize("pos", [0, 1, 7, 17, 33, 40, 55, 62, 63])
    def test_single_coeff_positions(self, tmp_path, pos):
        co = [0] * 64
        co[pos] = 6 if pos else 9
        self._probe(tmp_path, 24, co)

    def test_dense_block(self, tmp_path):
        co = [(i % 5) - 2 for i in range(64)]
        co[0] = 11
        self._probe(tmp_path, 27, co)

    def test_bottom_field_first(self, tmp_path):
        co = [0] * 64
        co[3] = -4
        co[29] = 2
        self._probe(tmp_path, 23, co, parity=1)


class TestPaffPipeline:
    def test_paff_ts_inbuild_decode(self, tmp_path):
        """A PAFF H.264 TS decodes through the pipeline's in-build chain
        (the native C++ engine covers field-picture streams; the oracle
        is the fallback); output bit-identical to the libav-bridge
        decode."""
        import stat

        import ts_gen
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.utils.context import AMTContext

        W, H, n = 96, 48, 12  # fields; frames are 96x96
        fields = _motion_frames(n, (W, H))
        es = _x264_stream(W, H, fields,
                          "cabac=0:8x8dct=0:bframes=0:keyint=6:scenecut=0:"
                          "ref=2:qp=26:aud=1")
        paff = paff_gen.rewrite_to_paff(es)
        # one PES frame per FIELD PAIR (both field AUs together — the
        # reference parser pairs fields within one PES frame,
        # H264VideoParser.hpp:651)
        idx = [i for i in range(len(paff) - 4)
               if paff[i : i + 5] == b"\x00\x00\x00\x01\x09"]
        idx.append(len(paff))
        chunks = [paff[a:b] for a, b in zip(idx, idx[1:])]
        aus = [chunks[i] + chunks[i + 1] for i in range(0, len(chunks) - 1, 2)]
        head = paff[: idx[0]]
        aus[0] = head + aus[0]
        src = tmp_path / "paff.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H * 2, video_es_frames=aus,
            video_stream_type=0x1B))
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
        assert outs["native"].count(b"FRAME\n") >= n // 2 - 2
