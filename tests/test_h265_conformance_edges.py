"""HEVC conformance edges x265 cannot emit, on crafted streams.

h265_craft.py hand-encodes (real CABAC, spec 9.3.4) streams using
IPCM, tiles, dependent slice segments and long-term reference
pictures; libavcodec arbitrates and the in-build oracle — plus the
native engine where built — must match it plane-exactly. Reference
parity: the upstream project decodes all of these through FFmpeg
(Amatsukaze/ReaderWriterFFmpeg.hpp:256-483); this proves the
standalone decoders on the same features.
"""

import numpy as np
import pytest

from amatsukaze_tpu.video import h265_ref as HR
from amatsukaze_tpu.video.avdec import avdec_available

import h265_craft as C

pytestmark = pytest.mark.skipif(
    not avdec_available(), reason="FFmpeg bridge unavailable")


def _ff_decode(es: bytes, tmp_path):
    from amatsukaze_tpu.video.avdec import AvVideoDecoder
    p = tmp_path / "probe.h265"
    p.write_bytes(es)
    return [(y.copy(), u.copy(), v.copy())
            for y, u, v in AvVideoDecoder(str(p)).frames()]


def _ref_decode(es: bytes):
    dec = HR.H265RefDecoder()
    return dec.decode(es) + dec.flush()


def _native_decode(es: bytes):
    from amatsukaze_tpu.video.native import (h265_native_available,
                                             NativeH265Decoder)
    if not h265_native_available():
        return None
    dec = NativeH265Decoder()
    out = list(dec.decode(es))
    out += list(dec.flush())
    return out


def _assert_equal(ref, got, tag):
    assert len(ref) == len(got), (tag, len(ref), len(got))
    for i, (rf, gf) in enumerate(zip(ref, got)):
        for name, a, b in zip("YUV", rf[:3], gf[:3]):
            assert a.shape == b.shape, (tag, i, name, a.shape, b.shape)
            assert np.array_equal(a, b), (
                f"{tag} frame {i} plane {name}: "
                f"{np.count_nonzero(a.astype(int) != b.astype(int))}"
                f" diffs of {a.size}")


def _check(es: bytes, tmp_path, tag: str):
    ff = _ff_decode(es, tmp_path)
    assert ff, f"{tag}: libavcodec produced no frames"
    _assert_equal(ff, _ref_decode(es), tag + " (oracle)")
    nat = _native_decode(es)
    if nat is not None:
        _assert_equal(ff, nat, tag + " (native)")
    return ff


class TestPcm:
    def test_pcm_picture(self, tmp_path):
        es, frames = C.pcm_stream(64, 48, 1)
        out = _check(es, tmp_path, "pcm")
        # PCM is lossless; only the in-loop deblock may move samples,
        # and CU interiors away from 8x8 edges must survive verbatim
        y = out[0][0]
        assert np.array_equal(y[4:8, 4:8], frames[0][0][4:8, 4:8])

    def test_pcm_multi_frame(self, tmp_path):
        es, _ = C.pcm_stream(48, 48, 3)
        _check(es, tmp_path, "pcm x3")


class TestTiles:
    def test_uniform_2x2(self, tmp_path):
        es, _ = C.pcm_stream(96, 64, 1, tiles=(2, 2))
        _check(es, tmp_path, "tiles 2x2")

    def test_uniform_3x2_wide_picture(self, tmp_path):
        es, _ = C.pcm_stream(160, 64, 1, tiles=(3, 2))
        _check(es, tmp_path, "tiles 3x2")

    def test_nonuniform_columns_rows(self, tmp_path):
        es, _ = C.pcm_stream(96, 80, 1, tiles=(2, 2),
                             col_widths=[1], row_heights=[3])
        _check(es, tmp_path, "tiles nonuniform")

    def test_loop_filter_across_tiles_off(self, tmp_path):
        es_on, _ = C.pcm_stream(96, 64, 1, tiles=(2, 2),
                                lf_across_tiles=1)
        es_off, _ = C.pcm_stream(96, 64, 1, tiles=(2, 2),
                                 lf_across_tiles=0)
        out_on = _check(es_on, tmp_path, "tiles lf on")
        out_off = _check(es_off, tmp_path, "tiles lf off")
        # the gate must be material: deblocking across the tile edge
        # changes samples near column 48 / row 32
        assert not np.array_equal(out_on[0][0], out_off[0][0])

    def test_single_column_tiles(self, tmp_path):
        es, _ = C.pcm_stream(64, 96, 1, tiles=(1, 3))
        _check(es, tmp_path, "tiles 1x3")


class TestDependentSlices:
    def test_two_segments(self, tmp_path):
        es, _ = C.pcm_stream(64, 64, 1, segments=[8],
                             dep_segments=True)
        _check(es, tmp_path, "dep x2")

    def test_three_segments_mid_row_split(self, tmp_path):
        # segment boundaries inside a CTB row: prediction and CABAC
        # context state must flow across the segment boundary
        es, _ = C.pcm_stream(64, 64, 1, segments=[6, 10],
                             dep_segments=True)
        _check(es, tmp_path, "dep x3")

    def test_multi_frame(self, tmp_path):
        es, _ = C.pcm_stream(48, 48, 2, segments=[4],
                             dep_segments=True)
        _check(es, tmp_path, "dep frames")


class TestLongTerm:
    def test_basic_lt_reference(self, tmp_path):
        es = C.lt_stream(64, 48)
        out = _check(es, tmp_path, "lt")
        # skip-P copies the long-term IDR: frames 1,2 equal frame 0
        _assert_equal([out[0]] * 3, out, "lt copy")

    def test_msb_cycle_present(self, tmp_path):
        es = C.lt_stream(64, 48, msb=True)
        out = _check(es, tmp_path, "lt msb")
        _assert_equal([out[0]] * 3, out, "lt msb copy")

    def test_dpb_retention_via_lt_foll(self, tmp_path):
        # the IDR survives two P pictures whose short-term RPS would
        # drop it, held only by a used=0 long-term entry
        es = C.lt_stream(64, 48, retention=True)
        out = _check(es, tmp_path, "lt retention")
        _assert_equal([out[0]] * 4, out, "lt retention copy")


class TestCombined:
    def test_dep_segment_at_tile_boundary(self, tmp_path):
        # 96x64 = 6x4 CTBs, 2x2 tiles (3x2 each); the dependent
        # segment starts exactly at tile 1 (rs 3): fresh contexts at
        # the tile start take precedence over the dependent restore
        es, _ = C.pcm_stream(96, 64, 1, tiles=(2, 2), segments=[3],
                             dep_segments=True)
        _check(es, tmp_path, "tiles+dep@tile")

    def test_dep_segment_inside_tile(self, tmp_path):
        # segments split tile 0 itself (ts 0-2 / ts 3-5), then the
        # remaining tiles follow in a third dependent segment: the
        # mid-tile boundary restores contexts, the tile-start one
        # re-initialises
        es, _ = C.pcm_stream(96, 64, 1, tiles=(2, 2), segments=[6, 3],
                             dep_segments=True)
        _check(es, tmp_path, "tiles+dep-mid")
