"""QP-map extraction from MPEG-2 ES: round-trip against the test-side
bitstream writer (mpeg2_gen), covering both DCT tables, quantiser types,
picture types, skips, field pictures, desync fallback, and the
slice-level pure-Python fallback extractor."""

import numpy as np
import pytest

import mpeg2_gen as G
from amatsukaze_tpu.ts import mpeg2_tables as M
from amatsukaze_tpu.ts.qp_extract import (
    NativeQpExtractor,
    SliceQpExtractor,
    iter_picture_chunks,
    make_extractor,
    native_available,
)
from amatsukaze_tpu.utils.bits import BitWriter

W, H = 96, 64  # 6x4 macroblocks


def expected_map(row_qs, mquant, mb_w=6, mb_h=4):
    exp = np.zeros((mb_h, mb_w), np.uint8)
    for r in range(mb_h):
        q = row_qs[r]
        for c in range(mb_w):
            if (r, c) in mquant:
                q = mquant[(r, c)]
            exp[r, c] = q
    return exp


class TestTables:
    """Structural validation of the spec tables (see mpeg2_tables notes)."""

    @pytest.mark.parametrize("name,extra", [
        ("B1_ADDR_INC", (M.ADDR_INC_ESCAPE,)), ("B2_MB_TYPE_I", ()),
        ("B3_MB_TYPE_P", ()), ("B4_MB_TYPE_B", ()), ("B9_CBP", ()),
        ("B10_MOTION_CODE", ()), ("B11_DMVECTOR", ()), ("B12_DC_LUMA", ()),
        ("B13_DC_CHROMA", ()), ("B14_DCT", (M.DCT_ESCAPE,)),
        ("B15_DCT", (M.DCT_ESCAPE,)),
    ])
    def test_prefix_free(self, name, extra):
        assert M.is_prefix_free(getattr(M, name), extra)

    def test_dct_kraft_exact(self):
        # B.14 leaves exactly the 2**-12 start-code-emulation region
        # unassigned; B.15 leaves 9 * 2**-12 (both values verified
        # empirically against FFmpeg by exhaustive code probing — every
        # pattern outside the codebooks decodes as an error)
        assert M.kraft_sum(M.B14_DCT, (M.DCT_ESCAPE,)) == 1.0 - 2.0 ** -12
        assert M.kraft_sum(M.B15_DCT, (M.DCT_ESCAPE,)) == \
            1.0 - 9.0 * 2.0 ** -12

    def test_complete_tables(self):
        for t in (M.B11_DMVECTOR, M.B12_DC_LUMA, M.B13_DC_CHROMA):
            assert M.kraft_sum(t) == 1.0


needs_native = pytest.mark.skipif(not native_available(),
                                  reason="no native library")


@needs_native
class TestNativeRoundTrip:
    def test_intra_picture_mquant(self):
        row_qs = [8, 12, 20, 30]
        mquant = {(1, 2): 16, (2, 4): 40, (3, 0): 6}
        res = NativeQpExtractor().parse_picture(
            G.simple_picture(W, H, 1, row_qs, mquant))
        assert res is not None and res.coding_type == 1
        assert res.slices_fallback == 0 and res.slices_ok == 4
        assert np.array_equal(res.qp, expected_map(row_qs, mquant))

    @pytest.mark.parametrize("ivf", [False, True])
    @pytest.mark.parametrize("qst", [False, True])
    def test_vlc_and_qscale_variants(self, ivf, qst):
        row_qs = [8, 24, 56, 112] if qst else [8, 24, 56, 62]
        mquant = {(0, 3): 40 if qst else 34, (2, 1): 2}
        ac = {(0, 0): {0: [(0, 7), (2, -3), (11, 1)],
                       4: [(1, 2), (0, -60)]},
              (3, 5): {2: [(0, 1), (31, -1), (0, 300)]}}
        res = NativeQpExtractor().parse_picture(
            G.simple_picture(W, H, 1, row_qs, mquant, q_scale_type=qst,
                             intra_vlc_format=ivf, ac_blocks=ac))
        assert res is not None
        assert res.slices_fallback == 0
        assert np.array_equal(res.qp, expected_map(row_qs, mquant))

    @pytest.mark.parametrize("coding_type", [2, 3])
    def test_inter_pictures(self, coding_type):
        row_qs = [10, 14, 18, 22]
        mquant = {(1, 1): 30, (3, 3): 4}
        res = NativeQpExtractor().parse_picture(
            G.simple_picture(W, H, coding_type, row_qs, mquant))
        assert res is not None and res.coding_type == coding_type
        assert res.slices_fallback == 0
        assert np.array_equal(res.qp, expected_map(row_qs, mquant))

    def test_skipped_macroblocks_keep_qp(self):
        # P slice: MB0 coded, MBs 1-3 skipped (addr inc 4), MB4 coded with
        # mquant, MB5 coded
        w = BitWriter()
        G.sequence_header(w, W, H)
        G.picture_header(w, 2, 0)
        for row in range(4):
            G.begin_slice(w, row, 12)
            G.write_macroblock(w, 2, 1, M.MB_MOTION_F | M.MB_PATTERN,
                               mv=(2, 1), cbp=32, blocks={0: [(0, 5)]})
            G.write_macroblock(w, 2, 4, M.MB_QUANT | M.MB_PATTERN,
                               new_qs=20, cbp=2, blocks={4: [(0, -2)]})
            G.write_macroblock(w, 2, 1, M.MB_PATTERN, cbp=1,
                               blocks={5: [(0, 1), (0, 1)]})
        res = NativeQpExtractor().parse_picture(G.end_stream(w))
        assert res is not None and res.slices_fallback == 0
        exp = np.tile(np.array([12, 12, 12, 12, 20, 20], np.uint8), (4, 1))
        assert np.array_equal(res.qp, exp)

    def test_escape_address_increment(self):
        # one slice covering row 0 with a >33 increment via escape
        mb_w = 40
        width = mb_w * 16
        w = BitWriter()
        G.sequence_header(w, width, 16)
        G.picture_header(w, 2, 0)
        G.begin_slice(w, 0, 16)
        G.write_macroblock(w, 2, 1, M.MB_PATTERN, cbp=32,
                           blocks={0: [(0, 3)]})
        G.write_macroblock(w, 2, 36, M.MB_QUANT | M.MB_PATTERN, new_qs=40,
                           cbp=32, blocks={0: [(0, 3)]})
        G.write_macroblock(w, 2, 3, M.MB_PATTERN, cbp=32,
                           blocks={0: [(0, 3)]})
        res = NativeQpExtractor().parse_picture(G.end_stream(w))
        assert res is not None and res.slices_fallback == 0
        # MB0 at col 0, inc 36 -> quant MB at col 36; the skipped MBs
        # after it inherit the updated quantiser (7.6.6)
        exp = np.full((1, mb_w), 16, np.uint8)
        exp[0, 36:] = 40
        assert np.array_equal(res.qp, exp)

    def test_field_picture_half_height(self):
        w = BitWriter()
        G.sequence_header(w, W, H)
        G.picture_header(w, 1, 0, picture_structure=1)  # top field
        for row in range(2):  # H/2 = 32 -> 2 MB rows
            G.begin_slice(w, row, 14)
            for _ in range(6):
                G.write_macroblock(w, 1, 1, M.MB_INTRA,
                                   dc_diffs=[1, 1, 1, 1, 0, 0])
        res = NativeQpExtractor().parse_picture(G.end_stream(w))
        assert res is not None
        assert res.picture_structure == 1
        assert res.qp.shape == (2, 6)
        assert np.all(res.qp == 14)

    def test_desync_falls_back_to_slice_qp(self):
        # corrupt the middle of row 1's slice payload; rows 0/2/3 stay
        # exact and row 1 keeps slice-level QP everywhere
        row_qs = [8, 12, 20, 30]
        es = bytearray(G.simple_picture(W, H, 1, row_qs, {}))
        # find slice 2 start (code 0x02) and flip bits shortly after
        idx = bytes(es).find(b"\x00\x00\x01\x02")
        assert idx > 0
        es[idx + 6] ^= 0xFF
        es[idx + 7] ^= 0xFF
        res = NativeQpExtractor().parse_picture(bytes(es))
        assert res is not None
        # whatever desync happened, every MB of row 1 has SOME qp set and
        # the other rows are exact
        exp = expected_map(row_qs, {})
        assert np.array_equal(res.qp[0], exp[0])
        assert np.array_equal(res.qp[2:], exp[2:])
        assert np.all(res.qp[1] > 0)

    def test_intra_dc_exported(self):
        w = BitWriter()
        G.sequence_header(w, W, H)
        G.picture_header(w, 1, 0)
        G.begin_slice(w, 0, 8)
        for col in range(6):
            G.write_macroblock(w, 1, 1, M.MB_INTRA,
                               dc_diffs=[col * 4, col * 4, col * 4, col * 4,
                                         0, 0])
        for row in range(1, 4):
            G.begin_slice(w, row, 8)
            for _ in range(6):
                G.write_macroblock(w, 1, 1, M.MB_INTRA)
        res = NativeQpExtractor().parse_picture(G.end_stream(w))
        assert res is not None and res.slices_fallback == 0
        assert list(res.dc[0]) == [0, 4, 8, 12, 16, 20]


class TestSliceFallback:
    def test_slice_level_qp(self):
        row_qs = [8, 12, 20, 30]
        mquant = {(1, 2): 16}  # invisible to the slice-level extractor
        res = SliceQpExtractor().parse_picture(
            G.simple_picture(W, H, 1, row_qs, mquant))
        assert res is not None
        exp = np.tile(np.array(row_qs, np.uint8)[:, None], (1, 6))
        assert np.array_equal(res.qp, exp)

    def test_nonlinear_qscale(self):
        row_qs = [8, 24, 56, 112]
        res = SliceQpExtractor().parse_picture(
            G.simple_picture(W, H, 1, row_qs, {}, q_scale_type=True))
        assert res is not None
        assert [int(r[0]) for r in res.qp] == row_qs

    def test_factory(self):
        ex = make_extractor()
        assert isinstance(ex, (NativeQpExtractor, SliceQpExtractor))


class TestPictureChunking:
    def test_iter_chunks_attaches_headers(self):
        es = (G.simple_picture(W, H, 1, [8] * 4, {}, temporal_reference=0)
              + G.simple_picture(W, H, 2, [10] * 4, {},
                                 temporal_reference=1, with_seq=False)
              + G.simple_picture(W, H, 2, [12] * 4, {},
                                 temporal_reference=2, with_seq=True))
        chunks = list(iter_picture_chunks(es))
        assert len(chunks) == 3
        assert chunks[0].startswith(b"\x00\x00\x01\xb3")
        assert chunks[1].startswith(b"\x00\x00\x01\x00")
        assert chunks[2].startswith(b"\x00\x00\x01\xb3")
        ex = SliceQpExtractor()
        qs = [ex.parse_picture(c).qp[0, 0] for c in chunks]
        assert qs == [8, 10, 12]

    @needs_native
    def test_native_stream_of_pictures(self):
        es = (G.simple_picture(W, H, 1, [8] * 4, {(0, 1): 30})
              + G.simple_picture(W, H, 3, [16] * 4, {}, with_seq=False))
        nat = NativeQpExtractor()
        res = [nat.parse_picture(c) for c in iter_picture_chunks(es)]
        assert res[0].coding_type == 1 and res[1].coding_type == 3
        assert res[0].qp[0, 0] == 8 and res[0].qp[0, 1] == 30
        assert np.all(res[1].qp == 16)


class TestQpMapSource:
    def _stream(self):
        # coded order I P B B with distinct QPs -> display I B B P
        es = (G.simple_picture(W, H, 1, [8] * 4, {}, temporal_reference=0)
              + G.simple_picture(W, H, 2, [20] * 4, {},
                                 temporal_reference=3, with_seq=False)
              + G.simple_picture(W, H, 3, [12] * 4, {},
                                 temporal_reference=1, with_seq=False)
              + G.simple_picture(W, H, 3, [14] * 4, {},
                                 temporal_reference=2, with_seq=False))
        return es

    def test_display_order_reorder(self):
        from amatsukaze_tpu.ts.qp_extract import QpMapSource

        src = QpMapSource(self._stream(), is_ps=False)
        assert len(src) == 4
        assert [int(r.qp[0, 0]) for r in src.results] == [8, 12, 14, 20]

    def test_maps_and_select(self):
        from amatsukaze_tpu.ts.qp_extract import QpMapSource

        src = QpMapSource(self._stream(), is_ps=False)
        m = src.maps(0, 6)  # clamps past the end
        assert m.shape == (6, 4, 6)
        assert [int(v) for v in m[:, 0, 0]] == [8, 12, 14, 20, 20, 20]
        sel = src.select([2, 0, 3])
        assert [int(r.qp[0, 0]) for r in sel.results] == [14, 8, 20]

    def test_from_file_streaming(self, tmp_path):
        from amatsukaze_tpu.ts.qp_extract import QpMapSource

        p = tmp_path / "v.es"
        p.write_bytes(self._stream() * 5)
        src = QpMapSource.from_file(str(p), is_ps=False, read_chunk=256)
        assert len(src) == 20
        assert [int(r.qp[0, 0]) for r in src.results[:4]] == [8, 12, 14, 20]

    def test_ps_extraction(self):
        from amatsukaze_tpu.ts.qp_extract import (
            QpMapSource, extract_ps_video_es)

        es = self._stream()
        # wrap the ES into minimal MPEG2-PS video PES packets
        ps = bytearray()
        for off in range(0, len(es), 100):
            chunk = es[off:off + 100]
            ps += b"\x00\x00\x01\xba" + b"\x44" + b"\x00" * 8 + b"\xf8"
            hdr = b"\x80\x00\x00"  # flags + header length 0
            ln = len(chunk) + len(hdr)
            ps += b"\x00\x00\x01\xe0" + bytes([ln >> 8, ln & 0xFF]) + hdr \
                + chunk
        got, consumed = extract_ps_video_es(bytes(ps), return_consumed=True)
        assert got == es and consumed == len(ps)
        src = QpMapSource(bytes(ps), is_ps=True)
        assert [int(r.qp[0, 0]) for r in src.results] == [8, 12, 14, 20]


class TestDeblockWiring:
    def test_post_chain_deblock_applies_qp(self):
        import jax.numpy as jnp
        from amatsukaze_tpu.models.filter_graph import build_post_chain

        chain = build_post_chain("deblock")
        assert chain is not None and chain.wants_qp
        rng = np.random.default_rng(0)
        frames = rng.uniform(0, 255, (2, H, W)).astype(np.float32)
        qp = np.full((2, 4, 6), 31.0, np.float32)
        out = np.asarray(chain(jnp.asarray(frames), qp=qp))
        base = np.asarray(chain(jnp.asarray(frames)))  # no qp -> no deblock
        assert out.shape == frames.shape
        assert not np.allclose(out, base)  # deblock changed the frames
        # high QP shrinks AC energy
        assert np.abs(np.diff(out, axis=2)).sum() < \
            np.abs(np.diff(base, axis=2)).sum()

    def test_chroma_scale_and_odd_height(self):
        import jax.numpy as jnp
        from amatsukaze_tpu.models.filter_graph import (
            FilterGraph, build_post_chain)
        from amatsukaze_tpu.ts.qp_extract import QpMapSource
        from amatsukaze_tpu.utils.context import AMTContext

        # 4:2:0 chroma of a 64-high frame: 32 rows (not 8-aligned at 36)
        src = QpMapSource(
            G.simple_picture(W, H, 1, [8, 12, 20, 30], {}), is_ps=False)
        fg = FilterGraph(AMTContext(level="error"), mode="none",
                         post_chain=build_post_chain("deblock"),
                         qp_source=src)
        rng = np.random.default_rng(1)
        luma = rng.uniform(0, 255, (1, H, W)).astype(np.float32)
        chroma = rng.uniform(0, 255, (1, H // 2, W // 2)).astype(np.float32)
        out_l = fg.run_pass3(luma, None, None, start_index=0)
        out_c = fg.run_pass3(chroma, None, None, start_index=0)
        assert out_l.shape == luma.shape and out_c.shape == chroma.shape
        assert not np.allclose(out_l, luma)
        assert not np.allclose(out_c, chroma)
