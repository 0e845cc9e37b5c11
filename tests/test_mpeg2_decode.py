"""MPEG-2 video decoder validation.

Two independent angles (see tests/mpeg2_enc.py):

1. Analytical: the defined fixed-point IDCT against closed-form
   cosine/flat patterns and the ideal float IDCT.
2. Round-trip: streams produced by the test encoder (independent
   prediction arithmetic) must decode to the encoder's reconstruction
   EXACTLY, and to the original frames within codec loss (PSNR).

Every decoder syntax path is driven: I/P/B frame pictures, field
pictures, frame/field/16x8/dual-prime motion, field DCT, both scans,
both quantiser mappings, both intra VLC tables, DC precisions, custom
matrices, mid-GOP starts and truncation.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

import mpeg2_enc as E
from mpeg2_enc import EncConfig, Mpeg2TestEncoder, Plane3, synth_frames
from amatsukaze_tpu.video import Mpeg2RefDecoder, decode_es, idct8x8
from amatsukaze_tpu.video.mpeg2_ref import IDCT_A


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * math.log10(255.0 ** 2 / mse)


def _roundtrip(cfg: EncConfig, gop: str, frames=None, seed=0):
    frames = frames or synth_frames(cfg.width, cfg.height, len(gop),
                                    seed=seed)
    enc = Mpeg2TestEncoder(cfg)
    es = enc.encode(frames, gop)
    dec = Mpeg2RefDecoder()
    from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks
    out = []
    for chunk in iter_picture_chunks(es):
        out.extend(dec.decode_picture(chunk))
    out.extend(dec.flush())
    assert dec.errors == 0, f"{dec.errors} bitstream errors"
    assert len(out) == len(gop), (len(out), len(gop))
    return frames, enc, out, es


def _assert_exact(cfg, enc, out):
    h, w = cfg.height, cfg.width
    for i, fr in enumerate(out):
        rec = enc.recon[i]
        for name, dp, ep in (("y", fr.y, rec.y[:h, :w]),
                             ("u", fr.u, rec.u[:h // 2, :w // 2]),
                             ("v", fr.v, rec.v[:h // 2, :w // 2])):
            diff = np.abs(dp.astype(int) - ep.astype(int))
            assert diff.max() == 0, \
                (f"frame {i} plane {name}: max diff {diff.max()} at "
                 f"{np.unravel_index(diff.argmax(), diff.shape)}")


def _assert_psnr(cfg, frames, out, floor=30.0):
    for i, fr in enumerate(out):
        p = _psnr(fr.y, frames[i].y)
        assert p > floor, f"frame {i} PSNR {p:.1f} < {floor}"


# ---------------------------------------------------------------------------
# Analytical IDCT
# ---------------------------------------------------------------------------


class TestIdct:
    def test_dc_flat(self):
        # DC-only: x[m,n] = F00 / 8 exactly (c(0)^2/4 = 1/8)
        for dc in (-2048, -129, -8, 0, 8, 513, 2047):
            f = np.zeros((8, 8), np.int64)
            f[0, 0] = dc
            out = idct8x8(f)
            expect = dc / 8.0
            assert np.all(np.abs(out - round(expect)) <= 1), (dc, out[0, 0])

    def test_single_ac_cosine(self):
        for (u, v, amp) in ((0, 3, 500), (2, 0, -700), (5, 5, 300),
                            (7, 1, -2048), (1, 7, 999)):
            f = np.zeros((8, 8), np.int64)
            f[u, v] = amp
            got = idct8x8(f)
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            m = np.arange(8)
            col = np.cos((2 * m + 1) * u * math.pi / 16)
            rowv = np.cos((2 * m + 1) * v * math.pi / 16)
            ideal = amp * (cu / 2) * (cv / 2) * np.outer(col, rowv)
            assert np.abs(got - ideal).max() <= 1.0

    def test_vs_float_random(self):
        rng = np.random.default_rng(7)
        b = IDCT_A.astype(np.float64) / 16384.0
        for _ in range(200):
            f = rng.integers(-2048, 2048, (8, 8)).astype(np.int64)
            ideal = b.T @ f.astype(np.float64) @ b
            got = idct8x8(f)
            assert np.abs(got - ideal).max() <= 2.0

    def test_range_no_overflow(self):
        f = np.full((8, 8), 2047, np.int64)
        idct8x8(f)
        f = np.full((8, 8), -2048, np.int64)
        idct8x8(f)


# ---------------------------------------------------------------------------
# Round-trips: frame pictures
# ---------------------------------------------------------------------------


class TestFramePictures:
    def test_intra_exact(self):
        cfg = EncConfig(64, 48, qs=4)
        frames, enc, out, _ = _roundtrip(cfg, "III")
        _assert_exact(cfg, enc, out)
        _assert_psnr(cfg, frames, out)

    def test_intra_fine_quant_high_fidelity(self):
        cfg = EncConfig(48, 32, qs=2)
        frames, enc, out, _ = _roundtrip(cfg, "I")
        _assert_exact(cfg, enc, out)
        _assert_psnr(cfg, frames, out, floor=40.0)

    def test_ippp_exact(self):
        cfg = EncConfig(64, 48, qs=4)
        frames, enc, out, _ = _roundtrip(cfg, "IPPP")
        _assert_exact(cfg, enc, out)
        _assert_psnr(cfg, frames, out)

    def test_ibbp_exact_and_order(self):
        cfg = EncConfig(64, 48, qs=4)
        frames, enc, out, _ = _roundtrip(cfg, "IBBPBBP")
        _assert_exact(cfg, enc, out)
        _assert_psnr(cfg, frames, out, floor=28.0)

    def test_b_direction_mix(self):
        cfg = EncConfig(64, 48, qs=4,
                        picture_opts={1: {"b_mode": "alt"},
                                      2: {"b_mode": "alt"}})
        frames, enc, out, _ = _roundtrip(cfg, "IBBP")
        _assert_exact(cfg, enc, out)

    def test_field_in_frame_motion(self):
        cfg = EncConfig(64, 64, qs=4, frame_pred_frame_dct=False,
                        progressive=False,
                        picture_opts={i: {"motion": "field"}
                                      for i in range(4)})
        frames, enc, out, _ = _roundtrip(cfg, "IPPP")
        _assert_exact(cfg, enc, out)

    def test_field_dct_intra(self):
        cfg = EncConfig(64, 48, qs=4, frame_pred_frame_dct=False,
                        progressive=False,
                        picture_opts={i: {"dct": "field"}
                                      for i in range(2)})
        frames, enc, out, _ = _roundtrip(cfg, "II")
        _assert_exact(cfg, enc, out)
        _assert_psnr(cfg, frames, out)

    def test_dual_prime_frame(self):
        cfg = EncConfig(64, 64, qs=4, frame_pred_frame_dct=False,
                        progressive=False,
                        picture_opts={i: {"motion": "dp",
                                          "dmv": (1, -1)}
                                      for i in range(1, 4)})
        frames, enc, out, _ = _roundtrip(cfg, "IPPP")
        _assert_exact(cfg, enc, out)


# ---------------------------------------------------------------------------
# Round-trips: field pictures
# ---------------------------------------------------------------------------


class TestFieldPictures:
    def test_ii_pp_exact(self):
        cfg = EncConfig(64, 64, qs=4, progressive=False,
                        picture_opts={i: {"structure": "tb"}
                                      for i in range(3)})
        frames, enc, out, _ = _roundtrip(cfg, "IPP")
        _assert_exact(cfg, enc, out)
        _assert_psnr(cfg, frames, out)

    def test_bottom_first(self):
        cfg = EncConfig(64, 64, qs=4, progressive=False,
                        picture_opts={i: {"structure": "bt"}
                                      for i in range(2)})
        frames, enc, out, _ = _roundtrip(cfg, "IP")
        _assert_exact(cfg, enc, out)

    def test_second_field_refs_first_field(self):
        # P second field predicting from the current frame's first field
        # (the 7.6.2.1 special case)
        cfg = EncConfig(64, 64, qs=4, progressive=False,
                        picture_opts={0: {"structure": "tb"},
                                      1: {"structure": "tb",
                                          "second_field_fs_par": 0}})
        frames, enc, out, _ = _roundtrip(cfg, "IP")
        _assert_exact(cfg, enc, out)

    def test_16x8_motion(self):
        cfg = EncConfig(64, 64, qs=4, progressive=False,
                        picture_opts={0: {"structure": "tb"},
                                      1: {"structure": "tb",
                                          "motion": "16x8",
                                          "mv16x8": (3, -2)}})
        frames, enc, out, _ = _roundtrip(cfg, "IP")
        _assert_exact(cfg, enc, out)

    def test_dual_prime_field(self):
        cfg = EncConfig(64, 64, qs=4, progressive=False,
                        picture_opts={0: {"structure": "tb"},
                                      1: {"structure": "tb",
                                          "motion": "dp", "dmv": (0, 1)},
                                      2: {"structure": "tb",
                                          "motion": "dp", "dmv": (-1, 0)}})
        frames, enc, out, _ = _roundtrip(cfg, "IPP")
        _assert_exact(cfg, enc, out)


# ---------------------------------------------------------------------------
# Syntax variants
# ---------------------------------------------------------------------------


class TestSyntaxVariants:
    def test_nonlinear_qscale_and_intra_vlc(self):
        cfg = EncConfig(64, 48, qs=4, q_scale_type=True,
                        intra_vlc_format=True)
        frames, enc, out, _ = _roundtrip(cfg, "IPP")
        _assert_exact(cfg, enc, out)

    def test_alternate_scan(self):
        cfg = EncConfig(64, 48, qs=4, alternate_scan=True,
                        progressive=False)
        frames, enc, out, _ = _roundtrip(cfg, "IPP")
        _assert_exact(cfg, enc, out)

    def test_dc_precision(self):
        for prec in (1, 2, 3):
            cfg = EncConfig(48, 32, qs=2, intra_dc_precision=prec)
            frames, enc, out, _ = _roundtrip(cfg, "I", seed=prec)
            _assert_exact(cfg, enc, out)

    def test_custom_matrices(self):
        rng = np.random.default_rng(3)
        intra = tuple(int(v) for v in rng.integers(8, 64, 64))
        non = tuple(int(v) for v in rng.integers(8, 48, 64))
        cfg = EncConfig(64, 48, qs=4, custom_matrices=True,
                        intra_q=(8,) + intra[1:], non_intra_q=non)
        frames, enc, out, _ = _roundtrip(cfg, "IPP")
        _assert_exact(cfg, enc, out)

    def test_coarse_quant_still_exact(self):
        cfg = EncConfig(64, 48, qs=24)
        frames, enc, out, _ = _roundtrip(cfg, "IPP")
        _assert_exact(cfg, enc, out)

    def test_width_not_mb_aligned(self):
        cfg = EncConfig(60, 36, qs=4)
        frames, enc, out, _ = _roundtrip(cfg, "IP")
        _assert_exact(cfg, enc, out)
        assert out[0].y.shape == (36, 60)
        assert out[0].u.shape == (18, 30)


# ---------------------------------------------------------------------------
# Robustness / stream-start policy
# ---------------------------------------------------------------------------


class TestRobustness:
    def test_mid_gop_start_drops_leading_pb(self):
        cfg = EncConfig(64, 48, qs=4)
        frames = synth_frames(64, 48, 6)
        enc = Mpeg2TestEncoder(cfg)
        es = enc.encode(frames, "IPPIPP")
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks
        chunks = [bytes(c) for c in iter_picture_chunks(es)]
        # skip the first I picture (but keep the sequence header that
        # precedes it): decoder must drop the two Ps, sync on the 2nd I
        first_pic = chunks[0].find(b"\x00\x00\x01\x00")
        seq_hdr = chunks[0][:first_pic]
        dec = Mpeg2RefDecoder()
        out = []
        for i, ch in enumerate(chunks[1:]):
            out.extend(dec.decode_picture(seq_hdr + ch if i == 0 else ch))
        out.extend(dec.flush())
        # first emitted frame must be the second I (display idx 3)
        assert len(out) == 3
        assert np.array_equal(out[0].y, enc.recon[3].y[:48, :64])

    def test_truncated_streams_no_crash(self):
        cfg = EncConfig(64, 48, qs=4)
        frames = synth_frames(64, 48, 3)
        enc = Mpeg2TestEncoder(cfg)
        es = enc.encode(frames, "IPP")
        for cut in (10, len(es) // 3, len(es) // 2, len(es) - 5):
            decode_es(es[:cut])  # must not raise

    def test_garbage_no_crash(self):
        rng = np.random.default_rng(0)
        junk = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
        decode_es(b"\x00\x00\x01\xb3" + junk)

    def test_decode_es_convenience(self):
        cfg = EncConfig(64, 48, qs=4)
        frames = synth_frames(64, 48, 4)
        enc = Mpeg2TestEncoder(cfg)
        es = enc.encode(frames, "IPPP")
        out = decode_es(es)
        assert len(out) == 4
        _assert_exact(cfg, enc, out)


class TestChroma422:
    def test_intra_exact(self):
        cfg = EncConfig(64, 48, qs=4, chroma_format=2)
        frames = synth_frames(64, 48, 2, chroma_format=2)
        _, enc, out, _ = _roundtrip(cfg, "II", frames=frames)
        _assert_exact_cf(cfg, enc, out)
        assert out[0].u.shape == (48, 32)

    def test_ipb_exact(self):
        cfg = EncConfig(64, 48, qs=4, chroma_format=2)
        frames = synth_frames(64, 48, 5, chroma_format=2)
        _, enc, out, _ = _roundtrip(cfg, "IPBPP", frames=frames)
        _assert_exact_cf(cfg, enc, out)

    def test_syntax_variants(self):
        for kw in ({"intra_vlc_format": True}, {"q_scale_type": True},
                   {"intra_dc_precision": 2},
                   {"frame_pred_frame_dct": False}):
            cfg = EncConfig(64, 48, qs=4, chroma_format=2,
                            progressive=False, **kw)
            frames = synth_frames(64, 48, 3, chroma_format=2)
            _, enc, out, _ = _roundtrip(cfg, "IPP", frames=frames)
            _assert_exact_cf(cfg, enc, out)

    def test_field_dct_intra(self):
        # 4:2:2 chroma is field-organised under dct_type=1 (6.1.3)
        cfg = EncConfig(64, 48, qs=4, chroma_format=2, progressive=False,
                        frame_pred_frame_dct=False,
                        picture_opts={i: {"dct": "field"}
                                      for i in range(2)})
        frames = synth_frames(64, 48, 2, chroma_format=2)
        _, enc, out, _ = _roundtrip(cfg, "II", frames=frames)
        _assert_exact_cf(cfg, enc, out)


def _assert_exact_cf(cfg, enc, out):
    h, w = cfg.height, cfg.width
    ch = h // 2 if cfg.chroma_format == 1 else h
    for i, fr in enumerate(out):
        rec = enc.recon[i]
        for name, dp, ep in (("y", fr.y, rec.y[:h, :w]),
                             ("u", fr.u, rec.u[:ch, :w // 2]),
                             ("v", fr.v, rec.v[:ch, :w // 2])):
            diff = np.abs(dp.astype(int) - ep.astype(int))
            assert diff.max() == 0, (i, name, int(diff.max()))
