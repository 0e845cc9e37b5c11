"""Cross-validation of the in-build MPEG-2 decoder against an
INDEPENDENT real decoder: OpenCV's bundled FFmpeg/avcodec.

This closes the loop the round-trip tests cannot: encoder and decoder
share ts/mpeg2_tables.py, so a transposed table entry would cancel out
in round-trips — but not against FFmpeg. (This is exactly how the
original B.15 table defects were found and the true codebook was
recovered; see the note on B15_DCT.)

Luma is compared exactly at the plane level with a small tolerance: the
IDCT is implementation-defined (both ours and FFmpeg's are sub-LSB vs
the ideal float IDCT), so per-pixel differences up to ~2 (slightly more
after motion-compensated accumulation over a GOP) are expected and
correct.

cv2 quirks constraining the setup (verified empirically):
- CAP_PROP_CONVERT_RGB=0 yields the raw LUMA plane (yuv420p "8UC1").
- interlaced-flagged sequences make cv2's swscaler fail and return
  garbage, so streams here are coded progressive; interlaced decode is
  covered by the round-trip + differential suites.
"""

from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import mpeg2_enc as E
from mpeg2_enc import EncConfig, Mpeg2TestEncoder, synth_frames
from amatsukaze_tpu.video import decode_es


def _ffmpeg_lumas(es: bytes, tmp_path) -> list[np.ndarray]:
    p = str(tmp_path / "x.m2v")
    with open(p, "wb") as f:
        f.write(es)
    cap = cv2.VideoCapture(p)
    assert cap.isOpened()
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    out = []
    while True:
        ok, y = cap.read()
        if not ok:
            break
        out.append(np.asarray(y))
    cap.release()
    return out


def _compare(cfg: EncConfig, gop: str, tmp_path, seed=0, tol=2):
    frames = synth_frames(cfg.width, cfg.height, len(gop), seed=seed)
    enc = Mpeg2TestEncoder(cfg)
    es = enc.encode(frames, gop)
    ours = decode_es(es)
    ff = _ffmpeg_lumas(es, tmp_path)
    assert len(ff) == len(ours) == len(gop)
    for i, (a, b) in enumerate(zip(ours, ff)):
        d = np.abs(a.y.astype(int) - b.astype(int))
        assert d.max() <= tol, \
            f"frame {i}: max luma diff {d.max()} (tol {tol})"


class TestAgainstFFmpeg:
    def test_intra(self, tmp_path):
        _compare(EncConfig(64, 48, qs=4, progressive=True), "III",
                 tmp_path)

    def test_ipb(self, tmp_path):
        _compare(EncConfig(64, 48, qs=4, progressive=True), "IPBPBP",
                 tmp_path, tol=3)

    def test_intra_vlc_format_b15(self, tmp_path):
        # drives table B.15 (the empirically recovered codebook)
        _compare(EncConfig(64, 48, qs=4, progressive=True,
                           intra_vlc_format=True), "IPP", tmp_path, tol=3)

    def test_nonlinear_qscale(self, tmp_path):
        _compare(EncConfig(64, 48, qs=4, progressive=True,
                           q_scale_type=True), "IPP", tmp_path, tol=3)

    def test_dc_precision(self, tmp_path):
        for prec in (1, 2):
            _compare(EncConfig(48, 32, qs=2, progressive=True,
                               intra_dc_precision=prec), "I", tmp_path,
                     seed=prec)

    def test_custom_matrices(self, tmp_path):
        rng = np.random.default_rng(5)
        _compare(EncConfig(
            64, 48, qs=4, progressive=True, custom_matrices=True,
            intra_q=(8,) + tuple(int(v) for v in rng.integers(8, 64, 63)),
            non_intra_q=tuple(int(v) for v in rng.integers(8, 48, 64))),
            "IPP", tmp_path, tol=3)

    def test_random_sweep(self, tmp_path):
        rng = np.random.default_rng(42)
        for trial in range(6):
            cfg = EncConfig(
                64, 48,
                qs=int(rng.choice([2, 4, 8, 20])),
                q_scale_type=bool(rng.integers(0, 2)),
                intra_vlc_format=bool(rng.integers(0, 2)),
                intra_dc_precision=int(rng.integers(0, 3)),
                progressive=True,
                search=2)
            n = int(rng.integers(2, 5))
            gop = "I" + "".join(rng.choice(["P", "B"], n - 1))
            while gop.endswith("B"):
                gop = gop[:-1] + "P"
            _compare(cfg, gop, tmp_path, seed=trial, tol=4)


def _bgr_from_planes(y, u, v):
    import numpy as np
    u2 = np.repeat(np.repeat(u, 2, 0), 2, 1).astype(np.float32) - 128
    v2 = np.repeat(np.repeat(v, 2, 0), 2, 1).astype(np.float32) - 128
    yf = y.astype(np.float32)
    return np.clip(np.stack(
        [yf + 1.772 * u2, yf - 0.344 * u2 - 0.714 * v2,
         yf + 1.402 * v2], -1), 0, 255).astype(np.uint8)


class TestFFmpegEncodedStreams:
    """The strongest direction: decode streams FFMPEG ENCODED (its own
    motion search, skipped MBs, rate-control mquant, open GOPs) with
    the in-build decoder and compare against FFmpeg's own decode."""

    @pytest.fixture
    def ffmpeg_ps(self, tmp_path):
        from mpeg2_enc import synth_frames

        W, H = 160, 128
        frames = synth_frames(W, H, 20, seed=9, motion=(5, 2))
        p = str(tmp_path / "ff.mpg")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MPEG"), 30,
                             (W, H))
        assert wr.isOpened()
        for f in frames:
            wr.write(_bgr_from_planes(f.y, f.u, f.v))
        wr.release()
        return p

    def test_inbuild_decode_matches_ffmpeg(self, ffmpeg_ps):
        from amatsukaze_tpu.pipeline.decoders import decode_mpeg2_ps_file

        cap = cv2.VideoCapture(ffmpeg_ps)
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        ff = []
        while True:
            ok, y = cap.read()
            if not ok:
                break
            ff.append(np.asarray(y))
        cap.release()
        ours = list(decode_mpeg2_ps_file(ffmpeg_ps))
        assert len(ours) == len(ff) == 20
        for i, ((y, u, v), fy) in enumerate(zip(ours, ff)):
            d = np.abs(y.astype(int) - fy.astype(int)).max()
            assert d <= 3, f"frame {i}: luma diff {d}"

    def test_oracle_matches_native_on_ffmpeg_stream(self, ffmpeg_ps):
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks_file
        from amatsukaze_tpu.video import Mpeg2RefDecoder
        from amatsukaze_tpu.video.native import (NativeMpeg2Decoder,
                                                 native_available)

        if not native_available():
            pytest.skip("no native library")
        ref, nat = Mpeg2RefDecoder(), NativeMpeg2Decoder()
        ra, na = [], []
        for ch in iter_picture_chunks_file(ffmpeg_ps):
            ra.extend(ref.decode_picture(ch))
            na.extend(nat.decode_picture(ch))
        ra.extend(ref.flush())
        na.extend(nat.flush())
        assert len(ra) == len(na) == 20
        for a, b in zip(ra, na):
            for pl in "yuv":
                assert np.array_equal(getattr(a, pl), getattr(b, pl))

    def test_cv2_decoder_factory_plumbing(self, ffmpeg_ps):
        from amatsukaze_tpu.pipeline.decoders import decode_file_cv2

        frames = list(decode_file_cv2(ffmpeg_ps))
        assert len(frames) == 20
        y, u, v = frames[0]
        assert y.shape == (128, 160)
        assert u.shape == v.shape == (64, 80)


class TestChroma422AgainstFFmpeg:
    def test_luma_exact(self, tmp_path):
        frames = synth_frames(64, 48, 4, chroma_format=2)
        cfg = EncConfig(64, 48, qs=4, chroma_format=2, progressive=True)
        enc = Mpeg2TestEncoder(cfg)
        es = enc.encode(frames, "IPPP")
        ours = decode_es(es)
        ff = _ffmpeg_lumas(es, tmp_path)
        assert len(ff) == len(ours) == 4
        for a, b in zip(ours, ff):
            assert np.abs(a.y.astype(int) - b.astype(int)).max() <= 3

    def test_chroma_via_bgr_parity(self, tmp_path):
        """Chroma placement check: the BGR round-trip error vs FFmpeg
        must match the 4:2:0 level (a block/interleave mistake would be
        tens of levels, not conversion noise)."""
        def metric(cf):
            frames = synth_frames(64, 48, 3, chroma_format=cf)
            cfg = EncConfig(64, 48, qs=4, chroma_format=cf,
                            progressive=True)
            enc = Mpeg2TestEncoder(cfg)
            es = enc.encode(frames, "IPP")
            p = str(tmp_path / f"c{cf}.m2v")
            open(p, "wb").write(es)
            ours = decode_es(es)
            cap = cv2.VideoCapture(p)
            ff = []
            while True:
                ok, bgr = cap.read()
                if not ok:
                    break
                ff.append(bgr.astype(np.float32))
            cap.release()
            tot = []
            for a, b in zip(ours, ff):
                ry = 2 if cf == 1 else 1
                u2 = np.repeat(np.repeat(
                    a.u.astype(np.float32) - 128, ry, 0), 2, 1)
                v2 = np.repeat(np.repeat(
                    a.v.astype(np.float32) - 128, ry, 0), 2, 1)
                yf = a.y.astype(np.float32)
                mine = np.clip(np.stack(
                    [yf + 1.772 * u2, yf - 0.344 * u2 - 0.714 * v2,
                     yf + 1.402 * v2], -1), 0, 255)
                tot.append(float(np.abs(mine - b).mean()))
            return np.mean(tot)

        m420, m422 = metric(1), metric(2)
        assert abs(m422 - m420) < 2.0, (m420, m422)


class TestMpeg1:
    """MPEG-1 (ISO 11172-2) decode: FFmpeg-encoded streams through the
    in-build decoders. Exercises the MPEG-1 branches: no sequence
    extension, 8/16-bit escape levels, per-coefficient oddification,
    cross-row slices, macroblock stuffing. (full_pel vectors and D
    pictures are implemented per spec but FFmpeg's encoder never emits
    them; D pictures are rejected with an error count.)"""

    @pytest.fixture
    def mpeg1_ps(self, tmp_path):
        from mpeg2_enc import synth_frames

        W, H = 160, 128
        frames = synth_frames(W, H, 16, seed=4, motion=(4, 1))
        p = str(tmp_path / "m1.mpg")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"PIM1"), 25,
                             (W, H))
        assert wr.isOpened()
        for f in frames:
            u2 = np.repeat(np.repeat(f.u, 2, 0), 2, 1).astype(
                np.float32) - 128
            v2 = np.repeat(np.repeat(f.v, 2, 0), 2, 1).astype(
                np.float32) - 128
            yf = f.y.astype(np.float32)
            wr.write(np.clip(np.stack(
                [yf + 1.772 * u2, yf - 0.344 * u2 - 0.714 * v2,
                 yf + 1.402 * v2], -1), 0, 255).astype(np.uint8))
        wr.release()
        return p

    def test_decode_matches_ffmpeg(self, mpeg1_ps):
        from amatsukaze_tpu.pipeline.decoders import decode_mpeg2_ps_file

        cap = cv2.VideoCapture(mpeg1_ps)
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        ff = []
        while True:
            ok, y = cap.read()
            if not ok:
                break
            ff.append(np.asarray(y).copy())
        cap.release()
        ours = list(decode_mpeg2_ps_file(mpeg1_ps))
        assert len(ours) == len(ff) == 16
        for i, ((y, u, v), fy) in enumerate(zip(ours, ff)):
            d = np.abs(y.astype(int) - fy.astype(int)).max()
            assert d <= 3, f"frame {i}: luma diff {d}"

    def test_oracle_matches_native(self, mpeg1_ps):
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks_file
        from amatsukaze_tpu.video import Mpeg2RefDecoder
        from amatsukaze_tpu.video.native import (NativeMpeg2Decoder,
                                                 native_available)

        if not native_available():
            pytest.skip("no native library")
        ref, nat = Mpeg2RefDecoder(), NativeMpeg2Decoder()
        ra, na = [], []
        for ch in iter_picture_chunks_file(mpeg1_ps):
            ra.extend(ref.decode_picture(ch))
            na.extend(nat.decode_picture(ch))
        ra.extend(ref.flush())
        na.extend(nat.flush())
        assert len(ra) == len(na) == 16
        for a, b in zip(ra, na):
            for pl in "yuv":
                assert np.array_equal(getattr(a, pl), getattr(b, pl))

    def test_corrupted_no_crash(self, mpeg1_ps):
        from amatsukaze_tpu.ts.qp_extract import extract_ps_video_es
        from amatsukaze_tpu.video import decode_es
        from amatsukaze_tpu.video.native import decode_es_native

        es = bytearray(extract_ps_video_es(open(mpeg1_ps, "rb").read()))
        rng = np.random.default_rng(1)
        for _ in range(10):
            bad = bytearray(es)
            for _ in range(5):
                bad[int(rng.integers(16, len(bad)))] = \
                    int(rng.integers(0, 256))
            decode_es(bytes(bad))
            decode_es_native(bytes(bad))


# ---------------------------------------------------------------------------
# FFmpeg-bridge cross-validation (native/avdec.cpp): full-plane compare
# including the interlaced paths cv2's raw mode could not reach.
# ---------------------------------------------------------------------------

def _avdec():
    from amatsukaze_tpu.video.avdec import avdec_available

    if not avdec_available():
        pytest.skip("FFmpeg bridge unavailable")


def _compare_full(cfg: EncConfig, gop: str, tmp_path, seed=2, tol=3):
    from amatsukaze_tpu.video.avdec import AvVideoDecoder

    frames = synth_frames(cfg.width, cfg.height, len(gop), seed=seed,
                          chroma_format=cfg.chroma_format)
    enc = Mpeg2TestEncoder(cfg)
    es = enc.encode(frames, gop)
    p = str(tmp_path / "t.m2v")
    open(p, "wb").write(es)
    ours = decode_es(es)
    ff = list(AvVideoDecoder(p).frames())
    assert len(ff) == len(ours) == len(gop)
    for i, ((y, u, v), o) in enumerate(zip(ff, ours)):
        for pl, a, b in (("y", y, o.y), ("u", u, o.u), ("v", v, o.v)):
            d = np.abs(a.astype(int) - b.astype(int)).max()
            assert d <= tol, f"frame {i} {pl}: diff {d}"


class TestInterlacedAgainstFFmpeg:
    """Every interlaced decode path, all three planes, vs libavcodec."""

    def test_interlaced_frame_pictures(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 64, qs=4, progressive=False), "IPP",
                      tmp_path)

    def test_field_pictures_tb(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 64, qs=4, progressive=False,
                                picture_opts={i: {"structure": "tb"}
                                              for i in range(3)}),
                      "IPP", tmp_path)

    def test_field_pictures_bt(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 64, qs=4, progressive=False,
                                picture_opts={i: {"structure": "bt"}
                                              for i in range(2)}),
                      "IP", tmp_path)

    def test_second_field_refs_first(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 64, qs=4, progressive=False,
                                picture_opts={0: {"structure": "tb"},
                                              1: {"structure": "tb",
                                                  "second_field_fs_par": 0}}),
                      "IP", tmp_path)

    def test_field_in_frame_motion(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 64, qs=4, progressive=False,
                                frame_pred_frame_dct=False,
                                picture_opts={i: {"motion": "field"}
                                              for i in range(3)}),
                      "IPP", tmp_path)

    def test_dual_prime_frame(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 64, qs=4, progressive=False,
                                frame_pred_frame_dct=False,
                                picture_opts={i: {"motion": "dp",
                                                  "dmv": (1, -1)}
                                              for i in range(1, 3)}),
                      "IPP", tmp_path)

    def test_dual_prime_field(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 64, qs=4, progressive=False,
                                picture_opts={0: {"structure": "tb"},
                                              1: {"structure": "tb",
                                                  "motion": "dp",
                                                  "dmv": (0, 1)}}),
                      "IP", tmp_path)

    def test_16x8_motion(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 64, qs=4, progressive=False,
                                picture_opts={0: {"structure": "tb"},
                                              1: {"structure": "tb",
                                                  "motion": "16x8",
                                                  "mv16x8": (3, -2)}}),
                      "IP", tmp_path)

    def test_alternate_scan(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 64, qs=4, alternate_scan=True,
                                progressive=False), "IPP", tmp_path)

    def test_field_dct(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 64, qs=4, progressive=False,
                                frame_pred_frame_dct=False,
                                picture_opts={i: {"dct": "field"}
                                              for i in range(2)}),
                      "II", tmp_path)

    def test_422_chroma_full(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 48, qs=4, chroma_format=2,
                                progressive=True), "IPP", tmp_path)

    def test_ibbp_all_planes(self, tmp_path):
        _avdec()
        _compare_full(EncConfig(64, 48, qs=4, progressive=True),
                      "IBBPBBP", tmp_path)


class TestFFmpegEncodedInterlaced:
    """The strongest interlaced direction: decode INTERLACED streams
    FFmpeg itself encoded (interlaced DCT/ME, B frames, alternate scan)
    and compare full-plane against FFmpeg's decode."""

    def test_interlaced_encoder_output(self, tmp_path):
        _avdec()
        from amatsukaze_tpu.video.avdec import (AvVideoDecoder,
                                                AvVideoEncoder)

        frames = synth_frames(160, 128, 16, seed=3, motion=(4, 2))
        enc = AvVideoEncoder(160, 128, fps_num=30000, fps_den=1001,
                             crf=0, preset="", interlaced=True,
                             bframes=2, codec="mpeg2video",
                             x264_params="alternate_scan=1")
        es = b""
        for f in frames:
            es += b"".join(enc.encode(f.y, f.u, f.v))
        es += b"".join(enc.flush())
        p = str(tmp_path / "im2.m2v")
        open(p, "wb").write(es)
        ours = decode_es(es)
        ff = list(AvVideoDecoder(p).frames())
        assert len(ours) == len(ff) == 16
        for i, ((y, u, v), o) in enumerate(zip(ff, ours)):
            for pl, a, b in (("y", y, o.y), ("u", u, o.u), ("v", v, o.v)):
                d = np.abs(a.astype(int) - b.astype(int)).max()
                assert d <= 4, (i, pl, int(d))


class TestIdctDriftBounds:
    """Long prediction chains accumulate IDCT mismatch between
    implementations (both conformant: the spec bounds it by mandatory
    intra refresh). Verify the drift stays small and RESETS exactly at
    GOP boundaries when decoding FFmpeg-encoded 1080-class video."""

    def test_drift_resets_at_gop(self, tmp_path):
        _avdec()
        from amatsukaze_tpu.video.avdec import (AvVideoDecoder,
                                                AvVideoEncoder)

        W, H, n = 320, 256, 40  # same structure, faster than full HD
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        base = 128 + 60 * np.sin(xx * 0.02) * np.cos(yy * 0.015)
        enc = AvVideoEncoder(W, H, fps_num=30000, fps_den=1001, crf=0,
                             preset="", interlaced=True, bframes=2,
                             codec="mpeg2video")
        es = b""
        for i in range(n):
            y = np.clip(base + 20 * np.sin((xx + 5 * i) * 0.05)
                        + rng.normal(0, 2, (H, W)), 0, 255).astype(np.uint8)
            u = np.full((H // 2, W // 2), 120, np.uint8)
            v = np.full((H // 2, W // 2), 135, np.uint8)
            es += b"".join(enc.encode(y, u, v))
        es += b"".join(enc.flush())
        p = str(tmp_path / "drift.m2v")
        open(p, "wb").write(es)
        ours = decode_es(es)
        ff = list(AvVideoDecoder(p).frames())
        assert len(ours) == len(ff) == n
        diffs = [int(np.abs(f[0].astype(int) - o.y.astype(int)).max())
                 for f, o in zip(ff, ours)]
        assert diffs[0] <= 2          # I frame: IDCT tolerance only
        assert diffs[30] <= 2         # next GOP start: drift reset
        assert max(diffs) <= 16       # bounded mid-GOP accumulation
