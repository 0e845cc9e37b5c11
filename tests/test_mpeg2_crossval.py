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
