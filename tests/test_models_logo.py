"""Logo model tests: .lgd round trip, 3-pass analyzer recovery on synthetic
video, frame matcher logo selection + interval extraction."""

import numpy as np
import pytest

from amatsukaze_tpu.models.lgd import LogoData, LogoHeader, load_lgd, save_lgd
from amatsukaze_tpu.models.logo import (
    LogoAnalyzer,
    LogoFrameMatcher,
    ScanRegion,
    border_flat_background,
)

LW, LH = 24, 16  # logo window
IMGW, IMGH = 96, 64


def synth_logo_ab(color=200.0, opacity=0.35):
    # the logo must not touch the scan-window border: the analyzer samples
    # the window border for the flat-background test (as the reference does)
    yy, xx = np.mgrid[0:LH, 0:LW]
    r = np.hypot((yy - LH / 2) / (LH / 2), (xx - LW / 2) / (LW / 2))
    alpha = np.clip(1.0 - 1.45 * r, 0, 1) * opacity
    a = (1.0 / (1.0 - alpha)).astype(np.float32)
    b = (-alpha * color / (1.0 - alpha) / 255.0).astype(np.float32)
    return a, b, alpha.astype(np.float32)


def make_logo_data(region_x=8, region_y=8):
    a, b, _ = synth_logo_ab()
    header = LogoHeader(LW, LH, 1, 1, IMGW, IMGH, region_x, region_y, "testlogo", 1234)
    logo = LogoData.create(header)
    logo.a_y = a
    logo.b_y = b
    return logo


_NOISE_RNG = np.random.default_rng(99)


def frame_with_logo(bg_level, alpha, rx=8, ry=8, on=True):
    # mild noise keeps the per-pixel regression non-degenerate (real video
    # always has it; constant planes make GetAB divide by zero, as in the ref)
    y = np.full((IMGH, IMGW), bg_level, np.float32)
    if on:
        win = y[ry : ry + LH, rx : rx + LW]
        y[ry : ry + LH, rx : rx + LW] = (1 - alpha) * win + alpha * 200.0
    y += _NOISE_RNG.normal(0, 0.7, y.shape)
    # chroma varies per frame (like real video): a per-frame base level plus
    # per-pixel noise, so the per-pixel (fg, bg) regression is non-degenerate
    base_u = 122.0 + 8 * _NOISE_RNG.random()
    base_v = 122.0 + 8 * _NOISE_RNG.random()
    u = base_u + 2 * _NOISE_RNG.random((IMGH // 2, IMGW // 2))
    v = base_v + 2 * _NOISE_RNG.random((IMGH // 2, IMGW // 2))
    return (
        np.clip(y, 0, 255).astype(np.uint8),
        u.astype(np.uint8),
        v.astype(np.uint8),
    )


class TestLgdFormat:
    def test_round_trip(self, tmp_path):
        logo = make_logo_data()
        path = str(tmp_path / "test.lgd")
        save_lgd(path, logo)
        back = load_lgd(path)
        assert back.header.w == LW and back.header.h == LH
        assert back.header.name == "testlogo"
        assert back.header.service_id == 1234
        assert (back.header.imgx, back.header.imgy) == (8, 8)
        np.testing.assert_array_equal(back.a_y, logo.a_y)
        np.testing.assert_array_equal(back.b_y, logo.b_y)
        np.testing.assert_array_equal(back.a_u, logo.a_u)

    def test_base_block_delogo_compat(self, tmp_path):
        # the delogo base block must be present with the right magic string
        logo = make_logo_data()
        path = str(tmp_path / "test.lgd")
        save_lgd(path, logo)
        data = open(path, "rb").read()
        assert data.startswith(b"<logo data file ver0.1>")
        assert data[28:32] == b"\x00\x00\x00\x01"  # big-endian logo count


class TestBorderFlat:
    def test_flat_accepted(self):
        y, u, v = frame_with_logo(100, np.zeros((LH, LW)), on=False)
        bg = border_flat_background(y, u, v, thy=12)
        assert bg is not None
        assert abs(bg[0] - 100) <= 2 and abs(bg[1] - 128) <= 4 and abs(bg[2] - 128) <= 4

    def test_busy_border_rejected(self):
        y, u, v = frame_with_logo(100, np.zeros((LH, LW)), on=False)
        y[0, :] = np.arange(IMGW) % 200  # busy top border
        assert border_flat_background(y, u, v, thy=12) is None


class TestAnalyzer:
    def test_three_pass_recovery(self, ctx):
        """Feed synthetic flat-background frames with the logo on; the 3-pass
        analyzer must recover A/B close to the truth."""
        a_true, b_true, alpha = synth_logo_ab()
        rng = np.random.default_rng(0)

        def frames():
            for i in range(300):
                bg = float(rng.uniform(30, 140))
                # 80% logo on, 20% off (the analyzer should reject/downweight)
                on = rng.random() < 0.8
                yield frame_with_logo(bg, alpha, on=on)

        an = LogoAnalyzer(ctx, ScanRegion(8, 8, LW, LH), thy=12, batch=64)
        logo = an.scan(frames(), IMGW, IMGH, name="recovered", service_id=5)
        assert logo is not None
        # compare on the logo's core (edge cleanup may zero the surroundings)
        core = alpha > 0.15
        np.testing.assert_allclose(logo.a_y[core], a_true[core], atol=0.08)
        np.testing.assert_allclose(logo.b_y[core], b_true[core], atol=0.04)

    def test_save(self, ctx, tmp_path):
        a_true, b_true, alpha = synth_logo_ab()
        rng = np.random.default_rng(1)

        def frames():
            for i in range(120):
                yield frame_with_logo(float(rng.uniform(30, 140)), alpha, on=True)

        an = LogoAnalyzer(ctx, ScanRegion(8, 8, LW, LH), thy=12, batch=64)
        an.scan(frames(), IMGW, IMGH)
        path = str(tmp_path / "out.lgd")
        an.save(path)
        back = load_lgd(path)
        assert back.header.imgw == IMGW


class TestMatcher:
    def test_select_and_intervals(self, ctx):
        a, b, alpha = synth_logo_ab()
        header = LogoHeader(LW, LH, 1, 1, IMGW, IMGH, 8, 8, "L0", 1)
        logo = LogoData.create(header)
        logo.a_y, logo.b_y = a, b
        # a decoy logo that never matches
        decoy = LogoData.create(header)
        decoy.a_y = np.full((LH, LW), 1.3, np.float32)
        decoy.b_y = np.full((LH, LW), -0.2, np.float32)

        rng = np.random.default_rng(2)
        fps = 10  # small windows for the test
        n = 120
        on_ranges = [(10, 50), (70, 110)]  # logo-on frame spans

        def frames():
            for i in range(n):
                on = any(s <= i < e for s, e in on_ranges)
                bg = float(rng.uniform(40, 140))
                y, _, _ = frame_with_logo(bg, alpha, on=on)
                yield y

        m = LogoFrameMatcher(ctx, [logo, decoy])
        m.scan_frames(frames(), IMGW, IMGH, fps, batch=40)
        best = m.select_logo()
        assert best == 0
        assert 0.5 < m.logo_ratio <= 0.75

        ivs = m.intervals()
        assert len(ivs) == 2
        # interval boundaries within the smoothing window of the truth
        assert abs(ivs[0].s_best - 10) <= fps
        assert abs(ivs[0].e_best - 50) <= fps
        assert abs(ivs[1].s_best - 70) <= fps
        assert abs(ivs[1].e_best - 110) <= fps

    def test_write_result_format(self, ctx, tmp_path):
        a, b, alpha = synth_logo_ab()
        header = LogoHeader(LW, LH, 1, 1, IMGW, IMGH, 8, 8, "L0", 1)
        logo = LogoData.create(header)
        logo.a_y, logo.b_y = a, b
        rng = np.random.default_rng(3)

        def frames():
            for i in range(60):
                y, _, _ = frame_with_logo(float(rng.uniform(40, 140)), alpha,
                                          on=(15 <= i < 45))
                yield y

        m = LogoFrameMatcher(ctx, [logo])
        m.scan_frames(frames(), IMGW, IMGH, 10, batch=30)
        path = str(tmp_path / "logof.txt")
        m.write_result(path)
        lines = open(path).read().strip().splitlines()
        assert len(lines) == 2
        assert " S 0 ALL " in lines[0]
        assert " E 0 ALL " in lines[1]


class TestLogoRender:
    def _make_lgd(self, tmp_path):
        LW, LH = 16, 8
        header = LogoHeader(LW, LH, 1, 1, 1440, 1080, 100, 60, "renderme", 7)
        logo = LogoData.create(header)
        # a visible logo: brightens the middle region
        logo.a_y[:] = 1.0
        logo.b_y[:] = 0.0
        logo.a_y[2:6, 4:12] = 0.8
        logo.b_y[2:6, 4:12] = -0.1
        logo.a_u[:] = 1.0
        logo.a_v[:] = 1.0
        path = str(tmp_path / "r.lgd")
        save_lgd(path, logo)
        return path

    def test_render_and_rename(self, tmp_path):
        from amatsukaze_tpu.models.logo_render import GUILogoFile

        path = self._make_lgd(tmp_path)
        g = GUILogoFile(path)
        assert (g.width, g.height) == (16, 8)
        assert g.name == "renderme"
        rgb = g.render(bg=128)
        assert rgb.shape == (8, 16, 3)
        # the logo region differs from the flat background
        assert rgb[3, 8, 0] != rgb[0, 0, 0]
        g.set_name("renamed")
        g.save()
        assert GUILogoFile(path).name == "renamed"

    def test_compose_inverts_erase(self):
        import numpy as np

        from amatsukaze_tpu.models.logo_render import compose_logo_plane

        rng = np.random.default_rng(0)
        a = rng.uniform(0.7, 1.0, (4, 4)).astype(np.float32)
        b = rng.uniform(-0.2, 0.2, (4, 4)).astype(np.float32)
        bg = 128.0
        observed = compose_logo_plane(a, b, bg)
        # erasing the rendered logo recovers the background
        clean = a * observed + b * 255.0
        np.testing.assert_allclose(clean, bg, atol=1e-3)

    def test_frame_extractor(self, tmp_path):
        import numpy as np

        from amatsukaze_tpu.models.logo_render import MediaFrameExtractor
        from amatsukaze_tpu.types import VideoFormat

        def decoder(path):
            fmt = VideoFormat(width=16, height=8)

            def frames():
                for i in range(30):
                    y = np.full((8, 16), 16 + i * 5, np.uint8)
                    u = np.full((4, 8), 128, np.uint8)
                    yield y, u, u

            return fmt, frames(), []

        ex = MediaFrameExtractor("x", decoder)
        f0 = ex.get_frame(0.0, approx_total=30)
        f1 = ex.get_frame(0.5, approx_total=30)
        assert f0.shape == (8, 16, 3)
        assert f1[0, 0, 0] > f0[0, 0, 0]  # later frame is brighter


class TestHostTwins:
    """The numpy logo twins (ops.logo_host, engaged on slow device
    links) must match the device ops closely enough that every
    downstream decision (fade argmin, logo selection, intervals) is
    identical on this data."""

    def _run_both(self, fn):
        import amatsukaze_tpu.models.logo as ml

        out = {}
        for backend in (False, True):
            ml._HOST_OPS = backend
            try:
                out[backend] = fn()
            finally:
                ml._HOST_OPS = None
        return out[False], out[True]

    def test_analyzer_backends_agree(self, ctx):
        a_true, b_true, alpha = synth_logo_ab()

        def scan():
            rng = np.random.default_rng(5)

            def frames():
                for i in range(200):
                    bg = float(rng.uniform(30, 140))
                    yield frame_with_logo(bg, alpha, on=rng.random() < 0.8)

            an = LogoAnalyzer(ctx, ScanRegion(8, 8, LW, LH), thy=12,
                              batch=64)
            return an.scan(frames(), IMGW, IMGH, name="x", service_id=1)

        dev, host = self._run_both(scan)
        # refinement picks frames by fade-argmin: float reduce-order
        # noise can flip borderline frames between backends, so the
        # recovered planes are equal in QUALITY, not bitwise.  Both
        # must hit the standard recovery tolerance, and agree closely
        # on the logo core.
        a_true, b_true, alpha = synth_logo_ab()
        core = alpha > 0.15
        for logo in (dev, host):
            np.testing.assert_allclose(logo.a_y[core], a_true[core],
                                       atol=0.08)
            np.testing.assert_allclose(logo.b_y[core], b_true[core],
                                       atol=0.04)
        np.testing.assert_allclose(host.a_y[core], dev.a_y[core],
                                   atol=0.05)

    def test_matcher_backends_agree(self, ctx):
        logo = make_logo_data()
        rng = np.random.default_rng(6)
        seq = []
        for i in range(40):
            y, _, _ = frame_with_logo(float(rng.uniform(40, 120)),
                                      synth_logo_ab()[2], on=i % 3 != 0)
            seq.append(y)

        def match():
            m = LogoFrameMatcher(ctx, [logo])
            m.scan_frames(iter(seq), IMGW, IMGH, fps=30, batch=16)
            m.select_logo()
            return m.best_logo, m.logo_ratio, m.eval_results.copy()

        (bl_d, r_d, ev_d), (bl_h, r_h, ev_h) = self._run_both(match)
        assert bl_d == bl_h
        assert abs(r_d - r_h) < 1e-9  # same detected set
        np.testing.assert_allclose(ev_h, ev_d, atol=1e-4)
