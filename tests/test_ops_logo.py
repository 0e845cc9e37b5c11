"""Logo device-kernel tests: JAX batched ops vs the numpy oracle
(which mirrors the reference C++ arithmetic exactly)."""

import numpy as np
import pytest

import jax.numpy as jnp

from amatsukaze_tpu.ops import logo_ref
from amatsukaze_tpu.ops.logo import (
    LogoEvalParams,
    batched_deint_y,
    batched_deint_logo,
    batched_delogo,
    batched_evaluate_logo,
    field_fades,
    logo_ab_from_sums,
    logo_sums_update,
)

H, W = 16, 24
RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def synth_logo():
    """A synthetic semi-transparent logo: a filled ring in the window."""
    yy, xx = np.mgrid[0:H, 0:W]
    r = np.hypot((yy - H / 2) / (H / 2), (xx - W / 2) / (W / 2))
    alpha = np.clip(1.2 - r, 0, 1) * 0.35  # max 35% opacity
    # observed = (1-alpha)*bg + alpha*logo_color ; logo_color = 200
    # solve for bg: bg = (obs - alpha*200) / (1-alpha) = a*obs + b*maxv
    a = 1.0 / (1.0 - alpha)
    b = -alpha * 200.0 / (1.0 - alpha) / 255.0
    return a.astype(np.float32), b.astype(np.float32), alpha.astype(np.float32)


def paint_logo(bg, alpha, color=200.0):
    return (1 - alpha) * bg + alpha * color


class TestDeint:
    def test_deint_y_matches_oracle(self):
        src = RNG.integers(0, 256, (H, W)).astype(np.int32)
        ref = logo_ref.deint_y(src)
        out = np.asarray(batched_deint_y(jnp.asarray(src.astype(np.float32))))
        np.testing.assert_array_equal(ref, out)

    def test_deint_logo_matches_oracle(self):
        plane = RNG.random((H, W)).astype(np.float32)
        ref = logo_ref.deint_logo(plane)
        out = np.asarray(batched_deint_logo(jnp.asarray(plane)))
        np.testing.assert_allclose(ref, out, rtol=0, atol=1e-6)

    def test_batched(self):
        src = RNG.integers(0, 256, (4, H, W)).astype(np.float32)
        out = np.asarray(batched_deint_y(jnp.asarray(src)))
        for i in range(4):
            np.testing.assert_array_equal(out[i], logo_ref.deint_y(src[i]))


class TestDelogo:
    def test_matches_oracle_uint8(self, synth_logo):
        a, b, alpha = synth_logo
        src = RNG.integers(0, 256, (6, H, W)).astype(np.float32)
        fades = np.array([0.0, 0.3, 0.5, 0.7, 1.0, 0.9], np.float32)
        out = np.asarray(
            batched_delogo(jnp.asarray(src), jnp.asarray(a), jnp.asarray(b),
                           jnp.float32(255.0), jnp.asarray(fades))
        ).astype(np.uint8)
        for i in range(6):
            ref = logo_ref.delogo(src[i], a, b, 255.0, fades[i])
            np.testing.assert_array_equal(ref, out[i])

    def test_fade_zero_identity(self, synth_logo):
        a, b, _ = synth_logo
        src = RNG.integers(0, 256, (2, H, W)).astype(np.float32)
        out = np.asarray(
            batched_delogo(jnp.asarray(src), jnp.asarray(a), jnp.asarray(b),
                           jnp.float32(255.0), jnp.zeros(2, jnp.float32))
        )
        np.testing.assert_array_equal(out, src)

    def test_removes_logo(self, synth_logo):
        a, b, alpha = synth_logo
        bg = np.full((H, W), 120.0, np.float32)
        painted = paint_logo(bg, alpha)
        out = np.asarray(
            batched_delogo(jnp.asarray(painted[None]), jnp.asarray(a),
                           jnp.asarray(b), jnp.float32(255.0),
                           jnp.ones(1, jnp.float32))
        )[0]
        assert np.abs(out - 120.0).max() <= 1.0  # logo gone within rounding

    def test_field_mode(self, synth_logo):
        a, b, _ = synth_logo
        src = RNG.integers(0, 256, (2, H, W)).astype(np.float32)
        ft = np.array([1.0, 0.2], np.float32)
        fb = np.array([0.0, 0.8], np.float32)
        fades = field_fades(jnp.asarray(ft), jnp.asarray(fb), H)
        out = np.asarray(
            batched_delogo(jnp.asarray(src), jnp.asarray(a), jnp.asarray(b),
                           jnp.float32(255.0), fades)
        )
        for i in range(2):
            ref_t = logo_ref.delogo(src[i, 0::2], a[0::2], b[0::2], 255.0, ft[i])
            ref_b = logo_ref.delogo(src[i, 1::2], a[1::2], b[1::2], 255.0, fb[i])
            np.testing.assert_array_equal(out[i, 0::2].astype(np.uint8), ref_t)
            np.testing.assert_array_equal(out[i, 1::2].astype(np.uint8), ref_b)


class TestEvaluateLogo:
    @pytest.fixture(scope="class")
    def eval_ref(self, synth_logo):
        a, b, _ = synth_logo
        return logo_ref.LogoEvalRef(a, b, maskratio=0.1)

    @pytest.fixture(scope="class")
    def eval_params(self, eval_ref):
        return LogoEvalParams.from_ref(eval_ref)

    def test_black_score_positive(self, eval_ref):
        assert eval_ref.black_score > 0

    def test_matches_oracle(self, eval_ref, eval_params, synth_logo):
        _, _, alpha = synth_logo
        frames = []
        for i in range(8):
            bg = RNG.integers(30, 220, (H, W)).astype(np.float32)
            frames.append(paint_logo(bg, alpha) if i % 2 == 0 else bg)
        frames = np.stack(frames)
        fades = np.array([0.0, 1.0], np.float32)
        out = np.asarray(
            batched_evaluate_logo(eval_params, jnp.asarray(frames),
                                  jnp.float32(255.0), jnp.asarray(fades))
        )
        for i in range(8):
            for j, fade in enumerate(fades):
                ref = eval_ref.evaluate(frames[i], 255.0, float(fade))
                assert out[i, j] == pytest.approx(ref, abs=2e-3), (i, j)

    def test_detects_logo_presence(self, eval_ref, eval_params, synth_logo):
        """corr0 > thresh and |corr1| < thresh for frames with the logo
        (the selectLogo detection rule, ref LogoScan.hpp:1647-1682)."""
        _, _, alpha = synth_logo
        rng = np.random.default_rng(7)

        def smooth_bg():
            # broadcast-like background: smooth gradient + mild noise
            yy, xx = np.mgrid[0:H, 0:W]
            # keep backgrounds away from the logo's own colour (200):
            # a logo blended onto its own colour is physically invisible
            g = (rng.uniform(40, 140)
                 + rng.uniform(-30, 30) * xx / W
                 + rng.uniform(-30, 30) * yy / H
                 + rng.normal(0, 2, (H, W)))
            return np.clip(g, 16, 235).astype(np.float32)

        with_logo = np.stack([paint_logo(smooth_bg(), alpha) for _ in range(8)])
        without = np.stack([smooth_bg() for _ in range(8)])
        fades = jnp.asarray([0.0, 1.0], jnp.float32)
        r_with = np.asarray(
            batched_evaluate_logo(eval_params, jnp.asarray(with_logo),
                                  jnp.float32(255.0), fades)
        )
        r_without = np.asarray(
            batched_evaluate_logo(eval_params, jnp.asarray(without),
                                  jnp.float32(255.0), fades)
        )
        # logo present: fade=0 keeps logo correlation, fade=1 erases it
        assert (r_with[:, 0] > 0.2).all()
        assert (np.abs(r_with[:, 1]) < 0.2).all()
        # logo absent: erasing it leaves negative correlation (ghost)
        assert (r_without[:, 0] < 0.2).all()


class TestLogoRegression:
    def test_sums_match_scalar_accumulation(self):
        frames = RNG.integers(0, 256, (10, H, W)).astype(np.float32)
        bgs = RNG.integers(0, 256, 10).astype(np.float32)
        sums = np.zeros((5, H, W), np.float32)
        out = np.asarray(
            logo_sums_update(jnp.asarray(sums), jnp.asarray(frames), jnp.asarray(bgs))
        )
        np.testing.assert_allclose(out[0], frames.sum(0), rtol=1e-6)
        np.testing.assert_allclose(out[4], (frames * bgs[:, None, None]).sum(0), rtol=1e-6)

    def test_recovers_logo(self, synth_logo):
        """Accumulating (observed, background) pairs over many frames must
        recover the A/B planes by least squares (the LogoScan model)."""
        a_true, b_true, alpha = synth_logo
        rng = np.random.default_rng(3)
        n = 400
        bgs = rng.uniform(16, 235, n).astype(np.float32)
        frames = np.stack([paint_logo(np.full((H, W), bg, np.float32), alpha)
                           for bg in bgs])
        # normalize to 0-1 as the reference does (Normalize(255))
        sums = jnp.zeros((5, H, W), jnp.float32)
        sums = logo_sums_update(sums, jnp.asarray(frames / 255.0),
                                jnp.asarray(bgs / 255.0))
        a_est, b_est, valid = logo_ab_from_sums(sums, jnp.float32(n))
        a_est, b_est = np.asarray(a_est), np.asarray(b_est)
        assert np.asarray(valid).all()
        # A maps observed->background: bg = A*obs + B*maxv
        # relation: obs = (1-alpha)*bg + alpha*200 => A = 1/(1-alpha)
        np.testing.assert_allclose(a_est, a_true, rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(b_est, b_true, rtol=5e-3, atol=5e-3)

    def test_oracle_get_ab_agreement(self):
        rng = np.random.default_rng(11)
        n = 50
        f = rng.uniform(0, 1, n)
        b = 0.8 * f + 0.05 + rng.normal(0, 0.01, n)
        sums = np.array([
            f.sum(), b.sum(), (f * f).sum(), (b * b).sum(), (f * b).sum()
        ])
        a_ref, b_ref, valid = logo_ref.logo_get_ab(*sums, n)
        grid = jnp.asarray(np.tile(sums[:, None, None], (1, 2, 2)).astype(np.float32))
        a_jax, b_jax, v_jax = logo_ab_from_sums(grid, jnp.float32(n))
        assert valid and bool(np.asarray(v_jax).all())
        assert float(np.asarray(a_jax)[0, 0]) == pytest.approx(float(a_ref), rel=1e-4)
        assert float(np.asarray(b_jax)[0, 0]) == pytest.approx(float(b_ref), rel=1e-4)


class TestMedAverage:
    def test_middle_half(self):
        assert logo_ref.med_average([0, 100, 110, 200]) == 105
        assert logo_ref.med_average(list(range(8))) == 4  # (3+4+3+2/2)/4
