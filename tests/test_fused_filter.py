"""Fused Pallas filter kernel vs the jnp reference chain (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from amatsukaze_tpu.ops import deint as deint_ops
from amatsukaze_tpu.ops.fused_filter import make_fused_filter, pad_width_for_fused
from amatsukaze_tpu.ops.logo import batched_delogo
from amatsukaze_tpu.ops.logo_pallas import pad_logo_planes

B, H, W = 4, 32, 128


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (B, H, W), dtype=np.uint8)
    yy, xx = np.mgrid[0:8, 0:16]
    alpha = (np.clip(1.0 - np.hypot((yy - 4) / 4, (xx - 8) / 8), 0, 1) * 0.3
             ).astype(np.float32)
    a = (1.0 / (1.0 - alpha)).astype(np.float32)
    b = (-alpha * 200.0 / (1.0 - alpha) / 255.0).astype(np.float32)
    a_full, b_full = pad_logo_planes(a, b, H, W, 4, 2)
    fades = rng.uniform(0, 1, B).astype(np.float32)
    return frames, a_full, b_full, fades


def reference_chain(frames, a_full, b_full, fades):
    f = jnp.asarray(frames.astype(np.float32))
    erased = batched_delogo(f, jnp.asarray(a_full), jnp.asarray(b_full),
                            jnp.float32(255.0), jnp.asarray(fades))
    prev = jnp.concatenate([erased[:1], erased[:-1]], axis=0)
    nxt = jnp.concatenate([erased[1:], erased[-1:]], axis=0)
    out = deint_ops.yadif_deinterlace(prev, erased, nxt, True)
    out_u8 = np.asarray(jnp.clip(jnp.floor(out + 0.5), 0, 255)).astype(np.uint8)
    costs = np.asarray(deint_ops.field_match_costs(erased))
    return out_u8, costs


class TestFusedFilter:
    def test_matches_reference(self, setup):
        frames, a_full, b_full, fades = setup
        fused = make_fused_filter(H, W, tile_rows=16)
        out, costs = fused(jnp.asarray(frames), jnp.asarray(a_full),
                           jnp.asarray(b_full), jnp.asarray(fades),
                           jnp.float32(255.0), interpret=True)
        ref_out, ref_costs = reference_chain(frames, a_full, b_full, fades)
        np.testing.assert_array_equal(np.asarray(out), ref_out)
        np.testing.assert_allclose(np.asarray(costs), ref_costs, rtol=1e-5,
                                   atol=1e-4)

    def test_single_tile(self, setup):
        frames, a_full, b_full, fades = setup
        fused = make_fused_filter(H, W, tile_rows=H)
        out, costs = fused(jnp.asarray(frames), jnp.asarray(a_full),
                           jnp.asarray(b_full), jnp.asarray(fades),
                           jnp.float32(255.0), interpret=True)
        ref_out, ref_costs = reference_chain(frames, a_full, b_full, fades)
        np.testing.assert_array_equal(np.asarray(out), ref_out)
        np.testing.assert_allclose(np.asarray(costs), ref_costs, rtol=1e-5,
                                   atol=1e-4)

    def test_padded_width(self, setup):
        """Non-128-aligned frame width via edge padding (the 1440 case)."""
        frames, a_full, b_full, fades = setup
        lw = W - 24
        frames = frames[:, :, :lw]
        a_full = a_full[:, :lw]
        b_full = b_full[:, :lw]
        fp, ap, bp = pad_width_for_fused(
            jnp.asarray(frames), jnp.asarray(a_full), jnp.asarray(b_full), W)
        fused = make_fused_filter(H, W, tile_rows=16, logical_width=lw)
        out, costs = fused(fp, ap, bp, jnp.asarray(fades),
                           jnp.float32(255.0), interpret=True)
        ref_out, ref_costs = reference_chain(frames, a_full, b_full, fades)
        np.testing.assert_array_equal(np.asarray(out)[:, :, :lw], ref_out)
        np.testing.assert_allclose(np.asarray(costs), ref_costs, rtol=1e-5,
                                   atol=1e-4)

    def test_padded_height(self, setup):
        """Non-8-aligned plane height via edge padding (the 540-row 4:2:0
        chroma case, scaled down: logical 20 rows stored as 32)."""
        frames, a_full, b_full, fades = setup
        lh = 20
        frames = frames[:, :lh, :]
        a_full = a_full[:lh, :]
        b_full = b_full[:lh, :]
        fp, ap, bp = pad_width_for_fused(
            jnp.asarray(frames), jnp.asarray(a_full), jnp.asarray(b_full),
            W, H)
        fused = make_fused_filter(H, W, tile_rows=16, logical_height=lh)
        out, costs = fused(fp, ap, bp, jnp.asarray(fades),
                           jnp.float32(255.0), interpret=True)
        ref_out, ref_costs = reference_chain(frames, a_full, b_full, fades)
        np.testing.assert_array_equal(np.asarray(out)[:, :lh, :], ref_out)
        np.testing.assert_allclose(np.asarray(costs), ref_costs, rtol=1e-5,
                                   atol=1e-4)

    def test_padded_height_and_width(self, setup):
        frames, a_full, b_full, fades = setup
        lh, lw = 26, 100
        frames = frames[:, :lh, :lw]
        a_full = a_full[:lh, :lw]
        b_full = b_full[:lh, :lw]
        fp, ap, bp = pad_width_for_fused(
            jnp.asarray(frames), jnp.asarray(a_full), jnp.asarray(b_full),
            W, H)
        fused = make_fused_filter(H, W, tile_rows=16, logical_width=lw,
                                  logical_height=lh)
        out, costs = fused(fp, ap, bp, jnp.asarray(fades),
                           jnp.float32(255.0), interpret=True)
        ref_out, ref_costs = reference_chain(frames, a_full, b_full, fades)
        np.testing.assert_array_equal(np.asarray(out)[:, :lh, :lw], ref_out)
        np.testing.assert_allclose(np.asarray(costs), ref_costs, rtol=1e-5,
                                   atol=1e-4)

    def test_yadif_only_variant(self, setup):
        """with_costs=False: same filtered output, costs None."""
        frames, a_full, b_full, fades = setup
        fused = make_fused_filter(H, W, tile_rows=16, with_costs=False)
        # erase pass outside (identical math), then the yadif-only kernel
        import jax.numpy as jnp
        x = jnp.asarray(frames).astype(jnp.float32)
        fade = jnp.asarray(fades)[:, None, None]
        bg = jnp.asarray(a_full) * x + jnp.asarray(b_full) * 255.0
        erased = jnp.clip(jnp.floor(fade*bg + (1.0-fade)*x + 0.5),
                          0, 255).astype(jnp.uint8)
        out, costs = fused.yadif_costs(erased, jnp.float32(255.0),
                                       interpret=True)
        assert costs is None
        ref_out, _ = reference_chain(frames, a_full, b_full, fades)
        np.testing.assert_array_equal(np.asarray(out), ref_out)


class TestFieldLayoutKernel:
    """Field-plane-layout variant (make_fused_filter_field): bit-exact
    against the frame-layout kernel / jnp chain."""

    def _check(self, h, w, wp, lw=None, lh=None, ftile=16, b=6):
        import jax.numpy as jnp

        from amatsukaze_tpu.ops.fused_filter import (
            make_fused_filter_field, pad_width_for_fused)

        lw = lw or w
        lh = lh or h
        rng = np.random.default_rng(42)
        frames = rng.integers(0, 256, (b, h, lw), dtype=np.uint8)
        a = np.ones((h, lw), np.float32)
        z = np.zeros((h, lw), np.float32)
        fp, _, _ = pad_width_for_fused(jnp.asarray(frames), jnp.asarray(a),
                                       jnp.asarray(z), wp, h)
        v2 = make_fused_filter_field(h, wp, field_tile_rows=ftile,
                                     logical_width=lw, logical_height=lh)
        out, costs = v2(fp, jnp.float32(255.0), interpret=True)
        ref_out, ref_costs = reference_chain(
            frames[:, :lh].astype(np.float32),
            a[:lh], z[:lh], np.zeros(b, np.float32))
        np.testing.assert_array_equal(
            np.asarray(out)[:, :lh, :lw], ref_out)
        np.testing.assert_allclose(np.asarray(costs), ref_costs,
                                   rtol=1e-5, atol=1e-6)

    def test_aligned_geometry(self):
        self._check(64, 128, 128)

    def test_logical_width(self):
        self._check(64, 96, 128, lw=96)

    def test_logical_height_odd_field_tiles(self):
        # 40 rows -> 20 field rows, padded to ftile 24
        self._check(48, 128, 128, lh=40, ftile=24)

    def test_yadif_only_variant(self):
        import jax.numpy as jnp

        from amatsukaze_tpu.ops.fused_filter import (
            make_fused_filter_field, pad_width_for_fused)

        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, (5, 32, 128), dtype=np.uint8)
        fp, _, _ = pad_width_for_fused(
            jnp.asarray(frames), jnp.ones((32, 128), np.float32),
            jnp.zeros((32, 128), np.float32), 128)
        v2 = make_fused_filter_field(32, 128, field_tile_rows=16,
                                     with_costs=False)
        out, costs = v2(fp, jnp.float32(255.0), interpret=True)
        assert costs is None
        ref_out, _ = reference_chain(
            frames.astype(np.float32), np.ones((32, 128), np.float32),
            np.zeros((32, 128), np.float32), np.zeros(5, np.float32))
        np.testing.assert_array_equal(np.asarray(out), ref_out)


class TestLogoOverlayKernel:
    """logo_box variant: erase + yadif + costs in one kernel pass, the
    erased box DMA'd over the slabs in-kernel. Must be bit-exact vs the
    two-pass chain (full-frame XLA erase -> plain kernel) for boxes at
    any position, including tile-crossing and unaligned origins."""

    @pytest.mark.parametrize("box", [
        (0, 0, 20, 40),      # top-left corner (broadcast logo position)
        (10, 30, 17, 33),    # odd origin/size -> alignment expansion
        (34, 100, 30, 40),   # crosses the 16-row field-tile boundary
        (3, 5, 8, 8),        # tiny
    ])
    def test_bit_exact_vs_two_pass(self, box):
        import jax.numpy as jnp

        from amatsukaze_tpu.ops.fused_filter import (
            make_fused_filter_field, pad_width_for_fused)

        h, w, wp = 64, 140, 256
        y0, x0, bh, bw = box
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 256, (5, h, w), dtype=np.uint8)
        alpha = np.clip(rng.uniform(0, 0.4, (bh, bw)), 0.01,
                        0.4).astype(np.float32)
        a_full = np.ones((h, w), np.float32)
        b_full = np.zeros((h, w), np.float32)
        a_full[y0:y0 + bh, x0:x0 + bw] = 1.0 / (1.0 - alpha)
        b_full[y0:y0 + bh, x0:x0 + bw] = (
            -alpha * 200.0 / (1.0 - alpha) / 255.0)
        fades = jnp.asarray(rng.uniform(0, 1, (5,)).astype(np.float32))
        fp, ap, bp = pad_width_for_fused(
            jnp.asarray(frames), jnp.asarray(a_full),
            jnp.asarray(b_full), wp)
        # reference: full-frame erase then plain kernel
        x = fp.astype(jnp.float32)
        fd = fades[:, None, None]
        bg = ap * x + bp * 255.0
        erased = jnp.clip(jnp.floor(fd * bg + (1.0 - fd) * x + 0.5),
                          0.0, 255.0).astype(jnp.uint8)
        plain = make_fused_filter_field(h, wp, field_tile_rows=16,
                                        logical_width=w)
        out_ref, costs_ref = plain(erased, jnp.float32(255.0),
                                   interpret=True)
        fl = make_fused_filter_field(h, wp, field_tile_rows=16,
                                     logical_width=w,
                                     logo_box=(y0, x0, bh, bw))
        wy0, wx0, wh, ww = fl.window
        ab = jnp.asarray(np.asarray(ap)[wy0:wy0 + wh, wx0:wx0 + ww])
        bb = jnp.asarray(np.asarray(bp)[wy0:wy0 + wh, wx0:wx0 + ww])
        out_new, costs_new = fl(fp, ab, bb, fades, jnp.float32(255.0),
                                interpret=True)
        np.testing.assert_array_equal(np.asarray(out_ref),
                                      np.asarray(out_new))
        np.testing.assert_array_equal(np.asarray(costs_ref),
                                      np.asarray(costs_new))
