"""Deinterlace/telecine, CM-metric, and post-filter kernel tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from amatsukaze_tpu.ops import cm as cm_ops
from amatsukaze_tpu.ops import deint as deint_ops
from amatsukaze_tpu.ops import denoise as dn_ops

RNG = np.random.default_rng(5)
B, H, W = 10, 32, 48


def make_progressive_sequence(n=B, h=H, w=W, motion=2.0):
    """Smooth moving-gradient frames (film-like)."""
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        f = 128 + 80 * np.sin((xx + motion * i * 3) / 7.0) * np.cos(yy / 9.0)
        frames.append(f)
    return np.clip(np.stack(frames), 0, 255).astype(np.float32)


def telecine_32(film_frames):
    """Apply 3:2 pulldown (TFF): film frames -> 5 interlaced frames per 4."""
    out = []
    fields = []  # (top, bottom) per film frame
    for f in film_frames:
        fields.append((f[0::2], f[1::2]))
    i = 0
    while i + 4 <= len(fields):
        a, b, c, d = fields[i : i + 4]
        out.append(np.concatenate([a[0][:, None], a[1][:, None]], 1).reshape(-1, film_frames.shape[2]))
        out.append(np.concatenate([a[0][:, None], b[1][:, None]], 1).reshape(-1, film_frames.shape[2]))
        out.append(np.concatenate([b[0][:, None], c[1][:, None]], 1).reshape(-1, film_frames.shape[2]))
        out.append(np.concatenate([c[0][:, None], c[1][:, None]], 1).reshape(-1, film_frames.shape[2]))
        out.append(np.concatenate([d[0][:, None], d[1][:, None]], 1).reshape(-1, film_frames.shape[2]))
        i += 4
    return np.stack(out)


class TestFields:
    def test_split_weave_roundtrip(self):
        frames = make_progressive_sequence(2)
        t, b = deint_ops.field_split(jnp.asarray(frames))
        back = np.asarray(deint_ops.weave(t, b))
        np.testing.assert_array_equal(back, frames)

    def test_bob_preserves_field(self):
        frames = make_progressive_sequence(2)
        t, _ = deint_ops.field_split(jnp.asarray(frames))
        bob = np.asarray(deint_ops.bob_field(t, True))
        np.testing.assert_array_equal(bob[:, 0::2], frames[:, 0::2])

    def test_yadif_static_scene_reconstructs(self):
        # static scene: yadif output should be ~identical to the source frame
        f = make_progressive_sequence(3, motion=0.0)
        out = np.asarray(
            deint_ops.yadif_deinterlace(
                jnp.asarray(f[0:1]), jnp.asarray(f[1:2]), jnp.asarray(f[2:3]), True
            )
        )
        assert np.abs(out - f[1:2]).max() < 4.0


class TestTelecine:
    def test_combing_detects_interlace(self):
        film = make_progressive_sequence(8, motion=4.0)
        tc = telecine_32(film)  # frames 2 of each cycle are combed
        scores = np.asarray(deint_ops.combing_metric(jnp.asarray(tc)))
        # frame index 2 in each 5-frame cycle mixes two film frames -> combed
        combed = scores[2::5]
        clean = np.concatenate([scores[0::5], scores[3::5]])
        assert combed.min() > clean.max()

    def test_pattern_cost_identifies_phase(self):
        film = make_progressive_sequence(16, motion=4.0)
        tc = telecine_32(film)  # phase 0 by construction
        costs = deint_ops.field_match_costs(jnp.asarray(tc))
        pat = np.asarray(deint_ops.telecine_pattern_costs(costs))
        # skip cycle 0 (no previous frame for the first merge)
        phases = pat[1:, :5].argmin(axis=1)
        assert (phases == phases[0]).all()
        # pulldown cost clearly below straight-30p cost
        assert (pat[1:, phases[0]] < pat[1:, 5]).all()

    def test_progressive_content_prefers_30p(self):
        frames = make_progressive_sequence(10, motion=3.0)
        costs = deint_ops.field_match_costs(jnp.asarray(frames))
        pat = np.asarray(deint_ops.telecine_pattern_costs(costs))
        # no pulldown pattern should beat 30p by a meaningful margin
        assert pat[1:, 5].min() <= pat[1:, :5].min(axis=1).max() + 1e-3


class TestSceneChange:
    def test_detects_cut(self):
        a = make_progressive_sequence(5, motion=1.0)
        # genuinely different scene: different pattern AND different histogram
        yy, xx = np.mgrid[0:H, 0:W]
        b0 = np.clip(40 + 20 * np.sin(yy / 2.0) + 10 * np.cos(xx / 3.0), 0, 255)
        bseq = np.stack([b0.astype(np.float32)] * 5)
        frames = np.concatenate([a, bseq])
        scores = cm_ops.scene_change_scores(jnp.asarray(frames))
        corr = cm_ops.histogram_correlation(jnp.asarray(frames))
        cuts = cm_ops.detect_scene_changes(scores, corr)
        assert cuts == [5]

    def test_silence_detection(self):
        sr = 48000
        pcm = RNG.normal(0, 0.3, sr * 2).astype(np.float32)
        pcm[sr // 2 : sr] = RNG.normal(0, 0.001, sr // 2)  # 0.5 s silence
        rms = cm_ops.audio_rms_windows(jnp.asarray(pcm), sr // 100)  # 10 ms windows
        spans = cm_ops.detect_silence(rms, threshold=0.01, min_windows=20)
        assert len(spans) == 1
        start, end = spans[0]
        assert abs(start - 50) <= 1 and abs(end - 100) <= 1


class TestPostFilters:
    def test_deblock_reduces_blockiness(self):
        # blocky frame: quantised 8x8 DCT content
        f = make_progressive_sequence(2, h=32, w=32)
        blocky = (f // 16) * 16.0
        qp = jnp.full((2, 2, 2), 8.0)
        out = np.asarray(dn_ops.deblock_qp(jnp.asarray(blocky), qp, strength=1.0))
        # energy of the quantisation error must go down
        err_before = np.mean((blocky - f) ** 2)
        err_after = np.mean((out - f) ** 2)
        assert err_after < err_before
        assert out.shape == blocky.shape

    def test_temporal_nr_static_noise(self):
        # static scene: temporal averaging should cut the noise power
        base = make_progressive_sequence(8, motion=0.0) * 64.0  # 14-bit domain
        noisy = base + RNG.normal(0, 8, base.shape).astype(np.float32)
        out = np.asarray(dn_ops.temporal_nr(jnp.asarray(noisy), threshold=64.0))
        assert np.mean((out - base) ** 2) < np.mean((noisy - base) ** 2) * 0.6

    def test_temporal_nr_keeps_motion(self):
        # scene cut: frames after the cut are totally different; NR must not mix
        a = np.full((4, 8, 8), 1000.0, np.float32)
        b = np.full((4, 8, 8), 9000.0, np.float32)
        seq = np.concatenate([a, b])
        out = np.asarray(dn_ops.temporal_nr(jnp.asarray(seq), threshold=64.0))
        np.testing.assert_array_equal(out, seq)

    def test_deband_smooths_banding(self):
        # quantised gradient = banding (14-bit domain)
        # shallow gradient: bands several rows tall, step (64) below the
        # deband threshold (96) so neighbours across bands are accepted
        yy = np.linspace(0, 400, H)[None, :, None]
        grad = np.tile(yy, (2, 1, W)).astype(np.float32)
        banded = (grad // 64) * 64.0
        out = np.asarray(dn_ops.deband(jnp.asarray(banded), jnp.uint32(7)))
        assert np.mean((out - grad) ** 2) < np.mean((banded - grad) ** 2)

    def test_edge_level_sharpens_medium_edges(self):
        # a soft edge in 14-bit domain
        x = np.zeros((1, 16, 32), np.float32)
        x[:, :, 16:] = 4000.0
        soft = np.asarray(
            dn_ops.temporal_nr(jnp.asarray(np.repeat(x, 3, 0)), threshold=1e9, radius=1)
        )[1:2]
        # blur horizontally a bit
        soft = (np.roll(soft, 1, 2) + soft * 2 + np.roll(soft, -1, 2)) / 4
        out = np.asarray(dn_ops.edge_level(jnp.asarray(soft), strength=16.0,
                                           lower_thresh=10.0, upper_thresh=1e9))
        gin = np.abs(np.diff(soft, axis=2)).max()
        gout = np.abs(np.diff(out, axis=2)).max()
        assert gout >= gin  # edge got steeper or equal

    def test_bit_depth_staging(self):
        x = RNG.integers(0, 256, (2, 8, 8)).astype(np.float32)
        x14 = np.asarray(dn_ops.to_14bit(jnp.asarray(x)))
        assert x14.max() <= 16320
        x10 = np.asarray(dn_ops.to_10bit(jnp.asarray(x14)))
        np.testing.assert_array_equal(x10, np.floor(x14 / 16 + 0.5).clip(0, 1023))


class TestMotionAdaptiveBob:
    """QTGMC-class double-rate deinterlace (ops.deint.motion_adaptive_bob)."""

    def test_static_content_weaves_exactly(self):
        """With no motion, both output phases must reproduce the full
        interlaced frame exactly (weave path, full vertical detail)."""
        from amatsukaze_tpu.ops import deint as deint_ops

        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (32, 64)).astype(np.float32)
        seq = jnp.asarray(np.stack([frame] * 4))
        out = np.asarray(deint_ops.motion_adaptive_bob(seq, seq, seq, True))
        assert out.shape == (8, 32, 64)
        for k in range(8):
            np.testing.assert_array_equal(out[k], frame)

    def test_double_rate_field_order(self):
        """out[2k] keeps frame k's top field, out[2k+1] its bottom field
        (TFF temporal order)."""
        from amatsukaze_tpu.ops import deint as deint_ops

        b, h, w = 3, 16, 32
        frames = np.zeros((b, h, w), np.float32)
        for k in range(b):
            frames[k, 0::2] = 100 + k  # top field value
            frames[k, 1::2] = 200 + k  # bottom field value
        seq = jnp.asarray(frames)
        prev = jnp.concatenate([seq[:1], seq[:-1]])
        nxt = jnp.concatenate([seq[1:], seq[-1:]])
        out = np.asarray(deint_ops.motion_adaptive_bob(prev, seq, nxt, True))
        for k in range(b):
            np.testing.assert_array_equal(out[2 * k][0::2], frames[k][0::2])
            np.testing.assert_array_equal(
                out[2 * k + 1][1::2], frames[k][1::2])

    def test_moving_content_avoids_combing(self):
        """A moving vertical edge must not comb: the interpolated path wins
        where motion is detected."""
        from amatsukaze_tpu.ops import deint as deint_ops

        b, h, w = 6, 32, 64
        frames = np.zeros((b, h, w), np.float32)
        for k in range(b):
            # interlaced capture of an edge moving 4 px/field: the two
            # fields of each frame see it at different positions
            frames[k, 0::2, :8 * k + 8] = 255.0
            frames[k, 1::2, :8 * k + 12] = 255.0
        seq = jnp.asarray(frames)
        prev = jnp.concatenate([seq[:1], seq[:-1]])
        nxt = jnp.concatenate([seq[1:], seq[-1:]])
        out = np.asarray(deint_ops.motion_adaptive_bob(prev, seq, nxt, True))
        comb_src = float(np.mean(np.asarray(
            deint_ops.combing_metric(seq[2:4]))))
        comb_out = float(np.mean(np.asarray(
            deint_ops.combing_metric(jnp.asarray(out[4:8])))))
        assert comb_out < comb_src / 10, (comb_out, comb_src)

    def test_filter_graph_qtgmc_mode(self):
        """FilterGraph mode 'qtgmc': doubled output frames + 2x fps."""
        from amatsukaze_tpu.models.filter_graph import FilterGraph
        from amatsukaze_tpu.types import VideoFormat
        from amatsukaze_tpu.utils.context import AMTContext

        fg = FilterGraph(AMTContext(), mode=FilterGraph.MODE_QTGMC)
        fmt = VideoFormat(width=64, height=32, frame_rate_num=30000,
                          frame_rate_denom=1001, progressive=False,
                          fixed_frame_rate=True)
        spec = fg.output_spec(10, fmt)
        assert spec.num_out_frames == 20
        assert spec.out_format.frame_rate_num * fmt.frame_rate_denom \
            == 2 * fmt.frame_rate_num * spec.out_format.frame_rate_denom
        assert spec.out_format.progressive

        rng = np.random.default_rng(1)
        frames = rng.integers(0, 256, (5, 32, 64)).astype(np.uint8)
        out = fg.run_pass3(frames, None, None, start_index=0)
        assert out.shape == (10, 32, 64)


class TestHostTwinKernels:
    """The native host-twin kernels (native/fieldcosts.cpp) must match
    their device/numpy counterparts: these run production decisions when
    the device link is slow (utils/device.device_link_is_slow)."""

    def _frames(self, n=7):
        rng = np.random.default_rng(3)
        return rng.integers(0, 256, (n, H, W), dtype=np.uint8)

    def test_scene_metrics_host_matches_device(self):
        arr = self._frames()
        prev = self._frames(1)[0]
        dd, dh = cm_ops.scene_metrics_batch(jnp.asarray(arr),
                                            jnp.asarray(prev))
        hd, hh = cm_ops.scene_metrics_batch_host(arr, prev)
        assert np.allclose(np.asarray(dd), hd, rtol=1e-5, atol=1e-4)
        assert np.allclose(np.asarray(dh), hh, rtol=1e-6, atol=1e-7)

    def test_field_match_costs_host_matches_device(self):
        arr = self._frames()
        dev = np.asarray(deint_ops.field_match_costs(
            jnp.asarray(arr).astype(jnp.float32)))
        host = deint_ops.field_match_costs_host(arr)
        assert np.allclose(dev, host, rtol=1e-5, atol=1e-3)

    def test_telecine_pattern_costs_host_matches_device(self):
        rng = np.random.default_rng(7)
        costs = (rng.random((20, 3)) * 100).astype(np.float32)
        dev = np.asarray(deint_ops.telecine_pattern_costs(
            jnp.asarray(costs)))
        host = deint_ops.telecine_pattern_costs_host(costs)
        assert np.allclose(dev, host, rtol=1e-6, atol=1e-4)

    def test_kfm_synth_host_matches_float_path(self):
        from amatsukaze_tpu.models.filter_graph import (
            bob_field,
            merge_prev_weave,
        )
        from amatsukaze_tpu.models.kfm import VFRPlan

        arr = self._frames(6)
        prev_frame = self._frames(1)[0]
        src_idx = [0, 1, 2, 3, 4, 5, 2, 3]
        ops = [VFRPlan.WEAVE, VFRPlan.MERGE_PREV, VFRPlan.BOB_T,
               VFRPlan.BOB_B, VFRPlan.WEAVE, VFRPlan.MERGE_PREV,
               VFRPlan.BOB_T, VFRPlan.BOB_B]
        out = deint_ops.kfm_synth_host(arr, prev_frame, src_idx, ops)
        if out is None:
            pytest.skip("native library not built")
        # float reference path + round-to-uint8 (the device math)
        af = jnp.asarray(arr).astype(jnp.float32)
        pf = jnp.concatenate([jnp.asarray(prev_frame)
                              .astype(jnp.float32)[None], af[:-1]])
        variants = {
            VFRPlan.WEAVE: af,
            VFRPlan.MERGE_PREV: merge_prev_weave(af, pf),
            VFRPlan.BOB_T: bob_field(af, top=True),
            VFRPlan.BOB_B: bob_field(af, top=False),
        }
        for k, (s, op) in enumerate(zip(src_idx, ops)):
            want = np.clip(np.floor(np.asarray(variants[op][s]) + 0.5),
                           0, 255).astype(np.uint8)
            assert np.array_equal(out[k], want), f"output {k} op {op}"

    def test_yadif_host_matches_device_exactly(self):
        from amatsukaze_tpu.ops.deint import yadif_deinterlace, yadif_host

        rng = np.random.default_rng(8)
        cur = rng.integers(0, 256, (6, H, W), dtype=np.uint8)
        prev = np.concatenate([cur[:1], cur[:-1]])
        nxt = np.concatenate([cur[1:], cur[-1:]])
        for parity in (True, False):
            host = yadif_host(prev, cur, nxt, parity)
            if host is None:
                pytest.skip("native library not built")
            dev = np.asarray(yadif_deinterlace(
                jnp.asarray(prev).astype(jnp.float32),
                jnp.asarray(cur).astype(jnp.float32),
                jnp.asarray(nxt).astype(jnp.float32), parity))
            dev_u8 = np.clip(np.floor(dev + 0.5), 0, 255).astype(np.uint8)
            assert np.array_equal(host, dev_u8), f"parity {parity}"

    def test_motion_bob_host_matches_device_exactly(self):
        from amatsukaze_tpu.ops.deint import (
            motion_adaptive_bob,
            motion_bob_host,
        )

        rng = np.random.default_rng(9)
        cur = rng.integers(0, 256, (5, H, W), dtype=np.uint8)
        prev = np.concatenate([cur[:1], cur[:-1]])
        nxt = np.concatenate([cur[1:], cur[-1:]])
        for tff in (True, False):
            host = motion_bob_host(prev, cur, nxt, tff)
            if host is None:
                pytest.skip("native library not built")
            dev = np.asarray(motion_adaptive_bob(
                jnp.asarray(prev).astype(jnp.float32),
                jnp.asarray(cur).astype(jnp.float32),
                jnp.asarray(nxt).astype(jnp.float32), tff))
            dev_u8 = np.clip(np.floor(dev + 0.5), 0, 255).astype(np.uint8)
            assert np.array_equal(host, dev_u8), f"tff {tff}"
