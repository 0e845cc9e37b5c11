"""Deinterlacer x fps mode matrix tests (ref EncodeServerData.cs:106-119
FilterFPS = VFR/CFR24/CFR30/CFR60/SVP/VFR30 and the AutoVfr algorithm,
Server/Misc.cs:1290-1389)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from amatsukaze_tpu.models.filter_graph import FilterGraph  # noqa: E402
from amatsukaze_tpu.models.kfm import CycleMode  # noqa: E402
from amatsukaze_tpu.types import VideoFormat  # noqa: E402
from amatsukaze_tpu.utils.context import AMTContext  # noqa: E402

H, W = 64, 96


def _fmt():
    f = VideoFormat()
    f.width, f.height = W, H
    f.frame_rate_num, f.frame_rate_denom = 30000, 1001
    f.progressive = False
    return f


def telecined_frames(n, pan=8):
    """Hard-telecined 3:2 stream from a panning film source."""
    yy, xx = np.mgrid[0:H, 0:W]
    film = [np.clip(
        128 + 80 * np.sin((xx + pan * i) / 7.0) * np.cos(yy / 9.0),
        0, 255).astype(np.float32) for i in range((n * 4) // 5 + 4)]
    frames = []
    i = 0
    while len(frames) < n:
        a, b, c, d = film[i:i + 4]

        def wv(top, bot):
            f = np.empty((H, W), np.float32)
            f[0::2] = top[0::2]
            f[1::2] = bot[1::2]
            return f.astype(np.uint8)

        for f in (wv(a, a), wv(a, b), wv(b, c), wv(c, c), wv(d, d)):
            if len(frames) < n:
                frames.append(f)
        i += 4
    return frames


def interlaced_video_frames(n, speed=5):
    """True interlaced video: every field from a different time instant
    (heavy combing everywhere -> VIDEO_60 territory)."""
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for k in range(n):
        top = np.clip(128 + 90 * np.sin((xx + speed * 2 * k) / 5.0)
                      * np.cos(yy / 4.0), 0, 255)
        bot = np.clip(128 + 90 * np.sin((xx + speed * (2 * k + 1)) / 5.0)
                      * np.cos(yy / 4.0), 0, 255)
        f = np.empty((H, W), np.float32)
        f[0::2] = top[0::2]
        f[1::2] = bot[1::2]
        out.append(f.astype(np.uint8))
    return out


def analyzed_graph(mode, frames, ctx=None, batch=16):
    fg = FilterGraph(ctx or AMTContext(level="error"), mode=mode,
                     batch=batch)
    fg.analyze(iter(frames), len(frames))
    return fg


class TestVfr30:
    def test_never_emits_60p(self):
        frames = telecined_frames(25) + interlaced_video_frames(25)
        fg = analyzed_graph(FilterGraph.MODE_KFM_VFR30, frames)
        assert fg.decisions is not None
        assert all(d.mode != CycleMode.VIDEO_60 for d in fg.decisions)
        assert 2 not in set(fg.vfr_plan.durations)

    def test_vfr_still_switches_without_60(self):
        frames = telecined_frames(25) + interlaced_video_frames(25)
        fg60 = analyzed_graph(FilterGraph.MODE_KFM_VFR, frames)
        fg30 = analyzed_graph(FilterGraph.MODE_KFM_VFR30, frames)
        # the plain VFR mode does use 60p on this combed section
        assert any(d.mode == CycleMode.VIDEO_60 for d in fg60.decisions)
        # both detect the film section
        assert any(d.mode == CycleMode.FILM for d in fg30.decisions)


class TestCfr24:
    def test_all_cycles_film(self):
        frames = telecined_frames(25) + interlaced_video_frames(25)
        fg = analyzed_graph(FilterGraph.MODE_KFM_CFR24, frames)
        assert all(d.mode == CycleMode.FILM for d in fg.decisions)

    def test_output_is_cfr_24(self):
        frames = telecined_frames(50)
        fg = analyzed_graph(FilterGraph.MODE_KFM_CFR24, frames)
        spec = fg.output_spec(len(frames), _fmt())
        assert not spec.time_codes  # CFR
        assert spec.num_out_frames == 40  # 50 * 4/5
        assert (spec.out_format.frame_rate_num,
                spec.out_format.frame_rate_denom) == (24000, 1001)

    def test_synthesis_output_count(self):
        frames = telecined_frames(50)
        fg = analyzed_graph(FilterGraph.MODE_KFM_CFR24, frames)
        out = fg.run_kfm_batch(np.stack(frames), None, 0, plane=0,
                               final=True)
        assert len(out) == 40


class TestSvp:
    def test_output_count_and_rate(self):
        frames = telecined_frames(50)
        fg = analyzed_graph(FilterGraph.MODE_SVP, frames)
        spec = fg.output_spec(len(frames), _fmt())
        # 40 film frames -> ceil(40 * 2.5) = 100 at 60p
        assert spec.num_out_frames == 100
        assert (spec.out_format.frame_rate_num,
                spec.out_format.frame_rate_denom) == (60000, 1001)
        assert not spec.time_codes

    def test_batch_boundaries_match_single_batch(self):
        frames = telecined_frames(50)
        fg1 = analyzed_graph(FilterGraph.MODE_SVP, frames)
        whole = fg1.run_kfm_batch(np.stack(frames), None, 0, plane=0,
                                  final=True)
        fg2 = analyzed_graph(FilterGraph.MODE_SVP, frames)
        parts = []
        prev = None
        for s in range(0, 50, 20):
            chunk = frames[s:s + 20]
            parts.append(fg2.run_kfm_batch(
                np.stack(chunk), prev, s, plane=0,
                final=(s + 20 >= 50)))
            prev = chunk[-1]
        split = np.concatenate([p for p in parts if len(p)])
        assert len(whole) == len(split) == 100
        assert np.allclose(whole, split, atol=1e-4)

    def test_interpolation_tracks_pan(self):
        """On a sharp-textured pure pan the MC interpolator must beat
        the cross-fade (the point of svp=true over a simple blend)."""
        try:
            from scipy.ndimage import gaussian_filter
        except ImportError:
            gaussian_filter = lambda a, s: a  # noqa: E731
        rng = np.random.default_rng(11)
        pan = 3  # px per film frame, inside mc_frame_interp's search
        n_film = 20
        wide = gaussian_filter(
            rng.uniform(20, 235, (H, W + pan * n_film + 8)), 1.0)

        def film(t):  # film source at continuous film-time t
            s = pan * t
            i0 = int(np.floor(s))
            f = s - i0
            a = wide[:, i0:i0 + W]
            b = wide[:, i0 + 1:i0 + 1 + W]
            return ((1 - f) * a + f * b).astype(np.float32)

        # hard-telecine the 24p film (same cadence as telecined_frames)
        frames = []
        i = 0
        while len(frames) < 25:
            a, b, c, d = (film(i), film(i + 1), film(i + 2), film(i + 3))

            def wv(top, bot):
                f = np.empty((H, W), np.float32)
                f[0::2] = top[0::2]
                f[1::2] = bot[1::2]
                return f.astype(np.uint8)

            for f in (wv(a, a), wv(a, b), wv(b, c), wv(c, c), wv(d, d)):
                if len(frames) < 25:
                    frames.append(f)
            i += 4
        fg = analyzed_graph(FilterGraph.MODE_SVP, frames)
        assert all(d.mode == CycleMode.FILM for d in fg.decisions)
        out = np.asarray(fg.run_kfm_batch(np.stack(frames), None, 0,
                                          plane=0, final=True))
        assert len(out) == 50  # 20 film frames -> 50 at 60p
        crop = np.s_[2:-2, 8:-8]
        # j=1: frac 0.4 between film frames 0 and 1
        truth = film(0.4)[crop]
        mc_err = np.mean(np.abs(out[1][crop].astype(np.float64) - truth))
        blend = 0.6 * film(0.0) + 0.4 * film(1.0)
        blend_err = np.mean(np.abs(blend[crop] - truth))
        assert mc_err < blend_err * 0.6, (mc_err, blend_err)


class TestYadif60:
    def test_double_rate(self):
        from amatsukaze_tpu.ops.deint import yadif_deinterlace

        frames = interlaced_video_frames(8)
        fg = FilterGraph(AMTContext(level="error"),
                         mode=FilterGraph.MODE_YADIF60)
        spec = fg.output_spec(len(frames), _fmt())
        assert spec.num_out_frames == 16
        assert (spec.out_format.frame_rate_num,
                spec.out_format.frame_rate_denom) == (60000, 1001)
        out = fg.run_pass3(np.stack(frames), None, None)
        assert len(out) == 16
        arr = jnp.asarray(np.stack(frames)).astype(jnp.float32)
        prev = jnp.concatenate([arr[:1], arr[:-1]])
        nxt = jnp.concatenate([arr[1:], arr[-1:]])
        want_t = np.asarray(yadif_deinterlace(prev, arr, nxt, True))
        want_b = np.asarray(yadif_deinterlace(prev, arr, nxt, False))
        assert np.allclose(out[0::2], want_t, atol=1e-4)
        assert np.allclose(out[1::2], want_b, atol=1e-4)


class TestHostTwin:
    """The numpy host twin (selected on slow device links, see
    utils/device.device_link_is_slow) must make the SAME decisions and
    synthesize the SAME frames as the device path."""

    def _graph(self, frames, host: bool, mode=FilterGraph.MODE_KFM_VFR):
        fg = FilterGraph(AMTContext(level="error"), mode=mode, batch=16)
        fg._host_backend = host
        fg.quantize_output = True
        fg.analyze(iter(frames), len(frames))
        return fg

    def test_costs_twin_same_decisions(self):
        frames = telecined_frames(25) + interlaced_video_frames(25)
        dev = self._graph(frames, host=False)
        host = self._graph(frames, host=True)
        assert [(d.mode, d.phase) for d in dev.decisions] == \
               [(d.mode, d.phase) for d in host.decisions]
        assert dev.vfr_plan.durations == host.vfr_plan.durations

    def test_synthesis_twin_identical_frames(self):
        frames = telecined_frames(25) + interlaced_video_frames(25)
        dev = self._graph(frames, host=False)
        host = self._graph(frames, host=True)
        prev = None
        for s in range(0, 50, 16):
            chunk = np.stack(frames[s:s + 16])
            a = dev.run_kfm_batch(chunk, prev, s, plane=0,
                                  final=s + 16 >= 50)
            b = host.run_kfm_batch(chunk, prev, s, plane=0,
                                   final=s + 16 >= 50)
            a = a.materialize() if hasattr(a, "materialize") else np.asarray(a)
            assert a.dtype == b.dtype == np.uint8
            assert np.array_equal(a, b), f"batch at {s}"
            prev = frames[min(s + 15, 49)]

    def test_resize_weights_match_jax(self):
        from jax._src.image.scale import (
            _fill_lanczos_kernel,
            compute_weight_mat,
        )

        from amatsukaze_tpu.ops.resize import lanczos3_weights

        for in_s, out_s in [(64, 48), (48, 64), (96, 64), (1088, 720)]:
            ours = lanczos3_weights(in_s, out_s)
            ref = np.asarray(compute_weight_mat(
                in_s, out_s, out_s / in_s, 0.0,
                lambda x: _fill_lanczos_kernel(3.0, x), True),
                np.float32)
            assert np.allclose(ours, ref, rtol=1e-5, atol=1e-6), \
                (in_s, out_s)

    def test_resize_twin_matches_device(self):
        """With a resize configured the host twin must still synthesize
        (float path, synth -> resize -> round like the device) and agree
        with the device output to rounding (+-1 on ties at most)."""
        frames = telecined_frames(25)
        outs = {}
        for host in (False, True):
            fg = FilterGraph(AMTContext(level="error"),
                             mode=FilterGraph.MODE_KFM_VFR, batch=16)
            fg._host_backend = host
            fg.quantize_output = True
            fg.resize = (64, 48)  # (w, h) down from 96x64
            fg.analyze(iter(frames), len(frames))
            got, prev = [], None
            for s in range(0, 25, 16):
                chunk = np.stack(frames[s:s + 16])
                b = fg.run_kfm_batch(chunk, prev, s, plane=0,
                                     final=s + 16 >= 25)
                b = (b.materialize() if hasattr(b, "materialize")
                     else np.asarray(b))
                got.append(b)
                prev = frames[min(s + 15, 24)]
            outs[host] = np.concatenate(got)
        a, b = outs[False], outs[True]
        assert a.shape == b.shape and a.shape[1:] == (48, 64)
        diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 0.01

    def test_host_path_never_initialises_a_jax_backend(self):
        """On a wedged tunneled device a SINGLE stray device op (or a
        module-level jnp constant) blocks for the whole device-attach
        warm-up — the bench cold run once lost 1016 s to one. With the
        host backend forced, a full analyze + synthesis pass must
        succeed even when no jax backend can be initialised at all."""
        import os
        import subprocess
        import sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = (
            "import numpy as np\n"
            "from amatsukaze_tpu.models.filter_graph import FilterGraph\n"
            "from amatsukaze_tpu.utils.context import AMTContext\n"
            "rng = np.random.default_rng(0)\n"
            "frames = [rng.integers(0, 256, (64, 96)).astype(np.uint8)\n"
            "          for _ in range(25)]\n"
            "fg = FilterGraph(AMTContext(level='error'),\n"
            "                 mode=FilterGraph.MODE_KFM_VFR, batch=16)\n"
            "fg.quantize_output = True\n"
            "fg.analyze(iter(frames), 25)\n"
            "prev = None\n"
            "for s in range(0, 25, 16):\n"
            "    chunk = np.stack(frames[s:s + 16])\n"
            "    out = fg.run_kfm_batch(chunk, prev, s, plane=0,\n"
            "                           final=s + 16 >= 25)\n"
            "    prev = frames[min(s + 15, 24)]\n"
            "print('HOSTPATH_OK')\n")
        env = dict(os.environ)
        env.update({"AMATSUKAZE_FILTER_BACKEND": "host",
                    # any backend lookup raises: proves zero device use
                    "JAX_PLATFORMS": "no_such_platform",
                    "PYTHONPATH": repo})
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "HOSTPATH_OK" in r.stdout

    def test_probe_env_override(self, monkeypatch):
        from amatsukaze_tpu.utils import device as dev_mod

        monkeypatch.setenv("AMATSUKAZE_FILTER_BACKEND", "host")
        assert dev_mod.device_link_is_slow() is True
        monkeypatch.setenv("AMATSUKAZE_FILTER_BACKEND", "device")
        assert dev_mod.device_link_is_slow() is False


class TestAutoVfr:
    def _opener(self, frames):
        def opener(start, end):
            return iter(frames[max(0, start):end])

        return opener

    def test_matches_single_stream_analysis(self, tmp_path):
        frames = telecined_frames(30) + interlaced_video_frames(30)
        ref = analyzed_graph(FilterGraph.MODE_KFM_VFR, frames)
        fg = FilterGraph(AMTContext(level="error"),
                         mode=FilterGraph.MODE_AUTOVFR, batch=16)
        fg.analyze_autovfr(self._opener(frames), len(frames), parallel=3,
                           log_prefix=str(tmp_path / "t"))
        assert [(d.mode, d.phase) for d in fg.decisions] == \
               [(d.mode, d.phase) for d in ref.decisions]

    def test_parallel_width_does_not_change_decisions(self, tmp_path):
        frames = telecined_frames(30) + interlaced_video_frames(30)
        results = []
        for par in (1, 2, 4):
            fg = FilterGraph(AMTContext(level="error"),
                             mode=FilterGraph.MODE_AUTOVFR, batch=16)
            fg.analyze_autovfr(self._opener(frames), len(frames),
                               parallel=par)
            results.append([(d.mode, d.phase) for d in fg.decisions])
        assert results[0] == results[1] == results[2]

    def test_empty_section_padded(self):
        """A section whose decoder yields NOTHING (corrupt keyframe)
        must still contribute `want` cost rows so later sections stay
        index-aligned (regression: only short-but-nonempty sections
        were padded)."""
        frames = telecined_frames(40)

        def opener(start, end):
            if start >= 20:
                return iter([])  # second section: decoder dead
            return iter(frames[max(0, start):end])

        fg = FilterGraph(AMTContext(level="error"),
                         mode=FilterGraph.MODE_AUTOVFR, batch=16)
        fg.analyze_autovfr(opener, len(frames), parallel=2)
        assert len(fg.decisions) > 0
        # the first (healthy) section's decisions match the reference
        ref = analyzed_graph(FilterGraph.MODE_KFM_VFR, frames[:20])
        n = min(len(ref.decisions), len(fg.decisions))
        assert [(d.mode, d.phase) for d in fg.decisions[:4]] == \
               [(d.mode, d.phase) for d in ref.decisions[:4]]

    def test_file_contracts(self, tmp_path):
        frames = telecined_frames(30) + interlaced_video_frames(30)
        fg = FilterGraph(AMTContext(level="error"),
                         mode=FilterGraph.MODE_AUTOVFR, batch=16)
        fg.analyze_autovfr(self._opener(frames), len(frames), parallel=2,
                           log_prefix=str(tmp_path / "x"))
        logs = sorted(p.name for p in tmp_path.iterdir())
        assert "x.autovfr1.log" in logs
        assert "x.autovfr2.log" in logs
        assert "x.autovfr.def" in logs
        ranges = []
        for line in (tmp_path / "x.autovfr.def").read_text().splitlines():
            if line.startswith("#"):
                continue
            s, e, fps = line.split()
            ranges.append((int(s), int(e), int(fps)))
        # contiguous cycle-aligned coverage with real fps values
        assert ranges[0][0] == 0
        assert all(r1[0] == r0[1] for r0, r1 in zip(ranges, ranges[1:]))
        assert {r[2] for r in ranges} <= {24, 30, 60}
        assert len(ranges) >= 2  # film section + video section


class TestResize:
    """Output resize (ref FilterSetting.EnableResize -> BlackmanResize
    stage, Misc.cs:1411-1414; lanczos3 here): plane dims, SAR reset,
    and value preservation on flat content."""

    def test_output_spec_dims_and_sar(self):
        fg = FilterGraph(AMTContext(level="error"), mode="none")
        fg.resize = (64, 48)
        fmt = _fmt()
        fmt.sar_width, fmt.sar_height = 4, 3
        spec = fg.output_spec(10, fmt)
        assert (spec.out_format.width, spec.out_format.height) == (64, 48)
        assert (spec.out_format.sar_width, spec.out_format.sar_height) == (1, 1)

    def test_luma_and_chroma_dims(self):
        fg = FilterGraph(AMTContext(level="error"), mode="none")
        fg.resize = (64, 48)
        frames = np.full((4, H, W), 128, np.uint8)
        luma = np.asarray(fg.run_pass3(frames, None, None, plane=0))
        chroma = np.asarray(fg.run_pass3(
            np.full((4, H // 2, W // 2), 64, np.uint8), None, None, plane=1))
        assert luma.shape == (4, 48, 64)
        assert chroma.shape == (4, 24, 32)
        # flat content survives lanczos exactly (partition of unity)
        assert np.allclose(luma, 128, atol=0.5)
        assert np.allclose(chroma, 64, atol=0.5)

    def test_resize_composes_with_yadif(self):
        fg = FilterGraph(AMTContext(level="error"), mode=FilterGraph.MODE_YADIF)
        fg.resize = (64, 48)
        frames = np.stack(interlaced_video_frames(4))
        out = np.asarray(fg.run_pass3(frames, None, None, plane=0))
        assert out.shape == (4, 48, 64)

    def test_resize_composes_with_kfm(self):
        frames = telecined_frames(25)
        fg = analyzed_graph(FilterGraph.MODE_KFM_VFR, frames)
        fg.resize = (64, 48)
        out = fg.run_kfm_batch(np.stack(frames), None, 0, plane=0,
                               final=True)
        out = out.materialize() if hasattr(out, "materialize") else np.asarray(out)
        assert out.shape[1:] == (48, 64)
