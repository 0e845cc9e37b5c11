"""Multi-chip production filter path (parallel/sharded_filter).

Bit-identity requirement (the multi-chip contract): the sharded paths must
produce byte-identical outputs and identical VFR/CM decisions to the
single-device paths, for any mesh width. Runs on the virtual 8-device CPU
mesh from conftest.
"""

import os
import stat

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ts_gen
from amatsukaze_tpu.models.filter_graph import (
    FilterGraph, bob_field, merge_prev_weave,
)
from amatsukaze_tpu.models.kfm import VFRPlan
from amatsukaze_tpu.ops import deint as deint_ops
from amatsukaze_tpu.parallel.mesh import make_mesh
from amatsukaze_tpu.parallel.sharded_filter import ShardedFilterBackend

W, H = 96, 64


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest forces an 8-device CPU mesh"
    return make_mesh(devs[:8])


def _frames(n=21, h=H, w=W, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w)).astype(np.uint8)


class TestShardedPrimitives:
    def test_costs_bit_identical(self, mesh):
        be = ShardedFilterBackend(mesh)
        fr = _frames(21)  # not divisible by 8: exercises padding
        got = np.asarray(be.field_match_costs(fr))
        want = np.asarray(deint_ops.field_match_costs(
            jnp.asarray(fr).astype(jnp.float32)))
        assert np.array_equal(got, want)

    def test_costs_from_prev_matches_concat(self):
        fr = _frames(9).astype(np.float32)
        prev = _frames(1, seed=3)[0].astype(np.float32)
        got = np.asarray(deint_ops.field_match_costs_from_prev(
            jnp.asarray(fr), jnp.asarray(prev)))
        want = np.asarray(deint_ops.field_match_costs(
            jnp.concatenate([jnp.asarray(prev)[None], jnp.asarray(fr)])))[1:]
        assert np.array_equal(got, want)

    def test_yadif_bit_identical_with_halo(self, mesh):
        be = ShardedFilterBackend(mesh)
        fr = _frames(16)
        prev = _frames(1, seed=1)[0]
        nxt = _frames(1, seed=2)[0]
        got = np.asarray(be.deint("yadif", fr, prev, nxt))
        arr = jnp.asarray(fr).astype(jnp.float32)
        p = jnp.concatenate(
            [jnp.asarray(prev).astype(jnp.float32)[None], arr[:-1]])
        nx = jnp.concatenate(
            [arr[1:], jnp.asarray(nxt).astype(jnp.float32)[None]])
        want = np.asarray(deint_ops.yadif_deinterlace(p, arr, nx, True))
        assert np.array_equal(got, want)

    def test_double_rate_modes_bit_identical(self, mesh):
        be = ShardedFilterBackend(mesh)
        fr = _frames(11)  # padding + sequence-edge clamps
        arr = jnp.asarray(fr).astype(jnp.float32)
        p = jnp.concatenate([arr[:1], arr[:-1]])
        nx = jnp.concatenate([arr[1:], arr[-1:]])
        got60 = np.asarray(be.deint("yadif60", fr, None, None))
        ot = deint_ops.yadif_deinterlace(p, arr, nx, True)
        ob = deint_ops.yadif_deinterlace(p, arr, nx, False)
        want60 = np.asarray(jnp.stack([ot, ob], axis=1).reshape(22, H, W))
        assert np.array_equal(got60, want60)
        gotq = np.asarray(be.deint("qtgmc", fr, None, None))
        wantq = np.asarray(deint_ops.motion_adaptive_bob(p, arr, nx, True))
        assert np.array_equal(gotq, wantq)

    def test_kfm_synth_bit_identical(self, mesh):
        be = ShardedFilterBackend(mesh)
        fr = _frames(21)
        prev = _frames(1, seed=5)[0]
        entries = []
        for s in range(21):
            op = [VFRPlan.WEAVE, VFRPlan.MERGE_PREV, VFRPlan.BOB_T,
                  VFRPlan.BOB_B][s % 4]
            if s % 5 != 3:  # decimate like a film plan does
                entries.append((s, op))
        out, n_e = be.kfm_synth(fr, prev, entries)
        got = np.asarray(out)[:n_e]
        arr = jnp.asarray(fr).astype(jnp.float32)
        pv = jnp.concatenate(
            [jnp.asarray(prev).astype(jnp.float32)[None], arr[:-1]])
        variants = {VFRPlan.WEAVE: arr,
                    VFRPlan.MERGE_PREV: merge_prev_weave(arr, pv),
                    VFRPlan.BOB_T: bob_field(arr, True),
                    VFRPlan.BOB_B: bob_field(arr, False)}
        want = np.stack([np.asarray(variants[o][s]) for s, o in entries])
        assert np.array_equal(got, want)


def _telecined(n, h=H, w=W):
    """3:2-pulldown sequence (same cadence as the e2e telecine factory)."""
    yy, xx = np.mgrid[0:h, 0:w]
    film = [np.clip(128 + 80 * np.sin((xx + 8 * i) / 7.0)
                    * np.cos(yy / 9.0), 0, 255).astype(np.float32)
            for i in range((n * 4) // 5 + 4)]
    out = []
    i = 0
    while len(out) < n:
        a, b, c, d = film[i:i + 4]

        def wv(top, bot):
            f = np.empty((h, w), np.float32)
            f[0::2] = top[0::2]
            f[1::2] = bot[1::2]
            return f.astype(np.uint8)

        for f in (wv(a, a), wv(a, b), wv(b, c), wv(c, c), wv(d, d)):
            if len(out) < n:
                out.append(f)
        i += 4
    return np.stack(out)


def _run_graph(ctx, mesh, frames, mode, post=None, batch=16):
    """Drive a FilterGraph the way _pump_filtered does (one plane)."""
    from amatsukaze_tpu.models.filter_graph import build_post_chain

    fg = FilterGraph(ctx, mode=mode, batch=batch,
                     post_chain=build_post_chain(post) if post else None)
    fg.quantize_output = True
    if mesh is not None:
        fg.set_mesh(mesh)
    else:
        fg._host_backend = False  # force the single-device DEVICE path
    n = len(frames)
    if mode in FilterGraph.KFM_FAMILY:
        fg.analyze(iter(frames), n)
        assert fg.vfr_plan is not None
        outs = []
        prev = None
        for s in range(0, n, batch):
            chunk = frames[s:s + batch]
            res = fg.run_kfm_batch(chunk, prev, s,
                                   final=(s + batch >= n))
            outs.append(res.materialize() if hasattr(res, "materialize")
                        else res)
            prev = chunk[-1]
        return fg, np.concatenate(outs)
    outs = []
    for s in range(0, n, batch):
        chunk = frames[s:s + batch]
        prev = frames[s - 1] if s > 0 else None
        nxt = frames[s + batch] if s + batch < n else None
        res = fg.run_pass3(chunk, prev, nxt, start_index=s)
        outs.append(res.materialize() if hasattr(res, "materialize")
                    else res)
    return fg, np.concatenate(outs)


class TestFilterGraphMesh:
    """FilterGraph with a mesh == FilterGraph on one device, bit for bit."""

    def test_kfm_vfr_full_pass_bit_identical(self, ctx, mesh):
        frames = _telecined(45)
        fg1, out1 = _run_graph(ctx, None, frames, "kfm_vfr")
        fg8, out8 = _run_graph(ctx, mesh, frames, "kfm_vfr")
        # identical telecine decisions and VFR plan
        assert [(d.mode, d.phase) for d in fg1.decisions] == \
            [(d.mode, d.phase) for d in fg8.decisions]
        assert fg1.vfr_plan.durations == fg8.vfr_plan.durations
        assert fg1.vfr_plan.source_frames == fg8.vfr_plan.source_frames
        # film content must actually decimate (sanity: the plan is real)
        assert len(out1) < len(frames)
        assert out1.dtype == np.uint8
        assert np.array_equal(out1, out8)

    def test_kfm_vfr_with_post_chain_bit_identical(self, ctx, mesh):
        frames = _telecined(30)
        _, out1 = _run_graph(ctx, None, frames, "kfm_vfr",
                             post="nr,deband,edge", batch=15)
        _, out8 = _run_graph(ctx, mesh, frames, "kfm_vfr",
                             post="nr,deband,edge", batch=15)
        assert np.array_equal(out1, out8)

    def test_yadif_and_double_rate_bit_identical(self, ctx, mesh):
        frames = _frames(24, seed=7)
        for mode in ("yadif", "yadif60", "qtgmc"):
            _, out1 = _run_graph(ctx, None, frames, mode, batch=10)
            _, out8 = _run_graph(ctx, mesh, frames, mode, batch=10)
            assert np.array_equal(out1, out8), mode

    def test_none_mode_post_chain_bit_identical(self, ctx, mesh):
        frames = _frames(16, seed=9)
        _, out1 = _run_graph(ctx, None, frames, "none", post="nr,deband")
        _, out8 = _run_graph(ctx, mesh, frames, "none", post="nr,deband")
        assert np.array_equal(out1, out8)


FAKE_ENCODER = """#!/bin/bash
out=""
while [ $# -gt 0 ]; do
  case "$1" in
    -o) out="$2"; shift 2;;
    *) shift;;
  esac
done
cat > "$out"
"""


_E2E_RUNNER = """
import sys

sys.path.insert(0, {tests_dir!r})
import conftest  # noqa: F401  (JAX_PLATFORMS=cpu + 8 virtual devices)
import stat

import ts_gen
import test_pipeline_e2e as e2e
import test_sharded_filter as tsf

from amatsukaze_tpu.pipeline.settings import Config, Settings
from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
from amatsukaze_tpu.utils.context import AMTContext

devices = int(sys.argv[1])
work = sys.argv[2]

import os

os.environ["AMATSUKAZE_FILTER_BACKEND"] = "device"
src = os.path.join(work, "src.ts")
with open(src, "wb") as f:
    f.write(ts_gen.build_simple_ts(num_frames=90, width=tsf.W,
                                   height=tsf.H))
enc = os.path.join(work, "fake_x264")
with open(enc, "w") as f:
    f.write(tsf.FAKE_ENCODER)
os.chmod(enc, os.stat(enc).st_mode | stat.S_IEXEC)
conf = Config()
conf.src_file_path = src
conf.out_video_path = os.path.join(work, "out")
conf.work_dir = work
conf.encoder_path = enc
conf.filter_mode = "kfm_vfr"
conf.post_filter = "nr,deband"
conf.filter_devices = devices
conf.device_batch_frames = 16
ctx = AMTContext(level="error")
pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                         decoder_factory=e2e.TelecineDecoderFactory())
report = pipe.run()
print(report["outfiles"][0]["path"])
"""


class TestMultiChipE2E:
    """Full-file transcode sharded over the 8-device mesh == single device
    (the VERDICT round-3 'production multi-chip' contract).

    Each transcode runs in a FRESH subprocess: XLA's CPU collective
    rendezvous has a hardcoded 40 s termination timeout that calls
    abort() (rendezvous.cc), and a long-lived suite process accumulates
    enough XLA threadpool state on this 1-core host to trip it flakily;
    process isolation both avoids that and keeps a hypothetical abort
    from killing the whole pytest run.
    """

    def _run(self, tmp_path, devices: int) -> bytes:
        import subprocess
        import sys

        work = tmp_path / f"dev{devices}"
        work.mkdir()
        tests_dir = os.path.dirname(os.path.abspath(__file__))
        # Explicit CPU-platform env for the child: don't rely on its
        # conftest import running before something initializes jax, and
        # share the persistent compile cache so warm runs fit the tight
        # timeout (VERDICT r4 item 2: 900 s x2 worst case wedged the
        # bench host for half an hour; 300 s bounds a hang while still
        # fitting a COLD compile cache — 120 s assumed warm and failed
        # spuriously on fresh hosts).
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=8",
            JAX_COMPILATION_CACHE_DIR=os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", "/tmp/amatsukaze_jax_cache"),
        )
        r = subprocess.run(
            [sys.executable, "-c",
             _E2E_RUNNER.format(tests_dir=tests_dir),
             str(devices), str(work)],
            capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(tests_dir), env=env)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
        out = r.stdout.strip().splitlines()[-1]
        return open(out, "rb").read()

    def test_outputs_bit_identical(self, tmp_path):
        one = self._run(tmp_path, 1)
        eight = self._run(tmp_path, 8)
        assert one.startswith(b"YUV4MPEG2")
        assert one.count(b"FRAME\n") > 0
        assert one == eight
