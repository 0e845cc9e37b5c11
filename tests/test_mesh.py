"""Multi-chip sharding (parallel/mesh): shard-boundary correctness on the
virtual 8-device CPU mesh (conftest). The load-bearing property: the
sharded pipeline with ppermute halo exchange must equal the single-device
chain bit-for-bit — a wrong halo silently corrupts only the frames at
shard boundaries, which nothing else would catch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amatsukaze_tpu.ops import deint as deint_ops
from amatsukaze_tpu.ops import denoise as dn_ops
from amatsukaze_tpu.ops import logo as logo_ops
from amatsukaze_tpu.ops.logo import LogoEvalParams
from amatsukaze_tpu.ops.logo_ref import LogoEvalRef
from amatsukaze_tpu.parallel import mesh as mesh_mod

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")

B, H, W = 32, 32, 128


@pytest.fixture(scope="module")
def logo_params():
    yy, xx = np.mgrid[0:8, 0:16]
    alpha = (np.clip(1.0 - np.hypot((yy - 4) / 4, (xx - 8) / 8), 0, 1) * 0.3
             ).astype(np.float32)
    a = (1.0 / (1.0 - alpha)).astype(np.float32)
    b = (-alpha * 200.0 / (1.0 - alpha) / 255.0).astype(np.float32)
    return LogoEvalParams.from_ref(LogoEvalRef(a, b, maskratio=0.1))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (B, H, W)).astype(np.float32)
    fades = rng.uniform(0, 1, B).astype(np.float32)
    return frames, fades


def reference_step(params, frames, fades):
    lh, lw = params.a_y.shape
    window = frames[:, :lh, :lw]
    deint = logo_ops.batched_deint_y(window)
    scores = logo_ops.batched_evaluate_logo(
        params, deint, jnp.float32(255.0), jnp.asarray([0.0, 1.0]))
    erased = logo_ops.batched_delogo(
        window, params.a_y, params.b_y, jnp.float32(255.0),
        jnp.asarray(fades))
    f = jnp.asarray(frames).at[:, :lh, :lw].set(erased)
    prev = jnp.concatenate([f[:1], f[:-1]])
    nxt = jnp.concatenate([f[1:], f[-1:]])
    filtered = deint_ops.yadif_deinterlace(prev, f, nxt, True)
    costs = deint_ops.field_match_costs(f)
    return filtered, scores, costs


class TestShardedPipeline:
    def test_matches_single_device_bitexact(self, logo_params, data):
        frames, fades = data
        mesh = mesh_mod.make_mesh(jax.devices()[:8])
        step = mesh_mod.sharded_pipeline_step(mesh, logo_params)
        fs = mesh_mod.shard_batch(mesh, jnp.asarray(frames))
        ds = mesh_mod.shard_batch(mesh, jnp.asarray(fades))
        filtered, scores, costs, presence = step(fs, ds)

        ref_f, ref_s, ref_c = reference_step(logo_params, frames, fades)
        # shard boundaries are frames 4, 8, ...: any halo bug shows there
        np.testing.assert_array_equal(np.asarray(filtered), np.asarray(ref_f))
        np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_s),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(costs), np.asarray(ref_c),
                                   rtol=1e-5, atol=1e-5)
        exp_presence = float(jnp.mean(
            (ref_s[:, 0] > 0.2).astype(jnp.float32)))
        assert abs(float(presence) - exp_presence) < 1e-6

    def test_boundary_frames_use_true_neighbours(self, logo_params, data):
        """Degenerate check: feeding a sequence where each frame differs
        makes halo errors (clamp instead of exchange) detectable at every
        shard edge."""
        frames = np.stack([np.full((H, W), 10.0 * i, np.float32)
                           for i in range(B)])
        mesh = mesh_mod.make_mesh(jax.devices()[:8])
        step = mesh_mod.sharded_pipeline_step(mesh, logo_params)
        fades = np.zeros(B, np.float32)
        filtered, _, costs, _ = step(
            mesh_mod.shard_batch(mesh, jnp.asarray(frames)),
            mesh_mod.shard_batch(mesh, jnp.asarray(fades)))
        _, _, ref_c = reference_step(logo_params, frames, fades)
        np.testing.assert_allclose(np.asarray(costs), np.asarray(ref_c),
                                   rtol=1e-5, atol=1e-5)


class TestShardedHbdChain:
    def test_matches_single_device(self, data):
        frames, _ = data
        mesh = mesh_mod.make_mesh(jax.devices()[:8])
        chain = mesh_mod.sharded_hbd_chain(mesh)
        seed = jnp.asarray([7], jnp.uint32)
        out = chain(mesh_mod.shard_batch(mesh, jnp.asarray(frames)), seed)

        x = dn_ops.to_14bit(jnp.asarray(frames))
        padded = jnp.concatenate([x[:1], x, x[-1:]], axis=0)
        ref = dn_ops.to_10bit(
            dn_ops.deband(dn_ops.temporal_nr(padded, radius=1)[1:-1],
                          seed[0]))
        # deband keys off global frame indices -> sharded == single-device
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestShardBatch:
    def test_placement(self):
        mesh = mesh_mod.make_mesh(jax.devices()[:8])
        arr = mesh_mod.shard_batch(mesh, np.zeros((16, 4, 4), np.float32))
        assert len(arr.sharding.device_set) == 8
