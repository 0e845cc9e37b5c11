"""Device-mesh sharding for the frame pipeline.

TPU-native replacement for the reference's process-level concurrency
(SURVEY.md section 2.4): one transcode job's filter pass is sharded over a
`jax.sharding.Mesh` - data-parallel over the frame axis, with ppermute halo
exchange for the temporal ops (yadif needs prev/next frames across shard
boundaries; telecine costs need the previous frame) and psum/all_gather for
sequence-global analysis stats (logo scores, cycle pattern costs). This is
the "sharded sequence analysis with ordered reduction" role that
AMTOrderedParallel plays in the reference (FilteredSource.hpp:850-900).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import logo as logo_ops
from ..ops import deint as deint_ops
from ..ops import denoise as dn_ops


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _halo_exchange(frames: jnp.ndarray, axis: str):
    """Get the previous shard's last frame and next shard's first frame.

    frames: [B_local, H, W]. Returns (prev_edge, next_edge), each [1, H, W];
    at the mesh ends the local edge is reused (clamp semantics, matching the
    single-device behaviour of clamped temporal windows).
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    # send my last frame to the right neighbour -> received = left's last
    from_left = jax.lax.ppermute(
        frames[-1:], axis, [(i, (i + 1) % n) for i in range(n)]
    )
    # send my first frame to the left neighbour -> received = right's first
    from_right = jax.lax.ppermute(
        frames[:1], axis, [(i, (i - 1) % n) for i in range(n)]
    )
    prev_edge = jnp.where(idx == 0, frames[:1], from_left)
    next_edge = jnp.where(idx == n - 1, frames[-1:], from_right)
    return prev_edge, next_edge


def sharded_pipeline_step(mesh: Mesh, logo_params: logo_ops.LogoEvalParams,
                          axis: str = "data"):
    """Build the jitted multi-chip pipeline step.

    Input: frames [B, H, W] float32 (B divisible by mesh size), per-frame
    fades [B]. Runs: logo evaluation (analysis), delogo, yadif deinterlace
    with cross-shard halo, telecine metrics with halo, and a global
    analysis reduction. Returns (filtered [B, H, W], logo_scores [B, 2],
    match_costs [B, 3]).
    """

    def step(frames, fades):
        # -- logo analysis on the logo window (replicated params) ----------
        lh, lw = logo_params.a_y.shape
        window = frames[:, :lh, :lw]
        deint = logo_ops.batched_deint_y(window)
        scores = logo_ops.batched_evaluate_logo(
            logo_params, deint, jnp.float32(255.0), jnp.asarray([0.0, 1.0])
        )

        # -- erase the logo at the given fades ------------------------------
        erased_win = logo_ops.batched_delogo(
            window, logo_params.a_y, logo_params.b_y, jnp.float32(255.0), fades
        )
        frames = frames.at[:, :lh, :lw].set(erased_win)

        # -- temporal ops with halo exchange ---------------------------------
        prev_edge, next_edge = _halo_exchange(frames, axis)
        prev = jnp.concatenate([prev_edge, frames[:-1]], axis=0)
        nxt = jnp.concatenate([frames[1:], next_edge], axis=0)
        filtered = deint_ops.yadif_deinterlace(prev, frames, nxt, True)

        # telecine metrics (needs previous frame: reuse the halo)
        costs = deint_ops.field_match_costs(
            jnp.concatenate([prev_edge, frames], axis=0)
        )[1:]

        # -- global analysis reduction (ICI collective) ----------------------
        # e.g. mean logo presence across the whole sequence
        presence = jnp.mean((scores[:, 0] > 0.2).astype(jnp.float32))
        presence = jax.lax.pmean(presence, axis)

        return filtered, scores, costs, presence

    smapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis)),
        out_specs=(P(axis, None, None), P(axis, None), P(axis, None), P()),
    )
    return jax.jit(smapped)


def sharded_hbd_chain(mesh: Mesh, axis: str = "data"):
    """Sharded high-bit-depth post chain (temporal NR needs the halo too)."""

    def step(frames_8bit, seed):
        x = dn_ops.to_14bit(frames_8bit)
        prev_edge, next_edge = _halo_exchange(x, axis)
        padded = jnp.concatenate([prev_edge, x, next_edge], axis=0)
        x = dn_ops.temporal_nr(padded, radius=1)[1:-1]
        # deband keys off the GLOBAL frame index so the sharded result is
        # bit-identical to the single-device call
        offset = jax.lax.axis_index(axis) * x.shape[0]
        x = dn_ops.deband(x, seed[0], frame_offset=offset)
        return dn_ops.to_10bit(x)

    smapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis, None, None), P()),
        out_specs=P(axis, None, None),
    )
    return jax.jit(smapped)


def shard_batch(mesh: Mesh, arr, axis: str = "data"):
    """Place a host array sharded over the mesh's frame axis."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
