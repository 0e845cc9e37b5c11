"""Fused Pallas TPU kernel for logo evaluation.

The jnp path (ops.logo.correlation_scores) materialises the 25-tap patch
tensor and a 32-way one-hot in HBM; this kernel keeps the whole logo window
in VMEM and does the 5x5 masked correlation, per-background scale lookup and
masked reduction in one pass per (frame, fade) grid step.

Used by the production pipeline when running on TPU; tests compare it
against the jnp implementation (which is itself validated against the
numpy oracle mirroring the reference C++, LogoScan.hpp:24-318).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KSIZE = 5
KLEN = 25
CSHIFT = 3
CLEN = 32


def _eval_kernel(src_ref, fades_ref, a_ref, b_ref, kernels_ref, scale_ref,
                 scale2_ref, mask_ref, maxv_ref, out_ref):
    """Grid: (B, F). One program evaluates one (frame, fade) pair.

    src_ref     : [H, W]        frame window (deinterlaced Y)
    fades_ref   : [F]           fade steps (SMEM)
    a/b_ref     : [H, W]        logo planes
    kernels_ref : [KLEN, H, W]  per-pixel zero-mean 5x5 kernels (tap-major)
    scale(2)_ref: [CLEN, H, W]  per-background scales (bucket-major)
    mask_ref    : [H, W]
    out_ref     : [8, 128]      raw correlation score (broadcast tile)
    """
    f = pl.program_id(1)
    fade = fades_ref[f]
    maxv = maxv_ref[0]
    h, w = src_ref.shape

    src = src_ref[:]
    bg = a_ref[:] * src + b_ref[:] * maxv
    work = fade * bg + (1.0 - fade) * src

    def shift_zero(x, sy, sx):
        """x shifted by (sy, sx) with zero fill (the zero-padded-window
        taps), built from value-level concats — no scratch halo writes."""
        zh = jnp.zeros((abs(sy), w), jnp.float32)
        if sy > 0:
            x = jnp.concatenate([x[sy:], zh], axis=0)
        elif sy < 0:
            x = jnp.concatenate([zh, x[:sy]], axis=0)
        zw = jnp.zeros((h, abs(sx)), jnp.float32)
        if sx > 0:
            x = jnp.concatenate([x[:, sx:], zw], axis=1)
        elif sx < 0:
            x = jnp.concatenate([zw, x[:, :sx]], axis=1)
        return x

    # 5x5 box average + per-pixel-kernel correlation over 25 shifted taps
    avg = jnp.zeros((h, w), jnp.float32)
    corr = jnp.zeros((h, w), jnp.float32)
    for i in range(KLEN):
        dy, dx = divmod(i, KSIZE)
        tap = shift_zero(work, dy - 2, dx - 2)
        avg += tap
        corr += kernels_ref[i] * tap
    avg = avg * (1.0 / KLEN)
    # kernels are zero-mean, so sum(k * (tap - avg)) == sum(k * tap) in exact
    # math; the reference subtracts avg explicitly, replicate that:
    ksum = jnp.zeros((h, w), jnp.float32)
    for i in range(KLEN):
        ksum += kernels_ref[i]
    corr = corr - ksum * avg

    bucket = jax.lax.shift_right_logical(
        jnp.clip(avg.astype(jnp.int32), 0, 255), CSHIFT
    )
    s1 = jnp.zeros((h, w), jnp.float32)
    s2 = jnp.zeros((h, w), jnp.float32)
    for c in range(CLEN):
        sel = bucket == c
        s1 = jnp.where(sel, scale_ref[c], s1)
        s2 = jnp.where(sel, scale2_ref[c], s2)

    normalized = jnp.clip(corr * s1, -1.0, 1.0)
    total = jnp.sum(normalized * s2 * mask_ref[:])
    # a full (8,128) output tile: sub-tile (1,1) blocks left the device in a
    # degraded state that slowed every later kernel ~30x (observed on v5e)
    out_ref[:, :] = jnp.full((8, 128), total, jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def evaluate_logo_pallas(params, src, maxv, fades, interpret: bool = False):
    """Drop-in for ops.logo.batched_evaluate_logo: [B, H, W] x [F] -> [B, F]."""
    b, h, w = src.shape
    f = fades.shape[0]
    kernels_tm = jnp.transpose(params.kernels, (2, 0, 1))  # tap-major
    scale_bm = jnp.transpose(params.scale, (2, 0, 1))  # bucket-major
    scale2_bm = jnp.transpose(params.scale2, (2, 0, 1))

    grid = (b, f)
    out = pl.pallas_call(
        _eval_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, h, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # src per frame
            pl.BlockSpec(memory_space=pltpu.SMEM),  # fades
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kernels
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),  # maxv
        ],
        out_specs=pl.BlockSpec((None, None, 8, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, 8, 128), jnp.float32),
        interpret=interpret,
    )(
        src, fades, params.a_y, params.b_y, kernels_tm, scale_bm, scale2_bm,
        params.mask, jnp.reshape(maxv, (1,)),
    )
    return out[:, :, 0, 0] / params.black_score


@jax.jit
def delogo_full_frame(frames, a_full, b_full, maxv, fades):
    """Logo erase with identity-padded full-frame A/B planes: avoids the
    window dynamic-update-slice copy over the full frame batch.

    frames: [B, H, W]; a_full/b_full: [H, W] (A=1, B=0 outside the logo);
    fades: [B]."""
    fade = fades[:, None, None]
    bg = a_full * frames + b_full * maxv
    tmp = fade * bg + (1.0 - fade) * frames
    return jnp.clip(jnp.floor(tmp + 0.5), 0.0, maxv)


def pad_logo_planes(a, b, height, width, imgx, imgy):
    """Embed window A/B planes into identity full-frame planes."""
    import numpy as np

    a_full = np.ones((height, width), np.float32)
    b_full = np.zeros((height, width), np.float32)
    lh, lw = a.shape
    a_full[imgy : imgy + lh, imgx : imgx + lw] = np.asarray(a)
    b_full[imgy : imgy + lh, imgx : imgx + lw] = np.asarray(b)
    return a_full, b_full
