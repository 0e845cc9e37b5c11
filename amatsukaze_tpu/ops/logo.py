"""Batched JAX logo kernels (TPU device core #1).

TPU-first reformulation of the reference's per-pixel logo loops
(LogoScan.hpp:24-318, :1248-1261): instead of iterating masked pixels with
per-pixel 5x5 kernels on the CPU, we evaluate the correlation densely over
the whole logo window for a **batch of frames x fades** on the VPU, multiply
by the mask and reduce. The per-pixel kernels/scales are precomputed once per
logo (host side, ops.logo_ref.LogoEvalRef) and shipped as dense [H,W,...]
operands.

Oracle parity is tested against ops.logo_ref in tests/test_ops_logo.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

KSIZE = 5
KLEN = 25
CSHIFT = 3
CLEN = 32


@jax.tree_util.register_pytree_node_class
@dataclass
class LogoEvalParams:
    """Dense per-pixel evaluation operands for one logo.

    a_y, b_y      : [H, W] logo A/B planes (deinterlaced for matching)
    mask          : [H, W] float32 0/1, interior masked pixels only
    kernels       : [H, W, 25] zero-mean 5x5 kernels (0 off-mask)
    scale         : [H, W, 32] 1/|corr| normalisation per background bucket
    scale2        : [H, W, 32] low-correlation cap per background bucket
    black_score   : scalar baseline (logo on black)
    """

    a_y: jnp.ndarray
    b_y: jnp.ndarray
    mask: jnp.ndarray
    kernels: jnp.ndarray
    scale: jnp.ndarray
    scale2: jnp.ndarray
    black_score: jnp.ndarray

    def tree_flatten(self):
        return (
            (self.a_y, self.b_y, self.mask, self.kernels, self.scale,
             self.scale2, self.black_score),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_ref(cls, ref) -> "LogoEvalParams":
        """Build dense operands from the host-side LogoEvalRef oracle."""
        d = dense_operands_from_ref(ref)
        return cls(**{k: jnp.asarray(v) for k, v in d.items()})


def dense_operands_from_ref(ref) -> dict:
    """Dense numpy evaluation operands from the LogoEvalRef oracle —
    shared by the device params (LogoEvalParams.from_ref) and the
    numpy host twins (ops.logo_host)."""
    h, w = ref.h, ref.w
    mask2d = ref.mask.reshape(h, w).astype(bool)
    interior = np.zeros((h, w), bool)
    interior[2 : h - 2, 2 : w - 2] = True
    eff = mask2d & interior
    kernels = np.zeros((h, w, KLEN), np.float32)
    scale = np.zeros((h, w, CLEN), np.float32)
    scale2 = np.zeros((h, w, CLEN), np.float32)
    # ref.kernels/scales are ordered by the interior row-major walk
    count = 0
    for y in range(2, h - 2):
        for x in range(2, w - 2):
            if mask2d[y, x]:
                kernels[y, x] = ref.kernels[count]
                scale[y, x] = ref.scales[count, :, 0]
                scale2[y, x] = ref.scales[count, :, 1]
                count += 1
    return dict(
        a_y=np.asarray(ref.a_y, np.float32),
        b_y=np.asarray(ref.b_y, np.float32),
        mask=eff.astype(np.float32),
        kernels=kernels,
        scale=scale,
        scale2=scale2,
        black_score=np.float32(ref.black_score),
    )


def _window_patches(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] -> [..., H, W, 25] of 5x5 neighbourhoods (zero padded).

    Padding only affects border pixels, which the mask excludes.
    """
    pad = [(0, 0)] * (img.ndim - 2) + [(2, 2), (2, 2)]
    p = jnp.pad(img, pad)
    h, w = img.shape[-2], img.shape[-1]
    taps = []
    for dy in range(KSIZE):
        for dx in range(KSIZE):
            taps.append(
                jax.lax.dynamic_slice_in_dim(
                    jax.lax.dynamic_slice_in_dim(p, dy, h, axis=img.ndim - 2),
                    dx, w, axis=img.ndim - 1,
                )
            )
    return jnp.stack(taps, axis=-1)


def correlation_scores(params: LogoEvalParams, work: jnp.ndarray) -> jnp.ndarray:
    """CorrelationScore for a batch: work [..., H, W] -> [...] raw scores."""
    patches = _window_patches(work)  # [..., H, W, 25]
    avg = jnp.sum(patches, axis=-1) / 25.0
    corr = jnp.einsum("...hwk,hwk->...hw", patches - avg[..., None], params.kernels)
    bucket = jnp.right_shift(
        jnp.clip(avg.astype(jnp.int32), 0, 255), CSHIFT
    )  # [..., H, W]
    # per-pixel bucket lookup as a one-hot contraction (gather-free on TPU)
    onehot = jax.nn.one_hot(bucket, CLEN, dtype=work.dtype)  # [..., H, W, 32]
    s1 = jnp.einsum("...hwc,hwc->...hw", onehot, params.scale)
    s2 = jnp.einsum("...hwc,hwc->...hw", onehot, params.scale2)
    normalized = jnp.clip(corr * s1, -1.0, 1.0)
    return jnp.sum(normalized * s2 * params.mask, axis=(-2, -1))


@partial(jax.jit, static_argnames=())
def batched_evaluate_logo(
    params: LogoEvalParams,
    src: jnp.ndarray,  # [B, H, W] float32 (deinterlaced Y window)
    maxv: jnp.ndarray,  # scalar
    fades: jnp.ndarray,  # [F]
) -> jnp.ndarray:
    """EvaluateLogo for a batch of frames x fade steps -> [B, F] scores
    (normalised by the black-background baseline, ref LogoScan.hpp:231-255)."""
    fades = fades.reshape(1, -1, 1, 1)
    s = src[:, None]  # [B, 1, H, W]
    bg = params.a_y * s + params.b_y * maxv
    work = fades * bg + (1.0 - fades) * s  # [B, F, H, W]
    return correlation_scores(params, work) / params.black_score


@jax.jit
def batched_deint_y(src: jnp.ndarray) -> jnp.ndarray:
    """(a + 2b + c + 2)/4 vertical field merge, batch [..., H, W]
    (ref DeintY LogoScan.hpp:763-781)."""
    top = src[..., :1, :]
    bot = src[..., -1:, :]
    mid = (src[..., :-2, :] + 2.0 * src[..., 1:-1, :] + src[..., 2:, :] + 2.0) / 4.0
    return jnp.concatenate([top, mid, bot], axis=-2)


@jax.jit
def batched_deint_logo(plane: jnp.ndarray) -> jnp.ndarray:
    """(a + 2b + c)/4 merge for logo A/B planes (ref DeintLogo :734-761)."""
    top = plane[..., :1, :]
    bot = plane[..., -1:, :]
    mid = (plane[..., :-2, :] + 2.0 * plane[..., 1:-1, :] + plane[..., 2:, :]) / 4.0
    return jnp.concatenate([top, mid, bot], axis=-2)


@partial(jax.jit, static_argnames=())
def batched_delogo(
    src: jnp.ndarray,  # [B, H, W] float32
    a: jnp.ndarray,  # [H, W]
    b: jnp.ndarray,  # [H, W]
    maxv: jnp.ndarray,  # scalar
    fades: jnp.ndarray,  # [B] or [B, H] per-row (field mode)
) -> jnp.ndarray:
    """dst = clamp(fade*(a*src + b*maxv) + (1-fade)*src + 0.5, 0, maxv)
    (ref Delogo LogoScan.hpp:1248-1261). Returns float32; caller casts."""
    if fades.ndim == 1:
        fade = fades[:, None, None]
    else:
        fade = fades[:, :, None]  # per-row fade for field processing
    bg = a * src + b * maxv
    tmp = fade * bg + (1.0 - fade) * src
    return jnp.clip(jnp.floor(tmp + 0.5), 0.0, maxv)


def field_fades(fade_t: jnp.ndarray, fade_b: jnp.ndarray, height: int) -> jnp.ndarray:
    """Expand per-frame top/bottom fades [B] to per-row fades [B, H]."""
    rows = jnp.arange(height) % 2
    return jnp.where(rows[None, :] == 0, fade_t[:, None], fade_b[:, None])


@jax.jit
def logo_sums_update(sums: jnp.ndarray, frames: jnp.ndarray, bgs: jnp.ndarray):
    """Accumulate the per-pixel regression sums over a batch of frames.

    sums   : [5, H, W] (sumF, sumB, sumF2, sumB2, sumFB) - ref LogoColor::Add
    frames : [N, H, W] pixel values
    bgs    : [N] per-frame background level
    """
    f = frames.astype(jnp.float64) if sums.dtype == jnp.float64 else frames
    b = bgs.astype(f.dtype)
    sum_f = jnp.sum(f, axis=0)
    sum_b = jnp.sum(b) * jnp.ones_like(sum_f)
    sum_f2 = jnp.sum(f * f, axis=0)
    sum_b2 = jnp.sum(b * b) * jnp.ones_like(sum_f)
    sum_fb = jnp.sum(f * b[:, None, None], axis=0)
    return sums + jnp.stack([sum_f, sum_b, sum_f2, sum_b2, sum_fb])


@jax.jit
def logo_ab_from_sums(sums: jnp.ndarray, n: jnp.ndarray):
    """Closed-form GetAB per pixel (ref approxim_line/GetAB :336-396).

    Returns (A, B, valid) with A/B float32 [H, W]."""
    sum_f, sum_b, sum_f2, sum_b2, sum_fb = sums
    t1 = n * sum_f2 - sum_f * sum_f
    a1 = (n * sum_fb - sum_f * sum_b) / t1
    b1 = (sum_f2 * sum_b - sum_f * sum_fb) / t1
    t2 = n * sum_b2 - sum_b * sum_b
    a2 = (n * sum_fb - sum_b * sum_f) / t2
    b2 = (sum_b2 * sum_f - sum_b * sum_fb) / t2
    a = (a1 + 1.0 / a2) / 2.0
    b = (b1 + (-b2 / a2)) / 2.0
    valid = jnp.isfinite(a) & jnp.isfinite(b) & (a != 0)
    return a.astype(jnp.float32), b.astype(jnp.float32), valid
