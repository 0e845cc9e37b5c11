"""Numpy host twins of the batched logo device ops (ops.logo).

Purpose: on a slow device link (remote/tunneled TPU — see
utils/device.device_link_is_slow) every fetch of a device result costs
SECONDS of round-trip latency; a 300-frame logo scan measured 53 fetches
x ~2.5 s = >130 s of pure link wait on the axon tunnel.  The scene
metrics and KFM cost paths already fall back to decision-identical host
twins; these are the same twins for the logo-generation and
logo-matching paths (LogoAnalyzer / LogoFrameMatcher, models/logo.py).

Each function mirrors its ops.logo namesake operation-for-operation
(f32 math, same clip/floor semantics).  Float reduce order can differ
from XLA's in the last ulp; the consumers' decisions (fade histograms,
interval smoothing, best-logo selection) operate far above that noise,
and tests/test_models_logo.py::TestHostTwins pins the twins to the device
results at tight tolerance.

Parity target: LogoScan.hpp (CalcCorrelation5x5 :24, EvaluateLogo
:231-255, DeintY :763-781, DeintLogo :734-761, LogoColor::Add /
GetAB :336-396).
"""

from __future__ import annotations

import numpy as np

KSIZE = 5
KLEN = KSIZE * KSIZE
CSHIFT = 3
CLEN = 256 >> CSHIFT


def _np(x) -> np.ndarray:
    """Device/np array -> np array (params may carry jnp buffers)."""
    return np.asarray(x)


def host_params_from_ref(ref):
    """Evaluation operands as plain numpy (no device buffers created):
    duck-typed stand-in for ops.logo.LogoEvalParams on the host path."""
    from types import SimpleNamespace

    from .logo import dense_operands_from_ref

    return SimpleNamespace(**dense_operands_from_ref(ref))


def correlation_scores_np(params, work: np.ndarray) -> np.ndarray:
    """CorrelationScore for a batch: work [..., H, W] -> [...] scores.

    Streams the 25 taps instead of materializing a [..., H, W, 25]
    patch tensor (a 64-frame x 20-fade refine batch would need ~3 GB);
    working set stays at a few [..., H, W] planes."""
    kernels = _np(params.kernels)
    scale = _np(params.scale)
    scale2 = _np(params.scale2)
    mask = _np(params.mask)
    h, w = work.shape[-2], work.shape[-1]
    pad = [(0, 0)] * (work.ndim - 2) + [(2, 2), (2, 2)]
    p = np.pad(work, pad)
    corr = np.zeros_like(work)
    box = np.zeros_like(work)
    k = 0
    for dy in range(KSIZE):
        for dx in range(KSIZE):
            tap = p[..., dy:dy + h, dx:dx + w]
            box += tap
            corr += tap * kernels[..., k]
            k += 1
    avg = box * np.float32(1.0 / 25.0)
    # (patches - avg)·kern == Σ tap·kern - avg·Σ kern
    corr -= avg * kernels.sum(axis=-1)
    bucket = np.right_shift(np.clip(avg.astype(np.int32), 0, 255), CSHIFT)
    hh = np.arange(h)[:, None]
    ww = np.arange(w)[None, :]
    s1 = scale[hh, ww, bucket]  # advanced indexing broadcasts to [..., H, W]
    s2 = scale2[hh, ww, bucket]
    normalized = np.clip(corr * s1, -1.0, 1.0)
    return np.sum(normalized * s2 * mask, axis=(-2, -1))


def batched_evaluate_logo_np(params, src: np.ndarray, maxv: float,
                             fades: np.ndarray) -> np.ndarray:
    """EvaluateLogo: frames [B, H, W] x fades [F] -> [B, F] scores.
    Fades run one at a time to bound the working set."""
    a_y = _np(params.a_y)
    b_y = _np(params.b_y)
    black = float(_np(params.black_score))
    fades = np.asarray(fades, np.float32)
    s = np.asarray(src, np.float32)
    bg = a_y * s + b_y * np.float32(maxv)
    out = np.empty((s.shape[0], len(fades)), np.float32)
    for fi, f in enumerate(fades):
        work = f * bg + (1.0 - f) * s
        out[:, fi] = correlation_scores_np(params, work) / black
    return out


def batched_deint_y_np(src: np.ndarray) -> np.ndarray:
    src = np.asarray(src, np.float32)
    top = src[..., :1, :]
    bot = src[..., -1:, :]
    mid = (src[..., :-2, :] + 2.0 * src[..., 1:-1, :]
           + src[..., 2:, :] + 2.0) / 4.0
    return np.concatenate([top, mid, bot], axis=-2)


def batched_deint_logo_np(plane: np.ndarray) -> np.ndarray:
    plane = np.asarray(plane, np.float32)
    top = plane[..., :1, :]
    bot = plane[..., -1:, :]
    mid = (plane[..., :-2, :] + 2.0 * plane[..., 1:-1, :]
           + plane[..., 2:, :]) / 4.0
    return np.concatenate([top, mid, bot], axis=-2)


def logo_sums_update_np(sums: np.ndarray, frames: np.ndarray,
                        bgs: np.ndarray) -> np.ndarray:
    sums = np.asarray(sums)
    f = np.asarray(frames, sums.dtype)
    b = np.asarray(bgs, sums.dtype)
    sum_f = np.sum(f, axis=0)
    sum_b = np.sum(b) * np.ones_like(sum_f)
    sum_f2 = np.sum(f * f, axis=0)
    sum_b2 = np.sum(b * b) * np.ones_like(sum_f)
    sum_fb = np.sum(f * b[:, None, None], axis=0)
    return sums + np.stack([sum_f, sum_b, sum_f2, sum_b2, sum_fb])
