"""Host twin of the device Lanczos3 resize.

The device path resizes filtered batches with `jax.image.resize(...,
method="lanczos3")` (models/filter_graph._apply_resize — the reference
delegates resizing to an AviSynth `ResizeFilter` script line,
Server/Misc.cs:1446-1452). On a slow/tunneled device link the synthesis
runs on the host (utils/device.device_link_is_slow); this module provides
the matching resize so a configured output size does not force frames
back onto the device.

The weight computation mirrors jax's separable scale-and-translate
formulation in float32 (same sample grid, kernel support, normalization
and edge zeroing), so host and device outputs agree to float rounding
(verified in tests/test_filter_fps_modes.py::TestHostTwin); application
is two banded matrix contractions per plane batch.
"""

from __future__ import annotations

import numpy as np

_RADIUS = 3.0
_weight_cache: dict[tuple[int, int], np.ndarray] = {}


def _lanczos3_kernel(x: np.ndarray) -> np.ndarray:
    y = _RADIUS * np.sin(np.pi * x) * np.sin(np.pi * x / _RADIUS)
    denom = np.where(x != 0, (np.pi ** 2 * x ** 2).astype(np.float32), 1)
    out = np.where(x > 1e-3, y / denom, np.float32(1.0))
    return np.where(x > _RADIUS, np.float32(0.0), out)


def lanczos3_weights(in_size: int, out_size: int) -> np.ndarray:
    """[in_size, out_size] float32 contraction matrix; antialiased when
    downscaling (kernel stretched by the inverse scale), interpolating
    when upscaling — the jax.image.resize semantics."""
    key = (in_size, out_size)
    w = _weight_cache.get(key)
    if w is not None:
        return w
    scale = np.float32(out_size / in_size)
    inv_scale = np.float32(1.0) / scale
    kernel_scale = max(inv_scale, np.float32(1.0))
    sample_f = ((np.arange(out_size, dtype=np.float32) + 0.5) * inv_scale
                - 0.5)
    x = np.abs(sample_f[None, :]
               - np.arange(in_size, dtype=np.float32)[:, None]) / kernel_scale
    w = _lanczos3_kernel(x).astype(np.float32)
    total = w.sum(axis=0, keepdims=True)
    w = np.where(np.abs(total) > 1000.0 * np.finfo(np.float32).eps,
                 w / np.where(total != 0, total, 1), 0)
    w = np.where(((sample_f >= -0.5) & (sample_f <= in_size - 0.5))[None, :],
                 w, 0).astype(np.float32)
    _weight_cache[key] = w
    return w


def resize_lanczos3_host(batch: np.ndarray, out_h: int,
                         out_w: int) -> np.ndarray:
    """Resize a [B, h, w] float batch to [B, out_h, out_w] (float32)."""
    batch = np.asarray(batch, np.float32)
    b, h, w = batch.shape
    if (h, w) == (out_h, out_w):
        return batch
    out = batch
    if h != out_h:
        wh = lanczos3_weights(h, out_h)  # [h, out_h]
        # [B, w, h] @ [h, out_h] -> [B, w, out_h] -> [B, out_h, w]
        out = np.matmul(out.transpose(0, 2, 1), wh).transpose(0, 2, 1)
    if w != out_w:
        ww = lanczos3_weights(w, out_w)  # [w, out_w]
        out = np.matmul(out, ww)
    return np.ascontiguousarray(out, dtype=np.float32)
