"""Scene-change + silence detection kernels (chapter_exe-class capability).

The reference spawns the external `chapter_exe` tool for scene-change and
audio-silence detection (reference CMAnalyze.hpp:319-337); its outputs (`SCPos:`
lines) feed join_logo_scp. These batched ops reproduce that capability
on-device; the interval/decision logic lives in models/cm_analyze.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def scene_change_scores(frames: jnp.ndarray) -> jnp.ndarray:
    """Per-frame scene-change score vs the previous frame.

    frames: [B, H, W] luma. Score = mean absolute difference (0..maxv).
    First frame scores 0.
    """
    d = jnp.mean(jnp.abs(frames[1:] - frames[:-1]), axis=(-2, -1))
    return jnp.concatenate([jnp.zeros((1,), d.dtype), d])


def _binned_hist(frames: jnp.ndarray, bins: int) -> jnp.ndarray:
    """Normalised per-frame luma histograms [B, bins] without the one-hot
    memory blowup (B*H*W*bins temp): one masked reduction per bin, which
    XLA fuses into a few passes over the frames."""
    idx = jnp.clip((frames / (256.0 / bins)).astype(jnp.int32), 0, bins - 1)
    hist = jnp.stack(
        [jnp.sum((idx == k).astype(jnp.float32), axis=(-2, -1))
         for k in range(bins)], axis=-1)
    return hist / jnp.maximum(jnp.sum(hist, axis=-1, keepdims=True), 1.0)


@jax.jit
def histogram_correlation(frames: jnp.ndarray, bins: int = 32) -> jnp.ndarray:
    """Luma-histogram correlation with the previous frame [B] (first = 1).

    Robust to motion; low correlation = cut. For full sequences use the
    streaming pair scene_metrics_batch + histogram_correlation_from_hists
    (this whole-array form is for bounded batches/tests)."""
    hist = _binned_hist(frames, bins)
    prev = jnp.concatenate([hist[:1], hist[:-1]], axis=0)
    num = jnp.sum(hist * prev, axis=-1)
    den = jnp.sqrt(jnp.sum(hist * hist, -1) * jnp.sum(prev * prev, -1))
    corr = num / jnp.maximum(den, 1e-12)
    return corr.at[0].set(1.0)


@jax.jit
def scene_metrics_batch(frames: jnp.ndarray, prev_frame: jnp.ndarray):
    """Streaming per-batch scene metrics with a cross-batch carry.

    frames: [B, H, W] luma (uint8 preferred - the host->device transfer is
    4x smaller and the widening happens on device); prev_frame: [H, W]
    (the previous batch's last frame; pass frames[0] for the first batch
    so its score is 0). Returns (diff scores [B], normalised histograms
    [B, 32]). Host code assembles the full sequence
    (histogram_correlation_from_hists)."""
    frames = frames.astype(jnp.float32)
    prev = jnp.concatenate([prev_frame.astype(jnp.float32)[None],
                            frames[:-1]])
    d = jnp.mean(jnp.abs(frames - prev), axis=(-2, -1))
    return d, _binned_hist(frames, 32)


def histogram_correlation_from_hists(hists) -> "np.ndarray":
    """Host-side correlation over per-frame histograms [N, bins]."""
    import numpy as np

    h = np.asarray(hists, np.float32)
    prev = np.concatenate([h[:1], h[:-1]])
    num = (h * prev).sum(-1)
    den = np.sqrt((h * h).sum(-1) * (prev * prev).sum(-1))
    corr = num / np.maximum(den, 1e-12)
    if len(corr):
        corr[0] = 1.0
    return corr


from functools import partial


@partial(jax.jit, static_argnames=("window",))
def audio_rms_windows(pcm: jnp.ndarray, window: int) -> jnp.ndarray:
    """RMS per non-overlapping window of interleaved/mono samples.

    pcm: [N] float32 (-1..1 or s16 range); N multiple of window.
    Returns [N / window]."""
    x = pcm.reshape(-1, window)
    return jnp.sqrt(jnp.mean(x * x, axis=-1))


def detect_silence(
    rms: jnp.ndarray, threshold: float, min_windows: int
) -> list[tuple[int, int]]:
    """Host-side run-length pass: silent spans [start, end) in window units
    lasting at least min_windows. (Decision logic stays off-device.)"""
    import numpy as np

    quiet = np.asarray(rms) < threshold
    spans = []
    start = None
    for i, q in enumerate(quiet):
        if q and start is None:
            start = i
        elif not q and start is not None:
            if i - start >= min_windows:
                spans.append((start, i))
            start = None
    if start is not None and len(quiet) - start >= min_windows:
        spans.append((start, len(quiet)))
    return spans


def detect_scene_changes(
    scores, hist_corr, diff_threshold: float = 30.0, corr_threshold: float = 0.85
) -> list[int]:
    """Host-side cut decision: frames where pixel diff is high AND histogram
    correlation is low."""
    import numpy as np

    s = np.asarray(scores)
    c = np.asarray(hist_corr)
    return [int(i) for i in np.flatnonzero((s > diff_threshold) & (c < corr_threshold))]


def scene_metrics_batch_host(frames_u8, prev_frame_u8, bins: int = 32):
    """Host twin of scene_metrics_batch, for environments where
    shipping full frames to the accelerator is slower than computing on
    the CPU (e.g. remote/tunneled devices). Decision-identical: same diff
    scores (f32 tolerance) and exact histograms. Uses the native
    single-pass kernel (fieldcosts.cpp Amt_SceneMetrics) when built —
    the numpy loop below costs ~150 ms per 1080i frame on one core."""
    import numpy as np

    from .deint import _load_host_lib

    lib = _load_host_lib()
    arr = np.stack(frames_u8)
    prev0 = np.ascontiguousarray(prev_frame_u8)
    if (lib is not None and hasattr(lib, "Amt_SceneMetrics")
            and arr.dtype == np.uint8 and prev0.dtype == np.uint8
            and arr.flags["C_CONTIGUOUS"]):
        import ctypes

        b, h, w = arr.shape
        diffs = np.empty(b, np.float64)
        hists = np.empty((b, bins), np.float32)
        lib.Amt_SceneMetrics(
            arr.ctypes.data_as(ctypes.c_void_p),
            prev0.ctypes.data_as(ctypes.c_void_p), b, h, w, bins,
            diffs.ctypes.data_as(ctypes.c_void_p),
            hists.ctypes.data_as(ctypes.c_void_p))
        return diffs.astype(np.float32), hists
    prev = np.concatenate([np.asarray(prev_frame_u8)[None], arr[:-1]])
    d = np.mean(np.abs(arr.astype(np.int16) - prev.astype(np.int16)),
                axis=(-2, -1), dtype=np.float32)
    scale = bins / 256.0
    hists = np.empty((len(arr), bins), np.float32)
    for i, f in enumerate(arr):
        idx = np.clip((f.astype(np.float32) * scale).astype(np.int32),
                      0, bins - 1)
        h = np.bincount(idx.ravel(), minlength=bins).astype(np.float32)
        hists[i] = h / max(h.sum(), 1.0)
    return d, hists
