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


@jax.jit
def histogram_correlation(frames: jnp.ndarray, bins: int = 32) -> jnp.ndarray:
    """Luma-histogram correlation with the previous frame [B] (first = 1).

    Robust to motion; low correlation = cut. Uses a soft-binned histogram so
    the whole thing stays one fused XLA op."""
    b = frames.shape[0]
    # hard binning via one-hot (frames assumed 0..255)
    idx = jnp.clip((frames / (256.0 / bins)).astype(jnp.int32), 0, bins - 1)
    onehot = jax.nn.one_hot(idx, bins, dtype=jnp.float32)
    hist = jnp.sum(onehot, axis=(1, 2))  # [B, bins]
    hist = hist / jnp.maximum(jnp.sum(hist, axis=-1, keepdims=True), 1.0)
    prev = jnp.concatenate([hist[:1], hist[:-1]], axis=0)
    num = jnp.sum(hist * prev, axis=-1)
    den = jnp.sqrt(jnp.sum(hist * hist, -1) * jnp.sum(prev * prev, -1))
    corr = num / jnp.maximum(den, 1e-12)
    return corr.at[0].set(1.0)


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
