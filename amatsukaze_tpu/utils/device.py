"""Device-link economics probe.

On a co-located TPU a dispatch+fetch round is sub-millisecond; through a
remote/tunneled device (the axon development setup) one full round costs
SECONDS, so per-batch round-trip code must fall back to decision-identical
host twins (scene metrics did this in round 1; the KFM filter paths share
the probe now). The result is cached per process: link characteristics
don't change mid-run.
"""

from __future__ import annotations

import os
import time

_cached: bool | None = None


def device_link_is_slow(threshold_ms: float = 20.0) -> bool:
    """True when a FRAME-SIZED device round (upload one 1080i luma plane
    + trivial op + download) is slower than `threshold_ms` — i.e. moving
    frames over the link costs more than computing them with the native
    host twins (~3-8 ms/frame). Latency alone is not enough: a tunneled
    device can answer a small probe in a few ms yet sustain only ~10 MB/s
    of bulk transfer, which makes the per-frame economics ~200 ms/frame.
    Forced by AMATSUKAZE_FILTER_BACKEND=host|device."""
    global _cached
    forced = os.environ.get("AMATSUKAZE_FILTER_BACKEND")
    if forced == "host":
        return True
    if forced == "device":
        return False
    if _cached is not None:
        return _cached
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        f = jax.jit(lambda a: a + 1)
        # warm: attach + compile are one-time costs, not link latency
        np.asarray(f(jnp.asarray(np.zeros((256, 1024), np.uint8))))
        t0 = time.time()
        x = jnp.asarray(np.ones((256, 1024), np.uint8))
        np.asarray(f(x))  # small round: latency
        dt_ms = (time.time() - t0) * 1e3
        if dt_ms > threshold_ms:
            _cached = True  # latency alone disqualifies; skip the
        else:               # (possibly very slow) bandwidth rounds
            # frame-sized payload: one 1440x1088 luma plane (~1.5 MB
            # each way) measures bandwidth as well as latency — a
            # tunneled device can answer the small probe in a few ms
            # yet sustain only ~10 MB/s of bulk transfer. The first
            # frame-sized round includes the shape's compile; if it
            # passes anyway the link is definitely fast, otherwise one
            # compile-cached round decides.
            t0 = time.time()
            x = jnp.asarray(np.ones((1088, 1440), np.uint8))
            np.asarray(f(x))
            dt_ms = (time.time() - t0) * 1e3
            if dt_ms > threshold_ms:
                t0 = time.time()
                x = jnp.asarray(np.ones((1088, 1440), np.uint8))
                np.asarray(f(x))
                dt_ms = (time.time() - t0) * 1e3
            _cached = dt_ms > threshold_ms
    except Exception:  # noqa: BLE001 - no usable device: host it is
        _cached = True
    return _cached


def _reset_probe_cache() -> None:
    """Test hook."""
    global _cached
    _cached = None
