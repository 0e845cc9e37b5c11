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


def device_link_is_slow(threshold_ms: float = 25.0) -> bool:
    """True when a full device round (upload + trivial op + download) is
    slower than `threshold_ms` — i.e. per-batch round trips will dominate
    any on-device compute win. Forced by AMATSUKAZE_FILTER_BACKEND=host|
    device."""
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
        x = jnp.asarray(np.ones((256, 1024), np.uint8))  # fresh buffer
        np.asarray(f(x))  # one full round
        dt_ms = (time.time() - t0) * 1e3
        _cached = dt_ms > threshold_ms
    except Exception:  # noqa: BLE001 - no usable device: host it is
        _cached = True
    return _cached


def _reset_probe_cache() -> None:
    """Test hook."""
    global _cached
    _cached = None
