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
_attached = False  # this process already initialized the jax backend


def mark_backend_attached() -> None:
    """Record that THIS process attached the jax backend successfully.
    From then on the link probe measures in-process: the link is
    provably alive (attach worked), so the hang-isolation subprocess is
    unnecessary — worse, on single-client device tunnels (axon) a
    second attaching process can never connect and would burn the whole
    probe timeout before concluding 'slow'."""
    global _attached
    _attached = True


def device_link_is_slow(threshold_ms: float = 20.0) -> bool:
    """True when a FRAME-SIZED device round (upload one 1080i luma plane
    + trivial op + download) is slower than `threshold_ms` — i.e. moving
    frames over the link costs more than computing them with the native
    host twins (~3-8 ms/frame). Latency alone is not enough: a tunneled
    device can answer a small probe in a few ms yet sustain only ~10 MB/s
    of bulk transfer, which makes the per-frame economics ~200 ms/frame.
    Forced by AMATSUKAZE_FILTER_BACKEND=host|device."""
    global _cached, _pending
    forced = os.environ.get("AMATSUKAZE_FILTER_BACKEND")
    if forced == "host":
        return True
    if forced == "device":
        return False
    if _cached is not None:
        return _cached
    if tunneled_env():
        # tunnel known from the environment alone: answer WITHOUT
        # attaching the backend (first contact with an axon tunnel
        # costs ~10 s — pure waste when every frame-sized op is going
        # to the host twins anyway)
        _cached = True
        return _cached

    # a dead/hung link would block the first device round forever, and
    # a thread abandoned inside a blocked XLA call aborts the process
    # at interpreter shutdown — so the probe runs in a SUBPROCESS that
    # can be killed cleanly. "No answer within the budget" IS the
    # answer (slow). AMATSUKAZE_PROBE_INPROCESS=1 skips the isolation
    # (trusted links; avoids the subprocess startup cost).
    budget = float(os.environ.get("AMATSUKAZE_PROBE_TIMEOUT", "60"))
    if _attached or os.environ.get("AMATSUKAZE_PROBE_INPROCESS"):
        if _tunneled_backend():
            # development tunnels (axon) sustain ~10 MB/s of bulk
            # transfer; measuring would pay the first-contact cost
            # (~10 s) just to confirm what the transport already says
            _cached = True
            return _cached
        try:
            _cached = _measure(threshold_ms)
        except Exception:  # noqa: BLE001 - no usable device: host it is
            _cached = True
        return _cached
    import subprocess
    import sys

    try:
        # the device plugin can override the JAX_PLATFORMS env var, so
        # re-assert the parent's platform choice via jax.config
        code = (
            "import os, jax\n"
            "p = os.environ.get('JAX_PLATFORMS')\n"
            "if p:\n"
            "    jax.config.update('jax_platforms', p)\n"
            "from amatsukaze_tpu.utils.device import _measure\n"
            f"print(int(_measure({threshold_ms})))\n")
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=budget,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
        _cached = bool(int(r.stdout.strip())) if r.returncode == 0 else True
    except (subprocess.TimeoutExpired, OSError, ValueError):
        _cached = True
    return _cached


def tunneled_env() -> bool:
    """Tunnel detection WITHOUT attaching the backend: the axon
    development tunnel advertises itself in the environment
    (JAX_PLATFORMS=axon / _AXON_REGISTERED).  Attaching such a backend
    costs ~10 s of first-contact handshake, so callers that only need
    to know "is this link slow?" must not trigger it."""
    env = os.environ
    return ("axon" in env.get("JAX_PLATFORMS", "").lower()
            or env.get("_AXON_REGISTERED") == "1")


def _tunneled_backend() -> bool:
    """True when the attached jax backend is a remote development
    tunnel (identified by its platform_version string) rather than a
    co-located device."""
    try:
        import jax._src.xla_bridge as xb

        ver = str(getattr(xb.get_backend(), "platform_version", ""))
        return "axon" in ver.lower()
    except Exception:  # noqa: BLE001 - unknown backend: measure instead
        return False


def _measure(threshold_ms: float) -> bool:
    """One probe measurement (may block forever on a dead link — call
    via device_link_is_slow, which isolates it in a subprocess)."""
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
        return True  # latency alone disqualifies; skip the
    # (possibly very slow) bandwidth rounds.
    # frame-sized payload: one 1440x1088 luma plane (~1.5 MB each way)
    # measures bandwidth as well as latency — a tunneled device can
    # answer the small probe in a few ms yet sustain only ~10 MB/s of
    # bulk transfer. The first frame-sized round includes the shape's
    # compile; if it passes anyway the link is definitely fast,
    # otherwise one compile-cached round decides.
    for _ in range(2):
        t0 = time.time()
        x = jnp.asarray(np.ones((1088, 1440), np.uint8))
        np.asarray(f(x))
        dt_ms = (time.time() - t0) * 1e3
        if dt_ms <= threshold_ms:
            return False
    return True


def _reset_probe_cache() -> None:
    """Test hook."""
    global _cached, _attached
    _cached = None
    _attached = False
