"""Benchmark: filtered 1080i frames/sec/chip through the flagship device
pipeline (logo evaluate + erase, yadif deinterlace, telecine metrics).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 2000 filtered 1080i fps/chip (BASELINE.json north star).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from amatsukaze_tpu.ops import logo as logo_ops
    from amatsukaze_tpu.ops import deint as deint_ops
    from __graft_entry__ import _make_logo_params

    H, W = 1080, 1440  # 1080i broadcast frame
    LOGO_H, LOGO_W = 96, 256  # realistic logo window
    BATCH = 32

    # logo window params at realistic size
    yy, xx = np.mgrid[0:LOGO_H, 0:LOGO_W]
    r = np.hypot((yy - LOGO_H / 2) / (LOGO_H / 2), (xx - LOGO_W / 2) / (LOGO_W / 2))
    alpha = (np.clip(1.2 - r, 0, 1) * 0.35).astype(np.float32)
    a = (1.0 / (1.0 - alpha)).astype(np.float32)
    b = (-alpha * 200.0 / (1.0 - alpha) / 255.0).astype(np.float32)
    from amatsukaze_tpu.ops.logo_ref import LogoEvalRef
    from amatsukaze_tpu.ops.logo import LogoEvalParams

    ref = LogoEvalRef(a, b, maskratio=0.1)
    params = LogoEvalParams.from_ref(ref)

    @jax.jit
    def pipeline(frames, fades):
        window = frames[:, :LOGO_H, :LOGO_W]
        deint = logo_ops.batched_deint_y(window)
        scores = logo_ops.batched_evaluate_logo(
            params, deint, jnp.float32(255.0), jnp.asarray([0.0, 1.0])
        )
        erased = logo_ops.batched_delogo(
            window, params.a_y, params.b_y, jnp.float32(255.0), fades
        )
        frames = frames.at[:, :LOGO_H, :LOGO_W].set(erased)
        prev = jnp.concatenate([frames[:1], frames[:-1]], axis=0)
        nxt = jnp.concatenate([frames[1:], frames[-1:]], axis=0)
        out = deint_ops.yadif_deinterlace(prev, frames, nxt, True)
        costs = deint_ops.field_match_costs(frames)
        return out, scores, costs

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(16, 236, (BATCH, H, W)).astype(np.float32))
    fades = jnp.ones(BATCH, jnp.float32)

    # warmup / compile
    out = pipeline(frames, fades)
    jax.block_until_ready(out)

    # timed runs
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(frames, fades)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = BATCH * iters / dt
    baseline = 2000.0
    print(json.dumps({
        "metric": "filtered_1080i_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
