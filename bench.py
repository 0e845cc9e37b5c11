"""Benchmark: filtered 1080i frames/sec/chip through the flagship device
pipeline — Pallas logo evaluation on the logo window plus the fused
single-pass uint8 kernel (logo erase + yadif deinterlace + field-match
telecine metrics) from ops.fused_filter.

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
    from amatsukaze_tpu.ops.fused_filter import (
        make_fused_filter,
        pad_width_for_fused,
    )
    from amatsukaze_tpu.ops.logo import LogoEvalParams
    from amatsukaze_tpu.ops.logo_pallas import (
        evaluate_logo_pallas,
        pad_logo_planes,
    )
    from amatsukaze_tpu.ops.logo_ref import LogoEvalRef

    H, W = 1080, 1440  # 1080i broadcast frame
    WP = 1536  # 128-aligned stored width (production keeps this stride)
    LOGO_H, LOGO_W = 96, 256  # realistic logo window
    BATCH = 64

    # logo window params at realistic size
    yy, xx = np.mgrid[0:LOGO_H, 0:LOGO_W]
    r = np.hypot((yy - LOGO_H / 2) / (LOGO_H / 2), (xx - LOGO_W / 2) / (LOGO_W / 2))
    alpha = (np.clip(1.2 - r, 0, 1) * 0.35).astype(np.float32)
    a = (1.0 / (1.0 - alpha)).astype(np.float32)
    b = (-alpha * 200.0 / (1.0 - alpha) / 255.0).astype(np.float32)

    ref = LogoEvalRef(a, b, maskratio=0.1)
    params = LogoEvalParams.from_ref(ref)
    a_full, b_full = pad_logo_planes(a, b, H, W, 0, 0)

    fused = make_fused_filter(H, WP, logical_width=W)

    @jax.jit
    def pipeline(frames_u8, a_p, b_p, fades):
        # logo presence evaluation on the logo window (feeds fade decisions)
        window = frames_u8[:, :LOGO_H, :LOGO_W].astype(jnp.float32)
        deint = logo_ops.batched_deint_y(window)
        scores = evaluate_logo_pallas(
            params, deint, jnp.float32(255.0), jnp.asarray([0.0, 1.0])
        )
        # fused single-pass uint8 kernel: erase + yadif + field-match costs
        out, costs = fused(frames_u8, a_p, b_p, fades, jnp.float32(255.0))
        return out, scores, costs

    rng = np.random.default_rng(0)
    frames = rng.integers(16, 236, (BATCH, H, W), dtype=np.uint8)
    fp, ap, bp = pad_width_for_fused(
        jnp.asarray(frames), jnp.asarray(a_full), jnp.asarray(b_full), WP
    )
    # distinct inputs/fades so no layer can cache identical executions
    inputs = [fp] + [
        jax.device_put(jnp.asarray(
            rng.integers(16, 236, (BATCH, H, WP), dtype=np.uint8)))
        for _ in range(3)
    ]
    fade_sets = [jnp.full((BATCH,), 0.5 + 0.01 * i, jnp.float32) for i in range(64)]

    # warmup / compile
    out = pipeline(inputs[0], ap, bp, fade_sets[0])
    jax.block_until_ready(out)

    # timed: enqueue batches asynchronously (the production pipeline streams
    # batches through a bounded pump), keeping only a small in-flight window
    # (a real consumer drains results; hoarding them would exhaust HBM)
    from collections import deque

    iters = 50
    window = deque(maxlen=3)
    t0 = time.perf_counter()
    for i in range(iters):
        window.append(pipeline(inputs[i % len(inputs)], ap, bp,
                               fade_sets[i % len(fade_sets)]))
    jax.block_until_ready(list(window))
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
