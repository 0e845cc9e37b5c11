"""Benchmark: filtered 1080i frames/sec/chip through the flagship device
pipeline — logo evaluation (Pallas), logo erase (XLA pass), and the fused
yadif + field-match kernel (Pallas) from ops.fused_filter.

Methodology: N pipeline iterations are chained DEVICE-SIDE inside one
lax.fori_loop and reduced to a checksum, so one dispatch + one host fetch
covers N batches; throughput comes from the (N_hi - N_lo) slope, which
cancels dispatch/fetch latency. Async-enqueue timing through the device
tunnel was unreliable: dropping result buffers let the runtime cancel
queued work, inflating fps by >50x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 2000 filtered 1080i fps/chip (BASELINE.json north star).
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from amatsukaze_tpu.ops import logo as logo_ops
    from amatsukaze_tpu.ops.fused_filter import (
        make_fused_filter_field,
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

    # field-plane-layout kernel: XLA splits frames into field planes
    # outside the kernel (near-bandwidth transpose) instead of paying
    # ~20% of kernel time on in-kernel sublane shuffles
    fused_yc = make_fused_filter_field(H, WP, logical_width=W)

    aw = jnp.asarray(a)
    bw = jnp.asarray(b)

    def one_batch(p, frames_u8, a_p, b_p, fades):
        # logo presence evaluation on the logo window (feeds fade decisions).
        # params must be ARGUMENTS: closing over them lets XLA constant-fold
        # the tables into multi-MB HLO literals (degrades the device runtime)
        window = frames_u8[:, :LOGO_H, :LOGO_W].astype(jnp.float32)
        deint = logo_ops.batched_deint_y(window)
        scores = evaluate_logo_pallas(
            p, deint, jnp.float32(255.0), jnp.asarray([0.0, 1.0])
        )
        # erase only the logo window (outside it a==1, b==0 -> identity;
        # clip(floor(x+0.5)) on integers is the identity, so this is
        # bit-identical to the full-frame erase pass at ~1/90 the work)
        fade = fades[:, None, None]
        bg = aw * window + bw * 255.0
        erased_w = jnp.clip(jnp.floor(fade * bg + (1.0 - fade) * window
                                      + 0.5), 0.0, 255.0).astype(jnp.uint8)
        erased = jax.lax.dynamic_update_slice(frames_u8, erased_w, (0, 0, 0))
        # fused yadif/field-match kernel
        out, costs = fused_yc(erased, jnp.float32(255.0))
        return (jnp.sum(costs) + jnp.sum(scores)
                + out[0, 0, 0].astype(jnp.float32)
                + out[-1, -1, -1].astype(jnp.float32))

    @partial(jax.jit, static_argnames=("iters",))
    def chained(p, stacked, a_p, b_p, fades, iters):
        def body(i, acc):
            f = jax.lax.dynamic_index_in_dim(stacked, i % 4, 0, keepdims=False)
            fd = fades + 0.001 * i.astype(jnp.float32)  # nothing hoistable
            return acc + one_batch(p, f, a_p, b_p, fd)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    frames = rng.integers(16, 236, (BATCH, H, W), dtype=np.uint8)
    fp, ap, bp = pad_width_for_fused(
        jnp.asarray(frames), jnp.asarray(a_full), jnp.asarray(b_full), WP
    )
    stacked = jnp.stack([fp] + [
        jnp.asarray(rng.integers(16, 236, (BATCH, H, WP), dtype=np.uint8))
        for _ in range(3)
    ])
    fades = jnp.full((BATCH,), 0.5, jnp.float32)

    times = {}
    for iters in (1, 41):
        float(chained(params, stacked, ap, bp, fades, iters))  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(params, stacked, ap, bp, fades, iters))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best

    per_batch = (times[41] - times[1]) / 40
    fps = BATCH / per_batch
    baseline = 2000.0
    print(json.dumps({
        "metric": "filtered_1080i_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
