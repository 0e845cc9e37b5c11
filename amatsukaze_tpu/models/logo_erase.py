"""Per-frame logo erasure over decoded YUV batches.

Parity: AMTEraseLogo (Amatsukaze/LogoScan.hpp:1248-1397): subtract each
logo with its per-frame fade (`dst = fade*(A*src + B*maxv) + (1-fade)*src`)
on all three planes. The fade curve comes from LogoFrameMatcher.fade_curve
(the CalcFade2 analog); logos listed via --erase-logo are removed at fade 1
unconditionally (ref TranscodeSetting's eraseLogoPath)."""

from __future__ import annotations

import numpy as np

from .lgd import LogoData


class LogoEraser:
    """entries: list of (LogoData, fades) where fades is a per-frame [N]
    float array or None (= erase at fade 1.0 everywhere)."""

    def __init__(self, ctx, entries, width: int, height: int):
        import jax.numpy as jnp

        from ..ops.logo_pallas import pad_logo_planes

        self.ctx = ctx
        self.width = width
        self.height = height
        self.planes = []  # per logo: dict plane -> (a_full, b_full)
        self.fades = []
        for logo, fades in entries:
            h = logo.header
            if h.imgw != width or h.imgh != height:
                ctx.warn("logo %s is for %dx%d, not %dx%d — skipped",
                         h.name, h.imgw, h.imgh, width, height)
                continue
            sx, sy = h.log_uv_x, h.log_uv_y
            py = pad_logo_planes(logo.a_y, logo.b_y, height, width,
                                 h.imgx, h.imgy)
            pu = pad_logo_planes(logo.a_u, logo.b_u, height >> sy,
                                 width >> sx, h.imgx >> sx, h.imgy >> sy)
            pv = pad_logo_planes(logo.a_v, logo.b_v, height >> sy,
                                 width >> sx, h.imgx >> sx, h.imgy >> sy)
            self.planes.append({
                "y": tuple(jnp.asarray(p) for p in py),
                "u": tuple(jnp.asarray(p) for p in pu),
                "v": tuple(jnp.asarray(p) for p in pv),
            })
            self.fades.append(None if fades is None
                              else np.asarray(fades, np.float32))

    def __bool__(self) -> bool:
        return bool(self.planes)

    def erase_batch(self, ys, us, vs, start: int):
        """Erase all logos from a batch of frames. ys/us/vs: [B, h, w]
        numpy arrays (uint8 or float); `start` is the batch's first
        filter-frame index (selects the fade slice). Returns uint8 arrays."""
        import jax.numpy as jnp

        from ..ops.logo_pallas import delogo_full_frame

        b = len(ys)

        def up(planes):
            # transfer at the source dtype (uint8 is 4x less PCIe/tunnel
            # traffic) and widen on device
            arr = np.asarray(planes)
            if arr.dtype != np.uint8:
                return jnp.asarray(arr.astype(np.float32))
            return jnp.asarray(arr).astype(jnp.float32)

        y = up(ys)
        u = up(us)
        v = up(vs)
        for planes, fades in zip(self.planes, self.fades):
            if fades is None:
                fd = jnp.ones((b,), jnp.float32)
            else:
                idx = np.clip(np.arange(start, start + b), 0,
                              max(len(fades) - 1, 0))
                fd = jnp.asarray(fades[idx] if len(fades) else
                                 np.zeros(b, np.float32))
            y = delogo_full_frame(y, *planes["y"], jnp.float32(255.0), fd)
            u = delogo_full_frame(u, *planes["u"], jnp.float32(255.0), fd)
            v = delogo_full_frame(v, *planes["v"], jnp.float32(255.0), fd)
        # erase output is integer-valued: cast on device, download uint8
        return (np.asarray(y.astype(jnp.uint8)),
                np.asarray(u.astype(jnp.uint8)),
                np.asarray(v.astype(jnp.uint8)))

    def erase_iter(self, frames_iter, batch: int = 32):
        """Wrap a (Y, U, V) frame iterator with batched erasure. Tail
        batches are padded to the steady shape (repeat-last) so the
        device op compiles exactly once; padded outputs are dropped."""
        from ..utils.batching import pad_tail

        buf = []
        start = 0

        def flush():
            nonlocal start
            if not buf:
                return []
            n = len(buf)
            ys, us, vs = zip(*buf)
            py, _ = pad_tail(list(ys), batch)
            pu, _ = pad_tail(list(us), batch)
            pv, _ = pad_tail(list(vs), batch)
            ey, eu, ev = self.erase_batch(py, pu, pv, start)
            start += n
            out = list(zip(ey[:n], eu[:n], ev[:n]))
            buf.clear()
            return out

        from .filter_graph import normalize_u8

        for planes in frames_iter:
            # logo parameters are 8-bit domain: normalise 10-bit/float
            # decoder output the same way the analysis feeds do
            buf.append(tuple(normalize_u8(p) for p in planes))
            if len(buf) >= batch:
                yield from flush()
        yield from flush()
