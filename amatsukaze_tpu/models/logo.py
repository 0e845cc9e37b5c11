"""Logo generation (LogoAnalyzer) and matching (LogoFrame) models.

Parity targets:
- generation: LogoAnalyzer's 3-pass flow (ref LogoScan.hpp:794-1080):
  pass 1 collects frames whose border is a single flat colour (AddFrame
  :594-659, med_average :408-422) and accumulates per-pixel (fg, bg)
  regression sums; passes 2-3 re-estimate using only frames where the logo
  is clearly on (fade sweep :955-994, minFade > 0.8), with edge cleanup
  (calcDist + 3x maxfilter :516-563) on the final pass.
- matching: LogoFrame (ref LogoScan.hpp:1521-1836): evaluate every frame x
  logo at fade 0/1, selectLogo by residual score, smooth with
  minmax/moving-average/median windows and emit the logo on/off interval
  file (writeResult :1686-1827).

The per-pixel math runs batched on device (ops.logo); frame acceptance and
interval decisions are host-side and decision-identical to the reference.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..ops import logo as ops
from ..ops import logo_host as lh
from ..ops.logo_ref import LogoEvalRef, med_average
from .lgd import LogoData, LogoHeader, save_lgd

THRESH = 0.2  # |score| below this = indeterminate (ref LogoScan.hpp:1536)

# ---------------------------------------------------------------------------
# backend dispatch: on a slow device link (remote/tunneled TPU) every
# batch round-trip costs seconds — a 300-frame logo scan measured 53
# result fetches x ~2.5 s of pure link wait.  The scene-metrics and KFM
# cost paths already fall back to host twins; the logo generation/match
# math does the same through ops.logo_host.  Forced by
# AMATSUKAZE_LOGO_BACKEND=host|device (defaults to the shared probe).
# ---------------------------------------------------------------------------

_HOST_OPS: bool | None = None


def _use_host_ops() -> bool:
    global _HOST_OPS
    if _HOST_OPS is None:
        forced = os.environ.get("AMATSUKAZE_LOGO_BACKEND")
        if forced == "host":
            _HOST_OPS = True
        elif forced == "device":
            _HOST_OPS = False
        else:
            from ..utils.device import device_link_is_slow

            _HOST_OPS = device_link_is_slow()
    return _HOST_OPS


def _deint_logo(plane: np.ndarray) -> np.ndarray:
    if _use_host_ops():
        return lh.batched_deint_logo_np(plane)
    return np.asarray(ops.batched_deint_logo(jnp.asarray(plane)))


def _make_eval_params(ref):
    if _use_host_ops():
        return lh.host_params_from_ref(ref)
    return ops.LogoEvalParams.from_ref(ref)


def _deint_eval(params, chunk: np.ndarray, fades: np.ndarray) -> np.ndarray:
    """DeintY + EvaluateLogo: frames [B, H, W] x fades [F] -> [B, F].
    One combined step so the device path keeps the intermediate on
    device (single upload + single download per batch)."""
    if _use_host_ops():
        d = lh.batched_deint_y_np(np.asarray(chunk, np.float32))
        return lh.batched_evaluate_logo_np(params, d, 255.0, fades)
    d = ops.batched_deint_y(jnp.asarray(chunk).astype(jnp.float32))
    return np.asarray(ops.batched_evaluate_logo(
        params, d, jnp.float32(255.0), jnp.asarray(fades)))


def _sums_update(frames: np.ndarray, bgs: np.ndarray) -> np.ndarray:
    """One batch of per-pixel regression sums -> [5, H, W] float32."""
    if _use_host_ops():
        zero = np.zeros((5, 1, 1), np.float32)
        return lh.logo_sums_update_np(zero, frames, bgs)
    zero = jnp.zeros((5, 1, 1), jnp.float32)
    return np.asarray(ops.logo_sums_update(
        zero, jnp.asarray(frames), jnp.asarray(bgs)))


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

def border_flat_background(y, u, v, thy: int):
    """AddFrame's border flatness test (ref LogoScan.hpp:594-659).

    Returns (bgY, bgU, bgV) if the frame border is a single flat colour,
    else None. Border = the 1-pixel frame edge of each plane.
    """

    def border(p):
        return np.concatenate([p[0, :], p[-1, :], p[1:-1, 0], p[1:-1, -1]])

    by, bu, bv = border(y), border(u), border(v)
    for vals in (by, bu, bv):
        if int(vals.max()) - int(vals.min()) > thy:
            return None
    return med_average(by.tolist()), med_average(bu.tolist()), med_average(bv.tolist())


def _calc_dist(a, b):
    """Distance of an (A, B) pixel from identity (ref calcDist :430-432)."""
    return (1.0 / 3.0) * (a - 1) * (a - 1) + (a - 1) * b + b * b


def _maxfilter_3x3_plus(d):
    """Two-pass 3-neighbour max (horizontal then vertical), matching the
    reference maxfilter (:434-456) which overwrites work with the vertical
    pass over the original data."""
    w = d.copy()
    w[:, 1:-1] = np.maximum(np.maximum(d[:, :-2], d[:, 1:-1]), d[:, 2:])
    w[1:-1, :] = np.maximum(np.maximum(d[:-2, :], d[1:-1, :]), d[2:, :])
    return w


@dataclass
class ScanRegion:
    x: int
    y: int
    w: int
    h: int


class LogoScanAccumulator:
    """Per-pixel regression sums for Y/U/V (ref LogoScan class :398-659).

    Precision design: the reference accumulates in double (LogoColor).
    Batch sums of 8-bit data are computed on device in float32 - exact for
    batches <= 256 frames (sum of squares stays under 2^24) - and folded into
    host float64 totals, preserving the reference's double-precision
    regression without needing x64 on the TPU.
    """

    MAX_EXACT_BATCH = 256

    def __init__(self, scanw, scanh, log_uv_x=1, log_uv_y=1, thy=12):
        self.scanw, self.scanh = scanw, scanh
        self.log_uv_x, self.log_uv_y = log_uv_x, log_uv_y
        self.thy = thy
        self.nframes = 0
        wuv, huv = scanw >> log_uv_x, scanh >> log_uv_y
        self.sums_y = np.zeros((5, scanh, scanw), np.float64)
        self.sums_u = np.zeros((5, huv, wuv), np.float64)
        self.sums_v = np.zeros((5, huv, wuv), np.float64)

    def add_frames(self, ys, us, vs, bgs):
        """Accumulate a batch of accepted frames. bgs: [(bgY,bgU,bgV)]."""
        bg = np.asarray(bgs, np.float32)
        for i in range(0, len(bgs), self.MAX_EXACT_BATCH):
            sl = slice(i, i + self.MAX_EXACT_BATCH)
            self.sums_y += _sums_update(ys[sl], bg[sl, 0])
            self.sums_u += _sums_update(us[sl], bg[sl, 1])
            self.sums_v += _sums_update(vs[sl], bg[sl, 2])
        self.nframes += len(bgs)

    @staticmethod
    def _solve_ab(sums: np.ndarray, n: int, maxv=255.0):
        """Vectorised GetAB in float64 (ref approxim_line/GetAB :336-396)."""
        s = sums.copy()
        s[0] /= maxv
        s[1] /= maxv
        s[2] /= maxv * maxv
        s[3] /= maxv * maxv
        s[4] /= maxv * maxv
        sum_f, sum_b, sum_f2, sum_b2, sum_fb = s
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = n * sum_f2 - sum_f * sum_f
            a1 = (n * sum_fb - sum_f * sum_b) / t1
            b1 = (sum_f2 * sum_b - sum_f * sum_fb) / t1
            t2 = n * sum_b2 - sum_b * sum_b
            a2 = (n * sum_fb - sum_b * sum_f) / t2
            b2 = (sum_b2 * sum_f - sum_b * sum_fb) / t2
            a = (a1 + 1.0 / a2) / 2.0
            b = (b1 + (-b2 / a2)) / 2.0
        a = a.astype(np.float32)
        b = b.astype(np.float32)
        valid = np.isfinite(a) & np.isfinite(b) & (a != 0)
        return np.array(a), np.array(b), valid

    def get_logo(self, header: LogoHeader, clean: bool) -> LogoData | None:
        """Solve per-pixel least squares; None if any pixel is degenerate
        (ref GetLogo :490-566). Raw 0..255 sums are normalised here, as
        Normalize(255)."""
        n = self.nframes
        if n < 2:
            return None

        ay, by, vy = self._solve_ab(self.sums_y, n)
        au, bu, vu = self._solve_ab(self.sums_u, n)
        av, bv, vv = self._solve_ab(self.sums_v, n)
        if not (vy.all() and vu.all() and vv.all()):
            return None

        if clean:
            # edge cleanup (ref :516-563): zero out pixels whose distance from
            # identity stays small after 3x max-filtering
            yy, xx = np.mgrid[0 : self.scanh, 0 : self.scanw]
            uvy, uvx = yy >> self.log_uv_y, xx >> self.log_uv_x
            dist = (
                _calc_dist(ay, by)
                + _calc_dist(au[uvy, uvx], bu[uvy, uvx])
                + _calc_dist(av[uvy, uvx], bv[uvy, uvx])
            ) * 1000.0
            for _ in range(3):
                dist = _maxfilter_3x3_plus(dist)
            weak = dist < 0.3
            ay[weak] = 1.0
            by[weak] = 0.0
            weak_uv = np.zeros_like(au, bool)
            weak_uv[uvy[weak], uvx[weak]] = True
            for p, q in ((au, bu), (av, bv)):
                p[weak_uv] = 1.0
                q[weak_uv] = 0.0

        logo = LogoData(
            header=header,
            a_y=ay.astype(np.float32), b_y=by.astype(np.float32),
            a_u=au.astype(np.float32), b_u=bu.astype(np.float32),
            a_v=av.astype(np.float32), b_v=bv.astype(np.float32),
        )
        return logo


class LogoAnalyzer:
    """3-pass logo generation from a frame source (ref :794-1080)."""

    NUM_FADE = 20

    def __init__(self, ctx, region: ScanRegion, thy=12, num_max_frames=10000,
                 log_uv_x=1, log_uv_y=1, batch=64, progress_cb=None):
        self.ctx = ctx
        self.region = region
        self.thy = thy
        self.num_max_frames = num_max_frames
        self.log_uv_x, self.log_uv_y = log_uv_x, log_uv_y
        self.batch = batch
        self.progress_cb = progress_cb or (lambda *a: True)
        # accepted frame store (replaces the UtVideo workfile)
        self.frames_y: list[np.ndarray] = []
        self.frames_u: list[np.ndarray] = []
        self.frames_v: list[np.ndarray] = []
        self.logodata: LogoData | None = None

    def _header(self, imgw, imgh, name="No Name", service_id=-1):
        r = self.region
        return LogoHeader(r.w, r.h, self.log_uv_x, self.log_uv_y,
                          imgw, imgh, r.x, r.y, name, service_id)

    def scan(self, frame_iter, imgw, imgh, name="No Name", service_id=-1) -> LogoData:
        """frame_iter yields (Y, U, V) full planes (uint8 numpy)."""
        header = self._header(imgw, imgh, name, service_id)
        self._initial_pass(frame_iter, header)
        self._remake(header, final=False)
        self._remake(header, final=True)
        return self.logodata

    # -- pass 1 -------------------------------------------------------------
    def _initial_pass(self, frame_iter, header) -> None:
        r = self.region
        acc = LogoScanAccumulator(r.w, r.h, self.log_uv_x, self.log_uv_y, self.thy)
        pend_y, pend_u, pend_v, pend_bg = [], [], [], []
        for n, (y, u, v) in enumerate(frame_iter):
            if len(self.frames_y) >= self.num_max_frames:
                break
            sy = y[r.y : r.y + r.h, r.x : r.x + r.w]
            su = u[r.y >> self.log_uv_y : (r.y + r.h) >> self.log_uv_y,
                   r.x >> self.log_uv_x : (r.x + r.w) >> self.log_uv_x]
            sv = v[r.y >> self.log_uv_y : (r.y + r.h) >> self.log_uv_y,
                   r.x >> self.log_uv_x : (r.x + r.w) >> self.log_uv_x]
            bg = border_flat_background(sy, su, sv, self.thy)
            if bg is None:
                continue
            self.frames_y.append(sy.copy())
            self.frames_u.append(su.copy())
            self.frames_v.append(sv.copy())
            pend_y.append(sy.astype(np.float32))
            pend_u.append(su.astype(np.float32))
            pend_v.append(sv.astype(np.float32))
            pend_bg.append(bg)
            if len(pend_y) >= self.batch:
                acc.add_frames(np.stack(pend_y), np.stack(pend_u),
                               np.stack(pend_v), pend_bg)
                pend_y, pend_u, pend_v, pend_bg = [], [], [], []
                if self.progress_cb("scan", len(self.frames_y), n + 1) is False:
                    break
        if pend_y:
            acc.add_frames(np.stack(pend_y), np.stack(pend_u),
                           np.stack(pend_v), pend_bg)
        self.logodata = acc.get_logo(header, clean=False)
        if self.logodata is None:
            raise RuntimeError("insufficient logo frames")

    # -- passes 2-3 -----------------------------------------------------------
    def _remake(self, header, final: bool) -> None:
        self.progress_cb("refine-final" if final else "refine",
                         len(self.frames_y), len(self.frames_y))
        # deinterlace the current logo estimate + build the eval mask
        deint_a = _deint_logo(self.logodata.a_y)
        deint_b = _deint_logo(self.logodata.b_y)
        ref = LogoEvalRef(deint_a, deint_b, maskratio=0.1)
        params = _make_eval_params(ref)
        fades = np.arange(self.NUM_FADE, dtype=np.float32) * 0.1

        n = len(self.frames_y)
        min_fades = np.empty(n, np.int32)
        for i in range(0, n, self.batch):
            chunk = np.stack(
                [f.astype(np.float32) for f in self.frames_y[i : i + self.batch]]
            )
            scores = np.abs(_deint_eval(params, chunk, fades))
            min_fades[i : i + len(chunk)] = scores.argmin(axis=1)

        # re-accumulate with clearly-logo-on frames only (minFade > 8/20)
        r = self.region
        acc = LogoScanAccumulator(r.w, r.h, self.log_uv_x, self.log_uv_y, self.thy)
        sel = [i for i in range(n) if min_fades[i] > 8]
        for i in range(0, len(sel), self.batch):
            idxs = sel[i : i + self.batch]
            ys = np.stack([self.frames_y[j].astype(np.float32) for j in idxs])
            us = np.stack([self.frames_u[j].astype(np.float32) for j in idxs])
            vs = np.stack([self.frames_v[j].astype(np.float32) for j in idxs])
            bgs = []
            for j in idxs:
                bg = border_flat_background(
                    self.frames_y[j], self.frames_u[j], self.frames_v[j], self.thy
                )
                bgs.append(bg if bg else (0, 128, 128))
            acc.add_frames(ys, us, vs, bgs)
        new_logo = acc.get_logo(header, clean=final)
        if new_logo is None:
            raise RuntimeError("insufficient logo frames in refinement")
        self.logodata = new_logo

    def save(self, path: str) -> None:
        save_lgd(path, self.logodata)


# ---------------------------------------------------------------------------
# matching
# ---------------------------------------------------------------------------

@dataclass
class LogoInterval:
    """One logo-on interval (a `S`/`E` pair in the logoframe file)."""

    s_best: int
    s_start: int
    s_end: int
    e_best: int
    e_start: int
    e_end: int


class LogoFrameMatcher:
    """Evaluate frames against candidate logos + emit on/off intervals
    (ref LogoFrame :1521-1836)."""

    def __init__(self, ctx, logos: list[LogoData], maskratio=0.1):
        self.ctx = ctx
        self.logos = logos
        self.params = []
        for lg in logos:
            da = _deint_logo(lg.a_y)
            db = _deint_logo(lg.b_y)
            ref = LogoEvalRef(da, db, maskratio=maskratio)
            self.params.append(_make_eval_params(ref))
        self.eval_results: np.ndarray | None = None  # [N, nlogos, 2]
        self.num_frames = 0
        self.fps = 30
        self.best_logo = -1
        self.logo_ratio = 0.0

    def scan_frames(self, frames_iter, width, height, fps, batch=32,
                    fade_steps: int = 2):
        """frames_iter yields full Y planes (uint8). Evaluates every frame
        against every valid logo at `fade_steps` fade levels spanning [0, 1]
        (2 = the matcher's on/off pair; 11 = the reference's AMTAnalyzeLogo
        sweep used to derive per-frame erase fades)."""
        self.fps = int(round(fps))
        self.fade_steps = fade_steps
        fades = np.linspace(0.0, 1.0, fade_steps).astype(np.float32)
        results = []
        pend = []

        def flush():
            if not pend:
                return
            from ..utils.batching import pad_tail

            # pad the tail to the steady batch shape: the eval kernels
            # then compile for exactly one shape per logo size
            batch_np, n_real = pad_tail(pend, batch)
            out = np.empty((n_real, len(self.logos), fade_steps),
                           np.float32)
            for li, (lg, params) in enumerate(zip(self.logos, self.params)):
                h = lg.header
                if h.imgw != width or h.imgh != height:
                    out[:, li, :] = 0.0
                    out[:, li, -1] = -1.0
                    continue
                window = batch_np[:, h.imgy : h.imgy + h.h, h.imgx : h.imgx + h.w]
                out[:, li] = _deint_eval(params, window, fades)[:n_real]
            results.append(out)
            pend.clear()

        for y in frames_iter:
            pend.append(y)
            if len(pend) >= batch:
                flush()
        flush()
        self.eval_results = (
            np.concatenate(results)
            if results
            else np.empty((0, len(self.logos), fade_steps), np.float32)
        )
        self.num_frames = len(self.eval_results)

    def select_logo(self, num_candidates: int = -1) -> int:
        """Pick the best logo by erase-residual score (ref :1647-1682)."""
        if num_candidates < 0:
            num_candidates = len(self.logos)
        r = self.eval_results[:, :num_candidates]
        detected = (r[:, :, 0] > THRESH) & (np.abs(r[:, :, -1]) < THRESH)
        num = detected.sum(axis=0)
        cost = np.where(detected, np.abs(r[:, :, -1]), 0.0).sum(axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = np.where(
                num == 0, np.inf, (cost / num) * (self.num_frames / num)
            )
        self.best_logo = int(np.argmin(score))
        self.logo_ratio = float(num[self.best_logo]) / max(self.num_frames, 1)
        return self.best_logo

    def intervals(self, logo_index: int = -1) -> list[LogoInterval]:
        """Smooth the raw scores and extract on/off intervals
        (ref writeResult :1686-1827)."""
        if logo_index < 0:
            if self.best_logo < 0:
                self.select_logo()
            logo_index = self.best_logo

        thresh_l = 0.5
        avg_dur, median_dur = 1.0, 0.5
        half_avg = int(self.fps * avg_dur / 2 + 0.5)
        ave_frames = half_avg * 2 + 1
        half_med = int(self.fps * median_dur / 2 + 0.5)
        win = max(ave_frames, half_med * 2 + 1)
        half_win = win // 2
        n = self.num_frames

        r = self.eval_results[:, logo_index]
        raw = np.maximum(0.0, r[:, 0]) + np.minimum(0.0, r[:, -1])
        padded = np.concatenate(
            [np.full(half_win, raw[0] if n else 0.0), raw,
             np.full(win - half_win, raw[-1] if n else 0.0)]
        )
        off = half_win  # padded[off + i] == raw[i]

        result = np.empty(n, np.int32)
        score = np.empty(n, np.float32)
        for i in range(n):
            c = off + i
            before_max = padded[c - half_avg : c].max()
            after_max = padded[c + 1 : c + 1 + half_avg].max()
            minmax = min(before_max, after_max)
            mm_res = 1 if abs(minmax) < thresh_l else (0 if minmax < 0 else 2)
            avg = padded[c - half_avg : c + half_avg + 1].mean()
            avg_res = 1 if abs(avg) < THRESH else (0 if avg < 0 else 2)
            result[i] = 1 if mm_res != avg_res else mm_res
            score[i] = np.median(padded[c - half_med : c + half_med + 1])

        # fill indeterminate runs whose both sides agree (ref :1754-1767)
        i = 0
        while i < n:
            if result[i] != 1:
                i += 1
                continue
            j = i
            while j < n and result[j] == 1:
                j += 1
            prev_res = result[i - 1] if i > 0 else 0
            next_res = result[j] if j < n else 0
            if prev_res == next_res:
                result[i:j] = prev_res
            i = j

        # extract intervals with score-based refinement (ref :1770-1822)
        out: list[LogoInterval] = []
        it = 0
        while it < n:
            s_end_ = _find(result, it, n, lambda v: v == 2)
            e_end_ = _find(result, s_end_, n, lambda v: v == 0)
            s_end, e_end = s_end_, e_end_
            if s_end < n:
                if score[s_end] >= THRESH:
                    k = s_end
                    while k > it and score[k - 1] >= THRESH:
                        k -= 1
                    s_end = k
                else:
                    s_end = _find_score(score, s_end, n, lambda v: v >= THRESH)
            if e_end < n:
                if score[e_end] <= -THRESH:
                    k = e_end
                    while k > s_end and score[k - 1] <= -THRESH:
                        k -= 1
                    e_end = k
                else:
                    e_end = _find_score(score, e_end, n, lambda v: v <= -THRESH)
            s_start = s_end
            while s_start > it and not score[s_start - 1] <= -THRESH:
                s_start -= 1
            e_start = e_end
            while e_start > s_end and not score[e_start - 1] >= THRESH:
                e_start -= 1
            s_best = _find_score(score, s_start, s_end, lambda v: v > 0)
            e_best = e_end
            while e_best > e_start and not score[e_best - 1] > 0:
                e_best -= 1
            if s_end != e_end:
                out.append(
                    LogoInterval(
                        s_best=min(s_best, n - 1), s_start=s_start, s_end=s_end,
                        e_best=e_best - 1, e_start=e_start - 1, e_end=e_end - 1,
                    )
                )
            it = e_end_
            if e_end_ <= it - 1:
                break
        return out

    def fade_curve(self, logo_index: int = -1, window: int = 4) -> np.ndarray:
        """Per-frame erase fade in [0, 1]: the fade step whose erase residual
        is smallest, box-smoothed over +-window frames (the reference's
        CalcFade2, LogoScan.hpp:1263-1341, on the AMTAnalyzeLogo fade sweep).
        Needs scan_frames(fade_steps > 2) for meaningful intermediate fades."""
        if logo_index < 0:
            if self.best_logo < 0:
                self.select_logo()
            logo_index = self.best_logo
        r = self.eval_results[:, logo_index]  # [N, F]
        nf = r.shape[1]
        if len(r) == 0:
            return np.zeros(0, np.float32)
        fade = np.argmin(np.abs(r), axis=1).astype(np.float32) / max(nf - 1, 1)
        if window > 0 and len(fade) > 1:
            kernel = np.ones(2 * window + 1) / (2 * window + 1)
            fade = np.convolve(np.pad(fade, window, mode="edge"), kernel,
                               mode="valid")
        return np.clip(fade.astype(np.float32), 0.0, 1.0)

    def write_result(self, path: str, logo_index: int = -1) -> None:
        """logoframe file format consumed by join_logo_scp."""
        lines = []
        for iv in self.intervals(logo_index):
            lines.append(f"{iv.s_best:6d} S 0 ALL {iv.s_start:6d} {iv.s_end:6d}")
            lines.append(f"{iv.e_best:6d} E 0 ALL {iv.e_start:6d} {iv.e_end:6d}")
        with open(path, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))


def _find(arr, start, end, pred) -> int:
    for i in range(start, end):
        if pred(arr[i]):
            return i
    return end


def _find_score(arr, start, end, pred) -> int:
    for i in range(start, end):
        if pred(arr[i]):
            return i
    return end
