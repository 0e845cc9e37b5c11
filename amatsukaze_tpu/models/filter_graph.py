"""Per-output-file filter source: multi-pass analysis + device filter chain.

Parity: AMTFilterSource (Amatsukaze/FilteredSource.hpp:136-635). The
reference builds an AviSynth script (AMTSource + logo erase + Trim + the
user's KFM/QTGMC chain) and loops passes while the script sets AMT_PRE_PROC;
here the filter graph is a declarative device pipeline:

  pass 1 (analysis): batched telecine metrics (ops.deint) over the whole
          sequence -> per-cycle pattern costs           [KFM pass 1]
  pass 2 (decision): KFMDecider -> cycle modes + VFR plan (models.kfm)
                                                        [KFM pass 2]
  pass 3 (output):   per-batch frame synthesis (weave / pulldown repair /
          bob via ops.deint) + logo erase + optional post chain
          (ops.denoise)                                 [KFM pass 3]

It also produces the duration/timecode files for AMTDecimate-compatible
tooling, converts CM zones into output-frame encoder zones (MakeZones
:546-616) and derives the encoder input format (MakeOutFormat :618-634).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field

import numpy as np

from ..types import VideoFormat
from .cm_analyze import EncoderZone
from .kfm import CycleMode, KFMDecider, VFRPlan, build_vfr_plan, plan_is_cfr
from .vfr import infer_vfr_timing_fps


class DeferredBatch:
    """A filter-output batch still resident on device (possibly padded):
    lets the caller overlap this batch's download with the next batch's
    compute (JAX dispatch is async; np.asarray is the blocking fetch)."""

    def __init__(self, dev, n_valid: int):
        self.dev = dev
        self.n = n_valid

    def __len__(self) -> int:
        return self.n

    def materialize(self) -> np.ndarray:
        return np.asarray(self.dev)[: self.n]


@dataclass
class FilterOutput:
    out_format: VideoFormat = None
    num_out_frames: int = 0
    time_codes: list = field(default_factory=list)  # ms, empty = CFR
    vfr_timing_fps: int = 60
    durations: list = field(default_factory=list)
    out_zones: list = field(default_factory=list)


class FilterGraph:
    """Deinterlace mode selection mirroring the reference's GUI matrix
    (EncodeServerData.cs:106-119 DeinterlaceAlgorithm x FilterFPS;
    Server/Misc.cs:1290-1389 builds the corresponding KFMDeint/Yadif/
    AutoVfr script chains):

    - none / yadif (CFR30) / yadif60 (CFR60, Yadifmod2 mode=1)
    - qtgmc: motion-adaptive double-rate 60p bob (KFMDeint mode=1)
    - kfm_vfr: KFM VFR with 60p fallback (mode=4, thswitch=3)
    - kfm_vfr30: KFM VFR without the 60p fallback (thswitch=-1)
    - kfm_cfr24: decimate everything to 24p (KFMDeint mode=2)
    - svp: 24p reconstruction + MC interpolation to smooth 60p
      (svp=true in the KFMDeint chain -> SVPflow)
    - autovfr: section-parallel VFR analysis with Its-style def/timecode
      file contracts (the AutoVfr.exe flow, Misc.cs:1346-1389)
    """

    MODE_NONE = "none"
    MODE_YADIF = "yadif"
    MODE_YADIF60 = "yadif60"
    MODE_QTGMC = "qtgmc"  # motion-adaptive double-rate (60p) bob
    MODE_KFM_VFR = "kfm_vfr"
    MODE_KFM_VFR30 = "kfm_vfr30"
    MODE_KFM_CFR24 = "kfm_cfr24"
    MODE_SVP = "svp"
    MODE_AUTOVFR = "autovfr"

    # modes that run the KFM telecine analysis passes + plan synthesis
    KFM_FAMILY = frozenset({MODE_KFM_VFR, MODE_KFM_VFR30, MODE_KFM_CFR24,
                            MODE_SVP, MODE_AUTOVFR})
    ALL_MODES = (MODE_NONE, MODE_YADIF, MODE_YADIF60, MODE_QTGMC,
                 MODE_KFM_VFR, MODE_KFM_VFR30, MODE_KFM_CFR24, MODE_SVP,
                 MODE_AUTOVFR)

    def __init__(self, ctx, mode: str = "none", batch: int = 32,
                 post_chain=None, qp_source=None):
        self.ctx = ctx
        self.mode = mode
        self.batch = batch
        self.post_chain = post_chain  # callable [B,H,W]->[B,H,W] or None
        # ts.qp_extract.QpMapSource in the output-frame selection order
        # (feeds the deblock post filter, like the reference's qp-table
        # frame props from the patched decoder)
        self.qp_source = qp_source
        # when the consumer rounds the output to uint8 anyway (the y4m
        # pump), rounding on device and downloading uint8 is identical
        # math at 4x less host-link traffic
        self.quantize_output = False
        # when True, run_pass3/run_kfm_batch return DeferredBatch objects
        # (device-resident) instead of np arrays, so the encode pump can
        # overlap batch k's download with batch k+1's device compute
        self.defer_download = False
        # None = decide from the link probe on first use: through a
        # remote/tunneled device every batch round costs seconds, so the
        # KFM synthesis/costs run on their decision-identical numpy twins
        # (same pattern as the scene-metrics host twin). Forced by
        # AMATSUKAZE_FILTER_BACKEND=host|device.
        self._host_backend: bool | None = None
        # output resize (the reference's EnableResize -> BlackmanResize
        # stage, Misc.cs:1411-1414): (width, height) of the luma plane,
        # applied after the post chain in float (lanczos3)
        self.resize: tuple | None = None
        # source sample bit depth. 8 for 2K broadcast; 10 for Main10
        # sources running the post-chain-only path (mode "none"): the
        # 14-bit internal domain then scales from/to 10 bits and the
        # output quantizes to uint16 (the reference's ConvertBits chain
        # at source depth, Misc.cs:1403-1441)
        self.src_bits = 8
        # KFM dirty-field (UCF) replacement toggle (ref KfmEnableUcf)
        self.kfm_ucf = True
        self.decisions = None
        self.vfr_plan: VFRPlan | None = None
        # SVP interpolation carry: plane -> (last film frame on device,
        # its source index) so pairs bridge device batches
        self._svp_carry: dict = {}
        # multi-chip: a jax.sharding.Mesh makes every device path run
        # sharded over the frame axis (parallel/sharded_filter) — the
        # production multi-chip mode (--devices N)
        self.mesh = None
        self._mesh_backend = None

    def set_mesh(self, mesh_or_ndevices) -> None:
        """Run the filter pass sharded over a device mesh (the production
        multi-chip path). Accepts a jax.sharding.Mesh or a device count
        (mesh over jax.devices()[:n]). Disables the slow-link host twin:
        a mesh implies co-located devices."""
        from ..parallel.sharded_filter import ShardedFilterBackend

        mesh = mesh_or_ndevices
        if isinstance(mesh_or_ndevices, int):
            import jax

            from ..parallel.mesh import make_mesh

            n = mesh_or_ndevices
            devs = jax.devices()
            if len(devs) < n:
                raise RuntimeError(
                    f"--devices {n}: only {len(devs)} devices visible")
            mesh = make_mesh(devs[:n])
        self.mesh = mesh
        self._mesh_backend = ShardedFilterBackend(mesh)
        self._host_backend = False

    def prefers_host(self) -> bool:
        """True when run_kfm_batch will take the numpy host-twin branch
        (slow device link, no post chain / mesh / SVP).  Callers use it
        to skip device-only batch padding: repeating tail frames exists
        to keep ONE XLA executable per geometry, which the host path
        neither needs nor benefits from (each np.repeat of a 64-frame
        1080 batch costs ~55 ms)."""
        return (self.mode != self.MODE_SVP and self._mesh_backend is None
                and self.post_chain is None and self._use_host_twin())

    def _use_host_twin(self) -> bool:
        if self._mesh_backend is not None:
            return False
        if self._host_backend is None:
            from ..utils.device import device_link_is_slow

            self._host_backend = device_link_is_slow()
            if self._host_backend:
                self.ctx.info("[filter] slow device link: using the host "
                              "twin for KFM costs/synthesis")
        return self._host_backend

    def _apply_resize(self, out_j, plane: int):
        """Lanczos3 resize of a [B, h, w] plane batch to the configured
        output size (chroma planes get half dimensions)."""
        if self.resize is None:
            return out_j
        import jax
        import jax.numpy as jnp

        w2, h2 = self.resize
        if plane != 0:
            w2, h2 = w2 // 2, h2 // 2
        return jax.image.resize(out_j.astype(jnp.float32),
                                (out_j.shape[0], h2, w2),
                                method="lanczos3")

    def _download(self, out_dev, n_valid: int | None = None):
        import jax.numpy as jnp

        q = out_dev
        if self.quantize_output:
            mx = (1 << self.src_bits) - 1
            dt = jnp.uint16 if self.src_bits > 8 else jnp.uint8
            q = jnp.clip(jnp.floor(out_dev.astype(jnp.float32) + 0.5),
                         0, mx).astype(dt)
        n = len(out_dev) if n_valid is None else n_valid
        if self.defer_download:
            return DeferredBatch(q, n)
        return np.asarray(q)[:n]

    def _apply_post(self, out_j, src_indices, plane_h: int):
        """Run the post chain; slices per-output-frame QP maps when the
        chain wants them (deblock) and a source is attached."""
        if getattr(self.post_chain, "wants_qp", False) \
                and self.qp_source is not None:
            qp = self.qp_source.maps_for(src_indices)
            if qp is not None:
                mbh = qp.shape[1]
                scale = 2 if plane_h > mbh * 12 else 1  # luma vs 4:2:0 chroma
                return self.post_chain(out_j, qp=qp, qp_block_scale=scale,
                                       src_bits=self.src_bits)
        return self.post_chain(out_j, src_bits=self.src_bits)

    def debug_dump(self, num_frames: int) -> dict:
        """JSON-able description of the configured graph and its analysis
        decisions (the reference's --dump-filter AviSynth graph analog)."""
        out = {
            "mode": self.mode,
            "batch": self.batch,
            "num_source_frames": num_frames,
            "post_chain": bool(self.post_chain),
            "post_chain_wants_qp": bool(
                getattr(self.post_chain, "wants_qp", False)),
            "qp_source_frames": (len(self.qp_source.results)
                                 if self.qp_source is not None else 0),
        }
        if self.decisions is not None:
            modes = [int(d.mode) for d in self.decisions]
            out["kfm_cycles"] = len(modes)
            out["kfm_mode_histogram"] = {
                str(m): modes.count(m) for m in sorted(set(modes))}
            out["kfm_decisions"] = [
                {"mode": int(d.mode), "phase": int(d.phase)}
                for d in self.decisions[:2000]]
        if self.vfr_plan is not None:
            out["vfr_out_frames"] = len(self.vfr_plan.durations)
            out["vfr_duration_histogram"] = {
                str(d): self.vfr_plan.durations.count(d)
                for d in sorted(set(self.vfr_plan.durations))}
        return out

    def _make_decider(self) -> KFMDecider:
        decider = KFMDecider()
        if self.mode == self.MODE_KFM_VFR30:
            decider.allow_60 = False  # thswitch=-1 (Misc.cs:1320)
        if self.mode in (self.MODE_KFM_CFR24, self.MODE_SVP):
            decider.force_film = True  # KFMDeint mode=2 (Misc.cs:1315)
        return decider

    def _finish_analysis(self, all_costs,
                         num_frames: int) -> None:
        from ..ops import deint as deint_ops

        # per-batch results may still be device buffers (the analysis
        # loop enqueues without blocking; remote/tunneled devices pay
        # the round-trip cost once, here, instead of per batch)
        all_costs = np.asarray(all_costs)
        if len(all_costs) < 5:
            self.mode = self.MODE_NONE
            return
        # pad the trailing partial cycle with its last row so every source
        # frame gets a cycle decision (dropping the tail would desync audio)
        pad = (-len(all_costs)) % 5
        if pad:
            all_costs = np.concatenate(
                [all_costs, np.repeat(all_costs[-1:], pad, axis=0)]
            )
        # the cost table is tiny and already fetched: aggregate on the
        # host (a device round here would cost more than the math, and
        # on a wedged tunneled link it hangs the pipeline)
        pattern = deint_ops.telecine_pattern_costs_host(all_costs)
        self.frame_costs = all_costs
        self.decisions = self._make_decider().decide(pattern)
        plan_frames = num_frames
        if self.mode in (self.MODE_KFM_CFR24, self.MODE_SVP):
            # strict CFR output: the trailing partial cycle (<=4 frames,
            # <0.2 s at the very end of the section) is dropped rather
            # than emitted at a different rate
            plan_frames = num_frames - (num_frames % 5)
        self.vfr_plan = build_vfr_plan(
            self.decisions, plan_frames,
            frame_costs=all_costs if self.kfm_ucf else None)

    # -- pass 1 + 2: analysis over the full sequence ---------------------------
    def analyze(self, frame_iter, num_frames: int) -> None:
        """Stream the sequence once, collecting per-cycle pattern costs
        (the KFM pass-1/2 analog). Used by every KFM-family mode."""
        if self.mode not in self.KFM_FAMILY:
            return
        costs = []
        carry = None  # last frame of the previous batch for cross-batch match
        for chunk in _batched(frame_iter, self.batch):
            # ship at source dtype (uint8 = 4x less transfer), widen on
            # device; frames here are integer-valued decoder output
            arr = normalize_u8(np.stack(chunk))
            arr_in = (np.concatenate([carry[None], arr])
                      if carry is not None else arr)
            c = self._device_costs(arr_in)
            costs.append(c[1:] if carry is not None else c)
            carry = arr[-1]
        if not costs:
            return
        if isinstance(costs[0], np.ndarray):
            merged = np.concatenate(costs)  # host-twin path
        else:
            # costs are still device buffers: concatenate ON DEVICE and
            # fetch once — a tunneled/remote device pays one round trip
            # for the whole pass instead of one per batch
            import jax.numpy as jnp

            merged = np.asarray(jnp.concatenate(costs))
        self._finish_analysis(merged[:num_frames], num_frames)

    def analyze_autovfr(self, section_opener, num_frames: int,
                        parallel: int = 2, log_prefix: str | None = None,
                        sections_log: list | None = None) -> None:
        """AutoVfr-equivalent sectioned analysis: split the sequence into
        `parallel` cycle-aligned sections, run their metric passes
        concurrently in strict order (parallel/ordered.ordered_parallel =
        the AMTOrderedParallel analog), then decide once over the merged
        costs (ref Server/Misc.cs:1346-1389: N Auto_Vfr analysis clips
        under AMTOrderedParallel, logs concatenated, AutoVfr.exe emits an
        Its .def, Its applies it).

        section_opener(start, end) -> iterator of luma frames for source
        indices [start, end). Sections request one frame of left halo so
        cross-section field-match costs equal the single-stream pass
        (bit-identical decisions regardless of `parallel`).

        With log_prefix, writes `{log_prefix}.autovfr{i}.log` per section
        and `{log_prefix}.autovfr.def` (Its-style fps ranges) — the
        reference flow's file contracts."""
        if self.mode != self.MODE_AUTOVFR:
            return
        from ..parallel.ordered import ordered_parallel

        parallel = max(1, min(parallel, max(1, num_frames // 10)))
        # cycle-aligned contiguous sections
        per = -(-num_frames // parallel)
        per += (-per) % 5
        bounds = []
        s = 0
        while s < num_frames:
            bounds.append((s, min(s + per, num_frames)))
            s += per

        def producer(sec_start, sec_end):
            halo = 1 if sec_start > 0 else 0
            carry = None
            got = 0
            it = section_opener(sec_start - halo, sec_end)
            for chunk in _batched(it, self.batch):
                arr = normalize_u8(np.stack(chunk))
                arr_in = (np.concatenate([carry[None], arr])
                          if carry is not None else arr)
                c = self._device_costs(arr_in)
                if carry is not None:
                    c = c[1:]
                elif halo and got == 0:
                    c = c[1:]  # drop the halo frame's own row
                carry = arr[-1]
                got += len(c)
                yield c
            # pad a section that came up short (decoder EOF / corrupt
            # keyframe) so the merged cost list stays index-aligned
            want = sec_end - sec_start
            if got < want:
                if got > 0:
                    yield np.repeat(np.asarray(c)[-1:], want - got, axis=0)
                else:
                    yield np.zeros((want, 3), np.float32)

        per_section: list[list[np.ndarray]] = [[] for _ in bounds]
        for i, item in ordered_parallel(
                [producer(s, e) for s, e in bounds]):
            per_section[i].append(item)
        if log_prefix:
            for i, chunks in enumerate(per_section):
                rows = sum(len(c) for c in chunks)
                with open(f"{log_prefix}.autovfr{i + 1}.log", "w") as f:
                    f.write(f"# section {bounds[i][0]}-{bounds[i][1]}\n"
                            f"frames={rows}\n")
        chunks_flat = [c for chunks in per_section for c in chunks]
        if chunks_flat and isinstance(chunks_flat[0], np.ndarray):
            all_costs = np.concatenate(chunks_flat)[:num_frames]
        else:
            # device buffers: concatenate ON DEVICE, one fetch (same
            # round-trip economics as analyze())
            import jax.numpy as jnp

            all_costs = np.asarray(
                jnp.concatenate(chunks_flat))[:num_frames]
        if sections_log is not None:
            sections_log.extend(bounds)
        self._finish_analysis(all_costs, num_frames)
        if log_prefix and self.decisions is not None:
            self._write_its_def(f"{log_prefix}.autovfr.def")

    def _write_its_def(self, path: str) -> None:
        """Its-style definition file: one `start end fps` frame-range per
        line over the source clip (the contract AutoVfr.exe's .def plays
        in the reference flow; consumed there by Its to emit VFR +
        timecodes, Misc.cs:1386)."""
        fps_of = {CycleMode.FILM: 24, CycleMode.VIDEO_30: 30,
                  CycleMode.VIDEO_60: 60}
        ranges = []
        for ci, d in enumerate(self.decisions):
            fps = fps_of[d.mode]
            if ranges and ranges[-1][2] == fps:
                ranges[-1][1] = (ci + 1) * 5
            else:
                ranges.append([ci * 5, (ci + 1) * 5, fps])
        with open(path, "w") as f:
            f.write("# Its-style fps ranges (start end fps)\n")
            for s, e, fps in ranges:
                f.write(f"{s} {e} {fps}\n")

    def _device_costs(self, arr: np.ndarray):
        """Field-match costs for one uint8 batch [B, H, W] -> [B, 3],
        returned as a DEVICE array (callers fetch once at the end of the
        pass: async dispatch keeps a tunneled device's round-trip cost
        out of the per-batch loop). On TPU the costs-only field-layout
        Pallas kernel is ~4x the XLA reduction (sums agree to ~1e-5
        rtol; decisions compare costs with wide margins, so ties are the
        only sensitive case)."""
        from ..ops import deint as deint_ops

        if self._mesh_backend is not None:
            # multi-chip: ppermute halo for the previous frame; rows are
            # bit-identical to the single-device jnp costs
            return self._mesh_backend.field_match_costs(arr)
        if self._use_host_twin():
            return deint_ops.field_match_costs_host(arr)
        import jax
        import jax.numpy as jnp

        b, h, w = arr.shape
        use_fused = b >= 3 and h % 2 == 0
        if use_fused:
            try:
                use_fused = jax.devices()[0].platform == "tpu"
            except Exception:  # noqa: BLE001
                use_fused = False
        if use_fused:
            from ..ops.fused_filter import (
                make_fused_filter_field,
                pad_width_for_fused,
            )

            wp = -(-w // 128) * 128
            key = (wp, w, h, "costs")
            fused = self._fused_cache.get(key)
            if fused is None:
                fused = make_fused_filter_field(
                    h, wp, logical_width=w, logical_height=h,
                    costs_only=True)
                self._fused_cache[key] = fused
            fp, _, _ = pad_width_for_fused(
                jnp.asarray(arr), jnp.ones((h, w), jnp.float32),
                jnp.zeros((h, w), jnp.float32), wp)
            _, costs = fused(fp, jnp.float32(255.0))
            return costs
        return deint_ops.field_match_costs(
            jnp.asarray(arr).astype(jnp.float32))

    # -- pass 3: output synthesis --------------------------------------------
    def output_spec(self, num_src_frames: int, in_fmt: VideoFormat) -> FilterOutput:
        out = FilterOutput(out_format=_copy_fmt(in_fmt))
        if self.resize is not None:
            # resized output resets SAR to 1:1 (ref MakeOutFormat :618-634)
            out.out_format.width, out.out_format.height = self.resize
            out.out_format.sar_width = out.out_format.sar_height = 1
        if self.mode == self.MODE_SVP and self.vfr_plan is not None:
            # 24p film reconstruction interpolated to smooth CFR 60p
            n_film = len(self.vfr_plan.durations)
            out.num_out_frames = (n_film * 5 + 1) // 2
            out.out_format.mul_div_fps(2, 1)
            out.out_format.progressive = True
        elif self.mode in self.KFM_FAMILY and self.vfr_plan is not None:
            plan = self.vfr_plan
            out.durations = plan.durations
            out.num_out_frames = len(plan.durations)
            if plan_is_cfr(self.decisions) and len(set(plan.durations)) <= 1:
                # pure 24p/30p/60p: emit CFR with the adjusted rate
                mode = self.decisions[0].mode if self.decisions else CycleMode.VIDEO_30
                mul = {CycleMode.FILM: (4, 5), CycleMode.VIDEO_30: (1, 1),
                       CycleMode.VIDEO_60: (2, 1)}[mode]
                out.out_format.mul_div_fps(mul[0], mul[1])
            else:
                out.time_codes = plan.timecodes_ms
                out.vfr_timing_fps = infer_vfr_timing_fps(plan.timecodes_ms)
                out.out_format.mul_div_fps(2, 1)  # 120/1001-based timebase
            out.out_format.progressive = True
        elif self.mode == self.MODE_YADIF:
            out.num_out_frames = num_src_frames
            out.out_format.progressive = True
        elif self.mode in (self.MODE_QTGMC, self.MODE_YADIF60):
            # double-rate: every field becomes a progressive frame
            out.num_out_frames = 2 * num_src_frames
            out.out_format.mul_div_fps(2, 1)
            out.out_format.progressive = True
        else:
            out.num_out_frames = num_src_frames
        return out

    def _run_deint_host(self, frames, prev_frame, next_frame):
        """Native yadif / motion-bob twins for slow device links
        (bit-identical to the device paths + round-to-uint8; equality
        tests in test_ops_filters::TestHostTwinKernels)."""
        from ..ops import deint as deint_ops

        cur = np.ascontiguousarray(frames)
        first = (np.ascontiguousarray(prev_frame)
                 if prev_frame is not None else cur[0])
        last = (np.ascontiguousarray(next_frame)
                if next_frame is not None else cur[-1])
        prev = np.concatenate([first[None], cur[:-1]])
        nxt = np.concatenate([cur[1:], last[None]])
        if self.mode == self.MODE_QTGMC:
            return deint_ops.motion_bob_host(prev, cur, nxt, True)
        out_t = deint_ops.yadif_host(prev, cur, nxt, True)
        if out_t is None:
            return None
        if self.mode == self.MODE_YADIF:
            return out_t
        out_b = deint_ops.yadif_host(prev, cur, nxt, False)
        b, h, w = cur.shape
        out = np.empty((2 * b, h, w), np.uint8)
        out[0::2] = out_t
        out[1::2] = out_b
        return out

    def run_kfm_batch(self, frames: np.ndarray, prev_frame,
                      start_index: int, plane: int = 0,
                      final: bool = False,
                      n_real: int | None = None) -> np.ndarray:
        """Synthesize the VFR output frames whose source index falls in
        [start_index, start_index + n_real) (the KFM pass-3 analog).

        frames: [B, H, W] source frames (one plane); prev_frame: the source
        frame before `start_index` (None at the sequence head), needed for
        MERGE_PREV pulldown repair. plane identifies the Y/U/V plane for
        per-plane carries; final marks the last batch of the stream
        (SVP mode flushes its interpolation tail). n_real < len(frames)
        marks trailing rows as padding (repeats shipped only to keep one
        XLA batch geometry); their entries belong to the next chunk and
        are excluded here.
        """
        import jax.numpy as jnp

        assert self.vfr_plan is not None
        end_index = start_index + (n_real if n_real is not None
                                   else len(frames))
        entries = [(src, op) for src, op in self.vfr_plan.source_frames
                   if start_index <= src < end_index]
        if not entries:
            if self.mode == self.MODE_SVP and final:
                return self._svp_emit(None, [], plane, True,
                                      frames.shape[1])
            return frames[:0].astype(np.float32)
        if (self.mode != self.MODE_SVP and self.post_chain is None
                and self._use_host_twin()):
            # slow device link: decision-identical numpy synthesis (the
            # ops are pure memory moves + one add; a tunneled device
            # round costs more than the whole batch). A configured
            # resize runs on the host too (ops/resize host twin).
            return self._run_kfm_batch_host(frames, prev_frame,
                                            start_index, entries, plane)
        if self._mesh_backend is not None and self.mode != self.MODE_SVP:
            # multi-chip synthesis: host-directed source slabs per shard,
            # contiguous output runs (parallel/sharded_filter.kfm_synth);
            # the post chain below runs on the still-sharded output
            local_entries = [(src - start_index, op) for src, op in entries]
            out, n_entries = self._mesh_backend.kfm_synth(
                frames, prev_frame, local_entries)
            if self.post_chain is not None:
                pad_n = len(out) - n_entries
                src_list = ([src for src, _ in entries]
                            + [entries[-1][0]] * pad_n)
                out = self._apply_post(out, src_list, frames.shape[1])
            out = self._apply_resize(out, plane)
            return self._download(out, n_entries)
        # transfer at source dtype, widen on device (4x less for uint8)
        arr = jnp.asarray(frames).astype(jnp.float32)
        prev = jnp.concatenate([
            jnp.asarray(prev_frame if prev_frame is not None
                        else frames[0]).astype(jnp.float32)[None],
            arr[:-1],
        ])
        ops_used = {op for _, op in entries}
        # all variants stay on device; the output gather and the post
        # chain run there too, so frames cross the host link exactly twice
        # (uint8 up, final float down)
        variants = {VFRPlan.WEAVE: arr}
        if VFRPlan.MERGE_PREV in ops_used:
            variants[VFRPlan.MERGE_PREV] = merge_prev_weave(arr, prev)
        if VFRPlan.BOB_T in ops_used:
            variants[VFRPlan.BOB_T] = bob_field(arr, top=True)
        if VFRPlan.BOB_B in ops_used:
            variants[VFRPlan.BOB_B] = bob_field(arr, top=False)
        # quantize the gather length to a multiple of 8 (pad with the
        # last entry, sliced off after download): otherwise every batch
        # has its own entry count and XLA compiles one executable per
        # batch instead of a handful
        n_entries = len(entries)
        pad_n = -(-n_entries // 8) * 8 - n_entries
        padded = entries + [entries[-1]] * pad_n
        src_idx = jnp.asarray([src - start_index for src, _ in padded])
        op_arr = np.asarray([op for _, op in padded])
        out = variants[VFRPlan.WEAVE][src_idx]
        for op in ops_used - {VFRPlan.WEAVE}:
            m = jnp.asarray(op_arr == op)[:, None, None]
            out = jnp.where(m, variants[op][src_idx], out)
        src_list = [src for src, _ in padded]
        if self.mode == self.MODE_SVP:
            out, src_list = self._svp_emit(out[:n_entries],
                                           src_list[:n_entries], plane,
                                           final, frames.shape[1], raw=True)
            n_entries = len(src_list)
        if self.post_chain is not None:
            out = self._apply_post(out, src_list, frames.shape[1])
        out = self._apply_resize(out, plane)
        return self._download(out, n_entries)

    def _run_kfm_batch_host(self, frames: np.ndarray, prev_frame,
                            start_index: int, entries,
                            plane: int = 0) -> np.ndarray:
        """Numpy twin of the device synthesis (bit-identical ops in
        float32; verified against the device path in
        tests/test_filter_fps_modes.py::TestHostTwin)."""
        from ..ops import deint as deint_ops

        if self.quantize_output and self.resize is None:
            # native single-pass kernel (fieldcosts.cpp Amt_KfmSynth):
            # exact vs device-float + round-to-uint8. With a resize
            # configured the float path below runs instead, so the
            # resize sees unquantized synthesis output in the same
            # order as the device path (synth -> resize -> round).
            u8 = np.ascontiguousarray(frames) \
                if frames.dtype == np.uint8 \
                else np.clip(np.rint(frames), 0, 255).astype(np.uint8)
            prev_u8 = None
            if prev_frame is not None:
                prev_u8 = np.ascontiguousarray(prev_frame) \
                    if getattr(prev_frame, "dtype", None) == np.uint8 \
                    else np.clip(np.rint(prev_frame), 0,
                                 255).astype(np.uint8)
            out = deint_ops.kfm_synth_host(
                u8, prev_u8,
                [src - start_index for src, _ in entries],
                [op for _, op in entries])
            if out is not None:
                return out
        arr = np.asarray(frames, np.float32)
        prev = np.concatenate([
            np.asarray(prev_frame if prev_frame is not None
                       else frames[0], np.float32)[None],
            arr[:-1],
        ])
        ops_used = {op for _, op in entries}
        variants = {VFRPlan.WEAVE: arr}
        if VFRPlan.MERGE_PREV in ops_used:
            variants[VFRPlan.MERGE_PREV] = \
                deint_ops.merge_prev_weave_host(arr, prev)
        if VFRPlan.BOB_T in ops_used:
            variants[VFRPlan.BOB_T] = deint_ops.bob_field_host(arr, True)
        if VFRPlan.BOB_B in ops_used:
            variants[VFRPlan.BOB_B] = deint_ops.bob_field_host(arr, False)
        out = np.stack([variants[op][src - start_index]
                        for src, op in entries])
        if self.resize is not None:
            from ..ops.resize import resize_lanczos3_host

            w2, h2 = self.resize
            if plane != 0:
                w2, h2 = w2 // 2, h2 // 2
            out = resize_lanczos3_host(out, h2, w2)
        if self.quantize_output:
            out = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
        return out

    def _svp_emit(self, film, film_srcs: list[int], plane: int,
                  final: bool, plane_h: int, raw: bool = False):
        """MC-interpolate this batch's film frames (plus the per-plane
        carry) to the 60p grid: output j sits at time 2j/5 film units,
        between film pair k=(2j)//5 and k+1 (frac in {0,.4,.8,.2,.6}).
        The last film frame carries to the next batch; `final` freezes it
        for the tail outputs."""
        import jax.numpy as jnp

        from ..ops import deint as deint_ops

        carry = self._svp_carry.get(plane)
        if film is None or len(film_srcs) == 0:
            if not (final and carry is not None):
                empty = (jnp.zeros((0, plane_h, 1), jnp.float32)
                         if film is None else film[:0])
                return (empty, []) if raw else self._download(empty)
            seq = carry[0][None]
            base = carry[1]
            srcs = [carry[2]]
        else:
            # global film index of this batch's first film frame
            all_srcs = [s for s, _ in self.vfr_plan.source_frames]
            base = bisect.bisect_left(all_srcs, film_srcs[0])
            seq = film
            srcs = list(film_srcs)
            if carry is not None:
                seq = jnp.concatenate([carry[0][None], film])
                base = base - 1
                srcs = [carry[2]] + srcs
        n_seq = len(srcs)
        # pairs (k, k+1) with both ends available; `final` adds the
        # frozen tail pair (last, last)
        pair_hi = base + n_seq - 1 if not final else base + n_seq
        outs = []  # (j, frac, a_local, b_local)
        for k in range(base, pair_hi):
            a_local = k - base
            b_local = min(k - base + 1, n_seq - 1)
            j0 = -(-5 * k // 2)
            j1 = -(-5 * (k + 1) // 2)
            for j in range(j0, j1):
                frac = 2 * j / 5 - k
                outs.append((j, round(frac, 1), a_local, b_local))
        # update the carry before computing (device array + global index)
        if n_seq:
            self._svp_carry[plane] = (seq[-1], base + n_seq - 1, srcs[-1])
        if final:
            self._svp_carry.pop(plane, None)
        if not outs:
            empty = seq[:0]
            return (empty, []) if raw else self._download(empty)
        # batch the interpolation per distinct frac (static per compile)
        results: dict[int, jnp.ndarray] = {}
        by_frac: dict[float, list[int]] = {}
        for idx, (j, frac, a, b) in enumerate(outs):
            by_frac.setdefault(frac, []).append(idx)
        for frac, idxs in by_frac.items():
            a_idx = jnp.asarray([outs[i][2] for i in idxs])
            b_idx = jnp.asarray([outs[i][3] for i in idxs])
            if frac == 0.0:
                interp = seq[a_idx]
            else:
                interp = deint_ops.mc_frame_interp(seq[a_idx], seq[b_idx],
                                                   frac)
            for slot, i in enumerate(idxs):
                results[i] = interp[slot]
        ordered = jnp.stack([results[i] for i in range(len(outs))])
        out_srcs = [srcs[outs[i][2]] for i in range(len(outs))]
        if raw:
            return ordered, out_srcs
        if self.post_chain is not None:
            ordered = self._apply_post(ordered, out_srcs, plane_h)
        ordered = self._apply_resize(ordered, plane)
        return self._download(ordered)

    # cache of geometry-specialised fused kernels (TPU production path)
    _fused_cache: dict = {}

    def _fused_yadif(self, frames: np.ndarray, prev_frame, next_frame):
        """Run yadif through the fused Pallas kernel (ops.fused_filter) when
        on TPU and the plane geometry allows; None = fall back to jnp.

        Bit-exact with the jnp chain: the batch is extended with the
        cross-batch halo frames so edge frames see their true temporal
        neighbours, and the kernel's own batch-edge clamping reproduces the
        jnp path's sequence-edge replication."""
        import os

        import jax

        if os.environ.get("AMATSUKAZE_NO_FUSED"):
            # escape hatch: Mosaic kernel compiles are not covered by
            # the persistent XLA cache, and on remote/tunneled devices a
            # per-process recompile can cost minutes; the unfused jnp
            # chain is bit-identical and caches across processes
            return None
        try:
            if jax.devices()[0].platform != "tpu":
                return None
        except Exception:  # noqa: BLE001
            return None
        b, h, w = frames.shape
        if h % 2 or b + 2 < 3:
            return None
        # stored height hp must be tile- (and so 8-) aligned; pick the tile
        # minimising DMA+compute cost (each tile loads tile+2*HALO rows),
        # padding 540-row chroma planes etc. with edge rows the kernel
        # masks via logical_height
        best = None
        for t in (120, 72, 40, 24, 16, 8):
            hp_t = -(-h // t) * t
            cost = (hp_t // t) * (t + 16) + hp_t
            if best is None or cost < best[0]:
                best = (cost, t, hp_t)
        _, tile, hp = best
        import jax.numpy as jnp

        from ..ops.fused_filter import make_fused_filter, pad_width_for_fused

        wp = -(-w // 128) * 128
        key = (hp, wp, tile, w, h)
        fused = self._fused_cache.get(key)
        if fused is None:
            # yadif-only kernel: the deinterlace path never reads the
            # field-match costs, and their partial sums are a large share
            # of the VPU work
            fused = make_fused_filter(hp, wp, tile_rows=tile,
                                      logical_width=w, logical_height=h,
                                      with_costs=False)
            self._fused_cache[key] = fused
        first = (prev_frame if prev_frame is not None else frames[0])
        last = (next_frame if next_frame is not None else frames[-1])
        ext = np.concatenate([first[None], frames, last[None]])
        u8 = (ext if ext.dtype == np.uint8
              else np.clip(np.rint(ext), 0, 255).astype(np.uint8))
        ones = jnp.ones((h, w), jnp.float32)
        zeros = jnp.zeros((h, w), jnp.float32)
        fp, _, _ = pad_width_for_fused(jnp.asarray(u8), ones, zeros, wp, hp)
        # logo erase already ran upstream (LogoEraser): skip pass 1 entirely
        out, _costs = fused.yadif_costs(fp, jnp.float32(255.0))
        # return the DEVICE array (still uint8): run_pass3 applies the post
        # chain on device, avoiding a download + re-upload of every frame
        return out[1:-1, :h, :w]

    def run_pass3(self, frames: np.ndarray, prev_frame, next_frame,
                  start_index: int = 0, plane: int = 0):
        """Filter one batch [B, H, W] -> output frames for that batch.

        prev/next_frame provide the temporal halo (None at sequence ends);
        start_index is the batch's first source-frame index (QP-map
        alignment). For KFM VFR, the caller maps output indices via
        vfr_plan.
        """
        import jax.numpy as jnp

        from ..ops import deint as deint_ops

        idx = range(start_index, start_index + len(frames))
        if (self.mode in (self.MODE_YADIF, self.MODE_YADIF60,
                          self.MODE_QTGMC)
                and self.post_chain is None and self.resize is None
                and self.quantize_output and frames.dtype == np.uint8
                and self._use_host_twin()):
            host = self._run_deint_host(frames, prev_frame, next_frame)
            if host is not None:
                return host
        if self._mesh_backend is not None:
            # multi-chip: shard_map + ppermute halo exchange over the
            # frame axis (parallel/sharded_filter.deint); the post chain
            # and resize below run on the still-sharded output under
            # XLA SPMD partitioning
            mb = self._mesh_backend
            if self.mode == self.MODE_YADIF:
                out = mb.deint("yadif", frames, prev_frame, next_frame)
            elif self.mode in (self.MODE_QTGMC, self.MODE_YADIF60):
                out = mb.deint("qtgmc" if self.mode == self.MODE_QTGMC
                               else "yadif60", frames, prev_frame,
                               next_frame)
                idx = [i for i in idx for _ in range(2)]
            else:
                out = mb.put_batch(frames).astype(jnp.float32)
            if self.post_chain is not None:
                out = self._apply_post(out, list(idx), frames.shape[1])
            out = self._apply_resize(out, plane)
            return self._download(out)
        if self.mode == self.MODE_YADIF:
            fused_out = self._fused_yadif(frames, prev_frame, next_frame)
            if fused_out is not None:
                if self.post_chain is not None or self.resize is not None:
                    if self.post_chain is not None:
                        fused_out = self._apply_post(
                            fused_out.astype(jnp.float32), idx,
                            frames.shape[1])
                    fused_out = self._apply_resize(
                        fused_out.astype(jnp.float32), plane)
                    return self._download(fused_out)
                # kernel output is already uint8
                if self.defer_download:
                    return DeferredBatch(fused_out, len(fused_out))
                return (np.asarray(fused_out) if self.quantize_output
                        else np.asarray(fused_out).astype(np.float32))
            arr = jnp.asarray(frames).astype(jnp.float32)
            prev = jnp.concatenate(
                [jnp.asarray(prev_frame if prev_frame is not None
                             else frames[:1])
                 .astype(jnp.float32).reshape(1, *frames.shape[1:]),
                 arr[:-1]]
            )
            nxt = jnp.concatenate(
                [arr[1:],
                 jnp.asarray(next_frame if next_frame is not None
                             else frames[-1:])
                 .astype(jnp.float32).reshape(1, *frames.shape[1:])]
            )
            out = deint_ops.yadif_deinterlace(prev, arr, nxt, True)
        elif self.mode in (self.MODE_QTGMC, self.MODE_YADIF60):
            arr = jnp.asarray(frames).astype(jnp.float32)
            prev = jnp.concatenate(
                [jnp.asarray(prev_frame if prev_frame is not None
                             else frames[:1])
                 .astype(jnp.float32).reshape(1, *frames.shape[1:]),
                 arr[:-1]]
            )
            nxt = jnp.concatenate(
                [arr[1:],
                 jnp.asarray(next_frame if next_frame is not None
                             else frames[-1:])
                 .astype(jnp.float32).reshape(1, *frames.shape[1:])]
            )
            if self.mode == self.MODE_QTGMC:
                out = deint_ops.motion_adaptive_bob(prev, arr, nxt, True)
            else:
                # Yadifmod2 mode=1 double rate (Misc.cs:1337): one yadif
                # per field, TFF order = top first (t=k) then bottom
                out_t = deint_ops.yadif_deinterlace(prev, arr, nxt, True)
                out_b = deint_ops.yadif_deinterlace(prev, arr, nxt, False)
                b, h, w = frames.shape
                out = jnp.stack([out_t, out_b], axis=1).reshape(2 * b, h, w)
            idx = [i for i in idx for _ in range(2)]  # QP map per field pair
        else:
            out = jnp.asarray(frames).astype(jnp.float32)
        if self.post_chain is not None:
            out = self._apply_post(out, idx, frames.shape[1])
        out = self._apply_resize(out, plane)
        return self._download(out)


def normalize_u8(arr: np.ndarray) -> np.ndarray:
    """Analysis-feed intake: device cost/logo kernels run 8-bit math.
    Floats round; 10-bit (uint16) decoder output downshifts with
    rounding — the same conversion the deinterlacer encode feed uses,
    so analysis and synthesis see identical pixels."""
    if arr.dtype == np.uint8:
        return arr
    if arr.dtype == np.uint16:
        return (((arr.astype(np.int32) + 2) >> 2)
                .clip(0, 255).astype(np.uint8))
    if np.issubdtype(arr.dtype, np.floating):
        return np.clip(np.rint(arr), 0, 255).astype(np.uint8)
    return arr.astype(np.uint8)


def build_post_chain(spec: str):
    """Post-filter chain from comma-separated tokens {deblock, nr, deband,
    edge} (the reference's KDeblock/KTemporalNR/KDeband/KEdgeLevel toggles,
    Server/Misc.cs:1403-1441). deblock runs first in the 8-bit domain with
    the per-MB QP maps extracted from the source ES (ts/qp_extract), like
    the reference's KDeblock consuming the decoder's qp-table frame props;
    the rest runs in the 14-bit domain. Returns the 8-bit-domain frames;
    None when no tokens."""
    tokens = {t.strip() for t in (spec or "").split(",") if t.strip()}
    if not tokens:
        return None
    unknown = tokens - {"deblock", "nr", "deband", "edge"}
    if unknown:
        raise ValueError(f"unknown post-filter tokens: {sorted(unknown)}")

    def chain(frames, qp=None, qp_block_scale=2, src_bits=8):
        import jax.numpy as jnp

        from ..ops import denoise

        x = jnp.asarray(frames)
        if "deblock" in tokens and qp is not None and src_bits == 8:
            b, h, w = x.shape
            hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
            if (hp, wp) != (h, w):
                xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w)),
                             mode="edge")
                xp = denoise.deblock_qp(xp, jnp.asarray(qp),
                                        qp_block_scale=qp_block_scale)
                x = xp[:, :h, :w]
            else:
                x = denoise.deblock_qp(x, jnp.asarray(qp),
                                       qp_block_scale=qp_block_scale)
        scale = float(1 << (14 - src_bits))  # ConvertBits(14) at depth
        x = x.astype(jnp.float32) * scale
        if "nr" in tokens:
            x = denoise.temporal_nr(x)
        if "deband" in tokens:
            x = denoise.deband(x, jnp.uint32(0))
        if "edge" in tokens:
            x = denoise.edge_level(x)
        return x * (1.0 / scale)  # back to the source domain

    chain.wants_qp = "deblock" in tokens
    return chain


def merge_prev_weave(frames, prev):
    """Weave each frame's top field with the PREVIOUS frame's bottom field
    (3:2 pulldown repair for the split telecined frame)."""
    import jax.numpy as jnp

    b, h, w = frames.shape
    t = frames.reshape(b, h // 2, 2, w)[:, :, 0, :]
    pb = prev.reshape(b, h // 2, 2, w)[:, :, 1, :]
    return jnp.stack([t, pb], axis=2).reshape(b, h, w)


def bob_field(frames, top: bool):
    """Line-double one field to full height: kept lines pass through, the
    missing lines are the average of the adjacent kept lines (edge
    replicated)."""
    import jax.numpy as jnp

    b, h, w = frames.shape
    f2 = frames.reshape(b, h // 2, 2, w)
    fld = f2[:, :, 0, :] if top else f2[:, :, 1, :]
    if top:
        # missing (odd) line k sits between kept k and k+1
        nxt = jnp.concatenate([fld[:, 1:], fld[:, -1:]], axis=1)
        interp = (fld + nxt) * 0.5
        return jnp.stack([fld, interp], axis=2).reshape(b, h, w)
    # missing (even) line k sits between kept k-1 and k
    prv = jnp.concatenate([fld[:, :1], fld[:, :-1]], axis=1)
    interp = (prv + fld) * 0.5
    return jnp.stack([interp, fld], axis=2).reshape(b, h, w)


def _batched(it, n):
    chunk = []
    for x in it:
        chunk.append(x)
        if len(chunk) >= n:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


def _copy_fmt(fmt: VideoFormat) -> VideoFormat:
    import copy

    return copy.deepcopy(fmt)


# ---------------------------------------------------------------------------
# zone/format conversion (MakeZones / MakeOutFormat)
# ---------------------------------------------------------------------------

def make_out_zones(
    zones: list[EncoderZone],
    out_frames: list[int],
    num_out_frames: int,
    time_codes: list[float],
    in_fps_num: int,
    in_fps_den: int,
) -> list[EncoderZone]:
    """Convert CM zones (filter-input frame numbers) to encoder zones in the
    output clip (ref MakeZones :546-616): map through the per-file frame
    list, drop zones <= 30 frames, then remap through VFR timecodes or scale
    by the frame-count ratio."""
    out: list[EncoderZone] = []
    n_src = len(out_frames)
    for z in zones:
        s = bisect.bisect_left(out_frames, z.start_frame)
        e = bisect.bisect_left(out_frames, z.end_frame)
        if e - s > 30:
            out.append(EncoderZone(s, e))
    if time_codes:
        tick = in_fps_den / in_fps_num
        for z in out:
            z.start_frame = bisect.bisect_left(time_codes, z.start_frame * tick * 1000)
            z.end_frame = bisect.bisect_left(time_codes, z.end_frame * tick * 1000)
    elif n_src != num_out_frames and n_src > 0:
        scale = num_out_frames / n_src
        for z in out:
            z.start_frame = max(0, min(num_out_frames, round(z.start_frame * scale)))
            z.end_frame = max(0, min(num_out_frames, round(z.end_frame * scale)))
    return out


def make_out_format(in_fmt: VideoFormat, out_width: int, out_height: int,
                    out_fps_num: int, out_fps_den: int,
                    progressive: bool) -> VideoFormat:
    """Encoder-input format from the filtered clip (ref MakeOutFormat
    :618-634): resized output resets SAR to 1:1."""
    out = _copy_fmt(in_fmt)
    if out.width != out_width or out.height != out_height:
        out.width = out_width
        out.height = out_height
        out.sar_width = out.sar_height = 1
    out.frame_rate_num = out_fps_num
    out.frame_rate_denom = out_fps_den
    out.progressive = progressive
    return out
