"""End-to-end transcode orchestration.

Parity: transcodeMain (Amatsukaze/TranscodeManager.hpp:455-830) +
EncoderArgumentGenerator (:345-405) + MakeBitrateZones (:407-442):

  split -> scramble check -> DRCS check -> reform -> NicoJK -> per-video-file
  CM/logo analysis -> applyCMZones/genAudio -> captions/chapters per output
  file -> per-output-file filter+encode (y4m over the encoder's stdin via a
  bounded pump) -> mux -> JSON report (same field names as the reference's).

The decode stage is pluggable (`decoder_factory`): the reference hardwires
FFmpeg; here any callable yielding (Y, U, V) numpy planes works - an FFmpeg
subprocess in production, a synthetic source in tests. The compute core runs
on device via models/ops; encoders/muxers stay subprocesses.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field

import numpy as np

from ..models.chapter import ChapterMaker, JlsElement, format_jls
from ..models.cm_analyze import CMAnalyzer, EncoderZone
from ..models.lgd import load_lgd
from ..models.logo import LogoFrameMatcher
from ..models.vfr import BitrateZone, adjust_vfr_bitrate, make_vfr_bitrate_zones
from ..reform.stream_reform import MPEG_CLOCK_HZ, StreamReformInfo
from ..types import CMType, EncodeFileKey, VideoStreamFormat
from ..utils.context import ErrorCounter, FormatError, NoDrcsMapError
from ..utils.perf import Stopwatch
from .frame_source import SweepFrameCache
from .settings import Encoder, Settings, make_encoder_args
from .splitter import AMTSplitter


def _link_slow() -> bool:
    from ..utils.device import device_link_is_slow

    return device_link_is_slow()

try:  # device compute is optional at import time (CLI --help etc.)
    from ..ops import cm as cm_ops
except Exception:  # pragma: no cover
    cm_ops = None


def ensure_jax_backend(ctx) -> None:
    """Fall back to the CPU backend when the accelerator is unavailable
    (device busy/unreachable); the pipeline must still run.

    Also enables a persistent XLA compile cache: the server spawns one
    process per queue item (reference architecture, TranscodeWorker.cs),
    so without it every encode pays the 20-40 s first-compile cost of
    each kernel geometry again. jax is typically already imported by the
    time this runs (module-level imports), so the env var would be
    ignored - set it through jax.config."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get(
                    "JAX_COMPILATION_CACHE_DIR",
                    os.path.join(os.path.expanduser("~"), ".cache",
                                 "amatsukaze_tpu", "jax")))
            # cache everything non-trivial: a kfm run is ~30 separate
            # jits and most compile in 0.2-0.9 s each — with a 1.0 s
            # floor none of them persisted and every fresh worker
            # process paid the full ~15 s compile wall again
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.1)
        from ..utils.device import mark_backend_attached, tunneled_env

        if (tunneled_env()
                and os.environ.get("AMATSUKAZE_FILTER_BACKEND") != "device"):
            # development tunnel: first contact costs ~10 s and the
            # link economics route every frame-sized op to the host
            # twins anyway (device_link_is_slow short-circuits on the
            # same environment check) — skip the eager attach; jax
            # still attaches lazily if something does ship device work
            return
        jax.devices()
        # the backend is attached: from here the link-economics probe
        # measures in-process (a subprocess could never attach a
        # single-client tunneled device the parent already holds and
        # would burn its whole timeout before concluding "slow")
        mark_backend_attached()
    except RuntimeError as e:
        ctx.warn("accelerator backend unavailable (%s); falling back to CPU", e)
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.devices()
        from ..utils.device import mark_backend_attached

        mark_backend_attached()


@dataclass
class OutFileResult:
    path: str = ""
    src_bitrate: float = 0.0
    target_bitrate: float = float("nan")
    file_size: int = 0
    subs: list = field(default_factory=list)


def source_bitrate_kbps(reform: StreamReformInfo, video_index: int) -> float:
    size, duration = reform.get_src_video_info(video_index)
    if duration <= 0:
        return 0.0
    return (size * 8 / 1000) / (duration / MPEG_CLOCK_HZ)


def make_bitrate_zones(time_codes, cmzones, settings: Settings, fps_num, fps_den):
    """(ref MakeBitrateZones :407-442)."""
    encoder_supports_vfr = settings.conf.encoder in (
        Encoder.QSVENC, Encoder.NVENC, Encoder.VCEENC,
    )
    if not time_codes or encoder_supports_vfr:
        return [
            BitrateZone(z.start_frame, z.end_frame, settings.conf.bitrate_cm)
            for z in cmzones
        ]
    zone_available = settings.conf.encoder in (Encoder.X264, Encoder.X265)
    if zone_available:
        return make_vfr_bitrate_zones(
            time_codes, cmzones, settings.conf.bitrate_cm,
            fps_num, fps_den, settings.conf.x265_time_factor, 0.05,
        )
    return []


class TranscodePipeline:
    """One `--mode ts` transcode (ref transcodeMain)."""

    def __init__(self, ctx, settings: Settings, decoder_factory=None,
                 audio_decoder_factory=None, caption_decoder=None,
                 phase_scheduler=None, encoder_runner=None, muxer_runner=None,
                 nicojk_fetchers=None):
        self.ctx = ctx
        self.settings = settings
        self.nicojk_fetchers = nicojk_fetchers or []
        self._nico_ok = False
        self.decoder_factory = decoder_factory
        if decoder_factory is not None:
            mb = settings.conf.frame_cache_mb
            if mb < 0:
                mb = SweepFrameCache.auto_budget_mb()
            if mb > 0:
                self._sweep_cache = SweepFrameCache(mb << 20)

                def cached_factory(pipeline, video_index,
                                   _orig=decoder_factory):
                    return self._sweep_cache.stream(
                        video_index,
                        lambda: _orig(pipeline, video_index))

                self.decoder_factory = cached_factory
        if audio_decoder_factory is None:
            # the in-build AAC-LC decoder (replaces libfaad): feeds the
            # CM-analysis wave stream and dual-mono element splitting.
            # Native C++ engine when a compiler is available, else the
            # pure-Python oracle.
            from ..audio.aac_native import make_decoder

            audio_decoder_factory = make_decoder
        self.audio_decoder_factory = audio_decoder_factory
        if caption_decoder is None and settings.conf.subtitles:
            # --subtitles without an injected decoder gets the in-build
            # ARIB decoder (the reference always has Caption.dll when
            # captions are enabled); unmapped DRCS bitmaps land next to
            # the mapping file, matching the server's drcs-dir layout
            # (<dir>/drcs_map.txt + <dir>/<md5>.bmp, ref DRCSManager).
            from .probe import default_caption_decoder

            caption_decoder = default_caption_decoder(ctx, settings)
        self.caption_decoder = caption_decoder
        self.phase = phase_scheduler or _NullPhases()
        self.encoder_runner = encoder_runner or _default_encoder_runner
        self.muxer_runner = muxer_runner or _default_muxer_runner
        self.logos = []
        for p in settings.conf.logo_path:
            try:
                self.logos.append((p, load_lgd(p)))
            except (OSError, ValueError):
                self.ctx.warn("cannot read logo: %s", p)
        self.erase_logos = []  # unconditional fade-1 erasure (--erase-logo)
        for p in settings.conf.erase_logo_path:
            try:
                self.erase_logos.append(load_lgd(p))
            except (OSError, ValueError):
                self.ctx.warn("cannot read erase-logo: %s", p)
        self._fade_curves: dict[int, tuple] = {}  # video idx -> (LogoData, fades)
        # per-encode-file Total/FilterWait/EncoderWait seconds
        # (ref Encoder.hpp:238-239)
        self.encode_stats: dict[int, dict] = {}

    # ------------------------------------------------------------------ main
    def run(self) -> dict:
        ctx, st = self.ctx, self.settings
        ensure_jax_backend(ctx)
        is_no_encode = st.conf.mode == "cm"
        sw = Stopwatch()
        sw.start()

        self.phase.wait("TSAnalyze")
        splitter = AMTSplitter(
            ctx, st, audio_decoder_factory=self.audio_decoder_factory,
            caption_decoder=self.caption_decoder,
        )
        reform = splitter.split()
        self._reform = reform  # decoders may need the format info
        ctx.info("TS analysis done: %.2f s", sw.getandreset())
        service_id = splitter.get_actual_service_id()
        self.actual_service_id = service_id
        num_total = splitter.num_total_packets
        num_scramble = splitter.num_scramble_packets
        total_int_video_size = splitter.total_int_video_size
        src_file_size = splitter.src_file_size

        if st.conf.dump_stream_info:
            reform.serialize(st.stream_info_path())

        # scramble check (ref :502-508)
        if num_total > 0:
            ratio = num_scramble / num_total
            if ratio > 0.01:
                ctx.error("%.2f%% of packets are scrambled", ratio * 100)
                if ratio > 0.3:
                    raise FormatError("too many scrambled packets")

        if not is_no_encode and not st.conf.ignore_no_drcs_map:
            if ctx.error_count(ErrorCounter.NO_DRCS_MAP) > 0:
                raise NoDrcsMapError("unmapped DRCS characters found")

        reform.prepare(st.conf.split_sub, st.conf.audio_encoder.value != "none")

        # NicoJK comment acquisition (ref :521-538)
        nicojk = None
        self._nico_ok = False
        if not is_no_encode and st.conf.nicojk_mask:
            from ..captions.nicojk import NicoJK, parse_ch_sid

            ch_map = {}
            if st.conf.nico_conv_ch_sid_path and os.path.exists(
                    st.conf.nico_conv_ch_sid_path):
                with open(st.conf.nico_conv_ch_sid_path,
                          encoding="utf-8") as f:
                    ch_map = parse_ch_sid(f.read())
            fetchers = list(self.nicojk_fetchers)
            if (st.conf.nicojk18 and not fetchers
                    and st.conf.nico_conv_ch_sid_path):
                # --nicojk18: the in-build NicoJK18 HTTP client plays the
                # NicoJK18Client.exe role (ref NicoJK.hpp:131-154)
                from ..captions.nicojk18 import make_fetcher

                fetchers = [make_fetcher(st.conf.nico_conv_ch_sid_path)]
            nicojk = NicoJK(ctx, ch_map, fetchers=fetchers,
                            mask=st.conf.nicojk_mask)
            ctx.info("[fetching NicoJK comments]")
            src_duration, _ = reform.get_in_out_duration()
            self._nico_ok = nicojk.make_ass(
                service_id, reform.first_frame_time,
                int(src_duration / MPEG_CLOCK_HZ))
            if self._nico_ok:
                reform.set_nicojk_list(nicojk.get_dialogues())
            elif nicojk.failed and not st.conf.ignore_nicojk_error:
                raise RuntimeError("NicoJK comment acquisition failed")
            elif not nicojk.failed:
                ctx.info("no matching NicoJK channel")

        # per-video-file CM/logo analysis (ref :559-595)
        self.phase.wait("CMAnalyze")
        sw.start()
        num_video_files = reform.num_video_file
        cm_results = []
        for v in range(num_video_files):
            cm_results.append(self._analyze_video_file(reform, v))
        ctx.info("CM analysis done: %.2f s", sw.getandreset())

        for v, cma in enumerate(cm_results):
            zones = [(z.start_frame, z.end_frame) for z in cma.cmzones]
            reform.apply_cm_zones(v, zones, cma.divs)

        adiff = reform.gen_audio(st.cmtypes)

        keys = reform.get_out_file_keys()
        out_results = {k.key(): OutFileResult() for k in keys}

        # chapters (ref :627-645)
        if st.conf.chapter and not is_no_encode:
            for v, cma in enumerate(cm_results):
                elements = self._jls_elements(reform, v, cma)
                maker = ChapterMaker(cma.trims, elements)
                for key in keys:
                    if key.video != v:
                        continue
                    file = reform.get_encode_file(key)
                    fmt = reform.get_format(key).video_format
                    chapters = maker.file_chapters(
                        file.video_frames, fmt.frame_rate
                    )
                    if chapters:
                        with open(st.tmp_chapter_path(key), "w") as f:
                            f.write(
                                ChapterMaker.format_chapters(
                                    chapters, fmt.frame_rate_num, fmt.frame_rate_denom
                                )
                            )

        if is_no_encode:
            return self._report(reform, keys, out_results, cm_results,
                                src_file_size, total_int_video_size, 0, adiff,
                                nico_ok=False)

        # caption files per output (ref :635-660)
        from ..captions.formatters import (
            CaptionASSFormatter,
            CaptionSRTFormatter,
        )
        from ..captions.nicojk import NicoJKFormatter

        ctx.info("[writing caption files]")
        for key in keys:
            file = reform.get_encode_file(key)
            for lang, lines in enumerate(file.caption_list):
                ass = CaptionASSFormatter(ctx).generate(lines)
                srt = CaptionSRTFormatter(ctx).generate(lines)
                with open(st.tmp_ass_path(key, lang), "w",
                          encoding="utf-8") as f:
                    f.write(ass)
                if srt:
                    # an empty SRT (e.g. all-small captions) would fail the
                    # mux step, so skip the file entirely
                    with open(st.tmp_srt_path(key, lang), "w",
                              encoding="utf-8") as f:
                        f.write(srt)
            if self._nico_ok:
                for jktype in st.nicojk_types:
                    text = NicoJKFormatter().generate(
                        nicojk.headers.get(jktype, []),
                        file.nicojk_list[jktype])
                    with open(st.tmp_nicojk_ass_path(key, jktype), "w",
                              encoding="utf-8") as f:
                        f.write(text)

        # filter + encode per output file (ref :683-753)
        sw.start()
        for i, key in enumerate(keys):
            self.phase.wait("Filter")
            self._encode_one(reform, key, cm_results[key.video],
                             out_results[key.key()], i, len(keys))
        ctx.info("encode done: %.2f s", sw.getandreset())

        # mux (ref :755-770)
        self.phase.wait("Mux")
        total_out_size = 0
        for key in keys:
            res = out_results[key.key()]
            file = reform.get_encode_file(key)
            out_path = st.out_file_path(file.out_key, file.key_max)
            res.path = out_path
            if self.muxer_runner is not None:
                self.muxer_runner(self, reform, key, res)
            elif os.path.exists(st.enc_video_file_path(key)):
                os.replace(st.enc_video_file_path(key), out_path)
            if os.path.exists(out_path):
                res.file_size = os.path.getsize(out_path)
            total_out_size += res.file_size

        return self._report(reform, keys, out_results, cm_results,
                            src_file_size, total_int_video_size,
                            total_out_size, adiff, nico_ok=False)

    # ------------------------------------------------------------- CM analysis
    def _analyze_video_file(self, reform: StreamReformInfo, v: int):
        st = self.settings
        frames_meta = reform.get_filter_source_frames(v)
        num_frames = len(frames_meta)
        fmt = reform.formats[reform.format_start_index[v]].video_format
        fps = fmt.frame_rate if fmt.frame_rate_num else 29.97

        jls_script = None
        if st.conf.jls_cmd_path:
            # user-supplied join_logo_scp rule script (ref CMAnalyze.hpp
            # MakeJoinLogoScpArgs -incmd + free-form options)
            from ..models.jls_script import JlsScript

            jls_script = JlsScript.from_file(st.conf.jls_cmd_path,
                                             st.conf.jls_options)
            self.ctx.info("JL command file: %s", st.conf.jls_cmd_path)
        analyzer = CMAnalyzer(self.ctx, num_frames, fps,
                              loose_logo_detection=st.conf.loose_logo_detection,
                              jls_script=jls_script)

        if st.conf.trim_avs_path:
            with open(st.conf.trim_avs_path) as f:
                analyzer.input_trim_avs(f.readline())
            return analyzer.result

        logo_spans = None
        logo_ratio = 0.0
        logo_path = ""
        scene_changes: list[int] = []
        silence: list[tuple[int, int]] = []

        # the reference only pays the analysis decode pass when chapter
        # analysis is on (TranscodeManager.hpp:568 `isAnalyze =
        # isChapterEnabled() && numFrames >= 300`; logo matching lives
        # inside CMAnalyze). Mirror that gate — a plain transcode decodes
        # the source once, not twice — extended to every configuration
        # whose outputs need the pass: cm mode, configured logos (delogo
        # without --chapter is a deliberate superset), JL rule scripts,
        # and external chapter_exe/join_logo_scp tools.
        is_analyze = (st.conf.chapter or st.conf.mode == "cm"
                      or bool(self.logos) or bool(st.conf.jls_cmd_path)
                      or self._external_tool(st.conf.chapter_exe_path)
                      or self._external_tool(st.conf.jls_path))

        if is_analyze and self.decoder_factory is not None and num_frames > 0:
            # ONE streaming pass over the decoded luma: scene metrics are
            # computed per device batch with a cross-batch carry and the
            # frames flow on to the logo matcher - nothing holds the whole
            # sequence in host RAM or HBM (a 30-min recording is ~80 GB of
            # luma; the old whole-sequence jit OOMed past ~1 minute)
            import jax.numpy as jnp

            batch = max(8, st.conf.device_batch_frames)
            scene_scores: list[np.ndarray] = []
            scene_hists: list[np.ndarray] = []
            state = {"prev": None, "count": 0, "pending": None}

            def drain_scene_pending():
                # deferred download of the previous batch's metrics: the
                # device computed while the host decoded this batch, so
                # the blocking np.asarray here only pays what overlap
                # could not hide
                if state["pending"] is None:
                    return
                dj, hj, n_real, n_pend = state["pending"]
                state["pending"] = None
                t0 = time.time()
                scene_scores.append(np.asarray(dj)[:n_real])
                scene_hists.append(np.asarray(hj)[:n_real])
                # late rescue: if the drain still blocks long after a
                # full decode batch of overlap, the link (not the
                # compiler) is slow -> decision-identical host twin
                state["dev_batches"] = state.get("dev_batches", 0) + 1
                if (state["dev_batches"] > 1
                        and time.time() - t0 > 0.005 * n_pend):
                    state["host_metrics"] = True
                    self.ctx.info(
                        "[scene metrics] device round slow "
                        "(%.0f ms/frame); switching to the host twin",
                        (time.time() - t0) * 1e3 / n_pend)
                state["scene_s"] = (state.get("scene_s", 0.0)
                                    + time.time() - t0)

            def scene_batch(pend):
                if cm_ops is None:
                    return
                t_sb = time.time()
                if "host_metrics" not in state:
                    # adaptive backend: on tunneled/remote devices every
                    # device round trip dwarfs the compute — fall back to
                    # the decision-identical numpy twin. Two detectors:
                    # (1) a warmed single-frame upload probe decides
                    # before any batch is shipped; (2) from the second
                    # batch on (first one carries the compile), a slow
                    # full device round switches mid-stream. Operators
                    # can force either with AMATSUKAZE_SCENE_METRICS.
                    forced = os.environ.get("AMATSUKAZE_SCENE_METRICS")
                    if forced in ("host", "device"):
                        state["host_metrics"] = forced == "host"
                    elif _link_slow():
                        # the shared probe is timeout-protected (a DEAD
                        # link would hang the in-process upload probe
                        # below forever); slow/dead -> host twin
                        state["host_metrics"] = True
                    else:
                        jnp.asarray(
                            np.zeros_like(pend[0])).block_until_ready()
                        probe = np.zeros_like(pend[0])
                        t0 = time.time()
                        jnp.asarray(probe).block_until_ready()
                        dt = time.time() - t0
                        state["host_metrics"] = dt > 0.00035
                        self.ctx.info(
                            "[scene metrics] upload probe %.2f ms/frame"
                            " -> %s", dt * 1e3,
                            "host twin" if state["host_metrics"]
                            else "device")
                arr = None
                if not state["host_metrics"]:
                    # frames ship as uint8 and widen on device (4x less
                    # xfer); tails are padded to the steady shape so each
                    # op compiles exactly once
                    from ..utils.batching import pad_tail

                    padded, n_real = pad_tail(pend, batch)
                    arr = jnp.asarray(padded)
                drain_scene_pending()
                if arr is None or state["host_metrics"]:
                    d, h = cm_ops.scene_metrics_batch_host(
                        pend, state["prev"] if state["prev"] is not None
                        else pend[0])
                    scene_scores.append(d)
                    scene_hists.append(h)
                else:
                    prev = (arr[0] if state["prev"] is None
                            else jnp.asarray(state["prev"]))
                    dj, hj = cm_ops.scene_metrics_batch(arr, prev)
                    # enqueue only: downloaded by the NEXT batch's drain
                    # (or the final drain), overlapping device compute
                    # with the host decode of the following batch
                    state["pending"] = (dj, hj, n_real, len(pend))
                state["prev"] = pend[-1]
                state["scene_s"] = (state.get("scene_s", 0.0)
                                    + time.time() - t_sb)

            def luma_stream():
                from ..io.process import prefetch_iter

                pend = []
                for planes in prefetch_iter(
                        self.decoder_factory(self, v),
                        depth=max(8, st.conf.device_batch_frames)):
                    pend.append(planes[0])
                    state["count"] += 1
                    if len(pend) >= batch:
                        scene_batch(pend)
                        yield from pend
                        pend = []
                    if state["count"] >= num_frames:
                        break
                if pend:
                    scene_batch(pend)
                    yield from pend

            stream = luma_stream()
            t_stream = time.time()
            if self.logos:
                matcher = LogoFrameMatcher(self.ctx, [lg for _, lg in self.logos])
                # the 11-step fade sweep feeds both matching and the
                # per-frame erase fades (ref AMTAnalyzeLogo's NUM_FADE)
                fade_steps = 2 if st.conf.no_delogo else 11
                matcher.scan_frames(stream, fmt.width, fmt.height, fps,
                                    fade_steps=fade_steps)
            else:
                for _ in stream:
                    pass
            # per-substage split (ref transcodeMain's per-stage elapsed
            # logs, TranscodeManager.hpp:489/:607): scene-metric time is
            # accumulated inside scene_batch; the rest of the streaming
            # pass is decode + (when logos exist) the fade-sweep matcher
            drain_scene_pending()
            self.ctx.info(
                "[CM analysis] stream pass %.2fs (%d frames; scene "
                "metrics %.2fs, decode+logo %.2fs)",
                time.time() - t_stream, state["count"],
                state.get("scene_s", 0.0),
                time.time() - t_stream - state.get("scene_s", 0.0))

            if cm_ops is not None and scene_scores:
                scores = np.concatenate(scene_scores)
                corr = cm_ops.histogram_correlation_from_hists(
                    np.concatenate(scene_hists))
                scene_changes = cm_ops.detect_scene_changes(scores, corr)
                with open(st.tmp_chapter_exe_out_path(v), "w") as f:
                    from ..models.cm_analyze import format_scene_changes_text

                    f.write(format_scene_changes_text(scene_changes, []))

            if self.logos and state["count"]:
                best = matcher.select_logo()
                matcher.write_result(st.tmp_logo_frame_path(v))
                ivs = matcher.intervals()
                logo_spans = [(iv.s_best, iv.e_best + 1) for iv in ivs]
                logo_ratio = matcher.logo_ratio
                logo_path = self.logos[best][0]
                if not st.conf.no_delogo:
                    self._fade_curves[v] = (self.logos[best][1],
                                            matcher.fade_curve())

            silence = self._detect_silence(reform, v, fps)

        # configured external tools take precedence over the in-process
        # engines (ref CMAnalyze.hpp:319-365: chapterExe + joinLogoScp
        # subprocesses with the reference file contracts)
        if self._external_tool(st.conf.chapter_exe_path):
            scene_changes = self._run_chapter_exe(v)
            analyzer.result.scene_changes = list(scene_changes)
        if self._external_tool(st.conf.jls_path):
            result = self._run_join_logo_scp(v, analyzer, scene_changes)
        else:
            result = analyzer.analyze(logo_spans, logo_ratio, logo_path,
                                      scene_changes, silence)
            # persist the trim AVS + div files (reference file contract)
            from ..models.cm_analyze import format_trim_avs

            with open(st.tmp_trim_avs_path(v), "w") as f:
                f.write(format_trim_avs(result.trims) + "\n")
            with open(st.tmp_div_path(v), "w") as f:
                f.write("\n".join(str(d) for d in result.divs[:-1]) + "\n")

        pid_changes = reform.get_pid_changed_list(v)
        if any(r > 0 for r in st.conf.pmt_cut_side_rate):
            analyzer.apply_pmt_cut(st.conf.pmt_cut_side_rate, pid_changes)
        return analyzer.result

    @staticmethod
    def _external_tool(path: str) -> bool:
        import shutil as _shutil

        return bool(path) and (os.path.isfile(path)
                               or _shutil.which(path) is not None)

    def _run_chapter_exe(self, v: int) -> list[int]:
        """Spawn the configured chapter_exe (ref MakeChapterExeArgs +
        chapterExe, CMAnalyze.hpp:319-337): `-v <video> -o <out>` with
        stdout captured to the chapter-exe-out file, whose `SCPos:` lines
        are the scene-change list."""
        import shlex
        import subprocess

        from ..models.cm_analyze import parse_scene_changes_text
        from ..utils.context import FormatError

        st = self.settings
        cmd = [st.conf.chapter_exe_path,
               "-v", st.int_video_file_path(v),
               "-o", st.tmp_chapter_exe_path(v)]
        cmd += shlex.split(st.conf.chapter_exe_options)
        self.ctx.info("%s", " ".join(cmd))
        with open(st.tmp_chapter_exe_out_path(v), "wb") as out:
            rc = subprocess.call(cmd, stdout=out)
        if rc != 0:
            raise FormatError(f"chapter_exe returned error code {rc}")
        with open(st.tmp_chapter_exe_out_path(v)) as f:
            return parse_scene_changes_text(f.read())

    def _run_join_logo_scp(self, v: int, analyzer, scene_changes):
        """Spawn the configured join_logo_scp (ref MakeJoinLogoScpArgs +
        joinLogoScp, CMAnalyze.hpp:338-365) and read back its trim AVS
        and div outputs."""
        import shlex
        import subprocess

        from ..utils.context import FormatError

        st = self.settings
        cmd = [st.conf.jls_path]
        if self.logos and os.path.exists(st.tmp_logo_frame_path(v)):
            cmd += ["-inlogo", st.tmp_logo_frame_path(v)]
        if not os.path.exists(st.tmp_chapter_exe_path(v)):
            # no external chapter_exe ran: hand the in-process scene
            # changes to jls in the scpos file contract
            from ..models.cm_analyze import format_scene_changes_text

            with open(st.tmp_chapter_exe_path(v), "w") as f:
                f.write(format_scene_changes_text(scene_changes, []))
        cmd += ["-inscp", st.tmp_chapter_exe_path(v)]
        if st.conf.jls_cmd_path:  # the reference adds -incmd only when
            cmd += ["-incmd", st.conf.jls_cmd_path]  # a JL file is set
        cmd += ["-o", st.tmp_trim_avs_path(v),
                "-oscp", st.tmp_jls_path(v),
                "-odiv", st.tmp_div_path(v)]
        cmd += shlex.split(st.conf.jls_options)
        self.ctx.info("%s", " ".join(cmd))
        rc = subprocess.call(cmd)
        if rc != 0:
            raise FormatError(f"join_logo_scp returned error code {rc}")
        with open(st.tmp_trim_avs_path(v)) as f:
            analyzer.input_trim_avs(f.readline())
        from ..models.cm_analyze import normalize_divs

        divs = []
        if os.path.exists(st.tmp_div_path(v)):
            with open(st.tmp_div_path(v)) as f:
                divs = [int(s) for s in f.read().split() if s.strip()]
        analyzer.result.divs = normalize_divs(divs, analyzer.num_frames)
        return analyzer.result

    def _detect_silence(self, reform, v, fps) -> list[tuple[int, int]]:
        st = self.settings
        wave_path = st.wave_file_path()
        if cm_ops is None or not os.path.exists(wave_path):
            return []
        wave_frames = reform.get_filter_source_audio_frames(v)
        if not wave_frames:
            return []
        import jax.numpy as jnp

        with open(wave_path, "rb") as f:
            chunks = []
            for wf in wave_frames:
                if wf.wave_offset < 0 or wf.wave_length <= 0:
                    continue
                f.seek(wf.wave_offset)
                chunks.append(f.read(wf.wave_length))
        if not chunks:
            return []
        pcm = np.frombuffer(b"".join(chunks), np.int16).astype(np.float32) / 32768.0
        sr = 48000 * 2  # stereo interleaved
        window = sr // 100
        usable = len(pcm) // window * window
        if usable == 0:
            return []
        rms = cm_ops.audio_rms_windows(jnp.asarray(pcm[:usable]), window)
        spans = cm_ops.detect_silence(rms, threshold=0.01, min_windows=30)
        # window units (10 ms) -> frame units
        to_frames = fps / 100.0
        return [(int(s * to_frames), int(e * to_frames)) for s, e in spans]

    def _autovfr_section_opener(self, key, file):
        """Per-section frame stream for AutoVfr analysis. Sections decode
        independently (so they parallelise across host threads); when the
        intermediate is in-build-decodable MPEG2 and the frame mapping is
        identity, each section byte-seeks to its keyframe instead of
        decoding from zero (the AMTSource seek path)."""
        st = self.settings
        reform = self._reform
        meta = reform.get_filter_source_frames(key.video)
        wanted = sorted(set(file.video_frames))
        identity = wanted == list(range(len(meta)))
        seek_open = None
        if identity and meta:
            from ..types import VideoStreamFormat

            vfmt = reform.get_format(key).video_format.format
            try:
                ps = st.int_video_file_path(key.video)
                with open(ps, "rb") as f:
                    head = f.read(4)
                if head[:3] == b"\x00\x00\x01":  # MPEG PS/ES intermediate
                    if vfmt in (VideoStreamFormat.MPEG2,
                                VideoStreamFormat.UNKNOWN):
                        from ..video.native import (  # noqa: F401
                            NativeMpeg2Decoder,
                        )

                        from .decoders import mpeg2_ps_seek_opener

                        seek_open = mpeg2_ps_seek_opener(ps)
                    else:
                        # H.264 (IDR joins) / HEVC (IRAP joins, RASL
                        # dropped by the decoders)
                        from .decoders import annexb_ps_seek_opener

                        seek_open = annexb_ps_seek_opener(ps, vfmt)
            except (RuntimeError, OSError):
                seek_open = None

        def opener(start: int, end: int):
            start = max(0, start)
            if seek_open is not None:
                from .decoders import FormatSeekError

                key_idx = meta[start].key_frame
                try:
                    it = seek_open(key_idx, meta[key_idx].file_offset)
                    for i, planes in enumerate(it):
                        idx = key_idx + i
                        if idx >= end:
                            break
                        if idx >= start:
                            yield planes[0]
                    return
                except FormatSeekError:
                    # not a clean join (open-GOP H.264 recovery point):
                    # forward decode below
                    pass
            wanted_set = set(wanted)
            pos = 0
            for i, planes in enumerate(self.decoder_factory(self, key.video)):
                if i not in wanted_set:
                    continue
                if pos >= end:
                    break
                if pos >= start:
                    yield planes[0]
                pos += 1

        return opener

    def _jls_elements(self, reform, v, cma) -> list[JlsElement]:
        frames = reform.get_filter_source_frames(v)
        n = len(frames)
        fmt = reform.formats[reform.format_start_index[v]].video_format
        fps = fmt.frame_rate if fmt.frame_rate_num else 29.97
        bounds = sorted(set([0, n] + cma.trims + cma.divs))
        elements = []
        for a, b in zip(bounds, bounds[1:]):
            if b > a:
                elements.append(JlsElement(a, b, int(round((b - a) / fps))))
        with open(self.settings.tmp_jls_path(v), "w") as f:
            f.write(format_jls(elements))
        return elements

    # ------------------------------------------------------------------ encode
    def _encode_one(self, reform, key: EncodeFileKey, cma, res: OutFileResult,
                    index: int, total: int) -> None:
        ctx, st = self.ctx, self.settings
        file = reform.get_encode_file(key)
        fmt = reform.get_format(key).video_format
        num_frames = len(file.video_frames)
        if num_frames == 0:
            return

        src_bitrate = source_bitrate_kbps(reform, key.video)
        res.src_bitrate = src_bitrate
        if st.conf.auto_bitrate:
            target = st.conf.bitrate.target_bitrate(
                reform.get_video_stream_format(), src_bitrate
            )
            if key.cm == CMType.CM:
                target *= st.conf.bitrate_cm
            res.target_bitrate = target

        ctx.info("[encode start] %d/%d %s (%d frames)",
                 index + 1, total, key.cm.name, num_frames)
        self.phase.wait("Encode")

        # filter graph: analysis passes + output spec (ref AMTFilterSource,
        # FilteredSource.hpp:136-635 — the AVS multi-pass loop becomes a
        # declarative device pipeline)
        from ..models.filter_graph import FilterGraph, make_out_zones

        from ..models.filter_graph import build_post_chain
        from ..models.logo_erase import LogoEraser

        entries = []
        if key.video in self._fade_curves:
            entries.append(self._fade_curves[key.video])
        entries.extend((lg, None) for lg in self.erase_logos)
        eraser = LogoEraser(self.ctx, entries, fmt.width, fmt.height)
        self._active_eraser = eraser if eraser else None

        fg = FilterGraph(self.ctx, mode=st.conf.filter_mode,
                         batch=st.conf.device_batch_frames,
                         post_chain=build_post_chain(st.conf.post_filter))
        if st.conf.filter_devices > 1:
            # multi-chip production path: shard this file's filter pass
            # over the device mesh (parallel/sharded_filter)
            fg.set_mesh(st.conf.filter_devices)
            ctx.info("[filter] sharding over %d devices",
                     st.conf.filter_devices)
        if st.conf.resize_width and st.conf.resize_height:
            fg.resize = (st.conf.resize_width, st.conf.resize_height)
        fg.kfm_ucf = st.conf.kfm_ucf
        # the encode pump rounds to uint8 anyway: round on device instead
        # and download 4x less
        fg.quantize_output = True
        if fg.post_chain is not None and getattr(fg.post_chain, "wants_qp",
                                                 False):
            # per-MB QP maps from the intermediate ES for the deblock post
            # filter (the reference reads them from a patched decoder's
            # frame props, AMTSource.hpp:371-404; here: ts/qp_extract)
            try:
                from ..ts.qp_extract import QpMapSource

                qsrc = QpMapSource.from_file(
                    st.int_video_file_path(key.video))
                if len(qsrc):
                    n_slices = qsrc.slices_ok + qsrc.slices_fallback
                    if qsrc.slices_fallback and qsrc.full_parse:
                        ctx.warn(
                            "deblock: %d/%d slices used the slice-QP "
                            "fallback (VLC desync)", qsrc.slices_fallback,
                            n_slices)
                    fg.qp_source = qsrc.select(sorted(set(file.video_frames)))
                else:
                    # non-MPEG2 source: FFmpeg's per-block QP export
                    # (H.264) through the in-process bridge
                    from ..ts.qp_extract import qp_map_source_from_avdec

                    qsrc = qp_map_source_from_avdec(
                        st.int_video_file_path(key.video))
                    if qsrc is not None and len(qsrc):
                        fg.qp_source = qsrc.select(
                            sorted(set(file.video_frames)))
                    else:
                        ctx.warn("deblock: no QP maps available for this "
                                 "codec; deblock will be skipped")
            except OSError as e:
                ctx.warn("deblock: QP extraction failed: %s", e)
        if fg.mode == FilterGraph.MODE_AUTOVFR:
            if self.decoder_factory is None:
                raise RuntimeError("no decoder available for filter analysis")
            # AutoVfr: ordered-parallel sectioned analysis with the
            # reference flow's log/def file contracts (Misc.cs:1346-1389)
            fg.analyze_autovfr(
                self._autovfr_section_opener(key, file),
                num_frames,
                parallel=max(1, st.conf.autovfr_parallel),
                log_prefix=st.tmp_autovfr_prefix(key.video))
        elif fg.mode in FilterGraph.KFM_FAMILY:
            if self.decoder_factory is None:
                raise RuntimeError("no decoder available for filter analysis")
            from ..io.process import prefetch_iter

            wanted = set(file.video_frames)
            src = prefetch_iter(self.decoder_factory(self, key.video),
                                depth=max(8, st.conf.device_batch_frames))
            if self._active_eraser is not None:
                src = self._active_eraser.erase_iter(
                    src, st.conf.device_batch_frames)
            # retain the analysis pass's decoded frames (post-erase,
            # selection-filtered) so the encode pass can skip the second
            # source decode when everything fits the memory cap — the
            # reference's AMTSource LRU frame cache serves the same
            # double-pass (AMTSource.hpp:410-426)
            spill = _FrameSpill(key.key(), _analysis_cache_cap(st))

            def _tee_y():
                for i, planes in enumerate(src):
                    if i not in wanted:
                        continue
                    spill.offer(planes)
                    yield planes[0]

            fg.analyze(_tee_y(), num_frames)
            self._analysis_spill = spill if spill.usable() else None
        spec = fg.output_spec(num_frames, fmt)
        if st.conf.dump_filter:
            # filter-graph debug dump (the reference's --dump-filter /
            # DumpFilterGraph analog, FilteredSource.hpp:273-279)
            with open(st.tmp_filter_dump_path(key), "w") as f:
                json.dump(fg.debug_dump(num_frames), f, indent=1)
        out_fmt = spec.out_format
        if spec.time_codes:
            with open(st.enc_timecode_path(key), "w") as f:
                f.write("# timecode format v2\n")
                # one start time per output frame (the plan also carries the
                # trailing end time for duration bookkeeping)
                f.writelines(f"{tc:.6f}\n"
                             for tc in spec.time_codes[:spec.num_out_frames])
        self._vfr_timing_fps = spec.vfr_timing_fps if spec.time_codes else 30
        self._active_filter = fg
        self._active_spec = spec

        zones = [
            EncoderZone(z.start_frame, z.end_frame) for z in cma.cmzones
        ] if key.cm == CMType.BOTH else []
        if fg.mode != FilterGraph.MODE_NONE:
            zones = make_out_zones(
                zones, file.video_frames, spec.num_out_frames,
                spec.time_codes, fmt.frame_rate_num, fmt.frame_rate_denom,
            )
        bitrate_zones = make_bitrate_zones(
            spec.time_codes, zones, st,
            fmt.frame_rate_num, fmt.frame_rate_denom,
        )
        if (spec.time_codes and st.conf.auto_bitrate
                and st.conf.encoder != Encoder.X264
                and not math.isnan(res.target_bitrate)):
            # VFR bitrate correction for non-VFR-aware encoders (only
            # x264 takes --tcfile-in): the encoder budgets bits against
            # its nominal fps while the real VFR duration is longer, so
            # the target scales by avg/nominal frame duration (ref
            # AdjustVFRBitrate FilteredSource.hpp:833-839 applied in
            # getOptions TranscodeSetting.hpp:1080-1083)
            res.target_bitrate *= adjust_vfr_bitrate(
                spec.time_codes, out_fmt.frame_rate_num,
                out_fmt.frame_rate_denom)

        passes = [1, 2] if st.conf.two_pass else [-1]
        try:
            for pass_index in passes:
                args = make_encoder_args(
                    st.conf.encoder, st.conf.encoder_path,
                    self._encoder_options(res, bitrate_zones, num_frames),
                    out_fmt, st.enc_video_file_path(key),
                    pass_index=pass_index,
                    stats_path=st.enc_stats_path(key),
                )
                if len(passes) > 1:
                    ctx.info("[encode pass %d/%d]", pass_index, len(passes))
                self.encoder_runner(self, reform, key, args)
        finally:
            self._active_filter = None
            self._active_spec = None
            self._active_eraser = None
            # the analysis frame spill can hold GBs: release it with the
            # rest of the per-file state even when the encode failed
            self._analysis_spill = None

    def _encoder_options(self, res: OutFileResult, zones, num_frames) -> str:
        opts = self.settings.conf.encoder_options
        if not math.isnan(res.target_bitrate):
            opts += f" --bitrate {int(res.target_bitrate)}"
        for i, z in enumerate(zones or []):
            sep = "--zones " if i == 0 else "/"
            opts += f"{sep}{z.start_frame},{z.end_frame - 1},b={z.bitrate:.3g}"
        return opts.strip()

    # ------------------------------------------------------------------ report
    def _report(self, reform, keys, out_results, cm_results, src_file_size,
                int_video_size, total_out_size, adiff, nico_ok) -> dict:
        st = self.settings
        in_dur, out_dur = reform.get_in_out_duration()
        report = {
            "srcpath": st.conf.src_file_path,
            "outfiles": [],
            "logofiles": [c.logopath for c in cm_results],
            "srcfilesize": src_file_size,
            "intvideofilesize": int_video_size,
            "outfilesize": total_out_size,
            "srcduration": round(in_dur / MPEG_CLOCK_HZ, 3),
            "outduration": round(out_dur / MPEG_CLOCK_HZ, 3),
            "audiodiff": adiff.to_json(),
            "error": self.ctx.error_json(),
            "cmanalyze": bool(st.conf.chapter),
            "nicojk": nico_ok,
            "trimavs": bool(st.conf.trim_avs_path),
            # Total/FilterWait/EncoderWait per encode file
            # (ref Encoder.hpp:238-239 log line)
            "encodewaits": [self.encode_stats.get(k.key(), {})
                            for k in keys],
        }
        for key in keys:
            file = reform.get_encode_file(key)
            res = out_results[key.key()]
            report["outfiles"].append({
                "path": st.out_file_path(file.out_key, file.key_max),
                "srcbitrate": int(res.src_bitrate),
                "outbitrate": -1 if math.isnan(res.target_bitrate)
                else int(res.target_bitrate),
                "outfilesize": res.file_size,
                "subs": res.subs,
            })
        if st.conf.out_info_json_path:
            with open(st.conf.out_info_json_path, "w") as f:
                json.dump(report, f, ensure_ascii=False)
        return report


class _NullPhases:
    def wait(self, phase: str) -> None:
        pass


class _InProcessEncoderSink:
    """In-build encode without the subprocess + y4m round-trip.

    When the encoder command resolves to the x264 shim (no external
    binary installed), the filtered planes go straight into the libx264
    bridge in this process — one pipe serialization + y4m parse less per
    frame. Real encoder binaries keep the reference architecture: y4m
    over stdin to a subprocess (ref Encoder.hpp:94-164).
    """

    def __init__(self, shim_argv: list[str], y4m_fmt):
        from ..tools.x264_shim import build_encoder, parse_args

        opts = parse_args(shim_argv)
        if not opts["out"]:
            raise RuntimeError("in-process encoder: no -o output path")
        interlaced = y4m_fmt.interlaced or opts["field_order"] is not None
        tff = (opts["field_order"] != "bff") if opts["field_order"] \
            else getattr(y4m_fmt, "tff", True)
        bits = getattr(y4m_fmt, "bits", 8)
        # Main10 pass-through: encode at 10 bits when the codec can
        native10 = bits == 10 and opts["codec"] in ("libx265", "libsvtav1")
        self._enc = build_encoder(
            opts, y4m_fmt.width, y4m_fmt.height, y4m_fmt.fps_num,
            y4m_fmt.fps_den, interlaced, tff,
            bit_depth=10 if native10 else 8)
        self._shift = 0 if native10 else max(bits - 8, 0)
        self._out = open(opts["out"], "wb")
        self.frames = 0

    def write_frame(self, y, u, v) -> None:
        if self._shift:
            rnd = 1 << (self._shift - 1)
            y = ((y + rnd) >> self._shift).clip(0, 255).astype(np.uint8)
            u = ((u + rnd) >> self._shift).clip(0, 255).astype(np.uint8)
            v = ((v + rnd) >> self._shift).clip(0, 255).astype(np.uint8)
        if self._enc.bit_depth > 8:
            for pkt in self._enc.encode(y, u, v):
                self._out.write(pkt)
        else:
            for pkt in self._enc.encode(_to_u8(y), _to_u8(u), _to_u8(v)):
                self._out.write(pkt)
        self.frames += 1

    def join(self) -> int:
        try:
            for pkt in self._enc.flush():
                self._out.write(pkt)
        finally:
            self._out.close()
        return 0


def _inprocess_encoder_argv(encoder_args: str) -> list[str] | None:
    """The shim argv when `encoder_args` invokes the in-build shim
    (resolve_encoder_command swapped a missing binary), else None."""
    import shlex

    try:
        parts = shlex.split(encoder_args)
    except ValueError:
        return None
    for i, p in enumerate(parts):
        if p == "amatsukaze_tpu.tools.x264_shim":
            if i > 0 and parts[i - 1] == "-m":
                return parts[i + 1:]
    return None


def _default_encoder_runner(pipeline: TranscodePipeline, reform,
                            key: EncodeFileKey, encoder_args: str) -> None:
    """Drive the external encoder: decode -> device filter -> y4m -> stdin.

    Uses the bounded DataPumpThread so filtering overlaps encoder input
    (ref AMTFilterVideoEncoder::encode, Encoder.hpp:166-264).
    """
    from ..io.process import DataPumpThread, SubProcess
    from ..io.y4m import Y4MFormat, Y4MWriter

    st = pipeline.settings
    file = reform.get_encode_file(key)
    fmt = reform.get_format(key).video_format
    if pipeline.decoder_factory is None:
        raise RuntimeError("no decoder available for encode stage")

    fg = getattr(pipeline, "_active_filter", None)
    spec = getattr(pipeline, "_active_spec", None)
    out_fmt = spec.out_format if spec is not None else fmt

    from .settings import resolve_encoder_command

    encoder_args = resolve_encoder_command(encoder_args, st.conf.encoder)
    from ..io.process import prefetch_iter

    # analysis-pass frame spill: when the KFM analysis retained every
    # selected (post-erase, 8-bit) frame in memory, feed those directly
    # instead of decoding the source a second time.  Left on the
    # pipeline (not popped) so a two-pass encode serves both passes;
    # _encode_one's finally releases it with the other per-file state.
    spill = getattr(pipeline, "_analysis_spill", None)
    if spill is not None and spill.key != key.key():
        spill = None

    wanted = set(file.video_frames)
    if spill is not None:
        pipeline.ctx.info(
            "encode feed: analysis frame cache (%d frames, %.0f MB)",
            len(spill.frames), spill.nbytes / 1e6)
        # non-destructive: two-pass encodes call this runner once per
        # pass with the same key and both passes ride the cache; the
        # whole spill is released by _encode_one's finally
        src = iter(list(spill.frames))
    else:
        src = prefetch_iter(pipeline.decoder_factory(pipeline, key.video),
                            depth=max(8,
                                      st.conf.num_encode_buffer_frames))
    # peek the first decoded frame: Main10 sources arrive as uint16
    import itertools

    src = iter(src)
    first = next(src, None)
    depth = 10 if (first is not None
                   and first[0].dtype == np.uint16) else 8
    if first is not None:
        src = itertools.chain([first], src)
    eraser = getattr(pipeline, "_active_eraser", None)
    filtered = not (fg is None
                    or (fg.mode == "none" and fg.post_chain is None))
    passthrough10 = depth == 10 and not filtered and eraser is None
    # post-chain-only filtering (the realistic Main10 case: 4K is
    # progressive, so NR/deband/edge/resize apply but no deinterlacer)
    # runs the 14-bit device chain scaled from/to 10 bits
    post10 = (depth == 10 and eraser is None and fg is not None
              and fg.mode == "none" and fg.post_chain is not None)
    if post10:
        fg.src_bits = 10
    if depth == 10 and not passthrough10 and not post10:
        # deinterlacer graphs run at 8 bits: rounded downconvert
        # (the reference filters at source depth via AviSynth; the
        # unfiltered path below keeps the full 10 bits)
        src = (tuple(((p.astype(np.int32) + 2) >> 2)
                     .clip(0, 255).astype(np.uint8) for p in planes)
               for planes in src)
    y4m_fmt = Y4MFormat(
        width=out_fmt.width, height=out_fmt.height,
        fps_num=out_fmt.frame_rate_num, fps_den=out_fmt.frame_rate_denom,
        interlaced=not out_fmt.progressive,
        sar_num=out_fmt.sar_width, sar_den=out_fmt.sar_height,
        colorspace="420p10" if (passthrough10 or post10)
        else "420mpeg2",
    )
    shim_argv = _inprocess_encoder_argv(encoder_args)
    ep = st.conf.encoder_process
    use_subprocess = shim_argv is None or ep == 1 or (
        ep == -1 and (os.cpu_count() or 1) > 1)
    if not use_subprocess:
        # single-core host: the in-process sink skips the y4m pipe
        # round-trip (the encoder C call releases the GIL, so the
        # decode/filter threads still overlap it)
        proc = None
        writer = _InProcessEncoderSink(shim_argv, y4m_fmt)
    else:
        # the reference's stage-pipelined architecture: the encoder runs
        # in its own process fed y4m over stdin (Encoder.hpp:94-164) —
        # on a multi-core host decode/filter and encode overlap fully
        proc = SubProcess(encoder_args)
        writer = Y4MWriter(proc.stdin, y4m_fmt)
    # queue deep enough to ride out a full device batch round without
    # starving the encoder (ref Encoder.hpp's pump buffering), capped at
    # ~256 MB of frames so 4K sources don't blow host memory.  The
    # device-batch depth is only needed when frames arrive in device
    # bursts (filter graph / logo eraser); on the plain path a deep
    # queue is actively harmful — frames parked in it pin the decoder's
    # plane pool, so every decode becomes a fresh page-faulted
    # allocation (~3x slower decode measured at 1080i).
    frame_bytes = max(1, out_fmt.width * out_fmt.height * 3 // 2
                      * (2 if (passthrough10 or post10) else 1))
    pump_depth = st.conf.num_encode_buffer_frames
    if filtered or eraser is not None:
        pump_depth = max(pump_depth, st.conf.device_batch_frames)
    pump_depth = max(4, min(pump_depth, (256 << 20) // frame_bytes))
    pump = DataPumpThread(lambda planes: writer.write_frame(*planes),
                          max_items=pump_depth)
    if spill is not None:
        # spilled frames are already erased and selection-filtered
        frames_iter = src
    else:
        if eraser is not None:
            src = eraser.erase_iter(src,
                                    max(3, st.conf.device_batch_frames))
        frames_iter = (planes for i, planes in enumerate(src)
                       if i in wanted)
    # rolling encode-progress report (ref FpsPrinter
    # PerformanceUtil.hpp:57-124 feeding the worker console)
    from ..utils.perf import FpsPrinter

    n_total = len(wanted)
    done = [0]
    fpsp = FpsPrinter(interval_s=10.0, report=lambda fps: pipeline.ctx.info(
        "[encode] %d/%d frames, %.1f fps", done[0], n_total, fps))
    fpsp.start()

    def _with_progress(it):
        for planes in it:
            yield planes
            done[0] += 1
            fpsp.update()

    frames_iter = _with_progress(frames_iter)
    t_start = time.time()
    if fg is None or (fg.mode == "none" and fg.post_chain is None):
        for planes in frames_iter:
            pump.put(planes)
    else:
        _pump_filtered(fg, frames_iter, pump,
                       max(3, st.conf.device_batch_frames))
    pump.join()
    rc = writer.join() if proc is None else proc.join()
    if rc != 0:
        raise RuntimeError(
            f"encoder failed ({rc}): "
            + "\n".join(proc.last_lines if proc is not None else [])
        )
    # encode-stage wait breakdown (ref Encoder.hpp:238-239 logs Total /
    # FilterWait / EncoderWait): consumer_wait = the encoder feed idling
    # for filtered frames, producer_wait = the filter blocked on a slow
    # encoder. Stored per encode file for the JSON report and bench.
    total = time.time() - t_start
    stats = {"total": round(total, 3),
             "filter_wait": round(pump.consumer_wait, 3),
             "encoder_wait": round(pump.producer_wait, 3)}
    pipeline.encode_stats[key.key()] = stats
    pipeline.ctx.info(
        "Total: %.2fs, FilterWait: %.2fs, EncoderWait: %.2fs",
        total, pump.consumer_wait, pump.producer_wait)


def _to_u8(plane: np.ndarray) -> np.ndarray:
    if plane.dtype == np.uint8:  # already rounded (on device)
        return plane
    return np.clip(np.floor(plane + 0.5), 0, 255).astype(np.uint8)


def _to_depth(plane: np.ndarray, bits: int) -> np.ndarray:
    if bits <= 8:
        return _to_u8(plane)
    if plane.dtype == np.uint16:  # already rounded (on device)
        return plane
    mx = (1 << bits) - 1
    return np.clip(np.floor(plane + 0.5), 0, mx).astype(np.uint16)


class _FrameSpill:
    """Bounded in-memory retention of the KFM analysis pass's OUTPUT
    frames (post-erase, selection-filtered, decode order) so the encode
    pass consumes them directly.  Complements SweepFrameCache (which
    replays the RAW decode for every sweep, frame_source.py:43): the
    spill additionally skips the second logo-erase device pass and the
    per-frame prefetch/enumerate/set-membership replay overhead —
    measured ~0.4 s on a 240-frame 1080i segment even with the sweep
    cache hot.  When no eraser is active the spilled tuples alias the
    sweep cache's arrays, so the two caches share storage.

    The reference pays the same double pass through AMTSource's LRU
    frame cache (AMTSource.hpp:410-426); here host RAM is the cache and
    the unit is the whole selection: one cap overflow discards
    everything, because a partial prefix doesn't help a second full
    pass without a seek.  Only 8-bit planes spill — the 10-bit encode
    path converts depth at a different pipeline point than the
    analysis pass."""

    def __init__(self, key, cap_bytes: int):
        self.key = key
        self.cap = cap_bytes
        self.frames: list = []
        self.nbytes = 0
        self.complete = True

    def offer(self, planes) -> None:
        if not self.complete:
            return
        if any(p.dtype != np.uint8 for p in planes):
            self._drop()
            return
        # a view pins its WHOLE base: erase_iter yields per-frame views
        # into [batch, H, W] device-result arrays, so retaining one
        # frame would silently hold the full batch and blow the cap's
        # accounting.  Copy such views (a ~2 MB memcpy vs the decode it
        # saves); decoder borrow views (base ~= plane) are kept as-is.
        out = []
        sz = 0
        for p in planes:
            base_bytes = getattr(p.base, "nbytes", p.nbytes)
            if base_bytes > 2 * p.nbytes:
                p = np.ascontiguousarray(p)
            out.append(p)
            sz += p.nbytes
        if self.nbytes + sz > self.cap:
            self._drop()
            return
        self.frames.append(tuple(out))
        self.nbytes += sz

    def _drop(self) -> None:
        self.frames = []
        self.nbytes = 0
        self.complete = False

    def usable(self) -> bool:
        return self.complete and bool(self.frames)


def _analysis_cache_cap(st) -> int:
    """Spill cap: explicit config, else 1/8 of host RAM in [256MB, 4GB]."""
    mb = getattr(st.conf, "analysis_cache_mb", -1)
    if mb >= 0:
        return mb << 20
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (OSError, ValueError, AttributeError):
        return 256 << 20
    return int(min(max(total // 8, 256 << 20), 4 << 30))


def _pump_filtered(fg, frames_iter, pump, batch: int) -> None:
    """Batch the selected source frames through the filter graph, per plane
    (Y/U/V run the same op at their own resolutions), and feed the pump.

    Device batches are double-buffered: batch k's download (the blocking
    np.asarray) happens only after batch k+1's device work has been
    ENQUEUED, so a remote/tunneled device computes while the host drains
    the previous batch and feeds the encoder."""
    from ..models.filter_graph import FilterGraph

    buf: list = []
    prev_planes = None  # last source frame of the previous batch
    start = 0
    fg.defer_download = True
    pending = None  # (outs, n_out) of the not-yet-downloaded batch

    def emit(outs, n_out):
        mats = [o.materialize() if hasattr(o, "materialize") else o
                for o in outs]
        for k in range(n_out):
            pump.put(tuple(_to_depth(mats[p][k], fg.src_bits)
                           for p in range(3)))

    def flush(chunk, next_planes):
        nonlocal prev_planes, start, pending
        if not chunk:
            return
        from ..utils.batching import pad_tail

        outs = []
        n_out = None
        for p in range(3):
            # keep the decoder's uint8 through to the filter graph: every
            # device transfer ships 4x less and widens on device
            if fg.mode in FilterGraph.KFM_FAMILY:
                # VFR synthesis emits a data-dependent frame count; pad
                # short chunks (head ramp / tail) to the steady batch
                # shape with repeats so XLA keeps ONE executable per
                # plane geometry, and restrict the emitted entries to
                # the real range via n_real
                arr = np.stack([f[p] for f in chunk])
                if len(chunk) < batch and not fg.prefers_host():
                    arr = np.concatenate(
                        [arr, np.repeat(arr[-1:], batch - len(chunk),
                                        axis=0)])
                res = fg.run_kfm_batch(
                    arr,
                    None if prev_planes is None else prev_planes[p],
                    start,
                    plane=p,
                    final=next_planes is None,
                    n_real=len(chunk),
                )
                n_out = len(res)
            else:
                # pad the tail to the steady batch shape (one compile);
                # stencil filters are local along the frame axis, so
                # repeated trailing frames cannot change kept outputs
                arr, n_real = pad_tail([f[p] for f in chunk], batch)
                res = fg.run_pass3(
                    arr,
                    None if prev_planes is None else prev_planes[p],
                    None if next_planes is None else next_planes[p],
                    start_index=start,
                    plane=p,
                )
                # pad-and-slice only works for 1:N modes; a decimating
                # mode must fail loudly, not emit padded tail frames
                assert len(res) % len(arr) == 0 and len(res) >= len(arr), (
                    f"filter mode {fg.mode} emits {len(res)} outputs for "
                    f"{len(arr)} inputs; pad-and-slice needs an integer "
                    f"expansion factor")
                n_out = n_real * (len(res) // len(arr))
            outs.append(res)
        prev_planes = chunk[-1]
        start += len(chunk)
        # this batch is enqueued on device: now drain the previous one
        if pending is not None:
            emit(*pending)
        pending = (outs, n_out)

    # head ramp: flush a small first chunk so the encoder starts after
    # ~8 decoded frames instead of a full batch + device round (the
    # chunk is padded to the steady geometry, so no extra XLA compile)
    ramp = min(8, batch)
    for planes in frames_iter:
        buf.append(planes)
        if start == 0 and pending is None and ramp < batch \
                and len(buf) > ramp:
            flush(buf[:ramp], buf[ramp])
            buf = buf[ramp:]
        elif len(buf) > batch:  # keep one lookahead frame (yadif halo)
            flush(buf[:batch], buf[batch])
            buf = buf[batch:]
    flush(buf, None)
    if pending is not None:
        emit(*pending)


def _default_muxer_runner(pipeline: TranscodePipeline, reform,
                          key: EncodeFileKey, res: OutFileResult) -> None:
    """Run the external muxer when one is configured; without a muxer
    binary the bare encoded video stream becomes the output file
    (ref AMTMuxder::mux, Muxer.hpp:40-225)."""
    import shutil as _shutil

    from ..io.muxer import Muxer
    from .encoder_options import parse_encoder_option

    st = pipeline.settings
    file = reform.get_encode_file(key)
    out_path = st.out_file_path(file.out_key, file.key_max)
    if not _shutil.which(st.conf.muxer_path):
        enc_video = st.enc_video_file_path(key)
        if not os.path.exists(enc_video):
            return
        # in-build remux (libavformat): real mp4/mkv with audio + VFR
        # timestamps; bare-stream move only as the last resort
        try:
            from ..video.avdec import avdec_available, remux_files

            if not avdec_available():
                raise RuntimeError("no bridge")
            # produce the per-output audio tracks (incl. dual-mono
            # split) exactly like the external-muxer path would
            mux = Muxer(pipeline.ctx, st, reform,
                        aac_decoder_factory=pipeline.audio_decoder_factory)
            audios = [p for p in mux._write_audio_files(key)
                      if os.path.exists(p)]
            # caption/NicoJK side files (the in-build remux cannot embed
            # subtitle tracks, so every format gets the MP4-style ASS
            # side-file treatment; ref Muxer.hpp:134-167)
            from ..io.muxer import MuxResult

            mres = MuxResult()
            mux._gather_subs(
                key, bool(getattr(pipeline, "_nico_ok", False)), mres,
                copy_out=True)
            res.subs = mres.out_subs
            tc_path = st.enc_timecode_path(key)
            timecodes = None
            if os.path.exists(tc_path):
                with open(tc_path) as f:
                    timecodes = [float(line) for line in f
                                 if not line.startswith("#")]
            spec = getattr(pipeline, "_active_spec", None)
            fmt = (spec.out_format if spec is not None
                   else reform.get_format(key).video_format)
            remux_files(enc_video, audios, out_path,
                        fmt.frame_rate_num or 30000,
                        fmt.frame_rate_denom or 1001, timecodes)
            res.file_size = os.path.getsize(out_path)
            pipeline.ctx.info("[mux] in-build remux -> %s", out_path)
        except Exception as e:  # noqa: BLE001 - fall back to bare stream
            pipeline.ctx.warn("in-build remux unavailable (%s); writing "
                              "the bare stream", e)
            os.replace(enc_video, out_path)
        return
    eo_info = parse_encoder_option(st.conf.encoder, st.conf.encoder_options)
    timecode = st.enc_timecode_path(key)
    mux = Muxer(pipeline.ctx, st, reform,
                aac_decoder_factory=pipeline.audio_decoder_factory)
    result = mux.mux(
        key, eo_info, nico_ok=bool(getattr(pipeline, "_nico_ok", False)),
        vfmt=reform.get_format(key).video_format,
        vfr_timing_fps=getattr(pipeline, "_vfr_timing_fps", 30),
        timecode_path=timecode if os.path.exists(timecode) else "",
    )
    res.subs = result.out_subs
    res.file_size = result.file_size
