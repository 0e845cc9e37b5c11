"""End-to-end pipeline tests: synthetic TS -> demux -> reform -> CM analysis ->
filter -> fake encoder -> output + JSON report (model: the reference's full
`--mode ts` integration tests, AmatsukazeUnitTest.cpp:266-281)."""

import json
import os
import stat
import sys

import numpy as np
import pytest

import ts_gen
from amatsukaze_tpu.pipeline.decoders import NullDecoderFactory
from amatsukaze_tpu.pipeline.settings import Config, Settings, TempDirectory
from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
from amatsukaze_tpu.types import EncodeFileKey
from amatsukaze_tpu.utils.context import AMTContext

W, H = 96, 64


FAKE_ENCODER = """#!/bin/bash
# fake x264: consume y4m from stdin, write it to -o target
out=""
while [ $# -gt 0 ]; do
  case "$1" in
    -o) out="$2"; shift 2;;
    *) shift;;
  esac
done
cat > "$out"
"""


@pytest.fixture
def env(tmp_path):
    src = tmp_path / "src.ts"
    src.write_bytes(ts_gen.build_simple_ts(num_frames=90, width=W, height=H))
    enc = tmp_path / "fake_x264"
    enc.write_text(FAKE_ENCODER)
    enc.chmod(enc.stat().st_mode | stat.S_IEXEC)

    conf = Config()
    conf.src_file_path = str(src)
    conf.out_video_path = str(tmp_path / "out")
    conf.out_info_json_path = str(tmp_path / "result.json")
    conf.work_dir = str(tmp_path)
    conf.encoder_path = str(enc)
    conf.no_remove_tmp = True
    ctx = AMTContext(level="error")
    return ctx, conf, tmp_path


class TestEndToEnd:
    def test_plain_transcode(self, env):
        ctx, conf, tmp = env
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        report = pipe.run()

        # one output file, mp4 default
        assert len(report["outfiles"]) == 1
        out_path = report["outfiles"][0]["path"]
        assert out_path.endswith(".mp4")
        assert os.path.exists(out_path)
        # the fake encoder wrote the y4m stream: verify frame count
        data = open(out_path, "rb").read()
        assert data.startswith(b"YUV4MPEG2")
        assert data.count(b"FRAME\n") == 89  # 90 coded - 1 lost at EOF
        assert f"W{W}".encode() in data[:64]

        # report structure matches the reference's field names
        for field in ("srcpath", "outfiles", "logofiles", "srcfilesize",
                      "intvideofilesize", "outfilesize", "srcduration",
                      "outduration", "audiodiff", "error", "cmanalyze",
                      "nicojk", "trimavs"):
            assert field in report
        assert report["srcfilesize"] > 0
        assert report["intvideofilesize"] > 0
        assert abs(report["srcduration"] - 89 * 1001 / 30000) < 0.2

        # the JSON file was written and parses
        loaded = json.load(open(conf.out_info_json_path))
        assert loaded["outfiles"][0]["path"] == out_path

    def test_cm_mode_no_encode(self, env):
        ctx, conf, tmp = env
        conf.mode = "cm"
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        report = pipe.run()
        assert report["outfilesize"] == 0
        # trim AVS file contract was written
        assert os.path.exists(settings.tmp_trim_avs_path(0))
        assert os.path.exists(settings.tmp_div_path(0))

    def test_cm_split_outputs(self, env):
        ctx, conf, tmp = env
        conf.cm_out_mask = 6  # main + CM split
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        report = pipe.run()
        paths = [o["path"] for o in report["outfiles"]]
        assert len(paths) == 2
        # the first cmtype in the mask becomes the suffix-less default
        # (ref StreamReform.hpp:1018: outKey.cm = BOTH for cmtypes[0])
        assert any(p.endswith("out.mp4") for p in paths)
        assert any(p.endswith("out-cm.mp4") for p in paths)

    def test_audio_dat_written(self, env):
        ctx, conf, tmp = env
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        pipe.run()
        assert os.path.getsize(settings.audio_file_path()) > 0


class TestProbeModes:
    def test_probe_audio(self, env):
        ctx, conf, tmp = env
        from amatsukaze_tpu.pipeline.probe import probe_audio

        settings = Settings(ctx, conf)
        formats = probe_audio(ctx, settings)
        assert len(formats) == 1
        assert "stereo 48000Hz" in formats[0]

    def test_probe_subtitles_none(self, env):
        ctx, conf, tmp = env
        from amatsukaze_tpu.pipeline.probe import probe_subtitles

        settings = Settings(ctx, conf)
        assert probe_subtitles(ctx, settings) is False


class TestCLI:
    def test_arg_parsing(self):
        from amatsukaze_tpu.cli import args_to_config, build_parser

        args = build_parser().parse_args([
            "-i", "in.ts", "-o", "out", "-s", "0x5C38",
            "-et", "x265", "-b", "0.2:300:1.5", "-bcm", "0.6",
            "--splitsub", "--chapter", "-om", "6",
            "--pmt-cut", "0.1:0.2",
        ])
        conf = args_to_config(args)
        assert conf.service_id == 0x5C38
        assert conf.encoder.value == "x265"
        assert conf.auto_bitrate
        assert conf.bitrate.a == 0.2 and conf.bitrate.b == 300
        assert conf.bitrate_cm == 0.6
        assert conf.split_sub and conf.chapter
        assert conf.cm_out_mask == 6
        assert conf.pmt_cut_side_rate == (0.1, 0.2)

    def test_bad_args_error(self):
        from amatsukaze_tpu.cli import build_parser

        with pytest.raises(SystemExit):
            build_parser().parse_args(["-et", "bogus_encoder", "-i", "x"])

    def test_help_runs(self, capsys):
        from amatsukaze_tpu.cli import main

        assert main([]) == 1


SAMPLE_NICOJK_ASS = """[Script Info]
ScriptType: v4.00+

[V4+ Styles]
Format: Name, Fontname, Fontsize, PrimaryColour, SecondaryColour, OutlineColour, BackColour, Bold, Italic, Underline, StrikeOut, ScaleX, ScaleY, Spacing, Angle, BorderStyle, Outline, Shadow, Alignment, MarginL, MarginR, MarginV, Encoding
Style: white,MS PGothic,28,&H00ffffff,&H00ffffff,&H00000000,&H00000000,-1,0,0,0,200,200,0,0.00,1,0,4,7,20,20,40,1

[Events]
Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
Dialogue: 0,0:00:00.50,0:00:02.00,white,,0000,0000,0000,,nico comment
"""


class TestNicoJKWiring:
    def test_nicojk_files_written_and_muxed(self, env):
        ctx, conf, tmp = env
        conf.nicojk_mask = 0b0011  # 720S + 720T
        # fake muxer binary so the Muxer stage (not the replace fallback) runs
        mux_bin = tmp / "fake_muxer"
        mux_bin.write_text(
            "#!/bin/bash\nout=\"\"\nprev=\"\"\n"
            "for a in \"$@\"; do [ \"$prev\" = \"-o\" ] && out=\"$a\"; "
            "prev=\"$a\"; done\necho MUXED > \"$out\"\n")
        mux_bin.chmod(mux_bin.stat().st_mode | stat.S_IEXEC)
        conf.muxer_path = str(mux_bin)
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(
            ctx, settings, decoder_factory=NullDecoderFactory(),
            nicojk_fetchers=[lambda sid, st_, dur: SAMPLE_NICOJK_ASS])
        report = pipe.run()
        assert pipe._nico_ok
        key = EncodeFileKey()
        # S + T variants written with output-relative times
        s_path = settings.tmp_nicojk_ass_path(key, 0)
        t_path = settings.tmp_nicojk_ass_path(key, 1)
        assert os.path.exists(s_path) and os.path.exists(t_path)
        assert "Dialogue:" in open(s_path).read()
        assert "&H70" in open(t_path).read()
        # MP4 => NicoJK ASS copied beside the output
        out = report["outfiles"][0]
        assert any(s.endswith("-nicojk720S.ass") for s in out["subs"])
        assert any(s.endswith("-nicojk720T.ass") for s in out["subs"])

    def test_nicojk_failure_raises(self, env):
        ctx, conf, tmp = env
        conf.nicojk_mask = 1

        def bad(sid, st_, dur):
            raise RuntimeError("down")

        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory(),
                                 nicojk_fetchers=[bad])
        with pytest.raises(RuntimeError, match="NicoJK"):
            pipe.run()

    def test_nicojk_failure_ignored(self, env):
        ctx, conf, tmp = env
        conf.nicojk_mask = 1
        conf.ignore_nicojk_error = True
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(
            ctx, settings, decoder_factory=NullDecoderFactory(),
            nicojk_fetchers=[lambda *a: (_ for _ in ()).throw(RuntimeError())])
        report = pipe.run()
        assert not pipe._nico_ok
        assert len(report["outfiles"]) == 1


class TelecineDecoderFactory:
    """Yields 3:2-pulldown telecined YUV frames (for KFM pipeline tests)."""

    def __init__(self, h=H, w=W):
        self.h, self.w = h, w

    def __call__(self, pipeline, video_index):
        reform = pipeline._reform
        n = len(reform.get_filter_source_frames(video_index))
        h, w = self.h, self.w
        yy, xx = np.mgrid[0:h, 0:w]
        film = [np.clip(
            128 + 80 * np.sin((xx + 8 * i) / 7.0) * np.cos(yy / 9.0), 0, 255
        ).astype(np.float32) for i in range((n * 4) // 5 + 4)]
        u = np.full((h // 2, w // 2), 128, np.uint8)
        count = 0
        i = 0
        while count < n:
            a, b, c, d = film[i:i + 4]

            def wv(top, bot):
                f = np.empty((h, w), np.float32)
                f[0::2] = top[0::2]
                f[1::2] = bot[1::2]
                return f.astype(np.uint8)

            for f in (wv(a, a), wv(a, b), wv(b, c), wv(c, c), wv(d, d)):
                if count < n:
                    yield f, u, u
                    count += 1
            i += 4


class TestFilteredEncode:
    def test_yadif_mode(self, env):
        ctx, conf, tmp = env
        conf.filter_mode = "yadif"
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        assert data.count(b"FRAME\n") == 89  # yadif: same frame count
        assert b"Ip" in data[:64]  # progressive y4m header

    def test_qtgmc_mode(self, env):
        ctx, conf, tmp = env
        conf.filter_mode = "qtgmc"
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        # double-rate: every field becomes a progressive output frame
        assert data.count(b"FRAME\n") == 2 * 89
        assert b"Ip" in data[:64]
        assert b"F60000:1001" in data[:64]  # 2x the 30000/1001 source rate

    def test_kfm_vfr_film(self, env):
        ctx, conf, tmp = env
        conf.filter_mode = "kfm_vfr"
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=TelecineDecoderFactory())
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        # 89 telecined frames = 17 full film cycles (17*4 out frames at
        # 5 units) + a 4-frame partial tail emitted as 30p (4 units each):
        # mixed durations -> VFR with timecodes on the 120/1001 clock
        n_frames = data.count(b"FRAME\n")
        assert n_frames == 17 * 4 + 4
        assert b"F60000:1001" in data[:64]  # 2x timebase for VFR timing
        tc_path = settings.enc_timecode_path(EncodeFileKey())
        assert os.path.exists(tc_path)
        lines = open(tc_path).read().splitlines()
        assert lines[0] == "# timecode format v2"
        assert len(lines) - 1 == n_frames
        # film frames are 5/120s apart, the 30p tail 4/120s
        t0, t1 = float(lines[1]), float(lines[2])
        assert abs((t1 - t0) - 5 * 1001 / 120) < 0.01


class TestAnalysisFrameSpill:
    """KFM analysis-pass frame spill: the encode pass reuses the
    analysis pass's decoded frames when they fit the memory cap (the
    reference pays the same double pass through AMTSource's LRU,
    AMTSource.hpp:410-426).  Output must be bit-identical to the
    decode-twice path, and the cap must disable the spill cleanly."""

    def _run(self, ctx, conf, cache_mb):
        conf.filter_mode = "kfm_vfr"
        conf.analysis_cache_mb = cache_mb
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=TelecineDecoderFactory())
        report = pipe.run()
        return open(report["outfiles"][0]["path"], "rb").read(), pipe

    def test_bit_identical_and_cap(self, env, tmp_path):
        import amatsukaze_tpu.pipeline.transcode as tmod

        ctx, conf, tmp = env
        used = []
        orig = tmod._FrameSpill.usable

        def spy(self):
            r = orig(self)
            used.append(r)
            return r

        tmod._FrameSpill.usable = spy
        try:
            cached, _ = self._run(ctx, conf, cache_mb=-1)  # auto: engages
            assert used and used[-1] is True
            conf.out_video_path = str(tmp_path / "nocache")
            conf.work_dir = str(tmp_path)
            plain, _ = self._run(ctx, conf, cache_mb=0)  # disabled
            assert used[-1] is False
        finally:
            tmod._FrameSpill.usable = orig
        assert cached == plain

    def test_two_pass_rides_cache_both_passes(self, env):
        """passes=[1,2] call the encoder runner twice for the same key:
        both must consume the spill (it is non-destructive and released
        only by _encode_one's finally), so the source decodes exactly
        once for the whole two-pass encode."""
        ctx, conf, tmp = env
        conf.filter_mode = "kfm_vfr"
        conf.two_pass = True
        calls = []
        inner = TelecineDecoderFactory()

        def counting(pipeline, video_index):
            calls.append(video_index)
            return inner(pipeline, video_index)

        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings, decoder_factory=counting)
        report = pipe.run()
        assert report["outfiles"]
        # one decode for analysis; both encode passes fed from the spill
        assert len(calls) == 1, calls
        assert pipe._analysis_spill is None  # released after the file

    def test_erase_plus_kfm_spill_bit_identical(self, env, tmp_path):
        """With a logo eraser active the spill retains POST-erase frames
        and the encode pass must not erase again: output equals the
        decode-twice path (which erases in both passes) bit for bit."""
        ctx, conf, tmp = env
        lt = TestDelogoWiring()
        path, alpha = lt._logo(tmp)
        conf.erase_logo_path = [path]
        conf.filter_mode = "kfm_vfr"

        def run(cache_mb, out):
            conf.analysis_cache_mb = cache_mb
            conf.out_video_path = str(out)
            settings = Settings(ctx, conf)
            pipe = TranscodePipeline(ctx, settings,
                                     decoder_factory=lt._decoder(alpha))
            report = pipe.run()
            return open(report["outfiles"][0]["path"], "rb").read()

        cached = run(-1, tmp_path / "c")
        plain = run(0, tmp_path / "p")
        assert cached == plain
        # and the logo is actually gone in the cached-path output
        off = cached.index(b"FRAME\n") + 6
        y0 = np.frombuffer(cached[off:off + W * H], np.uint8).reshape(H, W)
        center = y0[lt.RY + lt.LH // 2, lt.RX + lt.LW // 2]
        assert abs(int(center) - 128) <= 6, f"logo not erased: {center}"


class TestVfrAutoBitrateScale:
    """Auto bitrate under a VFR plan: non-VFR-aware encoders (everything
    but x264, which takes --tcfile-in) budget bits against their nominal
    fps while the real VFR duration is longer, so the target scales by
    avg/nominal frame duration (ref AdjustVFRBitrate
    FilteredSource.hpp:833-839 via getOptions TranscodeSetting.hpp:
    1080-1083; x264 must NOT scale)."""

    def _target(self, env, encoder_type):
        ctx, conf, tmp = env
        from amatsukaze_tpu.pipeline.settings import Encoder

        conf.filter_mode = "kfm_vfr"
        conf.auto_bitrate = True
        conf.bitrate.a = 0.5
        conf.bitrate.b = 600
        conf.encoder = Encoder(encoder_type)
        captured = []

        def runner(pipeline, reform, key, args):
            captured.append(args)

        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=TelecineDecoderFactory(),
                                 encoder_runner=runner)
        pipe.run()
        import re

        m = re.search(r"--(?:bitrate|la|vbrhq|vbr)\s+(\d+)", captured[0])
        assert m, captured[0]
        return int(m.group(1))

    def test_non_vfr_aware_encoder_scales(self, env, tmp_path):
        qsv = self._target(env, "QSVEnc")
        ctx, conf, tmp = env
        conf.out_video_path = str(tmp_path / "x264out")
        conf.work_dir = str(tmp_path)
        x264 = self._target((ctx, conf, tmp_path), "x264")
        # telecined 89-frame source decimates to ~24p on a 60p-nominal
        # clock: the VFR correction is ~2.4x; x264 rides the timecode
        # file and keeps the unscaled target
        assert qsv > 1.8 * x264, (qsv, x264)
        assert qsv < 3.5 * x264, (qsv, x264)


class TestSimpleMode:
    def test_generic_transcode(self, env):
        ctx, conf, tmp = env
        from amatsukaze_tpu.pipeline.simple import SimpleTranscode
        from amatsukaze_tpu.types import VideoFormat

        src = tmp / "in.avi"
        src.write_bytes(b"fake container bytes")
        conf.src_file_path = str(src)
        settings = Settings(ctx, conf)

        def decoder(path):
            fmt = VideoFormat(width=64, height=48, frame_rate_num=30000,
                              frame_rate_denom=1001, progressive=True,
                              fixed_frame_rate=True)
            y = np.full((48, 64), 99, np.uint8)
            u = np.full((24, 32), 128, np.uint8)
            aud = tmp / "track0.aac"
            aud.write_bytes(b"\xff\xf1AAC")
            return fmt, iter([(y, u, u)] * 12), [str(aud)]

        def muxer_runner(cmd, show):
            out = settings.out_file_path(EncodeFileKey(), EncodeFileKey())
            with open(out, "wb") as f:
                f.write(b"m" * 9)
            return 0

        report = SimpleTranscode(ctx, settings, decoder=decoder,
                                 muxer_runner=muxer_runner).run()
        assert report["outfilesize"] == 9
        data = open(settings.enc_video_file_path(EncodeFileKey()), "rb").read()
        assert data.count(b"FRAME\n") == 12
        assert os.path.getsize(
            settings.int_audio_file_path(EncodeFileKey(), 0)) == 5


class TestCachedFrameSource:
    def _source(self, n=40):
        from amatsukaze_tpu.pipeline.frame_source import CachedFrameSource

        def open_stream():
            return iter([(i, i * 2, i * 3) for i in range(n)])

        return CachedFrameSource(open_stream, cache_frames=8)

    def test_sequential(self):
        src = self._source()
        for i in range(20):
            assert src.get_frame(i)[0] == i
        assert src.num_restarts == 1
        assert src.num_decoded == 20

    def test_small_lookback_hits_cache(self):
        src = self._source()
        src.get_frame(10)
        n = src.num_decoded
        assert src.get_frame(7)[0] == 7  # within the 8-frame cache
        assert src.num_decoded == n

    def test_far_backward_restarts(self):
        src = self._source()
        src.get_frame(30)
        assert src.get_frame(2)[0] == 2
        assert src.num_restarts == 2

    def test_past_eof_substitutes_last(self):
        src = self._source(n=5)
        src.get_frame(4)
        assert src.get_frame(100)[0] == 4  # newest cached frame

    # ---- keyframe byte-seek (ref AMTSource.hpp:721-780) -----------------
    def _seek_source(self, n=100, gop=10, fail_keys=(), ctx=None):
        from amatsukaze_tpu.pipeline.frame_source import CachedFrameSource
        from amatsukaze_tpu.reform.stream_reform import FilterSourceFrame

        meta = [FilterSourceFrame(key_frame=(i // gop) * gop,
                                  file_offset=(i // gop) * gop * 1000)
                for i in range(n)]
        opened = []

        def open_at(key, off):
            assert off == key * 1000  # file_offset drives the seek
            opened.append(key)
            if key in fail_keys:
                return iter(())  # corrupt GOP: yields nothing
            return iter([(i, i * 2, i * 3) for i in range(key, n)])

        def open_stream():
            return iter([(i, i * 2, i * 3) for i in range(n)])

        src = CachedFrameSource(open_stream, cache_frames=8,
                                frames_meta=meta, open_at=open_at, ctx=ctx)
        return src, opened

    def test_backward_seek_is_o_gop(self):
        src, opened = self._seek_source()
        src.get_frame(55)
        n_before = src.num_decoded
        assert src.get_frame(12)[0] == 12
        assert opened[-1] == 10  # sought to frame 12's keyframe
        assert src.num_decoded - n_before == 3  # frames 10..12 only
        assert src.num_restarts == 0  # never restarted from zero

    def test_forward_jump_uses_seek(self):
        src, opened = self._seek_source()
        src.get_frame(2)
        src.get_frame(75)  # far ahead of seek_distance: byte-seek
        assert opened[-1] == 70

    def test_seek_distance_grows(self):
        src, opened = self._seek_source(gop=25)
        src.get_frame(60)  # key 50, distance grows to 10 -> stays >= 10
        assert src.seek_distance >= 10
        src.get_frame(74)  # key 50: 24 ahead of key
        assert src.seek_distance >= 24

    def test_backoff_retries_earlier_keyframe(self):
        from amatsukaze_tpu.utils.context import AMTContext

        ctx = AMTContext(level="error")
        src, opened = self._seek_source(fail_keys={50}, ctx=ctx)
        assert src.get_frame(55)[0] == 55
        # first try at key 50 failed; backed off by max(5, gop)=10
        assert opened == [50, 40]

    def test_failed_frames_capped_at_10pct(self):
        from amatsukaze_tpu.utils.context import AMTContext, FormatError

        ctx = AMTContext(level="error")
        src, opened = self._seek_source(n=100, ctx=ctx)

        def eof_open_at(key, off):
            # decodes a couple of frames then hits EOF
            return iter([(i, 0, 0) for i in range(key, min(key + 2, 100))])

        src.open_at = eof_open_at
        with pytest.raises(FormatError):
            src.get_frame(55)  # only 50-51 decodable: 52..99 failed >10%

    def test_failed_counter_surfaces(self):
        from amatsukaze_tpu.utils.context import AMTContext, ErrorCounter

        ctx = AMTContext(level="error")
        src, opened = self._seek_source(n=100, gop=10,
                                        fail_keys={40, 30, 20}, ctx=ctx)
        # all three attempts (40, then back-offs 30, 20) fail -> frame
        # is registered failed and substituted
        frame = src.get_frame(45)
        assert ctx.error_count(ErrorCounter.DECODE_PACKET_FAILED) >= 1
        assert 45 in src.failed


class TestTwoPassAndPostFilter:
    def test_two_pass_runs_encoder_twice(self, env):
        ctx, conf, tmp = env
        conf.two_pass = True
        settings = Settings(ctx, conf)
        calls = []

        def runner(pipeline, reform, key, args):
            calls.append(args)

        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory(),
                                 encoder_runner=runner)
        pipe.run()
        assert len(calls) == 2
        assert "--pass 1" in calls[0] and "--pass 2" in calls[1]
        assert "--stats" in calls[0]

    def test_post_filter_chain(self, env):
        ctx, conf, tmp = env
        conf.post_filter = "deband,edge"
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        assert data.count(b"FRAME\n") == 89  # frame count preserved

    def test_bad_post_filter_token(self):
        from amatsukaze_tpu.models.filter_graph import build_post_chain

        with pytest.raises(ValueError, match="unknown post-filter"):
            build_post_chain("deband,bogus")
        assert build_post_chain("") is None


class TestDelogoWiring:
    """The encode path must actually erase the matched logo (AMTEraseLogo
    parity) — per-frame fades from the 11-step sweep."""

    LW, LH, RX, RY = 24, 16, 8, 8

    def _logo(self, tmp):
        from amatsukaze_tpu.models.lgd import LogoData, LogoHeader, save_lgd

        yy, xx = np.mgrid[0:self.LH, 0:self.LW]
        r = np.hypot((yy - self.LH / 2) / (self.LH / 2),
                     (xx - self.LW / 2) / (self.LW / 2))
        alpha = (np.clip(1.1 - r, 0, 1) * 0.5).astype(np.float32)
        a = (1.0 / (1.0 - alpha)).astype(np.float32)
        b = (-alpha * 200.0 / (1.0 - alpha) / 255.0).astype(np.float32)
        header = LogoHeader(self.LW, self.LH, 1, 1, W, H, self.RX, self.RY,
                            "e2e", 1)
        logo = LogoData.create(header)
        logo.a_y = a
        logo.b_y = b
        logo.a_u[:] = 1.0
        logo.a_v[:] = 1.0
        path = str(tmp / "e2e.lgd")
        save_lgd(path, logo)
        return path, alpha

    def _decoder(self, alpha):
        rng = np.random.default_rng(7)

        class D:
            def __call__(selfd, pipeline, video_index):
                reform = pipeline._reform
                n = len(reform.get_filter_source_frames(video_index))
                for i in range(n):
                    y = np.full((H, W), 128.0, np.float32)
                    win = y[self.RY:self.RY + self.LH, self.RX:self.RX + self.LW]
                    y[self.RY:self.RY + self.LH, self.RX:self.RX + self.LW] = \
                        (1 - alpha) * win + alpha * 200.0
                    y += rng.normal(0, 0.7, y.shape)
                    u = (122 + 4 * rng.random((H // 2, W // 2))).astype(np.uint8)
                    yield (np.clip(y, 0, 255).astype(np.uint8), u, u)

        return D()

    def test_logo_erased_in_output(self, env):
        ctx, conf, tmp = env
        path, alpha = self._logo(tmp)
        conf.logo_path = [path]
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=self._decoder(alpha))
        report = pipe.run()
        assert report["logofiles"] == [path]
        # parse the fake-encoded y4m: first frame's logo-center pixel must be
        # back near the 128 background (input had ~164 there)
        data = open(report["outfiles"][0]["path"], "rb").read()
        off = data.index(b"FRAME\n") + 6
        y0 = np.frombuffer(data[off:off + W * H], np.uint8).reshape(H, W)
        center = y0[self.RY + self.LH // 2, self.RX + self.LW // 2]
        assert abs(int(center) - 128) <= 6, f"logo not erased: {center}"
        # fade curve was computed and applied
        assert 0 in pipe._fade_curves
        fades = pipe._fade_curves[0][1]
        assert fades.mean() > 0.7  # logo always on

    def test_erase_logo_fade1(self, env):
        ctx, conf, tmp = env
        path, alpha = self._logo(tmp)
        conf.erase_logo_path = [path]  # unconditional erasure, no matching
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=self._decoder(alpha))
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        off = data.index(b"FRAME\n") + 6
        y0 = np.frombuffer(data[off:off + W * H], np.uint8).reshape(H, W)
        center = y0[self.RY + self.LH // 2, self.RX + self.LW // 2]
        assert abs(int(center) - 128) <= 6


class TestJlsCmdWiring:
    """--jls-cmd points at a user JL rule script and must actually change
    the CM decision (ref CMAnalyze.hpp:338-365: join_logo_scp runs with
    the profile's -incmd command file; round 1 accepted the flag but
    never opened the file)."""

    def _scene_decoder(self):
        class D:
            def __call__(selfd, pipeline, video_index):
                reform = pipeline._reform
                n = len(reform.get_filter_source_frames(video_index))
                rng = np.random.default_rng(3)
                for i in range(n):
                    level = (40, 128, 210)[min(i // 30, 2)]
                    y = np.clip(level + rng.normal(0, 2, (H, W)), 0,
                                255).astype(np.uint8)
                    u = np.full((H // 2, W // 2), 128, np.uint8)
                    yield (y, u, u)

        return D()

    def _run_cm(self, env, jl_text):
        ctx, conf, tmp = env
        conf.mode = "cm"
        if jl_text is not None:
            jl = tmp / "user_rules.jl"
            jl.write_text(jl_text)
            conf.jls_cmd_path = str(jl)
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=self._scene_decoder())
        pipe.run()
        from amatsukaze_tpu.models.cm_analyze import parse_trim_avs

        line = open(settings.tmp_trim_avs_path(0)).readline()
        return parse_trim_avs(line, 90)

    def test_jls_cmd_changes_trims(self, env, tmp_path):
        default_trims = self._run_cm(env, None)
        assert default_trims and default_trims[0] == 0
        # fresh working dir for the second run
        ctx, conf, tmp = env
        conf.work_dir = str(tmp_path / "run2")
        os.makedirs(conf.work_dir, exist_ok=True)
        scripted = self._run_cm(env, "AutoEdge S -sec 1\n")
        assert scripted != default_trims
        assert scripted == [] or scripted[0] >= 29  # first ~1 s cut

    def test_jls_option_flags_reach_script(self, env, tmp_path):
        text = ("If CUT_HEAD\n"
                "  AutoEdge S -sec 1\n"
                "EndIf\n")
        ctx, conf, tmp = env
        conf.jls_options = "-CUT_HEAD"
        scripted = self._run_cm(env, text)
        assert scripted == [] or scripted[0] >= 29


class TestExternalCmTools:
    """Configured chapter_exe / join_logo_scp binaries must be spawned
    with the reference argument contracts and take precedence over the
    in-process engines (ref CMAnalyze.hpp:319-365)."""

    FAKE_CHAPTER_EXE = """#!/usr/bin/env python3
import sys
args = sys.argv[1:]
video = args[args.index('-v') + 1]
out = args[args.index('-o') + 1]
open(out, 'w').write('chapter candidates for ' + video + '\\n')
print('fake chapter_exe')
print('----')
print('  SCPos: 30')
print('  SCPos: 60')
"""

    FAKE_JLS = """#!/usr/bin/env python3
import sys
args = sys.argv[1:]
def val(flag):
    return args[args.index(flag) + 1] if flag in args else ''
assert val('-inscp'), 'missing -inscp'
open(val('-inscp')).read()  # the chapter_exe -o file must exist
open(val('-o'), 'w').write('Trim(0,29)++Trim(60,88)\\n')
open(val('-oscp'), 'w').write('0 S 0 0\\n')
open(val('-odiv'), 'w').write('45\\n')
"""

    def _tool(self, tmp, name, body):
        p = tmp / name
        p.write_text(body)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
        return str(p)

    def test_tools_spawned_and_outputs_consumed(self, env):
        ctx, conf, tmp = env
        conf.mode = "cm"
        conf.chapter_exe_path = self._tool(tmp, "fake_chapter_exe",
                                           self.FAKE_CHAPTER_EXE)
        conf.jls_path = self._tool(tmp, "fake_jls", self.FAKE_JLS)
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        pipe.run()
        # chapter_exe's stdout was captured and parsed
        from amatsukaze_tpu.models.cm_analyze import parse_scene_changes_text

        scpos = parse_scene_changes_text(
            open(settings.tmp_chapter_exe_out_path(0)).read())
        assert scpos == [30, 60]
        # join_logo_scp's trim AVS decided the cuts (NOT the in-process
        # engine, which would keep the whole 90-frame clip)
        line = open(settings.tmp_trim_avs_path(0)).readline()
        from amatsukaze_tpu.models.cm_analyze import parse_trim_avs

        assert parse_trim_avs(line, 90) == [0, 30, 60, 89]
        assert open(settings.tmp_div_path(0)).read().split() == ["45"]
        # the -o chapter file fed -inscp
        assert "chapter candidates" in \
            open(settings.tmp_chapter_exe_path(0)).read()

    def test_jls_alone_gets_inprocess_scpos(self, env):
        """Without an external chapter_exe the in-process scene changes
        must reach jls through the scpos file contract."""
        ctx, conf, tmp = env
        conf.mode = "cm"
        conf.jls_path = self._tool(tmp, "fake_jls", self.FAKE_JLS)
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        pipe.run()
        assert os.path.exists(settings.tmp_chapter_exe_path(0))
        line = open(settings.tmp_trim_avs_path(0)).readline()
        from amatsukaze_tpu.models.cm_analyze import parse_trim_avs

        assert parse_trim_avs(line, 90) == [0, 30, 60, 89]

    FAKE_JLS_ARGS = """#!/usr/bin/env python3
import sys
args = sys.argv[1:]
def val(flag):
    return args[args.index(flag) + 1] if flag in args else ''
open(val('-o'), 'w').write('Trim(0,88)\\n')
open(val('-oscp'), 'w').write('0 S 0 0\\n')
open(val('-odiv'), 'w').write('\\n')
import os
open(os.environ['ARGS_OUT'], 'w').write('\\n'.join(args))
"""

    def test_incmd_only_when_configured(self, env, monkeypatch):
        """-incmd must be OMITTED when no JL command file is set
        (the reference only adds it alongside a configured JL file);
        with jls_cmd_path set it must be passed through."""
        ctx, conf, tmp = env
        conf.mode = "cm"
        conf.jls_path = self._tool(tmp, "fake_jls", self.FAKE_JLS_ARGS)
        argfile = tmp / "args.txt"
        monkeypatch.setenv("ARGS_OUT", str(argfile))
        settings = Settings(ctx, conf)
        TranscodePipeline(ctx, settings,
                          decoder_factory=NullDecoderFactory()).run()
        assert "-incmd" not in argfile.read_text().splitlines()

        ctx2, conf2, _ = env
        conf2.mode = "cm"
        conf2.jls_path = conf.jls_path
        cmd_file = tmp / "mycmd.txt"
        cmd_file.write_text("")
        conf2.jls_cmd_path = str(cmd_file)
        settings2 = Settings(ctx2, conf2)
        TranscodePipeline(ctx2, settings2,
                          decoder_factory=NullDecoderFactory()).run()
        lines = argfile.read_text().splitlines()
        assert "-incmd" in lines
        assert lines[lines.index("-incmd") + 1] == str(cmd_file)

    def test_failing_tool_raises(self, env):
        ctx, conf, tmp = env
        conf.mode = "cm"
        conf.chapter_exe_path = self._tool(
            tmp, "bad_tool", "#!/bin/sh\nexit 3\n")
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        from amatsukaze_tpu.utils.context import FormatError

        with pytest.raises(FormatError, match="chapter_exe"):
            pipe.run()


class TestDeblockQp:
    def test_deblock_post_filter_uses_qp_maps(self, tmp_path):
        """Full pipeline with real MPEG2 slice layers: QP maps are
        extracted from the intermediate PS and drive the deblock post
        filter (the reference's KDeblock + patched-decoder qp tables)."""
        import ts_gen
        from amatsukaze_tpu.ts.qp_extract import QpMapSource

        src = tmp_path / "src.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            num_frames=30, width=W, height=H, real_slices=True,
            row_qs=[8, 16, 24, 30]))
        enc = tmp_path / "fake_x264"
        enc.write_text(FAKE_ENCODER)
        enc.chmod(enc.stat().st_mode | stat.S_IEXEC)

        conf = Config()
        conf.src_file_path = str(src)
        conf.out_video_path = str(tmp_path / "out")
        conf.out_info_json_path = str(tmp_path / "result.json")
        conf.work_dir = str(tmp_path)
        conf.encoder_path = str(enc)
        conf.post_filter = "deblock"
        conf.no_remove_tmp = True
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=NullDecoderFactory())
        report = pipe.run()
        assert len(report["outfiles"]) == 1
        data = open(report["outfiles"][0]["path"], "rb").read()
        assert data.count(b"FRAME\n") == 29

        # the intermediate really yields per-MB maps in display order
        qsrc = QpMapSource.from_file(
            pipe.settings.int_video_file_path(0))
        assert len(qsrc) >= 29
        m = qsrc.maps(0, 1)
        assert m.shape[1:] == ((H + 15) // 16, (W + 15) // 16)
        assert sorted(set(int(v) for v in m[0][:, 0])) == [8, 16, 24, 30]


class TestRealVideoDecode:
    """TS with REAL coded MPEG2 video -> pipeline with the in-build
    decoder -> output y4m must contain the true decoded pixels."""

    def test_transcode_decodes_real_pixels(self, env):
        import mpeg2_enc as E
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks

        ctx, conf, tmp = env
        n = 12
        cfg = E.EncConfig(W, H, qs=4, progressive=False, search=1)
        frames = E.synth_frames(W, H, n)
        enc = E.Mpeg2TestEncoder(cfg)
        es = enc.encode(frames, "I" + "P" * (n - 1))
        chunks = list(iter_picture_chunks(es))
        assert len(chunks) == n
        src = tmp / "src.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H, video_es_frames=chunks))
        conf.src_file_path = str(src)

        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        assert len(report["outfiles"]) == 1
        data = open(report["outfiles"][0]["path"], "rb").read()
        assert data.startswith(b"YUV4MPEG2")

        # parse y4m frames and compare with the encoder reconstruction
        fsize = W * H * 3 // 2
        pos = data.index(b"\n") + 1
        got = []
        while pos < len(data):
            hdr_end = data.index(b"\n", pos)
            assert data[pos:hdr_end].startswith(b"FRAME")
            body = data[hdr_end + 1:hdr_end + 1 + fsize]
            if len(body) < fsize:
                break
            got.append(np.frombuffer(body[:W * H], np.uint8).reshape(H, W))
            pos = hdr_end + 1 + fsize
        assert len(got) >= n - 2  # tail frames can be lost at stream EOF
        for i, y in enumerate(got):
            expect = enc.recon[i].y[:H, :W]
            assert np.array_equal(y, expect), f"frame {i} pixels differ"


class TestRealSeekDecode:
    """Byte-seek random access over a real multi-GOP MPEG2 intermediate:
    mpeg2_ps_seek_opener + CachedFrameSource must serve any frame with
    O(GOP) work and pixels identical to sequential decode (ref
    AMTSource.hpp:736-773 keyframe byte-seek)."""

    def test_seek_matches_sequential(self, env):
        import mpeg2_enc as E
        from amatsukaze_tpu.pipeline.decoders import (
            decode_mpeg2_ps_file,
            default_decoder_factory,
            mpeg2_ps_seek_opener,
        )
        from amatsukaze_tpu.pipeline.frame_source import CachedFrameSource
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks

        ctx, conf, tmp = env
        n = 24
        cfg = E.EncConfig(W, H, qs=4, progressive=False, search=1,
                          seq_every_i=True)
        frames = E.synth_frames(W, H, n)
        enc = E.Mpeg2TestEncoder(cfg)
        es = enc.encode(frames, ("I" + "P" * 7) * 3)  # 3 GOPs of 8
        src = tmp / "src.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H,
            video_es_frames=list(iter_picture_chunks(es))))
        conf.src_file_path = str(src)
        conf.mode = "cm"  # run demux + reform only

        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=default_decoder_factory())
        pipe.run()
        reform = pipe._reform
        meta = reform.get_filter_source_frames(0)
        assert len(meta) >= 17
        keys = sorted({m.key_frame for m in meta})
        assert len(keys) == 3, f"expected 3 GOPs, keys={keys}"

        ps_path = settings.int_video_file_path(0)
        sequential = list(decode_mpeg2_ps_file(ps_path))
        fsrc = CachedFrameSource(
            lambda: decode_mpeg2_ps_file(ps_path), cache_frames=4,
            frames_meta=meta, open_at=mpeg2_ps_seek_opener(ps_path),
            ctx=ctx)
        # random access pattern crossing GOPs both ways
        for idx in (12, 3, 20, 9, 17, 0):
            if idx >= len(sequential):
                continue
            y, u, v = fsrc.get_frame(idx)
            assert np.array_equal(y, sequential[idx][0]), f"frame {idx}"
            assert np.array_equal(u, sequential[idx][1])
        assert fsrc.num_restarts == 0
        assert fsrc.num_seeks >= 3
        assert not fsrc.failed


class TestCorruptedTsRobustness:
    """Broadcast captures routinely contain bit errors and signal-drop
    holes; the full pipeline must finish and produce output anyway."""

    def test_corrupted_ts_still_transcodes(self, env):
        import mpeg2_enc as E
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks

        ctx, conf, tmp = env
        n = 12
        cfg = E.EncConfig(W, H, qs=4, progressive=False, search=1)
        es = E.Mpeg2TestEncoder(cfg).encode(E.synth_frames(W, H, n),
                                            "I" + "P" * (n - 1))
        ts = bytearray(ts_gen.build_simple_ts(
            width=W, height=H,
            video_es_frames=list(iter_picture_chunks(es))))
        rng = np.random.default_rng(9)
        for _ in range(60):  # bit errors
            ts[int(rng.integers(0, len(ts)))] = int(rng.integers(0, 256))
        off = int(rng.integers(0, len(ts) - 188 * 8))
        ts[off:off + 188 * 8] = b"\x00" * (188 * 8)  # signal-drop hole
        src = tmp / "bad.ts"
        src.write_bytes(bytes(ts))
        conf.src_file_path = str(src)

        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()  # must not raise
        assert report["outfiles"]
        data = open(report["outfiles"][0]["path"], "rb").read()
        assert data.startswith(b"YUV4MPEG2")
        assert data.count(b"FRAME\n") >= 1


class TestRealVideoKfm:
    """Full production path on REAL coded video: 3:2 hard-telecined
    content -> MPEG2 encode (tests/mpeg2_enc) -> TS mux -> in-build
    decode -> KFM pattern analysis -> VFR plan + timecodes."""

    def test_kfm_vfr_detects_film_from_decoded_stream(self, env):
        import mpeg2_enc as E
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks

        ctx, conf, tmp = env
        n = 45
        yy, xx = np.mgrid[0:H, 0:W]
        film = [np.clip(
            128 + 80 * np.sin((xx + 8 * i) / 7.0) * np.cos(yy / 9.0),
            0, 255).astype(np.float32) for i in range((n * 4) // 5 + 4)]
        uc = np.full((H // 2, W // 2), 128, np.uint8)
        frames = []
        i = 0
        while len(frames) < n:
            a, b, c, d = film[i:i + 4]

            def wv(top, bot):
                f = np.empty((H, W), np.float32)
                f[0::2] = top[0::2]
                f[1::2] = bot[1::2]
                return f.astype(np.uint8)

            for f in (wv(a, a), wv(a, b), wv(b, c), wv(c, c), wv(d, d)):
                if len(frames) < n:
                    frames.append(E.Plane3(f, uc, uc))
            i += 4

        enc = E.Mpeg2TestEncoder(
            E.EncConfig(W, H, qs=2, progressive=False, search=2))
        es = enc.encode(frames, "I" + "P" * (n - 1))
        chunks = list(iter_picture_chunks(es))
        src = tmp / "src.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H, video_es_frames=chunks))
        conf.src_file_path = str(src)
        conf.filter_mode = "kfm_vfr"
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        # 44 usable frames (one lost at EOF) = 8 full film cycles
        # (8*4 out frames) + 4-frame partial tail emitted as 30p
        n_frames = data.count(b"FRAME\n")
        assert n_frames == 8 * 4 + 4
        tc_path = settings.enc_timecode_path(EncodeFileKey())
        lines = open(tc_path).read().splitlines()
        assert lines[0] == "# timecode format v2"
        assert len(lines) - 1 == n_frames
        # film cadence: 5/120s spacing on the 120/1001 clock
        t0, t1 = float(lines[1]), float(lines[2])
        assert abs((t1 - t0) - 5 * 1001 / 120) < 0.01


class TestFpsModesE2E:
    """The new fps modes through the FULL pipeline on real coded video
    (ref FilterFPS matrix, EncodeServerData.cs:118 + Misc.cs:1346-1389)."""

    def _telecined_ts(self, tmp, n=45):
        import mpeg2_enc as E
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks

        yy, xx = np.mgrid[0:H, 0:W]
        film = [np.clip(
            128 + 80 * np.sin((xx + 8 * i) / 7.0) * np.cos(yy / 9.0),
            0, 255).astype(np.float32) for i in range((n * 4) // 5 + 4)]
        uc = np.full((H // 2, W // 2), 128, np.uint8)
        frames = []
        i = 0
        while len(frames) < n:
            a, b, c, d = film[i:i + 4]

            def wv(top, bot):
                f = np.empty((H, W), np.float32)
                f[0::2] = top[0::2]
                f[1::2] = bot[1::2]
                return f.astype(np.uint8)

            for f in (wv(a, a), wv(a, b), wv(b, c), wv(c, c), wv(d, d)):
                if len(frames) < n:
                    frames.append(E.Plane3(f, uc, uc))
            i += 4
        enc = E.Mpeg2TestEncoder(
            E.EncConfig(W, H, qs=2, progressive=False, search=2,
                        seq_every_i=True))
        es = enc.encode(frames, ("I" + "P" * 8) * 5)
        chunks = list(iter_picture_chunks(es))
        src = tmp / "src.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H, video_es_frames=chunks))
        return str(src)

    def test_autovfr_e2e(self, env):
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory

        ctx, conf, tmp = env
        conf.src_file_path = self._telecined_ts(tmp)
        conf.filter_mode = "autovfr"
        conf.autovfr_parallel = 2
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        # same film cadence as kfm_vfr: 8 full cycles x 4 + 4-frame tail
        assert data.count(b"FRAME\n") == 8 * 4 + 4
        # AutoVfr file contracts in the temp dir
        prefix = settings.tmp_autovfr_prefix(0)
        assert os.path.exists(prefix + ".autovfr.def")
        assert os.path.exists(prefix + ".autovfr1.log")
        lines = [ln for ln in open(prefix + ".autovfr.def")
                 if not ln.startswith("#")]
        assert all(int(ln.split()[2]) in (24, 30, 60) for ln in lines)

    def test_svp_e2e(self, env):
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory

        ctx, conf, tmp = env
        conf.src_file_path = self._telecined_ts(tmp)
        conf.filter_mode = "svp"
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        # 44 usable source frames -> 40 in full cycles -> 32 film frames
        # -> ceil(32 * 2.5) = 80 at CFR 60p
        assert data.count(b"FRAME\n") == 80
        # CFR: no timecode file written
        assert not os.path.exists(settings.enc_timecode_path(EncodeFileKey()))


class TestReferenceCliCompat:
    """Reference-style command lines must parse (drop-in compat,
    ref AmatsukazeCLI.hpp:171-555 flag set), incl. the '--serivceid'
    spelling the reference actually uses."""

    def test_reference_flags_accepted(self):
        from amatsukaze_tpu.cli import args_to_config, build_parser

        args = build_parser().parse_args([
            "-i", "in.ts", "-o", "out", "--serivceid", "0x400",
            "--mpeg2decoder", "CUVID", "--h264decoder", "QSV",
            "--affinity", "0:1",
            "--chapter-exe", "chapter_exe.exe",
            "--chapter-exe-options=-m 3",
            "--jls", "join_logo_scp.exe",
            "--nicoass", "NicoConvASS.exe",
            "--systemavsplugin", "plugins",
            "--resource-manager", "3:4", "--args"])
        conf = args_to_config(args)
        assert conf.service_id == 0x400
        # hardware decoder names map to the auto default backend
        assert conf.mpeg2_decoder == "default"
        assert conf.h264_decoder == "default"
        assert conf.chapter_exe_path == "chapter_exe.exe"
        assert conf.jls_path == "join_logo_scp.exe"
        assert conf.chapter_exe_options == "-m 3"
        assert conf.nico_conv_ass_path == "NicoConvASS.exe"

    def test_decoder_backend_selection(self):
        from amatsukaze_tpu.cli import args_to_config, build_parser

        args = build_parser().parse_args(
            ["-i", "x.ts", "--mpeg2decoder", "native",
             "--h264decoder", "cv2"])
        conf = args_to_config(args)
        assert conf.mpeg2_decoder == "native"
        assert conf.h264_decoder == "cv2"


class TestStandaloneLogoScan:
    """Logo-generation wizard fully standalone: logo burned into real
    frames -> MPEG2 encode -> TS mux -> in-build demux+decode
    (decoders.inbuild_generic_decoder, the ScanLogo default when no
    ffmpeg binary exists) -> 3-pass LogoAnalyzer -> recovered A/B close
    to the truth."""

    def test_scan_from_encoded_ts(self, tmp_path):
        import mpeg2_enc as E
        from test_models_logo import frame_with_logo, synth_logo_ab
        from amatsukaze_tpu.models.logo import LogoAnalyzer, ScanRegion
        from amatsukaze_tpu.pipeline.decoders import inbuild_generic_decoder
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks
        from amatsukaze_tpu.utils.context import AMTContext

        a_true, b_true, alpha = synth_logo_ab()
        rng = np.random.default_rng(0)
        n = 180
        frames = []
        for i in range(n):
            bg = float(rng.uniform(30, 140))
            y, u, v = frame_with_logo(bg, alpha, on=rng.random() < 0.8)
            frames.append(E.Plane3(np.clip(y, 0, 255).astype(np.uint8),
                                   np.clip(u, 0, 255).astype(np.uint8),
                                   np.clip(v, 0, 255).astype(np.uint8)))
        enc = E.Mpeg2TestEncoder(
            E.EncConfig(96, 64, qs=2, progressive=False, search=0))
        es = enc.encode(frames, "I" * n)  # intra-only: fast + high quality
        chunks = list(iter_picture_chunks(es))
        src = tmp_path / "logo.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=96, height=64, video_es_frames=chunks))

        fmt, frame_iter, _ = inbuild_generic_decoder(str(src))
        assert (fmt.width, fmt.height) == (96, 64)
        ctx = AMTContext(level="error")
        an = LogoAnalyzer(ctx, ScanRegion(8, 8, 24, 16), thy=12, batch=64)
        logo = an.scan(frame_iter, fmt.width, fmt.height,
                       name="scanned", service_id=7)
        assert logo is not None
        core = alpha > 0.15
        np.testing.assert_allclose(logo.a_y[core], a_true[core], atol=0.1)
        np.testing.assert_allclose(logo.b_y[core], b_true[core], atol=0.06)


class TestSimpleModeInbuild:
    def test_generic_mode_with_inbuild_decoder(self, env):
        """--mode g on an MPEG-PS file through the standalone decoder
        (no ffmpeg binary): real decoded pixels reach the encoder."""
        import mpeg2_enc as E
        from amatsukaze_tpu.pipeline.decoders import inbuild_generic_decoder
        from amatsukaze_tpu.pipeline.simple import SimpleTranscode

        ctx, conf, tmp = env
        # raw ES file is enough (sniffed as non-TS)
        frames = E.synth_frames(96, 64, 8)
        enc = E.Mpeg2TestEncoder(E.EncConfig(96, 64, qs=4,
                                             progressive=True))
        es = enc.encode(frames, "IPPPPPPP")
        src = tmp / "in.m2v"
        src.write_bytes(es)
        conf.src_file_path = str(src)
        settings = Settings(ctx, conf)

        def muxer_runner(cmd, show):
            out = settings.out_file_path(EncodeFileKey(), EncodeFileKey())
            with open(out, "wb") as f:
                f.write(b"ok")
            return 0

        st = SimpleTranscode(ctx, settings,
                             decoder=inbuild_generic_decoder,
                             muxer_runner=muxer_runner)
        st.run()
        from amatsukaze_tpu.types import EncodeFileKey as _K
        data = open(settings.enc_video_file_path(_K()), "rb").read()
        assert data.startswith(b"YUV4MPEG2")
        assert data.count(b"FRAME\n") == 8
        # first decoded luma byte-exact against the encoder recon
        i = data.index(b"FRAME\n") + 6
        y0 = np.frombuffer(data[i:i + 96 * 64], np.uint8).reshape(64, 96)
        assert np.array_equal(y0, enc.recon[0].y[:64, :96])


class TestCachedFrameSourceEdges:
    def test_seek_mode_beyond_frame_list_substitutes(self):
        from amatsukaze_tpu.pipeline.frame_source import CachedFrameSource
        from amatsukaze_tpu.reform.stream_reform import FilterSourceFrame

        meta = [FilterSourceFrame(key_frame=0, file_offset=0)
                for _ in range(10)]

        def open_at(k, off):
            return iter([(i, 0, 0) for i in range(k, 10)])

        src = CachedFrameSource(
            lambda: iter([(i, 0, 0) for i in range(10)]),
            frames_meta=meta, open_at=open_at)
        src.get_frame(5)
        assert src.get_frame(50)[0] == 9  # last frame substituted


    def test_backoff_resnaps_onto_keyframe(self):
        """With GOPs shorter than the fixed 5-frame back-off step, a
        retry must land on a real keyframe (regression: key -= max(5,..)
        could land mid-GOP and desync every cached index)."""
        from amatsukaze_tpu.pipeline.frame_source import CachedFrameSource
        from amatsukaze_tpu.reform.stream_reform import FilterSourceFrame

        meta = [FilterSourceFrame(key_frame=(i // 3) * 3, file_offset=i)
                for i in range(30)]
        opened = []
        fail_first = [True]

        def open_at(k, off):
            opened.append(k)
            assert meta[k].key_frame == k, f"seek to non-keyframe {k}"
            if fail_first[0]:
                fail_first[0] = False
                raise IOError("corrupt GOP")
            return iter([(i, 0, 0) for i in range(k, 30)])

        src = CachedFrameSource(lambda: iter([]), frames_meta=meta,
                                open_at=open_at, seek_distance=1)
        assert src.get_frame(27)[0] == 27
        assert len(opened) == 2 and opened[1] < opened[0]

    def test_head_failure_has_no_negative_substitute(self):
        """When nothing at all decodes, the failed-frame map must not
        point at -1 (regression: substitute could chase meta[-1])."""
        from amatsukaze_tpu.pipeline.frame_source import CachedFrameSource
        from amatsukaze_tpu.reform.stream_reform import FilterSourceFrame

        meta = [FilterSourceFrame(key_frame=0, file_offset=0)
                for _ in range(10)]

        def open_at(k, off):
            raise IOError("dead stream")

        src = CachedFrameSource(lambda: iter([]), frames_meta=meta,
                                open_at=open_at, seek_distance=1)
        with pytest.raises(IndexError):
            src.get_frame(3)
        assert all(v >= 0 for v in src.failed.values())
        assert all(k != v for k, v in src.failed.items())


class TestResizeE2E:
    def test_resize_through_cli_pipeline(self, env):
        """--resize must change the encoder input dimensions + SAR
        through the whole pipeline (ref EnableResize -> BlackmanResize +
        MakeOutFormat SAR reset)."""
        ctx, conf, tmp = env
        conf.filter_mode = "yadif"
        conf.resize_width, conf.resize_height = 64, 48
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        header = data[:data.index(b"\n")].decode()
        assert "W64" in header and "H48" in header
        assert "A1:1" in header  # SAR reset to square
        fsize = 64 * 48 * 3 // 2
        assert data.count(b"FRAME\n") == 89
        # frame payloads really are the resized size
        first = data.index(b"FRAME\n") + 6
        second = data.index(b"FRAME\n", first)
        assert second - first == fsize


class TestSweepFrameCache:
    """Decoded-frame reuse across pipeline sweeps (frame_source.SweepFrameCache)."""

    def _frames(self, n, w=8, h=8):
        return [(np.full((h, w), i, np.uint8),
                 np.full((h // 2, w // 2), i, np.uint8),
                 np.full((h // 2, w // 2), i, np.uint8)) for i in range(n)]

    def test_records_then_replays(self):
        from amatsukaze_tpu.pipeline.frame_source import SweepFrameCache

        cache = SweepFrameCache(1 << 20)
        frames = self._frames(5)
        calls = {"n": 0}

        def opener():
            calls["n"] += 1
            return iter(frames)

        out1 = list(cache.stream(0, opener))
        out2 = list(cache.stream(0, opener))
        assert calls["n"] == 1
        assert cache.hits == 1
        assert all((a[0] == b[0]).all() for a, b in zip(out1, out2))

    def test_budget_fallback(self):
        from amatsukaze_tpu.pipeline.frame_source import SweepFrameCache

        cache = SweepFrameCache(100)  # < one frame
        frames = self._frames(3)
        calls = {"n": 0}

        def opener():
            calls["n"] += 1
            return iter(frames)

        assert len(list(cache.stream(0, opener))) == 3
        assert len(list(cache.stream(0, opener))) == 3
        assert calls["n"] == 2  # too big: every sweep decodes
        assert cache.hits == 0

    def test_abandoned_sweep_leaves_no_partial(self):
        from amatsukaze_tpu.pipeline.frame_source import SweepFrameCache

        cache = SweepFrameCache(1 << 20)
        frames = self._frames(5)
        it = cache.stream(0, lambda: iter(frames))
        next(it)
        it.close()  # consumer died mid-stream (e.g. encoder failure)
        out = list(cache.stream(0, lambda: iter(frames)))
        assert len(out) == 5
        # and the complete second sweep recorded for the third
        assert cache.hits == 0
        assert len(list(cache.stream(0, lambda: (_ for _ in ()).throw(
            AssertionError("should replay"))))) == 5

    def test_videos_accounted_separately(self):
        from amatsukaze_tpu.pipeline.frame_source import SweepFrameCache

        per_frame = sum(p.nbytes for p in self._frames(1)[0])
        cache = SweepFrameCache(per_frame * 4)
        assert len(list(cache.stream(0, lambda: iter(self._frames(3))))) == 3
        # 3 frames cached; a second video of 3 frames exceeds the budget
        assert len(list(cache.stream(1, lambda: iter(self._frames(3))))) == 3
        list(cache.stream(1, lambda: iter(self._frames(3))))
        assert cache.hits == 0  # video 1 never fit
        list(cache.stream(0, lambda: iter([])))
        assert cache.hits == 1  # video 0 replays


class TestInProcessEncoder:
    def test_shim_argv_detection(self):
        from amatsukaze_tpu.pipeline.transcode import _inprocess_encoder_argv

        argv = _inprocess_encoder_argv(
            '"/usr/bin/python3" -m amatsukaze_tpu.tools.x264_shim '
            "--shim-codec libx264 --crf 21 -o /tmp/out.264")
        assert argv == ["--shim-codec", "libx264", "--crf", "21",
                        "-o", "/tmp/out.264"]
        assert _inprocess_encoder_argv("x264 --crf 21 -o out.264") is None
        assert _inprocess_encoder_argv('bad "quote') is None

    def test_sink_encodes(self, tmp_path):
        from amatsukaze_tpu.io.y4m import Y4MFormat
        from amatsukaze_tpu.pipeline.transcode import _InProcessEncoderSink
        from amatsukaze_tpu.video.avdec import avdec_available

        if not avdec_available():
            pytest.skip("FFmpeg bridge unavailable")
        out = str(tmp_path / "out.264")
        fmt = Y4MFormat(width=64, height=48, interlaced=False)
        sink = _InProcessEncoderSink(
            ["--shim-codec", "libx264", "--crf", "30", "-o", out], fmt)
        rng = np.random.default_rng(0)
        for _ in range(6):
            sink.write_frame(
                rng.integers(0, 255, (48, 64), dtype=np.uint8),
                rng.integers(0, 255, (24, 32), dtype=np.uint8),
                rng.integers(0, 255, (24, 32), dtype=np.uint8))
        assert sink.join() == 0
        data = open(out, "rb").read()
        assert data[:4] in (b"\x00\x00\x00\x01", b"\x00\x00\x01\x67")
        from amatsukaze_tpu.video.avdec import AvVideoDecoder

        dec = AvVideoDecoder(out)
        assert len(list(dec.frames())) == 6


class TestBroadcastCapstone:
    """BASELINE config 5 shape: a multi-service TS with ARIB captions and
    dual-mono AAC through the full pipeline (service selection by id,
    --subtitles caption decode -> ASS/SRT, dual-mono split at mux;
    ref transcodeMain + CaptionConsumer + SpDualMonoSplitter)."""

    def make_dual_mono_adts(self, amp0=30, amp1=50):
        sys.path.insert(0, os.path.dirname(__file__))
        import aac_gen
        from amatsukaze_tpu.audio import aac_tables as T

        swb = T.SWB_OFFSETS[(1024, 48000)]
        sfb = 8
        width = swb[sfb + 1] - swb[sfb]
        v0 = [0] * width
        v0[0] = amp0
        v1 = [0] * width
        v1[1] = amp1

        def payload(w):
            aac_gen.make_sce(w, {sfb: v0}, global_gain=160)
            aac_gen.make_sce(w, {sfb: v1}, global_gain=160)

        return aac_gen.make_adts_frame(payload, channel_config=0)

    def build_ts(self):
        caption_groups = [
            (3, ts_gen.caption_management_group()),
            (5, ts_gen.caption_statement_group(
                b"\x0c"  # CS (clear)
                + b"\x1c" + bytes([0x40 + 12, 0x40])  # APS row 12
                + ts_gen.arib_ascii("HELLO CAPTION"))),
            (60, ts_gen.caption_statement_group(b"\x0c")),  # clear
        ]
        return ts_gen.build_simple_ts(
            num_frames=90, width=W, height=H, si=True,
            caption_groups=caption_groups,
            audio_es_frames=[self.make_dual_mono_adts()] * 200,
            extra_services=[(0x0401, 0x01F1), (0x0402, 0x01F2)],
            extra_services_first=True,
        )

    @pytest.fixture
    def cap_env(self, env):
        ctx, conf, tmp = env
        src = tmp / "cap_src.ts"
        src.write_bytes(self.build_ts())
        conf.src_file_path = str(src)
        conf.subtitles = True
        conf.service_id = ts_gen.SERVICE_ID
        return ctx, conf, tmp

    def test_captions_and_dual_mono(self, cap_env):
        ctx, conf, tmp = cap_env
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        report = pipe.run()

        # the right service was picked among the decoys
        assert pipe.actual_service_id == ts_gen.SERVICE_ID

        # caption text reached the muxed ASS/SRT outputs
        key = EncodeFileKey()
        ass = open(settings.tmp_ass_path(key, 0), encoding="utf-8").read()
        assert "HELLO CAPTION" in ass
        srt = open(settings.tmp_srt_path(key, 0), encoding="utf-8").read()
        assert "HELLO CAPTION" in srt
        subs = report["outfiles"][0]["subs"]
        assert any(p.endswith(".ass") for p in subs)

        # dual-mono split into two mono AAC tracks at mux time
        a0 = settings.int_audio_file_path(key, 0)
        a1 = settings.int_audio_file_path(key, 1)
        assert os.path.getsize(a0) > 0 and os.path.getsize(a1) > 0
        from amatsukaze_tpu.audio.aac import AacLcDecoder

        for path in (a0, a1):
            data = open(path, "rb").read()
            res = AacLcDecoder().decode(data)
            assert res is not None and res.num_channels == 1

    def test_subtitles_off_drops_captions(self, cap_env):
        ctx, conf, tmp = cap_env
        conf.subtitles = False
        settings = Settings(ctx, conf)
        pipe = TranscodePipeline(ctx, settings,
                                 decoder_factory=NullDecoderFactory())
        pipe.run()
        assert not os.path.exists(settings.tmp_ass_path(EncodeFileKey(), 0))

    def build_drcs_ts(self):
        pattern = bytes([0xF0, 0xF0])
        caption_groups = [
            (3, ts_gen.caption_management_group()),
            (4, ts_gen.caption_statement_group(
                ts_gen.caption_drcs_du(0x41, 0x21, pattern=pattern),
                unit_parameter=0x30)),
            (5, ts_gen.caption_statement_group(
                b"\x0c" + b"\x1b\x29\x20\x41" + b"\x0e" + b"\x21" + b"\x0f"
                + ts_gen.arib_ascii(" GAIJI"))),
        ]
        from amatsukaze_tpu.captions.b24 import drcs_md5

        return ts_gen.build_simple_ts(
            num_frames=90, width=W, height=H,
            caption_groups=caption_groups,
        ), drcs_md5(4, 4, 2, pattern)

    def test_unmapped_drcs_exits_101(self, env, tmp_path):
        """Reference contract: unmapped DRCS aborts with AMT_NO_DRCS
        unless --ignore-no-drcsmap; the bitmap lands beside the map file
        for the mapping workflow (ref TranscodeManager + DRCSManager)."""
        from amatsukaze_tpu import cli

        ctx, conf, tmp = env
        data, md5 = self.build_drcs_ts()
        src = tmp / "drcs_src.ts"
        src.write_bytes(data)
        drcs_dir = tmp_path / "drcs"
        drcs_dir.mkdir()
        map_path = drcs_dir / "drcs_map.txt"
        map_path.write_text("")
        args = ["-i", str(src), "-o", str(tmp / "dout"), "-w",
                str(tmp / "dwork"), "--mode", "ts", "--subtitles",
                "-e", conf.encoder_path, "--drcs", str(map_path)]
        assert cli.main(args) == cli.EXIT_NO_DRCS
        assert (drcs_dir / f"{md5}.bmp").exists()

        # mapped: the replacement text reaches the ASS output
        map_path.write_text(f"{md5}=#\n")
        out2 = tmp / "dout2"
        assert cli.main(["-i", str(src), "-o", str(out2), "-w",
                         str(tmp / "dwork2"), "--mode", "ts", "--subtitles",
                         "-e", conf.encoder_path, "--drcs", str(map_path),
                         "--no-remove-tmp"]) == 0
        ass = (tmp / "dout2.ass").read_text(encoding="utf-8")
        assert "# GAIJI" in ass

        # unmapped but --ignore-no-drcsmap: completes with placeholder
        out3 = tmp / "dout3"
        map_path.write_text("")
        assert cli.main(["-i", str(src), "-o", str(out3), "-w",
                         str(tmp / "dwork3"), "--mode", "ts", "--subtitles",
                         "-e", conf.encoder_path, "--drcs", str(map_path),
                         "--ignore-no-drcsmap"]) == 0
        assert "□ GAIJI" in (tmp / "dout3.ass").read_text(encoding="utf-8")

    def test_drcs_mode_dumps_bitmaps(self, env, tmp_path):
        """`--mode drcs` scans the TS and saves unmapped DRCS bitmaps
        beside the --drcs map file (ref searchDrcsMain :1102-1110)."""
        from amatsukaze_tpu import cli

        ctx, conf, tmp = env
        data, md5 = self.build_drcs_ts()
        src = tmp / "scan_src.ts"
        src.write_bytes(data)
        drcs_dir = tmp_path / "scan_drcs"
        drcs_dir.mkdir()
        (drcs_dir / "drcs_map.txt").write_text("")
        assert cli.main(["-i", str(src), "-w", str(tmp / "swork"),
                         "--mode", "drcs",
                         "--drcs", str(drcs_dir / "drcs_map.txt")]) == 0
        assert (drcs_dir / f"{md5}.bmp").exists()

    def test_probe_subtitles_detects_captions(self, cap_env):
        from amatsukaze_tpu.pipeline.probe import probe_subtitles

        ctx, conf, tmp = cap_env
        assert probe_subtitles(ctx, Settings(ctx, conf)) is True
