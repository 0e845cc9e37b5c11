"""Muxer stage tests (ref AMTMuxder, Muxer.hpp)."""

import os

import pytest

from amatsukaze_tpu.io.muxer import (
    AudioCache,
    Muxer,
    MuxResult,
    SimpleMuxer,
    adjust_video_format,
)
from amatsukaze_tpu.pipeline.encoder_options import EncoderDeint, EncoderOptionInfo
from amatsukaze_tpu.pipeline.settings import (
    Config,
    OutputFormat,
    Settings,
    TempDirectory,
)
from amatsukaze_tpu.reform.stream_reform import EncodeFileOutput, OutVideoFormat
from amatsukaze_tpu.types import (
    AudioChannels,
    AudioFormat,
    EncodeFileKey,
    VideoFormat,
    VideoStreamFormat,
)


class FakeReform:
    def __init__(self, file, fmt, audio_path_offsets=None):
        self.file = file
        self.fmt = fmt
        self.offsets = audio_path_offsets or [0]

    def get_encode_file(self, key):
        return self.file

    def get_format(self, key):
        return self.fmt

    def get_audio_file_offsets(self):
        return self.offsets


@pytest.fixture
def env(ctx, tmp_path):
    conf = Config(work_dir=str(tmp_path), out_video_path=str(tmp_path / "out"),
                  format=OutputFormat.MP4)
    st = Settings(ctx, conf, TempDirectory(str(tmp_path), keep=True))
    key = EncodeFileKey()
    file = EncodeFileOutput(key=key, out_key=key, key_max=key)
    fmt = OutVideoFormat(video_format=VideoFormat(
        format=VideoStreamFormat.H264, width=1440, height=1080,
        frame_rate_num=30000, frame_rate_denom=1001, fixed_frame_rate=True,
        progressive=False))
    return ctx, st, key, file, fmt


def make_audio(st, file, fmt, n_tracks=1, frames_per_track=3):
    """Write a fake demuxed ADTS blob + offsets."""
    blob = b""
    offsets = [0]
    frame_lists = []
    for t in range(n_tracks):
        frames = []
        for i in range(frames_per_track):
            frames.append(len(offsets) - 1)
            blob += bytes([t * 16 + i]) * 8
            offsets.append(len(blob))
        frame_lists.append(frames)
        fmt.audio_format.append(AudioFormat(AudioChannels.STEREO, 48000))
    with open(st.audio_file_path(), "wb") as f:
        f.write(blob)
    file.audio_frames = frame_lists
    return offsets


class TestAudioCache:
    def test_random_access(self, tmp_path):
        p = str(tmp_path / "a.aac")
        with open(p, "wb") as f:
            f.write(b"aaabbcccc")
        cache = AudioCache(p, [0, 3, 5, 9])
        assert cache[0] == b"aaa"
        assert cache[1] == b"bb"
        assert cache[2] == b"cccc"


class TestAdjustVideoFormat:
    def test_deint_24p(self):
        v = VideoFormat(frame_rate_num=30000, frame_rate_denom=1001,
                        progressive=False)
        out = adjust_video_format(v, EncoderOptionInfo(deint=EncoderDeint.D24P))
        assert out.frame_rate_num == 24000 and out.progressive

    def test_deint_60p(self):
        v = VideoFormat(frame_rate_num=30000, frame_rate_denom=1001,
                        progressive=False)
        out = adjust_video_format(v, EncoderOptionInfo(deint=EncoderDeint.D60P))
        assert out.frame_rate_num == 60000 and out.progressive

    def test_select_every(self):
        v = VideoFormat(frame_rate_num=60000, frame_rate_denom=1001,
                        progressive=True)
        out = adjust_video_format(v, EncoderOptionInfo(select_every=2))
        assert out.frame_rate_num == 30000


class TestMuxer:
    def test_mp4_basic(self, env):
        ctx, st, key, file, fmt = env
        offsets = make_audio(st, file, fmt)
        reform = FakeReform(file, fmt, offsets)
        cmds = []

        def runner(cmd, show):
            cmds.append(cmd)
            out = st.out_file_path(file.out_key, file.key_max)
            with open(out, "wb") as f:
                f.write(b"x" * 77)
            return 0

        mux = Muxer(ctx, st, reform, runner=runner)
        res = mux.mux(key, EncoderOptionInfo(), False, fmt.video_format)
        assert len(cmds) == 1
        assert "muxer" in cmds[0]
        # raw AAC track was materialised
        apath = st.int_audio_file_path(key, 0)
        assert os.path.getsize(apath) == 24
        assert res.file_size == 77

    def test_mux_failure_raises(self, env):
        ctx, st, key, file, fmt = env
        reform = FakeReform(file, fmt)
        mux = Muxer(ctx, st, reform, runner=lambda cmd, show: 1)
        with pytest.raises(RuntimeError, match="mux failed"):
            mux.mux(key, EncoderOptionInfo(), False, fmt.video_format)

    def test_mkv_subs_embedded(self, env):
        ctx, st, key, file, fmt = env
        st.conf.format = OutputFormat.MKV
        file.caption_list = [[object()]]
        with open(st.tmp_ass_path(key, 0), "w") as f:
            f.write("ass")
        reform = FakeReform(file, fmt)
        cmds = []
        mux = Muxer(ctx, st, reform,
                    runner=lambda cmd, show: (cmds.append(cmd), 0)[1])
        res = mux.mux(key, EncoderOptionInfo(), False, fmt.video_format)
        assert "--track-name \"0:ASS\"" in cmds[0]
        assert not res.out_subs

    def test_mp4_subs_copied_out(self, env):
        ctx, st, key, file, fmt = env
        file.caption_list = [[object()]]
        with open(st.tmp_ass_path(key, 0), "w") as f:
            f.write("ass")
        reform = FakeReform(file, fmt)
        mux = Muxer(ctx, st, reform, runner=lambda cmd, show: 0)
        res = mux.mux(key, EncoderOptionInfo(), False, fmt.video_format)
        assert len(res.out_subs) == 1
        assert os.path.exists(res.out_subs[0])
        assert res.out_subs[0].endswith(".ass")

    def test_copy_out_gathers_srt_side_file(self, env):
        # in-build remux path (copy_out=True) cannot embed tracks: SRT
        # becomes an out-path side file next to the ASS (advisor r2)
        ctx, st, key, file, fmt = env
        file.caption_list = [[object()]]
        with open(st.tmp_ass_path(key, 0), "w") as f:
            f.write("ass")
        with open(st.tmp_srt_path(key, 0), "w") as f:
            f.write("srt")
        reform = FakeReform(file, fmt)
        mux = Muxer(ctx, st, reform, runner=lambda cmd, show: 0)
        from amatsukaze_tpu.io.muxer import MuxResult
        res = MuxResult()
        subs_files, _ = mux._gather_subs(key, False, res, copy_out=True)
        assert not subs_files  # nothing left to embed
        exts = sorted(os.path.splitext(p)[1] for p in res.out_subs)
        assert exts == [".ass", ".srt"]
        assert all(os.path.exists(p) for p in res.out_subs)

    def test_m2ts_meta(self, env):
        ctx, st, key, file, fmt = env
        st.conf.format = OutputFormat.M2TS
        offsets = make_audio(st, file, fmt)
        reform = FakeReform(file, fmt, offsets)
        cmds = []
        mux = Muxer(ctx, st, reform,
                    runner=lambda cmd, show: (cmds.append(cmd), 0)[1])
        mux.mux(key, EncoderOptionInfo(), False, fmt.video_format)
        meta = st.m2ts_meta_path(key)
        text = open(meta).read()
        assert text.startswith("MUXOPT")
        assert "V_MPEG4/ISO/AVC" in text
        assert "A_AAC" in text
        assert meta in cmds[0]

    def test_timecode_runs_timelineeditor(self, env):
        ctx, st, key, file, fmt = env
        reform = FakeReform(file, fmt)
        cmds = []
        mux = Muxer(ctx, st, reform,
                    runner=lambda cmd, show: (cmds.append(cmd), 0)[1])
        fmt.video_format.fixed_frame_rate = False
        mux.mux(key, EncoderOptionInfo(), False, fmt.video_format,
                vfr_timing_fps=120, timecode_path="/tmp/tc.txt")
        assert len(cmds) == 2
        assert "timelineeditor" in cmds[1]
        assert "--media-timescale 120000" in cmds[1]


class TestSimpleMuxer:
    def test_simple(self, env):
        ctx, st, key, file, fmt = env

        def runner(cmd, show):
            out = st.out_file_path(EncodeFileKey(), EncodeFileKey())
            with open(out, "wb") as f:
                f.write(b"y" * 11)
            return 0

        m = SimpleMuxer(ctx, st, runner=runner)
        m.mux(fmt.video_format, 0)
        assert m.total_out_size == 11
