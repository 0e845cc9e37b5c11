"""StreamReform tests (model: reference test_readts/test_streamreform round-trip,
AmatsukazeTestImpl.hpp:284-295)."""

import math

import pytest

from amatsukaze_tpu.reform import (
    FileAudioFrameInfo,
    FileVideoFrameInfo,
    StreamEvent,
    StreamEventType,
    StreamReformInfo,
)
from amatsukaze_tpu.reform.stream_reform import unwrap_pts_sequence, MPEG_CLOCK_HZ
from amatsukaze_tpu.types import (
    AudioChannels,
    AudioFormat,
    CMType,
    EncodeFileKey,
    PictureType,
    VideoFormat,
    VideoStreamFormat,
)

FPS30 = (30000, 1001)
FRAME_DUR = 90000 * 1001 / 30000  # 3003
AUDIO_DUR = 90000 * 1024 / 48000  # 1920


def vfmt(**kw):
    base = dict(
        format=VideoStreamFormat.MPEG2, width=1440, height=1080,
        display_width=1440, display_height=1080, sar_width=4, sar_height=3,
        frame_rate_num=30000, frame_rate_denom=1001, progressive=False,
        fixed_frame_rate=True,
    )
    base.update(kw)
    return VideoFormat(**base)


def afmt(**kw):
    base = dict(channels=AudioChannels.STEREO, sample_rate=48000)
    base.update(kw)
    return AudioFormat(**base)


def make_video_frames(n, first_pts=90000, gop=15, pic=PictureType.TFF, fmt=None):
    fmt = fmt or vfmt()
    frames = []
    for i in range(n):
        frames.append(
            FileVideoFrameInfo(
                pts=int(first_pts + i * FRAME_DUR) & ((1 << 33) - 1),
                dts=int(first_pts + (i - 1) * FRAME_DUR) & ((1 << 33) - 1),
                is_gop_start=(i % gop == 0),
                pic=pic,
                coded_data_size=10000,
                format=fmt,
                file_offset=i * 10000,
            )
        )
    return frames


def make_audio_frames(n, first_pts=90000, audio_idx=0, fmt=None):
    fmt = fmt or afmt()
    return [
        FileAudioFrameInfo(
            pts=int(first_pts + i * AUDIO_DUR) & ((1 << 33) - 1),
            num_samples=1024,
            format=fmt,
            audio_idx=audio_idx,
            coded_data_size=400,
            wave_data_size=4096,
            file_offset=i * 400,
            wave_offset=i * 4096,
        )
        for i in range(n)
    ]


def basic_events(num_audio=1):
    return [
        StreamEvent(StreamEventType.PID_TABLE_CHANGED, 0, num_audio=num_audio),
        StreamEvent(StreamEventType.VIDEO_FORMAT_CHANGED, 0),
        StreamEvent(StreamEventType.AUDIO_FORMAT_CHANGED, 0, audio_idx=0),
    ]


def make_reform(ctx, videos, audios, events=None, num_video_file=1, split_sub=False):
    info = StreamReformInfo(
        ctx, num_video_file, videos, audios, [], events or basic_events(), []
    )
    info.prepare(split_sub, is_encode_audio=False)
    return info


class TestPtsUnwrap:
    def test_no_wrap(self):
        pts = [100, 200, 300]
        assert unwrap_pts_sequence(100, pts) == [100.0, 200.0, 300.0]

    def test_wrap_33bit(self):
        max33 = (1 << 33) - 1
        # sequence crossing the 33-bit wrap
        seq = [max33 - 3000, (max33 + 3) & max33, (max33 + 3003) & max33]
        out = unwrap_pts_sequence(seq[0], seq)
        assert out[0] == max33 - 3000
        assert out[1] == max33 + 3
        assert out[2] == max33 + 3003

    def test_b_frame_reorder_negative_delta(self):
        # PTS going backwards slightly (B frames) must not unwrap
        seq = [10000, 7000, 8500, 13000]
        out = unwrap_pts_sequence(10000, seq)
        assert out == [10000.0, 7000.0, 8500.0, 13000.0]


class TestBasicReform:
    def test_single_format(self, ctx):
        info = make_reform(ctx, make_video_frames(60), make_audio_frames(100))
        assert len(info.formats) == 1
        assert info.get_num_encoders(0) == 1
        frames = info.get_filter_source_frames(0)
        assert len(frames) == 60  # TFF: no expansion
        # pts strictly increasing by one frame duration
        deltas = [b.pts - a.pts for a, b in zip(frames, frames[1:])]
        assert all(abs(d - FRAME_DUR) < 1e-6 for d in deltas)
        assert all(f.cm_type == CMType.NONCM for f in frames)
        # keyframe index tracks GOP starts
        assert frames[0].key_frame == 0
        assert frames[16].key_frame == 15

    def test_rff_expansion_tff_rff(self, ctx):
        videos = make_video_frames(30, pic=PictureType.TFF_RFF)
        info = make_reform(ctx, videos, make_audio_frames(100))
        # TFF_RFF stays a single filter frame
        assert len(info.get_filter_source_frames(0)) == 30
        assert info.has_rff is False  # set only in calc_size_and_time
        info.gen_audio([CMType.BOTH])
        assert info.has_rff is True

    def test_frame_doubling(self, ctx):
        videos = make_video_frames(30, pic=PictureType.FRAME_DOUBLING,
                                   fmt=vfmt(progressive=True))
        info = make_reform(ctx, videos, make_audio_frames(100))
        frames = info.get_filter_source_frames(0)
        assert len(frames) == 60
        assert frames[0].pts + FRAME_DUR == pytest.approx(frames[1].pts)

    def test_bff_half_delay(self, ctx):
        videos = make_video_frames(30, pic=PictureType.BFF)
        info = make_reform(ctx, videos, make_audio_frames(100))
        frames = info.get_filter_source_frames(0)
        assert len(frames) == 30
        assert frames[0].half_delay
        # half-frame earlier than the coded PTS
        assert frames[0].pts == pytest.approx(90000 - FRAME_DUR / 2)

    def test_bff_rff(self, ctx):
        videos = make_video_frames(30, pic=PictureType.BFF_RFF)
        info = make_reform(ctx, videos, make_audio_frames(100))
        frames = info.get_filter_source_frames(0)
        assert len(frames) == 60
        assert frames[0].half_delay and not frames[1].half_delay

    def test_frames_before_first_keyframe_dropped(self, ctx):
        videos = make_video_frames(30)
        for i in range(5):
            videos[i].is_gop_start = False
        videos[5].is_gop_start = True
        info = make_reform(ctx, videos, make_audio_frames(100))
        assert len(info.get_filter_source_frames(0)) == 25

    def test_no_video_raises(self, ctx):
        with pytest.raises(Exception):
            make_reform(ctx, [], make_audio_frames(10))

    def test_no_audio_raises(self, ctx):
        with pytest.raises(Exception):
            make_reform(ctx, make_video_frames(10), [])


class TestAudioReform:
    def test_perfect_sync(self, ctx):
        n_v = 60
        dur_v = n_v * FRAME_DUR
        n_a = math.ceil(dur_v / AUDIO_DUR)
        info = make_reform(ctx, make_video_frames(n_v), make_audio_frames(n_a + 5))
        adiff = info.gen_audio([CMType.BOTH])
        key = EncodeFileKey(0, 0, 0, CMType.BOTH)
        file = info.get_encode_file(key)
        assert len(file.video_frames) == 60
        audio = file.audio_frames[0]
        # enough audio to cover video duration
        assert len(audio) in (n_a, n_a + 1)
        # no duplicates or skips in perfect sync
        assert audio == sorted(set(audio))
        assert adiff.max_diff_seconds() < 0.03

    def test_audio_gap_duplicates(self, ctx):
        # remove ~8 audio frames in the middle -> filled by duplication
        audios = make_audio_frames(120)
        del audios[50:58]
        info = make_reform(ctx, make_video_frames(70), audios)
        info.gen_audio([CMType.BOTH])
        audio = info.get_encode_file(EncodeFileKey(0, 0, 0, CMType.BOTH)).audio_frames[0]
        # some frame indices appear twice (gap filling)
        assert len(audio) > len(set(audio))

    def test_audio_overlap_skips(self, ctx):
        # duplicate 8 audio frames (same PTS ranges twice) -> skipped
        audios = make_audio_frames(120)
        extra = make_audio_frames(120)[50:58]
        merged = audios[:58] + extra + audios[58:]
        info = make_reform(ctx, make_video_frames(70), merged)
        adiff = info.gen_audio([CMType.BOTH])
        audio = info.get_encode_file(EncodeFileKey(0, 0, 0, CMType.BOTH)).audio_frames[0]
        assert adiff.total_unique_audio_frames < adiff.total_src_frames

    def test_wave_audio_stream(self, ctx):
        info = make_reform(ctx, make_video_frames(60), make_audio_frames(100))
        wave = info.get_filter_source_audio_frames(0)
        assert len(wave) > 50
        assert wave[0].wave_offset == 0
        assert wave[1].wave_offset == 4096


class TestCMSplit:
    def test_cm_zones_and_outputs(self, ctx):
        info = make_reform(ctx, make_video_frames(90), make_audio_frames(160))
        # frames 30-60 are CM; divs split at 30/60
        info.apply_cm_zones(0, [(30, 60)], [0, 30, 60, 90])
        cmtypes = [CMType.BOTH, CMType.NONCM, CMType.CM]
        info.gen_audio(cmtypes)
        keys = info.get_out_file_keys()
        # 1 format x 3 divs x 3 cmtypes
        assert len(keys) == 9
        both = info.get_encode_file(EncodeFileKey(0, 0, 1, CMType.BOTH))
        main = info.get_encode_file(EncodeFileKey(0, 0, 1, CMType.NONCM))
        cm = info.get_encode_file(EncodeFileKey(0, 0, 1, CMType.CM))
        assert len(both.video_frames) == 30
        assert len(main.video_frames) == 0  # div 1 is all CM
        assert len(cm.video_frames) == 30
        div0_main = info.get_encode_file(EncodeFileKey(0, 0, 0, CMType.NONCM))
        assert len(div0_main.video_frames) == 30

    def test_duration_accounting(self, ctx):
        info = make_reform(ctx, make_video_frames(90), make_audio_frames(160))
        info.gen_audio([CMType.BOTH])
        file = info.get_encode_file(EncodeFileKey(0, 0, 0, CMType.BOTH))
        assert file.duration == pytest.approx(90 * FRAME_DUR)
        src, out = info.get_in_out_duration()
        assert out == pytest.approx(90 * FRAME_DUR)


class TestFormatChange:
    def make_change_stream(self, ctx, split_sub):
        # sections must exceed the 3 s CHANGE_TOLERANCE to count as separate
        # formats: 120 frames A (~4 s), 120 frames B (mono audio), 120 A
        videos = (
            make_video_frames(120)
            + make_video_frames(120, first_pts=int(90000 + 120 * FRAME_DUR))
            + make_video_frames(120, first_pts=int(90000 + 240 * FRAME_DUR))
        )
        audios = make_audio_frames(580)
        # audio format changes at the boundaries
        a_change1 = int(120 * FRAME_DUR / AUDIO_DUR)
        a_change2 = int(240 * FRAME_DUR / AUDIO_DUR)
        mono = afmt(channels=AudioChannels.MONO)
        for i in range(a_change1, a_change2):
            audios[i] = FileAudioFrameInfo(
                pts=audios[i].pts, num_samples=1024, format=mono, audio_idx=0,
                coded_data_size=400, wave_data_size=4096,
                file_offset=audios[i].file_offset, wave_offset=audios[i].wave_offset,
            )
        events = [
            StreamEvent(StreamEventType.PID_TABLE_CHANGED, 0, num_audio=1),
            StreamEvent(StreamEventType.VIDEO_FORMAT_CHANGED, 0),
            StreamEvent(StreamEventType.AUDIO_FORMAT_CHANGED, 0, audio_idx=0),
            StreamEvent(StreamEventType.AUDIO_FORMAT_CHANGED, a_change1, audio_idx=0),
            StreamEvent(StreamEventType.AUDIO_FORMAT_CHANGED, a_change2, audio_idx=0),
        ]
        info = StreamReformInfo(ctx, 1, videos, audios, [], events, [])
        info.prepare(split_sub, is_encode_audio=False)
        return info

    def test_audio_format_sections(self, ctx):
        info = self.make_change_stream(ctx, split_sub=False)
        # same video format, but audio change makes a second format
        assert len(info.formats) == 2
        assert info.get_num_encoders(0) == 2

    def test_split_sub_merges_main(self, ctx):
        info = self.make_change_stream(ctx, split_sub=True)
        assert info.get_num_encoders(0) == 2
        info.gen_audio([CMType.BOTH])
        # main = the A sections merged (240 frames), sub = B section (120)
        main = info.get_encode_file(EncodeFileKey(0, 0, 0, CMType.BOTH))
        sub = info.get_encode_file(EncodeFileKey(0, 1, 0, CMType.BOTH))
        assert len(main.video_frames) == 240
        assert len(sub.video_frames) == 120
        # output naming: main gets BOTH-format index 0
        assert main.out_key.format == 0
        assert sub.out_key.format == 1


class TestSerialize:
    def test_round_trip(self, ctx, tmp_path):
        videos = make_video_frames(30, pic=PictureType.TFF_RFF)
        audios = make_audio_frames(60)
        info = StreamReformInfo(ctx, 1, videos, audios, [], basic_events(), [])
        path = str(tmp_path / "reform.dat")
        info.serialize(path)
        info2 = StreamReformInfo.deserialize(ctx, path)
        info.prepare(False, False)
        info2.prepare(False, False)
        f1 = info.get_filter_source_frames(0)
        f2 = info2.get_filter_source_frames(0)
        assert len(f1) == len(f2)
        assert all(a.pts == b.pts and a.file_offset == b.file_offset
                   for a, b in zip(f1, f2))
        a1 = info.gen_audio([CMType.BOTH])
        a2 = info2.gen_audio([CMType.BOTH])
        assert a1.to_json() == a2.to_json()
