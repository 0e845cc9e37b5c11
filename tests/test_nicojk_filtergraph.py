"""NicoJK comment handling + filter-graph (AMTFilterSource-equivalent) tests."""

import numpy as np
import pytest

from amatsukaze_tpu.captions.nicojk import (
    NicoJK,
    NicoJKFormatter,
    make_transparent_variant,
    parse_ass,
    parse_ch_sid,
)
from amatsukaze_tpu.models.cm_analyze import EncoderZone
from amatsukaze_tpu.models.filter_graph import (
    FilterGraph,
    make_out_format,
    make_out_zones,
)
from amatsukaze_tpu.reform.stream_reform import MPEG_CLOCK_HZ
from amatsukaze_tpu.types import VideoFormat, VideoStreamFormat

SAMPLE_ASS = """[Script Info]
ScriptType: v4.00+
PlayResX: 1280
PlayResY: 720

[V4+ Styles]
Format: Name, Fontname, Fontsize, PrimaryColour, SecondaryColour, OutlineColour, BackColour, Bold, Italic, Underline, StrikeOut, ScaleX, ScaleY, Spacing, Angle, BorderStyle, Outline, Shadow, Alignment, MarginL, MarginR, MarginV, Encoding
Style: white,MS PGothic,28,&H00ffffff,&H00ffffff,&H00000000,&H00000000,-1,0,0,0,200,200,0,0.00,1,0,4,7,20,20,40,1

[Events]
Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
Dialogue: 0,0:00:01.50,0:00:05.50,white,,0000,0000,0000,,hello comment
Dialogue: 0,0:01:00.00,0:01:04.00,white,,0000,0000,0000,,second
"""


class TestNicoJK:
    def test_parse_ch_sid(self):
        # reference column layout (NicoJK.hpp:114): jknum, channel,
        # service id (strtol base 0), remote key, TV name
        text = ("jk1\tnhk\t1024\t1\tNHK\n"
                "jk2\tetv\t0x408\t2\tETV\n"
                "bad line\n")
        m = parse_ch_sid(text)
        assert m[1024] == (1, "NHK")
        assert m[0x408] == (2, "ETV")

    def test_parse_ass(self):
        headers, dialogues = parse_ass(SAMPLE_ASS)
        assert "[Events]" in headers
        assert len(dialogues) == 2
        assert dialogues[0].start == pytest.approx(1.5 * MPEG_CLOCK_HZ)
        assert dialogues[0].end == pytest.approx(5.5 * MPEG_CLOCK_HZ)
        assert "hello comment" in dialogues[0].line

    def test_transparent_variant(self):
        t = make_transparent_variant(SAMPLE_ASS)
        style = next(l for l in t.splitlines() if l.startswith("Style:"))
        tokens = style.split(",")
        assert tokens[3][:4] == "&H70"
        assert tokens[16] == "1" and tokens[17] == "0"

    def test_fetch_flow(self, ctx):
        jk = NicoJK(ctx, {1024: (1, "NHK")},
                    fetchers=[lambda sid, st, dur: SAMPLE_ASS], mask=0b0011)
        assert jk.jknum_for(1024) == 1
        assert jk.jknum_for(9) == -1
        assert jk.make_ass(1024, 0, 1800)
        d = jk.get_dialogues()
        assert len(d[0]) == 2 and len(d[1]) == 2  # S + T variants
        assert not d[2]  # 1080 not in mask

    def test_fetcher_failure(self, ctx):
        def bad(sid, st, dur):
            raise RuntimeError("network down")

        jk = NicoJK(ctx, {}, fetchers=[bad])
        assert not jk.make_ass(1024, 0, 100)
        assert jk.failed

    def test_formatter(self, ctx):
        headers, dialogues = parse_ass(SAMPLE_ASS)
        out = NicoJKFormatter().generate(["[Events]"], dialogues)
        assert "Dialogue: 0,0:00:01.50,0:00:05.50" in out


def film_sequence(n_film=24, h=32, w=48):
    """3:2 pulldown telecined frames."""
    yy, xx = np.mgrid[0:h, 0:w]
    film = [
        np.clip(128 + 80 * np.sin((xx + 8 * i) / 7.0) * np.cos(yy / 9.0), 0, 255)
        for i in range(n_film)
    ]
    out = []
    i = 0
    while i + 4 <= len(film):
        a, b, c, d = film[i : i + 4]

        def wv(top, bot):
            f = np.empty((h, w), np.float32)
            f[0::2] = top[0::2]
            f[1::2] = bot[1::2]
            return f

        out += [wv(a, a), wv(a, b), wv(b, c), wv(c, c), wv(d, d)]
        i += 4
    return [f.astype(np.uint8) for f in out]


class TestFilterGraph:
    def test_kfm_vfr_detects_film(self, ctx):
        frames = film_sequence(24)
        fg = FilterGraph(ctx, mode=FilterGraph.MODE_KFM_VFR, batch=10)
        fg.analyze(iter(frames), len(frames))
        assert fg.decisions is not None
        from amatsukaze_tpu.models.kfm import CycleMode

        assert all(d.mode == CycleMode.FILM for d in fg.decisions)
        fmt = VideoFormat(format=VideoStreamFormat.MPEG2, width=48, height=32,
                          frame_rate_num=30000, frame_rate_denom=1001,
                          fixed_frame_rate=True)
        spec = fg.output_spec(len(frames), fmt)
        # pure film -> CFR 24p
        assert not spec.time_codes
        assert spec.out_format.frame_rate_num == 24000
        assert spec.num_out_frames == len(frames) * 4 // 5

    def test_yadif_mode(self, ctx):
        frames = np.stack(film_sequence(8)).astype(np.float32)
        fg = FilterGraph(ctx, mode=FilterGraph.MODE_YADIF)
        out = fg.run_pass3(frames[:5], None, frames[5])
        assert out.shape == frames[:5].shape

    def test_out_zones_basic(self):
        zones = [EncoderZone(100, 200), EncoderZone(300, 320)]
        out_frames = list(range(0, 400))
        res = make_out_zones(zones, out_frames, 400, [], 30000, 1001)
        assert [(z.start_frame, z.end_frame) for z in res] == [(100, 200)]
        # the 20-frame zone was dropped (<= 30 frames)

    def test_out_zones_scaled(self):
        zones = [EncoderZone(0, 100)]
        out_frames = list(range(0, 200))
        res = make_out_zones(zones, out_frames, 400, [], 30000, 1001)
        assert (res[0].start_frame, res[0].end_frame) == (0, 200)

    def test_out_zones_vfr_timecodes(self):
        zones = [EncoderZone(0, 100)]
        out_frames = list(range(0, 200))
        tick = 1001 / 30000
        # VFR: 2x frame count, timecodes at half the tick
        tcs = [i * tick * 500 for i in range(400)]
        res = make_out_zones(zones, out_frames, 400, tcs, 30000, 1001)
        assert res[0].end_frame == 200

    def test_make_out_format_resize_resets_sar(self):
        fmt = VideoFormat(width=1440, height=1080, sar_width=4, sar_height=3,
                          frame_rate_num=30000, frame_rate_denom=1001)
        out = make_out_format(fmt, 1280, 720, 60000, 1001, True)
        assert (out.sar_width, out.sar_height) == (1, 1)
        assert out.progressive and out.width == 1280
