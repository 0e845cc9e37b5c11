"""CM analysis + chapter tests (model: the reference's CMAnalyze flow and
MakeChapter, plus the trim/div/scpos file contracts)."""

import numpy as np
import pytest

from amatsukaze_tpu.models.chapter import ChapterMaker, JlsElement, format_jls, parse_jls
from amatsukaze_tpu.models.cm_analyze import (
    CMAnalyzer,
    JlsDecider,
    JlsOptions,
    format_scene_changes_text,
    format_trim_avs,
    make_cm_zones,
    normalize_divs,
    parse_scene_changes_text,
    parse_trim_avs,
)

FPS = 29.97


class TestFileContracts:
    def test_trim_parse(self):
        trims = parse_trim_avs("Trim(0,100)++Trim(200,399)", 500)
        assert trims == [0, 101, 200, 400]

    def test_trim_parse_whitespace_case(self):
        assert parse_trim_avs("TRIM ( 5 , 10 )", 100) == [5, 11]

    def test_trim_roundtrip(self):
        trims = [0, 101, 200, 400]
        assert parse_trim_avs(format_trim_avs(trims), 500) == trims

    def test_divs_normalize(self):
        assert normalize_divs([], 100) == [0, 100]
        assert normalize_divs([50], 100) == [0, 50, 100]
        assert normalize_divs([0, 50], 100) == [0, 50, 100]

    def test_scpos_roundtrip(self):
        text = format_scene_changes_text([10, 20, 300], [(5, 8)])
        assert parse_scene_changes_text(text) == [10, 20, 300]

    def test_cm_zones(self):
        zones = make_cm_zones([100, 200, 300, 400], 500)
        assert [(z.start_frame, z.end_frame) for z in zones] == [
            (0, 100), (200, 300), (400, 500),
        ]

    def test_cm_zones_all_program(self):
        zones = make_cm_zones([0, 500], 500)
        assert zones == []


def sec(s):
    return int(s * FPS)


class TestJlsDecider:
    def make_broadcast(self):
        """A synthetic broadcast layout:
        0-60s program, 60-90s CM (2x15s), 90-300s program,
        300-360s CM (4x15s), 360-420s program."""
        total = sec(420)
        logo_spans = [(0, sec(60)), (sec(90), sec(300)), (sec(360), total)]
        cuts = [0, sec(60), sec(75), sec(90), sec(300), sec(315), sec(330),
                sec(345), sec(360), total]
        scene_changes = cuts[1:-1] + [sec(150), sec(200)]  # extra mid-program cuts
        silence = [(c - 3, c + 3) for c in cuts[1:-1]]
        return total, logo_spans, sorted(scene_changes), silence

    def test_basic_cm_detection(self):
        total, logo_spans, scs, silence = self.make_broadcast()
        d = JlsDecider(total, FPS)
        trims, divs = d.decide(logo_spans, scs, silence)
        zones = make_cm_zones(trims, total)
        spans = [(z.start_frame, z.end_frame) for z in zones]
        assert (sec(60), sec(90)) in spans
        assert (sec(300), sec(360)) in spans
        # program content preserved
        assert trims[0] == 0 and trims[-1] == total

    def test_no_logo_falls_back_to_units(self):
        total, _, scs, silence = self.make_broadcast()
        d = JlsDecider(total, FPS)
        trims, _ = d.decide(None, scs, silence)
        zones = make_cm_zones(trims, total)
        # the 15s blocks are still recognized as CM
        total_cm = sum(z.end_frame - z.start_frame for z in zones)
        assert total_cm >= sec(85)

    def test_all_program(self):
        total = sec(120)
        d = JlsDecider(total, FPS)
        trims, divs = d.decide([(0, total)], [sec(40)], [])
        assert trims == [0, total]
        assert divs == [0]


class TestCMAnalyzer:
    def test_logo_threshold_by_duration(self, ctx):
        short = CMAnalyzer(ctx, sec(60 * 5), FPS)
        assert short.logo_threshold() == pytest.approx(0.03)
        long = CMAnalyzer(ctx, sec(60 * 30), FPS)
        assert long.logo_threshold() == pytest.approx(0.1)
        loose = CMAnalyzer(ctx, sec(60 * 30), FPS, loose_logo_detection=True)
        assert loose.logo_threshold() == pytest.approx(0.03)

    def test_analyze_and_pmt_cut(self, ctx):
        total = sec(420)
        an = CMAnalyzer(ctx, total, FPS)
        scs = [sec(30), sec(60), sec(390)]
        r = an.analyze(None, 0.0, "", scs, [(s - 3, s + 3) for s in scs])
        assert r.trims
        # PMT change near frame sec(30) limits the head
        an.result.trims = [0, total]
        an.apply_pmt_cut((0.2, 0.2), [0, sec(30) + 10])
        assert an.result.trims[0] == sec(30)

    def test_external_trim_input(self, ctx):
        an = CMAnalyzer(ctx, 1000, FPS)
        an.input_trim_avs("Trim(100,499)")
        assert an.result.trims == [100, 500]
        assert [(z.start_frame, z.end_frame) for z in an.result.cmzones] == [
            (0, 100), (500, 1000),
        ]


class TestChapters:
    def test_jls_roundtrip(self):
        elems = [
            JlsElement(0, 450, 15, "CM"),
            JlsElement(450, 9450, 300, "Body"),
            JlsElement(9450, 9900, 15, "CM"),
        ]
        parsed = parse_jls(format_jls(elems))
        assert [(e.frame_start, e.frame_end, e.seconds, e.comment) for e in parsed] == [
            (0, 450, 15, "CM"), (450, 9450, 300, "Body"), (9450, 9900, 15, "CM"),
        ]

    def test_chapter_labels(self):
        trims = [450, 9450]
        elems = [
            JlsElement(0, 450, 15, "CM"),
            JlsElement(450, 5000, 150, "Body"),
            JlsElement(5000, 9450, 148, "Trailer"),
            JlsElement(9450, 9900, 15, "CM"),
        ]
        maker = ChapterMaker(trims, elems)
        comments = [c.comment for c in maker.chapters]
        assert comments[0] == "CM"
        assert comments[1] == "A"
        assert comments[2].startswith("A")  # same chapter letter, no CM between
        assert "148Sec" in comments[2]  # trailer shows seconds
        assert comments[3] == "CM"

    def test_file_chapters_and_format(self):
        trims = [0, 9000]
        elems = [JlsElement(0, 4500, 150, "Body"), JlsElement(4500, 9000, 150, "Body2")]
        maker = ChapterMaker(trims, elems)
        out_frames = list(range(9000))
        chapters = maker.file_chapters(out_frames, 30.0)
        text = ChapterMaker.format_chapters(chapters, 30000, 1001)
        assert text.startswith("CHAPTER01=00:00:00.000")
        assert "CHAPTER01NAME=A" in text
        lines = text.strip().splitlines()
        assert len(lines) == 2 * len(chapters)

    def test_short_chapters_dropped(self):
        trims = [0, 9000]
        elems = [
            JlsElement(0, 30, 1, "Tiny"),  # < 2 s at 30 fps
            JlsElement(30, 4500, 149, "Body"),
            JlsElement(4500, 9000, 150, "Body2"),
        ]
        maker = ChapterMaker(trims, elems)
        chapters = maker.file_chapters(list(range(9000)), 30.0)
        assert all(c.frame_end - c.frame_start >= 60 for c in chapters)
