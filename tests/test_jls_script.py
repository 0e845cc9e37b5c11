"""JL command-file interpreter tests (model: join_logo_scp's user rule
scripts driving CM decisions — ref CMAnalyze.hpp:338-365 spawns the tool
with -incmd <JL file> + free-form options; here models/jls_script.py
interprets the same class of scripts in-process)."""

import pytest

from amatsukaze_tpu.models.cm_analyze import (
    CMAnalyzer,
    JlsDecider,
    JlsOptions,
    make_cm_zones,
)
from amatsukaze_tpu.models.jls_script import JlsScript, _parse_options_string
from amatsukaze_tpu.utils.context import AMTContext, FormatError

FPS = 29.97


def sec(s):
    return int(s * FPS)


def make_broadcast():
    """0-60s program, 60-90s CM (2x15s), 90-300s program,
    300-360s CM (4x15s), 360-420s program (same layout as
    TestJlsDecider.make_broadcast)."""
    total = sec(420)
    logo_spans = [(0, sec(60)), (sec(90), sec(300)), (sec(360), total)]
    cuts = [0, sec(60), sec(75), sec(90), sec(300), sec(315), sec(330),
            sec(345), sec(360), total]
    scene_changes = cuts[1:-1] + [sec(150), sec(200)]
    silence = [(c - 3, c + 3) for c in cuts[1:-1]]
    return total, logo_spans, sorted(scene_changes), silence


def run_script(text, options="", layout=None, opts=None):
    total, logo_spans, scs, silence = layout or make_broadcast()
    script = JlsScript(text, options)
    return JlsScript(text, options).run(
        total, FPS, logo_spans, scs, silence, base_options=opts), total


class TestOptionsString:
    def test_pairs_and_flags(self):
        v = _parse_options_string("-flag -name value -n 3")
        assert v == {"flag": "1", "name": "value", "n": "3"}


class TestFlowControl:
    def test_empty_script_matches_default(self):
        total, logo_spans, scs, silence = make_broadcast()
        base = JlsDecider(total, FPS).decide(logo_spans, scs, silence)
        got, _ = run_script("# nothing but comments\n")
        assert got == base

    def test_if_else(self):
        # cuts the whole head minute only when the flag is set
        text = """
If CUT_HEAD
  AutoEdge S -sec 60
Else
  Set unused 1
EndIf
"""
        (trims_off, _), total = run_script(text)
        (trims_on, _), _ = run_script(text, options="-CUT_HEAD")
        assert trims_off[0] == 0
        assert trims_on[0] >= sec(60)

    def test_elsif_chain(self):
        text = """
If MODE == 1
  AutoEdge S -sec 60
ElsIf MODE == 2
  AutoEdge E -sec 60
Else
  Set unused 1
EndIf
"""
        (t1, _), total = run_script(text, options="-MODE 1")
        (t2, _), _ = run_script(text, options="-MODE 2")
        (t0, _), _ = run_script(text)
        assert t1[0] >= sec(60) and t1[-1] == total
        assert t2[0] == 0 and t2[-1] <= total - sec(60)
        assert t0[0] == 0 and t0[-1] == total

    def test_nested_if(self):
        text = """
If A
  If B
    AutoEdge S -sec 60
  EndIf
EndIf
"""
        (t_ab, _), _ = run_script(text, options="-A -B")
        (t_a, _), _ = run_script(text, options="-A")
        assert t_ab[0] >= sec(60)
        assert t_a[0] == 0

    def test_set_default_and_expressions(self):
        text = """
Set X 5
Default X 9
Default Y 2
If X == 5 && Y < 3
  AutoEdge S -sec 60
EndIf
"""
        (t, _), _ = run_script(text)
        assert t[0] >= sec(60)

    def test_predefined_vars(self):
        text = """
If NOLOGO || DURATION > 600
  AutoEdge S -sec 60
EndIf
"""
        (t, _), _ = run_script(text)  # has logo, 420 s
        assert t[0] == 0
        total, _, scs, silence = make_broadcast()
        t2, _ = JlsScript(text).run(total, FPS, None, scs, silence)
        assert t2[0] >= sec(60)

    def test_call_includes(self, tmp_path):
        (tmp_path / "inner.txt").write_text("AutoEdge S -sec 60\n")
        (tmp_path / "main.txt").write_text("Call inner.txt\n")
        script = JlsScript.from_file(str(tmp_path / "main.txt"))
        total, logo_spans, scs, silence = make_broadcast()
        trims, _ = script.run(total, FPS, logo_spans, scs, silence)
        assert trims[0] >= sec(60)

    def test_errors(self):
        with pytest.raises(FormatError):
            run_script("If X\n")  # missing EndIf
        with pytest.raises(FormatError):
            run_script("Bogus 1\n")
        with pytest.raises(FormatError):
            run_script("Else\n")
        with pytest.raises(FormatError):
            run_script("Set X\n")


class TestParams:
    def test_cm_unit_change_alters_decision(self):
        # layout with 20-second CM blocks: default units miss them,
        # a script that declares 20 s a CM unit cuts them
        total = sec(240)
        logo_spans = [(0, sec(100)), (sec(140), total)]
        cuts = [0, sec(100), sec(120), sec(140), total]
        scs = cuts[1:-1]
        silence = [(c - 3, c + 3) for c in cuts[1:-1]]
        layout = (total, logo_spans, scs, silence)
        (t_default, _), _ = run_script("", layout=layout)
        (t_tuned, _), _ = run_script("SetParam CmUnit 15,20,30\n",
                                     layout=layout)
        zones = make_cm_zones(t_tuned, total)
        spans = [(z.start_frame, z.end_frame) for z in zones]
        assert (sec(100), sec(140)) in spans
        assert t_default != t_tuned

    def test_nologo_param(self):
        text = "SetParam NoLogo 1\n"
        total, logo_spans, scs, silence = make_broadcast()
        got = JlsScript(text).run(total, FPS, logo_spans, scs, silence)
        want = JlsDecider(total, FPS).decide(None, scs, silence)
        assert got == want

    def test_autoup_equals_nologo(self):
        total, logo_spans, scs, silence = make_broadcast()
        a = JlsScript("AutoUp\n").run(total, FPS, logo_spans, scs, silence)
        b = JlsScript("SetParam NoLogo 1\n").run(
            total, FPS, logo_spans, scs, silence)
        assert a == b

    def test_logo_margins(self):
        # +2 s in-margin moves every logo-on start later: the first
        # block (0-60 s) keeps majority-on, decision unchanged; but a
        # large margin that flips the majority changes the cut
        text = "MkLogo -inmargin 40\n"
        total, logo_spans, scs, silence = make_broadcast()
        base = JlsDecider(total, FPS).decide(logo_spans, scs, silence)
        got = JlsScript(text).run(total, FPS, logo_spans, scs, silence)
        assert got != base


class TestEdits:
    def test_autocut_start(self):
        # make the head 2x15s sponsor part (logo lit) + program
        total = sec(300)
        logo_spans = [(0, total)]  # logo always on
        cuts = [0, sec(15), sec(30), total]
        scs = cuts[1:-1]
        silence = [(c - 3, c + 3) for c in cuts[1:-1]]
        layout = (total, logo_spans, scs, silence)
        (t_default, _), _ = run_script("", layout=layout)
        assert t_default[0] == 0  # logo lit: default keeps everything
        (t_cut, _), _ = run_script("AutoCut S\n", layout=layout)
        assert t_cut[0] == sec(30)

    def test_autocut_limit(self):
        total = sec(300)
        logo_spans = [(0, total)]
        cuts = [0, sec(15), sec(30), total]
        scs = cuts[1:-1]
        silence = [(c - 3, c + 3) for c in cuts[1:-1]]
        layout = (total, logo_spans, scs, silence)
        (t, _), _ = run_script("AutoCut S -limit 20\n", layout=layout)
        # only the first 15 s block fits under the 20 s budget
        assert t[0] == sec(15)

    def test_autocut_end(self):
        total = sec(300)
        logo_spans = [(0, total)]
        cuts = [0, sec(270), sec(285), total]
        scs = cuts[1:-1]
        silence = [(c - 3, c + 3) for c in cuts[1:-1]]
        layout = (total, logo_spans, scs, silence)
        (t, _), _ = run_script("AutoCut E\n", layout=layout)
        assert t[-1] == sec(270)

    def test_autoadd_readds_sponsor(self):
        # CM run at 60-90 contains a 15 s block adjacent to the body:
        # AutoAdd S re-adds the one touching the program that follows
        total, logo_spans, scs, silence = make_broadcast()
        layout = (total, logo_spans, scs, silence)
        (t_default, _), _ = run_script("", layout=layout)
        zones = make_cm_zones(t_default, total)
        assert (sec(60), sec(90)) in [(z.start_frame, z.end_frame)
                                      for z in zones]
        (t_add, _), _ = run_script("AutoAdd S -sec 15\n", layout=layout)
        zones2 = [(z.start_frame, z.end_frame)
                  for z in make_cm_zones(t_add, total)]
        # the 75-90 block (touching the 90s body start) is program again
        assert (sec(60), sec(75)) in zones2
        assert (sec(60), sec(90)) not in zones2

    def test_autocm_interior_run(self):
        # logo lit the whole time, interior 4x15s CM run
        total = sec(420)
        logo_spans = [(0, total)]
        cuts = [0, sec(180), sec(195), sec(210), sec(225), sec(240), total]
        scs = cuts[1:-1]
        silence = [(c - 3, c + 3) for c in cuts[1:-1]]
        layout = (total, logo_spans, scs, silence)
        (t_default, _), _ = run_script("", layout=layout)
        assert t_default == [0, total]  # logo lit: nothing cut
        (t, _), _ = run_script("AutoCM -len 60\n", layout=layout)
        zones = [(z.start_frame, z.end_frame) for z in make_cm_zones(t, total)]
        assert (sec(180), sec(240)) in zones
        # a shorter minimum leaves it cut too; a longer one keeps it
        (t2, _), _ = run_script("AutoCM -len 90\n", layout=layout)
        assert t2 == [0, total]

    def test_autodel_autoins(self):
        total, logo_spans, scs, silence = make_broadcast()
        layout = (total, logo_spans, scs, silence)
        (t, _), _ = run_script("AutoDel -from 90 -to 300\n", layout=layout)
        zones = [(z.start_frame, z.end_frame) for z in make_cm_zones(t, total)]
        assert any(s <= sec(90) and e >= sec(300) for s, e in zones)
        (t2, _), _ = run_script("AutoIns -from 300 -to 360\n", layout=layout)
        zones2 = [(z.start_frame, z.end_frame)
                  for z in make_cm_zones(t2, total)]
        assert (sec(300), sec(360)) not in zones2


class TestAnalyzerIntegration:
    def test_script_changes_analyzer_trims(self):
        ctx = AMTContext()
        total, logo_spans, scs, silence = make_broadcast()
        base = CMAnalyzer(ctx, total, FPS).analyze(
            logo_spans, 0.8, "logo.lgd", scs, silence)
        tuned = CMAnalyzer(
            ctx, total, FPS,
            jls_script=JlsScript("AutoEdge S -sec 60\n")).analyze(
            logo_spans, 0.8, "logo.lgd", scs, silence)
        assert base.trims != tuned.trims
        assert tuned.trims[0] >= sec(60)
