"""KFM decision model tests: telecine pattern -> VFR plan."""

import numpy as np

from amatsukaze_tpu.models.kfm import (
    CycleDecision,
    CycleMode,
    KFMDecider,
    VFRPlan,
    build_vfr_plan,
    plan_is_cfr,
)


def film_costs(n, phase=0, noise=0.01):
    """Synthetic pattern costs: film phase cheap, others expensive."""
    rng = np.random.default_rng(1)
    pc = rng.uniform(3.0, 4.0, (n, 7)).astype(np.float32)
    pc[:, phase] = rng.uniform(0.0, noise, n)
    pc[:, 5] = rng.uniform(2.0, 2.5, n)  # 30p clearly worse
    pc[:, 6] = rng.uniform(1.5, 2.0, n)
    return pc


def video30_costs(n):
    rng = np.random.default_rng(2)
    pc = rng.uniform(1.0, 1.2, (n, 7)).astype(np.float32)
    pc[:, 5] = rng.uniform(0.01, 0.05, n)  # no combing at all
    pc[:, 6] = rng.uniform(0.01, 0.05, n)
    return pc


class TestDecider:
    def test_film_detected(self):
        d = KFMDecider().decide(film_costs(10, phase=2))
        assert all(x.mode == CycleMode.FILM for x in d)
        assert all(x.phase == 2 for x in d)

    def test_video_detected(self):
        d = KFMDecider().decide(video30_costs(10))
        assert all(x.mode == CycleMode.VIDEO_30 for x in d)

    def test_hysteresis_absorbs_blips(self):
        pc = film_costs(10)
        pc[5] = video30_costs(1)[0]  # one odd cycle
        d = KFMDecider().decide(pc)
        assert all(x.mode == CycleMode.FILM for x in d)

    def test_mixed_content(self):
        pc = np.concatenate([film_costs(6), video30_costs(6)])
        d = KFMDecider().decide(pc)
        assert d[0].mode == CycleMode.FILM
        assert d[-1].mode == CycleMode.VIDEO_30

    def test_phase_flip_at_edit_point(self):
        """A broadcast edit mid-file shifts the pulldown phase; each
        section must keep ITS phase (a global majority vote would mis-
        weave the shorter section)."""
        pc = np.concatenate([film_costs(12, phase=1), film_costs(8, phase=3)])
        d = KFMDecider().decide(pc)
        assert all(x.mode == CycleMode.FILM for x in d)
        assert [x.phase for x in d[:12]] == [1] * 12
        assert [x.phase for x in d[12:]] == [3] * 8

    def test_phase_blip_absorbed(self):
        """A single-cycle phase misread inside a stable run is noise."""
        pc = film_costs(10, phase=2)
        blip = film_costs(1, phase=4)
        pc[5] = blip[0]
        d = KFMDecider().decide(pc)
        assert [x.phase for x in d] == [2] * 10

    def test_phase_flip_changes_weave_ops(self):
        """The VFR plan's merge positions must follow the per-section
        phase: after the flip the MERGE_PREV frames move."""
        d = ([CycleDecision(CycleMode.FILM, 0)] * 2
             + [CycleDecision(CycleMode.FILM, 2)] * 2)
        plan = build_vfr_plan(d, 20)
        ops = dict(plan.source_frames)
        # phase 0 merges at cycle frames 2,3: frame 2 is the duplicate
        # (dropped), frame 3's repair recovers the split film frame
        assert ops[3] == VFRPlan.MERGE_PREV
        assert 2 not in ops
        # phase 2 merges at cycle frames 4,0 (cyclic pair): 4 dropped,
        # 0 repaired -> in cycle 2 (base 10)
        assert ops[10] == VFRPlan.MERGE_PREV
        assert 14 not in ops


class TestVFRPlan:
    def test_film_plan(self):
        d = [CycleDecision(CycleMode.FILM, 0)] * 4
        plan = build_vfr_plan(d, 20)
        # 4 cycles x 4 film frames
        assert len(plan.durations) == 16
        assert sum(plan.durations) == 4 * 20  # total time preserved (120Hz units)
        assert plan_is_cfr(d)

    def test_video30_plan(self):
        d = [CycleDecision(CycleMode.VIDEO_30)] * 4
        plan = build_vfr_plan(d, 20)
        assert len(plan.durations) == 20
        assert all(v == 4 for v in plan.durations)

    def test_video60_plan(self):
        d = [CycleDecision(CycleMode.VIDEO_60)] * 2
        plan = build_vfr_plan(d, 10)
        assert len(plan.durations) == 20
        assert all(v == 2 for v in plan.durations)

    def test_mixed_vfr(self):
        d = [CycleDecision(CycleMode.FILM, 0), CycleDecision(CycleMode.VIDEO_30)]
        plan = build_vfr_plan(d, 10)
        assert not plan_is_cfr(d)
        assert sum(plan.durations) == 40
        # timecodes span matches total duration
        tick = 1000.0 * 1001 / 120000
        assert abs(plan.timecodes_ms[-1] - 40 * tick) < 1e-6

    def test_partial_tail_cycle(self):
        d = [CycleDecision(CycleMode.FILM, 0)]
        plan = build_vfr_plan(d, 3)  # only 3 frames: falls back to 30p-style
        assert sum(plan.durations) == 12


class TestUCF:
    def test_dirty_frame_replaced_with_bob(self):
        """A FILM frame whose weave still combs badly (broken pulldown at a
        broadcast edit) is bobbed instead (KFM's UCF dirty-field analog)."""
        from amatsukaze_tpu.models.kfm import (
            CycleDecision, CycleMode, VFRPlan, build_vfr_plan)

        decisions = [CycleDecision(CycleMode.FILM, 0) for _ in range(4)]
        n = 20
        costs = np.full((n, 3), 1.0, np.float32)
        costs[8] = [50.0, 50.0, 50.0]  # frame 8: dirty whatever the pairing
        plan = build_vfr_plan(decisions, n, frame_costs=costs)
        ops = dict(plan.source_frames)
        assert ops[8] == VFRPlan.BOB_T
        # clean frames keep their weave/merge ops
        assert ops[0] == VFRPlan.WEAVE
        # durations unchanged (replacement, not a rate change)
        assert set(plan.durations) == {5}

    def test_no_costs_means_no_ucf(self):
        from amatsukaze_tpu.models.kfm import (
            CycleDecision, CycleMode, VFRPlan, build_vfr_plan)

        decisions = [CycleDecision(CycleMode.FILM, 0) for _ in range(2)]
        plan = build_vfr_plan(decisions, 10)
        assert all(op != VFRPlan.BOB_T for _, op in plan.source_frames)
