"""CM-decision golden on a broadcast-shaped recording: REAL coded MPEG2
video (logo lit in program parts), REAL decodable AAC audio with silence
at the cut points, full pipeline -> the trims must equal the constructed
ground truth EXACTLY (the BASELINE.json north star's "bit-identical CM
decisions", grounded against a hand-derived golden since the external
chapter_exe/join_logo_scp binaries don't exist in this environment)."""

import os
import stat
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ts_gen  # noqa: E402
from aac_gen import make_adts_frame, make_sce  # noqa: E402

from amatsukaze_tpu.pipeline.settings import Config, Settings  # noqa: E402
from amatsukaze_tpu.pipeline.transcode import TranscodePipeline  # noqa: E402
from amatsukaze_tpu.utils.context import AMTContext  # noqa: E402

W, H = 320, 192
FPS = 30000 / 1001
LW, LH, LX, LY = 24, 16, 12, 10

# ground-truth timeline (frames): program / CM / program
B1, B2, N = 450, 900, 1340  # CM block = 15.02 s (a 15 s unit)


def _avdec_ok():
    try:
        from amatsukaze_tpu.video.avdec import avdec_available

        return avdec_available()
    except Exception:  # noqa: BLE001
        return False


pytestmark = pytest.mark.skipif(not _avdec_ok(),
                                reason="libav bridge unavailable")


def _logo_planes():
    yy, xx = np.mgrid[0:LH, 0:LW]
    r = np.hypot((yy - LH / 2) / (LH / 2), (xx - LW / 2) / (LW / 2))
    alpha = (np.clip(1.1 - r, 0, 1) * 0.5).astype(np.float32)
    return alpha


def _save_lgd(tmp, alpha):
    from amatsukaze_tpu.models.lgd import LogoData, LogoHeader, save_lgd

    a = (1.0 / (1.0 - alpha)).astype(np.float32)
    b = (-alpha * 200.0 / (1.0 - alpha) / 255.0).astype(np.float32)
    header = LogoHeader(LW, LH, 1, 1, W, H, LX, LY, "golden", 1)
    logo = LogoData.create(header)
    logo.a_y = a
    logo.b_y = b
    logo.a_u[:] = 1.0
    logo.a_v[:] = 1.0
    path = str(tmp / "golden.lgd")
    save_lgd(path, logo)
    return path


def _video_es(alpha):
    """Three distinct scenes; the logo is blended in during program
    segments only."""
    from scipy.ndimage import gaussian_filter

    from amatsukaze_tpu.video.avdec import AvVideoEncoder

    rng = np.random.default_rng(4)
    # photometrically distinct scenes (a real cut changes both the pixel
    # values and the luma distribution — the detector requires diff>30
    # AND histogram correlation <0.85, like real broadcast cuts)
    ranges = [(20, 110), (140, 235), (60, 100)]
    scenes = [np.clip(gaussian_filter(
        rng.uniform(lo, hi, (H, W)), 1.5), 16, 235)
        for lo, hi in ranges]
    uc = np.full((H // 2, W // 2), 128, np.uint8)
    enc = AvVideoEncoder(W, H, fps_num=30000, fps_den=1001, crf=0,
                         preset="", interlaced=False, bframes=0,
                         codec="mpeg2video",
                         x264_params="b=6M:maxrate=8M:bufsize=2M")
    packets = []
    for f in range(N):
        seg = 0 if f < B1 else (1 if f < B2 else 2)
        y = scenes[seg] + rng.normal(0, 1.0, (H, W))
        if seg != 1:  # logo lit during program segments
            win = y[LY:LY + LH, LX:LX + LW]
            y[LY:LY + LH, LX:LX + LW] = (1 - alpha) * win + alpha * 200.0
        packets.extend(enc.encode(
            np.clip(y, 0, 255).astype(np.uint8), uc, uc))
    packets.extend(enc.flush())
    return b"".join(packets)


def _audio_frames():
    """Real decodable AAC-LC: loud frames everywhere except ~0.6 s of
    digital silence straddling each boundary."""
    def loud(w):
        make_sce(w, {4: [60, 60, 60, 60], 8: [50, 50, 50, 50]},
                 global_gain=150, sr_index=3, codebook=11, max_sfb=40)

    def silent(w):
        make_sce(w, {}, global_gain=0, sr_index=3, codebook=11, max_sfb=40)

    loud_f = make_adts_frame(loud, sr_index=3)
    silent_f = make_adts_frame(silent, sr_index=3)
    total = int(N / FPS * 48000 / 1024) + 4
    frames = []
    for i in range(total):
        t = i * 1024 / 48000.0
        in_gap = any(abs(t - b / FPS) < 0.3 for b in (B1, B2))
        frames.append(silent_f if in_gap else loud_f)
    return frames


@pytest.fixture(scope="module")
def golden_env(tmp_path_factory):
    from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks

    tmp = tmp_path_factory.mktemp("cm_golden")
    alpha = _logo_planes()
    es = _video_es(alpha)
    chunks = list(iter_picture_chunks(es))
    assert len(chunks) == N
    ts = ts_gen.build_simple_ts(width=W, height=H,
                                video_es_frames=chunks,
                                audio_es_frames=_audio_frames())
    src = tmp / "src.ts"
    src.write_bytes(ts)
    lgd = _save_lgd(tmp, alpha)
    return tmp, str(src), lgd


def _run(golden_env, extra=None):
    from amatsukaze_tpu.pipeline.decoders import default_decoder_factory

    tmp, src, lgd = golden_env
    conf = Config()
    conf.mode = "cm"
    conf.src_file_path = src
    run_dir = tmp / f"run{len(os.listdir(tmp))}"
    run_dir.mkdir()
    conf.out_video_path = str(run_dir / "out")
    conf.out_info_json_path = str(run_dir / "result.json")
    conf.work_dir = str(run_dir)
    conf.logo_path = [lgd]
    conf.no_remove_tmp = True
    if extra:
        for k, v in extra.items():
            setattr(conf, k, v)
    ctx = AMTContext(level="error")
    settings = Settings(ctx, conf)
    pipe = TranscodePipeline(ctx, settings,
                             decoder_factory=default_decoder_factory())
    pipe.run()
    from amatsukaze_tpu.models.cm_analyze import parse_trim_avs

    line = open(settings.tmp_trim_avs_path(0)).readline()
    return settings, parse_trim_avs(line, N)


class TestCmGolden:
    def test_trims_match_ground_truth_exactly(self, golden_env):
        settings, trims = _run(golden_env)
        # decoded stream loses the last frame at EOF; the tail border is
        # the decoded length. The CM cut borders must be EXACT.
        assert len(trims) == 4, trims
        assert trims[0] == 0
        assert trims[1] == B1, f"head cut off by {trims[1] - B1}"
        assert trims[2] == B2, f"CM end off by {trims[2] - B2}"
        assert trims[3] >= N - 2
        # divs: single short CM run -> no programme split
        divs = [int(x) for x in
                open(settings.tmp_div_path(0)).read().split()]
        assert divs == [0]

    def test_scpos_file_contract(self, golden_env):
        from amatsukaze_tpu.models.cm_analyze import parse_scene_changes_text

        settings, _ = _run(golden_env)
        scpos = parse_scene_changes_text(
            open(settings.tmp_chapter_exe_out_path(0)).read())
        assert B1 in scpos and B2 in scpos

    def test_jl_script_overrides_golden(self, golden_env):
        """The same stream with a user JL rule that re-adds the CM block
        must produce different cuts (the engine is script-driven, not
        hard-coded)."""
        tmp, src, lgd = golden_env
        jl = tmp / "keep_all.jl"
        jl.write_text("AutoIns -from 0 -to 99999\n")
        _, trims = _run(golden_env, {"jls_cmd_path": str(jl)})
        assert trims[:1] == [0] and len(trims) == 2  # everything kept
