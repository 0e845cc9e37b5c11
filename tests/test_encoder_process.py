"""In-build encoder placement (Config.encoder_process): the stage-pipelined
subprocess mode (the reference's architecture, Encoder.hpp:94-164 — y4m over
stdin to a dedicated encoder process) must produce byte-identical output to
the in-process sink."""

import os

import numpy as np
import pytest

import ts_gen
from amatsukaze_tpu.pipeline.settings import Config, Settings
from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
from amatsukaze_tpu.utils.context import AMTContext

W, H = 96, 64


def _bridge_ok():
    try:
        from amatsukaze_tpu.video.avdec import avdec_available

        return avdec_available()
    except Exception:  # noqa: BLE001
        return False


@pytest.mark.skipif(not _bridge_ok(), reason="libav bridge unavailable")
class TestEncoderProcess:
    def _run(self, tmp_path, mode: int) -> bytes:
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory

        work = tmp_path / f"ep{mode}"
        work.mkdir()
        src = work / "src.ts"
        src.write_bytes(ts_gen.build_simple_ts(num_frames=30,
                                               width=W, height=H))
        conf = Config()
        conf.src_file_path = str(src)
        conf.out_video_path = str(work / "out")
        conf.work_dir = str(work)
        conf.encoder_path = "x264"  # absent binary -> in-build shim
        conf.encoder_options = "--preset ultrafast --crf 20"
        conf.encoder_process = mode
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        out = report["outfiles"][0]["path"]
        assert os.path.getsize(out) > 0
        return open(out, "rb").read()

    def test_subprocess_matches_inprocess(self, tmp_path):
        inproc = self._run(tmp_path, 0)
        subproc = self._run(tmp_path, 1)
        assert len(inproc) > 1000
        assert inproc == subproc
