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
