"""Reference test vectors, ported 1:1 where the reference's inputs are
pure data (no Windows binaries / broadcast samples needed).

Each test cites the exact reference lines it replicates. The model for
this file is tests/test_vfr.py, which replays the reference's
MakeVFRBitrateZones vector (AmatsukazeTestImpl.hpp:632-665) bit-for-bit;
this file ports the remaining data-only vectors:

- EncoderOptionTest01-09 (AmatsukazeUnitTest.cpp:394-429) through
  ParseEncoderOption semantics (EncoderOptionParser.hpp:50-184)
- CLI ArgumentTest incl. the hex service id and the bad-flag rejection
  (AmatsukazeUnitTest.cpp:431-467)
- The AAC stream-walk decode with the +/-1 LSB acceptance rule
  (AmatsukazeTestImpl.hpp:151-231: NeAACDec stream loop vs .wav golden,
  tolerance |a-b| <= 1 per int16 sample)
- The dual-mono ADTS frame_length walk driver
  (AmatsukazeTestImpl.hpp:466-491 SplitDualMonoAAC)
"""

from __future__ import annotations

import numpy as np
import pytest

import aac_gen
from amatsukaze_tpu.pipeline.encoder_options import (
    EncoderDeint,
    parse_encoder_option,
)
from amatsukaze_tpu.pipeline.settings import Encoder
from amatsukaze_tpu.utils.context import AMTContext


class TestEncoderOptionVectors:
    """AmatsukazeUnitTest.cpp:394-429 EncoderOptionTest01-09, evaluated
    against ParseEncoderOption's documented outcomes
    (EncoderOptionParser.hpp:69-127). The reference harness runs these
    through the CLI's test_eo mode with -e QSVEnc."""

    @pytest.mark.parametrize("opt,deint", [
        ("--vpp-deinterlace none", EncoderDeint.NONE),        # Test01
        ("--vpp-deinterlace normal", EncoderDeint.D30P),      # Test02
        ("--vpp-deinterlace adaptive", EncoderDeint.D30P),    # Test03
        ("--vpp-deinterlace bob", EncoderDeint.D60P),         # Test04
        ("--vpp-deinterlace it", EncoderDeint.D24P),          # :75-77
    ])
    def test_vpp_deinterlace(self, opt, deint):
        info = parse_encoder_option(Encoder.QSVENC, opt)
        assert info.deint == deint
        assert not info.afs_timecode

    @pytest.mark.parametrize("opt", [
        # Test05: preset=anime sets drop, no timecode -> rejected
        # (EncoderOptionParser.hpp:113-116)
        "--vpp-afs preset=anime,24fps=true,rff=true",
        # Test06: same rejection, plain preset=anime
        "--vpp-afs preset=anime",
        # Test07: preset=24fps sets is24+drop, still no timecode
        "--vpp-afs preset=24fps",
        # Test08: preset AFTER 24fps=true overrides is24 (last write
        # wins, :104-108), drop stays on -> same rejection
        "--vpp-afs 24fps=true,preset=anime",
        # Test09's trailing option: 24fps without drop is the OTHER
        # rejection (:109-112)
        "--vpp-afs rff=true,24fps=true",
    ])
    def test_vpp_afs_rejections(self, opt):
        with pytest.raises(ValueError):
            parse_encoder_option(Encoder.NVENC, opt)

    def test_vpp_afs_vfr_timecode(self):
        # the accepted production shape: timecode=true -> VFR +
        # afs timecode (EncoderOptionParser.hpp:118-120)
        info = parse_encoder_option(
            Encoder.NVENC,
            "--vpp-afs preset=anime,24fps=true,timecode=true")
        assert info.deint == EncoderDeint.VFR
        assert info.afs_timecode

    def test_full_qsv_line(self):
        # Test09's full command line minus the rejected --vpp-afs tail
        # (AmatsukazeUnitTest.cpp:428)
        info = parse_encoder_option(
            Encoder.QSVENC,
            '-i %1 --avqsv --cqp 22:24:26 -u best --output-res 1280x720 '
            '--vpp-denoise 20 --tff --vpp-deinterlace normal '
            '--trellis auto --bframes 2 --gop-len 300 --audio-codec aac '
            '--audio-bitrate 128 -o "dpn1.mp4"')
        assert info.deint == EncoderDeint.D30P

    def test_x264_x265_imply_codec_only(self):
        # EncoderOptionParser.hpp:54-61: software encoders return their
        # codec immediately, options are not inspected
        i264 = parse_encoder_option(Encoder.X264, "--vpp-deinterlace bob")
        i265 = parse_encoder_option(Encoder.X265, "--vpp-deinterlace bob")
        assert i264.deint == EncoderDeint.NONE
        assert i265.deint == EncoderDeint.NONE


class TestCliArgumentVector:
    """AmatsukazeUnitTest.cpp:431-467 TEST(CLI, ArgumentTest): the full
    server-style argument list parses; '-s' takes decimal AND 0xHEX;
    an unknown flag is rejected."""

    ARGS = [
        "-s", "12345",
        "-i", "/hoge/input.ts",
        "-o", "/oops/output.mmp4",
        "-w", "/hoge/",
        "-et", "x265",
        "--dump",
        "-e", "/program/revXXX-x265.exe",
        "-eo", ("--preset slow --profile main --crf 23 --qcomp 0.7 "
                "--vbv-bufsize 10000 --vbv-maxrate 10000 --keyint -1 "
                "--min-keyint 4 --b-pyramid none --partitions "
                "p8x8,b8x8,i4x4 --ref 3 --weightp 0 --level 3"),
        "-m", "/program/revXXX-muxer.exe",
        "-t", "/program/timelineditro.exe",
        "-j", "JJJJJJJJSON.json",
    ]

    def _parse(self, argv):
        from amatsukaze_tpu.cli import args_to_config, build_parser

        args = build_parser().parse_args(argv)
        return args_to_config(args)

    def test_decimal_service_id(self):
        conf = self._parse(list(self.ARGS))
        assert conf.service_id == 12345
        assert conf.encoder.value == "x265"
        assert conf.encoder_path == "/program/revXXX-x265.exe"
        assert conf.muxer_path == "/program/revXXX-muxer.exe"
        assert "--qcomp 0.7" in conf.encoder_options

    def test_hex_service_id(self):
        # argv[2] = L"0x6308" (AmatsukazeUnitTest.cpp:462)
        argv = list(self.ARGS)
        argv[1] = "0x6308"
        conf = self._parse(argv)
        assert conf.service_id == 0x6308

    def test_bad_flag_rejected(self):
        # argv[1] = L"--ourput" -> EXPECT_ANY_THROW (:465-466)
        argv = list(self.ARGS)
        argv[0] = "--ourput"
        with pytest.raises(SystemExit):
            self._parse(argv)


class TestAacStreamToleranceVector:
    """AmatsukazeTestImpl.hpp:151-231 AacDecode: walk a concatenated
    ADTS stream frame by frame (advancing by bytesconsumed), accumulate
    int16 PCM, and accept the result when every sample is within 1 LSB
    of the golden decode. Here the golden is the pure-Python oracle and
    the candidate is the native decoder — same acceptance rule."""

    def test_stream_walk_one_lsb(self):
        from amatsukaze_tpu.audio.aac import AacLcDecoder
        from amatsukaze_tpu.audio.aac_native import (
            NativeAacDecoder,
            native_available,
        )

        if not native_available():
            pytest.skip("native library not buildable here")
        from amatsukaze_tpu.audio import aac_tables as T

        swb = T.SWB_OFFSETS[(1024, 48000)]
        rng = np.random.default_rng(42)
        frames = []
        for k in range(8):
            bands = {}
            for sfb in range(6):
                width = swb[sfb + 1] - swb[sfb]
                vals = [0] * width
                vals[int(rng.integers(0, width))] = int(rng.integers(1, 12))
                bands[sfb] = vals
            frames.append(aac_gen.make_adts_frame(
                lambda w, b=bands, g=100 + k: aac_gen.make_sce(
                    w, b, global_gain=g)))
        stream = b"".join(frames)

        def walk(decoder):
            from amatsukaze_tpu.ts.adts import AdtsHeader

            pcm = []
            off = 0
            while off + 7 <= len(stream):
                h = AdtsHeader()
                assert h.parse(stream[off:off + 7])  # :479-481
                assert off + h.frame_length <= len(stream)  # :482-484
                res = decoder.decode(stream[off:off + h.frame_length])
                assert res is not None
                pcm.append(np.frombuffer(res.pcm, "<i2"))
                off += h.frame_length
            return np.concatenate(pcm).astype(np.int32)

        golden = walk(AacLcDecoder())
        native = walk(NativeAacDecoder())
        assert golden.shape == native.shape  # :210-213 size must match
        assert int(np.abs(golden - native).max()) <= 1  # :216-219


class TestDualMonoWalkVector:
    """AmatsukazeTestImpl.hpp:466-491 SplitDualMonoAAC: the driver walks
    the source by AdtsHeader.frame_length and feeds each frame to the
    splitter; outputs are two decodable mono ADTS streams."""

    def test_dual_mono_stream_walk(self):
        from amatsukaze_tpu.audio.aac import AacLcDecoder
        from amatsukaze_tpu.ts.adts import AdtsHeader, DualMonoSplitter

        from amatsukaze_tpu.audio import aac_tables as T

        swb = T.SWB_OFFSETS[(1024, 48000)]
        rng = np.random.default_rng(7)
        frames = []
        for k in range(6):
            def mono_bands():
                sfb = int(rng.integers(4, 10))
                width = swb[sfb + 1] - swb[sfb]
                vals = [0] * width
                vals[int(rng.integers(0, width))] = int(rng.integers(5, 40))
                return {sfb: vals}

            b0, b1 = mono_bands(), mono_bands()

            def payload(w, a=b0, c=b1):
                aac_gen.make_sce(w, a, global_gain=150)
                aac_gen.make_sce(w, c, global_gain=155)

            frames.append(aac_gen.make_adts_frame(payload,
                                                  channel_config=0))
        stream = b"".join(frames)

        outs = [[], []]

        class Sink(DualMonoSplitter):
            def on_out_frame(self, index, data):
                outs[index].append(bytes(data))

        ctx = AMTContext(level="error")
        splitter = Sink(ctx, AacLcDecoder())
        off = 0
        while off + 7 <= len(stream):
            h = AdtsHeader()
            assert h.parse(stream[off:off + 7])
            assert off + h.frame_length <= len(stream)
            splitter.input_packet(stream[off:off + h.frame_length])
            off += h.frame_length
        assert len(outs[0]) == len(frames)
        assert len(outs[1]) == len(frames)
        # both mono outputs decode standalone
        for mono in outs:
            dec = AacLcDecoder()
            for f in mono:
                res = dec.decode(f)
                assert res is not None and res.num_channels == 1
