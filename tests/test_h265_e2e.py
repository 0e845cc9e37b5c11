"""HEVC source support, validated with REAL x265 streams (encoded
in-process via the FFmpeg bridge's libx265).

Beyond reference parity: the upstream's TS layer comments stream_type
0x24 out of isVideo (Mpeg2TsParser.hpp:1420) and decodes HEVC only via
FFmpeg (ReaderWriterFFmpeg.hpp:355). Here HEVC TS is a first-class
input: ts/video_h265.py parses the ES, and the in-build decoder
(video/h265_ref.py) gives a zero-binary decode path.
"""

from __future__ import annotations

import math
import stat

import numpy as np
import pytest

import mpeg2_enc as E
import ts_gen


def _bridge_or_skip():
    from amatsukaze_tpu.video.avdec import avdec_available

    if not avdec_available():
        pytest.skip("FFmpeg bridge unavailable")


def _encode_h265(frames, w, h, params="", **kw):
    from amatsukaze_tpu.video.avdec import AvVideoEncoder

    enc = AvVideoEncoder(
        w, h, codec="libx265", preset="ultrafast", crf=20, bframes=0,
        x264_params="keyint=15:min-keyint=15:frame-threads=1:aud=1:"
                    "repeat-headers=1" + (":" + params if params else ""),
        **kw)
    aus = []
    for f in frames:
        aus.extend(enc.encode(f.y, f.u, f.v))
    aus.extend(enc.flush())
    return aus


class TestH265Parser:
    def test_real_x265_stream_parses(self):
        _bridge_or_skip()
        from amatsukaze_tpu.ts.video_h265 import H265VideoParser
        from amatsukaze_tpu.types import FrameType, VideoStreamFormat
        from amatsukaze_tpu.utils.context import AMTContext

        n = 20
        frames = E.synth_frames(96, 64, n)
        aus = _encode_h265(frames, 96, 64)
        assert len(aus) == n
        p = H265VideoParser(AMTContext(level="error"))
        infos = []
        for i, au in enumerate(aus):
            r = p.input_frame(au, pts=90000 + i * 3003,
                              dts=90000 + i * 3003)
            if r:
                infos.extend(r)
        assert len(infos) == n
        f0 = infos[0]
        assert f0.format.width == 96 and f0.format.height == 64
        assert f0.format.format == VideoStreamFormat.H265
        assert f0.format.frame_rate_num == 30000
        assert f0.format.frame_rate_denom == 1001
        assert f0.format.progressive
        assert f0.is_gop_start
        assert f0.type == FrameType.I
        assert any(fi.type == FrameType.P for fi in infos[1:])
        # second GOP starts at the IRAP 15 frames in
        assert infos[15].is_gop_start and infos[15].type == FrameType.I
        assert infos[0].pts == 90000 and infos[1].pts == 93003

    def test_conformance_crop_and_sar(self):
        _bridge_or_skip()
        from amatsukaze_tpu.ts.video_h265 import H265VideoParser
        from amatsukaze_tpu.utils.context import AMTContext

        # 100x60 forces a conformance window inside 8-aligned CTBs
        frames = E.synth_frames(100, 60, 2)
        aus = _encode_h265(frames, 100, 60, params="sar=4\\:3")
        p = H265VideoParser(AMTContext(level="error"))
        infos = []
        for i, au in enumerate(aus):
            r = p.input_frame(au, pts=90000 + i * 3003, dts=-1)
            if r:
                infos.extend(r)
        assert infos[0].format.width == 100
        assert infos[0].format.height == 60
        assert (infos[0].format.sar_width, infos[0].format.sar_height) \
            == (4, 3)


class TestH265Pipeline:
    def _run(self, tmp_path, conf_tune=None, n=24):
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.utils.context import AMTContext

        W, H = 96, 64
        frames = E.synth_frames(W, H, n)
        aus = _encode_h265(frames, W, H)
        src = tmp_path / "h265.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H, video_es_frames=aus,
            video_stream_type=0x24))
        fake = tmp_path / "fake_enc"
        fake.write_text(
            '#!/bin/bash\nout=""\nwhile [ $# -gt 0 ]; do case "$1" in '
            '-o) out="$2"; shift 2;; *) shift;; esac; done\ncat > "$out"\n')
        fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

        conf = Config()
        conf.src_file_path = str(src)
        conf.out_video_path = str(tmp_path / "out")
        conf.out_info_json_path = str(tmp_path / "r.json")
        conf.work_dir = str(tmp_path)
        conf.encoder_path = str(fake)
        conf.no_remove_tmp = True
        if conf_tune:
            conf_tune(conf)
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        assert data.startswith(b"YUV4MPEG2")
        got = data.count(b"FRAME\n")
        assert got >= n - 1  # one frame can be lost at stream EOF
        i = data.index(b"FRAME\n") + 6
        y0 = np.frombuffer(data[i:i + W * H], np.uint8).reshape(H, W)
        mse = np.mean((y0.astype(float) - frames[0].y.astype(float)) ** 2)
        psnr = 10 * math.log10(255 ** 2 / max(mse, 1e-9))
        assert psnr > 35, psnr

    def test_full_transcode_real_pixels(self, tmp_path):
        """HEVC-in-TS -> demux -> reform -> decode -> filter none ->
        encoder: decoded pixels reach the output."""
        _bridge_or_skip()
        self._run(tmp_path)

    def test_inbuild_decoder_route(self, tmp_path):
        """Same flow forced through the in-build HEVC decoder
        (h264_decoder='native' routes all AVC/HEVC to the oracles)."""
        _bridge_or_skip()

        def tune(conf):
            conf.h264_decoder = "native"

        self._run(tmp_path, conf_tune=tune, n=10)


def _encode10_aud(frames, w, h, params=""):
    from amatsukaze_tpu.video.avdec import AvVideoEncoder

    enc = AvVideoEncoder(
        w, h, codec="libx265", preset="ultrafast", crf=20, bframes=0,
        bit_depth=10,
        x264_params="keyint=6:min-keyint=6:frame-threads=1:aud=1:"
                    "repeat-headers=1:no-wpp=1"
                    + (":" + params if params else ""))
    aus = []
    for y, u, v in frames:
        aus.extend(enc.encode(y, u, v))
    aus.extend(enc.flush())
    return aus


def _moving10(w, h, n, seed=3):
    import scipy.ndimage as ndi
    rng = np.random.default_rng(seed)
    y0 = ndi.gaussian_filter(rng.uniform(0, 1023, (h, w)), 2.5,
                             mode="nearest").astype(np.uint16)
    u0 = ndi.gaussian_filter(rng.uniform(0, 1023, (h // 2, w // 2)), 2,
                             mode="nearest").astype(np.uint16)
    out = []
    for i in range(n):
        out.append((np.roll(y0, (3 * i, 7 * i), (0, 1)).copy(),
                    np.roll(u0, (i, 3 * i), (0, 1)).copy(),
                    np.roll(u0, (2 * i, i), (0, 1)).copy()))
    return out


class TestMain10Pipeline:
    """BS4K-shaped input: HEVC Main10 in TS. The unfiltered path keeps
    the full 10 bits through y4m C420p10 into a 10-bit x265 encode; the
    filtered path downconverts with rounding for the 8-bit device
    graph."""

    def _make_src(self, tmp_path, n=12):
        W, H = 96, 64
        frames = _moving10(W, H, n)
        aus = _encode10_aud(frames, W, H, params="qp=24")
        src = tmp_path / "m10.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H, video_es_frames=aus,
            video_stream_type=0x24))
        return src, frames, W, H

    def _run(self, tmp_path, src, encoder_path="x265", filter_mode=None,
             conf_tune=None):
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.utils.context import AMTContext

        conf = Config()
        conf.src_file_path = str(src)
        conf.out_video_path = str(tmp_path / "out")
        conf.out_info_json_path = str(tmp_path / "r.json")
        conf.work_dir = str(tmp_path)
        conf.encoder_path = encoder_path  # absent binary -> in-build shim
        if encoder_path == "x265":
            from amatsukaze_tpu.pipeline.settings import Encoder
            conf.encoder = Encoder.X265
        conf.no_remove_tmp = True
        if filter_mode:
            conf.filter_mode = filter_mode
        if conf_tune:
            conf_tune(conf)
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=default_decoder_factory())
        return pipe.run()

    def test_main10_passthrough_10bit_encode(self, tmp_path):
        """Unfiltered Main10 transcode stays 10-bit end to end: the
        in-build x265 shim encodes yuv420p10 and the output decodes to
        uint16 close to the source."""
        _bridge_or_skip()
        import math

        from amatsukaze_tpu.video.avdec import AvVideoDecoder

        src, frames, W, H = self._make_src(tmp_path)
        report = self._run(tmp_path, src, encoder_path="x265")
        out = report["outfiles"][0]["path"]
        dec = AvVideoDecoder(out, keep_depth=True)
        assert dec.bit_depth == 10  # REAL 10-bit output
        got = list(dec.frames())
        assert len(got) >= len(frames) - 1
        mse = np.mean((got[0][0].astype(float)
                       - frames[0][0].astype(float)) ** 2)
        psnr = 10 * math.log10(1023 ** 2 / max(mse, 1e-9))
        assert psnr > 40, psnr

    def test_main10_filtered_downconverts(self, tmp_path):
        """With a filter graph the device path runs at 8 bits: the
        output is 8-bit and still close to the (shifted) source."""
        _bridge_or_skip()
        import math

        from amatsukaze_tpu.video.avdec import AvVideoDecoder

        src, frames, W, H = self._make_src(tmp_path)
        report = self._run(tmp_path, src, encoder_path="x264",
                           filter_mode="yadif")
        out = report["outfiles"][0]["path"]
        dec = AvVideoDecoder(out, keep_depth=True)
        assert dec.bit_depth == 8
        got = list(dec.frames())
        assert got
        ref8 = ((frames[0][0].astype(np.int32) + 2) >> 2).clip(0, 255)
        mse = np.mean((got[0][0].astype(float) - ref8) ** 2)
        psnr = 10 * math.log10(255 ** 2 / max(mse, 1e-9))
        assert psnr > 30, psnr

    def test_main10_post_chain_stays_10bit(self, tmp_path):
        """Post-chain-only filtering (NR/deband — the realistic Main10
        case, 4K being progressive) runs the 14-bit device chain scaled
        from 10 bits and the output stays 10-bit."""
        _bridge_or_skip()
        import math

        from amatsukaze_tpu.video.avdec import AvVideoDecoder

        src, frames, W, H = self._make_src(tmp_path)

        def tune(conf):
            conf.post_filter = "nr,deband"

        report = self._run(tmp_path, src, encoder_path="x265",
                           conf_tune=tune)
        out = report["outfiles"][0]["path"]
        dec = AvVideoDecoder(out, keep_depth=True)
        assert dec.bit_depth == 10
        got = list(dec.frames())
        assert len(got) >= len(frames) - 1
        mse = np.mean((got[0][0].astype(float)
                       - frames[0][0].astype(float)) ** 2)
        psnr = 10 * math.log10(1023 ** 2 / max(mse, 1e-9))
        assert psnr > 34, psnr  # NR+deband perturb mildly


class TestParserRobustness:
    def test_h265_parser_survives_garbage(self):
        """The TS-layer ES parser must never raise on corrupt payloads
        (same posture as the MPEG2/H.264 parsers)."""
        from amatsukaze_tpu.ts.video_h265 import H265VideoParser
        from amatsukaze_tpu.utils.context import AMTContext

        rng = np.random.default_rng(9)
        p = H265VideoParser(AMTContext(level="error"))
        for i in range(200):
            blob = bytes(rng.integers(0, 256, int(rng.integers(4, 400)),
                                      dtype=np.uint8))
            if i % 3 == 0:  # salt with start codes + plausible NAL types
                blob = b"\x00\x00\x01" + bytes(
                    [int(rng.integers(0, 64)) << 1, 1]) + blob
            p.input_frame(blob, pts=90000 + i, dts=-1)


class TestSeekOpener:
    def test_annexb_seek_hevc(self, tmp_path):
        """Byte-seek random access over an HEVC ES: decoding from an
        IRAP offset yields the keyframe and its trailing frames
        (AMTSource byte-seek parity for the 4K codec)."""
        import re

        from amatsukaze_tpu.pipeline.decoders import annexb_ps_seek_opener
        from amatsukaze_tpu.types import VideoStreamFormat

        frames = _moving10(96, 64, 18)
        aus = _encode10_aud(frames, 96, 64, params="qp=24")
        es = b"".join(aus)
        p = tmp_path / "seek.h265"
        p.write_bytes(es)
        # reference display order from a full decode
        from amatsukaze_tpu.video.h265_ref import H265RefDecoder

        full = H265RefDecoder()
        ref = full.decode(es) + full.flush()
        # the 2nd IRAP's byte offset (keyint=6 -> display index 6)
        starts = [m.start() for m in re.finditer(b"\x00\x00\x01", es)]
        iraps = [s for s in starts
                 if 16 <= ((es[s + 3] >> 1) & 0x3F) <= 21]
        assert len(iraps) >= 2
        # the AU (incl. its parameter sets / AUD) starts before the VCL
        # NAL: seek from the preceding AUD
        auds = [s for s in starts if ((es[s + 3] >> 1) & 0x3F) == 35]
        aud_before = max(a for a in auds if a < iraps[1])
        opener = annexb_ps_seek_opener(str(p), VideoStreamFormat.H265,
                                       is_ps=False)
        got = list(opener(6, aud_before - 1))
        assert len(got) == len(ref) - 6
        for k, fr in enumerate(got):
            for a, b in zip(fr, ref[6 + k][:3]):
                assert np.array_equal(a, b)

    def test_annexb_seek_h264_rejects_non_idr(self, tmp_path):
        """Open-GOP H.264 (non-IDR I keyframes) is not a clean join:
        the opener raises FormatSeekError so callers fall back."""
        import mpeg2_enc as E
        from amatsukaze_tpu.pipeline.decoders import (FormatSeekError,
                                                      annexb_ps_seek_opener)
        from amatsukaze_tpu.types import VideoStreamFormat
        from amatsukaze_tpu.video.avdec import AvVideoEncoder

        frames = E.synth_frames(96, 64, 10)
        enc = AvVideoEncoder(96, 64, crf=23, bframes=2,
                             x264_params="keyint=4:open-gop=1:"
                             "scenecut=0:b-adapt=0")
        es = b"".join(sum([enc.encode(f.y, f.u, f.v) for f in frames],
                          [])) + b"".join(enc.flush())
        # cut to the 2nd I frame region: find a non-IDR slice start
        import re
        starts = [m.start() for m in re.finditer(b"\x00\x00\x01", es)]
        nonidr_i = [s for s in starts[4:] if (es[s + 3] & 0x1F) == 1]
        p = tmp_path / "seek.h264"
        p.write_bytes(es)
        opener = annexb_ps_seek_opener(str(p), VideoStreamFormat.H264,
                                       is_ps=False)
        with pytest.raises(FormatSeekError):
            list(opener(0, es.find(b"\x00\x00\x01", len(es) // 2)))
