"""H.264 source support, validated with REAL x264 streams (encoded
in-process via the FFmpeg bridge's libx264).

Broadcast H.264 carries buffering-period + pic-timing SEI with
pic_struct; the ES parser (ts/video_h264.py) keys frame emission off
those, exactly like the reference's H264VideoParser. x264 options
pic-struct + nal-hrd reproduce that stream shape.
"""

from __future__ import annotations

import math
import os
import stat

import numpy as np
import pytest

import mpeg2_enc as E
import ts_gen


def _bridge_or_skip():
    from amatsukaze_tpu.video.avdec import avdec_available

    if not avdec_available():
        pytest.skip("FFmpeg bridge unavailable")


def _encode_h264(frames, w, h, **kw):
    from amatsukaze_tpu.video.avdec import AvH264Encoder

    enc = AvH264Encoder(
        w, h, crf=18, bframes=0,
        x264_params="pic-struct=1:nal-hrd=vbr:force-cfr=1:aud=1", **kw)
    aus = []
    for f in frames:
        aus.extend(enc.encode(f.y, f.u, f.v))
    aus.extend(enc.flush())
    return aus


class TestH264Parser:
    def test_real_x264_stream_parses(self):
        _bridge_or_skip()
        from amatsukaze_tpu.ts.video_h264 import H264VideoParser
        from amatsukaze_tpu.types import FrameType, VideoStreamFormat
        from amatsukaze_tpu.utils.context import AMTContext

        n = 12
        frames = E.synth_frames(96, 64, n)
        aus = _encode_h264(frames, 96, 64)
        assert len(aus) == n
        p = H264VideoParser(AMTContext(level="error"))
        infos = []
        for i, au in enumerate(aus):
            r = p.input_frame(au, pts=90000 + i * 3003,
                              dts=90000 + i * 3003)
            if r:
                infos.extend(r)
        assert len(infos) == n
        f0 = infos[0]
        assert f0.format.width == 96 and f0.format.height == 64
        assert f0.format.format == VideoStreamFormat.H264
        assert f0.format.frame_rate_num == 30000
        assert f0.format.frame_rate_denom == 1001
        assert f0.is_gop_start
        assert f0.type == FrameType.I
        assert any(fi.type == FrameType.P for fi in infos[1:])


class TestH264Pipeline:
    def test_full_transcode_real_pixels(self, tmp_path):
        """H.264-in-TS -> demux -> reform -> in-process libav decode ->
        filter none -> encoder: decoded pixels reach the output."""
        _bridge_or_skip()
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.utils.context import AMTContext

        W, H, n = 96, 64, 30
        frames = E.synth_frames(W, H, n)
        aus = _encode_h264(frames, W, H)
        src = tmp_path / "h264.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H, video_es_frames=aus,
            video_stream_type=0x1B))
        fake = tmp_path / "fake_x264"
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


class TestInbuildEncoder:
    """Full transcode with ZERO external binaries: MPEG2 TS -> in-build
    demux + decode -> filter -> in-build libx264 shim (the default
    'x264' binary is absent, so resolve_encoder_command swaps in
    tools/x264_shim) -> real H.264 output, decoded back for PSNR."""

    def test_zero_binary_transcode(self, tmp_path):
        _bridge_or_skip()
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks
        from amatsukaze_tpu.utils.context import AMTContext
        from amatsukaze_tpu.video.avdec import AvVideoDecoder

        W, H, n = 96, 64, 24
        frames = E.synth_frames(W, H, n)
        enc = E.Mpeg2TestEncoder(E.EncConfig(W, H, qs=4,
                                             progressive=False))
        es = enc.encode(frames, "I" + "P" * (n - 1))
        src = tmp_path / "src.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H,
            video_es_frames=list(iter_picture_chunks(es))))

        conf = Config()
        conf.src_file_path = str(src)
        conf.out_video_path = str(tmp_path / "out")
        conf.out_info_json_path = str(tmp_path / "r.json")
        conf.work_dir = str(tmp_path)
        # conf.encoder_path stays the default "x264" (no such binary)
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        out = report["outfiles"][0]["path"]
        data = open(out, "rb").read()
        assert data[4:8] == b"ftyp"  # a REAL mp4 (in-build remux)
        got = list(AvVideoDecoder(out).frames())
        assert len(got) >= n - 2
        worst = 99.0
        for i, (y, u, v) in enumerate(got[:n - 2]):
            mse = np.mean((y.astype(float) -
                           frames[i].y.astype(float)) ** 2)
            worst = min(worst, 10 * math.log10(255 ** 2 / max(mse, 1e-9)))
        assert worst > 30, worst


class TestInbuildTsRemux:
    """ts/m2ts outputs through the in-build libavformat remux (the
    external path uses tsMuxeR with a meta file, reference
    Muxer.hpp:171-199; zero-binary environments ride the bridge's
    mpegts muxer, m2ts mode for BDAV 192-byte packets). The produced
    transport stream is validated with the repo's OWN TS stack."""

    @pytest.mark.parametrize("fmt", ["ts", "m2ts"])
    def test_zero_binary_ts_output(self, fmt, tmp_path):
        _bridge_or_skip()
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import (Config, OutputFormat,
                                                      Settings)
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.ts.info import TsInfo
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks
        from amatsukaze_tpu.utils.context import AMTContext

        W, H, n = 96, 64, 24
        frames = E.synth_frames(W, H, n)
        enc = E.Mpeg2TestEncoder(E.EncConfig(W, H, qs=4,
                                             progressive=False))
        es = enc.encode(frames, "I" + "P" * (n - 1))
        src = tmp_path / "src.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H,
            video_es_frames=list(iter_picture_chunks(es))))

        conf = Config()
        conf.src_file_path = str(src)
        conf.out_video_path = str(tmp_path / "out")
        conf.out_info_json_path = str(tmp_path / "r.json")
        conf.work_dir = str(tmp_path)
        conf.format = OutputFormat(fmt)
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        out = report["outfiles"][0]["path"]
        assert out.endswith("." + fmt)
        data = open(out, "rb").read()
        assert len(data) > 0
        ts_bytes = data
        if fmt == "m2ts":
            # BDAV: 192-byte packets, 4-byte TP_extra_header then sync;
            # strip the TP_extra_headers -> a plain 188 TS for the stack
            assert len(data) % 192 == 0
            assert all(data[i + 4] == 0x47
                       for i in range(0, min(len(data), 192 * 64), 192))
            arr = np.frombuffer(data, np.uint8).reshape(-1, 192)
            ts_bytes = arr[:, 4:].tobytes()
        else:
            assert len(ts_bytes) % 188 == 0
            assert all(ts_bytes[i] == 0x47
                       for i in range(0, min(len(ts_bytes), 188 * 64),
                                      188))
        # dogfood: the repo's own prober must see a video+audio program
        probe = tmp_path / "probe.ts"
        probe.write_bytes(ts_bytes)
        info = TsInfo(AMTContext(level="error"))
        assert info.read_file(str(probe))
        assert any(p.has_video for p in info.programs)
        # the source TS carries one AAC track; the remux must keep it.
        # plain ts: ADTS rides DVB stream_type 0x0F -> TsInfo sees it;
        # m2ts: libavformat maps non-BD codecs to private 0x06, so
        # assert presence via a second elementary PID carrying PES
        if fmt == "ts":
            assert any(p.has_audio for p in info.programs)
        else:
            arr = np.frombuffer(ts_bytes, np.uint8).reshape(-1, 188)
            pids = {int(((int(r[1]) & 0x1F) << 8) | int(r[2]))
                    for r in arr}
            es_pids = {p for p in pids
                       if p not in (0x0000, 0x0011, 0x1FFF)
                       and all(p != q.pmt_pid for q in info.programs)}
            assert len(es_pids) >= 2, pids


class TestEncoderFamily:
    """The in-build encoder fallback covers all three software encoders
    the reference supports (x264 / x265 / SVT-AV1)."""

    @pytest.mark.parametrize("codec,preset", [
        ("libx264", "veryfast"), ("libx265", "ultrafast"),
        ("libsvtav1", "12")])
    def test_encode_decode_round_trip(self, codec, preset):
        _bridge_or_skip()
        from amatsukaze_tpu.video.avdec import (AvVideoDecoder,
                                                AvVideoEncoder)

        frames = E.synth_frames(96, 64, 6)
        try:
            enc = AvVideoEncoder(96, 64, crf=25, preset=preset,
                                 bframes=0, codec=codec)
        except RuntimeError:
            pytest.skip(f"{codec} not present in libavcodec")
        es = b""
        for f in frames:
            es += b"".join(enc.encode(f.y, f.u, f.v))
        es += b"".join(enc.flush())
        assert len(es) > 500
        ext = {"libx264": "264", "libx265": "265",
               "libsvtav1": "obu"}[codec]
        p = f"/tmp/_fam.{ext}"
        open(p, "wb").write(es)
        got = list(AvVideoDecoder(p).frames())
        assert len(got) == 6

    def test_resolver_maps_codecs(self):
        from amatsukaze_tpu.pipeline.settings import (
            Encoder, resolve_encoder_command)

        cmd = resolve_encoder_command(
            '"x265" --crf 20 -o "out.265" --demuxer y4m -', Encoder.X265)
        if "x264_shim" in cmd:
            assert "--shim-codec libx265" in cmd
        cmd = resolve_encoder_command(
            '"definitely_missing_binary" -o "o" -', Encoder.QSVENC)
        assert cmd.startswith('"definitely_missing_binary"')  # no shim


class TestH264QpMaps:
    def test_qp_maps_via_export(self, tmp_path):
        """FFmpeg's per-block QP export feeds the QP-aware deblocker for
        H.264 sources (the ES-layer extractor only covers MPEG2)."""
        _bridge_or_skip()
        from amatsukaze_tpu.ts.qp_extract import qp_map_source_from_avdec
        from amatsukaze_tpu.video.avdec import AvVideoEncoder

        frames = E.synth_frames(96, 64, 6)
        enc = AvVideoEncoder(96, 64, crf=25, bframes=0)
        es = b""
        for f in frames:
            es += b"".join(enc.encode(f.y, f.u, f.v))
        es += b"".join(enc.flush())
        p = tmp_path / "q.264"
        p.write_bytes(es)
        qs = qp_map_source_from_avdec(str(p))
        assert qs is not None and len(qs) == 6
        m = qs.maps(0, 6)
        assert m.shape == (6, 4, 6)
        assert m.min() > 0 and m.max() < 52  # H.264 QP range
        sel = qs.select([0, 2, 4])
        assert len(sel.results) == 3

    def test_deblock_in_h264_pipeline(self, tmp_path):
        """Full H.264 transcode with the QP deblock post filter on."""
        _bridge_or_skip()
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.utils.context import AMTContext

        W, H, n = 96, 64, 24
        frames = E.synth_frames(W, H, n)
        aus = _encode_h264(frames, W, H)
        src = tmp_path / "h264.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H, video_es_frames=aus,
            video_stream_type=0x1B))
        fake = tmp_path / "fake_x264"
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
        conf.post_filter = "deblock"
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        data = open(report["outfiles"][0]["path"], "rb").read()
        assert data.count(b"FRAME\n") >= n - 1


class TestInbuildH264Decoder:
    def test_native_h264_decode_in_pipeline(self, tmp_path):
        """conf.h264_decoder = 'native' routes the PS intermediate through
        the in-build pure-Python H.264 decoder (video/h264_ref.py); output
        pixels are bit-identical to the libav-bridge decode."""
        _bridge_or_skip()
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.utils.context import AMTContext

        W, H, n = 96, 64, 12
        frames = E.synth_frames(W, H, n)
        aus = _encode_h264(frames, W, H)
        src = tmp_path / "h264.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H, video_es_frames=aus,
            video_stream_type=0x1B))
        fake = tmp_path / "fake_x264"
        fake.write_text(
            '#!/bin/bash\nout=""\nwhile [ $# -gt 0 ]; do case "$1" in '
            '-o) out="$2"; shift 2;; *) shift;; esac; done\ncat > "$out"\n')
        fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

        outs = {}
        for mode, sub in (("avlib", "a"), ("native", "b")):
            wd = tmp_path / sub
            wd.mkdir()
            conf = Config()
            conf.src_file_path = str(src)
            conf.out_video_path = str(wd / "out")
            conf.out_info_json_path = str(wd / "r.json")
            conf.work_dir = str(wd)
            conf.encoder_path = str(fake)
            conf.h264_decoder = mode
            conf.no_remove_tmp = True
            ctx = AMTContext(level="error")
            pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                     decoder_factory=default_decoder_factory())
            report = pipe.run()
            outs[mode] = open(report["outfiles"][0]["path"], "rb").read()
        assert outs["avlib"] == outs["native"]
        assert outs["native"].count(b"FRAME\n") >= n - 1
