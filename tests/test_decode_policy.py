"""Decode routing policy (ARCHITECTURE.md "4K HEVC decode policy").

The in-build decoders are bit-exact but single-threaded; >=2160p-class
HEVC must ride libavcodec when a bridge exists, and an explicit
"native" choice on a 4K source is honoured with a logged warning
(reference context: the upstream decodes H.264/HEVC only through
FFmpeg, ReaderWriterFFmpeg.hpp:256-483, and exposes HW decoder choices
AMTSource.hpp:97-152 that do not apply to TPU hosts)."""

from __future__ import annotations

import types

import pytest

from amatsukaze_tpu.pipeline import decoders as D
from amatsukaze_tpu.types import VideoFormat, VideoStreamFormat
from amatsukaze_tpu.utils.context import AMTContext


def make_pipeline(width, height, fmt, mpeg2_choice="default",
                  h264_choice="default", tmp_path="/tmp"):
    vfmt = VideoFormat()
    vfmt.width = width
    vfmt.height = height
    vfmt.format = fmt
    reform = types.SimpleNamespace(
        formats=[types.SimpleNamespace(video_format=vfmt)],
        format_start_index=[0],
    )
    conf = types.SimpleNamespace(mpeg2_decoder=mpeg2_choice,
                                 h264_decoder=h264_choice)
    settings = types.SimpleNamespace(
        conf=conf,
        int_video_file_path=lambda v: str(tmp_path) + f"/i{v}.mpg")
    ctx = AMTContext(level="error")
    warnings = []
    orig_warn = ctx.warn
    ctx.warn = lambda msg, *a: warnings.append(msg % a if a else msg)
    del orig_warn
    return types.SimpleNamespace(_reform=reform, settings=settings,
                                 ctx=ctx, warnings=warnings)


class TestIs4k:
    def test_thresholds(self):
        f = VideoFormat()
        f.width, f.height = 3840, 2160
        assert D._is_4k(f)
        f.width, f.height = 1920, 1080
        assert not D._is_4k(f)
        f.width, f.height = 1440, 1080
        assert not D._is_4k(f)
        f.width, f.height = 3840, 1600  # UHD-class by either axis
        assert D._is_4k(f)


class TestRouting:
    def test_4k_hevc_prefers_bridge(self, tmp_path, monkeypatch):
        """Default choice + 4K HEVC + bridge available -> avlib."""
        monkeypatch.setattr(D.shutil, "which", lambda _: None)
        monkeypatch.setattr(D, "avlib_available", lambda: True)
        seen = {}
        monkeypatch.setattr(
            D, "avlib_decoder_factory",
            lambda p, v: seen.setdefault("avlib", True) or iter(()))
        p = make_pipeline(3840, 2160, VideoStreamFormat.H265,
                          tmp_path=tmp_path)
        D.auto_decoder_factory(p, 0)
        assert seen.get("avlib")

    def test_4k_hevc_zero_binary_warns_and_uses_inbuild(self, tmp_path,
                                                        monkeypatch):
        monkeypatch.setattr(D.shutil, "which", lambda _: None)
        monkeypatch.setattr(D, "avlib_available", lambda: False)
        monkeypatch.setattr(D, "cv2_available", lambda: False)
        seen = {}
        monkeypatch.setattr(
            D, "h265ref_decoder_factory",
            lambda p, v: seen.setdefault("inbuild", True) or iter(()))
        p = make_pipeline(3840, 2160, VideoStreamFormat.H265,
                          tmp_path=tmp_path)
        D.auto_decoder_factory(p, 0)
        assert seen.get("inbuild")
        assert any("4K" in w or "below realtime" in w for w in p.warnings)

    def test_native_choice_on_4k_honoured_with_warning(self, tmp_path,
                                                       monkeypatch):
        seen = {}
        monkeypatch.setattr(
            D, "h265ref_decoder_factory",
            lambda p, v: seen.setdefault("inbuild", True) or iter(()))
        p = make_pipeline(3840, 2160, VideoStreamFormat.H265,
                          h264_choice="native", tmp_path=tmp_path)
        D.auto_decoder_factory(p, 0)
        assert seen.get("inbuild")
        # the explicit-native warning fires before dispatch
        # (decoders.py auto_decoder_factory 4K policy)

    def test_1080p_hevc_native_choice_no_warning(self, tmp_path,
                                                 monkeypatch):
        seen = {}
        monkeypatch.setattr(
            D, "h265ref_decoder_factory",
            lambda p, v: seen.setdefault("inbuild", True) or iter(()))
        p = make_pipeline(1920, 1080, VideoStreamFormat.H265,
                          h264_choice="native", tmp_path=tmp_path)
        D.auto_decoder_factory(p, 0)
        assert seen.get("inbuild")
        assert not p.warnings
