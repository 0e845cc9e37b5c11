"""Pluggable frame decoders.

The reference decodes intermediates with its own FFmpeg integration
(Amatsukaze/ReaderWriterFFmpeg.hpp, AMTSource.hpp). Here decode is a factory
`(pipeline, video_index) -> iterator[(Y, U, V)]`:

- FfmpegDecoder: shells out to an `ffmpeg` binary when one exists (production)
- NullDecoder: synthesises grey frames with the reform-derived format (lets
  the full pipeline run end-to-end in environments without a decoder)
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np


def default_decoder_factory():
    if shutil.which("ffmpeg"):
        return ffmpeg_decoder_factory
    return None


def ffmpeg_decoder_factory(pipeline, video_index: int):
    """Decode the intermediate ES with an external ffmpeg as yuv420p."""
    st = pipeline.settings
    path = st.int_video_file_path(video_index)
    fmt = pipeline_format(pipeline, video_index)
    w, h = fmt.width, fmt.height
    cmd = [
        "ffmpeg", "-v", "error", "-i", path,
        "-f", "rawvideo", "-pix_fmt", "yuv420p", "-",
    ]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
    ysize, csize = w * h, (w // 2) * (h // 2)
    try:
        while True:
            raw = proc.stdout.read(ysize + 2 * csize)
            if len(raw) < ysize + 2 * csize:
                break
            y = np.frombuffer(raw, np.uint8, ysize).reshape(h, w)
            u = np.frombuffer(raw, np.uint8, csize, ysize).reshape(h // 2, w // 2)
            v = np.frombuffer(raw, np.uint8, csize, ysize + csize).reshape(
                h // 2, w // 2
            )
            yield y, u, v
    finally:
        proc.stdout.close()
        proc.wait()


def pipeline_format(pipeline, video_index: int):
    reform = getattr(pipeline, "_reform", None)
    if reform is not None:
        return reform.formats[reform.format_start_index[video_index]].video_format
    raise RuntimeError("pipeline has no reform info yet")


class NullDecoderFactory:
    """Synthesises deterministic frames (for tests / decoderless runs)."""

    def __init__(self, level: int = 128):
        self.level = level

    def __call__(self, pipeline, video_index: int):
        reform = pipeline._reform
        fmt = reform.formats[
            reform.format_start_index[video_index]
        ].video_format
        n = len(reform.get_filter_source_frames(video_index))
        w, h = fmt.width or 64, fmt.height or 48
        y = np.full((h, w), self.level, np.uint8)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        for i in range(n):
            yield y, u, v


def ffmpeg_generic_decoder(src_path: str):
    """Generic-mode decoder: probe + decode any container via ffmpeg
    (ref AMTSimpleVideoEncoder's FFmpeg input, Encoder.hpp:266-476).

    Returns (VideoFormat, frame iterator of (Y, U, V), audio track files).
    """
    import json as _json
    import subprocess
    import tempfile

    from ..types import VideoFormat

    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-print_format", "json", "-show_streams",
         src_path],
        capture_output=True, text=True, check=True,
    )
    streams = _json.loads(probe.stdout)["streams"]
    vstreams = [s for s in streams if s["codec_type"] == "video"]
    astreams = [s for s in streams if s["codec_type"] == "audio"]
    if not vstreams:
        raise RuntimeError("no video stream")
    vs = vstreams[0]
    num, den = (int(x) for x in vs["r_frame_rate"].split("/"))
    fmt = VideoFormat(width=int(vs["width"]), height=int(vs["height"]),
                      frame_rate_num=num, frame_rate_denom=den,
                      progressive=vs.get("field_order", "progressive")
                      == "progressive", fixed_frame_rate=True)
    w, h = fmt.width, fmt.height

    def frames():
        cmd = ["ffmpeg", "-v", "error", "-i", src_path, "-map", "0:v:0",
               "-f", "rawvideo", "-pix_fmt", "yuv420p", "-"]
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        fsize = w * h * 3 // 2
        while True:
            buf = proc.stdout.read(fsize)
            if len(buf) < fsize:
                break
            arr = np.frombuffer(buf, np.uint8)
            y = arr[: w * h].reshape(h, w)
            u = arr[w * h: w * h + w * h // 4].reshape(h // 2, w // 2)
            v = arr[w * h + w * h // 4:].reshape(h // 2, w // 2)
            yield y, u, v
        proc.wait()

    audio_files = []
    for i, _ in enumerate(astreams):
        path = tempfile.mktemp(suffix=f".a{i}.aac")
        subprocess.run(["ffmpeg", "-v", "error", "-y", "-i", src_path,
                        "-map", f"0:a:{i}", "-c", "copy", "-f", "adts", path],
                       check=True)
        audio_files.append(path)
    return fmt, frames(), audio_files
