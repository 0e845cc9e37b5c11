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
