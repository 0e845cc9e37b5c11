"""Standalone decoder perf harness (not a pytest module).

Generates bench-identical ES streams once into /tmp/decbench/, then
times the native decoders on the cached bitstreams so profiling runs
measure decode only.  Usage:

    python tests/perf_dec.py gen            # create cached streams
    python tests/perf_dec.py h264|hevc1080|hevc4k|mpeg2 [reps]
"""
import sys
import time
from pathlib import Path

import numpy as np

CACHE = Path("/tmp/decbench")
N = 60


def gen():
    from scipy.ndimage import gaussian_filter

    from amatsukaze_tpu.video.avdec import AvVideoEncoder

    CACHE.mkdir(exist_ok=True)

    def frames(w, h, depth=8, seed=7):
        rng = np.random.default_rng(seed)
        hi = 255 if depth == 8 else 1023
        dt = np.uint8 if depth == 8 else np.uint16
        base = gaussian_filter(rng.uniform(0, hi, (h, w)), 1.5)
        ubase = gaussian_filter(rng.uniform(0, hi, (h // 2, w // 2)), 2.0)
        out = []
        for i in range(N):
            y = np.clip(np.roll(base, 3 * i, axis=1), 0, hi).astype(dt)
            u = np.clip(np.roll(ubase, i, axis=1), 0, hi).astype(dt)
            out.append((y, u, u))
        return out

    def encode(w, h, codec, params, depth=8, interlaced=False):
        enc = AvVideoEncoder(w, h, fps_num=30000, fps_den=1001, crf=23,
                             preset="" if codec == "mpeg2video"
                             else "ultrafast",
                             interlaced=interlaced, bframes=2, codec=codec,
                             x264_params=params, bit_depth=depth)
        pkts = []
        for y, u, v in frames(w, h, depth):
            pkts.extend(enc.encode(y, u, v))
        pkts.extend(enc.flush())
        return b"".join(pkts)

    (CACHE / "mpeg2.es").write_bytes(
        encode(1440, 1080, "mpeg2video", "b=10M:maxrate=14M:bufsize=4M",
               interlaced=True))
    (CACHE / "h264.es").write_bytes(
        encode(1440, 1080, "libx264", "keyint=30:bframes=2:b-adapt=0:crf=23"))
    (CACHE / "hevc1080.es").write_bytes(
        encode(1920, 1080, "libx265",
               "frame-threads=1:keyint=30:bframes=3:b-adapt=0:crf=24"))
    (CACHE / "hevc4k.es").write_bytes(
        encode(3840, 2160, "libx265",
               "frame-threads=1:keyint=30:bframes=3:b-adapt=0:crf=26",
               depth=10))
    print("cached:", [p.name for p in CACHE.iterdir()])


def run(which, reps=1):
    from amatsukaze_tpu.video.native import (
        NativeH264Decoder,
        NativeH265Decoder,
        decode_es_native,
    )

    es = (CACHE / f"{which.replace('1080', '1080').replace('4k', '4k')}.es"
          ).read_bytes() if which != "mpeg2" else (CACHE / "mpeg2.es"
                                                   ).read_bytes()
    best = 0.0
    for _ in range(reps):
        t0 = time.process_time()
        if which == "mpeg2":
            cnt = len(decode_es_native(es))
        elif which == "h264":
            d = NativeH264Decoder()
            cnt = len(d.decode(es)) + len(d.flush())
        else:
            d = NativeH265Decoder()
            cnt = len(d.decode(es)) + len(d.flush())
        dt = time.process_time() - t0
        fps = cnt / dt
        best = max(best, fps)
        print(f"{which}: {cnt} frames in {dt:.2f}s cpu = {fps:.1f} fps")
    print(f"{which}: best {best:.1f} fps")


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen()
    else:
        run(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)
