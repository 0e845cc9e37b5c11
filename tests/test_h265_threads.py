"""Wavefront (WPP) parallel decode in the native HEVC engine
(native/h265dec.cpp run_wavefront): bit-exact vs the serial path, and
scaling on multi-core hosts.

The reference decodes HEVC through FFmpeg's threaded decoder (reference
Amatsukaze/ReaderWriterFFmpeg.hpp:256-483, thread_count set at
AMTSource.hpp:143); this is the in-build engine's equivalent.  The
thread count is read once per process from AMATSUKAZE_DECODE_THREADS,
so every configuration runs in a subprocess.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from test_h265_decode import _encode, _moving_frames

REPO = Path(__file__).resolve().parent.parent

_RUNNER = r"""
import hashlib, json, sys, time
import numpy as np
from amatsukaze_tpu.video.native import NativeH265Decoder

es = open(sys.argv[1], "rb").read()
reps = int(sys.argv[2])
best = None
digest = None
for _ in range(reps):
    dec = NativeH265Decoder()
    t0 = time.perf_counter()
    frames = dec.decode(es) + dec.flush()
    dt = time.perf_counter() - t0
    assert dec.errors == 0
    md = hashlib.sha256()
    for y, u, v, poc in frames:
        md.update(y.tobytes()); md.update(u.tobytes()); md.update(v.tobytes())
    digest = md.hexdigest()
    best = dt if best is None else min(best, dt)
print(json.dumps({"n": len(frames), "sha": digest, "sec": best}))
"""


def _run(es_path, threads, reps=1):
    env = dict(os.environ)
    env["AMATSUKAZE_DECODE_THREADS"] = str(threads)
    env["PYTHONPATH"] = str(REPO)
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, str(es_path), str(reps)],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def wpp_es(tmp_path_factory):
    from amatsukaze_tpu.video.avdec import avdec_available
    from amatsukaze_tpu.video.native import h265_native_available

    if not avdec_available():
        pytest.skip("FFmpeg bridge unavailable")
    if not h265_native_available():
        pytest.skip("native HEVC engine not built")
    # x265 enables WPP by default: 640x384 @ ctu=32 -> 12 substream rows
    es = _encode(_moving_frames(640, 384, 8), 640, 384,
                 "frame-threads=1:keyint=8:bframes=3:b-adapt=0:crf=26:ctu=32")
    p = tmp_path_factory.mktemp("wpp") / "wpp.es"
    p.write_bytes(es)
    return p


class TestWavefront:
    def test_bit_exact_vs_serial(self, wpp_es):
        serial = _run(wpp_es, 1)
        for n in (2, 4):
            wf = _run(wpp_es, n)
            assert wf["n"] == serial["n"]
            assert wf["sha"] == serial["sha"], f"threads={n} diverged"

    def test_scaling_multicore(self, wpp_es):
        """Wavefront speedup on a multi-core host.

        Skipped on single/dual-core boxes where there is nothing to
        measure; the serial-throughput ceiling there is documented in
        ARCHITECTURE.md (decoder inventory).
        """
        ncpu = os.cpu_count() or 1
        if ncpu < 4:
            pytest.skip(f"only {ncpu} cores; wavefront scaling needs >=4")
        serial = _run(wpp_es, 1, reps=3)
        wf = _run(wpp_es, 4, reps=3)
        speedup = serial["sec"] / max(wf["sec"], 1e-9)
        assert wf["sha"] == serial["sha"]
        # 12 wavefront rows on 4 threads: expect near-linear minus the
        # diagonal ramp; require a solid 2.5x so the test is not flaky
        # on loaded CI boxes (typical measured: >3x)
        assert speedup >= 2.5, f"wavefront speedup only {speedup:.2f}x"
