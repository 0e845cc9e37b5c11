"""Profile-guided optimization flow for the MPEG-2 decoder.

``make pgo`` (or bench.py's pre-timer setup) runs this script:

1. generate a broadcast-like training bitstream (libav bridge when
   available — 1440x1080i, B-frames, like real recordings; else the
   pure-Python test encoder at a smaller size)
2. rebuild mpeg2dec.o with ``-fprofile-generate`` and decode the stream
   in a child process (the .gcda profile dumps at process exit)
3. rebuild with ``-fprofile-use``

PGO is scoped to mpeg2dec.o only (see Makefile): gcc treats unprofiled
code in a -fprofile-use TU as cold, so the other engines must not share
the flag.  Measured on 1440x1080i: ~438 fps single-core vs ~310 for the
plain -O3 build (the VLC/IDCT/MC branch pattern is highly biased and a
profile teaches gcc the layout; ReaderWriterFFmpeg.hpp:256-483 is the
reference's delegate for this job, running FFmpeg's hand-scheduled
decoder).

Idempotent: a marker newer than mpeg2dec.cpp skips the whole flow.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
PGO_DIR = os.path.join(HERE, ".pgo")
MARKER = os.path.join(PGO_DIR, "trained.ok")
TRAIN_ES = os.path.join(PGO_DIR, "train.es")

_TRAINER = r"""
import ctypes, sys
lib = ctypes.CDLL(sys.argv[1])
lib.M2V_Create.restype = ctypes.c_void_p
lib.M2V_Destroy.argtypes = [ctypes.c_void_p]
lib.M2V_DecodePicture.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_longlong]
lib.M2V_Flush.argtypes = [ctypes.c_void_p]
lib.M2V_NextInfo.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
lib.M2V_NextInfo.restype = ctypes.c_int
lib.M2V_BorrowFrame.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_longlong),
                                ctypes.POINTER(ctypes.c_void_p),
                                ctypes.POINTER(ctypes.c_int)]
lib.M2V_BorrowFrame.restype = ctypes.c_int
lib.M2V_ReleaseBorrow.argtypes = [ctypes.c_void_p, ctypes.c_longlong]

es = open(sys.argv[2], "rb").read()
# split on picture start codes (00 00 01 00), keeping headers attached
starts = []
i = 0
while True:
    i = es.find(b"\x00\x00\x01\x00", i)
    if i < 0:
        break
    starts.append(i)
    i += 4
cuts = [0] + starts[1:] + [len(es)]
chunks = [es[cuts[k]:cuts[k + 1]] for k in range(len(cuts) - 1)]

info = (ctypes.c_int * 10)()
bid = ctypes.c_longlong()
planes = (ctypes.c_void_p * 3)()
strides = (ctypes.c_int * 3)()
frames = 0
for _ in range(3):
    h = lib.M2V_Create()
    for c in chunks:
        lib.M2V_DecodePicture(h, c, len(c))
        while lib.M2V_NextInfo(h, info):
            if not lib.M2V_BorrowFrame(h, bid, planes, strides):
                break
            lib.M2V_ReleaseBorrow(h, bid.value)
            frames += 1
    lib.M2V_Flush(h)
    while lib.M2V_NextInfo(h, info):
        if not lib.M2V_BorrowFrame(h, bid, planes, strides):
            break
        lib.M2V_ReleaseBorrow(h, bid.value)
        frames += 1
    lib.M2V_Destroy(h)
print(f"pgo trainer: decoded {frames} frames")
"""


def _gen_stream() -> None:
    """Write the training ES. Bridge-encoded 1080i when libav exists;
    pure-Python encoder otherwise."""
    import numpy as np

    repo = os.path.dirname(HERE)
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    os.environ.setdefault("AMATSUKAZE_AV_LOG", "fatal")
    try:
        from amatsukaze_tpu.video.avdec import AvVideoEncoder, avdec_available

        if avdec_available():
            w, h = 1440, 1080
            rng = np.random.default_rng(11)
            try:
                from scipy.ndimage import gaussian_filter

                base = gaussian_filter(rng.uniform(30, 225, (h, w)), 1.2)
                ub = gaussian_filter(rng.uniform(100, 156, (h // 2, w // 2)),
                                     2.0)
            except ImportError:
                base = rng.uniform(30, 225, (h, w))
                ub = rng.uniform(100, 156, (h // 2, w // 2))
            enc = AvVideoEncoder(w, h, fps_num=30000, fps_den=1001, crf=0,
                                 preset="", interlaced=True, bframes=2,
                                 codec="mpeg2video",
                                 x264_params="b=10M:maxrate=14M:bufsize=4M")
            pkts = []
            for i in range(30):
                y = np.clip(np.roll(base, 3 * i, axis=1)
                            + rng.normal(0, 6, (h, w)), 0,
                            255).astype(np.uint8)
                u = np.clip(ub + rng.normal(0, 2, ub.shape), 0,
                            255).astype(np.uint8)
                pkts.extend(enc.encode(y, u, u))
            pkts.extend(enc.flush())
            with open(TRAIN_ES, "wb") as f:
                f.write(b"".join(pkts))
            return
    except Exception:  # noqa: BLE001 - fall through to the pure encoder
        pass
    import mpeg2_enc as E

    w, h = 352, 288
    frames = E.synth_frames(w, h, 24)
    enc = E.Mpeg2TestEncoder(E.EncConfig(w, h, qs=4, progressive=False,
                                         search=4))
    es = enc.encode(frames, "IBBPBBPBBPBB" * 2)
    with open(TRAIN_ES, "wb") as f:
        f.write(es)


def main() -> int:
    src = os.path.join(HERE, "mpeg2dec.cpp")
    mk = os.path.join(HERE, "Makefile")
    if (os.path.exists(MARKER)
            and os.path.getmtime(MARKER) > os.path.getmtime(src)
            and os.path.getmtime(MARKER) > os.path.getmtime(mk)):
        return 0
    os.makedirs(PGO_DIR, exist_ok=True)
    if not os.path.exists(TRAIN_ES):
        _gen_stream()

    def mk_stage(stage: str) -> None:
        obj = os.path.join(HERE, "mpeg2dec.o")
        if os.path.exists(obj):
            os.remove(obj)
        env = dict(os.environ)
        if stage:
            env["PGO_STAGE"] = stage
        subprocess.run(["make", "-C", HERE], env=env, check=True,
                       stdout=subprocess.DEVNULL)

    mk_stage("gen")
    so = os.path.join(HERE, "libamatsukaze_native.so")
    subprocess.run([sys.executable, "-c", _TRAINER, so, TRAIN_ES],
                   check=True, stdout=subprocess.DEVNULL, cwd=HERE)
    mk_stage("use")
    with open(MARKER, "w") as f:
        f.write("ok\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
