"""Profile-guided optimization flow for the native video decoders.

``make pgo`` (or bench.py's pre-timer setup) runs this script:

1. generate broadcast-like training bitstreams — MPEG-2 always (libav
   bridge at 1440x1080i when available, else the pure-Python test
   encoder), H.264 CABAC + HEVC small clips when the bridge can encode
2. rebuild the trained decoder TUs with ``-fprofile-generate`` and
   decode the streams in a child process (.gcda dumps at process exit)
3. rebuild with ``-fprofile-use`` scoped to exactly the trained TUs
   (gcc treats unprofiled code in a -fprofile-use TU as cold, so the
   set must match — see Makefile PGO_OBJS)

Measured single-core: MPEG-2 ~310 -> ~424-438 fps 1080i, H.264
87 -> 94 fps 1080, HEVC 58 -> 66 fps 1080p (the VLC/CABAC/MC branch
patterns are highly biased and the profile teaches gcc the layout;
ReaderWriterFFmpeg.hpp:256-483 is the reference's delegate for this
job, running FFmpeg's hand-scheduled decoders).

Idempotent: a marker newer than the decoder sources skips the flow.
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

def train_m2v(path):
    es = open(path, "rb").read()
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
    for _ in range(3):
        h = lib.M2V_Create()
        for c in chunks:
            lib.M2V_DecodePicture(h, c, len(c))
            while lib.M2V_NextInfo(h, info):
                if not lib.M2V_BorrowFrame(h, bid, planes, strides):
                    break
                lib.M2V_ReleaseBorrow(h, bid.value)
        lib.M2V_Flush(h)
        while lib.M2V_NextInfo(h, info):
            if not lib.M2V_BorrowFrame(h, bid, planes, strides):
                break
            lib.M2V_ReleaseBorrow(h, bid.value)
        lib.M2V_Destroy(h)

def train_annexb(prefix, path):
    create = getattr(lib, prefix + "_Create")
    create.restype = ctypes.c_void_p
    destroy = getattr(lib, prefix + "_Destroy")
    destroy.argtypes = [ctypes.c_void_p]
    dec = getattr(lib, prefix + "_Decode")
    dec.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong]
    flush = getattr(lib, prefix + "_Flush")
    flush.argtypes = [ctypes.c_void_p]
    es = open(path, "rb").read()
    for _ in range(2):
        h = create()
        dec(h, es, len(es))
        flush(h)
        destroy(h)

for spec in sys.argv[2:]:
    kind, path = spec.split("=", 1)
    if kind == "m2v":
        train_m2v(path)
    elif kind == "h264":
        train_annexb("H264", path)
    elif kind == "h265":
        train_annexb("H265", path)
print("pgo trainer: done")
"""


TRAIN_264 = os.path.join(PGO_DIR, "train264.es")
TRAIN_265 = os.path.join(PGO_DIR, "train265.es")


def _gen_streams() -> list[str]:
    """Write the training bitstreams; returns trainer specs.  MPEG-2 is
    always trainable (pure-Python encoder fallback); H.264/HEVC need
    the libav bridge to encode — without it only mpeg2dec.o gets a
    profile (the Makefile scopes -fprofile-use accordingly)."""
    import numpy as np

    repo = os.path.dirname(HERE)
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    os.environ.setdefault("AMATSUKAZE_AV_LOG", "fatal")
    specs = [f"m2v={TRAIN_ES}"]
    have_av = False
    try:
        from amatsukaze_tpu.video.avdec import AvVideoEncoder, avdec_available

        have_av = avdec_available()
        if have_av and not (os.path.exists(TRAIN_264)
                            and os.path.exists(TRAIN_265)):
            # small clips: the branch profile transfers across
            # resolutions and the instrumented decode must stay cheap
            w2, h2 = 960, 544
            rng = np.random.default_rng(13)
            try:
                from scipy.ndimage import gaussian_filter as gf
            except ImportError:
                def gf(a, s):
                    return a
            b2 = gf(rng.uniform(30, 225, (h2, w2)), 1.5)
            u2 = gf(rng.uniform(100, 156, (h2 // 2, w2 // 2)), 2.0)
            frames = []
            for i in range(24):
                y = np.clip(np.roll(b2, 5 * i, axis=1)
                            + rng.normal(0, 5, (h2, w2)), 0,
                            255).astype(np.uint8)
                u = np.clip(u2 + rng.normal(0, 2, u2.shape), 0,
                            255).astype(np.uint8)
                frames.append((y, u, u))

            def enc_all(codec, params):
                enc = AvVideoEncoder(w2, h2, fps_num=30000, fps_den=1001,
                                     crf=23, preset="ultrafast",
                                     bframes=2, codec=codec,
                                     x264_params=params)
                pkts = []
                for y, u, v in frames:
                    pkts.extend(enc.encode(y, u, v))
                pkts.extend(enc.flush())
                return b"".join(pkts)

            with open(TRAIN_264, "wb") as f:
                f.write(enc_all("libx264",
                                "cabac=1:keyint=30:bframes=2:b-adapt=0"))
            with open(TRAIN_265, "wb") as f:
                f.write(enc_all(
                    "libx265",
                    "frame-threads=1:keyint=30:bframes=3:b-adapt=0:"
                    "log-level=error"))
    except Exception:  # noqa: BLE001 - mpeg2-only training still works
        have_av = False
    if have_av and os.path.exists(TRAIN_264):
        specs.append(f"h264={TRAIN_264}")
    if have_av and os.path.exists(TRAIN_265):
        specs.append(f"h265={TRAIN_265}")
    if not os.path.exists(TRAIN_ES):
        _gen_m2v_stream()
    return specs


def _gen_m2v_stream() -> None:
    """Write the MPEG-2 training ES. Bridge-encoded 1080i when libav
    exists; pure-Python encoder otherwise."""
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
    mk = os.path.join(HERE, "Makefile")
    srcs = [os.path.join(HERE, f)
            for f in ("mpeg2dec.cpp", "h264dec.cpp", "h265dec.cpp")]
    if os.path.exists(MARKER):
        mt = os.path.getmtime(MARKER)
        if all(mt > os.path.getmtime(p) for p in srcs + [mk]):
            return 0
    os.makedirs(PGO_DIR, exist_ok=True)
    specs = _gen_streams()
    objs = {"m2v": "mpeg2dec.o", "h264": "h264dec.o", "h265": "h265dec.o"}
    pgo_objs = " ".join(objs[sp.split("=", 1)[0]] for sp in specs)

    def mk_stage(stage: str) -> None:
        for o in pgo_objs.split():
            obj = os.path.join(HERE, o)
            if os.path.exists(obj):
                os.remove(obj)
        env = dict(os.environ, PGO_OBJS=pgo_objs)
        if stage:
            env["PGO_STAGE"] = stage
        subprocess.run(["make", "-C", HERE], env=env, check=True,
                       stdout=subprocess.DEVNULL)

    mk_stage("gen")
    so = os.path.join(HERE, "libamatsukaze_native.so")
    subprocess.run([sys.executable, "-c", _TRAINER, so] + specs,
                   check=True, stdout=subprocess.DEVNULL, cwd=HERE)
    mk_stage("use")
    with open(MARKER, "w") as f:
        f.write("ok\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
