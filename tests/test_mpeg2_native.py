"""Differential tests: native C++ MPEG-2 decoder vs the Python oracle.

The native engine (native/mpeg2dec.cpp) mirrors the oracle's defined
arithmetic; on conformant streams the decoded frames must be
byte-identical. Corrupted streams must never crash either engine.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import mpeg2_enc as E
from mpeg2_enc import EncConfig, Mpeg2TestEncoder, synth_frames
from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks
from amatsukaze_tpu.video import Mpeg2RefDecoder, decode_es
from amatsukaze_tpu.video.native import (
    NativeMpeg2Decoder,
    decode_es_native,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")


def _assert_equal(a, b):
    assert len(a) == len(b), (len(a), len(b))
    for i, (fa, fb) in enumerate(zip(a, b)):
        for pl in "yuv":
            da, db = getattr(fa, pl), getattr(fb, pl)
            assert da.shape == db.shape, (i, pl)
            diff = np.abs(da.astype(int) - db.astype(int))
            assert diff.max() == 0, (i, pl, int(diff.max()))
        assert fa.coding_type == fb.coding_type
        assert fa.temporal_reference == fb.temporal_reference
        assert fa.top_field_first == fb.top_field_first


def _random_cfg(rng: np.random.Generator) -> tuple[EncConfig, str]:
    field_pics = bool(rng.integers(0, 2))
    w = int(rng.choice([48, 64, 80])) if not field_pics else 64
    h = int(rng.choice([32, 48, 64])) if not field_pics else 64
    n = int(rng.integers(2, 6))
    gop = "I" + "".join(rng.choice(["P", "P", "B"], n - 1))
    while gop.endswith("B"):  # trailing Bs have no backward anchor
        gop = gop[:-1] + "P"
    opts = {}
    if field_pics:
        structure = str(rng.choice(["tb", "bt"]))
        motion = str(rng.choice(["field", "16x8", "dp"]))
        for i in range(n):
            o = {"structure": structure}
            if gop[i] == "P":
                o["motion"] = motion
                if motion == "dp":
                    o["dmv"] = (int(rng.integers(-1, 2)),
                                int(rng.integers(-1, 2)))
                if motion == "16x8":
                    o["mv16x8"] = (int(rng.integers(-4, 5)),
                                   int(rng.integers(-4, 5)))
            opts[i] = o
        fpfd = True
    else:
        fpfd = bool(rng.integers(0, 2))
        if not fpfd:
            motion = str(rng.choice(["frame", "field", "dp"]))
            for i in range(n):
                o = {}
                if gop[i] == "P" or gop[i] == "B":
                    o["motion"] = motion if gop[i] == "P" else \
                        ("field" if motion == "field" else "frame")
                if gop[i] == "I" and bool(rng.integers(0, 2)):
                    o["dct"] = "field"
                if o:
                    opts[i] = o
    # 4:2:2 on a third of frame-motion frame-picture configs (the test
    # encoder's field-picture and non-frame-motion paths are 4:2:0-only)
    plain_frame = not field_pics and fpfd
    cf = 2 if (plain_frame and rng.integers(0, 3) == 0) else 1
    cfg = EncConfig(
        w, h,
        chroma_format=cf,
        qs=int(rng.choice([2, 4, 8, 16])),
        q_scale_type=bool(rng.integers(0, 2)),
        intra_vlc_format=bool(rng.integers(0, 2)),
        alternate_scan=bool(rng.integers(0, 2)),
        intra_dc_precision=int(rng.integers(0, 3)),
        frame_pred_frame_dct=fpfd,
        progressive=not field_pics and fpfd,
        search=2,
        picture_opts=opts,
    )
    if bool(rng.integers(0, 3) == 0):
        cfg.custom_matrices = True
        cfg.intra_q = (8,) + tuple(
            int(v) for v in rng.integers(8, 64, 63))
        cfg.non_intra_q = tuple(int(v) for v in rng.integers(8, 48, 64))
    return cfg, gop


@pytest.mark.parametrize("seed", range(12))
def test_differential_random_streams(seed):
    rng = np.random.default_rng(100 + seed)
    cfg, gop = _random_cfg(rng)
    frames = synth_frames(cfg.width, cfg.height, len(gop), seed=seed,
                          chroma_format=cfg.chroma_format)
    enc = Mpeg2TestEncoder(cfg)
    es = enc.encode(frames, gop)
    a = decode_es(es)
    b = decode_es_native(es)
    _assert_equal(a, b)


@pytest.mark.parametrize("seed", range(6))
def test_differential_random_422(seed):
    """Random scalar coding params with 4:2:2 chroma (frame motion —
    the test encoder's other modes are 4:2:0-only)."""
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(2, 6))
    gop = "I" + "".join(rng.choice(["P", "P", "B"], n - 1))
    while gop.endswith("B"):
        gop = gop[:-1] + "P"
    cfg = EncConfig(
        64, 48,
        chroma_format=2,
        qs=int(rng.choice([2, 4, 8, 16])),
        q_scale_type=bool(rng.integers(0, 2)),
        intra_vlc_format=bool(rng.integers(0, 2)),
        alternate_scan=bool(rng.integers(0, 2)),
        intra_dc_precision=int(rng.integers(0, 3)),
        search=2,
    )
    if bool(rng.integers(0, 2)):
        cfg.custom_matrices = True
        cfg.intra_q = (8,) + tuple(int(v) for v in rng.integers(8, 64, 63))
        cfg.non_intra_q = tuple(int(v) for v in rng.integers(8, 48, 64))
    frames = synth_frames(64, 48, len(gop), seed=seed, chroma_format=2)
    es = Mpeg2TestEncoder(cfg).encode(frames, gop)
    _assert_equal(decode_es(es), decode_es_native(es))


def test_differential_streaming_api():
    cfg = EncConfig(64, 48, qs=4)
    frames = synth_frames(64, 48, 7)
    es = Mpeg2TestEncoder(cfg).encode(frames, "IBBPBBP")
    ref = Mpeg2RefDecoder()
    nat = NativeMpeg2Decoder()
    for chunk in iter_picture_chunks(es):
        _assert_equal(ref.decode_picture(chunk), nat.decode_picture(chunk))
    _assert_equal(ref.flush(), nat.flush())
    assert nat.errors == ref.errors == 0


def test_corrupted_streams_no_crash():
    cfg = EncConfig(64, 48, qs=4)
    frames = synth_frames(64, 48, 4)
    es = bytearray(Mpeg2TestEncoder(cfg).encode(frames, "IPPP"))
    rng = np.random.default_rng(0)
    for trial in range(20):
        bad = bytearray(es)
        for _ in range(int(rng.integers(1, 8))):
            bad[int(rng.integers(16, len(bad)))] = int(rng.integers(0, 256))
        decode_es_native(bytes(bad))  # must not crash
    for cut in (8, len(es) // 3, len(es) - 3):
        decode_es_native(bytes(es[:cut]))
    # same with the intra-VLC (B15) table + escapes in play, covering
    # the combined run/level LUT's fallback paths
    cfg2 = EncConfig(64, 48, qs=2, intra_vlc_format=True,
                     alternate_scan=True)
    es2 = bytearray(Mpeg2TestEncoder(cfg2).encode(synth_frames(64, 48, 4),
                                                  "IPPP"))
    for trial in range(20):
        bad = bytearray(es2)
        for _ in range(int(rng.integers(1, 8))):
            bad[int(rng.integers(16, len(bad)))] = int(rng.integers(0, 256))
        decode_es_native(bytes(bad))  # must not crash


def test_mid_stream_size_change_no_crash():
    """A (corrupt-TS-style) sequence-size change between GOPs must not
    crash the native engine: refs from the old size meet skipped MBs of
    the new size (the P-skip raw-copy fast path must bow out)."""
    es1 = Mpeg2TestEncoder(EncConfig(48, 32, qs=4)).encode(
        synth_frames(48, 32, 3), "IPP")
    es2 = Mpeg2TestEncoder(EncConfig(96, 64, qs=4)).encode(
        synth_frames(96, 64, 3), "IPP")
    decode_es_native(bytes(es1) + bytes(es2))
    decode_es_native(bytes(es2) + bytes(es1))


def test_truncated_mid_slice_matches_oracle_frame_count():
    cfg = EncConfig(64, 48, qs=4)
    frames = synth_frames(64, 48, 3)
    es = Mpeg2TestEncoder(cfg).encode(frames, "IPP")
    cut = len(es) * 2 // 3
    a = decode_es(es[:cut])
    b = decode_es_native(es[:cut])
    assert len(a) == len(b)


def test_native_speed_sanity():
    """The native engine must beat the oracle by a wide margin (it is the
    production path); generous bound to stay robust on a loaded host."""
    import time

    cfg = EncConfig(128, 96, qs=8, search=1)
    frames = synth_frames(128, 96, 6)
    es = Mpeg2TestEncoder(cfg).encode(frames, "IPPPPP")
    t0 = time.perf_counter()
    decode_es(es)
    t_oracle = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        decode_es_native(es)
    t_native = (time.perf_counter() - t0) / 5
    assert t_native < t_oracle, (t_native, t_oracle)


@pytest.mark.parametrize("gop", ["IPP", "IPBP"])
def test_differential_422(gop):
    frames = synth_frames(64, 48, len(gop), chroma_format=2)
    cfg = EncConfig(64, 48, qs=4, chroma_format=2, progressive=True)
    es = Mpeg2TestEncoder(cfg).encode(frames, gop)
    _assert_equal(decode_es(es), decode_es_native(es))


def test_slice_parallel_decode_bit_identical():
    """AMATSUKAZE_DECODE_THREADS > 1 decodes slices concurrently; output
    must be bit-identical to serial decode (each conformant MPEG-2 slice
    owns its macroblock row; the engine falls back to serial otherwise).
    Thread count is latched per process, so compare across
    subprocesses."""
    import subprocess
    import sys
    import tempfile

    cfg = EncConfig(96, 64, qs=6, progressive=False, search=1)
    frames = synth_frames(96, 64, 6)
    es = Mpeg2TestEncoder(cfg).encode(frames, "IPBPBP")
    with tempfile.NamedTemporaryFile(suffix=".es", delete=False) as f:
        f.write(es)
        path = f.name
    code = (
        "import sys, hashlib\n"
        "sys.path.insert(0, %r)\n"
        "from amatsukaze_tpu.video.native import decode_es_native\n"
        "out = decode_es_native(open(sys.argv[1], 'rb').read())\n"
        "h = hashlib.sha256()\n"
        "for fr in out:\n"
        "    h.update(fr.y.tobytes()); h.update(fr.u.tobytes())\n"
        "    h.update(fr.v.tobytes())\n"
        "print(len(out), h.hexdigest())\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = {}
    for n in ("1", "3"):
        env = dict(os.environ, AMATSUKAZE_DECODE_THREADS=n)
        r = subprocess.run([sys.executable, "-c", code, path],
                           capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr
        res[n] = r.stdout
    os.unlink(path)
    assert res["1"] == res["3"]
    assert res["1"].split()[0] == "6"
