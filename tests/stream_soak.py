"""Randomized end-to-end stream soak.

Composes broadcast pathologies (packet drops, byte flips, scramble
runs, PMT churn, geometry/audio changes, truncation, mismatched stream
types routing payloads into the H.264/HEVC parsers, LATM framing, raw
ARIB caption groups) and runs each through the FULL pipeline.  Any
exception outside the documented clean-failure set is a bug.

This is the harness that found the reserved-SFI ADTS and reserved
frame-rate-code MPEG-2 crashes in round 5 (~10,000 runs total, both
fixed).  Run standalone for long sweeps:

    python tests/stream_soak.py <seconds> <seed0>

test_sample_matrix.py::TestSoakSmoke runs a deterministic slice of it
in the suite.
"""
import os, random, shutil, stat, sys, tempfile, time, traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("AMATSUKAZE_AV_LOG", "fatal")

import ts_gen
from amatsukaze_tpu.pipeline.decoders import NullDecoderFactory
from amatsukaze_tpu.pipeline.settings import Config, Settings
from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
from amatsukaze_tpu.utils.context import AMTContext

FAKE_ENCODER = """#!/bin/bash
out=""
while [ $# -gt 0 ]; do
  case "$1" in
    -o) out="$2"; shift 2;;
    *) shift;;
  esac
done
cat > "$out"
"""

# documented clean failures: scramble abort etc.
OK_ERRORS = ("scrambled", "no video", "no output", "no frames",
             "unsupported", "no decoder", "no audio frames")


def one(seed: int) -> str:
    rng = random.Random(seed)
    kw = {}
    n = rng.choice([30, 60, 90, 150])
    kw["num_frames"] = n
    kw["num_audio"] = rng.choice([1, 1, 2, 3])
    kw["gop_len"] = rng.choice([9, 15, 30])
    kw["pic_pattern"] = rng.choice(
        ["TFF", "BFF", "TFF_RFF,BFF_RFF", "TFF,TFF_RFF,BFF,BFF_RFF"])
    kw["psi_interval"] = rng.choice([5, 20, 50])
    kw["si"] = rng.random() < 0.5
    if rng.random() < 0.4:
        kw["geometry_change"] = (rng.randrange(5, n - 5), 720, 480)
    if rng.random() < 0.4:
        kw["audio_change"] = (rng.randrange(3, n - 3), rng.choice([1, 2, 3]))
    if rng.random() < 0.3:
        kw["pmt_switch"] = rng.randrange(4, n - 4)
    if rng.random() < 0.3:
        kw["extra_services"] = [(0x800, 0x1F00), (0x801, 0x1F10)]
        kw["extra_services_first"] = rng.random() < 0.5
    # parser-fuzz dimensions: mismatched stream types route the synthetic
    # MPEG-2-ish payload into the H.264/H.265 ES parsers; LATM framing
    # over ADTS-ish bytes fuzzes the LATM demux; random caption groups
    # fuzz the ARIB B24 decoder
    if rng.random() < 0.25:
        kw["video_stream_type"] = rng.choice([0x1B, 0x24])
    if rng.random() < 0.2:
        kw["audio_stream_type"] = 0x11
    if rng.random() < 0.25:
        kw["caption_groups"] = [
            (rng.randrange(0, kw["num_frames"]),
             bytes(rng.getrandbits(8) for _ in range(rng.randrange(4, 80))))
            for _ in range(rng.randrange(1, 5))]
    data = bytearray(ts_gen.build_simple_ts(**kw))
    # packet-level damage
    npk = len(data) // 188
    mode = rng.random()
    if mode < 0.35:  # drop a run of packets
        a = rng.randrange(0, max(1, npk - 40))
        cnt = rng.randrange(1, 40)
        del data[a * 188:(a + cnt) * 188]
    elif mode < 0.55:  # flip bytes inside payloads
        for _ in range(rng.randrange(1, 30)):
            p = rng.randrange(0, len(data))
            if p % 188 > 8:
                data[p] ^= 0xFF
    elif mode < 0.7:  # scramble a fraction of video packets
        frac = rng.choice([0.005, 0.05, 0.5])
        for i in range(npk):
            if rng.random() < frac:
                data[i * 188 + 3] |= 0x80
    elif mode < 0.8:  # truncate mid-packet
        del data[len(data) - rng.randrange(1, 300):]

    tmp = tempfile.mkdtemp(prefix="soak_")
    try:
        src = os.path.join(tmp, "s.ts")
        with open(src, "wb") as f:
            f.write(bytes(data))
        enc = os.path.join(tmp, "fake_x264")
        with open(enc, "w") as f:
            f.write(FAKE_ENCODER)
        os.chmod(enc, os.stat(enc).st_mode | stat.S_IEXEC)
        conf = Config()
        conf.src_file_path = src
        conf.out_video_path = os.path.join(tmp, "out")
        conf.out_info_json_path = os.path.join(tmp, "r.json")
        conf.work_dir = tmp
        conf.encoder_path = enc
        conf.filter_mode = rng.choice(["none", "none", "yadif", "kfm_vfr"])
        if "caption_groups" in kw:
            conf.subtitles = True  # route the fuzzed groups into the ARIB decoder
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=NullDecoderFactory())
        pipe.run()
        return "ok"
    except Exception as e:  # noqa: BLE001
        msg = str(e).lower()
        if any(k in msg for k in OK_ERRORS):
            return f"clean-fail: {str(e)[:60]}"
        return "UNEXPECTED: " + traceback.format_exc()[-1500:]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    t_end = time.time() + float(sys.argv[1]) if len(sys.argv) > 1 else \
        time.time() + 1200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    bad = 0
    i = 0
    while time.time() < t_end:
        r = one(seed + i)
        if r.startswith("UNEXPECTED"):
            bad += 1
            print(f"seed {seed+i}: {r}", flush=True)
            if bad >= 5:
                break
        i += 1
        if i % 25 == 0:
            print(f"[{i} runs, {bad} unexpected]", flush=True)
    print(f"DONE: {i} runs, {bad} unexpected failures", flush=True)


if __name__ == "__main__":
    main()
