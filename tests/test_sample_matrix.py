"""Synthetic broadcast sample matrix: end-to-end transcodes of every
stream pathology the reference validates against real recordings
(TestParam.ini scenario files, AmatsukazeUnitTest.cpp:74-86:
VideoFormatChangeTsFile, AudioFormatChangeTsFile, MultiAudioTsFile,
RffFieldPictureTsFile, DropTsFile, VideoDropTsFile, AudioDropTsFile,
PullDownTsFile, OneSegVideoTsFile, DameMojiTsFile).  No real broadcast
samples exist in this environment, so each scenario is CONSTRUCTED with
ts_gen and run through the full pipeline (demux -> reform -> filter ->
fake encoder -> mux + JSON report), asserting the scenario-specific
behavior the reference's tests observe on real files.
"""

import json
import os
import stat

import pytest

import ts_gen
from amatsukaze_tpu.pipeline.decoders import NullDecoderFactory
from amatsukaze_tpu.pipeline.settings import Config, Settings
from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
from amatsukaze_tpu.utils.context import AMTContext

W, H = 96, 64

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


def run_pipeline(tmp_path, ts_bytes, name="src.ts", **conf_kw):
    src = tmp_path / name
    src.write_bytes(ts_bytes)
    enc = tmp_path / "fake_x264"
    enc.write_text(FAKE_ENCODER)
    enc.chmod(enc.stat().st_mode | stat.S_IEXEC)
    conf = Config()
    conf.src_file_path = str(src)
    conf.out_video_path = str(tmp_path / "out")
    conf.out_info_json_path = str(tmp_path / "result.json")
    conf.work_dir = str(tmp_path)
    conf.encoder_path = str(enc)
    conf.no_remove_tmp = True
    for k, v in conf_kw.items():
        setattr(conf, k, v)
    ctx = AMTContext(level="error")
    settings = Settings(ctx, conf)
    pipe = TranscodePipeline(ctx, settings,
                             decoder_factory=NullDecoderFactory())
    report = pipe.run()
    return report, settings, ctx


def frame_count(path):
    return open(path, "rb").read().count(b"FRAME\n")


class TestVideoFormatChange:
    """VideoFormatChangeTsFile: a mid-stream sequence-header change
    (SD -> HD class switch) must split the recording into per-format
    encode files, each at its own geometry."""

    def test_two_formats_two_outputs(self, tmp_path):
        # the switch sits past reform's 3 s section tolerance (real
        # format changes cluster with PMT updates; closer ones merge)
        ts = ts_gen.build_simple_ts(num_frames=300, width=W, height=H,
                                    geometry_change=(150, W * 2, H * 2))
        report, settings, _ = run_pipeline(tmp_path, ts, split_sub=True)
        outs = report["outfiles"]
        assert len(outs) == 2, outs
        datas = [open(o["path"], "rb").read() for o in outs]
        heads = b"|".join(d[:64] for d in datas)
        assert f"W{W} H{H}".encode() in heads
        assert f"W{W * 2} H{H * 2}".encode() in heads
        # both segments carry a meaningful share of the frames
        for d in datas:
            assert d.count(b"FRAME\n") >= 140

    def test_geometry_always_splits_video_files(self, tmp_path):
        # a geometry change always starts a new intermediate video file
        # and output, with or without --splitsub (splitsub only governs
        # same-geometry format sections)
        ts = ts_gen.build_simple_ts(num_frames=360, width=W, height=H,
                                    geometry_change=(150, W * 2, H * 2))
        report, _, _ = run_pipeline(tmp_path, ts)
        assert len(report["outfiles"]) == 2


class TestAudioFormatChange:
    """AudioFormatChangeTsFile: an ADTS channel-configuration change
    (stereo -> mono) mid-recording must start a new audio format
    section without dropping the video."""

    def test_channel_change_sections(self, tmp_path):
        from amatsukaze_tpu.pipeline.splitter import AMTSplitter

        ts = ts_gen.build_simple_ts(num_frames=300, width=W, height=H,
                                    audio_change=(150, 1))
        report, settings, ctx = run_pipeline(tmp_path, ts)
        outs = report["outfiles"]
        assert sum(frame_count(o["path"]) for o in outs) >= 290
        # reform records both audio formats as separate sections
        reform = AMTSplitter(ctx, settings).split()
        reform.prepare(False, False)
        chans = [f.audio_format[0].channels for f in reform.formats
                 if f.audio_format]
        assert len(set(chans)) >= 2, chans
        # each audio format becomes its own output file (out, out-1)
        assert len(report["outfiles"]) == 2

    def test_splitsub_keeps_sub_sections_separate(self, tmp_path):
        # reference splitSub semantics (StreamReform.hpp:794-821): main
        # format sections merge into one file; every NON-main section
        # stays its own file.  Without splitSub, files map 1:1 to
        # formats (same-format sections merge).  An A-B-A-B cadence
        # therefore gives 2 files plain, 3 with --splitsub.
        ts = ts_gen.build_simple_ts(
            num_frames=600, width=W, height=H,
            audio_change=[(150, 1), (300, 2), (450, 1)])
        report, _, _ = run_pipeline(tmp_path, ts)
        assert len(report["outfiles"]) == 2
        report, _, _ = run_pipeline(tmp_path, ts, split_sub=True)
        assert len(report["outfiles"]) == 3
        total = sum(frame_count(o["path"]) for o in report["outfiles"])
        assert total >= 590


class TestMultiAudio:
    """MultiAudioTsFile: two audio PIDs ride the program; both must be
    demuxed and carried to the output mux."""

    def test_two_tracks(self, tmp_path):
        ts = ts_gen.build_simple_ts(num_frames=90, width=W, height=H,
                                    num_audio=2)
        report, settings, _ = run_pipeline(tmp_path, ts)
        assert len(report["outfiles"]) == 1
        # two intermediate audio streams were produced for the mux
        adirs = [p for p in os.listdir(tmp_path)
                 if p.startswith("amt") and os.path.isdir(tmp_path / p)]
        assert adirs
        exts = []
        for d in adirs:
            exts += [f for f in os.listdir(tmp_path / d)
                     if f.endswith(".aac")]
        assert len({e.split("-")[-1] for e in exts}) >= 2 or len(exts) >= 2


class TestRffFieldPictures:
    """RffFieldPictureTsFile: field-picture pairs (two coded pictures
    weaving one frame) mixed with RFF frame pictures must demux to the
    right frame count and RFF-expanded duration."""

    def test_field_pairs_and_rff(self, tmp_path):
        ts = ts_gen.build_simple_ts(
            num_frames=90, width=W, height=H,
            pic_pattern="FIELDS_TFF,TFF_RFF,FIELDS_BFF,BFF,TFF")
        report, settings, _ = run_pipeline(tmp_path, ts)
        outs = report["outfiles"]
        assert len(outs) == 1
        # every field pair assembled into exactly one frame
        assert frame_count(outs[0]["path"]) >= 85
        assert report["error"].get("unknown-pts", 0) == 0


class TestPullDown:
    """PullDownTsFile: 2-3 pulldown (RFF cadence) expands the output
    duration past the coded-frame count."""

    def test_rff_expands_frames(self, tmp_path):
        ts = ts_gen.build_simple_ts(
            num_frames=100, width=W, height=H,
            pic_pattern="TFF_RFF,BFF,BFF_RFF,TFF")
        report, _, _ = run_pipeline(tmp_path, ts)
        # half the frames carry RFF -> the filter-source sequence is
        # RFF-expanded ~25% past the coded frame count (reference RFF
        # handling in StreamReform's filter source assembly)
        outs = report["outfiles"]
        assert sum(frame_count(o["path"]) for o in outs) >= 115


class TestDrops:
    """DropTsFile / VideoDropTsFile / AudioDropTsFile: continuity-counter
    gaps must be detected (error counters) and survived (the transcode
    completes with the remaining frames)."""

    @staticmethod
    def _drop_packets(ts: bytes, pid: int, start: int, count: int) -> bytes:
        out = bytearray()
        seen = 0
        for off in range(0, len(ts), 188):
            pkt = ts[off:off + 188]
            p = ((pkt[1] & 0x1F) << 8) | pkt[2]
            if p == pid:
                seen += 1
                if start <= seen < start + count:
                    continue
            out += pkt
        return bytes(out)

    def test_video_drop(self, tmp_path):
        ts = ts_gen.build_simple_ts(num_frames=90, width=W, height=H)
        ts = self._drop_packets(ts, 0x0100, 40, 12)
        report, _, ctx = run_pipeline(tmp_path, ts)
        assert report["outfiles"]
        assert frame_count(report["outfiles"][0]["path"]) >= 70
        assert sum(report["error"].values()) > 0  # drop was counted

    def test_audio_drop(self, tmp_path):
        ts = ts_gen.build_simple_ts(num_frames=90, width=W, height=H)
        ts = self._drop_packets(ts, 0x0110, 30, 8)
        report, _, _ = run_pipeline(tmp_path, ts)
        assert report["outfiles"]
        # video unaffected by the audio gap
        assert frame_count(report["outfiles"][0]["path"]) >= 85

    def test_broad_drop(self, tmp_path):
        # a transmission gap hits every PID (drop a whole byte range)
        ts = ts_gen.build_simple_ts(num_frames=90, width=W, height=H)
        cut = (len(ts) // 188 // 2) * 188
        ts = ts[:cut] + ts[cut + 188 * 30:]
        report, _, _ = run_pipeline(tmp_path, ts)
        assert report["outfiles"]
        assert frame_count(report["outfiles"][0]["path"]) >= 50


class TestOneSeg:
    """OneSegVideoTsFile: the low-res partial-reception service rides
    the same multiplex; selecting its service id must pick the one-seg
    elementary streams, not the fullseg ones."""

    def test_select_oneseg_service(self, tmp_path):
        # fullseg service 0x0400 carries the real streams; decoy 0x0580
        # (one-seg id range) has a PMT but no traffic -> selecting the
        # FULLSEG id must work even with the decoy listed first
        ts = ts_gen.build_simple_ts(
            num_frames=90, width=W, height=H, service_id=0x0400,
            extra_services=[(0x0580, 0x1FC8)], extra_services_first=True)
        report, _, _ = run_pipeline(tmp_path, ts, service_id=0x0400)
        assert report["outfiles"]
        assert frame_count(report["outfiles"][0]["path"]) >= 85


class TestDameMoji:
    """DameMojiTsFile: source names with characters that broke SJIS
    tooling (and shells) must flow through temp naming, encoder args
    and the JSON report unmangled."""

    def test_tricky_filename(self, tmp_path):
        name = "ソ十表 テスト 'quote' (50%)&.ts"
        ts = ts_gen.build_simple_ts(num_frames=60, width=W, height=H)
        report, _, _ = run_pipeline(tmp_path, ts, name=name)
        assert report["outfiles"]
        assert os.path.basename(report["srcpath"]) == name
        loaded = json.load(open(tmp_path / "result.json"))
        assert os.path.basename(loaded["srcpath"]) == name


class TestPartialScramble:
    """Partially-scrambled recordings (ref the scramble gate in
    transcodeMain, TranscodeManager.hpp:501-508: >1% of packets logs an
    error, >30% aborts the transcode).  Real pay-TV recordings with an
    expired card produce exactly this pathology."""

    @staticmethod
    def _scramble(ts: bytes, frac: float) -> bytes:
        """Set transport_scrambling_control + garble the payload on the
        first `frac` fraction (of ALL packets) worth of ES packets
        (video + audio, like a real undecryptable program)."""
        data = bytearray(ts)
        npkt = len(data) // 188
        want = int(npkt * frac)
        done = 0
        for i in range(npkt):
            off = i * 188
            pid = ((data[off + 1] & 0x1F) << 8) | data[off + 2]
            if pid not in (ts_gen.VIDEO_PID, ts_gen.AUDIO_PID):
                continue
            if done >= want:
                break
            data[off + 3] |= 0x80  # scrambled (odd key)
            for k in range(8, 188):
                data[off + k] ^= 0x5A
            done += 1
        assert done == want, (done, want)
        return bytes(data)

    def test_below_one_percent_ok(self, tmp_path):
        ts = ts_gen.build_simple_ts(num_frames=90, width=W, height=H)
        report, _, _ = run_pipeline(tmp_path, self._scramble(ts, 0.005))
        assert report["outfiles"]

    def test_mid_ratio_completes_with_error_log(self, tmp_path):
        ts = ts_gen.build_simple_ts(num_frames=90, width=W, height=H)
        report, _, ctx = run_pipeline(tmp_path, self._scramble(ts, 0.05))
        assert report["outfiles"]

    def test_above_thirty_percent_aborts(self, tmp_path):
        from amatsukaze_tpu.utils.context import FormatError

        ts = ts_gen.build_simple_ts(num_frames=90, width=W, height=H)
        with pytest.raises(FormatError, match="scrambled"):
            run_pipeline(tmp_path, self._scramble(ts, 0.40))


class TestPmtChurnMidGop:
    """PMT version bump in the middle of a GOP that MOVES the audio
    elementary stream to a new PID: the selector must follow the updated
    table mid-stream (ref Mpeg2TsParser PMT update handling) and the
    audio timeline must continue across the re-wire."""

    def test_audio_pid_moves(self, tmp_path):
        ts = ts_gen.build_simple_ts(num_frames=90, width=W, height=H,
                                    pmt_switch=47)  # mid-GOP (gop_len 15)
        report, settings, _ = run_pipeline(tmp_path, ts)
        assert report["outfiles"]
        assert frame_count(report["outfiles"][0]["path"]) >= 85
        # the audio intermediate spans both PIDs' eras: well over half
        # the recording's AAC frames survive the re-wire
        adirs = [p for p in os.listdir(tmp_path)
                 if p.startswith("amt") and os.path.isdir(tmp_path / p)]
        total = 0
        for d in adirs:
            for f in os.listdir(tmp_path / d):
                if f.endswith(".aac"):
                    total += os.path.getsize(tmp_path / d / f)
        # 90 frames @29.97 = ~3 s = ~140 AAC frames; each synthetic ADTS
        # frame is ~207 bytes
        assert total > 100 * 200, total


class TestSoakSmoke:
    """A deterministic slice of the randomized stream soak
    (tests/stream_soak.py — the harness behind round 5's ~10,000-run
    sweeps): every seed must end in 'ok' or a documented clean
    failure, never an unexpected exception."""

    def test_soak_seeds(self):
        import stream_soak

        bad = [(s, r) for s in range(42, 42 + 40)
               for r in [stream_soak.one(s)]
               if r.startswith("UNEXPECTED")]
        assert not bad, bad[:2]


class TestPtsWrapMidStream:
    """The 33-bit PTS counter wraps mid-recording (~26.5 h of MPEG
    clock, but any recording straddling the counter hits it): the full
    pipeline must reform a continuous timeline across the wrap — one
    output with every frame, a sane duration, and continuous audio —
    exactly like the reference's makeModifiedPTS unwrap
    (StreamReform.hpp:1053-1083)."""

    def test_unwraps_to_one_continuous_output(self, tmp_path):
        n = 90
        dur = 3003  # 29.97 fps in 90 kHz ticks
        # wrap lands mid-stream: start so frame n/2 crosses 2^33
        first = (1 << 33) - (n // 2) * dur
        ts = ts_gen.build_simple_ts(num_frames=n, first_pts=first)
        report, settings, ctx = run_pipeline(tmp_path, ts)
        assert len(report["outfiles"]) == 1
        out = report["outfiles"][0]
        assert frame_count(out["path"]) == n - 1  # open-GOP head trim
        # duration reflects ~3 s of content, not a 26.5-hour glitch
        assert 1.0 < report["srcduration"] < 10.0
        # audio stayed attached across the wrap with no mass drop-outs
        adiff = report["audiodiff"]
        assert adiff["totalsrcframes"] > 0
        assert float(adiff["notincludedper"]) < 5.0
