"""Native TS demux engine vs the pure-Python layer: bit-exact equivalence."""

import numpy as np
import pytest

from amatsukaze_tpu.ts.native import (
    EVENT_PAUSE,
    EVENT_PCR,
    EVENT_PES,
    EVENT_RAW,
    PID_PAUSE,
    PID_PES,
    PID_RAW,
    NativeTsEngine,
    load_native,
)
from amatsukaze_tpu.ts.packet import TsPacketParser, TsPacket
from amatsukaze_tpu.ts.pes import PesParser

import ts_gen

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="native engine unavailable")


def python_reference(data: bytes, pes_pids, chunk=65536):
    """Run the pure-Python packet scan + PES assembly, collecting the same
    observables as the native engine."""
    out = {"pes": [], "raw": [], "pcr": [], "count": 0, "scramble": 0}
    parsers = {}
    for pid in pes_pids:
        p = PesParser()
        p.on_pes_packet = (
            lambda clock, pkt, _pid=pid: out["pes"].append(
                (_pid, bytes(pkt.data)))
        )
        parsers[pid] = p

    class Scanner(TsPacketParser):
        def on_ts_packets(self, batch):
            for i in range(batch.count):
                pkt = batch.packet(i)
                pkt.parse()
                if not pkt.check():
                    out["count"] += 1
                    continue
                out["count"] += 1
                if pkt.transport_scrambling_control:
                    out["scramble"] += 1
                if pkt.pid in parsers:
                    parsers[pkt.pid].on_ts_packet(0, pkt)

    sc = Scanner()
    for off in range(0, len(data), chunk):
        sc.input_ts(data[off:off + chunk])
    sc.flush()
    for pid, p in parsers.items():
        p.on_pes_packet = (
            lambda clock, pkt, _pid=pid: out["pes"].append(
                (_pid, bytes(pkt.data)))
        )
        p.flush()
    return out


def native_run(data: bytes, pes_pids, chunk=65536, pcr_pid=-1,
               raw_pids=(), pause_pids=()):
    eng = NativeTsEngine()
    for pid in pes_pids:
        eng.set_pid_mode(pid, PID_PES)
    for pid in raw_pids:
        eng.set_pid_mode(pid, PID_RAW)
    for pid in pause_pids:
        eng.set_pid_mode(pid, PID_PAUSE)
    eng.set_pcr_pid(pcr_pid)
    out = {"pes": [], "raw": [], "pcr": [], "pause": []}

    def drain():
        meta, payload = eng.take_events()
        for t, pid, off, ln, idx, extra in meta:
            blob = payload[off:off + ln] if off >= 0 else b""
            if t == EVENT_PES:
                out["pes"].append((int(pid), blob))
            elif t == EVENT_RAW:
                out["raw"].append((int(pid), blob))
            elif t == EVENT_PCR:
                # ln carries flags: bit0 = discontinuity, bit1 = has_pcr
                out["pcr"].append((int(idx), int(ln), int(extra)))
            elif t == EVENT_PAUSE:
                out["pause"].append((int(pid), blob))

    for off in range(0, len(data), chunk):
        done = eng.input(data[off:off + chunk])
        while not done:
            drain()
            eng.skip_packet()
            done = eng.input()
    while not eng.flush():
        drain()
        eng.skip_packet()
    for pid in pes_pids:
        eng.flush_pes(pid)
    drain()
    out["count"] = eng.counter(0)
    out["scramble"] = eng.counter(1)
    return out


VIDEO_PID = ts_gen.VIDEO_PID if hasattr(ts_gen, "VIDEO_PID") else 0x0100


@pytest.fixture(scope="module")
def sample_ts():
    return ts_gen.build_simple_ts(num_frames=60)


def _pids_of(data):
    arr = np.frombuffer(data, np.uint8)
    pk = arr.reshape(-1, 188)
    return ((pk[:, 1].astype(int) & 0x1F) << 8) | pk[:, 2]


class TestNativeEquivalence:
    def test_pes_units_match(self, sample_ts):
        pids = sorted(set(_pids_of(sample_ts).tolist()) - {0, 0x1FFF})
        ref = python_reference(sample_ts, pids)
        nat = native_run(sample_ts, pids)
        assert nat["count"] == ref["count"]
        assert nat["scramble"] == ref["scramble"]
        assert len(nat["pes"]) == len(ref["pes"])
        for (p1, d1), (p2, d2) in zip(nat["pes"], ref["pes"]):
            assert p1 == p2 and d1 == d2

    def test_chunk_size_independent(self, sample_ts):
        pids = sorted(set(_pids_of(sample_ts).tolist()) - {0, 0x1FFF})
        a = native_run(sample_ts, pids, chunk=188 * 3 + 17)
        b = native_run(sample_ts, pids, chunk=1 << 20)
        assert a["pes"] == b["pes"]
        assert a["count"] == b["count"]

    def test_corrupt_stream(self, sample_ts):
        rng = np.random.default_rng(5)
        data = bytearray(sample_ts)
        # kill some sync bytes and splice garbage mid-stream
        for pos in rng.integers(0, len(data) // 188, 20) * 188:
            data[pos] = 0x00
        data[50 * 188:50 * 188] = b"\xde\xad\xbe\xef" * 33
        data = bytes(data)
        pids = sorted(set(_pids_of(sample_ts).tolist()) - {0, 0x1FFF})
        ref = python_reference(data, pids)
        nat = native_run(data, pids)
        assert nat["count"] == ref["count"]
        assert len(nat["pes"]) == len(ref["pes"])
        for (p1, d1), (p2, d2) in zip(nat["pes"], ref["pes"]):
            assert p1 == p2 and d1 == d2

    def test_raw_and_pause_modes(self, sample_ts):
        pids = _pids_of(sample_ts)
        pat_count = int((pids == 0).sum())
        nat = native_run(sample_ts, [], raw_pids=[0])
        assert len(nat["raw"]) == pat_count
        assert all(p == 0 and len(b) == 188 for p, b in nat["raw"])
        nat2 = native_run(sample_ts, [], pause_pids=[0])
        assert len(nat2["pause"]) == pat_count
        assert nat2["count"] == nat["count"]

    def test_pcr_events(self, sample_ts):
        # find a pid carrying PCR by asking the Python layer
        from amatsukaze_tpu.ts.packet import TsPacket

        arr = np.frombuffer(sample_ts, np.uint8).reshape(-1, 188)
        pcr_pid = -1
        expected = []
        for row in arr:
            pkt = TsPacket(row.tobytes())
            pkt.parse()
            pcr = pkt.get_pcr()
            if pcr is not None:
                pcr_pid = pkt.pid
                expected.append(pcr)
        assert pcr_pid >= 0
        nat = native_run(sample_ts, [], pcr_pid=pcr_pid)
        got = [v for _, flags, v in nat["pcr"] if flags & 2]
        assert got == expected


class TestSplitterEngineEquivalence:
    """The engine-backed splitter must produce identical demux results to
    the pure-Python path (AMATSUKAZE_NO_NATIVE=1)."""

    def _run(self, ts, chunk, disable_native, monkeypatch):
        from amatsukaze_tpu.ts.splitter import TsSplitter
        from amatsukaze_tpu.utils.context import AMTContext

        if disable_native:
            monkeypatch.setenv("AMATSUKAZE_NO_NATIVE", "1")
        else:
            monkeypatch.delenv("AMATSUKAZE_NO_NATIVE", raising=False)

        class Sink(TsSplitter):
            def __init__(self, ctx):
                super().__init__(ctx)
                self.video = []
                self.audio = []
                self.formats = []
                self.times = []

            def on_video_pes_packet(self, clock, frames, packet):
                self.video.extend(
                    (clock, f.pts, f.dts, f.pic.name) for f in frames)

            def on_video_format_changed(self, fmt):
                self.formats.append(
                    (fmt.width, fmt.height, fmt.frame_rate_num))

            def on_audio_pes_packet(self, audio_idx, clock, frames, packet):
                self.audio.extend(
                    (audio_idx, clock, f.pts, len(f.coded_data))
                    for f in frames)

            def on_audio_format_changed(self, audio_idx, fmt):
                pass

            def on_time(self, clock, jst):
                self.times.append((clock, str(jst)))

        ctx = AMTContext(level="error")
        sp = Sink(ctx)
        for off in range(0, len(ts), chunk):
            sp.input_ts_data(ts[off:off + chunk])
        sp.flush()
        return sp

    # 10**9 = the whole file in ONE input_ts_data call: the engine must
    # still take over MID-chunk right after PCR acquisition (the staged
    # _pending_engine_tail handoff), not wait for a chunk boundary that
    # never comes
    @pytest.mark.parametrize("chunk", [997, 16384, 10**9])
    def test_equivalence(self, sample_ts, chunk, monkeypatch):
        py = self._run(sample_ts, chunk, True, monkeypatch)
        nat = self._run(sample_ts, chunk, False, monkeypatch)
        assert nat._engine is not None, "engine did not activate"
        assert py._engine is None
        assert nat.video == py.video
        assert nat.audio == py.audio
        assert nat.formats == py.formats
        assert nat.times == py.times
        assert nat.num_total_packets == py.num_total_packets
        assert nat.num_scramble_packets == py.num_scramble_packets

    def test_equivalence_corrupt(self, sample_ts, monkeypatch):
        rng = np.random.default_rng(3)
        data = bytearray(sample_ts)
        for pos in rng.integers(10, len(data) // 188, 12) * 188:
            data[pos] = 0x11  # break sync mid-stream
        data = bytes(data)
        py = self._run(data, 4096, True, monkeypatch)
        nat = self._run(data, 4096, False, monkeypatch)
        assert nat.video == py.video
        assert nat.audio == py.audio
        assert nat.num_total_packets == py.num_total_packets
