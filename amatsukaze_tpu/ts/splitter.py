"""TS demux driver: 3-phase init with rewind-and-replay, PCR wall clock,
ES parser wiring, scramble counting.

Parity: TsSplitter / TsPacketBuffer / TsSystemClock and the
VideoFrameParser/AudioFrameParser wrappers in the reference
(Amatsukaze/TsSplitter.hpp): PMT_WAITING -> PCR_WAITING -> INIT_FINISHED,
with the buffered stream replayed from the beginning once the PCR bitrate is
known (TsSplitter.hpp:457-499), PCR -> wall-clock interpolation (:320-400),
and per-ES parser fan-out (:40-250).

TPU-era twist: packets arrive as vectorized batches (see packet.PacketBatch);
only PIDs with live handlers are touched by the Python loop.
"""

from __future__ import annotations

import numpy as np

from ..types import AudioFormat, VideoFormat, VideoStreamFormat
from .adts import AdtsParser
from .packet import TS_PACKET_LENGTH, PacketBatch, TsPacket, TsPacketParser
from .pes import PesParser, PESPacket
from .selector import PMTESInfo, TsPacketSelector, TsPacketSelectorHandler
from .video_h264 import H264VideoParser
from .video_mpeg2 import Mpeg2VideoParser

MAX_BUFFERED_PACKETS = 50 * 1024  # 9.6 MB (ref TsSplitter.hpp:418)

# init phases (ref TsSplitter.hpp:460-464)
PMT_WAITING = 0
PCR_WAITING = 1
INIT_FINISHED = 2


def _cdiv_trunc(a: int, b: int) -> int:
    """C-style integer division (truncate toward zero)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


class TsSystemClock:
    """PCR-anchored wall clock, 27 MHz (ref TsSplitter.hpp:320-400)."""

    def __init__(self):
        self.pcr_pid = -1
        self.num_pcr_received = 0
        self.num_total_packets = 0
        # two PCR anchors: (clock, packet_index)
        self.pcr_info = [[0, -1], [0, -1]]

    def set_pcr_pid(self, pid: int) -> None:
        self.pcr_pid = pid

    def pcr_received(self) -> bool:
        return self.num_pcr_received >= 2

    def get_clock(self, relative: int = 0) -> int:
        if not self.pcr_received():
            return -1
        index = self.num_total_packets + relative - 1
        (c0, i0), (c1, i1) = self.pcr_info
        return _cdiv_trunc((c1 - c0) * (index - i1), (i1 - i0)) + c1

    def back_ts(self) -> None:
        self.num_total_packets = 0

    def input_ts_packet(self, packet: TsPacket) -> None:
        if packet.pid == self.pcr_pid and packet.has_adaptation_field:
            af_data = packet.adaptation_field()
            if len(af_data) >= 2:
                from .packet import AdaptationField

                af = AdaptationField(af_data)
                if af.parse():
                    if af.discontinuity_indicator:
                        self.num_pcr_received = 0
                    if self.pcr_info[1][1] < self.num_total_packets:
                        self.pcr_info[0], self.pcr_info[1] = (
                            self.pcr_info[1],
                            self.pcr_info[0],
                        )
                        if af.pcr_flag:
                            self.pcr_info[1][0] = af.pcr
                            self.pcr_info[1][1] = self.num_total_packets
                            self.num_pcr_received += 1
        self.num_total_packets += 1

    def current_bitrate(self) -> float:
        (c0, i0), (c1, i1) = self.pcr_info
        return (i1 - i0) * TS_PACKET_LENGTH * 8 / (c1 - c0) * 27_000_000


class VideoFrameParser(PesParser):
    """PES -> coded frames via the MPEG2/H264 ES parsers
    (ref TsSplitter.hpp:28-112)."""

    def __init__(self, ctx, splitter: "TsSplitter"):
        super().__init__()
        self.ctx = ctx
        self.splitter = splitter
        self._stream_format = VideoStreamFormat.MPEG2
        self._video_format = VideoFormat()
        self._mpeg2 = Mpeg2VideoParser(ctx)
        self._h264 = H264VideoParser(ctx)
        self._parser = self._mpeg2

    def set_stream_format(self, fmt: VideoStreamFormat) -> None:
        if self._stream_format != fmt:
            self._parser = self._mpeg2 if fmt == VideoStreamFormat.MPEG2 else self._h264
            self.reset()
            self._stream_format = fmt

    def get_stream_format(self) -> VideoStreamFormat:
        return self._stream_format

    def reset(self) -> None:
        self._video_format = VideoFormat()
        self._parser.reset()

    def on_pes_packet(self, clock: int, packet: PESPacket) -> None:
        if not packet.has_pts:
            self.ctx.error("video PES packet without PTS")
            return
        pts = packet.pts if packet.has_pts else -1
        dts = packet.dts if packet.has_dts else pts
        frames = self._parser.input_frame(packet.payload(), pts, dts)
        if frames is None:
            self.ctx.error("failed to get frame info, PTS=%d", pts)
            return
        if frames:
            first = frames[0]
            if first.format.is_empty():
                return
            if first.format != self._video_format:
                self._video_format = first.format
                self.splitter.on_video_format_changed(first.format)
            if clock == -1:
                self.ctx.error("video PES packet without clock info")
                return
            self.splitter.on_video_pes_packet(clock, frames, packet)


class AudioFrameParser(PesParser):
    """PES -> ADTS frames (ref TsSplitter.hpp:114-157)."""

    def __init__(self, ctx, splitter: "TsSplitter", audio_idx: int,
                 decoder_factory=None):
        super().__init__()
        self.ctx = ctx
        self.splitter = splitter
        self.audio_idx = audio_idx
        dec = decoder_factory() if decoder_factory else None
        self._adts = AdtsParser(ctx, dec)
        self._format = AudioFormat()

    def on_pes_packet(self, clock: int, packet: PESPacket) -> None:
        if clock == -1:
            self.ctx.error("audio PES packet without clock info")
            return
        pts = packet.pts if packet.has_pts else -1
        frames = self._adts.input_frame(packet.payload(), pts)
        if frames:
            first = frames[0]
            if first.format != self._format:
                self._format = first.format
                self.splitter.on_audio_format_changed(self.audio_idx, first.format)
            self.splitter.on_audio_pes_packet(self.audio_idx, clock, frames, packet)


class CaptionPesParser(PesParser):
    """PES -> caption items with PTS sanity correction
    (ref TsSplitter.hpp:160-250). The ARIB decode is pluggable."""

    def __init__(self, ctx, splitter: "TsSplitter", caption_decoder=None):
        super().__init__()
        self.ctx = ctx
        self.splitter = splitter
        self.decoder = caption_decoder

    def on_pes_packet(self, clock: int, packet: PESPacket) -> None:
        if self.decoder is None:
            return
        pts = packet.pts if packet.has_pts else -1
        sys_clock = clock // 300
        # receivers must get >=0.5 s of lead; observed streams use ~0.75-0.80 s.
        # outside [0.5, 1.5] s assume broken PTS and rebase (ref :174-186)
        td = pts - sys_clock
        if td < 0.5 * 90000 or td > 1.5 * 90000:
            pts = sys_clock + int(0.8 * 90000)
        captions = self.decoder.decode(pts, bytes(packet.payload()))
        if captions:
            self.splitter.on_caption_pes_packet(clock, captions, packet)


class _SplitterPacketParser(TsPacketParser):
    def __init__(self, ctx, sink):
        super().__init__(ctx)
        self.sink = sink  # callable(batch)

    def on_ts_packets(self, batch: PacketBatch) -> None:
        self.sink(batch)


class TsSplitter(TsPacketSelectorHandler):
    """Abstract demux driver; subclasses get the on_* callbacks
    (ref TsSplitter.hpp:402-682)."""

    def __init__(self, ctx, enable_video=True, enable_audio=True,
                 enable_caption=True, audio_decoder_factory=None,
                 caption_decoder=None):
        self.ctx = ctx
        self.enable_video = enable_video
        self.enable_audio = enable_audio
        self.enable_caption = enable_caption
        self._audio_decoder_factory = audio_decoder_factory

        self.init_phase = PMT_WAITING
        self.prefered_service_id = -1
        self.selected_service_id = -1
        self.num_total_packets = 0
        self.num_scramble_packets = 0

        self.packet_parser = _SplitterPacketParser(ctx, self._on_live_batch)
        self._store = bytearray()  # rewind buffer (ref TsPacketBuffer)
        self._buffering = True
        self._live_batch: PacketBatch | None = None
        self._live_synced = 0  # packets of the live batch already in the store
        self.system_clock = TsSystemClock()
        self.selector = TsPacketSelector(ctx)
        self.selector.set_handler(self)

        self.video_parser = VideoFrameParser(ctx, self)
        self.audio_parsers: list[AudioFrameParser] = []
        self.caption_parser = CaptionPesParser(ctx, self, caption_decoder)

    # -- public -----------------------------------------------------------------
    def reset(self) -> None:
        self.init_phase = PMT_WAITING
        self.prefered_service_id = -1
        self.selected_service_id = -1
        self._buffering = True
        self._store.clear()

    def set_service_id(self, sid: int) -> None:
        self.prefered_service_id = sid

    def get_actual_service_id(self) -> int:
        return self.selected_service_id

    def input_ts_data(self, data: bytes) -> None:
        self.packet_parser.input_ts(data)

    def flush(self) -> None:
        self.packet_parser.flush()

    # -- batch routing ------------------------------------------------------------
    #
    # The reference buffers each packet *before* handing it to the phase
    # handler, so a rewind-and-replay triggered mid-stream covers exactly the
    # packets seen so far (TsSplitter.hpp:457-499). We keep that invariant
    # while processing vectorized batches by syncing the live batch into the
    # store lazily, just before each packet that could trigger a replay.

    def _on_live_batch(self, batch: PacketBatch) -> None:
        self._live_batch = batch
        self._live_synced = 0
        try:
            pids = batch.pids
            i = 0
            n = batch.count
            while i < n:
                if self.init_phase == PCR_WAITING:
                    i = self._process_pcr_waiting(batch, pids, i, live=True)
                else:
                    i = self._process_selected(batch, pids, i, live=True)
            self._sync_store(n)
        finally:
            self._live_batch = None

    def _sync_store(self, upto_packets: int) -> None:
        """Append live-batch packets [synced, upto) to the rewind store."""
        if not self._buffering or self._live_batch is None:
            return
        if upto_packets > self._live_synced:
            self._store.extend(
                self._live_batch.data[
                    self._live_synced * TS_PACKET_LENGTH : upto_packets * TS_PACKET_LENGTH
                ]
            )
            self._live_synced = upto_packets
            excess = len(self._store) // TS_PACKET_LENGTH - MAX_BUFFERED_PACKETS
            if excess > 0:
                del self._store[: excess * TS_PACKET_LENGTH]

    def _process_pcr_waiting(self, batch, pids, start: int, live: bool) -> int:
        """Only PCR packets matter; skip everything else vectorized."""
        clk = self.system_clock
        idxs = np.flatnonzero(pids[start:] == clk.pcr_pid) + start
        base = clk.num_total_packets - start
        for i in idxs:
            i = int(i)
            if live:
                self._sync_store(i + 1)
            clk.num_total_packets = base + i
            pkt = batch.packet(i)
            if pkt.parse() and pkt.check():
                clk.input_ts_packet(pkt)
            else:
                clk.num_total_packets += 1
            if clk.pcr_received():
                self._finish_init()
                # _finish_init replayed the store; the clock count is now the
                # global packet index just past the current packet
                return i + 1
        clk.num_total_packets = base + batch.count
        return batch.count

    def _process_selected(self, batch, pids, start: int, live: bool) -> int:
        clk = self.system_clock
        sel = self.selector
        n = batch.count
        i = start
        while i < n:
            base = clk.num_total_packets - i
            version = sel.table_version
            interesting = set(sel.active_pids())
            if clk.pcr_pid != -1:
                interesting.add(clk.pcr_pid)
            mask = np.isin(pids[i:], np.fromiter(interesting, dtype=pids.dtype,
                                                 count=len(interesting)))
            idxs = np.flatnonzero(mask) + i
            done_through = n
            for j in idxs:
                j = int(j)
                pkt = batch.packet(j)
                if not (pkt.parse() and pkt.check()):
                    continue
                if live:
                    self._sync_store(j + 1)
                clk.num_total_packets = base + j
                clk.input_ts_packet(pkt)
                packet_clock = clk.get_clock(0)
                sel.input_ts_packet(packet_clock, pkt)
                if self.init_phase == PCR_WAITING:
                    # PMT just arrived: on_pmt_updated replayed the store
                    # through PCR detection; continue after this packet
                    return j + 1
                if sel.table_version != version:
                    done_through = j + 1
                    break  # PID table changed: recompute the prefilter
            clk.num_total_packets = base + done_through
            i = done_through
        return n

    # -- init phase machinery -----------------------------------------------------
    def on_pmt_updated(self, pcr_pid: int) -> None:
        if self.init_phase == PMT_WAITING:
            self.init_phase = PCR_WAITING
            self.system_clock.set_pcr_pid(pcr_pid)
            self.selector.reset_parser()
            self.system_clock.back_ts()
            self._replay(PCR_WAITING)

    def _finish_init(self) -> None:
        self.ctx.debug("PCR acquired; re-reading TS from the start")
        self.init_phase = INIT_FINISHED
        self.selector.reset_parser()
        self.system_clock.back_ts()
        start_clock = self.system_clock.get_clock(0)
        self.ctx.info("start clock: %d", start_clock)
        self.selector.set_start_clock(start_clock)
        self._replay(INIT_FINISHED)
        self._buffering = False
        self._store.clear()

    def _replay(self, phase: int) -> None:
        """Re-feed the rewind store through the current phase's path."""
        if not self._store:
            return
        batch = PacketBatch(memoryview(bytes(self._store)))
        pids = batch.pids
        i = 0
        while i < batch.count and self.init_phase == phase:
            if phase == PCR_WAITING:
                i = self._process_pcr_waiting(batch, pids, i, live=False)
            else:
                i = self._process_selected(batch, pids, i, live=False)

    # -- selector callbacks ---------------------------------------------------------
    def on_pid_select(self, tsid: int, sids: list[int]) -> int:
        self.ctx.info("[PAT update]")
        for i, sid in enumerate(sids):
            if self.prefered_service_id == sid:
                self.selected_service_id = sid
                self.ctx.info("selected service %d", sid)
                return i
        if self.prefered_service_id > 0:
            self.ctx.error(
                "requested service %d not found in %s",
                self.prefered_service_id,
                sids,
            )
        if not sids:
            return -1
        self.selected_service_id = sids[0]
        self.ctx.info("selected service %d (no preference given)", sids[0])
        return 0

    def on_pid_table_changed(self, video: PMTESInfo, audio: list[PMTESInfo],
                             caption: PMTESInfo) -> None:
        if self.enable_video or self.enable_audio:
            if video.stype == 0x02:
                self.video_parser.set_stream_format(VideoStreamFormat.MPEG2)
            elif video.stype == 0x1B:
                self.video_parser.set_stream_format(VideoStreamFormat.H264)
            while len(self.audio_parsers) < len(audio):
                idx = len(self.audio_parsers)
                self.audio_parsers.append(
                    AudioFrameParser(self.ctx, self, idx, self._audio_decoder_factory)
                )
                self.ctx.info("added audio parser %d", idx)

    def _check_scramble(self, packet: TsPacket) -> bool:
        self.num_total_packets += 1
        if packet.transport_scrambling_control:
            self.num_scramble_packets += 1
            return False
        return True

    def on_video_packet(self, clock: int, packet: TsPacket) -> None:
        if self.enable_video and self._check_scramble(packet):
            self.video_parser.on_ts_packet(clock, packet)

    def on_audio_packet(self, clock: int, packet: TsPacket, audio_idx: int) -> None:
        if self.enable_audio and self._check_scramble(packet):
            if audio_idx < len(self.audio_parsers):
                self.audio_parsers[audio_idx].on_ts_packet(clock, packet)

    def on_caption_packet(self, clock: int, packet: TsPacket) -> None:
        if self.enable_caption and self._check_scramble(packet):
            self.caption_parser.on_ts_packet(clock, packet)

    # -- subclass interface -----------------------------------------------------------
    def on_video_pes_packet(self, clock, frames, packet) -> None:
        raise NotImplementedError

    def on_video_format_changed(self, fmt: VideoFormat) -> None:
        raise NotImplementedError

    def on_audio_pes_packet(self, audio_idx, clock, frames, packet) -> None:
        raise NotImplementedError

    def on_audio_format_changed(self, audio_idx, fmt: AudioFormat) -> None:
        raise NotImplementedError

    def on_caption_pes_packet(self, clock, captions, packet) -> None:
        pass

    def on_time(self, clock, jst_time) -> None:
        pass
