"""Synthetic MPEG2-TS generator for tests.

Builds bit-correct PAT/PMT/TDT sections, MPEG2/H.264-style elementary
streams (headers only + filler), ADTS audio, PES packetization, PCR
insertion, and 188-byte TS packetization with continuity counters.
This replaces the reference's TestParam.ini real-broadcast fixtures
(AmatsukazeUnitTest.cpp:66-86) with deterministic in-repo streams.
"""

from __future__ import annotations

from amatsukaze_tpu.utils.bits import BitWriter
from amatsukaze_tpu.utils.crc import crc32_mpeg2
from amatsukaze_tpu.ts.pes import write_timestamp

TS_LEN = 188


# ---------------------------------------------------------------------------
# PSI
# ---------------------------------------------------------------------------

def make_section(table_id: int, id_ext: int, payload: bytes, version: int = 0) -> bytes:
    """Syntax-section with CRC."""
    body = bytearray()
    body += id_ext.to_bytes(2, "big")
    body.append(0xC0 | ((version & 0x1F) << 1) | 1)  # current
    body += b"\x00\x00"  # section_number, last_section_number
    body += payload
    length = len(body) + 4  # + CRC
    head = bytes([table_id, 0xB0 | (length >> 8), length & 0xFF])
    sec = head + bytes(body)
    crc = crc32_mpeg2(sec)
    return sec + crc.to_bytes(4, "big")


def make_pat(tsid: int, programs: list[tuple[int, int]]) -> bytes:
    payload = bytearray()
    for num, pid in programs:
        payload += num.to_bytes(2, "big")
        payload += (0xE000 | pid).to_bytes(2, "big")
    return make_section(0x00, tsid, bytes(payload))


def make_pmt(program: int, pcr_pid: int, streams: list[tuple[int, int, bytes]],
             version: int = 0) -> bytes:
    """streams: (stream_type, pid, es_descriptors)"""
    payload = bytearray()
    payload += (0xE000 | pcr_pid).to_bytes(2, "big")
    payload += (0xF000 | 0).to_bytes(2, "big")  # program_info_length = 0
    for stype, pid, desc in streams:
        payload.append(stype)
        payload += (0xE000 | pid).to_bytes(2, "big")
        payload += (0xF000 | len(desc)).to_bytes(2, "big")
        payload += desc
    return make_section(0x02, program, bytes(payload), version=version)


def component_tag_descriptor(tag: int) -> bytes:
    return bytes([0x52, 0x01, tag])


# ---------------------------------------------------------------------------
# ARIB caption data groups (STD-B24; decoded by captions/b24.py)
# ---------------------------------------------------------------------------

def caption_data_group(group_id: int, body: bytes) -> bytes:
    """data_group header (group_id, link numbers, size) + body + CRC_16."""
    return (bytes([(group_id & 0x3F) << 2, 0, 0,
                   len(body) >> 8, len(body) & 0xFF])
            + body + b"\x00\x00")


def caption_management_group(languages: int = 1, swf_fmt: int = 0) -> bytes:
    """Caption management data (group 0): TMD free, N languages with
    ISO code 'jpn' and display-format nibble `swf_fmt` (0 = 960x540)."""
    body = bytearray([0x00, languages])
    for _ in range(languages):
        body += bytes([0x00]) + b"jpn" + bytes([(swf_fmt & 0xF) << 4])
    return caption_data_group(0x0, bytes(body))


def caption_statement_group(du: bytes, lang_index: int = 0,
                            unit_parameter: int = 0x20) -> bytes:
    """Caption statement (group 1+lang): one data unit.

    unit_parameter 0x20 = statement body (ARIB 8-bit char stream),
    0x30/0x31 = DRCS download."""
    unit = (bytes([0x1F, unit_parameter]) + len(du).to_bytes(3, "big") + du)
    body = bytes([0x00]) + len(unit).to_bytes(3, "big") + unit
    return caption_data_group(0x1 + lang_index, body)


def caption_drcs_du(charset_final: int, code: int, width: int = 4,
                    height: int = 4, pattern: bytes | None = None,
                    two_byte: bool = False) -> bytes:
    """DRCS download data unit body (STD-B24 Fig. 9-3): one code, one
    1-bit-depth font. For 1-byte DRCS sets the 16-bit CharacterCode's
    high byte is `charset_final` (0x41-0x4F); for DRCS-0 pass
    two_byte=True and the full 2-byte code."""
    if pattern is None:
        pattern = bytes([0xF0] * ((width * height + 7) // 8))
    if two_byte:
        cc = bytes([(code >> 8) & 0x7F, code & 0x7F])
    else:
        cc = bytes([charset_final, code & 0x7F])
    return (bytes([1]) + cc + bytes([1])  # NumberOfCode, code, NumberOfFont
            + bytes([0x00])  # fontId=0, mode=0 (bitmap)
            + bytes([2, width, height]) + pattern)


def caption_pes_payload(group: bytes) -> bytes:
    """Synchronized PES data packet wrapper (data_identifier 0x80)."""
    return bytes([0x80, 0xFF, 0xF0]) + group


def make_tdt(jst_raw40: int) -> bytes:
    body = jst_raw40.to_bytes(5, "big")
    length = len(body)
    return bytes([0x70, 0x70 | (length >> 8), length & 0xFF]) + body


def arib_ascii(s: str) -> bytes:
    """ASCII text with G0 designated to the alphanumeric set."""
    return b"\x1b\x28\x4a" + s.encode("ascii")


def make_sdt(tsid: int, services: list[tuple[int, str]]) -> bytes:
    """SDT actual (0x42): (service_id, name) with a service descriptor."""
    payload = bytearray()
    payload += (0xFFFF).to_bytes(2, "big")  # original network id
    payload.append(0xFF)  # reserved
    for sid, name in services:
        nm = arib_ascii(name)
        desc = bytes([0x48, 3 + len(nm), 0x01, 0, len(nm)]) + nm
        payload += sid.to_bytes(2, "big")
        payload.append(0xFC)
        payload += (0x8000 | len(desc)).to_bytes(2, "big")
        payload += desc
    return make_section(0x42, tsid, bytes(payload))


def make_eit_present(service_id: int, event_name: str, text: str,
                     genre: tuple[int, int], start_raw40: int = 0,
                     duration_bcd: int = 0x013000) -> bytes:
    """EIT present/following (0x4E) section 0 with short-event + content
    descriptors."""
    nm = arib_ascii(event_name)
    tx = arib_ascii(text)
    short = bytes([0x4D, 5 + len(nm) + len(tx)]) + b"jpn" \
        + bytes([len(nm)]) + nm + bytes([len(tx)]) + tx
    content = bytes([0x54, 2, (genre[0] << 4) | genre[1], 0xFF])
    descs = short + content
    payload = bytearray()
    payload += (0xFFFF).to_bytes(2, "big")  # tsid
    payload += (0xFFFF).to_bytes(2, "big")  # original network id
    payload += b"\x00\x4e"  # segment_last_section_number, last_table_id
    payload += (1).to_bytes(2, "big")  # event_id
    payload += start_raw40.to_bytes(5, "big")
    payload += duration_bcd.to_bytes(3, "big")
    payload += (0x1000 | len(descs)).to_bytes(2, "big")  # running + length
    payload += descs
    return make_section(0x4E, service_id, bytes(payload))


# ---------------------------------------------------------------------------
# MPEG2 video ES
# ---------------------------------------------------------------------------

def mpeg2_sequence_header(width=1440, height=1080, aspect=3, frame_rate_code=4,
                          progressive_sequence=0) -> bytes:
    w = BitWriter()
    w.write(0x000001B3, 32)
    w.write(width & 0xFFF, 12)
    w.write(height & 0xFFF, 12)
    w.write(aspect, 4)  # 3 = 16:9
    w.write(frame_rate_code, 4)  # 4 = 29.97
    w.write(50000, 18)  # bit_rate_value
    w.write(1, 1)  # marker
    w.write(112, 10)  # vbv
    w.write(0, 1)  # constrained
    w.write(0, 1)  # no intra matrix
    w.write(0, 1)  # no non-intra matrix
    w.byte_align()
    # sequence extension
    w.write(0x000001B5, 32)
    w.write(0x1, 4)
    w.write(0x48, 8)  # profile/level: main/high
    w.write(progressive_sequence, 1)
    w.write(1, 2)  # chroma 4:2:0
    w.write(0, 2)  # h size ext
    w.write(0, 2)  # v size ext
    w.write(0, 12)  # bitrate ext
    w.write(1, 1)  # marker
    w.write(0, 8)  # vbv ext
    w.write(0, 1)  # low delay
    w.write(0, 2)  # frame rate ext n
    w.write(0, 5)  # frame rate ext d
    w.byte_align()
    return w.getvalue()


def mpeg2_picture(coding_type=1, picture_structure=3, tff=1, rff=0,
                  progressive_frame=0, temporal_reference=0,
                  slice_bytes=32, real_slices=None) -> bytes:
    w = BitWriter()
    w.write(0x00000100, 32)
    w.write(temporal_reference, 10)
    w.write(coding_type, 3)  # 1=I 2=P 3=B
    w.write(0xFFFF, 16)  # vbv_delay
    if coding_type in (2, 3):
        w.write(0, 4)
    if coding_type == 3:
        w.write(0, 4)
    w.write(0, 1)  # no extra info
    w.byte_align()
    # picture coding extension
    w.write(0x000001B5, 32)
    w.write(0x8, 4)
    if real_slices is not None and coding_type in (2, 3):
        # real slices code motion residuals for f_code=4 (mpeg2_gen's
        # write_mv default); 15 = "no vector of this kind"
        fwd = 4
        bwd = 4 if coding_type == 3 else 15
        for fc in (fwd, fwd, bwd, bwd):
            w.write(fc, 4)
    else:
        w.write(0xFFFF, 16)  # f_code: all unused (intra)
    w.write(0, 2)  # intra_dc_precision
    w.write(picture_structure, 2)
    w.write(tff, 1)
    w.write(0, 1)  # frame_pred_frame_dct
    w.write(0, 1)  # concealment mv
    w.write(0, 1)  # q_scale_type
    w.write(0, 1)  # intra_vlc
    w.write(0, 1)  # alternate_scan
    w.write(rff, 1)
    w.write(0, 1)  # chroma_420_type
    w.write(progressive_frame, 1)
    w.write(0, 1)  # composite display
    w.byte_align()
    if real_slices is not None:
        # genuine minimal slice/macroblock layer (mpeg2_gen) so the QP
        # extractor sees parseable per-MB data; real_slices = (width,
        # height, row_qs)
        import mpeg2_gen as _G
        from amatsukaze_tpu.ts import mpeg2_tables as _M

        gw, gh, row_qs = real_slices
        mb_w = (gw + 15) // 16
        mb_h = (gh + 15) // 16
        for row in range(mb_h):
            _G.begin_slice(w, row, row_qs[row % len(row_qs)])
            for _ in range(mb_w):
                if coding_type == 1:
                    _G.write_macroblock(w, 1, 1, _M.MB_INTRA,
                                        frame_pred_frame_dct=False,
                                        dc_diffs=[1, 0, -1, 2, 0, 0])
                else:
                    flags = _M.MB_PATTERN | (
                        0 if coding_type == 2 else _M.MB_MOTION_B)
                    _G.write_macroblock(w, coding_type, 1, flags,
                                        frame_pred_frame_dct=False,
                                        mv=(0, 1), cbp=32,
                                        blocks={0: [(0, 2), (1, -1)]})
        w.byte_align(fill=0)
    else:
        # a fake slice so there's some coded payload
        w.write(0x00000101, 32)
        w.write_bytes(b"\xA5" * slice_bytes)
        w.byte_align()
    return w.getvalue()


# ---------------------------------------------------------------------------
# ADTS audio ES
# ---------------------------------------------------------------------------

def adts_frame(payload_len=200, sampling_frequency_index=3, channel_config=2,
               profile=1) -> bytes:
    frame_length = 7 + payload_len
    w = BitWriter()
    w.write(0xFFF, 12)
    w.write(1, 1)  # ID = MPEG2
    w.write(0, 2)  # layer
    w.write(1, 1)  # protection_absent
    w.write(profile, 2)
    w.write(sampling_frequency_index, 4)
    w.write(0, 1)
    w.write(channel_config, 3)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 1)
    w.write(frame_length, 13)
    w.write(0x7FF, 11)
    w.write(0, 2)  # 1 raw data block
    w.write_bytes(bytes((i * 7) & 0xFF for i in range(payload_len)))
    return w.getvalue()


# ---------------------------------------------------------------------------
# PES + TS packetization
# ---------------------------------------------------------------------------

def make_pes(stream_id: int, payload: bytes, pts: int | None = None,
             dts: int | None = None, unbounded: bool = False) -> bytes:
    header_data = b""
    flags = 0
    if pts is not None:
        if dts is not None:
            flags = 0xC0
            header_data = write_timestamp(pts, 0x3) + write_timestamp(dts, 0x1)
        else:
            flags = 0x80
            header_data = write_timestamp(pts, 0x2)
    body = bytes([0x80, flags, len(header_data)]) + header_data + payload
    plen = 0 if unbounded else len(body)
    return b"\x00\x00\x01" + bytes([stream_id]) + plen.to_bytes(2, "big") + body


class TsPacketizer:
    """Packetize byte streams into TS packets with CC and optional PCR/AF."""

    def __init__(self):
        self.cc: dict[int, int] = {}
        self.packets = bytearray()

    def _next_cc(self, pid: int) -> int:
        v = self.cc.get(pid, 0)
        self.cc[pid] = (v + 1) & 0xF
        return v

    def add_section(self, pid: int, section: bytes) -> None:
        data = b"\x00" + section  # pointer_field
        first = True
        while data:
            chunk = data[:184]
            data = data[184:]
            self._emit(pid, chunk, pusi=first, pad_with_ff=True)
            first = False

    def add_pes(self, pid: int, pes: bytes, pcr: int | None = None) -> None:
        first = True
        while pes:
            avail = 184 - (8 if (first and pcr is not None) else 0)
            chunk = pes[:avail]
            pes = pes[avail:]
            self._emit(pid, chunk, pusi=first,
                       pcr=pcr if first else None)
            first = False

    def add_pcr_only(self, pid: int, pcr: int) -> None:
        hdr = bytes([0x47, (pid >> 8) & 0x1F, pid & 0xFF, 0x20 | self.cc.get(pid, 0)])
        af = bytearray([183, 0x10])  # af_length, PCR_flag
        base, ext = divmod(pcr, 300)
        base &= (1 << 33) - 1  # PCR base wraps like PTS
        raw = (base << 15) | (0x3F << 9) | ext
        af += raw.to_bytes(6, "big")
        af += b"\xFF" * (184 - len(af))
        self.packets += hdr + af

    def _emit(self, pid: int, chunk: bytes, pusi: bool, pcr: int | None = None,
              pad_with_ff: bool = False) -> None:
        cc = self._next_cc(pid)
        need_af = pcr is not None or len(chunk) < 184
        afc = 0x30 if need_af else 0x10
        hdr = bytes([
            0x47,
            (0x40 if pusi else 0) | ((pid >> 8) & 0x1F),
            pid & 0xFF,
            afc | cc,
        ])
        if need_af and pcr is None and len(chunk) == 183:
            # a 183-byte payload fits only with the 1-byte AF
            # (adaptation_field_length == 0, ISO 13818-1 2.4.3.5)
            body = bytes([0]) + chunk
        elif need_af:
            af = bytearray()
            if pcr is not None:
                af.append(0x10)  # PCR flag
                base, ext = divmod(pcr, 300)
                base &= (1 << 33) - 1  # PCR base wraps like PTS
                raw = (base << 15) | (0x3F << 9) | ext
                af += raw.to_bytes(6, "big")
            else:
                af.append(0x00)
            pad = 184 - len(chunk) - len(af) - 1
            if pad < 0:
                raise ValueError("chunk too big")
            af += b"\xFF" * pad
            body = bytes([len(af)]) + bytes(af) + chunk
        else:
            body = chunk
        assert len(body) == 184
        self.packets += hdr + body

    def getvalue(self) -> bytes:
        return bytes(self.packets)


# ---------------------------------------------------------------------------
# full stream builder
# ---------------------------------------------------------------------------

VIDEO_PID = 0x0111
AUDIO_PID = 0x0112
AUDIO2_PID = 0x0113
CAPTION_PID = 0x0115
PMT_PID = 0x01F0
SERVICE_ID = 0x5C38
TSID = 0x7FE0


def build_simple_ts(
    num_frames: int = 60,
    width: int = 1440,
    height: int = 1080,
    fps_num: int = 30000,
    fps_den: int = 1001,
    pic_pattern: str = "TFF",  # or "TFF_RFF,BFF_RFF,..." cycled per frame
    num_audio: int = 1,
    audio_sfi: int = 3,  # 48 kHz
    first_pts: int = 90_000,
    gop_len: int = 15,
    service_id: int = SERVICE_ID,
    psi_interval: int = 20,
    slice_bytes: int = 32,
    real_slices: bool = False,  # genuine MB layer (QP-extractable)
    row_qs=None,
    si: bool = False,  # include SDT/EIT/TDT service info
    service_name: str = "TEST TV",
    event_name: str = "Test Program",
    jst_raw40: int = 0xC07A123456,
    video_es_frames: list | None = None,  # real coded pictures (coded order)
    audio_es_frames: list | None = None,  # real ADTS frames, by time index
    video_stream_type: int = 0x02,  # 0x02 MPEG2, 0x1B H.264
    audio_stream_type: int = 0x0F,  # 0x0F ADTS, 0x11 LATM/LOAS
    caption_groups: list[tuple[int, bytes]] | None = None,  # (frame, group)
    extra_services: list[tuple[int, int]] | None = None,  # (sid, pmt_pid)
    extra_services_first: bool = False,
    geometry_change: tuple | None = None,  # (at_frame, w2, h2): new seq
    # one (at_frame, channel_config) or a list of them, applied in order
    audio_change: tuple | list | None = None,
    audio_channel_config: int = 2,
    # PMT churn: at this frame the PMT version bumps and the audio
    # stream MOVES to a new PID (mid-GOP ES re-wiring; the selector must
    # follow the updated table, ref Mpeg2TsParser PMT update handling)
    pmt_switch: int | None = None,
) -> bytes:
    """A single-program TS with MPEG2 video + N ADTS audio streams.

    With `video_es_frames` (per-picture ES chunks, e.g. from
    mpeg2_enc.Mpeg2TestEncoder split by iter_picture_chunks), the given
    REAL video replaces the synthetic picture generator — the stream then
    decodes to actual pixels with the in-build MPEG2 decoder."""
    if video_es_frames is not None:
        num_frames = len(video_es_frames)
    tz = TsPacketizer()
    programs = [(service_id, PMT_PID)]
    extra_pmts = []
    for n, (sid, ppid) in enumerate(extra_services or []):
        # decoy services: own PMT with video/audio PIDs that carry no
        # packets (selection must go by service id, not PID traffic)
        programs.append((sid, ppid))
        extra_pmts.append((ppid, make_pmt(sid, 0x0200 + 16 * n, [
            (video_stream_type, 0x0200 + 16 * n, b""),
            (audio_stream_type, 0x0201 + 16 * n, b""),
        ])))
    if extra_services_first:
        programs.reverse()
    pat = make_pat(TSID, programs)
    streams = [(video_stream_type, VIDEO_PID, b"")]
    for i in range(num_audio):
        streams.append((audio_stream_type, AUDIO_PID + i, b""))
    if caption_groups:
        streams.append((0x06, CAPTION_PID, component_tag_descriptor(0x30)))
    pmt = make_pmt(service_id, VIDEO_PID, streams)
    AUDIO_PID2 = AUDIO_PID + 8
    pmt2 = None
    if pmt_switch is not None:
        streams2 = [(video_stream_type, VIDEO_PID, b"")]
        for i in range(num_audio):
            streams2.append((audio_stream_type, AUDIO_PID2 + i, b""))
        if caption_groups:
            streams2.append((0x06, CAPTION_PID,
                             component_tag_descriptor(0x30)))
        pmt2 = make_pmt(service_id, VIDEO_PID, streams2, version=1)
    sdt_services = [(service_id, service_name)] + [
        (sid, f"DECOY {sid:04X}") for sid, _ in (extra_services or [])]
    sdt = make_sdt(TSID, sdt_services) if si else None
    eit = make_eit_present(service_id, event_name, "synthetic event",
                           (0x7, 0x0), jst_raw40) if si else None
    tdt = make_tdt(jst_raw40) if si else None

    pats = pic_pattern.split(",")
    frame_dur = 90_000 * fps_den // fps_num
    audio_dur_num = 90_000 * 1024
    audio_sr = {3: 48000, 4: 44100, 5: 32000}[audio_sfi]

    # PCR leads PTS by ~0.4 s so captions/PES sanity checks hold
    pcr_offset = first_pts * 300 - int(0.4 * 27_000_000)

    audio_next = [0] * num_audio  # next audio frame index per stream

    cap_by_frame: dict[int, list[bytes]] = {}
    for cf, group in caption_groups or []:
        cap_by_frame.setdefault(cf, []).append(group)

    for f in range(num_frames):
        switched = pmt_switch is not None and f >= pmt_switch
        if f == pmt_switch:
            # version bump lands immediately (mid-GOP), not at the next
            # periodic PSI slot
            tz.add_section(0x0000, pat)
            tz.add_section(PMT_PID, pmt2)
        if f % psi_interval == 0:
            tz.add_section(0x0000, pat)
            tz.add_section(PMT_PID, pmt2 if switched else pmt)
            for ppid, xpmt in extra_pmts:
                tz.add_section(ppid, xpmt)
            if si:
                tz.add_section(0x0011, sdt)
                tz.add_section(0x0012, eit)
                tz.add_section(0x0014, tdt)
        pts = first_pts + f * frame_dur
        dts = pts - frame_dur  # fake but monotone
        pcr = pcr_offset + f * frame_dur * 300

        name = pats[f % len(pats)]
        ps, tff, rff = {
            "FRAME": (3, 1, 0), "TFF": (3, 1, 0), "BFF": (3, 0, 0),
            "TFF_RFF": (3, 1, 1), "BFF_RFF": (3, 0, 1),
            # field-picture pair: two coded pictures (top then bottom /
            # bottom then top) weave into one frame (ISO 13818-2 6.3.10;
            # ref sample RffFieldPictureTsFile mixes these with RFF
            # frame pictures)
            "FIELDS_TFF": (1, 1, 0), "FIELDS_BFF": (2, 0, 0),
        }[name]
        prog_frame = 1 if name == "FRAME" else 0
        vw, vh = width, height
        new_gop = f % gop_len == 0
        if geometry_change is not None and f >= geometry_change[0]:
            vw, vh = geometry_change[1], geometry_change[2]
            if f == geometry_change[0]:
                new_gop = True  # a format switch starts a new sequence
        if video_es_frames is not None:
            es = bytearray(video_es_frames[f])
        else:
            es = bytearray()
            if new_gop:
                es += mpeg2_sequence_header(width=vw, height=vh,
                                            frame_rate_code=4)
            coding = 1 if new_gop else (2 if f % 3 == 0 else 3)
            rs = ((vw, vh, row_qs or [8, 12, 20, 30])
                  if real_slices else None)
            if name.startswith("FIELDS_"):
                second = 2 if ps == 1 else 1  # opposite parity field
                for fps_ in (ps, second):
                    es += mpeg2_picture(coding_type=coding,
                                        picture_structure=fps_,
                                        tff=tff, rff=0,
                                        progressive_frame=0,
                                        temporal_reference=f % gop_len,
                                        slice_bytes=slice_bytes,
                                        real_slices=rs)
            else:
                es += mpeg2_picture(coding_type=coding,
                                    picture_structure=ps, tff=tff,
                                    rff=rff, progressive_frame=prog_frame,
                                    temporal_reference=f % gop_len,
                                    slice_bytes=slice_bytes,
                                    real_slices=rs)
        pes = make_pes(0xE0, bytes(es), pts=pts, dts=dts, unbounded=True)
        tz.add_pes(VIDEO_PID, pes, pcr=pcr)

        # caption PES: PTS leads the PCR clock by ~0.8 s (the splitter's
        # 0.5-1.5 s receiver-lead sanity window, TsSplitter.hpp:174-186)
        for group in cap_by_frame.get(f, ()):
            cpts = pts + int(0.4 * 90_000)
            tz.add_pes(CAPTION_PID,
                       make_pes(0xBD, caption_pes_payload(group), pts=cpts))

        # emit audio to keep pace with video time
        for a in range(num_audio):
            while audio_next[a] * audio_dur_num // audio_sr <= f * frame_dur:
                apts = first_pts + audio_next[a] * audio_dur_num // audio_sr
                if audio_es_frames is not None:
                    af = audio_es_frames[
                        min(audio_next[a], len(audio_es_frames) - 1)]
                else:
                    cc = audio_channel_config
                    if audio_change is not None:
                        changes = (audio_change if isinstance(
                            audio_change, list) else [audio_change])
                        for at, cc2 in changes:
                            if f >= at:
                                cc = cc2
                    af = adts_frame(sampling_frequency_index=audio_sfi,
                                    channel_config=cc)
                apid = (AUDIO_PID2 if switched else AUDIO_PID) + a
                tz.add_pes(apid, make_pes(0xC0, af, pts=apts))
                audio_next[a] += 1

    # final flush helper: one trailing PCR + PAT so last PES can be flushed
    tz.add_pcr_only(VIDEO_PID, pcr_offset + num_frames * frame_dur * 300)
    return tz.getvalue()
