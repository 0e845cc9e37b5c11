"""Test-side MPEG-2 video bitstream constructor: emits spec-conformant
sequence/picture headers and slice/macroblock layers with controlled
per-macroblock quantiser patterns, so the QP extractor can be validated
by round-trip (no reference encoder exists in this environment)."""

from __future__ import annotations

from amatsukaze_tpu.ts import mpeg2_tables as M
from amatsukaze_tpu.utils.bits import BitWriter

# encode maps: value -> shortest code
def _enc_map(entries, key=lambda e: e[1:]):
    out = {}
    for e in entries:
        k = key(e)
        k = k[0] if len(k) == 1 else tuple(k)
        if k not in out or len(e[0]) < len(out[k]):
            out[k] = e[0]
    return out


_ADDR = _enc_map(M.B1_ADDR_INC)
_MBT = {1: _enc_map(M.B2_MB_TYPE_I), 2: _enc_map(M.B3_MB_TYPE_P),
        3: _enc_map(M.B4_MB_TYPE_B)}
_CBP = _enc_map(M.B9_CBP)
_MC = _enc_map(M.B10_MOTION_CODE)
_DC_L = _enc_map(M.B12_DC_LUMA)
_DC_C = _enc_map(M.B13_DC_CHROMA)
_B14 = _enc_map(M.B14_DCT)
_B15 = _enc_map(M.B15_DCT)

NONLINEAR_QSCALE = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 18, 20, 22,
    24, 28, 32, 36, 40, 44, 48, 52, 56, 64, 72, 80, 88, 96, 104, 112,
]


def _bits(w: BitWriter, s: str) -> None:
    for ch in s:
        w.write(1 if ch == "1" else 0, 1)


def start_code(w: BitWriter, code: int) -> None:
    w.byte_align(fill=0)
    w.write(0x000001, 24)
    w.write(code, 8)


def sequence_header(w: BitWriter, width: int, height: int,
                    chroma_format: int = 1) -> None:
    start_code(w, 0xB3)
    w.write(width & 0xFFF, 12)
    w.write(height & 0xFFF, 12)
    w.write(3, 4)   # aspect 16:9
    w.write(4, 4)   # 29.97
    w.write(50000, 18)
    w.write(1, 1)
    w.write(112, 10)
    w.write(0, 1)
    w.write(0, 1)   # no intra matrix
    w.write(0, 1)   # no non-intra matrix
    # sequence extension
    start_code(w, 0xB5)
    w.write(1, 4)   # sequence extension id
    w.write(0x48, 8)  # MP@HL-ish
    w.write(0, 1)   # progressive_sequence
    w.write(chroma_format, 2)
    w.write((width >> 12) & 3, 2)
    w.write((height >> 12) & 3, 2)
    w.write(0, 12)
    w.write(1, 1)
    w.write(0, 8)
    w.write(0, 1)
    w.write(0, 2)
    w.write(0, 5)


def picture_header(w: BitWriter, coding_type: int, temporal_reference: int,
                   q_scale_type: bool = False, intra_vlc_format: bool = False,
                   picture_structure: int = 3,
                   frame_pred_frame_dct: bool = True,
                   concealment: bool = False,
                   f_code: int = 4) -> None:
    start_code(w, 0x00)
    w.write(temporal_reference, 10)
    w.write(coding_type, 3)
    w.write(0xFFFF, 16)  # vbv_delay
    if coding_type in (2, 3):
        w.write(1, 1)
        w.write(7, 3)
    if coding_type == 3:
        w.write(1, 1)
        w.write(7, 3)
    w.write(0, 1)  # extra_bit_picture
    # picture coding extension
    start_code(w, 0xB5)
    w.write(8, 4)
    fc = [[f_code, f_code], [f_code, f_code]]
    if coding_type == 1 and not concealment:
        fc = [[15, 15], [15, 15]]
    if coding_type == 2:
        fc[1] = [15, 15]
    for s in (0, 1):
        for t in (0, 1):
            w.write(fc[s][t], 4)
    w.write(0, 2)  # intra_dc_precision (8 bit)
    w.write(picture_structure, 2)
    w.write(1, 1)  # top_field_first
    w.write(1 if frame_pred_frame_dct else 0, 1)
    w.write(1 if concealment else 0, 1)
    w.write(1 if q_scale_type else 0, 1)
    w.write(1 if intra_vlc_format else 0, 1)
    w.write(0, 1)  # alternate_scan
    w.write(0, 1)  # repeat_first_field
    w.write(1, 1)  # chroma_420_type
    w.write(0, 1)  # progressive_frame
    w.write(0, 1)  # composite_display_flag


def qscale_code(qs: int, q_scale_type: bool) -> int:
    if q_scale_type:
        return NONLINEAR_QSCALE.index(qs)
    assert qs % 2 == 0
    return qs // 2


def write_block(w: BitWriter, intra: bool, intra_vlc_format: bool,
                luma: bool = True, dc_diff: int = 0,
                ac: list | None = None) -> None:
    """One coefficient block. ac: list of (run, level) pairs; level
    magnitudes beyond the tables use the escape code."""
    table = _B15 if (intra and intra_vlc_format) else _B14
    if intra:
        if dc_diff == 0:
            _bits(w, (_DC_L if luma else _DC_C)[0])
        else:
            size = max(abs(dc_diff).bit_length(), 1)
            _bits(w, (_DC_L if luma else _DC_C)[size])
            if dc_diff > 0:
                w.write(dc_diff, size)
            else:
                w.write(dc_diff + (1 << size) - 1, size)
        first = False
    else:
        first = True
    for run, level in ac or []:
        mag = abs(level)
        if first and run == 0 and mag == 1:
            w.write(1, 1)
            w.write(1 if level < 0 else 0, 1)
            first = False
            continue
        first = False
        if (run, mag) in table:
            _bits(w, table[(run, mag)])
            w.write(1 if level < 0 else 0, 1)
        else:  # escape
            _bits(w, M.DCT_ESCAPE)
            w.write(run, 6)
            w.write(level & 0xFFF, 12)
    # EOB
    _bits(w, table[(M.EOB_RUN, 0)])


def write_macroblock(w: BitWriter, coding_type: int, addr_inc: int,
                     mb_flags: int, q_scale_type: bool = False,
                     intra_vlc_format: bool = False, new_qs: int | None = None,
                     mv: tuple = (0, 0), f_code: int = 4,
                     cbp: int = 0, blocks: dict | None = None,
                     dc_diffs: list | None = None,
                     frame_pred_frame_dct: bool = True) -> None:
    """One macroblock (frame picture, frame prediction)."""
    while addr_inc > 33:
        _bits(w, M.ADDR_INC_ESCAPE)
        addr_inc -= 33
    _bits(w, _ADDR[addr_inc])
    _bits(w, _MBT[coding_type][mb_flags])
    intra = bool(mb_flags & M.MB_INTRA)
    motion_f = bool(mb_flags & M.MB_MOTION_F)
    motion_b = bool(mb_flags & M.MB_MOTION_B)
    pattern = bool(mb_flags & M.MB_PATTERN)
    # frame_motion_type: omitted when frame_pred_frame_dct == 1
    if (motion_f or motion_b) and not frame_pred_frame_dct:
        w.write(2, 2)  # frame-based
    if not frame_pred_frame_dct and (intra or pattern):
        w.write(0, 1)  # dct_type
    if mb_flags & M.MB_QUANT:
        assert new_qs is not None
        w.write(qscale_code(new_qs, q_scale_type), 5)

    def write_mv():
        for comp in (0, 1):
            code = mv[comp]
            mag = abs(code)
            _bits(w, _MC[mag])
            if mag:
                w.write(1 if code < 0 else 0, 1)
                if f_code != 1:
                    w.write(0, f_code - 1)  # residual

    if motion_f:
        write_mv()
    if motion_b:
        write_mv()
    if pattern:
        _bits(w, _CBP[cbp])
    elif intra:
        cbp = 0x3F
    for b in range(6):
        if not ((cbp >> (5 - b)) & 1):
            continue
        ac = (blocks or {}).get(b, [])
        dcd = (dc_diffs or [0] * 6)[b] if intra else 0
        write_block(w, intra, intra_vlc_format, luma=b < 4, dc_diff=dcd,
                    ac=ac)


def begin_slice(w: BitWriter, row: int, qs: int,
                q_scale_type: bool = False) -> None:
    start_code(w, 0x01 + row)
    w.write(qscale_code(qs, q_scale_type), 5)
    w.write(0, 1)  # no slice extension, extra_bit_slice = 0


def end_stream(w: BitWriter) -> bytes:
    w.byte_align(fill=0)
    return w.getvalue()


def simple_picture(width: int, height: int, coding_type: int = 1,
                   row_qs=None, mquant: dict | None = None,
                   q_scale_type: bool = False,
                   intra_vlc_format: bool = False,
                   temporal_reference: int = 0,
                   with_seq: bool = True,
                   ac_blocks: dict | None = None) -> bytes:
    """A full coded picture: one slice per MB row, intra MBs everywhere
    (I) or skipped/coded mix (P/B). row_qs: per-row slice QP list;
    mquant: {(row, col): qs} mid-row quantiser changes (emitted as
    QUANT-flavoured macroblock types)."""
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    row_qs = row_qs or [8] * mb_h
    mquant = mquant or {}
    w = BitWriter()
    if with_seq:
        sequence_header(w, width, height)
    picture_header(w, coding_type, temporal_reference,
                   q_scale_type=q_scale_type,
                   intra_vlc_format=intra_vlc_format)
    for row in range(mb_h):
        begin_slice(w, row, row_qs[row], q_scale_type)
        for col in range(mb_w):
            qs = mquant.get((row, col))
            ac = (ac_blocks or {}).get((row, col), {})
            if coding_type == 1:
                flags = (M.MB_QUANT | M.MB_INTRA) if qs else M.MB_INTRA
                write_macroblock(w, 1, 1, flags, q_scale_type,
                                 intra_vlc_format, new_qs=qs,
                                 dc_diffs=[3, -2, 1, 0, 2, -1],
                                 blocks=ac)
            else:
                # B pictures have no pattern-only / quant+pattern-only
                # types: every B type carries motion (table B.4)
                motion = M.MB_MOTION_F if coding_type == 2 else M.MB_MOTION_B
                if qs:
                    flags = M.MB_QUANT | M.MB_PATTERN | (
                        0 if coding_type == 2 else motion)
                    write_macroblock(w, coding_type, 1, flags, q_scale_type,
                                     intra_vlc_format, new_qs=qs, cbp=32,
                                     mv=(1, 0),
                                     blocks={0: [(0, 2), (3, 1)]})
                elif col % 3 == 0:
                    write_macroblock(
                        w, coding_type, 1,
                        M.MB_MOTION_F | M.MB_PATTERN,
                        q_scale_type, intra_vlc_format, mv=(1, -2),
                        cbp=33, blocks={0: [(0, 1), (1, 5)],
                                        5: [(0, -40), (2, 1)]})
                else:
                    flags = M.MB_PATTERN | (
                        0 if coding_type == 2 else motion)
                    write_macroblock(w, coding_type, 1, flags,
                                     q_scale_type, intra_vlc_format,
                                     mv=(0, 1),
                                     cbp=16, blocks={1: [(0, -1), (0, 3)]})
    return end_stream(w)
