"""PAFF (field-picture) H.264 stream synthesis for decoder validation.

There is no PAFF encoder in this environment (x264 emits MBAFF), so PAFF
streams are synthesized by re-heading a PROGRESSIVE half-height libx264
encode as a sequence of coded fields: the macroblock-layer slice data of
a progressive W x H/2 picture parses identically inside a field picture
(entropy coding does not depend on the picture structure), only the
header-level semantics change (field references, PicNum arithmetic,
POC).  libavcodec decodes the rewritten stream and serves as the ground
truth for what those bits mean under field decoding.

Source pictures alternate top/bottom parity (even index = top, tff).
"""

from __future__ import annotations

from amatsukaze_tpu.utils.bits import BitReader, BitWriter
from amatsukaze_tpu.video import h264_ref as HR


def _ue(w: BitWriter, v: int) -> None:
    n = v + 1
    nb = n.bit_length()
    w.write(0, nb - 1)
    w.write(n, nb)


def _se(w: BitWriter, v: int) -> None:
    _ue(w, 2 * v - 1 if v > 0 else -2 * v)


def _nal(rbsp: bytes, ref_idc: int, typ: int) -> bytes:
    out = bytearray(b"\x00\x00\x00\x01")
    out.append((ref_idc << 5) | typ)
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _copy_bits(w: BitWriter, r: BitReader, nbits: int) -> None:
    while nbits >= 32:
        w.write(r.read(32), 32)
        nbits -= 32
    if nbits:
        w.write(r.read(nbits), nbits)


def _rewrite_sps(rbsp: bytes) -> bytes:
    """frame_mbs_only 1 -> 0 (+ mb_adaptive_frame_field 0).  The height
    in map units is unchanged: H_field/16 map units x 32 = frame height."""
    r = BitReader(rbsp)
    w = BitWriter()
    w.write(r.read(8), 8)   # profile
    w.write(r.read(8), 8)   # constraints
    w.write(r.read(8), 8)   # level
    profile = rbsp[0]
    _ue(w, r.ue())          # sps_id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        _ue(w, r.ue())      # chroma_format_idc
        _ue(w, r.ue())      # bit_depth_luma
        _ue(w, r.ue())      # bit_depth_chroma
        w.write(r.read(1), 1)
        if r.read(1):       # seq_scaling_matrix (copy verbatim is hard;
            raise ValueError("SPS scaling matrices unsupported in rewrite")
        w.write(0, 1)
    _ue(w, r.ue())          # log2_max_frame_num_minus4
    poc_type = r.ue()
    _ue(w, poc_type)
    if poc_type == 0:
        _ue(w, r.ue())      # log2_max_poc_lsb_minus4
    elif poc_type == 1:
        raise ValueError("poc_type 1 unsupported in rewrite")
    _ue(w, r.ue())          # max_num_ref_frames
    w.write(r.read(1), 1)   # gaps allowed
    _ue(w, r.ue())          # width_in_mbs_minus1
    _ue(w, r.ue())          # map_units_minus1 (unchanged)
    fmo = r.read(1)         # frame_mbs_only (source: 1)
    assert fmo == 1
    w.write(0, 1)           # frame_mbs_only = 0
    w.write(0, 1)           # mb_adaptive_frame_field = 0  -> PAFF
    r.read(1)               # direct_8x8_inference
    w.write(1, 1)           # force 1 (required when !frame_mbs_only)
    if r.read(1):           # frame_cropping
        w.write(1, 1)
        _ue(w, r.ue())
        _ue(w, r.ue())
        _ue(w, r.ue())
        _ue(w, r.ue())      # bottom crop now counts frame lines; accept
    else:
        w.write(0, 1)
    w.write(1, 1)           # vui_parameters_present
    # minimal VUI: only pic_struct_present (field pic_timing SEI)
    w.write(0, 1)           # aspect_ratio_info_present
    w.write(0, 1)           # overscan_info_present
    w.write(0, 1)           # video_signal_type_present
    w.write(0, 1)           # chroma_loc_info_present
    w.write(1, 1)           # timing_info_present
    w.write(1, 32)          # num_units_in_tick
    w.write(60, 32)         # time_scale (two ticks/frame -> 30 fps)
    w.write(1, 1)           # fixed_frame_rate
    w.write(0, 1)           # nal_hrd_parameters_present
    w.write(0, 1)           # vcl_hrd_parameters_present
    w.write(1, 1)           # pic_struct_present
    w.write(0, 1)           # bitstream_restriction
    w.write(1, 1)
    w.byte_align()
    return w.getvalue()


def rewrite_to_paff(es: bytes, log2_max_frame_num=None,
                    log2_max_poc_lsb=None) -> bytes:
    """Re-head a progressive Annex B stream (W x H/2 pictures) as PAFF
    coded fields (alternating top/bottom, tff)."""
    sps_map = {}
    pps_map = {}
    out = bytearray()
    field_idx = 0
    for nal in HR.split_annexb(es):
        typ = nal[0] & 0x1F
        ref_idc = (nal[0] >> 5) & 3
        rbsp = HR.ebsp_to_rbsp(nal[1:])
        if typ == 6:
            continue  # drop source SEI; field pic_timing injected below
        if typ == 7:
            s = HR.parse_sps(rbsp)
            sps_map[s.sps_id] = s
            out += _nal(_rewrite_sps(rbsp), ref_idc, 7)
        elif typ == 8:
            p = HR.parse_pps(rbsp, sps_map)
            pps_map[p.pps_id] = p
            out += _nal(nal[1:], ref_idc, 8)
        elif typ in (1, 5):
            h, sps, pps = HR.parse_slice_header(rbsp, ref_idc, typ,
                                                sps_map, pps_map)
            # pic_timing SEI: pic_struct 1 (top field) / 2 (bottom field),
            # one clock TS with clock_timestamp_flag 0, payload trailing
            ps = 1 if (field_idx & 1) == 0 else 2
            payload = bytes([(ps << 4) | 0x04])  # ps(4) flag(1)=0 stop(1) pad
            out += _nal(bytes([0x01, 0x01]) + payload + b"\x80", 0, 6)
            w = BitWriter()
            _ue(w, h.first_mb)
            _ue(w, h.slice_type + (5 if h.all_equal else 0))
            _ue(w, h.pps_id)
            frame_num = (field_idx // 2) % (1 << sps.log2_max_frame_num)
            w.write(frame_num, sps.log2_max_frame_num)
            w.write(1, 1)               # field_pic_flag = 1
            w.write(field_idx & 1, 1)   # bottom_field_flag
            if h.idr:
                _ue(w, (field_idx // 2) & 0xFFFF)  # idr_pic_id per frame
            if sps.poc_type == 0:
                poc_lsb = field_idx % (1 << sps.log2_max_poc_lsb)
                w.write(poc_lsb, sps.log2_max_poc_lsb)
                # no delta_poc_bottom for field pictures
            # copy the remainder of the header + slice data verbatim:
            # everything from ref_pic_list_modification onward parses
            # identically (B direct flag precedes lists in source order)
            r = BitReader(rbsp)
            r.skip(_source_header_prefix_bits(rbsp, h, sps, pps))
            rest_bits = len(rbsp) * 8 - r.pos
            if pps.entropy_coding_mode:
                # slice data is byte-aligned in the source; re-align after
                # the new header and copy whole bytes
                split = h.data_bit_pos
                mid_bits = split - r.pos
                _copy_bits(w, r, mid_bits)       # rest of header
                while w.bit_length() % 8:
                    w.write(1, 1)                # cabac_alignment_one_bit
                src_byte = (split + 7) // 8
                w.byte_align()
                payload = w.getvalue() + rbsp[src_byte:]
                out += _nal(payload, ref_idc, typ)
                field_idx += 1
                continue
            _copy_bits(w, r, rest_bits)
            w.byte_align(fill=0)
            payload = w.getvalue()
            # source trailing bits were copied verbatim (incl. stop bit);
            # byte_align(0) pads with zero bits like trailing_zero_8bits
            out += _nal(payload, ref_idc, typ)
            field_idx += 1
        else:
            out += _nal(nal[1:], ref_idc, typ)
    return bytes(out)


def _source_header_prefix_bits(rbsp: bytes, h, sps, pps) -> int:
    """Bit length of the source slice-header prefix that the rewrite
    replaces: first_mb, slice_type, pps_id, frame_num, [idr_pic_id],
    [poc_lsb (+delta_poc_bottom)].  Everything after is copied."""
    r = BitReader(rbsp)
    r.ue()
    r.ue()
    r.ue()
    r.read(sps.log2_max_frame_num)
    # source is progressive: no field flags
    if h.idr:
        r.ue()
    if sps.poc_type == 0:
        r.read(sps.log2_max_poc_lsb)
        if pps.bottom_field_pic_order_in_frame_present:
            r.se()
    return r.pos


def crafted_cabac_field_stream(qp: int, coeffs64, parity: int = 0) -> bytes:
    """Hand-written CABAC FIELD picture (field_pic_flag=1): one 16x32
    frame whose single field MB is I_NxN/8x8 with `coeffs64` (field
    scan) in block 0.  libavcodec arbitrates the field CABAC context
    blocks (436/451 + field significance map) on the PAFF path."""
    import h264_gen
    from h264_gen import CabacWriter
    from amatsukaze_tpu.video import h264_cabac as HC

    # SPS: high profile, 16x32 frame (1 map unit), frame_mbs_only=0
    w = BitWriter()
    w.write(100, 8)
    w.write(0, 8)
    w.write(30, 8)
    _ue(w, 0)
    _ue(w, 1)
    _ue(w, 0)
    _ue(w, 0)
    w.write(0, 1)
    w.write(0, 1)   # no scaling matrices
    _ue(w, 0)       # log2_max_frame_num_minus4
    _ue(w, 2)       # poc_type 2
    _ue(w, 1)       # max refs
    w.write(0, 1)
    _ue(w, 0)       # width 1 MB
    _ue(w, 0)       # 1 map unit
    w.write(0, 1)   # frame_mbs_only = 0
    w.write(0, 1)   # mbaff = 0 -> PAFF
    w.write(1, 1)   # direct_8x8_inference
    w.write(0, 1)
    w.write(0, 1)
    w.write(1, 1)
    w.byte_align()
    sps = _nal(w.getvalue(), 3, 7)
    pps = h264_gen.pps_nal_cabac()

    out = bytearray(sps + pps)
    for fld in range(2):
        w = BitWriter()
        _ue(w, 0)       # first_mb
        _ue(w, 7)       # slice_type I
        _ue(w, 0)       # pps_id
        w.write(0, 4)   # frame_num
        w.write(1, 1)   # field_pic_flag = 1
        w.write(fld ^ parity, 1)
        _ue(w, 0)       # idr_pic_id (same for both fields of the pair)
        w.write(0, 1)
        w.write(0, 1)
        _se(w, qp - 26)
        _ue(w, 1)       # deblock off
        while w.bit_length() % 8:
            w.write(1, 1)
        states = HC.init_contexts(True, 0, qp)
        c = CabacWriter(states)
        c.decision(3, 0)      # I_NxN
        c.decision(399, 1)    # transform 8x8
        for _ in range(4):
            c.decision(68, 1)  # DC modes
        c.decision(64, 0)      # chroma DC
        co = coeffs64 if fld == 0 else [0] * 64
        cbp_luma = 1 if any(co) else 0
        bits = 0
        for b in range(4):
            ca = 1 if (b & 1) and not (bits & (1 << (b - 1))) else 0
            cb = 1 if (b & 2) and not (bits & (1 << (b - 2))) else 0
            v = cbp_luma if b == 0 else 0
            c.decision(73 + ca + 2 * cb, v)
            bits |= v << b
        c.decision(77, 0)
        if cbp_luma:
            c.decision(60, 0)  # qp_delta 0
            sigpos = [i for i, v in enumerate(co) if v]
            last = sigpos[-1]
            for i in range(min(last + 1, 63)):
                s = 1 if co[i] else 0
                c.decision(436 + HC.SIG_COEFF_8x8_FIELD[i], s)
                if s:
                    c.decision(451 + HC.LAST_COEFF_8x8[i],
                               1 if i == last else 0)
                    if i == last:
                        break
            # significance at the final scan position is inferred
            num_eq1 = num_gt1 = 0
            for pos in reversed(sigpos):
                lv = abs(co[pos])
                ctx0 = 0 if num_gt1 else min(4, 1 + num_eq1)
                if lv == 1:
                    c.decision(426 + ctx0, 0)
                else:
                    c.decision(426 + ctx0, 1)
                    ctxn = 426 + 5 + min(4, num_gt1)
                    for _ in range(min(lv, 15) - 2):
                        c.decision(ctxn, 1)
                    if lv < 15:
                        c.decision(ctxn, 0)
                if lv > 1:
                    num_gt1 += 1
                else:
                    num_eq1 += 1
                c.bypass(1 if co[pos] < 0 else 0)
        c.terminate(1)
        acc = bytearray(w.getvalue())
        cur = nb = 0
        for bit in c.bits:
            cur = (cur << 1) | bit
            nb += 1
            if nb == 8:
                acc.append(cur)
                cur = nb = 0
        if nb:
            acc.append(cur << (8 - nb))
        out += _nal(bytes(acc), 3, 5)
    return bytes(out)


# ---------------------------------------------------------------------------
# Hand-written CAVLC PAFF streams with P and B FIELD pictures.
#
# The re-heading trick (rewrite_to_paff) cannot express B fields: with
# B frames the source decode order no longer pairs consecutive pictures
# into frames.  These streams are written bit by bit instead — I_PCM
# anchor fields for texture, then pure-MC P/B fields (cbp 0) so only
# the untested PICTURE-LEVEL machinery matters: field reference list
# construction (8.2.4.2.5 parity alternation), implicit bi-prediction
# weights from field POCs, spatial AND temporal direct in coded fields,
# cross-parity chroma MV adjustment and field deblocking on B edges.
# libavcodec arbitrates every case (tests/test_h264_paff.py TestPaffB).
# ---------------------------------------------------------------------------

def _cavlc_field_sps() -> bytes:
    """Main profile, 32x64 frame (2x2 MBs per field), poc_type 0,
    frame_mbs_only=0 / mbaff=0."""
    w = BitWriter()
    w.write(77, 8)
    w.write(0, 8)
    w.write(30, 8)
    _ue(w, 0)       # sps_id
    _ue(w, 0)       # log2_max_frame_num_minus4 -> 4 bits
    _ue(w, 0)       # poc_type 0
    _ue(w, 2)       # log2_max_poc_lsb_minus4 -> 6 bits
    _ue(w, 4)       # max_num_ref_frames
    w.write(0, 1)   # gaps_in_frame_num_allowed
    _ue(w, 1)       # pic_width_in_mbs_minus1 -> 32 px
    _ue(w, 1)       # pic_height_in_map_units_minus1 -> 2 units
    w.write(0, 1)   # frame_mbs_only = 0
    w.write(0, 1)   # mbaff = 0 -> PAFF
    w.write(1, 1)   # direct_8x8_inference
    w.write(0, 1)   # no cropping
    w.write(0, 1)   # no VUI
    w.write(1, 1)   # stop bit
    w.byte_align()
    return _nal(w.getvalue(), 3, 7)


def _cavlc_field_pps(weighted_bipred_idc=0) -> bytes:
    w = BitWriter()
    _ue(w, 0)       # pps_id
    _ue(w, 0)       # sps_id
    w.write(0, 1)   # entropy_coding_mode = CAVLC
    w.write(0, 1)   # bottom_field_pic_order_in_frame_present
    _ue(w, 0)       # num_slice_groups_minus1
    _ue(w, 1)       # num_ref_idx_l0_default_active_minus1
    _ue(w, 0)       # num_ref_idx_l1_default_active_minus1
    w.write(0, 1)   # weighted_pred_flag
    w.write(weighted_bipred_idc, 2)
    _se(w, 0)       # pic_init_qp_minus26
    _se(w, 0)       # pic_init_qs_minus26
    _se(w, 0)       # chroma_qp_index_offset
    w.write(1, 1)   # deblocking_filter_control_present
    w.write(0, 1)   # constrained_intra
    w.write(0, 1)   # redundant_pic_cnt_present
    w.write(1, 1)   # stop bit
    w.byte_align()
    return _nal(w.getvalue(), 3, 8)


def _te(w: BitWriter, v: int, cap: int) -> None:
    if cap <= 0:
        return
    if cap == 1:
        w.write(1 - v, 1)
    else:
        _ue(w, v)


def _field_slice_nal(slice_type, fn, bottom, poc_lsb, qp, mbs, *,
                     idr=False, idr_pic_id=0, ref=True, n_ref=(1, 1),
                     direct_spatial=1, deblock=False) -> bytes:
    """One coded-field slice.  `mbs` is a list of 4 MB specs:
    I slice: ("pcm", y256, u64, v64); P: ("l0", ref, (mvx, mvy)) or
    ("skip",); B: ("dir",) / ("skip",) / ("l0"|"l1", ref, mv) /
    ("bi", ref0, ref1, mv0, mv1)."""
    w = BitWriter()
    _ue(w, 0)                  # first_mb
    _ue(w, slice_type + 5)     # all-equal form
    _ue(w, 0)                  # pps_id
    w.write(fn, 4)
    w.write(1, 1)              # field_pic_flag
    w.write(bottom, 1)
    if idr:
        _ue(w, idr_pic_id)
    w.write(poc_lsb, 6)
    if slice_type == 1:        # B
        w.write(direct_spatial, 1)
    if slice_type in (0, 1):
        w.write(1, 1)          # num_ref_idx_override
        _ue(w, n_ref[0] - 1)
        if slice_type == 1:
            _ue(w, n_ref[1] - 1)
        w.write(0, 1)          # no RPLM l0
        if slice_type == 1:
            w.write(0, 1)      # no RPLM l1
    if ref:
        if idr:
            w.write(0, 1)      # no_output_of_prior_pics
            w.write(0, 1)      # long_term_reference_flag
        else:
            w.write(0, 1)      # adaptive_ref_pic_marking = 0
    _se(w, qp - 26)
    if deblock:
        _ue(w, 0)
        _se(w, 0)
        _se(w, 0)
    else:
        _ue(w, 1)              # disable deblocking
    skip_run = 0
    for mb in mbs:
        kind = mb[0]
        if kind == "skip":
            skip_run += 1
            continue
        if slice_type in (0, 1):
            _ue(w, skip_run)
            skip_run = 0
        if kind == "pcm":
            _ue(w, 25)         # I_PCM
            w.byte_align()
            for plane in mb[1:]:
                for s in plane:
                    w.write(int(s), 8)
            continue
        if kind == "dir":
            _ue(w, 0)          # B_Direct_16x16
            _ue(w, 0)          # cbp 0 (inter code 0)
            continue
        if kind == "l0":
            _ue(w, 0 if slice_type == 0 else 1)
            _te(w, mb[1], n_ref[0] - 1)
            _se(w, mb[2][0])
            _se(w, mb[2][1])
        elif kind == "l1":
            _ue(w, 2)
            _te(w, mb[1], n_ref[1] - 1)
            _se(w, mb[2][0])
            _se(w, mb[2][1])
        else:  # bi
            _ue(w, 3)
            _te(w, mb[1], n_ref[0] - 1)
            _te(w, mb[2], n_ref[1] - 1)
            _se(w, mb[3][0])
            _se(w, mb[3][1])
            _se(w, mb[4][0])
            _se(w, mb[4][1])
        _ue(w, 0)              # cbp 0
    if slice_type in (0, 1) and skip_run:
        _ue(w, skip_run)
    w.write(1, 1)              # stop bit
    w.byte_align()
    ref_idc = 0 if not ref else (3 if idr else 2)
    return _nal(w.getvalue(), ref_idc, 5 if idr else 1)


def crafted_b_field_stream(seed=0, *, direct_spatial=1, implicit=False,
                           deblock=False, parity0=0, qp=27) -> bytes:
    """PAFF sequence IDR pair -> P pair -> P pair -> non-ref B pair
    (displayed between the P pairs), pure-MC P/B fields over I_PCM
    anchors.  Every B shape in one stream: direct (spatial or temporal
    per `direct_spatial`), skip, L0/L1-only, Bi (implicit weighting
    when `implicit`), cross-parity references, odd vertical MVs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = bytearray(_cavlc_field_sps()
                    + _cavlc_field_pps(2 if implicit else 0))

    def pcm_mbs():
        return [("pcm", rng.integers(16, 236, 256),
                 rng.integers(16, 236, 64), rng.integers(16, 236, 64))
                for _ in range(4)]

    def mv():
        return (int(rng.integers(-21, 22)), int(rng.integers(-21, 22)))

    # anchor pair: IDR first field + NON-IDR I second field (an IDR
    # access unit starts a new CVS, so the second field of the frame
    # must be non-IDR -- 7.4.1.2.4; libavcodec resets the first field's
    # reference marks if both fields are IDR NALs)
    out += _field_slice_nal(2, 0, parity0, 0, qp, pcm_mbs(),
                            idr=True, deblock=deblock)
    out += _field_slice_nal(2, 0, 1 - parity0, 1, qp, pcm_mbs(),
                            deblock=deblock)
    for k in range(2):   # P pair 1: refs = IDR fields (both parities)
        mbs = [("l0", 0, mv()), ("l0", 1, mv()), ("skip",),
               ("l0", 0, (5, 7))]
        out += _field_slice_nal(0, 1, k ^ parity0, 8 + k, qp, mbs,
                                n_ref=(2, 1), deblock=deblock)
    for k in range(2):   # P pair 2: 4 ref fields live
        mbs = [("l0", int(rng.integers(0, 4)), mv()) for _ in range(3)]
        mbs.append(("l0", 2, (-9, 3)))
        out += _field_slice_nal(0, 2, k ^ parity0, 16 + k, qp, mbs,
                                n_ref=(4, 1), deblock=deblock)
    for k in range(2):   # non-ref B pair displayed between the P pairs
        mbs = [("dir",), ("bi", int(rng.integers(0, 3)), 0, mv(), mv()),
               ("l1", 0, mv()), ("skip",) if k else ("l0", 1, mv())]
        out += _field_slice_nal(1, 3, k ^ parity0, 12 + k, qp, mbs,
                                ref=False, n_ref=(3, 1),
                                direct_spatial=direct_spatial,
                                deblock=deblock)
    return bytes(out)
