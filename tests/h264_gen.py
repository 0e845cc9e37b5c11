"""Minimal hand-rolled H.264 (CAVLC) bitstream writer for tests.

Crafts tiny conformant I-frame streams with *chosen* residual
coefficients so the exact dequant/IDCT arithmetic of a real decoder
(system libavcodec via the bridge) can be probed coefficient by
coefficient, and so the in-build decoder's CAVLC tables round-trip
(write -> decode). Counterpart of tests/mpeg2_enc.py for MPEG-2.

Only what the probes need: baseline I frames, I_NxN with all-DC
prediction modes or I_16x16 DC, single coded 8x8 / DC blocks, 4:2:0.
"""

from __future__ import annotations

from amatsukaze_tpu.utils.bits import BitWriter
from amatsukaze_tpu.video import h264_tables as T
from amatsukaze_tpu.video import h264_ref as HR


def _ue(w: BitWriter, v: int) -> None:
    n = v + 1
    nb = n.bit_length()
    w.write(0, nb - 1)
    w.write(n, nb)


def _se(w: BitWriter, v: int) -> None:
    _ue(w, 2 * v - 1 if v > 0 else -2 * v)


def _trailing(w: BitWriter) -> None:
    w.write(1, 1)
    w.byte_align()


def _nal(rbsp: bytes, ref_idc: int, typ: int) -> bytes:
    out = bytearray(b"\x00\x00\x00\x01")
    out.append((ref_idc << 5) | typ)
    i = 0
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def sps_nal(mb_w: int, mb_h: int, profile: int = 66) -> bytes:
    w = BitWriter()
    w.write(profile, 8)  # 66 baseline / 100 high
    w.write(0xC0 if profile == 66 else 0, 8)  # constraint flags
    w.write(30, 8)   # level
    _ue(w, 0)        # sps_id
    if profile == 100:
        _ue(w, 1)    # chroma_format_idc 4:2:0
        _ue(w, 0)    # bit_depth_luma_minus8
        _ue(w, 0)    # bit_depth_chroma_minus8
        w.write(0, 1)  # qpprime_y_zero_transform_bypass
        w.write(0, 1)  # seq_scaling_matrix_present
    _ue(w, 0)        # log2_max_frame_num_minus4
    _ue(w, 2)        # poc_type 2
    _ue(w, 1)        # max_num_ref_frames
    w.write(0, 1)    # gaps_in_frame_num
    _ue(w, mb_w - 1)
    _ue(w, mb_h - 1)
    w.write(1, 1)    # frame_mbs_only
    w.write(1, 1)    # direct_8x8_inference
    w.write(0, 1)    # frame_cropping
    w.write(0, 1)    # vui
    _trailing(w)
    return _nal(w.getvalue(), 3, 7)


def pps_nal(transform_8x8: bool = False) -> bytes:
    w = BitWriter()
    _ue(w, 0)        # pps_id
    _ue(w, 0)        # sps_id
    w.write(0, 1)    # entropy_coding_mode (CAVLC)
    w.write(0, 1)    # bottom_field_pic_order_in_frame_present
    _ue(w, 0)        # num_slice_groups_minus1
    _ue(w, 0)        # num_ref_idx_l0_default_active_minus1
    _ue(w, 0)        # num_ref_idx_l1_default_active_minus1
    w.write(0, 1)    # weighted_pred
    w.write(0, 2)    # weighted_bipred_idc
    _se(w, 0)        # pic_init_qp_minus26
    _se(w, 0)        # pic_init_qs_minus26
    _se(w, 0)        # chroma_qp_index_offset
    w.write(1, 1)    # deblocking_filter_control_present
    w.write(0, 1)    # constrained_intra_pred
    w.write(0, 1)    # redundant_pic_cnt_present
    if transform_8x8:
        w.write(1, 1)  # transform_8x8_mode_flag
        w.write(0, 1)  # pic_scaling_matrix_present
        _se(w, 0)      # second_chroma_qp_index_offset
    _trailing(w)
    return _nal(w.getvalue(), 3, 8)


# -- CAVLC block encoding ----------------------------------------------------

def _inv(table):
    d, _ = table
    return {v: k for k, v in d.items()}

_INV_COEFF_TOKEN = [_inv(t) for t in HR._COEFF_TOKEN]
_INV_COEFF_TOKEN_CDC = _inv(HR._COEFF_TOKEN_CHROMA_DC)
_INV_TOTAL_ZEROS = [_inv(t) for t in HR._TOTAL_ZEROS]
_INV_TOTAL_ZEROS_CDC = [_inv(t) for t in HR._TOTAL_ZEROS_CHROMA_DC]
_INV_RUN_BEFORE = [_inv(t) for t in HR._RUN_BEFORE]


def write_cavlc_block(w: BitWriter, coeffs, nc: int, max_coeff: int) -> int:
    """Encode one residual block (coeffs in scan order). Returns total_coeff."""
    nz = [(i, c) for i, c in enumerate(coeffs) if c]
    tc = len(nz)
    # trailing ones: consecutive |c|==1 at the high-frequency end, max 3
    t1 = 0
    for _, c in reversed(nz):
        if abs(c) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    if nc >= 0:
        cls = 0 if nc < 2 else 1 if nc < 4 else 2 if nc < 8 else 3
        ln, bits = _INV_COEFF_TOKEN[cls][(tc, t1)]
    else:
        ln, bits = _INV_COEFF_TOKEN_CDC[(tc, t1)]
    w.write(bits, ln)
    if tc == 0:
        return 0
    # levels, highest frequency first
    levels = [c for _, c in reversed(nz)]
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i, lv in enumerate(levels):
        if i < t1:
            w.write(0 if lv > 0 else 1, 1)
            continue
        lcode = 2 * lv - 2 if lv > 0 else -2 * lv - 1
        if i == t1 and t1 < 3:
            lcode -= 2
        if suffix_len == 0:
            if lcode < 14:
                w.write(1, lcode + 1)            # lcode zeros then a 1
            elif lcode < 30:
                w.write(1, 15)                   # prefix 14
                w.write(lcode - 14, 4)
            else:
                lc = lcode - 30
                prefix = 15
                while lc >= (1 << (prefix - 3)):
                    lc -= 1 << (prefix - 3)
                    prefix += 1
                w.write(1, prefix + 1)
                w.write(lc, prefix - 3)
        else:
            prefix = lcode >> suffix_len
            if prefix < 15:
                w.write(1, prefix + 1)
                w.write(lcode & ((1 << suffix_len) - 1), suffix_len)
            else:
                lc = lcode - (15 << suffix_len)
                prefix = 15
                while lc >= (1 << (prefix - 3)):
                    lc -= 1 << (prefix - 3)
                    prefix += 1
                w.write(1, prefix + 1)
                w.write(lc, prefix - 3)
        if suffix_len == 0:
            suffix_len = 1
        if abs(lv) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    total_zeros = nz[-1][0] + 1 - tc
    if tc < max_coeff:
        if nc == -1:
            ln, bits = _INV_TOTAL_ZEROS_CDC[tc - 1][total_zeros]
        else:
            ln, bits = _INV_TOTAL_ZEROS[tc - 1][total_zeros]
        w.write(bits, ln)
    # run_before, highest first
    zeros_left = total_zeros
    positions = [i for i, _ in reversed(nz)]
    for k in range(tc - 1):
        if zeros_left <= 0:
            break
        run = positions[k] - positions[k + 1] - 1
        ln, bits = _INV_RUN_BEFORE[min(zeros_left, 7) - 1][run]
        w.write(bits, ln)
        zeros_left -= run
    return tc


_INV_CBP_I4 = {v: i for i, v in enumerate(T.GOLOMB_TO_INTRA4X4_CBP)}


def islice_nal(mb_w: int, mb_h: int, qp: int, mb0,
               transform_8x8: bool = False) -> bytes:
    """IDR slice: MB 0 per `mb0` descriptor, remaining MBs empty I_NxN DC.

    mb0 keys:
      'luma_blocks': {z_idx: scan coeffs (16)}  -> I_NxN, cbp covers them
      'i16_dc': scan coeffs (16)                -> I_16x16 DC-mode luma DC
      'chroma_dc': (cb_coeffs4, cr_coeffs4)     -> chroma DC probe
      'chroma_ac': {(comp, blk): coeffs15}      -> chroma AC probe
    """
    w = BitWriter()
    _ue(w, 0)          # first_mb_in_slice
    _ue(w, 7)          # slice_type I (all)
    _ue(w, 0)          # pps_id
    w.write(0, 4)      # frame_num (log2 max = 4)
    _ue(w, 0)          # idr_pic_id
    w.write(0, 1)      # no_output_of_prior_pics
    w.write(0, 1)      # long_term_reference_flag
    _se(w, qp - 26)    # slice_qp_delta
    _ue(w, 1)          # disable_deblocking_filter_idc = 1 (off)
    n_mbs = mb_w * mb_h
    nnz = {}           # (gx, gy) -> tc, luma grid
    cnnz = {}          # (comp, cx, cy) -> tc

    def luma_nc(gx, gy, mb_first_x):
        a = nnz.get((gx - 1, gy)) if gx > mb_first_x * 0 and gx - 1 >= 0 else None
        b = nnz.get((gx, gy - 1)) if gy - 1 >= 0 else None
        if a is not None and b is not None:
            return (a + b + 1) >> 1
        if a is not None:
            return a
        if b is not None:
            return b
        return 0

    for mb in range(n_mbs):
        desc = mb0 if mb == 0 else {}
        mbx, mby = mb % mb_w, mb // mb_w
        if "i16_dc" in desc:
            # I_16x16, pred DC (2), cbp_luma 0, cbp_chroma 0 -> mb_type 3
            _ue(w, 3)
            _ue(w, 0)  # chroma DC pred
            _se(w, 0)  # mb_qp_delta
            write_cavlc_block(w, desc["i16_dc"], 0, 16)
            for b in range(16):
                pass  # no AC blocks (cbp_luma 0)
        else:
            _ue(w, 0)  # I_NxN
            tf8 = 0
            if transform_8x8:
                tf8 = 1 if "luma8_blocks" in desc else 0
                w.write(tf8, 1)  # transform_size_8x8_flag
            for _ in range(4 if tf8 else 16):
                w.write(1, 1)  # prev_intra_pred_mode_flag -> predicted (DC)
            _ue(w, 0)  # chroma DC pred
            blocks = desc.get("luma_blocks", {})
            blocks8 = desc.get("luma8_blocks", {})
            cbp_luma = 0
            for z in blocks:
                cbp_luma |= 1 << (z >> 2)
            for b in blocks8:
                cbp_luma |= 1 << b
            cbp_chroma = 0
            if "chroma_dc" in desc:
                cbp_chroma = 1
            if "chroma_ac" in desc:
                cbp_chroma = 2
            cbp = cbp_luma | (cbp_chroma << 4)
            _ue(w, _INV_CBP_I4[cbp])
            if cbp:
                _se(w, 0)  # mb_qp_delta
            gx0, gy0 = mbx * 4, mby * 4
            if tf8:
                for b in range(4):
                    if not (cbp_luma & (1 << b)):
                        continue
                    scan64 = blocks8.get(b, [0] * 64)
                    for i in range(4):
                        z = 4 * b + i
                        x4, y4 = HR._Z_TO_XY[z]
                        gx, gy = gx0 + x4, gy0 + y4
                        sub = [scan64[4 * k + i] for k in range(16)]
                        nc = luma_nc(gx, gy, mbx)
                        tc = write_cavlc_block(w, sub, nc, 16)
                        nnz[(gx, gy)] = tc
            else:
                for z in range(16):
                    if not (cbp_luma & (1 << (z >> 2))):
                        continue
                    x4, y4 = HR._Z_TO_XY[z]
                    gx, gy = gx0 + x4, gy0 + y4
                    nc = luma_nc(gx, gy, mbx)
                    tc = write_cavlc_block(w, blocks.get(z, [0] * 16), nc, 16)
                    nnz[(gx, gy)] = tc
            if cbp_chroma:
                cdc = desc.get("chroma_dc", ([0] * 4, [0] * 4))
                for comp in range(2):
                    write_cavlc_block(w, cdc[comp], -1, 4)
            if cbp_chroma & 2:
                cac = desc.get("chroma_ac", {})
                for comp in range(2):
                    for b in range(4):
                        cx = mbx * 2 + (b & 1)
                        cy = mby * 2 + (b >> 1)
                        a = cnnz.get((comp, cx - 1, cy))
                        bb = cnnz.get((comp, cx, cy - 1))
                        nc = ((a + bb + 1) >> 1 if a is not None and bb is not None
                              else a if a is not None else bb if bb is not None
                              else 0)
                        tc = write_cavlc_block(
                            w, cac.get((comp, b), [0] * 15), nc, 15)
                        cnnz[(comp, cx, cy)] = tc
    _trailing(w)
    return _nal(w.getvalue(), 3, 5)


def make_stream(mb_w: int, mb_h: int, qp: int, mb0,
                transform_8x8: bool = False) -> bytes:
    profile = 100 if transform_8x8 else 66
    return (sps_nal(mb_w, mb_h, profile) + pps_nal(transform_8x8)
            + islice_nal(mb_w, mb_h, qp, mb0, transform_8x8))
