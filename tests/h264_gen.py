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


def sps_nal(mb_w: int, mb_h: int, profile: int = 66,
            max_refs: int = 1) -> bytes:
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
    _ue(w, max_refs)  # max_num_ref_frames
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


# -- CABAC bitstream writer (9.3.4) -----------------------------------------

from amatsukaze_tpu.video import h264_cabac as HC


class CabacWriter:
    """Arithmetic encoding engine (9.3.4.1) mirroring h264_cabac's decoder;
    crafted CABAC streams let libavcodec arbitrate every ctx choice."""

    def __init__(self, states):
        self.ctx = states
        self.low = 0
        self.range_ = 510
        self.first = True
        self.outstanding = 0
        self.bits = []

    def _put(self, b):
        if self.first:
            self.first = False
        else:
            self.bits.append(b)
        while self.outstanding:
            self.bits.append(1 - b)
            self.outstanding -= 1

    def _renorm(self):
        while self.range_ < 256:
            if self.low >= 512:
                self._put(1)
                self.low -= 512
            elif self.low < 256:
                self._put(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.low <<= 1
            self.range_ <<= 1

    def decision(self, idx, b):
        st = self.ctx[idx]
        pstate = st[0]
        lps = T.RANGE_LPS[4 * pstate + ((self.range_ >> 6) & 3)]
        self.range_ -= lps
        if b != st[1]:
            self.low += self.range_
            self.range_ = lps
            if pstate == 0:
                st[1] = 1 - st[1]
            st[0] = T.TRANS_IDX_LPS[pstate]
        else:
            st[0] = T.TRANS_IDX_MPS[pstate]
        self._renorm()

    def bypass(self, b):
        self.low <<= 1
        if b:
            self.low += self.range_
        if self.low >= 1024:
            self._put(1)
            self.low -= 1024
        elif self.low < 512:
            self._put(0)
        else:
            self.outstanding += 1
            self.low -= 512
        # range unchanged

    def terminate(self, b):
        self.range_ -= 2
        if b:
            self.low += self.range_
            # EncodeFlush
            self.range_ = 2
            self._renorm()
            self._put((self.low >> 9) & 1)
            self.bits.append((self.low >> 8) & 1)
            self.bits.append(1)
        else:
            self._renorm()


def cabac_islice_i8(qp: int, blocks8: dict, modes=None, mb_w=1, mb_h=1):
    """Single-slice IDR with mb_w*mb_h I_NxN/8x8 MBs; MB 0 takes `blocks8`
    ({b: 64 scan coeffs}) and `modes` (4 intra8x8 modes, default DC);
    other MBs are empty I8 (all-DC, cbp 0)."""
    w = BitWriter()
    _ue(w, 0)          # first_mb_in_slice
    _ue(w, 7)          # slice_type I (all)
    _ue(w, 0)          # pps_id
    w.write(0, 4)      # frame_num
    _ue(w, 0)          # idr_pic_id
    w.write(0, 1)      # no_output_of_prior_pics
    w.write(0, 1)      # long_term_reference_flag
    _se(w, qp - 26)    # slice_qp_delta
    _ue(w, 1)          # disable_deblocking (off)
    # cabac_alignment_one_bit
    while w.bit_length() % 8:
        w.write(1, 1)
    states = HC.init_contexts(True, 0, qp)
    c = CabacWriter(states)
    n_mbs = mb_w * mb_h
    mb_tf8 = {}
    mb_cbp = {}
    for mb in range(n_mbs):
        mbx, mby = mb % mb_w, mb // mb_w
        blocks = blocks8 if mb == 0 else {}
        mods = (modes if mb == 0 and modes else [2, 2, 2, 2])
        # mb_type I_NxN: bin0 = 0; ctx 3 + cond (neighbours I16/PCM: none)
        c.decision(3, 0)
        # transform_size_8x8_flag = 1
        tctx = 399
        if mbx > 0 and mb_tf8.get((mbx - 1, mby)):
            tctx += 1
        if mby > 0 and mb_tf8.get((mbx, mby - 1)):
            tctx += 1
        c.decision(tctx, 1)
        # four intra8x8 modes; neighbour-pred: all MBs store per-4x4 modes
        # (DC default). We only support the "most probable or explicit" path
        # with DC-neighbours for simplicity when crafting.
        for b, m in enumerate(mods):
            bx, by = (b & 1) * 2, (b >> 1) * 2
            # pred mode = 2 unless left/top blocks set non-DC modes; crafted
            # streams keep neighbours DC so pred == 2 (and mode 2 -> flag 1)
            pred = 2
            if m == pred:
                c.decision(68, 1)
            else:
                c.decision(68, 0)
                rem = m if m < pred else m - 1
                c.decision(69, rem & 1)
                c.decision(69, (rem >> 1) & 1)
                c.decision(69, (rem >> 2) & 1)
        # chroma mode 0: bin0 = 0, ctx 64 + cond (nbr chroma mode != 0: none)
        c.decision(64, 0)
        # cbp: luma bits, chroma 0
        cbp_luma = 0
        for b in blocks:
            cbp_luma |= 1 << b
        bits = 0
        for b in range(4):
            # condTerm: neighbour 8x8 cbp bit == 0 -> 1
            if b & 1:
                ca = 1 if not (bits & (1 << (b - 1))) else 0
            elif mbx > 0:
                ca = 1 if not (mb_cbp.get((mbx - 1, mby), 0) & (1 << (b + 1))) else 0
            else:
                ca = 0
            if b & 2:
                cb = 1 if not (bits & (1 << (b - 2))) else 0
            elif mby > 0:
                cb = 1 if not (mb_cbp.get((mbx, mby - 1), 0) & (1 << (b + 2))) else 0
            else:
                cb = 0
            v = (cbp_luma >> b) & 1
            c.decision(73 + ca + 2 * cb, v)
            bits |= v << b
        c.decision(77, 0)  # cbp chroma bin0 = 0 (no neighbours with chroma)
        mb_tf8[(mbx, mby)] = 1
        mb_cbp[(mbx, mby)] = cbp_luma
        if cbp_luma:
            c.decision(60, 0)  # mb_qp_delta = 0
        # residual cat5 per coded 8x8
        for b in range(4):
            if not (cbp_luma & (1 << b)):
                continue
            co = blocks[b]
            sigpos = [i for i, v in enumerate(co) if v]
            last = sigpos[-1]
            for i in range(63):
                if i > last:
                    break
                s = 1 if co[i] else 0
                c.decision(402 + HC.SIG_COEFF_8x8[i], s)
                if s:
                    c.decision(417 + HC.LAST_COEFF_8x8[i], 1 if i == last else 0)
                    if i == last:
                        break
            # levels, reverse scan
            num_eq1 = num_gt1 = 0
            for pos in reversed(sigpos):
                lv = abs(co[pos])
                ctx0 = 0 if num_gt1 else min(4, 1 + num_eq1)
                if lv == 1:
                    c.decision(426 + ctx0, 0)
                else:
                    c.decision(426 + ctx0, 1)
                    ctxn = 426 + 5 + min(4, num_gt1)
                    k = lv
                    for _ in range(min(k, 15) - 2):
                        c.decision(ctxn, 1)
                    if k < 15:
                        c.decision(ctxn, 0)
                    else:
                        # UEG0 suffix
                        suf = k - 15
                        kk = 0
                        while suf >= (1 << kk):
                            c.bypass(1)
                            suf -= 1 << kk
                            kk += 1
                        c.bypass(0)
                        while kk:
                            kk -= 1
                            c.bypass((suf >> kk) & 1)
                if lv > 1:
                    num_gt1 += 1
                else:
                    num_eq1 += 1
                c.bypass(1 if co[pos] < 0 else 0)
        c.terminate(1 if mb == n_mbs - 1 else 0)
    data = w.getvalue()
    # append cabac bits
    acc = bytearray(data)
    cur = 0
    nb = 0
    for bit in c.bits:
        cur = (cur << 1) | bit
        nb += 1
        if nb == 8:
            acc.append(cur)
            cur = 0
            nb = 0
    if nb:
        acc.append(cur << (8 - nb))
    return _nal(bytes(acc), 3, 5)


def make_cabac_stream(qp: int, blocks8: dict, modes=None,
                      mb_w=1, mb_h=1) -> bytes:
    sps = sps_nal(mb_w, mb_h, 100)
    pps = pps_nal_cabac()
    return sps + pps + cabac_islice_i8(qp, blocks8, modes, mb_w, mb_h)


def pps_nal_cabac() -> bytes:
    w = BitWriter()
    _ue(w, 0)
    _ue(w, 0)
    w.write(1, 1)    # entropy_coding_mode = CABAC
    w.write(0, 1)
    _ue(w, 0)
    _ue(w, 0)
    _ue(w, 0)
    w.write(0, 1)
    w.write(0, 2)
    _se(w, 0)
    _se(w, 0)
    _se(w, 0)
    w.write(1, 1)
    w.write(0, 1)
    w.write(0, 1)
    w.write(1, 1)    # transform_8x8_mode_flag
    w.write(0, 1)    # pic_scaling_matrix_present
    _se(w, 0)        # second_chroma_qp_index_offset
    _trailing(w)
    return _nal(w.getvalue(), 3, 8)


def cabac_pslice_stream(qp: int, mbs: dict, mb_w=4, mb_h=4,
                        num_ref=1, n_lead_p=0) -> bytes:
    """I frame (flat, all-I16 DC, no residual) + P frame with crafted MBs.

    mbs: {mb_idx: desc}; desc keys:
      'skip': True
      'type': 0..4 P mb_type (16x16/16x8/8x16/8x8/8x8ref0)
      'sub': [4 sub_mb_types] for type 3/4
      'refs': [ref_idx per partition/8x8]
      'mvds': [(mvdx, mvdy) per partition (or per sub-partition, in order)]
      'blocks': {z: [16 coeffs]} 4x4 residual, or 'blocks8': {b: [64]}
    Undescribed MBs are skipped. The reference frame is flat 128 so expected
    P pixels = clip(128 + residual).
    """
    HRm = HR
    sps = sps_nal(mb_w, mb_h, 100, max_refs=max(1, num_ref))
    pps = pps_nal_cabac()
    # I frame: all I16x16 DC, cbp 0 -> flat (DC pred unavailable -> 128)
    w = BitWriter()
    _ue(w, 0); _ue(w, 7); _ue(w, 0)
    w.write(0, 4)
    _ue(w, 0)
    w.write(0, 1); w.write(0, 1)
    _se(w, qp - 26)
    _ue(w, 1)
    while w.bit_length() % 8:
        w.write(1, 1)
    states = HC.init_contexts(True, 0, qp)
    c = CabacWriter(states)
    n_mbs = mb_w * mb_h
    for mb in range(n_mbs):
        mbx, mby = mb % mb_w, mb // mb_w
        # mb_type I16x16 cbp0 pred DC = value 1: bin0(ctx 3+cond)=1,
        # terminate(0), then suffix bins: cbp_luma(0), cbp_chroma(0),
        # pred bits (DC=2: bit1=1, bit0=0)
        ctx = 0
        if mbx > 0:
            ctx += 1
        if mby > 0:
            ctx += 1
        c.decision(3 + ctx, 1)
        c.terminate(0)
        c.decision(6, 0)         # cbp_luma part: 1? I16 k: cbp_luma 0
        c.decision(7, 0)         # cbp_chroma bin0 = 0
        c.decision(9, 1)         # pred mode bit1 (DC=2 -> binary 10)
        c.decision(10, 0)        # pred mode bit0
        # chroma pred mode 0
        cctx = 0
        if mbx > 0:
            cctx += 1  # left chroma mode... all 0 -> no; keep 0
        c.decision(64, 0)
        # I16: mb_qp_delta always
        c.decision(60, 0)
        # luma DC residual: cbf(cat0) = 0
        inc = 0
        if mbx > 0:
            inc += 1   # left is I16 with DC cbf 0 -> 0... keep rule: cbf=0 -> 0
        # careful: cbf ctx condTerm for unavailable nbr with intra cur = 1
        ca = 1 if mbx == 0 else 0
        cb = 1 if mby == 0 else 0
        c.decision(85 + 0 + ca + 2 * cb, 0)
        c.terminate(1 if mb == n_mbs - 1 else 0)
    data = bytearray(w.getvalue())
    cur = nb = 0
    for bit in c.bits:
        cur = (cur << 1) | bit; nb += 1
        if nb == 8: data.append(cur); cur = 0; nb = 0
    if nb: data.append(cur << (8 - nb))
    islice = _nal(bytes(data), 3, 5)

    slices = []
    for pi in range(n_lead_p + 1):
        fnum = 1 + pi
        crafted = mbs if pi == n_lead_p else {}
        nref = num_ref if pi == n_lead_p else 1
        slices.append(_write_cabac_pslice(qp, crafted, mb_w, mb_h, nref, fnum))
    return sps + pps + islice + b"".join(slices)


def _write_cabac_pslice(qp, mbs, mb_w, mb_h, num_ref, frame_num):
    HRm = HR
    n_mbs = mb_w * mb_h
    w = BitWriter()
    _ue(w, 0)
    _ue(w, 5)          # slice_type P (all)
    _ue(w, 0)
    w.write(frame_num & 15, 4)  # frame_num
    if num_ref != 1:
        w.write(1, 1)  # num_ref_idx_override
        _ue(w, num_ref - 1)
    else:
        w.write(0, 1)
    w.write(0, 1)      # ref_pic_list_modification_flag
    w.write(0, 1)      # adaptive_ref_pic_marking
    _ue(w, 0)          # cabac_init_idc
    _se(w, qp - 26)
    _ue(w, 1)          # deblocking off
    while w.bit_length() % 8:
        w.write(1, 1)
    states = HC.init_contexts(False, 0, qp)
    c = CabacWriter(states)
    # writer-side neighbour state
    skipmap = {}
    typemap = {}
    cbpmap = {}
    tf8map = {}
    mvdmap = {}   # (gx,gy) -> (mvdx,mvdy)
    refmap = {}   # (gx,gy) -> ref
    cbfy = {}     # (gx,gy) -> 0/1
    P_GEOM = {0: (("16x16", 0, 0, 4, 4),),
              1: (("16x8", 0, 0, 4, 2), ("16x8", 0, 2, 4, 2)),
              2: (("8x16", 0, 0, 2, 4), ("8x16", 2, 0, 2, 4))}
    SUBG = {0: ((0, 0, 2, 2),), 1: ((0, 0, 2, 1), (0, 1, 2, 1)),
            2: ((0, 0, 1, 2), (1, 0, 1, 2)),
            3: ((0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1), (1, 1, 1, 1))}
    for mb in range(n_mbs):
        mbx, mby = mb % mb_w, mb // mb_w
        desc = mbs.get(mb, {"skip": True})
        # mb_skip_flag
        sctx = 11
        if mbx > 0 and not skipmap.get((mbx - 1, mby)):
            sctx += 1
        if mby > 0 and not skipmap.get((mbx, mby - 1)):
            sctx += 1
        if desc.get("skip"):
            c.decision(sctx, 1)
            skipmap[(mbx, mby)] = 1
            typemap[(mbx, mby)] = 0
            cbpmap[(mbx, mby)] = 0
            for dy in range(4):
                for dx in range(4):
                    mvdmap[(mbx * 4 + dx, mby * 4 + dy)] = (0, 0)
                    refmap[(mbx * 4 + dx, mby * 4 + dy)] = 0
            c.terminate(1 if mb == n_mbs - 1 else 0)
            continue
        c.decision(sctx, 0)
        skipmap[(mbx, mby)] = 0
        t = desc.get("type", 0)
        typemap[(mbx, mby)] = t
        # mb_type bins
        c.decision(14, 0)
        if t == 0:
            c.decision(15, 0); c.decision(16, 0)
        elif t == 3:  # P_8x8
            c.decision(15, 0); c.decision(16, 1)
        elif t == 1:  # 16x8
            c.decision(15, 1); c.decision(17, 1)
        else:  # 2 (8x16)
            c.decision(15, 1); c.decision(17, 0)
        subs = desc.get("sub", [0, 0, 0, 0])
        if t == 3:
            for st in subs:
                if st == 0:
                    c.decision(21, 1)
                elif st == 1:
                    c.decision(21, 0); c.decision(22, 0)
                elif st == 2:
                    c.decision(21, 0); c.decision(22, 1); c.decision(23, 1)
                else:
                    c.decision(21, 0); c.decision(22, 1); c.decision(23, 0)
        # partitions
        if t == 3:
            parts = []
            for b in range(4):
                bx0, by0 = (b & 1) * 2, (b >> 1) * 2
                for (sx, sy, w4, h4) in SUBG[subs[b]]:
                    parts.append((b, bx0 + sx, by0 + sy, w4, h4))
            nref_parts = 4
        else:
            parts = [(i,) + g[1:] for i, g in enumerate(P_GEOM[t])]
            nref_parts = len(parts)
        refs = desc.get("refs", [0] * 4)
        # ref_idx (unary, when num_ref > 1)
        if num_ref > 1:
            for i in range(nref_parts):
                if t == 3:
                    bx4, by4 = (i & 1) * 2, (i >> 1) * 2
                else:
                    bx4, by4 = P_GEOM[t][i][1], P_GEOM[t][i][2]
                gx0, gy0 = mbx * 4 + bx4, mby * 4 + by4
                rctx = 0
                if gx0 > 0 and refmap.get((gx0 - 1, gy0), 0) > 0:
                    rctx += 1
                if gy0 > 0 and refmap.get((gx0, gy0 - 1), 0) > 0:
                    rctx += 2
                r = refs[i]
                k = 0
                while True:
                    if k == r:
                        c.decision(54 + rctx, 0)
                        break
                    c.decision(54 + rctx, 1)
                    rctx = (rctx >> 2) + 4
                    k += 1
                # partition refs become visible to later ref ctx immediately
                if t == 3:
                    pw4 = ph4 = 2
                else:
                    pw4, ph4 = P_GEOM[t][i][3], P_GEOM[t][i][4]
                for dy in range(ph4):
                    for dx in range(pw4):
                        refmap[(gx0 + dx, gy0 + dy)] = r
        # mvds
        mvds = desc.get("mvds", [(0, 0)] * len(parts))
        for (pi, mvd) in zip(parts, mvds):
            if t == 3:
                _, bx4, by4, w4, h4 = pi
                ref = refs[pi[0]]
            else:
                bx4, by4, w4, h4 = pi[1], pi[2], pi[3], pi[4]
                ref = refs[pi[0]]
            gx0, gy0 = mbx * 4 + bx4, mby * 4 + by4
            for comp in range(2):
                a = abs(mvdmap.get((gx0 - 1, gy0), (0, 0))[comp]) \
                    + abs(mvdmap.get((gx0, gy0 - 1), (0, 0))[comp])
                base = 40 if comp == 0 else 47
                mctx = 0 if a < 3 else (2 if a > 32 else 1)
                v = mvd[comp]
                av = abs(v)
                if av == 0:
                    c.decision(base + mctx, 0)
                else:
                    c.decision(base + mctx, 1)
                    k = 1
                    cc = 3
                    while k < min(av, 9):
                        c.decision(base + cc, 1)
                        if k < 4:
                            cc += 1
                        k += 1
                    if av < 9:
                        c.decision(base + cc, 0)
                    else:
                        suf = av - 9
                        kk = 3
                        while suf >= (1 << kk):
                            c.bypass(1)
                            suf -= 1 << kk
                            kk += 1
                        c.bypass(0)
                        while kk > 3:
                            kk -= 1
                            c.bypass((suf >> kk) & 1)
                        for kk2 in (2, 1, 0):
                            c.bypass((suf >> kk2) & 1)
                    c.bypass(1 if v < 0 else 0)
            for dy in range(h4):
                for dx in range(w4):
                    mvdmap[(gx0 + dx, gy0 + dy)] = mvd
                    refmap[(gx0 + dx, gy0 + dy)] = ref
        # cbp
        blocks = desc.get("blocks", {})
        blocks8 = desc.get("blocks8", {})
        cbp_luma = 0
        for z in blocks:
            cbp_luma |= 1 << (z >> 2)
        for b in blocks8:
            cbp_luma |= 1 << b
        bits = 0
        for b in range(4):
            if b & 1:
                ca = 1 if not (bits & (1 << (b - 1))) else 0
            elif mbx > 0:
                n = (mbx - 1, mby)
                ca = 0 if skipmap.get(n) else (
                    1 if not (cbpmap.get(n, 0) & (1 << (b + 1))) else 0)
                if skipmap.get(n):
                    ca = 1  # skip MB cbp 0 -> bit 0 -> cond 1
            else:
                ca = 0
            if b & 2:
                cb = 1 if not (bits & (1 << (b - 2))) else 0
            elif mby > 0:
                n = (mbx, mby - 1)
                cb = 1 if not (cbpmap.get(n, 0) & (1 << (b + 2))) else 0
            else:
                cb = 0
            v = (cbp_luma >> b) & 1
            c.decision(73 + ca + 2 * cb, v)
            bits |= v << b
        c.decision(77, 0)   # no chroma coefficients in crafted P MBs
        cbpmap[(mbx, mby)] = cbp_luma
        tf8 = 1 if blocks8 else 0
        if cbp_luma:
            if tf8 or True:
                pass
            # transform flag (eligible: type 0-2 or all subs 8x8)
            elig = t in (0, 1, 2) or all(s == 0 for s in subs)
            # (we only craft eligible combinations)
        elig = (t in (0, 1, 2) or all(s == 0 for s in subs))
        if cbp_luma and elig:
            tctx = 399
            if mbx > 0 and tf8map.get((mbx - 1, mby)):
                tctx += 1
            if mby > 0 and tf8map.get((mbx, mby - 1)):
                tctx += 1
            c.decision(tctx, tf8)
        tf8map[(mbx, mby)] = tf8
        if cbp_luma:
            c.decision(60, 0)  # qp delta 0
        # residuals
        if tf8:
            for b in range(4):
                if not (cbp_luma & (1 << b)):
                    for dy in range(2):
                        for dx in range(2):
                            cbfy[(mbx * 4 + (b & 1) * 2 + dx,
                                  mby * 4 + (b >> 1) * 2 + dy)] = 0
                    continue
                co = blocks8[b]
                sigpos = [i for i, v in enumerate(co) if v]
                last = sigpos[-1]
                for i in range(63):
                    if i > last:
                        break
                    s = 1 if co[i] else 0
                    c.decision(402 + HC.SIG_COEFF_8x8[i], s)
                    if s:
                        c.decision(417 + HC.LAST_COEFF_8x8[i],
                                   1 if i == last else 0)
                        if i == last:
                            break
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
                        else:
                            suf = lv - 15
                            kk = 0
                            while suf >= (1 << kk):
                                c.bypass(1)
                                suf -= 1 << kk
                                kk += 1
                            c.bypass(0)
                            while kk:
                                kk -= 1
                                c.bypass((suf >> kk) & 1)
                    if lv > 1:
                        num_gt1 += 1
                    else:
                        num_eq1 += 1
                    c.bypass(1 if co[pos] < 0 else 0)
                for dy in range(2):
                    for dx in range(2):
                        cbfy[(mbx * 4 + (b & 1) * 2 + dx,
                              mby * 4 + (b >> 1) * 2 + dy)] = 1
        else:
            for z in range(16):
                if not (cbp_luma & (1 << (z >> 2))):
                    continue
                x4, y4 = HRm._Z_TO_XY[z]
                gx, gy = mbx * 4 + x4, mby * 4 + y4
                co = blocks.get(z, [0] * 16)
                sigpos = [i for i, v in enumerate(co) if v]
                # cbf (cat 2): nbr cells; unavailable + inter cur -> 0
                def cbf_cond(ngx, ngy):
                    if ngx < 0 or ngy < 0:
                        return 0
                    return cbfy.get((ngx, ngy), 0)
                inc = cbf_cond(gx - 1, gy) + 2 * cbf_cond(gx, gy - 1)
                if not sigpos:
                    c.decision(85 + 8 + inc, 0)
                    cbfy[(gx, gy)] = 0
                    continue
                c.decision(85 + 8 + inc, 1)
                cbfy[(gx, gy)] = 1
                last = sigpos[-1]
                for i in range(15):
                    if i > last:
                        break
                    s = 1 if co[i] else 0
                    c.decision(105 + 29 + i, s)
                    if s:
                        c.decision(166 + 29 + i, 1 if i == last else 0)
                        if i == last:
                            break
                num_eq1 = num_gt1 = 0
                for pos in reversed(sigpos):
                    lv = abs(co[pos])
                    ctx0 = 0 if num_gt1 else min(4, 1 + num_eq1)
                    if lv == 1:
                        c.decision(227 + 20 + ctx0, 0)
                    else:
                        c.decision(227 + 20 + ctx0, 1)
                        ctxn = 227 + 20 + 5 + min(4, num_gt1)
                        for _ in range(min(lv, 15) - 2):
                            c.decision(ctxn, 1)
                        if lv < 15:
                            c.decision(ctxn, 0)
                        else:
                            suf = lv - 15
                            kk = 0
                            while suf >= (1 << kk):
                                c.bypass(1)
                                suf -= 1 << kk
                                kk += 1
                            c.bypass(0)
                            while kk:
                                kk -= 1
                                c.bypass((suf >> kk) & 1)
                    if lv > 1:
                        num_gt1 += 1
                    else:
                        num_eq1 += 1
                    c.bypass(1 if co[pos] < 0 else 0)
        c.terminate(1 if mb == n_mbs - 1 else 0)
    data = bytearray(w.getvalue())
    cur = nb = 0
    for bit in c.bits:
        cur = (cur << 1) | bit; nb += 1
        if nb == 8: data.append(cur); cur = 0; nb = 0
    if nb: data.append(cur << (8 - nb))
    return _nal(bytes(data), 2, 1)

