"""MBAFF (macroblock-adaptive frame/field) slice decoding for the
in-build H.264 oracle (ISO/IEC 14496-10 clauses 6.4.10 neighbour
derivation, 7.3.4/7.4.4 MB-pair syntax, 8.3/8.5 with field scans).

x264's interlaced mode emits MBAFF frames (frame_mbs_only=0,
mb_adaptive_frame_field=1, field_pic_flag=0), which is how broadcast
interlaced H.264 is coded by software encoders; every stage here is
held bit-exact against libavcodec on such streams
(tests/test_h264_mbaff.py).  The reference project decodes via FFmpeg
(reference Amatsukaze/ReaderWriterFFmpeg.hpp) — this is an independent
implementation.

Core idea: the spec's Table 6-4 MBAFF neighbour derivation is exactly
the geometry of per-MB *line maps* — a frame MB covers 16 consecutive
picture lines, a field MB covers every other line of its 32-line pair
band — extended beyond the MB bounds for negative coordinates.  The
neighbour of local (xN, yN) is the macroblock whose own line map
contains the absolute line, selected inside the containing pair by that
pair's field/frame status.  All neighbour logic below (intra
availability and samples, prediction-mode inference, CAVLC nC, motion
prediction, CABAC contexts) goes through this single derivation.

State is per-mbAddr (decode order: pair raster, top then bottom) rather
than the progressive decoder's global 4x4 grids.
"""

from __future__ import annotations

import numpy as np

from ..utils.bits import BitReader, EOFError_
from . import h264_tables as T
from . import h264_ref as HR


class MbaffState:
    """Per-picture MBAFF side state, attached as pic.mbaff."""

    def __init__(self, pic):
        mb_w = pic.mb_w
        mb_h = pic.mb_h          # in MB rows (2 per pair)
        n = mb_w * mb_h
        self.mb_w, self.mb_h = mb_w, mb_h
        self.n_pairs = n // 2
        self.pair_rows = mb_h // 2
        self.field_flag = np.zeros(self.n_pairs, np.int8)
        self.slice_id = np.full(n, -1, np.int32)
        self.mb_class = np.zeros(n, np.int8)
        self.mb_qp = np.zeros(n, np.int32)
        self.mb_cbp = np.zeros(n, np.int32)
        self.mb_tf8 = np.zeros(n, np.int8)
        self.mb_dc_flag = np.zeros(n, np.int8)
        self.mb_skip = np.zeros(n, np.int8)
        self.mb_bdirect = np.zeros(n, np.int8)
        self.mb_chroma_mode = np.zeros(n, np.int8)
        self.mb_alpha_off = np.zeros(n, np.int32)
        self.mb_beta_off = np.zeros(n, np.int32)
        self.mb_disable = np.zeros(n, np.int32)
        # per-MB 4x4 raster cells (cell = 4*y + x)
        self.i4_modes = np.full((n, 16), 2, np.int8)
        self.nnz_y = np.zeros((n, 16), np.int8)
        self.nnz_c = np.zeros((n, 2, 4), np.int8)
        self.cbf_y = np.zeros((n, 16), np.int8)
        self.cbf_c = np.zeros((n, 2, 4), np.int8)
        # motion (P/B stages): quarter-pel in the MB's own frame/field units
        self.mv = np.zeros((n, 2, 16, 2), np.int32)
        self.ref_idx = np.full((n, 2, 16), -1, np.int32)
        self.ref_id = np.full((n, 2, 16), -1, np.int64)
        self.mvd = np.zeros((n, 2, 16, 2), np.int32)
        self.cell_direct = np.zeros((n, 16), np.int8)

    # -- addressing ---------------------------------------------------------

    def pair_of(self, addr: int) -> int:
        return addr >> 1

    def is_bottom(self, addr: int) -> bool:
        return bool(addr & 1)

    def pair_xy(self, addr: int):
        p = addr >> 1
        return p % self.mb_w, p // self.mb_w

    def is_field(self, addr: int) -> bool:
        return bool(self.field_flag[addr >> 1])

    def is_intra(self, addr: int) -> bool:
        return self.mb_class[addr] in (HR.MB_I4, HR.MB_I16, HR.MB_IPCM,
                                       HR.MB_I8)

    # -- sample line maps ---------------------------------------------------
    # luma: pair band = 32 lines at pairY*32; chroma: 16 lines at pairY*16.

    def luma_y(self, addr: int, y: int) -> int:
        """Absolute luma line of local row y (valid for negative y too)."""
        px, py = self.pair_xy(addr)
        if self.is_field(addr):
            return py * 32 + (addr & 1) + 2 * y
        return py * 32 + 16 * (addr & 1) + y

    def chroma_y(self, addr: int, y: int) -> int:
        px, py = self.pair_xy(addr)
        if self.is_field(addr):
            return py * 16 + (addr & 1) + 2 * y
        return py * 16 + 8 * (addr & 1) + y

    def luma_x0(self, addr: int) -> int:
        return (self.pair_of(addr) % self.mb_w) * 16

    def ystep(self, addr: int) -> int:
        return 2 if self.is_field(addr) else 1


class MbaffSlice:
    """Decode one MBAFF slice into pic (+ pic.mbaff state)."""

    def __init__(self, dec, pic, h, sps, pps, slice_id: int):
        self.dec = dec
        self.pic = pic
        self.h, self.sps, self.pps = h, sps, pps
        self.sid = slice_id
        if getattr(pic, "mbaff", None) is None:
            pic.mbaff = MbaffState(pic)
        self.st: MbaffState = pic.mbaff
        self.qp = h.slice_qp
        mats = pps.scaling_matrix
        if mats is None:
            self.w4 = [HR._FLAT16] * 6
            self.w8 = [HR._FLAT64] * 2
        else:
            self.w4 = [tuple(HR._zz_to_raster(mats[i], 16)) for i in range(6)]
            if len(mats) > 6:
                self.w8 = [tuple(HR._zz_to_raster(mats[i], 64))
                           for i in (6, 7)]
            else:
                self.w8 = [HR._FLAT64] * 2
        self._dq = {}
        self.cur_addr = 0
        self.cur_z = 0            # decoded-4x4 watermark within current MB
        self.ref_l0 = []          # frame reference lists (P/B stages)
        self.ref_l1 = []
        self._pred_chroma = None
        self._direct_cache = None

    # -- scan selection -----------------------------------------------------

    def scan4(self, addr: int):
        return (HR.FIELD_SCAN_4x4 if self.st.is_field(addr)
                else HR.ZIGZAG_4x4)

    def scan8(self, addr: int):
        return (HR.FIELD_SCAN_8x8 if self.st.is_field(addr)
                else HR.ZIGZAG_8x8)

    # -- dequant ------------------------------------------------------------

    def _dq4(self, qp, list_idx):
        key = (qp, list_idx)
        t = self._dq.get(key)
        if t is None:
            t = HR._dequant4_tab(qp, self.w4[list_idx])
            self._dq[key] = t
        return t

    def _dq8(self, qp, list_idx):
        key = (qp, 8, list_idx)
        t = self._dq.get(key)
        if t is None:
            t = HR._dequant8_tab(qp, self.w8[list_idx])
            self._dq[key] = t
        return t

    # -- neighbour derivation (6.4.10, geometric form) ----------------------

    def _addr_at(self, pair_x: int, pair_y: int, line: int,
                 chroma: bool) -> tuple:
        """(mbAddr, local_row) of the MB of pair (pair_x, pair_y) whose
        line map contains absolute line `line`."""
        st = self.st
        band = 16 if chroma else 32
        pair = pair_y * st.mb_w + pair_x
        local = line - pair_y * band
        if st.field_flag[pair]:
            addr = 2 * pair + (local & 1)
            return addr, local >> 1
        half = band // 2
        if local < half:
            return 2 * pair, local
        return 2 * pair + 1, local - half

    def _nbr(self, addr: int, xN: int, yN: int, chroma: bool):
        """Neighbour of local (xN, yN) of MB `addr` -> (addrN, xW, yW) or
        None when outside the picture / not yet decoded / other slice.
        Covers xN in [-1, maxW], yN in [-1, maxH-1] (A/B/C/D + in-MB)."""
        st = self.st
        maxW = 8 if chroma else 16
        px, py = st.pair_xy(addr)
        xAbs = px * maxW + xN
        if xAbs < 0 or xAbs >= st.mb_w * maxW:
            return None
        line = (st.chroma_y(addr, yN) if chroma else st.luma_y(addr, yN))
        band = 16 if chroma else 32
        if line < 0 or line >= st.pair_rows * band:
            return None
        addrN, yW = self._addr_at(xAbs // maxW, line // band, line, chroma)
        if addrN != addr:
            if addrN >= self.cur_addr:
                return None          # not yet decoded (raster/pair order)
            if st.slice_id[addrN] != self.sid:
                return None
        return addrN, xAbs % maxW, yW

    def _nbr_intra(self, addr: int, xN: int, yN: int, chroma: bool):
        """Like _nbr but with constrained_intra_pred filtering; in-MB
        locations obey the cur_z watermark (decode order of 4x4 blocks)."""
        r = self._nbr(addr, xN, yN, chroma)
        if r is None:
            return None
        addrN, xW, yW = r
        if addrN == addr:
            if not chroma and HR._XY_TO_Z[(xW >> 2, yW >> 2)] >= self.cur_z:
                return None
            return r
        if self.pps.constrained_intra_pred and not self.st.is_intra(addrN):
            return None
        return r

    # -- sample fetch through a neighbour result ---------------------------

    def _luma_sample(self, addrN: int, xW: int, yW: int) -> int:
        st = self.st
        return int(self.pic.Y[st.luma_y(addrN, yW),
                              st.luma_x0(addrN) + xW])

    def _chroma_sample(self, plane, addrN: int, xW: int, yW: int) -> int:
        st = self.st
        return int(plane[st.chroma_y(addrN, yW),
                         (st.pair_of(addrN) % st.mb_w) * 8 + xW])

    # -- CAVLC nC (9.2.1 with 6.4.10 neighbours) ---------------------------

    def _nc_luma(self, addr: int, x4: int, y4: int) -> int:
        na = nb = None
        r = self._nbr(addr, 4 * x4 - 1, 4 * y4, False)
        if r is not None:
            addrN, xW, yW = r
            na = int(self.st.nnz_y[addrN, 4 * (yW >> 2) + (xW >> 2)])
        r = self._nbr(addr, 4 * x4, 4 * y4 - 1, False)
        if r is not None:
            addrN, xW, yW = r
            nb = int(self.st.nnz_y[addrN, 4 * (yW >> 2) + (xW >> 2)])
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        if na is not None:
            return na
        if nb is not None:
            return nb
        return 0

    def _nc_chroma(self, addr: int, comp: int, cx: int, cy: int) -> int:
        # cx, cy: 4x4 cell coords within the 8x8 chroma block (0..1)
        na = nb = None
        r = self._nbr(addr, 4 * cx - 1, 4 * cy, True)
        if r is not None:
            addrN, xW, yW = r
            na = int(self.st.nnz_c[addrN, comp, 2 * (yW >> 2) + (xW >> 2)])
        r = self._nbr(addr, 4 * cx, 4 * cy - 1, True)
        if r is not None:
            addrN, xW, yW = r
            nb = int(self.st.nnz_c[addrN, comp, 2 * (yW >> 2) + (xW >> 2)])
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        if na is not None:
            return na
        if nb is not None:
            return nb
        return 0

    # -- intra mode inference (8.3.1.1 via 6.4.10) -------------------------

    def _i4_mode_nbr(self, addr: int, xN: int, yN: int):
        r = self._nbr_intra(addr, xN, yN, False)
        if r is None:
            return None
        addrN, xW, yW = r
        if addrN == addr:
            return int(self.st.i4_modes[addr, 4 * (yW >> 2) + (xW >> 2)])
        cls = self.st.mb_class[addrN]
        if cls in (HR.MB_I4, HR.MB_I8):
            return int(self.st.i4_modes[addrN, 4 * (yW >> 2) + (xW >> 2)])
        return 2

    # -- MB bookkeeping -----------------------------------------------------

    def _mark_mb(self, addr: int) -> None:
        st, h = self.st, self.h
        st.slice_id[addr] = self.sid
        st.mb_alpha_off[addr] = h.slice_alpha_c0_offset_div2 * 2
        st.mb_beta_off[addr] = h.slice_beta_offset_div2 * 2
        st.mb_disable[addr] = h.disable_deblocking_filter_idc

    # -- I macroblocks (CAVLC) ---------------------------------------------

    def decode_intra_mb_cavlc(self, r: BitReader, addr: int,
                              imb: int) -> None:
        if imb == 25:
            self._decode_ipcm(r, addr)
            return
        if imb == 0:
            self._decode_i4x4(r, addr)
        else:
            self._decode_i16x16(r, addr, imb - 1)

    def _decode_ipcm(self, r: BitReader, addr: int) -> None:
        st, pic = self.st, self.pic
        r.byte_align()
        x0 = st.luma_x0(addr)
        for yy in range(16):
            ly = st.luma_y(addr, yy)
            for xx in range(16):
                pic.Y[ly, x0 + xx] = r.read(8)
        cx0 = (st.pair_of(addr) % st.mb_w) * 8
        for plane in (pic.U, pic.V):
            for yy in range(8):
                cy = st.chroma_y(addr, yy)
                for xx in range(8):
                    plane[cy, cx0 + xx] = r.read(8)
        st.mb_class[addr] = HR.MB_IPCM
        st.nnz_y[addr, :] = 16
        st.nnz_c[addr, :, :] = 16
        st.cbf_y[addr, :] = 1
        st.cbf_c[addr, :, :] = 1
        st.mb_qp[addr] = 0
        st.mb_cbp[addr] = 0x2F

    def _read_i4x4_modes(self, r: BitReader, addr: int):
        st = self.st
        modes = [2] * 16
        for k in range(16):
            x4, y4 = HR._Z_TO_XY[k]
            self.cur_z = k
            ma = self._i4_mode_nbr(addr, 4 * x4 - 1, 4 * y4)
            mb_ = self._i4_mode_nbr(addr, 4 * x4, 4 * y4 - 1)
            pred = 2 if (ma is None or mb_ is None) else min(ma, mb_)
            if r.read(1):
                mode = pred
            else:
                rem = r.read(3)
                mode = rem if rem < pred else rem + 1
            modes[k] = mode
            st.i4_modes[addr, 4 * y4 + x4] = mode
        return modes

    def _read_i8x8_modes(self, r: BitReader, addr: int):
        st = self.st
        modes = [2] * 4
        for b in range(4):
            bx, by = (b & 1) * 2, (b >> 1) * 2
            self.cur_z = HR._XY_TO_Z[(bx, by)]
            ma = self._i4_mode_nbr(addr, 4 * bx - 1, 4 * by)
            mb_ = self._i4_mode_nbr(addr, 4 * bx, 4 * by - 1)
            pred = 2 if (ma is None or mb_ is None) else min(ma, mb_)
            if r.read(1):
                mode = pred
            else:
                rem = r.read(3)
                mode = rem if rem < pred else rem + 1
            modes[b] = mode
            for dy in range(2):
                for dx in range(2):
                    st.i4_modes[addr, 4 * (by + dy) + bx + dx] = mode
        return modes

    def _decode_i4x4(self, r: BitReader, addr: int) -> None:
        st, pps = self.st, self.pps
        tf8 = 0
        if pps.transform_8x8_mode:
            tf8 = r.read(1)
        if tf8:
            self._decode_i8x8_mb(r, addr)
            return
        st.mb_class[addr] = HR.MB_I4
        modes = self._read_i4x4_modes(r, addr)
        chroma_mode = r.ue()
        cbp = T.GOLOMB_TO_INTRA4X4_CBP[r.ue()]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            self.qp = (self.qp + r.se() + 52) % 52
        st.mb_qp[addr] = self.qp
        st.mb_cbp[addr] = cbp
        st.mb_chroma_mode[addr] = chroma_mode
        coeffs = [None] * 16
        for k in range(16):
            if cbp_luma & (1 << (k >> 2)):
                x4, y4 = HR._Z_TO_XY[k]
                self.cur_z = k
                nc = self._nc_luma(addr, x4, y4)
                blk, tc = HR._cavlc_block(r, nc, 16)
                coeffs[k] = blk
                st.nnz_y[addr, 4 * y4 + x4] = tc
        for k in range(16):
            self.cur_z = k
            self._recon_i4_block(addr, k, modes[k], coeffs[k])
        self.cur_z = 16
        self._decode_chroma_cavlc(r, addr, chroma_mode, cbp_chroma, True)

    def _decode_i8x8_mb(self, r: BitReader, addr: int) -> None:
        st = self.st
        st.mb_class[addr] = HR.MB_I8
        st.mb_tf8[addr] = 1
        modes = self._read_i8x8_modes(r, addr)
        chroma_mode = r.ue()
        cbp = T.GOLOMB_TO_INTRA4X4_CBP[r.ue()]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            self.qp = (self.qp + r.se() + 52) % 52
        st.mb_qp[addr] = self.qp
        st.mb_cbp[addr] = cbp
        st.mb_chroma_mode[addr] = chroma_mode
        coeffs = [None] * 4
        for b in range(4):
            if cbp_luma & (1 << b):
                coeffs[b] = self._parse_luma8x8_cavlc(r, addr, b)
        for b in range(4):
            self.cur_z = HR._XY_TO_Z[((b & 1) * 2, (b >> 1) * 2)]
            self._recon_i8_block(addr, b, modes[b], coeffs[b])
        self.cur_z = 16
        self._decode_chroma_cavlc(r, addr, chroma_mode, cbp_chroma, True)

    def _parse_luma8x8_cavlc(self, r: BitReader, addr: int, b: int):
        st = self.st
        scan64 = [0] * 64
        for i in range(4):
            z = 4 * b + i
            x4, y4 = HR._Z_TO_XY[z]
            self.cur_z = z
            nc = self._nc_luma(addr, x4, y4)
            blk, tc = HR._cavlc_block(r, nc, 16)
            st.nnz_y[addr, 4 * y4 + x4] = tc
            for k in range(16):
                scan64[4 * k + i] = blk[k]
        return scan64

    def _decode_i16x16(self, r: BitReader, addr: int, k: int) -> None:
        st = self.st
        pred_mode = k % 4
        cbp_chroma = (k // 4) % 3
        cbp_luma = 15 if k >= 12 else 0
        chroma_mode = r.ue()
        self.qp = (self.qp + r.se() + 52) % 52
        st.mb_class[addr] = HR.MB_I16
        st.mb_qp[addr] = self.qp
        st.mb_cbp[addr] = cbp_luma | (cbp_chroma << 4)
        st.mb_chroma_mode[addr] = chroma_mode
        self.cur_z = 0
        nc = self._nc_luma(addr, 0, 0)
        dc_scan, dc_tc = HR._cavlc_block(r, nc, 16)
        if dc_tc:
            st.mb_dc_flag[addr] |= 1
        coeffs = [None] * 16
        for kk in range(16):
            if cbp_luma:
                x4, y4 = HR._Z_TO_XY[kk]
                self.cur_z = kk
                ncb = self._nc_luma(addr, x4, y4)
                blk, tc = HR._cavlc_block(r, ncb, 15)
                coeffs[kk] = blk
                st.nnz_y[addr, 4 * y4 + x4] = tc
        self.cur_z = 16
        self._recon_i16(addr, pred_mode, dc_scan, coeffs)
        self._decode_chroma_cavlc(r, addr, chroma_mode, cbp_chroma, True)

    # -- reconstruction -----------------------------------------------------

    def _recon_i4_block(self, addr: int, k: int, mode: int, coeffs) -> None:
        st, pic = self.st, self.pic
        x4, y4 = HR._Z_TO_XY[k]
        xN0, yN0 = 4 * x4, 4 * y4
        avail = {}
        samp = {}

        def P(x, y):
            key = (x, y)
            if key in samp:
                return samp[key]
            r = self._nbr_intra(addr, xN0 + x, yN0 + y, False)
            v = 0 if r is None else self._luma_sample(*r)
            samp[key] = v
            return v

        avail_l = self._nbr_intra(addr, xN0 - 1, yN0, False) is not None
        avail_t = self._nbr_intra(addr, xN0, yN0 - 1, False) is not None
        avail_tl = self._nbr_intra(addr, xN0 - 1, yN0 - 1, False) is not None
        avail_tr = self._nbr_intra(addr, xN0 + 4, yN0 - 1, False) is not None
        # top-right substitution (8.3.1.2): unavailable -> replicate t[3]
        t = [P(i, -1) for i in range(4)] if avail_t else [0] * 4
        if avail_tr:
            tr = [P(4 + i, -1) for i in range(4)]
        elif avail_t:
            tr = [t[3]] * 4
        else:
            tr = [0] * 4
        l = [P(-1, i) for i in range(4)] if avail_l else [0] * 4
        tl = P(-1, -1) if avail_tl else 0

        def PP(x, y):
            if y == -1:
                if x == -1:
                    return tl
                return t[x] if x < 4 else tr[x - 4]
            return l[y]

        pred = HR._pred4x4(mode, PP, avail_l, avail_t, avail_tl)
        x0 = st.luma_x0(addr) + xN0
        if coeffs is None:
            for yy in range(4):
                pic.Y[st.luma_y(addr, yN0 + yy), x0 : x0 + 4] = pred[yy]
            return
        scan = self.scan4(addr)
        dq = self._dq4(self.qp, 0)
        d = [0] * 16
        for s in range(16):
            c = coeffs[s]
            if c:
                pos = scan[s]
                d[pos] = HR._dequant4_apply(c, dq[pos], self.qp)
        res = HR._idct4x4(d)
        for yy in range(4):
            row = pic.Y[st.luma_y(addr, yN0 + yy)]
            base = 4 * yy
            for xx in range(4):
                row[x0 + xx] = HR._clip1(pred[yy][xx] + res[base + xx])

    def _recon_i8_block(self, addr: int, b: int, mode: int, scan64) -> None:
        st, pic = self.st, self.pic
        bx, by = (b & 1) * 2, (b >> 1) * 2
        xN0, yN0 = 4 * bx, 4 * by

        def S(x, y):
            r = self._nbr_intra(addr, xN0 + x, yN0 + y, False)
            return None if r is None else self._luma_sample(*r)

        avail_l = S(-1, 0) is not None
        avail_t = S(0, -1) is not None
        avail_tl = S(-1, -1) is not None
        avail_tr = S(8, -1) is not None
        left = [S(-1, i) for i in range(8)] if avail_l else None
        top = None
        if avail_t:
            top = [S(i, -1) for i in range(8)]
            if avail_tr:
                top += [S(8 + i, -1) for i in range(8)]
            else:
                top += [top[7]] * 8
        tl = S(-1, -1) if avail_tl else None
        fl, ft, ftl = HR._filter_i8_refs(left, top, tl,
                                         avail_l, avail_t, avail_tl)
        pred = HR._pred8x8(mode, fl, ft, ftl, avail_l, avail_t, avail_tl)
        x0 = st.luma_x0(addr) + xN0
        if scan64 is None:
            for yy in range(8):
                pic.Y[st.luma_y(addr, yN0 + yy), x0 : x0 + 8] = pred[yy]
            return
        scan = self.scan8(addr)
        ls = self._dq8(self.qp, 0)
        d = [0] * 64
        for s in range(64):
            c = scan64[s]
            if c:
                pos = scan[s]
                d[pos] = HR._dequant8_apply(c, ls[pos], self.qp)
        res = HR._idct8x8(d)
        for yy in range(8):
            row = pic.Y[st.luma_y(addr, yN0 + yy)]
            base = 8 * yy
            for xx in range(8):
                row[x0 + xx] = HR._clip1(pred[yy][xx] + res[base + xx])

    def _recon_i16(self, addr: int, pred_mode: int, dc_scan, coeffs) -> None:
        st, pic = self.st, self.pic

        def S(x, y):
            r = self._nbr_intra(addr, x, y, False)
            return None if r is None else self._luma_sample(*r)

        avail_l = S(-1, 0) is not None
        avail_t = S(0, -1) is not None
        left = [S(-1, i) for i in range(16)] if avail_l else [0] * 16
        top = [S(i, -1) for i in range(16)] if avail_t else [0] * 16
        tlv = S(-1, -1)
        tl = tlv if tlv is not None else 0
        pred = HR._pred16x16(pred_mode, left, top, tl, avail_l, avail_t)
        scan = self.scan4(addr)
        dcr = [0] * 16
        for s in range(16):
            dcr[scan[s]] = dc_scan[s]
        f = HR._hadamard4x4(dcr)
        dc = HR._luma_dc_dequant(f, self.qp, self.w4[0][0])
        dq = self._dq4(self.qp, 0)
        x0 = st.luma_x0(addr)
        for kk in range(16):
            x4, y4 = HR._Z_TO_XY[kk]
            d = [0] * 16
            blk = coeffs[kk]
            if blk is not None:
                for s in range(15):
                    c = blk[s]
                    if c:
                        pos = scan[s + 1]
                        d[pos] = HR._dequant4_apply(c, dq[pos], self.qp)
            d[0] = dc[4 * y4 + x4]
            res = HR._idct4x4(d)
            for yy in range(4):
                row = pic.Y[st.luma_y(addr, 4 * y4 + yy)]
                base = 4 * yy
                for xx in range(4):
                    row[x0 + 4 * x4 + xx] = HR._clip1(
                        int(pred[4 * y4 + yy, 4 * x4 + xx]) + res[base + xx])

    def _decode_chroma_cavlc(self, r: BitReader, addr: int, chroma_mode: int,
                             cbp_chroma: int, intra: bool) -> None:
        st = self.st
        dc_scan = [[0] * 4, [0] * 4]
        if cbp_chroma:
            for comp in range(2):
                blk, tc = HR._cavlc_block(r, -1, 4)
                dc_scan[comp] = blk
                if tc:
                    st.mb_dc_flag[addr] |= 2 << comp
        coeffs = [[None] * 4 for _ in range(2)]
        if cbp_chroma & 2:
            for comp in range(2):
                for b in range(4):
                    cx, cy = (b & 1), (b >> 1)
                    nc = self._nc_chroma(addr, comp, cx, cy)
                    blk, tc = HR._cavlc_block(r, nc, 15)
                    coeffs[comp][b] = blk
                    st.nnz_c[addr, comp, 2 * cy + cx] = tc
        self._recon_chroma(addr, chroma_mode, dc_scan, coeffs, intra)

    def _recon_chroma(self, addr: int, chroma_mode: int, dc_scan, coeffs,
                      intra: bool) -> None:
        st, pic, pps = self.st, self.pic, self.pps
        qpc = (HR.chroma_qp(self.qp, pps.chroma_qp_index_offset),
               HR.chroma_qp(self.qp, pps.second_chroma_qp_index_offset))
        cx0 = (st.pair_of(addr) % st.mb_w) * 8
        scan = self.scan4(addr)
        for comp, plane in ((0, pic.U), (1, pic.V)):
            if intra:
                def S(x, y):
                    r = self._nbr_intra(addr, x, y, True)
                    return (None if r is None
                            else self._chroma_sample(plane, *r))

                avail_l = S(-1, 0) is not None
                avail_t = S(0, -1) is not None
                left = ([S(-1, i) for i in range(8)] if avail_l else [0] * 8)
                top = ([S(i, -1) for i in range(8)] if avail_t else [0] * 8)
                tlv = S(-1, -1)
                tl = tlv if tlv is not None else 0
                pred = HR._pred_chroma8x8(chroma_mode, left, top, tl,
                                          avail_l, avail_t)
            else:
                pred = self._pred_chroma[comp]
            qp = qpc[comp]
            list_idx = (1 + comp) if intra else (4 + comp)
            c0, c1, c2, c3 = dc_scan[comp]
            f = (c0 + c1 + c2 + c3, c0 - c1 + c2 - c3,
                 c0 + c1 - c2 - c3, c0 - c1 - c2 + c3)
            dc = HR._chroma_dc_dequant(f, qp, self.w4[list_idx][0])
            dq = self._dq4(qp, list_idx)
            out = np.array(pred, np.int32, copy=True)
            for b in range(4):
                bx, by = 4 * (b & 1), 4 * (b >> 1)
                d = [0] * 16
                blk = coeffs[comp][b]
                if blk is not None:
                    for s in range(15):
                        c = blk[s]
                        if c:
                            pos = scan[s + 1]
                            d[pos] = HR._dequant4_apply(c, dq[pos], qp)
                d[0] = dc[b]
                if any(d):
                    res = HR._idct4x4(d)
                    for yy in range(4):
                        base = 4 * yy
                        for xx in range(4):
                            out[by + yy, bx + xx] = HR._clip1(
                                int(pred[by + yy, bx + xx]) + res[base + xx])
            for yy in range(8):
                plane[st.chroma_y(addr, yy), cx0 : cx0 + 8] = np.clip(
                    out[yy], 0, 255)

    # -- slice data loop (7.3.4), CAVLC -------------------------------------

    def infer_field_flag(self, pair: int) -> int:
        """7.4.4 inference when both MBs of a pair are skipped: copy the
        left pair's flag if that pair is in this slice, else the above
        pair's, else 0."""
        st = self.st
        px, py = pair % st.mb_w, pair // st.mb_w
        if px > 0 and st.slice_id[2 * (pair - 1)] == self.sid:
            return int(st.field_flag[pair - 1])
        if py > 0 and st.slice_id[2 * (pair - st.mb_w)] == self.sid:
            return int(st.field_flag[pair - st.mb_w])
        return 0

    def decode_cavlc(self, r: BitReader) -> None:
        h = self.h
        st = self.st
        n_mbs = st.mb_w * st.mb_h
        if h.slice_type == HR.SLICE_I:
            addr = h.first_mb * 2
            while addr < n_mbs:
                if (addr & 1) == 0:
                    st.field_flag[addr >> 1] = r.read(1)
                self._mark_mb(addr)
                self.cur_addr = addr
                mb_type = r.ue()
                self.decode_intra_mb_cavlc(r, addr, mb_type)
                addr += 1
                if not HR._more_rbsp_data(r):
                    break
            return
        raise NotImplementedError("MBAFF P/B slices: next stage")

    def decode_cabac(self, rbsp: bytes) -> None:
        raise NotImplementedError("MBAFF CABAC: next stage")


def deblock_picture_mbaff(pic) -> None:
    """MBAFF deblocking (8.7 with MbaffFrameFlag) — next stage; streams
    with the filter disabled (x264 --no-deblock) pass through."""
    st = pic.mbaff
    import numpy as np
    decoded = st.slice_id >= 0
    if np.any(decoded & (st.mb_disable != 1)):
        raise NotImplementedError("MBAFF deblocking: next stage")
