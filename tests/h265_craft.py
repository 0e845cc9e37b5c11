"""Crafted HEVC streams for the conformance edges x265 cannot emit.

A minimal spec-faithful HEVC *encoder* — the CABAC M-coder (9.3.4)
plus PCM-only intra and skip-only inter pictures — produces streams
exercising IPCM (7.3.8.7), tiles (6.5.1), dependent slice segments
(7.4.7.1) and long-term reference pictures (8.3.2). libavcodec
arbitrates every stream; the in-build oracle and the native decoder
must match it bit-exactly.  Reference parity: the upstream project
decodes these via FFmpeg (Amatsukaze/ReaderWriterFFmpeg.hpp:256-483);
this generator proves the standalone path on the same features.
"""

from __future__ import annotations

import numpy as np

from amatsukaze_tpu.video import h265_tables as T
from amatsukaze_tpu.video.h265_ref import CTX_OFFSETS, init_hevc_contexts


class Bits:
    """MSB-first bit accumulator."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        n = v + 1
        nb = n.bit_length()
        self.u(0, nb - 1)
        self.u(n, nb)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align1(self) -> None:
        """byte_alignment() / rbsp_trailing_bits: a one, then zeros."""
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)

    def align0(self) -> None:
        """pcm_alignment_zero_bit / post-flush padding (the CABAC flush
        already emitted the stop bit)."""
        while len(self.bits) % 8:
            self.bits.append(0)

    def byte_pos(self) -> int:
        assert len(self.bits) % 8 == 0
        return len(self.bits) // 8

    def raw_byte(self, b: int) -> None:
        self.u(b, 8)

    def getvalue(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


class CabacEnc:
    """9.3.4 arithmetic encoding engine writing into a Bits sink.

    The mirror of h264_cabac.CabacEngine (same range/LPS tables).
    After EncodeFlush the emitted bit count equals the decoder's
    consumed bit position exactly — both sides renormalise in lockstep
    and the flush emits precisely the decoder's 9-bit lookahead plus
    the stop bit — so PCM payloads and substream boundaries land on
    the same byte for encoder and decoder.
    """

    def __init__(self, bits: Bits, init_type: int, qp: int):
        self.bits = bits
        self.ctx = init_hevc_contexts(init_type, qp)
        self._reset_engine()

    def _reset_engine(self) -> None:
        self.low = 0
        self.range_ = 510
        self.outstanding = 0
        self.first = True

    def _put(self, b: int) -> None:
        if self.first:
            self.first = False
        else:
            self.bits.bits.append(b)
        while self.outstanding:
            self.bits.bits.append(1 - b)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.range_ < 256:
            if self.low < 256:
                self._put(0)
            elif self.low >= 512:
                self.low -= 512
                self._put(1)
            else:
                self.low -= 256
                self.outstanding += 1
            self.range_ <<= 1
            self.low <<= 1

    def decision(self, name: str, inc: int, bit: int) -> None:
        st = self.ctx[CTX_OFFSETS[name] + inc]
        pstate = st[0]
        lps = T.RANGE_LPS[4 * pstate + ((self.range_ >> 6) & 3)]
        self.range_ -= lps
        if bit != st[1]:
            self.low += self.range_
            self.range_ = lps
            if pstate == 0:
                st[1] = 1 - st[1]
            st[0] = T.TRANS_IDX_LPS[pstate]
        else:
            st[0] = T.TRANS_IDX_MPS[pstate]
        self._renorm()

    def bypass(self, bit: int) -> None:
        self.low <<= 1
        if bit:
            self.low += self.range_
        if self.low >= 1024:
            self._put(1)
            self.low -= 1024
        elif self.low < 512:
            self._put(0)
        else:
            self.outstanding += 1
            self.low -= 512

    def terminate(self, bit: int) -> None:
        self.range_ -= 2
        if bit:
            self.low += self.range_
            self._flush()
        else:
            self._renorm()

    def _flush(self) -> None:
        """9.3.4.6 EncodeFlush; the final 1 is the stop/alignment bit."""
        self.range_ = 2
        self._renorm()
        self._put((self.low >> 9) & 1)
        self.bits.bits.append((self.low >> 8) & 1)
        self.bits.bits.append(1)

    def restart(self, fresh_contexts: tuple | None = None) -> None:
        """Re-initialise the engine (after PCM, or at a new substream);
        contexts persist unless fresh (init_type, qp) is given."""
        if fresh_contexts is not None:
            self.ctx = init_hevc_contexts(*fresh_contexts)
        self._reset_engine()


# ---------------------------------------------------------------------------
# NAL assembly
# ---------------------------------------------------------------------------


def ep_insert(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal(nal_type: int, payload: Bits) -> bytes:
    hdr = bytes([nal_type << 1, 0x01])
    return b"\x00\x00\x00\x01" + ep_insert(hdr + payload.getvalue())


def _ebsp_offsets(data: bytes, positions: list[int]) -> list[int]:
    """EBSP (post emulation-prevention) offsets of RBSP byte positions
    within `data`. Substream boundaries are always preceded by a
    nonzero byte (the CABAC stop bit), so no insertion straddles a
    boundary and the zero-run carry-in is 0."""
    res = {}
    inserted = 0
    zeros = 0
    wanted = set(positions)
    for i, b in enumerate(data + b"\xff"):
        if i in wanted:
            res[i] = i + inserted
        if zeros >= 2 and b <= 3:
            inserted += 1
            zeros = 0
        zeros = zeros + 1 if b == 0 else 0
    return [res[p] for p in positions]


# ---------------------------------------------------------------------------
# Parameter sets
# ---------------------------------------------------------------------------


def _ptl(b: Bits) -> None:
    """profile_tier_level: Main profile, level 4.0."""
    b.u(0, 2)         # profile_space
    b.u(0, 1)         # tier
    b.u(1, 5)         # profile_idc = Main
    b.u(1 << 30, 32)  # compatibility: profile 1
    b.u(1, 1)         # progressive_source
    b.u(0, 1)         # interlaced_source
    b.u(1, 1)         # non_packed
    b.u(1, 1)         # frame_only
    b.u(0, 32)        # reserved (44 bits)
    b.u(0, 12)
    b.u(120, 8)       # level 4.0


def vps_bits() -> Bits:
    b = Bits()
    b.u(0, 4)         # vps_id
    b.u(1, 1)         # base_layer_internal
    b.u(1, 1)         # base_layer_available
    b.u(0, 6)         # max_layers_minus1
    b.u(0, 3)         # max_sub_layers_minus1
    b.u(1, 1)         # temporal_id_nesting
    b.u(0xFFFF, 16)   # reserved
    _ptl(b)
    b.u(1, 1)         # sub_layer_ordering_info_present
    b.ue(4)           # max_dec_pic_buffering_minus1
    b.ue(0)           # num_reorder_pics
    b.ue(0)           # max_latency_increase_plus1
    b.u(0, 6)         # max_layer_id
    b.ue(0)           # num_layer_sets_minus1
    b.u(0, 1)         # timing_info_present
    b.u(0, 1)         # vps_extension
    b.align1()
    return b


def sps_bits(w: int, h: int, *, lt: bool = False,
             log2_max_poc: int = 4) -> Bits:
    """ctb = min_cb = 16 so each CTU is exactly one 16x16 CU (no split
    flags); PCM pinned to 16x16 at 8 bits, loop filter applies."""
    b = Bits()
    b.u(0, 4)         # sps_video_parameter_set_id
    b.u(0, 3)         # max_sub_layers_minus1
    b.u(1, 1)         # temporal_id_nesting
    _ptl(b)
    b.ue(0)           # sps id
    b.ue(1)           # chroma_format_idc 4:2:0
    b.ue(w)
    b.ue(h)
    b.u(0, 1)         # no conformance window
    b.ue(0)           # bit_depth_luma 8
    b.ue(0)           # bit_depth_chroma 8
    b.ue(log2_max_poc - 4)
    b.u(1, 1)         # sub_layer_ordering_info_present
    b.ue(4)           # max_dec_pic_buffering_minus1
    b.ue(0)           # num_reorder_pics
    b.ue(0)           # max_latency
    b.ue(1)           # log2_min_cb = 4 (16x16)
    b.ue(0)           # log2_diff_max_min -> ctb 16
    b.ue(0)           # log2_min_tb = 2
    b.ue(2)           # log2_diff -> max tb 16
    b.ue(0)           # max_transform_hierarchy_depth_inter
    b.ue(0)           # max_transform_hierarchy_depth_intra
    b.u(0, 1)         # scaling_list_enabled
    b.u(0, 1)         # amp_enabled
    b.u(0, 1)         # sao_enabled
    b.u(1, 1)         # pcm_enabled
    b.u(7, 4)         # pcm_sample_bit_depth_luma_minus1 (8-bit)
    b.u(7, 4)         # pcm_sample_bit_depth_chroma_minus1
    b.ue(1)           # log2_min_pcm_cb = 4
    b.ue(0)           # log2_diff_max_min_pcm
    b.u(0, 1)         # pcm_loop_filter_disabled (filters apply)
    b.ue(0)           # num_short_term_ref_pic_sets
    b.u(1 if lt else 0, 1)  # long_term_ref_pics_present
    if lt:
        b.ue(0)       # num_long_term_ref_pics_sps
    b.u(0, 1)         # temporal_mvp_enabled
    b.u(0, 1)         # strong_intra_smoothing
    b.u(0, 1)         # vui_parameters_present
    b.u(0, 1)         # sps_extension
    b.align1()
    return b


def pps_bits(*, tiles: tuple | None = None, dep_slices: bool = False,
             lf_across_tiles: int = 1, lf_across_slices: int = 1,
             col_widths: list[int] | None = None,
             row_heights: list[int] | None = None) -> Bits:
    """tiles=(ncols, nrows), uniform spacing unless explicit sizes (in
    CTBs, all but the last) are given."""
    b = Bits()
    b.ue(0)           # pps id
    b.ue(0)           # sps id
    b.u(1 if dep_slices else 0, 1)  # dependent_slice_segments_enabled
    b.u(0, 1)         # output_flag_present
    b.u(0, 3)         # num_extra_slice_header_bits
    b.u(0, 1)         # sign_data_hiding
    b.u(0, 1)         # cabac_init_present
    b.ue(0)           # num_ref_idx_l0_default_active_minus1
    b.ue(0)           # num_ref_idx_l1_default_active_minus1
    b.se(0)           # init_qp_minus26
    b.u(0, 1)         # constrained_intra_pred
    b.u(0, 1)         # transform_skip_enabled
    b.u(0, 1)         # cu_qp_delta_enabled
    b.se(0)           # cb_qp_offset
    b.se(0)           # cr_qp_offset
    b.u(0, 1)         # slice_chroma_qp_offsets_present
    b.u(0, 1)         # weighted_pred
    b.u(0, 1)         # weighted_bipred
    b.u(0, 1)         # transquant_bypass_enabled
    b.u(1 if tiles else 0, 1)  # tiles_enabled
    b.u(0, 1)         # entropy_coding_sync
    if tiles:
        ncols, nrows = tiles
        b.ue(ncols - 1)
        b.ue(nrows - 1)
        uniform = col_widths is None and row_heights is None
        b.u(1 if uniform else 0, 1)
        if not uniform:
            for cwv in col_widths:
                b.ue(cwv - 1)
            for rhv in row_heights:
                b.ue(rhv - 1)
        b.u(lf_across_tiles, 1)
    b.u(lf_across_slices, 1)  # pps_loop_filter_across_slices
    b.u(0, 1)         # deblocking_filter_control_present
    b.u(0, 1)         # pps_scaling_list_data_present
    b.u(0, 1)         # lists_modification_present
    b.ue(0)           # log2_parallel_merge_level_minus2
    b.u(0, 1)         # slice_segment_header_extension
    b.u(0, 1)         # pps_extension
    b.align1()
    return b


# ---------------------------------------------------------------------------
# Tile / CTB geometry (mirrors 6.5.1 on the generator side)
# ---------------------------------------------------------------------------


def tile_maps(wc: int, hc: int, tiles: tuple | None,
              col_widths=None, row_heights=None):
    n = wc * hc
    if not tiles:
        rs = list(range(n))
        return [0] * n, rs, rs
    ncols, nrows = tiles
    if col_widths is None:
        col_bd = [(i * wc) // ncols for i in range(ncols + 1)]
    else:
        cw = list(col_widths) + [wc - sum(col_widths)]
        col_bd = [0]
        for v in cw:
            col_bd.append(col_bd[-1] + v)
    if row_heights is None:
        row_bd = [(i * hc) // nrows for i in range(nrows + 1)]
    else:
        rh = list(row_heights) + [hc - sum(row_heights)]
        row_bd = [0]
        for v in rh:
            row_bd.append(row_bd[-1] + v)
    tile_id = [0] * n
    rs_to_ts = [0] * n
    ts_to_rs = [0] * n
    ts = 0
    for tj in range(nrows):
        for ti in range(ncols):
            tid = tj * ncols + ti
            for y in range(row_bd[tj], row_bd[tj + 1]):
                for x in range(col_bd[ti], col_bd[ti + 1]):
                    rsa = y * wc + x
                    tile_id[rsa] = tid
                    rs_to_ts[rsa] = ts
                    ts_to_rs[ts] = rsa
                    ts += 1
    return tile_id, rs_to_ts, ts_to_rs


# ---------------------------------------------------------------------------
# Slice encoders
# ---------------------------------------------------------------------------


def _slice_header_i(b: Bits, *, first: bool, dep: bool, address: int,
                    addr_bits: int, dep_enabled: bool,
                    lf_across_slices: int | None = 1,
                    entry_points: list[int] | None = None) -> None:
    """IDR_W_RADL slice-segment header. lf_across_slices None means the
    PPS flag is 0 (no slice-level bit); entry_points None means tiles
    are off (no count field)."""
    b.u(1 if first else 0, 1)
    b.u(0, 1)         # no_output_of_prior_pics (IRAP)
    b.ue(0)           # pps id
    if not first:
        if dep_enabled:
            b.u(1 if dep else 0, 1)
        b.u(address, addr_bits)
    if not dep:
        b.ue(2)       # slice_type I
        b.se(0)       # slice_qp_delta
        if lf_across_slices is not None:
            b.u(lf_across_slices, 1)
    if entry_points is not None:
        b.ue(len(entry_points))
        if entry_points:
            ob = max(max(ep - 1 for ep in entry_points).bit_length(), 1)
            b.ue(ob - 1)
            for ep in entry_points:
                b.u(ep - 1, ob)
    b.align1()


def _encode_pcm_ctu(enc: CabacEnc, b: Bits, frame, cx: int,
                    cy: int) -> None:
    """One 16x16 IPCM CU: part_mode 2Nx2N, pcm_flag 1, raw samples."""
    y, u, v = frame
    enc.decision("part_mode", 0, 1)   # PART_2Nx2N
    enc.terminate(1)                  # pcm_flag
    b.align0()                        # pcm_alignment_zero_bit
    for row in y[cy:cy + 16, cx:cx + 16]:
        for px in row:
            b.raw_byte(int(px))
    for pl in (u, v):
        for row in pl[cy // 2:cy // 2 + 8, cx // 2:cx // 2 + 8]:
            for px in row:
                b.raw_byte(int(px))
    enc.restart()                     # engine reinit, contexts kept


def encode_pcm_picture(frame, wc: int, hc: int, *,
                       tiles: tuple | None = None,
                       col_widths=None, row_heights=None,
                       segments: list[int] | None = None,
                       dep_segments: bool = False,
                       lf_across_slices: int = 1,
                       qp: int = 26) -> list[bytes]:
    """One all-IPCM IDR picture as one or more slice-segment NALs.
    `segments` lists the starting CTB (raster scan) of each segment
    after the first; with dep_segments=True those are dependent."""
    tile_id, rs_to_ts, ts_to_rs = tile_maps(wc, hc, tiles,
                                            col_widths, row_heights)
    n = wc * hc
    seg_starts_rs = [0] + list(segments or [])
    seg_starts_ts = [rs_to_ts[s] for s in seg_starts_rs]
    seg_ends_ts = seg_starts_ts[1:] + [n]
    addr_bits = max(1, (n - 1).bit_length())
    nals = []
    ctx_carry = None
    for si, (ts0, ts1) in enumerate(zip(seg_starts_ts, seg_ends_ts)):
        dep = dep_segments and si > 0
        data = Bits()
        enc = CabacEnc(data, 0, qp)
        # a dependent segment restores carried contexts unless its
        # first CTU starts a new tile (tile init wins, 9.3.1)
        tile_start = bool(tiles) and (
            ts0 == 0 or tile_id[ts_to_rs[ts0 - 1]]
            != tile_id[ts_to_rs[ts0]])
        if dep and ctx_carry is not None and not tile_start:
            enc.ctx = [st.copy() for st in ctx_carry]
        sub_starts = [0]
        for ts in range(ts0, ts1):
            rs = ts_to_rs[ts]
            _encode_pcm_ctu(enc, data, frame, (rs % wc) * 16,
                            (rs // wc) * 16)
            last = ts == ts1 - 1
            enc.terminate(1 if last else 0)  # end_of_slice_segment_flag
            if last:
                data.align0()  # the flush emitted the stop bit
            elif tiles and tile_id[ts_to_rs[ts + 1]] != tile_id[rs]:
                enc.terminate(1)  # end_of_subset_one_bit
                data.align0()
                sub_starts.append(data.byte_pos())
                enc.restart(fresh_contexts=(0, qp))
        ctx_carry = [st.copy() for st in enc.ctx]
        data_bytes = data.getvalue()
        if tiles:
            # entry point offsets count EBSP bytes (7.4.7.1)
            eb = _ebsp_offsets(data_bytes, sub_starts + [len(data_bytes)])
            entry_points = [eb[i + 1] - eb[i]
                            for i in range(len(sub_starts) - 1)]
        else:
            entry_points = None
        hdr = Bits()
        _slice_header_i(hdr, first=(si == 0), dep=dep,
                        address=seg_starts_rs[si], addr_bits=addr_bits,
                        dep_enabled=dep_segments,
                        lf_across_slices=lf_across_slices,
                        entry_points=entry_points)
        full = Bits()
        full.bits = hdr.bits + data.bits
        nals.append(nal(19, full))  # IDR_W_RADL
    return nals


def _slice_header_p(b: Bits, *, poc_lsb: int, log2_max_poc: int,
                    strps_neg: list | None, lt: list | None,
                    max_merge: int = 1) -> None:
    """TRAIL_R P-slice header: inline short-term RPS (possibly empty),
    optional long-term entries [(lsb, used, has_msb, dmsb)]."""
    b.u(1, 1)         # first_slice
    b.ue(0)           # pps id
    b.ue(1)           # slice_type P
    b.u(poc_lsb, log2_max_poc)
    b.u(0, 1)         # short_term_ref_pic_set_sps_flag (inline)
    neg = strps_neg or []
    b.ue(len(neg))    # num_negative_pics
    b.ue(0)           # num_positive_pics
    prev = 0
    for delta, used in neg:   # delta < 0, closest first
        b.ue((prev - delta) - 1)  # delta_poc_s0_minus1
        prev = delta
        b.u(used, 1)
    if lt is not None:
        b.ue(len(lt))  # num_long_term_pics (the SPS list is empty)
        for lsb, used, has_msb, dmsb in lt:
            b.u(lsb, log2_max_poc)
            b.u(used, 1)
            b.u(has_msb, 1)
            if has_msb:
                b.ue(dmsb)
    b.u(0, 1)         # num_ref_idx_active_override
    b.ue(5 - max_merge)  # five_minus_max_num_merge_cand
    b.se(0)           # slice_qp_delta
    b.u(1, 1)         # slice_loop_filter_across_slices (PPS flag is 1)
    b.align1()


def encode_skip_picture(wc: int, hc: int, *, poc_lsb: int,
                        log2_max_poc: int = 4,
                        strps_neg: list | None = None,
                        lt: list | None = None,
                        qp: int = 26) -> bytes:
    """One all-skip P picture: with max_merge=1, no neighbours beyond
    other skip CUs and temporal MVP off, merge yields zero motion on
    ref 0 — the picture is a copy of its first list-0 reference."""
    n = wc * hc
    b = Bits()
    _slice_header_p(b, poc_lsb=poc_lsb, log2_max_poc=log2_max_poc,
                    strps_neg=strps_neg, lt=lt)
    enc = CabacEnc(b, 1, qp)  # P slice, cabac_init_flag 0 -> initType 1
    for rs in range(n):
        x, y0 = rs % wc, rs // wc
        inc = (1 if x > 0 else 0) + (1 if y0 > 0 else 0)  # all-skip
        enc.decision("cu_skip_flag", inc, 1)
        enc.terminate(1 if rs == n - 1 else 0)
    b.align0()
    return nal(1, b)  # TRAIL_R


# ---------------------------------------------------------------------------
# Stream builders
# ---------------------------------------------------------------------------


def test_frame(w: int, h: int, seed: int = 0):
    """Smooth-but-stepped content: gentle gradients (so the deblock
    d < beta gate opens) with small per-CU DC steps (so there is
    something to filter at CU edges). The 16..235 sample range keeps
    PCM payloads free of zero bytes (emulation prevention is still
    computed properly)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    step = rng.integers(-8, 9, (h // 16 + 1, w // 16 + 1))
    step_y = np.repeat(np.repeat(step, 16, 0), 16, 1)[:h, :w]
    y = 120 + 40 * np.sin(xx / 37.0) * np.cos(yy / 29.0) + step_y \
        + rng.uniform(-2, 2, (h, w))
    cyy, cxx = np.mgrid[0:h // 2, 0:w // 2]
    u = (128 + 30 * np.sin(cxx / 23.0) + step_y[::2, ::2]
         + rng.uniform(-2, 2, (h // 2, w // 2)))
    v = (128 + 30 * np.cos(cyy / 19.0) - step_y[::2, ::2]
         + rng.uniform(-2, 2, (h // 2, w // 2)))
    return tuple(np.clip(p, 16, 235).astype(np.uint8) for p in (y, u, v))


def pcm_stream(w: int, h: int, n_frames: int = 1, *,
               tiles: tuple | None = None,
               col_widths=None, row_heights=None,
               segments: list[int] | None = None,
               dep_segments: bool = False,
               lf_across_tiles: int = 1,
               lf_across_slices: int = 1) -> tuple[bytes, list]:
    """All-IPCM IDR pictures. Returns (annexb stream, source frames:
    the decode must reproduce them exactly — PCM is lossless — up to
    the in-loop deblocking applied by every decoder identically)."""
    wc, hc = w // 16, h // 16
    out = (nal(32, vps_bits()) + nal(33, sps_bits(w, h))
           + nal(34, pps_bits(tiles=tiles, col_widths=col_widths,
                              row_heights=row_heights,
                              dep_slices=dep_segments,
                              lf_across_tiles=lf_across_tiles,
                              lf_across_slices=lf_across_slices)))
    frames = []
    for i in range(n_frames):
        frame = test_frame(w, h, seed=i)
        frames.append(frame)
        for nb in encode_pcm_picture(frame, wc, hc, tiles=tiles,
                                     col_widths=col_widths,
                                     row_heights=row_heights,
                                     segments=segments,
                                     dep_segments=dep_segments,
                                     lf_across_slices=lf_across_slices):
            out += nb
    return out, frames


def lt_stream(w: int, h: int, *, msb: bool = False,
              retention: bool = False) -> bytes:
    """IDR (PCM) + skip-P pictures referencing the IDR long-term.

    retention=True: P1 references the IDR short-term; P2 references P1
    short-term while carrying the IDR as a used=0 long-term entry
    (RefPicSetLtFoll keeps it in the DPB through an RPS that would
    otherwise drop it); P3 then references the IDR long-term only.
    Every P output must equal the IDR frame."""
    wc, hc = w // 16, h // 16
    out = (nal(32, vps_bits()) + nal(33, sps_bits(w, h, lt=True))
           + nal(34, pps_bits()))
    frame = test_frame(w, h, seed=3)
    for nb in encode_pcm_picture(frame, wc, hc):
        out += nb
    hm = 1 if msb else 0
    if retention:
        out += encode_skip_picture(wc, hc, poc_lsb=1,
                                   strps_neg=[(-1, 1)], lt=[])
        out += encode_skip_picture(wc, hc, poc_lsb=2,
                                   strps_neg=[(-1, 1)],
                                   lt=[(0, 0, hm, 0)])
        out += encode_skip_picture(wc, hc, poc_lsb=3,
                                   strps_neg=None,
                                   lt=[(0, 1, hm, 0)])
    else:
        out += encode_skip_picture(wc, hc, poc_lsb=1, strps_neg=None,
                                   lt=[(0, 1, hm, 0)])
        out += encode_skip_picture(wc, hc, poc_lsb=2, strps_neg=None,
                                   lt=[(0, 1, hm, 0)])
    return out
