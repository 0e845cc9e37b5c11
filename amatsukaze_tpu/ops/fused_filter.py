"""Fused filter: logo erase + yadif deinterlace + field-match costs over
uint8 frame batches (XLA elementwise pass + one Pallas TPU kernel).

This is the hot path of the whole framework (the BASELINE north star's
">= 2000 filtered 1080i fps/chip"). Structure:

  pass 1 (XLA): logo erase. Its output clamp(floor(...)+0.5) is exactly
      integer-valued, so it round-trips through uint8 losslessly — erase
      runs ONCE per frame instead of three times (as prev/cur/next) and
      the deinterlace kernel needs no logo planes at all.
  pass 2 (Pallas): yadif + field-match combing costs in one VPU pass over
      double-buffered 3-frame row-tile slabs.

Semantics match ops.logo.batched_delogo, ops.deint.yadif_deinterlace and
ops.deint.field_match_costs; tests compare against those jnp references.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Frame rows of halo above/below each tile. Semantically 2 rows (1 field row)
# suffice, but HBM memref slices must be aligned to the (8,128) tiling, so the
# halo DMAs are 8 rows tall; the extra rows are masked / fixed up in-kernel.
HALO = 8
FHALO = HALO // 2  # field rows of halo


def _delogo(x, a, b, maxv, fade):
    bg = a * x + b * maxv
    tmp = fade * bg + (1.0 - fade) * x
    return jnp.clip(jnp.floor(tmp + 0.5), 0.0, maxv)


def _fields(x):
    """[H, W] -> (top [H/2, W], bottom [H/2, W]) via free reshape."""
    h, w = x.shape
    v = x.reshape(h // 2, 2, w)
    return v[:, 0, :], v[:, 1, :]


def _weave(t, b):
    h2, w = t.shape
    return jnp.stack([t, b], axis=1).reshape(h2 * 2, w)


def _shift_w(x, d):
    """Horizontal shift with edge replication."""
    if d == 0:
        return x
    if d > 0:
        return jnp.concatenate([x[:, d:], jnp.repeat(x[:, -1:], d, axis=1)], axis=1)
    return jnp.concatenate([jnp.repeat(x[:, :1], -d, axis=1), x[:, :d]], axis=1)


def pad_width_for_fused(frames_u8, a_full, b_full, width_padded: int,
                        height_padded: int | None = None):
    """Edge-replicate-pad inputs to a 128-aligned width (and optionally an
    8-/tile-aligned height, for chroma-plane geometries like 540 rows).

    Edge replication (not zeros) keeps yadif's column edge handling
    bit-identical to the unpadded jnp chain: shifted taps beyond the last
    logical column read the replicated edge value, exactly what
    ops.deint's edge-replicating column shifts produce. Padded rows are
    junk (the kernel's logical_height fixup keeps the last logical row
    exact); callers slice the output back to the logical height.
    """
    pad = width_padded - frames_u8.shape[-1]
    vpad = 0 if height_padded is None else height_padded - frames_u8.shape[-2]
    if pad == 0 and vpad == 0:
        return frames_u8, a_full, b_full
    f = jnp.pad(frames_u8, ((0, 0), (0, vpad), (0, pad)), mode="edge")
    a = jnp.pad(a_full, ((0, vpad), (0, pad)), mode="edge")
    b = jnp.pad(b_full, ((0, vpad), (0, pad)), mode="edge")
    return f, a, b


def make_fused_filter(height: int, width: int, tile_rows: int = 120,
                      logical_width: int | None = None,
                      logical_height: int | None = None,
                      with_costs: bool = True):
    """Build the fused filter for fixed frame geometry.

    `width` is the stored (lane) width and must be 128-aligned — raw HBM
    memref slices in Mosaic require last-dim alignment to the (8,128)
    tiling. For broadcast sizes like 1440, store frames at the padded
    width (see pad_width_for_fused) and pass the true frame width as
    `logical_width`; padded columns are masked out of the field-match
    costs and the padded output columns are edge junk to be sliced off.

    `tile_rows` must keep the live set under the ~16MB VMEM scoped limit
    (the Mosaic compiler refuses past it, e.g. tile 216 at width 1536 with
    erase fused in). 120 measured fastest for 1080-row frames on v5e:
    ~6.1 ms per 64-frame batch (~10.4k fps/chip), VPU-issue-bound.

    `logical_height` supports plane heights that are not 8-/tile-aligned
    (e.g. 540-row 4:2:0 chroma of 1080i): store the frames padded to an
    aligned `height` (pad_width_for_fused) and pass the true height here;
    the yadif bottom-edge rule and the field-match cost masks apply at the
    logical boundary and the padded output rows are junk to be sliced off.

    Returns fn(frames_u8 [B, H, W] uint8, a_full [H, W] f32, b_full [H, W]
    f32, fades [B] f32, maxv) -> (filtered [B, H, W] uint8, costs [B, 3] f32
    matching ops.deint.field_match_costs at the logical geometry).

    with_costs=False builds a yadif-only kernel (costs returned as None):
    the field-match partial sums are a large share of the VPU work and the
    pure deinterlace path never reads them.
    """
    assert height % tile_rows == 0 and tile_rows % 2 == 0 and tile_rows % 8 == 0
    assert width % 128 == 0, "stored width must be 128-aligned (use pad_width_for_fused)"
    lw = logical_width if logical_width is not None else width
    assert 0 < lw <= width
    lh = logical_height if logical_height is not None else height
    assert 0 < lh <= height and lh % 2 == 0
    nj = height // tile_rows
    srows = tile_rows + 2 * HALO
    ht = tile_rows // 2  # output field rows per tile

    def kernel(frames_ref, maxv_ref, out_ref, *rest):
        if with_costs:
            costs_ref, slab_s, sems = rest
        else:
            costs_ref = None
            slab_s, sems = rest
        # grid is (nj, B): j outer, frames inner
        j = pl.program_id(0)
        i = pl.program_id(1)
        nb = pl.num_programs(1)
        maxv = maxv_ref[0]

        def row_srcs(jj):
            # clamped halo source rows; the tile core always lands at scratch
            # offset HALO so every value slice below is STATIC (Mosaic does
            # not lower dynamic_slice on values). For interior tiles the halo
            # rows adjacent to the core are the true neighbour rows; at frame
            # edges the clamped copies land off-position and those rows are
            # masked (comb sums) or fixed up (yadif bottom edge) instead.
            # every operand is a multiple of HALO=8, but Mosaic cannot prove
            # it through max/min — assert it so the HBM memref slices lower
            row0_ = jj * tile_rows
            top = pl.multiple_of(jnp.maximum(row0_ - HALO, 0), HALO)
            bot = pl.multiple_of(
                jnp.minimum(row0_ + tile_rows, height - HALO), HALO
            )
            return row0_, top, bot

        row0, top_src, bot_src = row_srcs(j)

        def load3(src_ref, dst, sem3, srcs, batch_slice=None):
            row0_, top, bot = srcs
            at = ((lambda sl: src_ref.at[batch_slice, sl])
                  if batch_slice is not None else (lambda sl: src_ref.at[sl]))
            dat = ((lambda sl: dst.at[:, sl]) if batch_slice is not None
                   else (lambda sl: dst.at[sl]))
            return [
                pltpu.make_async_copy(
                    at(pl.ds(top, HALO)), dat(pl.ds(0, HALO)),
                    sem3.at[0],
                ),
                pltpu.make_async_copy(
                    at(pl.ds(row0_, tile_rows)), dat(pl.ds(HALO, tile_rows)),
                    sem3.at[1],
                ),
                pltpu.make_async_copy(
                    at(pl.ds(bot, HALO)),
                    dat(pl.ds(HALO + tile_rows, HALO)), sem3.at[2],
                ),
            ]

        def start_slab(jj, ii, slot):
            """Kick the 3-frame slab DMA for step (jj, ii) into `slot`."""
            base = jnp.clip(ii - 1, 0, nb - 3)
            for c in load3(frames_ref, slab_s.at[slot], sems.at[slot],
                           row_srcs(jj), batch_slice=pl.ds(base, 3)):
                c.start()

        def wait_slab(slot):
            base = jnp.clip(i - 1, 0, nb - 3)
            for c in load3(frames_ref, slab_s.at[slot], sems.at[slot],
                           (row0, top_src, bot_src),
                           batch_slice=pl.ds(base, 3)):
                c.wait()

        # double-buffered slab prefetch: this step's slab was started by the
        # previous step; kick next step's DMA before computing so the copy
        # overlaps the VPU work (the serial wait cost ~25x at tile 72)
        step = j * nb + i
        slot = jax.lax.rem(step, 2)
        @pl.when(step == 0)
        def _():
            start_slab(j, i, 0)

        @pl.when(step + 1 < nj * nb)
        def _():
            j2 = jnp.where(i == nb - 1, j + 1, j)
            i2 = jnp.where(i == nb - 1, 0, i + 1)
            start_slab(j2, i2, 1 - slot)

        wait_slab(slot)

        s0, s1, s2 = slab_s[slot, 0], slab_s[slot, 1], slab_s[slot, 2]
        is_first = i == 0
        is_last = i == nb - 1
        # slab holds frames [base, base+3); map prev/cur/next with
        # batch-edge clamping (selects on u8 tiles are cheap)
        cur8 = jnp.where(is_first, s0, jnp.where(is_last, s2, s1))
        prv8 = jnp.where(is_last, s1, s0)
        nxt8 = jnp.where(is_first, s1, s2)

        # frames arrive already logo-erased (pass 1); Mosaic lacks a direct
        # u8->f32 cast, widen via int32. Widening whole slabs then field-
        # splitting in f32 measured faster than u8 field-split + per-field
        # widening (u8 deinterleave lowers poorly): 5.96 vs 8.73 ms/batch
        cur = cur8.astype(jnp.int32).astype(jnp.float32)
        prv = prv8.astype(jnp.int32).astype(jnp.float32)
        nxt = nxt8.astype(jnp.int32).astype(jnp.float32)

        # fields over the halo-extended tile: scratch field rows
        # FHALO..FHALO+ht are the tile's field rows, the rest halo
        ct, cb = _fields(cur)
        pt, pb = _fields(prv)
        nt, nb_ = _fields(nxt)

        frow0 = row0 // 2
        gy_core = jax.lax.broadcasted_iota(jnp.int32, (ht, 1), 0) + frow0

        # --- yadif: keep top field, reconstruct bottom ---------------------
        keep = ct[FHALO : FHALO + ht]
        below = ct[FHALO + 1 : FHALO + 1 + ht]  # next kept line
        # bottom frame edge (LOGICAL height: rows past it are padding): the
        # clamped halo / padded rows are off-position there, so replicate
        # the last kept line explicitly (matches the jnp chain)
        below = jnp.where(gy_core == lh // 2 - 1, keep, below)
        best_pred = (keep + below) * 0.5
        best_score = jnp.abs(keep - below)
        for d in (1, 2):
            for sgn in (1, -1):
                pa = _shift_w(keep, sgn * d)
                pc = _shift_w(below, -sgn * d)
                score = jnp.abs(pa - pc)
                pred = (pa + pc) * 0.5
                better = score < best_score
                best_pred = jnp.where(better, pred, best_pred)
                best_score = jnp.where(better, score, best_score)
        tp_ = pb[FHALO : FHALO + ht]
        tn_ = nb_[FHALO : FHALO + ht]
        temporal = (tp_ + tn_) * 0.5
        diff = jnp.abs(tp_ - tn_) * 0.5
        recon = jnp.clip(best_pred, temporal - diff, temporal + diff)
        # note: weaving in f32 then one clip/floor/cast of the full tile
        # measured FASTER than a u8 kept-field passthrough + u8 weave
        # (uint8 interleave lowers poorly in Mosaic): 9969 vs 8988 fps
        filtered = _weave(keep, recon)
        out_ref[:] = (
            jnp.clip(jnp.floor(filtered + 0.5), 0.0, maxv)
            .astype(jnp.int32)
            .astype(jnp.uint8)
        )

        if not with_costs:
            return

        # --- field-match combing partial sums -------------------------------
        # global formulas (ops.deint.combing_metric_fields):
        #   odd  y in [0, H/2-1): relu((t[y]-b[y]) * (t[y+1]-b[y]))
        #   even y in [1, H/2):   relu((b[y-1]-t[y]) * (b[y]-t[y]))
        # Computed over the FULL field-scratch shape (zero-offset layout:
        # Mosaic refuses float reductions over offset-layout slices) with a
        # row-validity mask; scratch field row k = global field row
        # frow0 - FHALO + k, the tile core being k in [FHALO, FHALO + ht).

        def shift_up(x):
            return jnp.concatenate([x[1:], x[-1:]], axis=0)

        def shift_down(x):
            return jnp.concatenate([x[:1], x[:-1]], axis=0)

        srows2 = srows // 2
        gy = jax.lax.broadcasted_iota(jnp.int32, (srows2, 1), 0) + (frow0 - FHALO)
        core = (gy >= frow0) & (gy < frow0 + ht)
        col_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) < lw
        ).astype(jnp.float32)
        odd_valid = (core & (gy < lh // 2 - 1)).astype(jnp.float32) * col_ok
        even_valid = ((core & (gy >= 1)) & (gy < lh // 2)).astype(
            jnp.float32) * col_ok

        # shifted fields are shared across the three sums (ct1 feeds c_cur
        # and c_tp, cbm1 feeds c_cur and c_bt); odd+even merge into one
        # tensor so each sum costs a single reduction tree
        ct1 = shift_up(ct)
        pt1 = shift_up(pt)
        cbm1 = shift_down(cb)
        pbm1 = shift_down(pb)

        def fam_sums(t_y, b_y, t_y1, b_ym1):
            odd = jnp.maximum((t_y - b_y) * (t_y1 - b_y), 0.0) * odd_valid
            even = jnp.maximum((b_ym1 - t_y) * (b_y - t_y), 0.0) * even_valid
            return jnp.sum(odd + even)

        c_cur = fam_sums(ct, cb, ct1, cbm1)  # weave(t, b)
        c_tp = fam_sums(ct, pb, ct1, pbm1)  # weave(t, prev_b)
        c_bt = fam_sums(pt, cb, pt1, cbm1)  # weave(prev_t, b)

        # each (j, i) step writes its own partial-costs block; the tiny
        # reduction over j happens in XLA after the kernel
        costs_ref[:, :] = jnp.concatenate([
            c_cur.reshape(1, 1), c_tp.reshape(1, 1), c_bt.reshape(1, 1),
            jnp.zeros((1, 125), jnp.float32),
        ], axis=1)

    @partial(jax.jit, static_argnames=("interpret",))
    def yadif_costs(erased, maxv, interpret=False):
        """Pass 2 alone: yadif + field-match costs over already-erased
        uint8 frames (production erases upstream, or not at all)."""
        bsz = erased.shape[0]
        assert bsz >= 3, "fused filter needs batches of at least 3 frames"
        out_specs = [
            pl.BlockSpec((None, tile_rows, width), lambda j, i: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((bsz, height, width), jnp.uint8)]
        if with_costs:
            out_specs.append(
                pl.BlockSpec((None, None, 1, 128), lambda j, i: (j, i, 0, 0),
                             memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((nj, bsz, 1, 128), jnp.float32))
        res = pl.pallas_call(
            kernel,
            grid=(nj, bsz),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # erased frames (HBM)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # maxv
            ],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[
                pltpu.VMEM((2, 3, srows, width), jnp.uint8),  # double buffer
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            interpret=interpret,
        )(erased, jnp.reshape(maxv, (1,)))
        if not with_costs:
            return res[0], None
        out, costs = res
        return out, costs[:, :, 0, :3].sum(axis=0) / ((lh - 2) * lw)

    @partial(jax.jit, static_argnames=("interpret",))
    def fused(frames_u8, a_full, b_full, fades, maxv, interpret=False):
        # pass 1: logo erase, once per frame (exactly integer-valued, so the
        # uint8 round trip is lossless)
        x = frames_u8.astype(jnp.float32)
        fade = fades[:, None, None]
        bg = a_full * x + b_full * maxv
        erased = jnp.clip(jnp.floor(fade * bg + (1.0 - fade) * x + 0.5),
                          0.0, maxv).astype(jnp.uint8)
        # pass 2: yadif + field-match costs
        return yadif_costs(erased, maxv, interpret=interpret)

    fused.yadif_costs = yadif_costs
    return fused


def make_fused_filter_field(height: int, width: int,
                            field_tile_rows: int | None = None,
                            logical_width: int | None = None,
                            logical_height: int | None = None,
                            with_costs: bool = True,
                            costs_only: bool = False,
                            logo_box: tuple | None = None):
    """Field-plane-layout variant of the fused yadif + field-match kernel.

    The frame-layout kernel (make_fused_filter) spends ~20% of its time on
    in-kernel field splits and the output weave — pure sublane data
    movement. Here the field split costs NOTHING: a row-major
    ``[B, H, W] -> [B, H/2, 2W]`` reshape is a free view whose row k is
    (top-field row k | bottom-field row k) side by side in the lane axis,
    so the kernel DMAs one contiguous slab per region (both fields at
    once) and separates them with 128-aligned lane slices in VMEM. The
    output is written in the same merged layout and reshaped back for
    free. This replaced an explicit XLA split/interleave transpose pair
    (~1.1 ms round trip per 64x1080p batch, ~22% of chain time) in an
    earlier revision. The math is identical; the public entry
    ``yadif_costs(frames_u8 [B, H, W])`` keeps the frame-layout contract.

    `height` is the stored FRAME height; it is padded internally so the
    field planes tile into 8-aligned row blocks. Results are bit-identical
    to make_fused_filter / the jnp chain.
    """
    assert width % 128 == 0
    assert not (costs_only and not with_costs)
    lw = logical_width if logical_width is not None else width
    lh = logical_height if logical_height is not None else height
    assert 0 < lw <= width and 0 < lh <= height and lh % 2 == 0

    # pad the field planes to a multiple of the field tile; the tile must
    # be 8-row aligned so every halo/core HBM slice stays (8,128)-tiled
    if field_tile_rows is None:
        # bigger tiles amortize the per-grid-step fixed cost (semaphore
        # waits, scalar setup, pipeline turnaround ~ several us). 184 is
        # the largest 8-aligned tile whose 4-slot ring + f32 temporaries
        # stay inside the ~16 MB scoped VMEM budget (272 was measured to
        # need 20.65 MB on v5e — Mosaic refuses), and it tiles a 540-row
        # 1080i field plane in 3 steps with only 12 pad rows
        fh_logical = (height + 1) // 2
        field_tile_rows = 184 if fh_logical > 184 else max(
            8, -(-fh_logical // 8) * 8)
    ftr = field_tile_rows
    assert ftr % 8 == 0
    fh = -(-((height + 1) // 2) // ftr) * ftr  # padded field-plane height
    hp = 2 * fh  # padded frame height
    njf = fh // ftr
    fsrows = ftr + 2 * HALO

    # ---- in-kernel logo-erase overlay (all geometry static) ------------
    # logo_box=(y0, x0, h, w) in FRAME coords: the erased logo box ships
    # as a small field-merged window [B, wfh, 2*wa] that the kernel DMAs
    # over each slab right after its load completes — the full frames
    # never pay the erase's extra HBM round trip (the XLA
    # dynamic_update_slice path copies the whole batch, ~1.2 ms per
    # 64x1080 batch on v5e, ~25% of the fused chain).  The box expands
    # to DMA alignment (rows to 8 field rows, lanes to 128) plus one
    # 8-row margin per side so neighbouring tiles' halo copies of box
    # rows are erased too; the expansion is bit-exact because erase
    # outside the true logo rect is the identity (a==1, b==0, and
    # clip(floor(x+0.5)) on integers is x).
    if logo_box is not None:
        _y0, _x0, _bh, _bw = logo_box
        assert 0 <= _y0 < _y0 + _bh <= lh and 0 <= _x0 < _x0 + _bw <= lw
        x0a = (_x0 // 128) * 128
        wa = min(-(-(_x0 + _bw - x0a) // 128) * 128, width - x0a)
        fy0 = (_y0 // 2 // HALO) * HALO
        fy1 = -(-((_y0 + _bh + 1) // 2) // HALO) * HALO
        wf0 = max(fy0 - HALO, 0)
        wf1 = min(fy1 + HALO, lh // 2)
        wfh = wf1 - wf0
        overlays = []  # (tile jj, [(slab_row0, window_row0, nrows), ...])
        for _jj in range(njf):
            _row0 = _jj * ftr
            _top = max(_row0 - HALO, 0)
            _bot = min(_row0 + ftr, fh - HALO)
            regs = []
            for _dst0, _lo, _hi in ((0, _top, _top + HALO),
                                    (HALO, _row0, _row0 + ftr),
                                    (HALO + ftr, _bot, _bot + HALO)):
                _a, _b = max(_lo, wf0), min(_hi, wf1)
                if _a < _b:
                    regs.append((_dst0 + _a - _lo, _a - wf0, _b - _a))
            if regs:
                overlays.append((_jj, regs))
        n_ovl = max(2 * len(r) for _, r in overlays)
    else:
        overlays = []
        n_ovl = 0

    def kernel(fields_ref, *rest):
        if logo_box is not None:
            win_ref, rest = rest[0], rest[1:]
        else:
            win_ref = None
        maxv_ref, out_ref, rest = rest[0], rest[1], rest[2:]
        if with_costs:
            costs_ref, rest = rest[0], rest[1:]
        else:
            costs_ref = None
        if logo_box is not None:
            slab_s, sems, wsems = rest
        else:
            slab_s, sems = rest
        j = pl.program_id(0)
        i = pl.program_id(1)
        nb = pl.num_programs(1)
        maxv = maxv_ref[0]

        def row_srcs(jj):
            row0_ = jj * ftr
            top = pl.multiple_of(jnp.maximum(row0_ - HALO, 0), HALO)
            bot = pl.multiple_of(jnp.minimum(row0_ + ftr, fh - HALO), HALO)
            return row0_, top, bot

        frow0, top_src, bot_src = row_srcs(j)

        # Slab ring: slab q = (tile j_q, frame f_q) with q = j_q*nb + f_q
        # holds ONE frame's tile rows. Consecutive steps share 2 of
        # their 3 temporal slabs, so steady state DMAs exactly ONE new
        # slab per step (3x less HBM input traffic than reloading the
        # prv/cur/nxt triple). A slab's last reader is step q+1 and its
        # slot is rewritten at step q+2, so a 4-slot ring is safe.
        # one copy per row region covers BOTH fields: field rows are
        # lane-merged (row = top|bottom), so the slab is contiguous
        def load3(dst, sem3, srcs, frame_idx):
            at = lambda sl: fields_ref.at[frame_idx, sl]
            dat = lambda sl: dst.at[sl]
            row0_, top, bot = srcs
            return [
                pltpu.make_async_copy(at(pl.ds(top, HALO)),
                                      dat(pl.ds(0, HALO)), sem3.at[0]),
                pltpu.make_async_copy(at(pl.ds(row0_, ftr)),
                                      dat(pl.ds(HALO, ftr)), sem3.at[1]),
                pltpu.make_async_copy(at(pl.ds(bot, HALO)),
                                      dat(pl.ds(HALO + ftr, HALO)),
                                      sem3.at[2]),
            ]

        def slab_copies(q):
            jq = jax.lax.div(q, nb)
            fq = jax.lax.rem(q, nb)
            slot = jax.lax.rem(q, 4)
            return load3(slab_s.at[slot], sems.at[slot], row_srcs(jq), fq)

        def start_q(q):
            for c in slab_copies(q):
                c.start()

        def wait_q(q):
            for c in slab_copies(q):
                c.wait()
            if overlays:
                overlay_q(q)

        def overlay_q(q):
            # DMA the erased logo window over the freshly loaded slab —
            # once per slab, immediately after its load completes (slabs
            # are waited exactly once; later steps reuse the patched
            # bytes).  The copies are tiny (<= a few KB each).
            jq = jax.lax.div(q, nb)
            fq = jax.lax.rem(q, nb)
            slot = jax.lax.rem(q, 4)
            for jj, regs in overlays:
                @pl.when(jq == jj)
                def _(regs=regs, fq=fq, slot=slot):
                    cs = []
                    for k, (dst0, src0, nr) in enumerate(regs):
                        for half, lane0 in ((0, x0a), (1, width + x0a)):
                            cs.append(pltpu.make_async_copy(
                                win_ref.at[fq, pl.ds(src0, nr),
                                           pl.ds(half * wa, wa)],
                                slab_s.at[slot, pl.ds(dst0, nr),
                                          pl.ds(lane0, wa)],
                                wsems.at[slot, 2 * k + half]))
                    for c in cs:
                        c.start()
                    for c in cs:
                        c.wait()

        step = j * nb + i
        total = njf * nb

        @pl.when(step == 0)
        def _():
            start_q(jnp.int32(0))
            start_q(jnp.int32(1))
            start_q(jnp.int32(2))

        @pl.when((step > 0) & (step + 2 < total))
        def _():
            start_q(step + 2)

        # each slab is waited exactly once, right before its first use:
        # frames 0 and 1 of a tile at that tile's first step, frame i+1
        # at step i (its nxt use)
        @pl.when(i == 0)
        def _():
            wait_q(step)

        @pl.when(i < nb - 1)
        def _():
            wait_q(step + 1)

        def pick(which):
            if which == "cur":
                q = step
            elif which == "prv":
                q = j * nb + jnp.maximum(i - 1, 0)
            else:
                q = j * nb + jnp.minimum(i + 1, nb - 1)
            return slab_s[jax.lax.rem(q, 4)]

        # widen the merged slab once, then lane-slice the field halves
        # (128-aligned static slices; no sublane movement). Only rows
        # [HALO-1, HALO+ftr+1) are ever read by yadif (+1 row below) or
        # the combing sums (+/-1 row) — widening just that ftr+2 window
        # instead of the full fsrows slab saves the halo conversions.
        cur8 = pick("cur")
        cw = slice(HALO - 1, HALO + ftr + 1)
        cur = cur8[cw].astype(jnp.int32).astype(jnp.float32)
        prv = pick("prv")[cw].astype(jnp.int32).astype(jnp.float32)
        ct8 = cur8[:, :width]
        ct = cur[:, :width]
        cb = cur[:, width:]
        pt = prv[:, :width]
        pb = prv[:, width:]

        gy_core = jax.lax.broadcasted_iota(jnp.int32, (ftr, 1), 0) + frow0

        if costs_only:
            # analysis pass: the deinterlaced output is never read, so the
            # source fields pass through and only the sums are computed
            out_ref[...] = cur8[HALO:HALO + ftr]
        else:
            nb_ = pick("nxt")[HALO:HALO + ftr, width:].astype(
                jnp.int32).astype(jnp.float32)
            # --- yadif: keep top field (u8 passthrough), reconstruct
            # bottom ----------------------------------------------------
            keep = ct[1:1 + ftr]
            below = ct[2:2 + ftr]
            below = jnp.where(gy_core == lh // 2 - 1, keep, below)
            best_pred = (keep + below) * 0.5
            best_score = jnp.abs(keep - below)
            for d in (1, 2):
                for sgn in (1, -1):
                    pa = _shift_w(keep, sgn * d)
                    pc = _shift_w(below, -sgn * d)
                    score = jnp.abs(pa - pc)
                    pred = (pa + pc) * 0.5
                    better = score < best_score
                    best_pred = jnp.where(better, pred, best_pred)
                    best_score = jnp.where(better, score, best_score)
            tp_ = pb[1:1 + ftr]
            tn_ = nb_
            temporal = (tp_ + tn_) * 0.5
            diff = jnp.abs(tp_ - tn_) * 0.5
            recon = jnp.clip(best_pred, temporal - diff, temporal + diff)
            recon8 = (
                jnp.clip(jnp.floor(recon + 0.5), 0.0, maxv)
                .astype(jnp.int32)
                .astype(jnp.uint8)
            )
            # merged write: kept top field | reconstructed bottom field
            out_ref[...] = jnp.concatenate(
                [ct8[HALO:HALO + ftr], recon8], axis=1)

        if not with_costs:
            return

        # --- field-match combing partial sums (same math as the frame-
        # layout kernel; field scratch row k = global field row
        # frow0 - HALO + k) ---------------------------------------------
        def shift_up(x):
            return jnp.concatenate([x[1:], x[-1:]], axis=0)

        def shift_down(x):
            return jnp.concatenate([x[:1], x[:-1]], axis=0)

        gy = jax.lax.broadcasted_iota(jnp.int32, (ftr + 2, 1), 0) \
            + (frow0 - 1)
        core = (gy >= frow0) & (gy < frow0 + ftr)
        col_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) < lw
        ).astype(jnp.float32)
        odd_valid = (core & (gy < lh // 2 - 1)).astype(jnp.float32) * col_ok
        even_valid = ((core & (gy >= 1)) & (gy < lh // 2)).astype(
            jnp.float32) * col_ok

        ct1 = shift_up(ct)
        pt1 = shift_up(pt)
        cbm1 = shift_down(cb)
        pbm1 = shift_down(pb)

        def fam_sums(t_y, b_y, t_y1, b_ym1):
            odd = jnp.maximum((t_y - b_y) * (t_y1 - b_y), 0.0) * odd_valid
            even = jnp.maximum((b_ym1 - t_y) * (b_y - t_y), 0.0) * even_valid
            return jnp.sum(odd + even)

        c_cur = fam_sums(ct, cb, ct1, cbm1)
        c_tp = fam_sums(ct, pb, ct1, pbm1)
        c_bt = fam_sums(pt, cb, pt1, cbm1)
        costs_ref[:, :] = jnp.concatenate([
            c_cur.reshape(1, 1), c_tp.reshape(1, 1), c_bt.reshape(1, 1),
            jnp.zeros((1, 125), jnp.float32),
        ], axis=1)

    def _call(erased, win, maxv, interpret):
        bsz, h_in, w_in = erased.shape
        assert h_in == height and w_in == width
        assert bsz >= 3, "fused filter needs batches of at least 3 frames"
        # frame -> lane-merged field planes: [B, H, W] -> [B, H/2, 2W] is a
        # FREE row-major view (row k = top row k | bottom row k); only the
        # 8-alignment pad rows cost a copy, and only when hp > height
        x = erased
        if hp > height:
            x = jnp.concatenate(
                [x, jnp.repeat(x[:, -1:], hp - height, axis=1)], axis=1)
        fields = x.reshape(bsz, fh, 2 * width)
        out_specs = [
            pl.BlockSpec((None, ftr, 2 * width), lambda j, i: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((bsz, fh, 2 * width), jnp.uint8)]
        if with_costs:
            out_specs.append(
                pl.BlockSpec((None, None, 1, 128), lambda j, i: (j, i, 0, 0),
                             memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((njf, bsz, 1, 128), jnp.float32))
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # merged fields
        args = [fields]
        if logo_box is not None:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # window
            args.append(win)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.reshape(maxv, (1,)))
        scratch = [
            pltpu.VMEM((4, fsrows, 2 * width), jnp.uint8),
            pltpu.SemaphoreType.DMA((4, 3)),
        ]
        if logo_box is not None:
            scratch.append(pltpu.SemaphoreType.DMA((4, n_ovl)))
        res = pl.pallas_call(
            kernel,
            grid=(njf, bsz),
            in_specs=tuple(in_specs),
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args)
        if with_costs:
            out_f, costs = res
        else:
            out_f, costs = res[0], None
        out = out_f.reshape(bsz, hp, width)[:, :height]  # free un-merge
        if costs is None:
            return out, None
        return out, costs[:, :, 0, :3].sum(axis=0) / ((lh - 2) * lw)

    @partial(jax.jit, static_argnames=("interpret",))
    def yadif_costs(erased, maxv, interpret=False):
        assert logo_box is None, "logo_box kernels take (frames, fades)"
        return _call(erased, None, maxv, interpret)

    @partial(jax.jit, static_argnames=("interpret",))
    def fused_logo(frames_u8, a_box, b_box, fades, maxv, interpret=False):
        """Logo erase + yadif + field-match in ONE device pass: the box
        is erased in XLA at box size ([B, 2*wfh, wa], a few MB), merged
        into field layout for free, and overlaid in-kernel — the full
        frames cross HBM exactly twice (slab in, filtered out).
        a_box/b_box are f32 [2*wfh, wa] slices of the full logo planes
        at `fused_logo.window` = (frame_y0, x0, frame_h, w)."""
        bsz = frames_u8.shape[0]
        box = jax.lax.slice(
            frames_u8, (0, 2 * wf0, x0a),
            (bsz, 2 * wf1, x0a + wa)).astype(jnp.float32)
        fade = fades[:, None, None]
        bg = a_box * box + b_box * maxv
        er = jnp.clip(jnp.floor(fade * bg + (1.0 - fade) * box + 0.5),
                      0.0, maxv).astype(jnp.uint8)
        win = er.reshape(bsz, wfh, 2 * wa)  # free field merge
        return _call(frames_u8, win, maxv, interpret)

    yadif_costs.yadif_costs = yadif_costs
    yadif_costs.ftr = ftr  # chosen field-tile rows (bench roofline model)
    if logo_box is not None:
        # erase+filter single-pass entry + the aligned frame-coord box
        # whose a/b logo-plane slices fused_logo expects
        fused_logo.window = (2 * wf0, x0a, 2 * wfh, wa)
        fused_logo.ftr = ftr
        yadif_costs.fused_logo = fused_logo
        return fused_logo
    return yadif_costs
