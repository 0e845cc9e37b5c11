"""Post-filter device kernels: QP-map deblocking, temporal NR, deband,
edge-level sharpening (the K* high-bit-depth filter chain).

The reference runs these as external CUDA AviSynth plugins configured by the
generated script (reference Server/Misc.cs:1403-1441: KDeblock with the
decoder-exported QP map, ConvertBits(14) -> KTemporalNR -> KDeband ->
KEdgeLevel -> ConvertBits(10); filter descriptions in README.md:424-449).
Semantics here follow those descriptions; all ops are batched [B, H, W]
float32 in a 14-bit value domain (0..16383) unless noted, matching the
reference's high-bit-depth intermediate processing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# QP-map deblocking (KDeblock semantics: frequency-space NR with the
# encoder's own quantisation parameters; README.md:424-430)
# ---------------------------------------------------------------------------

def _dct8_matrix(dtype=jnp.float32) -> jnp.ndarray:
    """Orthonormal 8-point DCT-II matrix."""
    import numpy as np

    k = np.arange(8)
    n = np.arange(8)
    m = np.cos(np.pi / 8 * (n[None, :] + 0.5) * k[:, None])
    m[0] *= 1 / np.sqrt(2)
    m *= np.sqrt(2 / 8)
    return jnp.asarray(m, dtype)


_DCT8 = _dct8_matrix()


@partial(jax.jit, static_argnames=("strength", "qp_block_scale"))
def deblock_qp(
    frames: jnp.ndarray,  # [B, H, W] (H, W multiples of 8)
    qp_map: jnp.ndarray,  # [B, H/16, W/16] per-macroblock quantiser scale
    strength: float = 1.0,
    qp_block_scale: int = 2,
) -> jnp.ndarray:
    """Soft-threshold 8x8 DCT coefficients by the quantisation step.

    Components quantised away during encoding cannot carry real detail, so
    coefficients below ~qp*strength are shrunk toward zero (the deblocking
    model described in README.md:424-430). Runs on the MXU: the 8x8 DCT is
    two dense 8x8 matmuls per block, batched over all blocks.

    qp_block_scale: 8-pixel blocks covered per qp_map cell along each axis
    (2 for luma - one 16x16 MB spans 2x2 blocks; 1 for 4:2:0 chroma, where
    one MB covers a single 8x8 chroma block).
    """
    b, h, w = frames.shape
    hb, wb = h // 8, w // 8
    blocks = frames.reshape(b, hb, 8, wb, 8).transpose(0, 1, 3, 2, 4)
    # DCT: D @ X @ D^T  (MXU-friendly batched 8x8 matmuls)
    coef = jnp.einsum(
        "ij,bhwjk,lk->bhwil", _DCT8, blocks, _DCT8, preferred_element_type=jnp.float32
    )
    # per-block threshold from the covering macroblock's QP
    s = qp_block_scale
    qp8 = jnp.repeat(jnp.repeat(qp_map, s, axis=1), s, axis=2)[:, :hb, :wb]
    thresh = qp8[..., None, None] * strength
    keep_dc = jnp.zeros((8, 8), bool).at[0, 0].set(True)
    mag = jnp.abs(coef)
    # soft shrinkage, DC untouched
    shrunk = jnp.sign(coef) * jnp.maximum(mag - thresh, 0.0)
    soft = jnp.where(mag < 2.0 * thresh, shrunk, coef)
    coef = jnp.where(keep_dc, coef, soft)
    # inverse DCT
    out = jnp.einsum(
        "ji,bhwjk,kl->bhwil", _DCT8, coef, _DCT8, preferred_element_type=jnp.float32
    )
    return out.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


# ---------------------------------------------------------------------------
# temporal stabilisation (KTemporalNR semantics: smooth dither-like temporal
# noise without smearing motion; README.md:435-437)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("radius",))
def temporal_nr(
    frames: jnp.ndarray,  # [B, H, W], B consecutive frames
    threshold: float = 64.0,  # 14-bit domain
    radius: int = 2,
) -> jnp.ndarray:
    """Average each pixel with temporal neighbours within +-radius frames,
    but only neighbours whose value differs by < threshold (motion guard)."""
    b = frames.shape[0]
    acc = frames
    cnt = jnp.ones_like(frames)
    for d in range(1, radius + 1):
        for sgn in (-1, 1):
            shifted = jnp.roll(frames, sgn * d, axis=0)
            # roll wraps; mask out-of-range frames at the ends
            idx = jnp.arange(b) + sgn * d
            valid_t = ((idx >= 0) & (idx < b))[:, None, None]
            ok = (jnp.abs(shifted - frames) < threshold) & valid_t
            acc = acc + jnp.where(ok, shifted, 0.0)
            cnt = cnt + ok.astype(frames.dtype)
    return acc / cnt


# ---------------------------------------------------------------------------
# banding reduction (KDeband semantics: the AviUtl banding-reduction filter;
# README.md:439-441 — randomised neighbour sampling + threshold blend)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("range_", "sample"))
def deband(
    frames: jnp.ndarray,  # [B, H, W] 14-bit domain
    seed: jnp.ndarray,  # scalar uint32
    threshold: float = 96.0,
    range_: int = 15,
    sample: int = 2,
    frame_offset=0,  # global index of frames[0] (shard/batch invariance)
) -> jnp.ndarray:
    """Blur flat gradients by averaging with randomly-offset nearby pixels.

    Samples symmetric +-(dy, dx) pairs (as the AviUtl filter does): on a
    linear gradient the pair average equals the centre value, so banding is
    smoothed without biasing or adding variance. A pair contributes only
    when both members are within the threshold.

    Randomness is derived per GLOBAL frame index (fold_in(seed, offset+i)),
    so the result is independent of batch boundaries and mesh sharding:
    a shard processing frames [k, k+b) with frame_offset=k produces bit-
    identical output to the single-device full-sequence call.

    TPU-native sampling: a fully independent per-pixel (dy, dx) field
    would be a general 2D gather — XLA lowers that to a scalar gather
    loop on TPU (~88 ms/frame measured at 1080, a ~1000x cliff vs the
    vector units).  Instead each sample step draws K candidate offsets
    from the seed (shared across the batch, like flash3kyuu_deband's
    static offset tables) and a per-frame random SELECTION field picks
    one candidate per pixel.  Candidates are realized as dynamic slices
    of the edge-padded frame (vectorized copies) and combined with
    per-pixel selects — no gather anywhere.  Spatially the offset field
    is still i.i.d. per pixel; its alphabet per step is K offsets, and
    the symmetric +-(dy, dx) pair-average property that removes banding
    without bias is unchanged."""
    b, h, w = frames.shape
    candidates = 8
    base = jax.random.PRNGKey(seed)
    fidx = jnp.arange(b) + frame_offset
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(fidx)
    acc = frames
    cnt = jnp.ones_like(frames)
    pad = range_
    padded = jnp.pad(frames, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    for s in range(sample):
        # K candidate offsets for this step: seed-only (batch/shard
        # invariant), distinct stream from the per-frame selection keys
        koff = jax.random.fold_in(jax.random.PRNGKey(seed ^ jnp.uint32(0x9E3779B9)), s)
        offs = jax.random.randint(koff, (candidates, 2),
                                  -range_, range_ + 1)
        split = jax.vmap(jax.random.split)(keys)  # [b, 2, 2]
        keys, ksel = split[:, 0], split[:, 1]
        sel = jax.vmap(
            lambda k: jax.random.randint(k, (h, w), 0, candidates))(ksel)
        n1 = jnp.zeros_like(frames)
        n2 = jnp.zeros_like(frames)
        for j in range(candidates):
            dy, dx = offs[j, 0], offs[j, 1]
            c1 = jax.lax.dynamic_slice(
                padded, (jnp.int32(0), pad + dy, pad + dx), (b, h, w))
            c2 = jax.lax.dynamic_slice(
                padded, (jnp.int32(0), pad - dy, pad - dx), (b, h, w))
            m = sel == j
            n1 = jnp.where(m, c1, n1)
            n2 = jnp.where(m, c2, n2)
        ok = (jnp.abs(n1 - frames) < threshold) & (jnp.abs(n2 - frames) < threshold)
        okf = ok.astype(frames.dtype)
        acc = acc + jnp.where(ok, n1 + n2, 0.0)
        cnt = cnt + 2.0 * okf
    return acc / cnt


# ---------------------------------------------------------------------------
# edge-level sharpening (KEdgeLevel semantics: AviUtl edge-level with
# upper/lower thresholds + repair; README.md:443-449)
# ---------------------------------------------------------------------------

@jax.jit
def edge_level(
    frames: jnp.ndarray,  # [B, H, W] 14-bit domain
    strength: float = 10.0,
    lower_thresh: float = 128.0,  # skip edges blurrier than this
    upper_thresh: float = 2048.0,  # skip edges already sharper than this
) -> jnp.ndarray:
    """Sharpen medium-strength edges only (ref README.md:443-448):
    - edges above upper_thresh are already sharp (text): leave them alone
      to keep their anti-aliasing
    - edges below lower_thresh are intentional blur: leave them alone
    - clamp the result to the local min/max (RgTools-Repair-like guard)
    """
    p = jnp.pad(frames, ((0, 0), (1, 1), (1, 1)), mode="edge")
    c = p[:, 1:-1, 1:-1]
    up = p[:, :-2, 1:-1]
    dn = p[:, 2:, 1:-1]
    lf = p[:, 1:-1, :-2]
    rt = p[:, 1:-1, 2:]
    gx = rt - lf
    gy = dn - up
    grad = jnp.abs(gx) + jnp.abs(gy)
    lap = (up + dn + lf + rt) * 0.25 - c
    apply = (grad > lower_thresh) & (grad < upper_thresh)
    sharp = c - lap * (strength / 16.0)
    # repair: clamp into the 4-neighbour min/max envelope
    nmin = jnp.minimum(jnp.minimum(up, dn), jnp.minimum(lf, rt))
    nmax = jnp.maximum(jnp.maximum(up, dn), jnp.maximum(lf, rt))
    repaired = jnp.clip(sharp, jnp.minimum(nmin, c), jnp.maximum(nmax, c))
    return jnp.where(apply, repaired, c)


# ---------------------------------------------------------------------------
# bit-depth staging (ConvertBits(14) ... ConvertBits(10); README.md:433)
# ---------------------------------------------------------------------------

@jax.jit
def to_14bit(frames_8bit: jnp.ndarray) -> jnp.ndarray:
    return frames_8bit.astype(jnp.float32) * 64.0


@jax.jit
def to_10bit(frames_14bit: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.floor(frames_14bit / 16.0 + 0.5), 0.0, 1023.0)


def hbd_filter_chain(
    frames_8bit: jnp.ndarray,
    seed: jnp.ndarray,
    enable_tnr: bool = True,
    enable_deband: bool = True,
    enable_edge: bool = False,
) -> jnp.ndarray:
    """The reference's high-bit-depth chain: 8 -> 14 bit, KTemporalNR,
    KDeband, KEdgeLevel, -> 10 bit (Server/Misc.cs:1403-1441)."""
    x = to_14bit(frames_8bit)
    if enable_tnr:
        x = temporal_nr(x)
    if enable_deband:
        x = deband(x, seed)
    if enable_edge:
        x = edge_level(x)
    return to_10bit(x)
