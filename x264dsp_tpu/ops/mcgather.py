"""Batched motion compensation via per-MB reference windows.

TPU gathers/scatters are per-element (see ops/pallas/deblock_filter.py for
the same finding on deblock), so the per-MB ``vmap(dynamic_slice)``
formulation of mc_luma (common/mc.c:216-264) is the P-pipeline's
bottleneck. This module replaces it:

1. ``luma_windows`` re-lays the 4 padded hpel planes into one per-MB
   search window tensor (B, 4, WIN, WIN) with *static* slicing only
   (windows at stride 16 are a reshape + shifted concats — no gather).
2. ``mc_luma_batched`` compensates an arbitrary per-MB qpel MV list by
   selecting the (bh, bw) block out of each window with one-hot
   row/column selector matmuls on the MXU. 0/1 selectors times pixel
   values <= 255 are exact in bf16 with f32 accumulation.

The same scheme serves chroma (1/8-pel bilinear needs a (bh+1, bw+1)
block). Block sizes are static so the P partition sizes (16x16, 16x8,
8x16, 8x8 — encoder/analyse.c:864-1057) all route through one code path.

MV coverage: window margin M fullpel on each side. All candidate MVs must
satisfy (mv >> 2) in [-M, M - 1 - adj]; callers clamp/gate candidates
(me.c's search is bounded by i_me_range anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import mc as MC
from ._lazyconst import LazyConst

# luma window margin (fullpel) and size; covers the +-16 fullpel search,
# +-3 qpel refine drift and the clipped-MVP candidate (clamped by callers)
M_LUMA = 20
WIN_L = 16 + 2 * M_LUMA          # 56
# chroma margin: |mv| <= 4*(M_LUMA-1) qpel -> mv>>3 in [-10, 10]
M_CHROMA = 11
WIN_C = 8 + 2 * M_CHROMA + 2     # 32 (bilinear needs a 9x9 block)

_HPEL_REF0_J = LazyConst(MC.HPEL_REF0)
_HPEL_REF1_J = LazyConst(MC.HPEL_REF1)


def _tile_windows(plane, n_tiles: int, tile: int, win: int, start: int,
                  axis: int):
    """Static window relayout along one axis: windows of size `win` at
    stride `tile` starting at `start`. plane's axis length must cover
    start + (n_tiles - 1) * tile + win. Returns windows stacked on a new
    axis before `axis`."""
    extra = win - tile
    k = (extra + tile - 1) // tile            # whole extra tiles needed
    length = (n_tiles + k) * tile
    sl = [slice(None)] * plane.ndim
    sl[axis] = slice(start, start + length)
    ext = plane[tuple(sl)]
    new_shape = list(ext.shape)
    new_shape[axis:axis + 1] = [n_tiles + k, tile]
    ext = ext.reshape(new_shape)              # (..., n_tiles+k, tile, ...)
    parts = []
    for i in range(k + 1):
        sl2 = [slice(None)] * ext.ndim
        sl2[axis] = slice(i, i + n_tiles)
        part = ext[tuple(sl2)]
        if i == k and extra % tile:
            sl3 = [slice(None)] * ext.ndim
            sl3[axis + 1] = slice(0, extra - (k - 1) * tile)
            part = part[tuple(sl3)]
        parts.append(part)
    return jnp.concatenate(parts, axis=axis + 1)


def luma_windows(ref4, mb_w: int, mb_h: int):
    """ref4: (4, Hp, Wp) padded planes from mc.make_ref_planes.
    Returns (mb_h*mb_w, 4, WIN_L, WIN_L) bf16 per-MB windows covering
    fullpel offsets in [-M_LUMA, M_LUMA). On TPU the relayout runs in
    the Pallas strip kernel (ops/pallas/windows.py) — the XLA 5-D
    transpose lowers ~30x below HBM speed; this path is its
    bit-identical twin/fallback."""
    if jax.default_backend() == "tpu":
        from .pallas.windows import luma_windows_pallas
        return luma_windows_pallas(ref4, mb_w, mb_h, M_LUMA, MC.PAD_MC)
    start = MC.PAD_MC - M_LUMA
    w = _tile_windows(ref4, mb_h, 16, WIN_L, start, axis=1)
    # w: (4, mb_h, WIN_L, Wp)
    w = _tile_windows(w, mb_w, 16, WIN_L, start, axis=3)
    # w: (4, mb_h, WIN_L, mb_w, WIN_L)
    w = w.transpose(1, 3, 0, 2, 4).reshape(mb_h * mb_w, 4, WIN_L, WIN_L)
    return w.astype(jnp.bfloat16)


def chroma_windows(refc, mb_w: int, mb_h: int):
    """refc: (Hp/2, Wp/2) padded chroma plane (mc.pad_chroma).
    Returns (mb_h*mb_w, WIN_C, WIN_C) bf16 (Pallas on TPU, see
    luma_windows)."""
    if jax.default_backend() == "tpu":
        from .pallas.windows import chroma_windows_pallas
        return chroma_windows_pallas(refc, mb_w, mb_h, M_CHROMA,
                                     MC.PAD_MC // 2)
    start = MC.PAD_MC // 2 - M_CHROMA
    w = _tile_windows(refc, mb_h, 8, WIN_C, start, axis=0)
    w = _tile_windows(w, mb_w, 8, WIN_C, start, axis=2)
    # w: (mb_h, WIN_C, mb_w, WIN_C)
    return w.transpose(0, 2, 1, 3).reshape(
        mb_h * mb_w, WIN_C, WIN_C).astype(jnp.bfloat16)


def _onehot(off, n_sel: int, n_src: int):
    """(B, n_sel, n_src) bf16 with [b, r, c] = (c == off[b] + r)."""
    c = jax.lax.broadcasted_iota(jnp.int32, (1, n_sel, n_src), 2)
    tgt = off[:, None, None] + jnp.arange(n_sel)[None, :, None]
    return (c == tgt).astype(jnp.bfloat16)


def _select_block(wins, row_off, col_off, bh: int, bw: int):
    """wins: (B, W, W) bf16; returns (B, bh, bw) f32 via two one-hot
    matmuls (rows then cols) on the MXU."""
    Wn = wins.shape[-1]
    R = _onehot(row_off, bh, Wn)                       # (B, bh, W)
    rows = jax.lax.dot_general(R, wins, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    C = _onehot(col_off, bw, Wn)                       # (B, bw, W)
    blk = jax.lax.dot_general(
        rows.astype(jnp.bfloat16), C, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (B, bh, bw)
    return blk


def _plane_select(wins4, p):
    """wins4: (B, 4, W, W) bf16, p: (B,) plane idx -> (B, W, W) bf16."""
    oh = (jnp.arange(4)[None, :] == p[:, None]).astype(jnp.bfloat16)
    return jnp.einsum("bp,bpij->bij", oh, wins4)


def clamp_qpel(mv, margin: int = M_LUMA):
    """Clamp a qpel MV component list into the window-covered range."""
    return jnp.clip(mv, -4 * (margin - 1), 4 * (margin - 1) - 1)


def extract_windows4(wins4, base_x, base_y, bh: int, bw: int, m: int,
                     sub_y: int = 0, sub_x: int = 0):
    """Re-center per-MB hpel windows around a decided full-pel MV: from
    (B, 4, WIN_L, WIN_L) to (B, 4, bh+2m, bw+2m) windows whose center
    block is the (bh, bw) block at full-pel (base_y, base_x) + the
    static (sub_y, sub_x) partition offset. One pair of one-hot
    selector matmuls (exact for pixel values in bf16) — the subpel
    diamond iterations then read these small tensors instead of the
    full window tensor every step (~205 MB/read at 1080p). base must
    satisfy |base| <= M_LUMA - m (callers' search range guarantees it)."""
    B, _, Wn, _ = wins4.shape
    rows_n = bh + 2 * m
    cols_n = bw + 2 * m
    wf = wins4.reshape(B, 4 * Wn, Wn)
    r0 = base_y + (M_LUMA + sub_y - m)
    tgt_r = (r0[:, None, None]
             + (jnp.arange(4) * Wn)[None, :, None]
             + jnp.arange(rows_n)[None, None, :]).reshape(B, 4 * rows_n)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * rows_n, 4 * Wn), 2)
    R = (iota_r == tgt_r[:, :, None]).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(R, wf, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    c0 = base_x + (M_LUMA + sub_x - m)
    tgt_c = c0[:, None] + jnp.arange(cols_n)[None, :]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, Wn, cols_n), 1)
    Cm = (iota_c == tgt_c[:, None, :]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(rows.astype(jnp.bfloat16), Cm,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    return out.reshape(B, 4, rows_n, cols_n).astype(jnp.bfloat16)


def mc_luma_batched(wins4, mvx, mvy, bh: int, bw: int,
                    sub_y: int = 0, sub_x: int = 0,
                    margin: int = M_LUMA):
    """Batched mc_luma (common/mc.c:216-240) over per-MB windows.
    wins4: (B, 4, W, W) with W = bh-or-16 + 2*margin; mvx/mvy: (B,) qpel
    MVs relative to the window's center block origin; (sub_y, sub_x):
    static partition offset inside the MB (pre-folded into recentered
    windows, see extract_windows4). Returns (B, bh, bw) int32."""
    qidx = ((mvy & 3) << 2) + (mvx & 3)
    p0 = _HPEL_REF0_J[qidx]
    p1 = _HPEL_REF1_J[qidx]
    fy = (mvy >> 2) + margin + sub_y
    fx = (mvx >> 2) + margin + sub_x
    y1 = fy + ((mvy & 3) == 3).astype(jnp.int32)
    x2 = fx + ((mvx & 3) == 3).astype(jnp.int32)
    w0 = _plane_select(wins4, p0)
    src1 = _select_block(w0, y1, fx, bh, bw)
    w1 = _plane_select(wins4, p1)
    src2 = _select_block(w1, fy, x2, bh, bw)
    avg = ((src1 + src2 + 1.0) * 0.5).astype(jnp.int32)
    return jnp.where((qidx & 5)[:, None, None] != 0, avg,
                     src1.astype(jnp.int32))


def mc_luma_multi(wins4, mvx, mvy, bh: int, bw: int, sub_y=0, sub_x=0,
                  margin: int = M_LUMA):
    """Batched-candidate mc_luma: mvx/mvy (B, C) qpel MVs -> (B, C, bh,
    bw) int32. ONE plane+row selection matmul over the plane-stacked
    window serves all C candidates and both qpel source planes — the
    (B, 4, W, W) window tensor is read once per call instead of 2C
    times (the HBM read dominates: ~205 MB at 1080p).
    sub_y/sub_x: static ints or (C,)-arrays of partition offsets.
    margin: the window's fullpel margin (M_LUMA for luma_windows output,
    the extract_windows4 `m` for recentered windows)."""
    B, _, Wn, _ = wins4.shape
    C = mvx.shape[1]
    wf = wins4.reshape(B, 4 * Wn, Wn)
    qidx = ((mvy & 3) << 2) + (mvx & 3)                # (B, C)
    p0 = _HPEL_REF0_J[qidx]
    p1 = _HPEL_REF1_J[qidx]
    sy = jnp.asarray(sub_y)[None, :] if np.ndim(sub_y) else sub_y
    sx = jnp.asarray(sub_x)[None, :] if np.ndim(sub_x) else sub_x
    fy = (mvy >> 2) + margin + sy
    fx = (mvx >> 2) + margin + sx
    y1 = fy + ((mvy & 3) == 3).astype(jnp.int32)
    x2 = fx + ((mvx & 3) == 3).astype(jnp.int32)

    # row selector (B, C*2*bh, 4W): slot (c, s, r) reads plane
    # [p0,p1][s], row [y1,fy][s] + r (mc_luma src1 = (p0, y1, fx),
    # src2 = (p1, fy, x2), common/mc.c:216-240)
    row0 = jnp.stack([p0 * Wn + y1, p1 * Wn + fy], axis=-1)  # (B, C, 2)
    tgt_r = row0[..., None] + jnp.arange(bh)           # (B, C, 2, bh)
    tgt_r = tgt_r.reshape(B, C * 2 * bh)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, C * 2 * bh, 4 * Wn), 2)
    R = (iota_r == tgt_r[:, :, None]).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(R, wf, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)

    # column selector (B, W, C*2*bw); the full product computes all
    # (slot, col-slot) pairs — tiny — and the C*2 diagonal blocks are
    # static slices
    col0 = jnp.stack([fx, x2], axis=-1)                # (B, C, 2)
    tgt_c = (col0[..., None] + jnp.arange(bw)).reshape(B, C * 2 * bw)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, Wn, C * 2 * bw), 1)
    Cm = (iota_c == tgt_c[:, None, :]).astype(jnp.bfloat16)
    full = jax.lax.dot_general(
        rows.astype(jnp.bfloat16), Cm, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (B, C2bh, C2bw)
    blocks = jnp.stack(
        [full[:, k * bh:(k + 1) * bh, k * bw:(k + 1) * bw]
         for k in range(C * 2)], axis=1).reshape(B, C, 2, bh, bw)
    src1 = blocks[:, :, 0]
    src2 = blocks[:, :, 1]
    avg = ((src1 + src2 + 1.0) * 0.5).astype(jnp.int32)
    return jnp.where((qidx & 5)[..., None, None] != 0, avg,
                     src1.astype(jnp.int32))


def mc_chroma_batched(winsc, mvx, mvy, bh: int, bw: int,
                      sub_y: int = 0, sub_x: int = 0):
    """Batched mc_chroma (common/mc.c:295-323): 1/8-pel bilinear.
    winsc: (B, WIN_C, WIN_C) bf16; mv in luma qpel units (== chroma
    1/8-pel). Returns (B, bh, bw) int32."""
    d8x = mvx & 7
    d8y = mvy & 7
    cA = ((8 - d8x) * (8 - d8y))[:, None, None]
    cB = (d8x * (8 - d8y))[:, None, None]
    cC = ((8 - d8x) * d8y)[:, None, None]
    cD = (d8x * d8y)[:, None, None]
    fy = (mvy >> 3) + M_CHROMA + sub_y
    fx = (mvx >> 3) + M_CHROMA + sub_x
    win = _select_block(winsc, fy, fx, bh + 1, bw + 1).astype(jnp.int32)
    s00 = win[:, 0:bh, 0:bw]
    s01 = win[:, 0:bh, 1:bw + 1]
    s10 = win[:, 1:bh + 1, 0:bw]
    s11 = win[:, 1:bh + 1, 1:bw + 1]
    return (cA * s00 + cB * s01 + cC * s10 + cD * s11 + 32) >> 6


# ---------------------------------------------------------------------------
# MB <-> coding-order 4x4 block relayout (replaces fancy-index gathers)
# ---------------------------------------------------------------------------

def _block4_origin(i: int):
    """Coding-order block i (scan8 order, common/common.h:140-186):
    quadrant i>>2, raster i&3 inside. Returns its (row, col) in the MB."""
    q, b = i >> 2, i & 3
    return ((q >> 1) * 8 + (b >> 1) * 4, (q & 1) * 8 + (b & 1) * 4)


def mb_to_blocks4(mb):
    """(..., 16, 16) -> (..., 16, 4, 4) in coding (quadrant) order. Built
    from 16 static slices + one stack: minor-dim transposes lower to
    per-element relayouts on TPU (~28 ms at 1080p), slices+stack to
    vector copies (~0 ms)."""
    blocks = []
    for i in range(16):
        r0, c0 = _block4_origin(i)
        blocks.append(mb[..., r0:r0 + 4, c0:c0 + 4])
    return jnp.stack(blocks, axis=-3)


def blocks4_to_mb(blk):
    """(..., 16, 4, 4) coding order -> (..., 16, 16), by concat (see
    mb_to_blocks4 for why not a transpose)."""
    rows = []
    for qy in range(2):
        for by in range(2):
            row = [blk[..., ((qy * 2 + qx) * 4 + by * 2 + bx), :, :]
                   for qx in range(2) for bx in range(2)]
            rows.append(jnp.concatenate(row, axis=-1))
    return jnp.concatenate(rows, axis=-2)


def blocks4_grid(vals, mb_h: int, mb_w: int):
    """(mb_h, mb_w, 16) per-4x4-block values in coding order ->
    (mb_h*4, mb_w*4) frame-level 4x4-block grid (pure relayout)."""
    t = vals.reshape(mb_h, mb_w, 2, 2, 2, 2)  # (.., qy, qx, by, bx)
    t = t.transpose(0, 2, 4, 1, 3, 5)         # (mb_h, qy, by, mb_w, qx, bx)
    return t.reshape(mb_h * 4, mb_w * 4)
