"""Slice-type decision: lowres frame cost + scenecut (encoder/slicetype.c).

The reference runs a half-resolution cost pass per frame (DIA ME with
subpel refinement on the lowres pyramid + 8x8c intra, slicetype.c:48-222),
then a scenecut test (:324-367) and keyint logic (:438-604). The TPU
build computes the lowres cost as batched kernels over the 8x8 block
grid: exhaustive ±8 full-pel SAD (≥ DIA quality), subpel refinement on
the 4 phase-shifted lowres planes (the pyramid doubles as the hpel set,
mc.c:404-460), the mv0 fast-skip (<64 → skip, :117-124), the
reference's exact cost adjustments (mvcost at LOOKAHEAD_QP λ=1, −1, +5
for nonzero MV) and the 8x8c V/H/DC intra with intra_penalty 5 +
lowres_penalty 4 (:150-180).

The scenecut bias formula and keyint_min/max rules match :338-366.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params as P
from ..ops import mc as MC
from ..ops import mcgather as MG
from ..ops import pixel as PX

LOOKAHEAD_QP = 12
_LOWRES_PENALTY = 4    # slicetype.c:69
_INTRA_PENALTY = 5     # slicetype.c:153
_R = 8  # lowres search range (mv_min/max_fpel span in slicetype.c:77-90)
_MLOW = 10             # lowres window margin (±8 fullpel + subpel drift)
_WINLOW = 8 + 2 * _MLOW


@functools.partial(jax.jit, static_argnames=("bw", "bh"))
def lowres_costs(fenc_low, fref_low4, bw: int, bh: int):
    """Per-8x8-block (icost, bcost) on the lowres planes
    (x264_slicetype_mb_cost, slicetype.c:48-222).
    fenc_low: (H/2, W/2) int32; fref_low4: (4, H/2, W/2) lowres pyramid
    (phase planes = the lowres hpel set)."""
    H, W = bh * 8, bw * 8
    B = bh * bw
    f = fenc_low.astype(jnp.int32)
    r0 = jnp.pad(fref_low4[0].astype(jnp.int32), _R + 8, mode="edge")

    # inter full-pel: exhaustive ±R window SAD (≥ the reference's DIA)
    def one_offset(k, state):
        best, bestk, sad0 = state
        dy = k // (2 * _R + 1) - _R
        dx = k % (2 * _R + 1) - _R
        win = jax.lax.dynamic_slice(r0, (_R + 8 + dy, _R + 8 + dx), (H, W))
        ad = jnp.abs(f - win)
        tile = ad.reshape(bh, 8, bw, 8).sum(axis=(1, 3))
        # λ=1 mv-bits bias around mvp≈0 (cost_mv[LOOKAHEAD_QP])
        bias = MVBITS_LOW[jnp.abs(dx)] + MVBITS_LOW[jnp.abs(dy)]
        c = tile + bias
        take = c < best
        best = jnp.where(take, c, best)
        bestk = jnp.where(take, k, bestk)
        sad0 = jnp.where(jnp.logical_and(dy == 0, dx == 0), tile, sad0)
        return best, bestk, sad0

    big = jnp.full((bh, bw), 1 << 28, jnp.int32)
    best, bestk, sad0 = jax.lax.fori_loop(
        0, (2 * _R + 1) ** 2, one_offset,
        (big, jnp.zeros((bh, bw), jnp.int32), big))
    mvx = (bestk % (2 * _R + 1) - _R) * 4   # qpel units on lowres
    mvy = (bestk // (2 * _R + 1) - _R) * 4

    # subpel refine on the lowres pyramid (refine_subpel recipe, subme-1)
    pad = jnp.pad(fref_low4.astype(jnp.int32),
                  ((0, 0), (_MLOW + 4, _MLOW + 4), (_MLOW + 4, _MLOW + 4)),
                  mode="edge")
    w = MG._tile_windows(pad, bh, 8, _WINLOW, 4, axis=1)
    w = MG._tile_windows(w, bw, 8, _WINLOW, 4, axis=3)
    wins4 = w.transpose(1, 3, 0, 2, 4).reshape(B, 4, _WINLOW, _WINLOW)
    wins4 = wins4.astype(jnp.bfloat16)
    fblk = f.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(B, 8, 8)

    def try_mv(state, dmx, dmy, qpel_gate):
        bc, bx, by = state
        mx = jnp.clip(bx + dmx, -4 * (_MLOW - 1), 4 * (_MLOW - 1) - 1)
        my = jnp.clip(by + dmy, -4 * (_MLOW - 1), 4 * (_MLOW - 1) - 1)
        qidx = ((my & 3) << 2) + (mx & 3)
        p0 = MG._HPEL_REF0_J[qidx]
        p1 = MG._HPEL_REF1_J[qidx]
        fy = (my >> 2) + _MLOW
        fx = (mx >> 2) + _MLOW
        y1 = fy + ((my & 3) == 3).astype(jnp.int32)
        x2 = fx + ((mx & 3) == 3).astype(jnp.int32)
        src1 = MG._select_block(MG._plane_select(wins4, p0), y1, fx, 8, 8)
        src2 = MG._select_block(MG._plane_select(wins4, p1), fy, x2, 8, 8)
        avg = ((src1 + src2 + 1.0) * 0.5).astype(jnp.int32)
        blk = jnp.where((qidx & 5)[:, None, None] != 0, avg,
                        src1.astype(jnp.int32))
        c = (jnp.abs(fblk - blk).sum((1, 2))
             + MVBITS_LOW4[jnp.clip(jnp.abs(mx), 0, 127)]
             + MVBITS_LOW4[jnp.clip(jnp.abs(my), 0, 127)])
        better = c < bc
        return (jnp.where(better, c, bc), jnp.where(better, mx, bx),
                jnp.where(better, my, by))

    bc = best.reshape(B)
    bx = mvx.reshape(B)
    by = mvy.reshape(B)
    state = (bc, bx, by)
    for dmx, dmy in ((0, -2), (0, 2), (-2, 0), (2, 0)):
        state = try_mv(state, dmx, dmy, False)
    for dmx, dmy in ((0, -1), (0, 1), (-1, 0), (1, 0)):
        state = try_mv(state, dmx, dmy, True)
    bc, bx, by = state
    # cost adjustments (slicetype.c:131-134): −1, +5 when mv != 0
    mcost = bc - 1 + jnp.where((bx != 0) | (by != 0), 5, 0)
    # mv0 fast-skip (:117-124): SAD(0,0) < 64 → use it as-is
    sad0f = sad0.reshape(B)
    mcost = jnp.where(sad0f < 64, sad0f, mcost)
    pcost = mcost.reshape(bh, bw) + _LOWRES_PENALTY

    # intra: 8x8c V/H/DC from the row above / column left of each block
    # (intra_mbcmp_x3_8x8c on the fenc lowres, slicetype.c:150-180)
    fp = jnp.pad(f, ((1, 0), (1, 0)), mode="edge")  # fp[y+1,x+1] = f[y,x]
    blocks = f.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)    # (bh,bw,8,8)
    top_blk = fp[0:H:8, 1:].reshape(bh, bw, 8)                # row above
    left_blk = fp[1:, 0:W:8].reshape(bh, 8, bw).transpose(0, 2, 1)

    v_pred = jnp.broadcast_to(top_blk[:, :, None, :], blocks.shape)
    h_pred = jnp.broadcast_to(left_blk[:, :, :, None], blocks.shape)
    dc = (top_blk.sum(-1) + left_blk.sum(-1) + 8) >> 4
    d_pred = jnp.broadcast_to(dc[:, :, None, None], blocks.shape)
    sadv = jnp.abs(blocks - v_pred).sum(axis=(-1, -2))
    sadh = jnp.abs(blocks - h_pred).sum(axis=(-1, -2))
    sadd = jnp.abs(blocks - d_pred).sum(axis=(-1, -2))
    icost = (jnp.minimum(jnp.minimum(sadv, sadh), sadd)
             + _INTRA_PENALTY + _LOWRES_PENALTY)

    return icost, jnp.minimum(pcost, icost)


# λ=1 mv-bits at LOOKAHEAD_QP: bits of one mv component, fullpel index
_MVB = np.ones(128, np.int32)
_d = np.arange(1, 128)
_MVB[1:] = (np.log2(_d * 4 + 1.0) * 2 + 1.718 + 0.5).astype(np.int32)
MVBITS_LOW = jnp.asarray(_MVB)     # indexed by |fullpel|
_MVB4 = np.ones(128, np.int32)
_d4 = np.arange(1, 128)
_MVB4[1:] = (np.log2(_d4 + 1.0) * 2 + 1.718 + 0.5).astype(np.int32)
MVBITS_LOW4 = jnp.asarray(_MVB4)   # indexed by |qpel|


class SlicetypeDecider:
    """GOP/IDR decision state (x264_slicetype_decide, slicetype.c:438)."""

    def __init__(self, param: P.Param):
        self.param = param
        self.last_keyframe = -(1 << 30)
        self.prev_lowres = None
        self.frame_idx = 0

    def decide(self, fenc_y: np.ndarray):
        """Returns (slice_type, is_idr, frame_cost) for the next frame and
        advances state. fenc_y: padded luma plane."""
        p = self.param
        h, w = fenc_y.shape
        bw, bh = w // 16, h // 16
        low4 = MC.lowres_planes(jnp.asarray(fenc_y))
        low = low4[0]

        gop = self.frame_idx - self.last_keyframe
        force_i = gop >= p.i_keyint_max or self.prev_lowres is None

        if self.prev_lowres is None:
            icost, _ = lowres_costs(low, low4, bw=bw, bh=bh)
            cost = int(np.asarray(icost.sum()))
            sc = True
            cmap = icost
        else:
            icost, pcost = lowres_costs(low, self.prev_lowres, bw=bw, bh=bh)
            isum = int(np.asarray(icost.sum()))
            psum = int(np.asarray(pcost.sum()))
            sc = self._scenecut(isum, psum, gop)
            cost = isum if (force_i or sc) else psum
            cmap = icost if (force_i or sc) else pcost

        is_key = force_i or (sc and self.param.i_scenecut_threshold > 0
                             and gop >= max(self.param.i_keyint_min, 1))
        slice_type = P.SLICE_TYPE_I if is_key else P.SLICE_TYPE_P
        if is_key:
            self.last_keyframe = self.frame_idx
        self.prev_lowres = low4   # full pyramid: lowres hpel for the ME
        self.frame_idx += 1
        # per-MB-row lowres cost (fdec->i_row_satd twin filled by
        # x264_rc_analyse_slice, slicetype.c:605-642) for row-VBV
        self.row_costs = np.asarray(cmap).reshape(bh, -1).sum(axis=1) \
            .astype(np.int64)
        return slice_type, is_key, cost

    def _scenecut(self, icost: int, pcost: int, gop: int) -> bool:
        """scenecut (slicetype.c:324-367)."""
        p = self.param
        tmax = p.i_scenecut_threshold
        if tmax <= 0:
            return False
        tmin = tmax >> 2
        if p.i_keyint_min == p.i_keyint_max:
            tmin = tmax
        if gop <= (p.i_keyint_min >> 2):
            bias = tmin >> 2
        elif gop <= p.i_keyint_min:
            bias = tmin * gop // p.i_keyint_min
        else:
            bias = tmin + (tmax - tmin) * (gop - p.i_keyint_min) \
                // max(p.i_keyint_max - p.i_keyint_min, 1)
        return 100 * pcost >= (100 - bias) * icost
