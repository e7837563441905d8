"""Slice-type decision: lowres frame cost + scenecut (encoder/slicetype.c).

The reference runs a half-resolution cost pass per frame (DIA/subme2 ME on
the lowres pyramid + 8x8c-style intra, slicetype.c:48-222), then a
scenecut test (:324-367) and keyint logic (:438-604). The TPU build
computes the lowres cost as ONE batched kernel over the 8x8 block grid:
exhaustive ±8 full-pel SAD on the lowres plane (≥ DIA quality) plus a
V/H/DC intra fallback with the reference's lowres penalty. Subpel lowres
refinement is an acknowledged approximation (affects RC input, not the
bitstream).

The scenecut bias formula and keyint_min/max rules match :338-366.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params as P
from ..ops import mc as MC
from ..ops import pixel as PX

LOOKAHEAD_QP = 12
_LOWRES_PENALTY = 4
_R = 8  # lowres search range (mv_min/max_fpel span in slicetype.c:77-90)


@functools.partial(jax.jit, static_argnames=("bw", "bh"))
def lowres_costs(fenc_low, fref_low, bw: int, bh: int):
    """Per-8x8-block (icost, pcost) on the lowres planes.
    fenc_low/fref_low: (H/2, W/2) int32, block grid bh x bw."""
    H, W = bh * 8, bw * 8
    f = fenc_low.astype(jnp.int32)
    r = jnp.pad(fref_low.astype(jnp.int32), _R + 8, mode="edge")

    # inter: exhaustive ±R window SAD
    def one_offset(k, best):
        dy = k // (2 * _R + 1) - _R
        dx = k % (2 * _R + 1) - _R
        win = jax.lax.dynamic_slice(r, (_R + 8 + dy, _R + 8 + dx), (H, W))
        ad = jnp.abs(f - win)
        tile = ad.reshape(bh, 8, bw, 8).sum(axis=(1, 3))
        return jnp.minimum(best, tile)

    pcost = jax.lax.fori_loop(0, (2 * _R + 1) ** 2, one_offset,
                              jnp.full((bh, bw), 1 << 28, jnp.int32))

    # intra: V/H/DC from the row above / column left of each block
    # (lookahead predicts from the fenc lowres itself, slicetype.c:150-180)
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
    icost = jnp.minimum(jnp.minimum(sadv, sadh), sadd) + _LOWRES_PENALTY

    return icost, jnp.minimum(pcost, icost)


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
        low = MC.lowres_planes(jnp.asarray(fenc_y))[0]

        gop = self.frame_idx - self.last_keyframe
        force_i = gop >= p.i_keyint_max or self.prev_lowres is None

        if self.prev_lowres is None:
            icost, _ = lowres_costs(low, low, bw=bw, bh=bh)
            cost = int(np.asarray(icost.sum()))
            sc = True
        else:
            icost, pcost = lowres_costs(low, self.prev_lowres, bw=bw, bh=bh)
            isum = int(np.asarray(icost.sum()))
            psum = int(np.asarray(pcost.sum()))
            sc = self._scenecut(isum, psum, gop)
            cost = isum if (force_i or sc) else psum

        is_key = force_i or (sc and self.param.i_scenecut_threshold > 0
                             and gop >= max(self.param.i_keyint_min, 1))
        slice_type = P.SLICE_TYPE_I if is_key else P.SLICE_TYPE_P
        if is_key:
            self.last_keyframe = self.frame_idx
        self.prev_lowres = low
        self.frame_idx += 1
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
