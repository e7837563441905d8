"""Slice-type decision: lowres frame cost + scenecut (encoder/slicetype.c).

The reference runs a half-resolution cost pass per frame — forced
DIA/subme-2 ME regardless of the encoder subme (slicetype.c:244-260)
with SATD mbcmp (encoder.c:422 selects satd for subme >= 1) on the
lowres pyramid + 8x8c intra (slicetype.c:48-222) — then a scenecut test
(:324-367) and keyint logic (:438-604). The TPU build computes the
lowres cost as batched kernels over the 8x8 block grid: per-block DIA
full-pel + one half-pel diamond + the exact-qpel MVP try, with the
reverse-raster MVP chaining (slicetype.c:107-113) replayed as Jacobi
rounds over the whole grid; final costs are SATD rescored with the
reference's exact adjustments (cost_mv at LOOKAHEAD_QP λ=1, −1, +5 for
nonzero MV, mv0 fast-skip <64 at zero MVP :117-124) and the 8x8c V/H/DC
SATD intra with intra_penalty 5 + lowres_penalty 4 (:150-180). Frame
cost excludes the edge-MB ring unless mb-tree/VBV needs the spatial
distribution (do_edges, :286-294).

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
from ..ops._lazyconst import LazyConst

LOOKAHEAD_QP = 12
_LOWRES_PENALTY = 4    # slicetype.c:69
_INTRA_PENALTY = 5     # slicetype.c:153
_R = 8  # lowres search range (mv_min/max_fpel span in slicetype.c:77-90)
_MLOW = 10             # lowres window margin (±8 fullpel + subpel drift)
_WINLOW = 8 + 2 * _MLOW


@functools.lru_cache(maxsize=None)
def _summary_fn(bw: int, bh: int, do_edges: bool):
    """One-pull frame summary: [icost_sum, pcost_sum, icost_row_sums,
    pcost_row_sums] as a single (2 + 2*bh,) int64 vector."""
    def f(low, prev4):
        icost, pcost, _ = lowres_costs(low, prev4, bw=bw, bh=bh)

        def s(m):
            mm = m if do_edges else m[1:-1, 1:-1]
            return mm.sum().astype(jnp.int64)[None]

        return jnp.concatenate([
            s(icost), s(pcost),
            icost.sum(axis=1).astype(jnp.int64),
            pcost.sum(axis=1).astype(jnp.int64)])
    return jax.jit(f)


@functools.partial(jax.jit, static_argnames=("bw", "bh"))
def lowres_costs(fenc_low, fref_low4, bw: int, bh: int):
    """Per-8x8-block (icost, bcost) on the lowres planes
    (x264_slicetype_mb_cost, slicetype.c:48-222).
    fenc_low: (H/2, W/2) int32; fref_low4: (4, H/2, W/2) lowres pyramid
    (phase planes = the lowres hpel set)."""
    H, W = bh * 8, bw * 8
    B = bh * bw
    f = fenc_low.astype(jnp.int32)

    # Batched DIA + subpel refine + MVP propagation on the lowres
    # pyramid. The reference forces DIA/subme-2 for the lookahead
    # regardless of the encoder subme (slicetype.c:244-260) and —
    # crucially — each block tries the exact-qpel MVP of its
    # already-searched neighbours (refine_subpel "try the subpel
    # component of the predicted mv", me.c:484-491, reverse-raster
    # chaining in slicetype_mb_cost:107-113). The batched equivalent:
    # Jacobi rounds, each a full reference-depth per-block search whose
    # MVPs come from the previous round's neighbour results.
    pad = jnp.pad(fref_low4.astype(jnp.int32),
                  ((0, 0), (_MLOW + 4, _MLOW + 4), (_MLOW + 4, _MLOW + 4)),
                  mode="edge")
    w = MG._tile_windows(pad, bh, 8, _WINLOW, 4, axis=1)
    w = MG._tile_windows(w, bw, 8, _WINLOW, 4, axis=3)
    wins4 = w.transpose(1, 3, 0, 2, 4).reshape(B, 4, _WINLOW, _WINLOW)
    fblk = f.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(B, 8, 8)

    def interp(mx, my):
        """Exact get_ref interpolation (mc.c:241-264) of each block's
        8x8 ref at per-block qpel mv (B,) → (B, 8, 8) int32."""
        qidx = ((my & 3) << 2) + (mx & 3)
        p0 = MG._HPEL_REF0_J[qidx]
        p1 = MG._HPEL_REF1_J[qidx]
        fy = (my >> 2) + _MLOW
        fx = (mx >> 2) + _MLOW
        y1 = fy + ((my & 3) == 3).astype(jnp.int32)
        x2 = fx + ((mx & 3) == 3).astype(jnp.int32)
        src1 = MG._select_block(MG._plane_select(wins4, p0),
                                y1, fx, 8, 8).astype(jnp.int32)
        src2 = MG._select_block(MG._plane_select(wins4, p1),
                                fy, x2, 8, 8).astype(jnp.int32)
        avg = (src1 + src2 + 1) >> 1
        return jnp.where((qidx & 5)[:, None, None] != 0, avg, src1)

    def try_mv(state, cmx, cmy):
        bc, bx, by = state
        mx = jnp.clip(cmx, -4 * (_MLOW - 1), 4 * (_MLOW - 1) - 1)
        my = jnp.clip(cmy, -4 * (_MLOW - 1), 4 * (_MLOW - 1) - 1)
        c = (jnp.abs(fblk - interp(mx, my)).sum((1, 2))
             + MVBITS_LOW4[jnp.clip(jnp.abs(mx), 0, 127)]
             + MVBITS_LOW4[jnp.clip(jnp.abs(my), 0, 127)])
        better = c < bc
        return (jnp.where(better, c, bc), jnp.where(better, mx, bx),
                jnp.where(better, my, by))

    def chain_mvs(v):
        """(B,) per-block values → (3, B): the reverse-raster chain
        candidates right / below / below-left (fenc_mvs[1], [stride],
        [stride-1]; slicetype.c:107-113), edge-clamped."""
        g = v.reshape(bh, bw)
        right = jnp.pad(g, ((0, 0), (0, 1)), mode="edge")[:, 1:]
        below = jnp.pad(g, ((0, 1), (0, 0)), mode="edge")[1:]
        belowl = jnp.pad(g, ((0, 1), (1, 0)), mode="edge")[1:, :-1]
        return (right.reshape(B), below.reshape(B), belowl.reshape(B))

    def median3(a, b, c):
        return jnp.minimum(jnp.maximum(jnp.minimum(a, b), c),
                           jnp.maximum(a, b))

    def search_round(state):
        """One per-block twin of the reference lookahead search
        (x264_me_search DIA fullpel from the rounded MVP, me.c:237-274,
        + refine_subpel subme-2: one half-pel diamond and the
        exact-qpel MVP try, me.c:484-517). MVPs chain through rounds
        like the reverse-raster sweep chains through blocks."""
        bc, bx, by = state
        rx, dx_, dlx = chain_mvs(bx)
        ry, dy_, dly = chain_mvs(by)
        mvpx = median3(rx, dx_, dlx)
        mvpy = median3(ry, dy_, dly)
        # fullpel DIA from the round-clipped MVP; cost has no mv bias
        # for the rounded-MVP start (me.c:199-208) — approximate the
        # whole fullpel stage with bias vs the MVP
        fx = jnp.clip((mvpx + 2) >> 2, -_R, _R)
        fy = jnp.clip((mvpy + 2) >> 2, -_R, _R)
        st = (PX.sad(fblk, interp(fx * 4, fy * 4)), fx, fy)

        def dia(_, s):
            c0, cx, cy = s
            for ddx, ddy in ((0, -1), (0, 1), (-1, 0), (1, 0)):
                nx = jnp.clip(cx + ddx, -_R, _R)
                ny = jnp.clip(cy + ddy, -_R, _R)
                cc = (PX.sad(fblk, interp(nx * 4, ny * 4))
                      + MVBITS_LOW4[jnp.clip(jnp.abs(nx * 4 - mvpx),
                                             0, 127)]
                      + MVBITS_LOW4[jnp.clip(jnp.abs(ny * 4 - mvpy),
                                             0, 127)])
                take = cc < c0
                c0 = jnp.where(take, cc, c0)
                cx = jnp.where(take, nx, cx)
                cy = jnp.where(take, ny, cy)
            return c0, cx, cy

        c0, cx, cy = jax.lax.fori_loop(0, 16, dia, st)
        s2 = (c0, cx * 4, cy * 4)
        # one half-pel diamond iteration (refine_subpel, hpel_iters=1)
        for dmx, dmy in ((0, -2), (0, 2), (-2, 0), (2, 0)):
            s2 = try_mv2(s2, s2[1] + dmx, s2[2] + dmy, mvpx, mvpy)
        # the exact-qpel MVP try (me.c:484-491, subme < 3)
        s2 = try_mv2(s2, mvpx, mvpy, mvpx, mvpy)
        nc, nx, ny = s2
        # REPLACE the carried state: each block gets exactly one
        # reference-depth search per round; later rounds only see
        # better MVP chains (the reverse-raster sweep gives each block
        # one search with fully-final neighbour mvs)
        return nc, nx, ny, mvpx, mvpy

    def try_mv2(state, cmx, cmy, mvpx, mvpy):
        bc, bx, by = state
        mx = jnp.clip(cmx, -4 * (_MLOW - 1), 4 * (_MLOW - 1) - 1)
        my = jnp.clip(cmy, -4 * (_MLOW - 1), 4 * (_MLOW - 1) - 1)
        c = (PX.sad(fblk, interp(mx, my))
             + MVBITS_LOW4[jnp.clip(jnp.abs(mx - mvpx), 0, 127)]
             + MVBITS_LOW4[jnp.clip(jnp.abs(my - mvpy), 0, 127)])
        better = c < bc
        return (jnp.where(better, c, bc), jnp.where(better, mx, bx),
                jnp.where(better, my, by))

    big0 = jnp.full((B,), 1 << 28, jnp.int32)
    zero = jnp.zeros((B,), jnp.int32)
    state = (big0, zero, zero)
    mvpx = mvpy = zero
    for _round in range(4):
        bc, bx, by, mvpx, mvpy = search_round(state)
        state = (bc, bx, by)
    bc, bx, by = state

    # final cost is mbcmp = SATD (subme >= 1 selects satd, encoder.c:422;
    # refine_subpel rescores the best mv with mbcmp, me.c:520-524) plus
    # cost_mv at λ=1 vs the chain MVP
    satd_best = PX.satd(fblk, interp(bx, by))
    mvcost = (MVBITS_LOW4[jnp.clip(jnp.abs(bx - mvpx), 0, 127)]
              + MVBITS_LOW4[jnp.clip(jnp.abs(by - mvpy), 0, 127)])
    mcost = satd_best + mvcost
    # cost adjustments (slicetype.c:131-134): −1, +5 when mv != 0
    mcost = mcost - 1 + jnp.where((bx != 0) | (by != 0), 5, 0)
    # mv0 fast-skip (:117-124): mvp == 0 and mbcmp(0,0) < 64 → as-is
    satd0 = PX.satd(fblk, interp(zero, zero))
    skip0 = (satd0 < 64) & (mvpx == 0) & (mvpy == 0)
    mcost = jnp.where(skip0, satd0, mcost)
    bx = jnp.where(skip0, 0, bx)
    by = jnp.where(skip0, 0, by)
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
    # mbcmp = SATD (intra_mbcmp_x3_8x8c, selected by encoder.c:422)
    sadv = PX.satd(blocks, v_pred)
    sadh = PX.satd(blocks, h_pred)
    sadd = PX.satd(blocks, d_pred)
    icost = (jnp.minimum(jnp.minimum(sadv, sadh), sadd)
             + _INTRA_PENALTY + _LOWRES_PENALTY)

    return icost, jnp.minimum(pcost, icost), (bx.reshape(bh, bw),
                                              by.reshape(bh, bw))


# λ=1 mv-bits at LOOKAHEAD_QP: bits of one mv component, fullpel index
_MVB = np.ones(128, np.int32)
_d = np.arange(1, 128)
_MVB[1:] = (np.log2(_d * 4 + 1.0) * 2 + 1.718 + 0.5).astype(np.int32)
MVBITS_LOW = LazyConst(_MVB)     # indexed by |fullpel|
_MVB4 = np.ones(128, np.int32)
_d4 = np.arange(1, 128)
_MVB4[1:] = (np.log2(_d4 + 1.0) * 2 + 1.718 + 0.5).astype(np.int32)
MVBITS_LOW4 = LazyConst(_MVB4)   # indexed by |qpel|


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
        # with periodic intra refresh only frame 0 takes the keyint_max
        # IDR (slicetype.c:516); the fork can't emit the refresh wave
        # itself (intra-in-P compiled out, analyse.c:1214-1219)
        keyint_applies = (not p.b_intra_refresh) or self.frame_idx == 0
        force_i = (keyint_applies and gop >= p.i_keyint_max) \
            or self.prev_lowres is None

        # Without mb-tree or VBV the edge ring is excluded from the
        # frame cost ("the edge mbs reduce the predictive quality of
        # the whole frame's score", do_edges + the [1, n-2] loop
        # bounds, slicetype.c:286-294)
        do_edges = (p.rc.b_mb_tree or p.rc.i_vbv_buffer_size
                    or bw <= 2 or bh <= 2)

        def frame_sum(cmap):
            m = cmap if do_edges else cmap[1:-1, 1:-1]
            return int(np.asarray(m.sum()))

        # ONE device->host pull per frame: frame sums + per-row sums of
        # both cost maps cross together ((2 + 2*bh,) int64) — the
        # per-map pulls cost ~7 round-trips/frame on a high-latency link
        import os as _os
        dbg_on = _os.environ.get("X264_ST_DEBUG") == "1"
        if self.prev_lowres is None:
            vec = np.asarray(_summary_fn(bw, bh, bool(do_edges))(
                low, low4))
            cost = int(vec[0])
            sc = True
            row_i = row_p = vec[2:2 + bh]
            isum = cost
        else:
            vec = np.asarray(_summary_fn(bw, bh, bool(do_edges))(
                low, self.prev_lowres))
            isum, psum = int(vec[0]), int(vec[1])
            row_i = vec[2:2 + bh]
            row_p = vec[2 + bh:]
            sc = self._scenecut(isum, psum, gop)
            cost = isum if (force_i or sc) else psum
            if dbg_on:
                icost, pcost, _mvs = lowres_costs(low, self.prev_lowres,
                                                  bw=bw, bh=bh)
                self.dbg = {"icost": np.asarray(icost),
                            "pcost": np.asarray(pcost),
                            "mvx": np.asarray(_mvs[0]),
                            "mvy": np.asarray(_mvs[1])}

        is_key = force_i or (sc and self.param.i_scenecut_threshold > 0
                             and gop >= max(self.param.i_keyint_min, 1))
        slice_type = P.SLICE_TYPE_I if is_key else P.SLICE_TYPE_P
        if is_key:
            self.last_keyframe = self.frame_idx
        self.prev_lowres = low4   # full pyramid: lowres hpel for the ME
        self.frame_idx += 1
        # per-MB-row lowres cost (fdec->i_row_satd twin filled by
        # x264_rc_analyse_slice, slicetype.c:605-642) for row-VBV
        self.row_costs = (row_i if (force_i or sc) else row_p) \
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
