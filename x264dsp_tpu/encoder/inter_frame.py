"""Device-side P-frame encoder.

TPU-first reshaping of the reference's serial P path (encoder/analyse.c
P branch :1089-1223, encoder/me.c, encoder/macroblock.c inter path
:379-489):

- Phase A (fully parallel): full-pel SAD cost surfaces for every MB over a
  ±me_range window. This replaces DIA/HEX iterative search (me.c:237-387)
  with exhaustive candidate scoring — the data-parallel recast the survey
  prescribes (SURVEY §7.1 "ME as candidate-matrix scoring"); quality is
  ESA-like, ≥ the reference's DIA.
- Phase B (2:1 wavefront over MB decisions): exact median MV prediction
  from decided neighbors (common/mvpred.c:22-120), fullpel pick =
  argmin(SAD + λ·mvbits(mv - mvp)), then subpel refinement with the
  reference's subme=1 recipe (me.c:466-581: mvp-subpel try, one hpel
  diamond with SAD on the filtered planes, one qpel step via averaging).
  Only the tiny decision state serializes; all pixel work is batched
  across the diagonal.
- Phase C (fully parallel): MC + transform + inter quant with DCT
  decimation (thresholds 4/6, encoder/macroblock.c:409-446), chroma encode
  with the variance early-skip (:188-231) and AC decimation (:262-284),
  reconstruction, and the per-block nnz/mv/ref grids that feed deblocking.

P_SKIP is produced by the demotion rule (macroblock.c:477-485) at entropy
time on host — reconstruction is identical by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import deblock as DB
from ..ops import mc as MC
from ..ops import mcgather as MG
from ..ops import pixel as PX
from ..ops import residual_plane as RP
from ..ops import transforms as T
from ..ops.golden import BLOCK_IDX_X, BLOCK_IDX_Y
from .intra_frame import _diag_schedule, _encode_chroma_channel
from ..ops._lazyconst import LazyConst

# λ·bits LUT for mv components: mv_bits = floor(log2(d+1)*2 + 2.218), d>=1;
# cost_mv[0] = 1 bit (encoder/analyse.c:243-310, x264_mv_bits_tab :171)
_MVBITS_RANGE = 4096
_MVBITS = np.ones(_MVBITS_RANGE, np.int32)
_d = np.arange(1, _MVBITS_RANGE)
_MVBITS[1:] = (np.log2(_d + 1.0) * 2 + 1.718 + 0.5).astype(np.int32)
MVBITS_J = LazyConst(_MVBITS)

# the table is a monotone step function with ~2·log2(range) steps; a
# per-element table gather is catastrophic on TPU (the partition bias
# grid indexes it with ~9M elements), but bits(d) = base + Σ δ_k·(d>=t_k)
# over the step thresholds is a handful of vectorized compares — exact
# by construction
_MVBITS_STEPS = tuple(
    (int(t) + 1, int(np.diff(_MVBITS)[t]))
    for t in np.nonzero(np.diff(_MVBITS))[0])

# lambda2 table (encoder/analyse.c:113-130), QP 0..51 — used by the chroma
# variance early-skip threshold
LAMBDA2_TAB = np.array([
    14, 18, 22, 28, 36, 45, 57, 72,
    91, 115, 145, 182, 230, 290, 365, 460,
    580, 731, 921, 1161, 1462, 1843, 2322, 2925,
    3686, 4644, 5851, 7372, 9289, 11703, 14745, 18578,
    23407, 29491, 37156, 46814, 58982, 74313, 93628, 117964,
    148626, 187257, 235929, 297252, 374514, 471859, 594505, 749029,
    943718, 1189010, 1498059, 1887436], np.int64)
LAMBDA2_J = LazyConst(LAMBDA2_TAB)


def _mv_bits(d):
    """_MVBITS[d] (clipped) without a gather: base 1 + δ per crossed
    step threshold."""
    d = jnp.clip(d, 0, _MVBITS_RANGE - 1)
    bits = jnp.ones(d.shape, jnp.int32)
    for t, delta in _MVBITS_STEPS:
        step = (d >= t).astype(jnp.int32)
        bits = bits + (step if delta == 1 else delta * step)
    return bits


def _mv_cost(lam, mvx, mvy, mvpx, mvpy):
    return lam * (_mv_bits(jnp.abs(mvx - mvpx))
                  + _mv_bits(jnp.abs(mvy - mvpy)))


def _median3(a, b, c):
    return a + b + c - jnp.minimum(a, jnp.minimum(b, c)) \
        - jnp.maximum(a, jnp.maximum(b, c))


# ---------------------------------------------------------------------------
# Phase A: full-pel cost surfaces
# ---------------------------------------------------------------------------

def fullpel_cost_surfaces_8x8(fenc_y, ref_full, mb_w: int, mb_h: int,
                              me_range: int):
    """Quadrant SADs of every MB against the reference at every full-pel
    offset in [-R, R]^2. ref_full: padded (Hp, Wp) full-pel plane (PAD_MC
    border). Returns (mb_h, mb_w, 2, 2, 2R+1, 2R+1) int32 — the cost
    surfaces of the P partition shapes (16x16/16x8/8x16 = quadrant sums,
    pixel-a.sa sad_8x8/sad_16x8... reborn).

    On TPU this dispatches to the Pallas strip-resident kernel
    (ops/pallas/me_sad.py); this XLA formulation is the twin/fallback."""
    import jax as _jax
    if _jax.default_backend() == "tpu":
        from ..ops.pallas.me_sad import (make_ref_strips,
                                         sad_cost_surfaces_8x8)
        strips = make_ref_strips(ref_full, MC.PAD_MC, mb_w, mb_h, me_range)
        return sad_cost_surfaces_8x8(fenc_y.astype(jnp.int32), strips,
                                     mb_w=mb_w, mb_h=mb_h, R=me_range)
    R = me_range
    H, W = mb_h * 16, mb_w * 16
    f = fenc_y.astype(jnp.int32)

    def one_offset(k, acc):
        dy = k // (2 * R + 1) - R
        dx = k % (2 * R + 1) - R
        win = jax.lax.dynamic_slice(
            ref_full, (MC.PAD_MC + dy, MC.PAD_MC + dx), (H, W))
        ad = jnp.abs(f - win)
        tile = ad.reshape(mb_h, 2, 8, mb_w, 2, 8).sum(axis=(2, 5))
        tile = tile.transpose(0, 2, 1, 3)          # (mb_h, mb_w, qy, qx)
        return acc.at[:, :, :, :, k // (2 * R + 1), k % (2 * R + 1)].set(
            tile)

    acc = jnp.zeros((mb_h, mb_w, 2, 2, 2 * R + 1, 2 * R + 1), jnp.int32)
    return jax.lax.fori_loop(0, (2 * R + 1) ** 2, one_offset, acc)


def fullpel_cost_surfaces(fenc_y, ref_full, mb_w: int, mb_h: int,
                          me_range: int):
    """16x16 SAD surfaces: (mb_h, mb_w, 2R+1, 2R+1) int32."""
    return fullpel_cost_surfaces_8x8(fenc_y, ref_full, mb_w, mb_h,
                                     me_range).sum(axis=(2, 3))


# ---------------------------------------------------------------------------
# Phase B: wavefront MV decision (exact MVP) + subpel refine
# ---------------------------------------------------------------------------

def _mvp_16x16(mv_field, ref_ok, mbx, mby, mb_w):
    """x264_mb_predict_mv_16x16 (common/mvpred.c:103-137) for single-ref
    P_L0 16x16. mv_field: (mb_h, mb_w, 2); ref_ok: (mb_h, mb_w) 1 where a
    decided inter MB exists. Returns (mvp(2,), refa_ok, refb_ok)."""
    def nb(y, x, ok_cond):
        ok = ok_cond & (y >= 0) & (x >= 0) & (x < mb_w)
        mv = mv_field[jnp.maximum(y, 0), jnp.clip(x, 0, mb_w - 1)]
        return jnp.where(ok, mv, 0), ok

    mv_a, ok_a = nb(mby, mbx - 1, jnp.bool_(True))
    mv_b, ok_b = nb(mby - 1, mbx, jnp.bool_(True))
    mv_c, ok_c = nb(mby - 1, mbx + 1, jnp.bool_(True))
    mv_d, ok_d = nb(mby - 1, mbx - 1, jnp.bool_(True))
    # topright unavailable → topleft (mvpred.c:116-120)
    mv_c = jnp.where(ok_c, mv_c, mv_d)
    ok_c = jnp.where(ok_c, ok_c, ok_d)

    count = ok_a.astype(jnp.int32) + ok_b.astype(jnp.int32) \
        + ok_c.astype(jnp.int32)
    med = _median3(mv_a, mv_b, mv_c)
    single = jnp.where(ok_a[..., None], mv_a,
                       jnp.where(ok_b[..., None], mv_b, mv_c))
    only_a = (~ok_b) & (~ok_c) & ok_a
    mvp = jnp.where(count[..., None] > 1, med,
                    jnp.where(count[..., None] == 1, single,
                              jnp.where(only_a[..., None], mv_a, med)))
    return mvp, ok_a, ok_b, mv_a, mv_b


def _pskip_mv(mv_field, mbx, mby, mb_w):
    """x264_mb_predict_mv_pskip (common/mvpred.c:143-160), single ref."""
    mvp, ok_a, ok_b, mv_a, mv_b = _mvp_16x16(mv_field, None, mbx, mby, mb_w)
    a_zero = ok_a & jnp.all(mv_a == 0)
    b_zero = ok_b & jnp.all(mv_b == 0)
    zero = (~ok_a) | (~ok_b) | a_zero | b_zero
    return jnp.where(zero[..., None], 0, mvp)


def make_mv_ranges(mb_w, mb_h, mv_range):
    """Per-MB legal fullpel/qpel MV ranges (x264_mb_analyse_init,
    encoder/analyse.c:370-393)."""
    fmv = mv_range * 4
    xs = np.arange(mb_w)
    ys = np.arange(mb_h)
    mvmin_x = np.clip((-(xs << 4) - 24) << 2, -fmv, fmv - 1)
    mvmax_x = np.clip((((mb_w - xs - 1) << 4) + 24) << 2, -fmv, fmv - 1)
    mvmin_y = np.clip((-(ys << 4) - 24) << 2, -fmv, fmv)
    mvmax_y = np.clip((((mb_h - ys - 1) << 4) + 24) << 2, -fmv, fmv - 1)
    return (jnp.asarray(mvmin_x), jnp.asarray(mvmax_x),
            jnp.asarray(mvmin_y), jnp.asarray(mvmax_y))


def decide_mvs(cost_surf, fenc_y, wins4, lam, mb_w: int, mb_h: int,
               me_range: int, mv_range: int, subme: int = 1):
    """MV decisions in two stages:

    1. Full-pel wavefront: exact median-MVP chain over the 2:1 diagonals,
       each step pure arithmetic on the precomputed cost surfaces (no
       pixel gathers — the latency-critical path stays tiny).
    2. Parallel subpel refinement (subme-1 recipe, me.c:466-581) for all
       MBs at once, with MVP taken from the completed full-pel field (a
       deliberate decoupling: the entropy stage recomputes the exact MVP
       from final MVs, so the bitstream stays exact; only the λ·mvbits
       bias during refinement is approximate).

    Returns the final MV field (mb_h, mb_w, 2) in qpel units."""
    R = me_range
    n_diag, dmax, diag_ys, diag_xs = _diag_schedule(mb_w, mb_h)
    mvmin_x, mvmax_x, mvmin_y, mvmax_y = make_mv_ranges(mb_w, mb_h, mv_range)
    offs = jnp.arange(-R, R + 1)

    fenc = fenc_y.astype(jnp.int32)

    lam_mb = jnp.broadcast_to(jnp.asarray(lam), (mb_h, mb_w))

    def fullpel_one(mbx, mby, mv_field):
        mvp, *_ = _mvp_16x16(mv_field, None, mbx, mby, mb_w)
        mvpx, mvpy = mvp[0], mvp[1]
        surf = cost_surf[mby, mbx]
        mvx_q = offs[None, :] * 4
        mvy_q = offs[:, None] * 4
        cost = surf + _mv_cost(lam_mb[mby, mbx], mvx_q, mvy_q, mvpx, mvpy)
        # legal range mask (fullpel, with the reference's 6-px border)
        lo_x = (mvmin_x[mbx] >> 2) + 6
        hi_x = (mvmax_x[mbx] >> 2) - 6
        lo_y = (mvmin_y[mby] >> 2) + 6
        hi_y = (mvmax_y[mby] >> 2) - 6
        ok = ((offs[None, :] >= lo_x) & (offs[None, :] <= hi_x)
              & (offs[:, None] >= lo_y) & (offs[:, None] <= hi_y))
        cost = jnp.where(ok, cost, jnp.int32(1 << 28))
        k = jnp.argmin(cost)
        bmy = (k // (2 * R + 1) - R) * 4
        bmx = (k % (2 * R + 1) - R) * 4
        return jnp.stack([bmx, bmy]), cost.reshape(-1)[k]

    def step(d, state):
        mv_field, cost_field = state
        ys = diag_ys[d]
        xs = diag_xs[d]
        valid = ys >= 0
        yc = jnp.maximum(ys, 0)
        xc = jnp.maximum(xs, 0)
        mvs, costs = jax.vmap(
            lambda x, y: fullpel_one(x, y, mv_field))(xc, yc)
        oob = jnp.int32(1 << 20)
        sy = jnp.where(valid, yc, oob)
        sx = jnp.where(valid, xc, oob)
        return (mv_field.at[sy, sx].set(mvs, mode="drop"),
                cost_field.at[sy, sx].set(costs, mode="drop"))

    mv0 = jnp.zeros((mb_h, mb_w, 2), jnp.int32)
    c0 = jnp.zeros((mb_h, mb_w), jnp.int32)
    # unroll: each step is tiny arithmetic on (2R+1)^2 surfaces, so the
    # ~mb_w+2*mb_h sequential iterations are loop-machinery-bound;
    # unrolling keeps the exact diagonal order (d depends on d-1/d-2)
    # while quartering the while-loop overhead
    mv_field, cost_field = jax.lax.fori_loop(0, n_diag, step, (mv0, c0),
                                             unroll=4)

    # ---- stage 2: batched subpel refinement (exact MVP field) ----
    def mvp_one(mbx, mby):
        mvp, *_ = _mvp_16x16(mv_field, None, mbx, mby, mb_w)
        return mvp

    xs, ys = jnp.meshgrid(jnp.arange(mb_w), jnp.arange(mb_h))
    mvp_field = jax.vmap(jax.vmap(mvp_one))(xs, ys)
    return _subpel_refine_batch(mv_field, cost_field, mvp_field, fenc_y,
                                wins4, lam, mb_w, mb_h,
                                mvmin_x, mvmax_x, mvmin_y, mvmax_y,
                                subme=subme)


def _mvp_field_parallel(mv_field, mb_w: int, mb_h: int):
    """Vectorized median-MVP over the whole grid from a *given* MV field
    (one shifted-neighbor pass — no wavefront)."""
    def shift(dy, dx):
        m = jnp.roll(mv_field, (dy, dx), axis=(0, 1))
        ys, xs = jnp.mgrid[0:mb_h, 0:mb_w]
        ok = ((ys - dy >= 0) & (ys - dy < mb_h)
              & (xs - dx >= 0) & (xs - dx < mb_w))
        return jnp.where(ok[..., None], m, 0), ok

    mv_a, ok_a = shift(0, 1)
    mv_b, ok_b = shift(1, 0)
    mv_c, ok_c = shift(1, -1)
    mv_d, ok_d = shift(1, 1)
    mv_c = jnp.where(ok_c[..., None], mv_c, mv_d)
    ok_c = ok_c | ok_d
    count = ok_a.astype(jnp.int32) + ok_b.astype(jnp.int32) \
        + ok_c.astype(jnp.int32)
    med = _median3(mv_a, mv_b, mv_c)
    single = jnp.where(ok_a[..., None], mv_a,
                       jnp.where(ok_b[..., None], mv_b, mv_c))
    return jnp.where(count[..., None] == 1, single, med)


# hex2 pattern (me.c hex2[], the 6 points A..F of the radius-2 hexagon)
_HEX_PTS = ((-2, 0), (-1, 2), (1, 2), (2, 0), (1, -2), (-1, -2))
_DIA_PTS = ((0, -1), (0, 1), (-1, 0), (1, 0))
_SQUARE_PTS = _DIA_PTS + ((-1, -1), (-1, 1), (1, -1), (1, 1))


def _surface_at(cost, bx, by, R: int):
    """Per-MB read of the (mb_h, mb_w, n, n) surface at fullpel offset
    (bx, by) in [-R, R]: a masked reduce (TPU gathers are per-element;
    one fused pass over the surface serves the whole grid). Returns
    BIG for out-of-surface positions."""
    n = 2 * R + 1
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n, n), 2)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n, n), 3)
    m = (iy == (by + R)[..., None, None]) & (ix == (bx + R)[..., None, None])
    v = jnp.where(m, cost, 0).sum(axis=(-1, -2))
    inb = (jnp.abs(bx) <= R) & (jnp.abs(by) <= R)
    return jnp.where(inb, v, jnp.int32(1 << 28))


def _try_candidates(cost, bcost, bx, by, cands, R: int, gate=None):
    """Sequential strict-less acceptance of candidate offsets (the
    COPY1_IF_LT chains of me.c): cands = [(dx, dy) static] relative to
    the CURRENT center, evaluated against the biased surface. One fused
    surface pass per candidate group. Returns (bcost, bx, by, moved)."""
    n = 2 * R + 1
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n, n), 2)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n, n), 3)
    ox, oy = bx, by
    for dx, dy in cands:
        cx, cy = ox + dx, oy + dy
        m = ((iy == (cy + R)[..., None, None])
             & (ix == (cx + R)[..., None, None]))
        c = jnp.where(m, cost, 0).sum(axis=(-1, -2))
        inb = (jnp.abs(cx) <= R) & (jnp.abs(cy) <= R)
        c = jnp.where(inb, c, jnp.int32(1 << 28))
        better = c < bcost
        if gate is not None:
            better = better & gate
        bcost = jnp.where(better, c, bcost)
        bx = jnp.where(better, cx, bx)
        by = jnp.where(better, cy, by)
    return bcost, bx, by, (bx != ox) | (by != oy)


def _pattern_walk(cost_raw, cost_biased, mvp_fp, mvc, method: int,
                  me_range: int, mb_w: int, mb_h: int):
    """Batched DIA (me.c:237-274) / HEX (me.c:276-387) full-pel search
    over the precomputed cost surfaces, every MB in lockstep with
    per-MB active masks standing in for the serial loop's breaks.

    Seeding follows the reference's subme<3 path (me.c:196-228): the
    rounded-clipped MVP is costed WITHOUT the mv-rate bias (the
    rounding-fairness rule in the me.c comment), then the extra
    candidates (mv_prev — our stand-in for the mvc predictor list —
    and (0,0)) with bias, then the pattern loop on the biased surface.
    HEX uses the reference's own #if 0 equivalent form (full hexagon
    per iteration — the 3-point rolling version is a dedup of it) plus
    the final 8-point square refine. Positions live on the surface
    (fullpel offsets in [-R, R] around zero), which is also the
    physical search bound of the exhaustive modes."""
    R = me_range
    bx = jnp.clip(mvp_fp[..., 0], -R, R)
    by = jnp.clip(mvp_fp[..., 1], -R, R)
    bcost = _surface_at(cost_raw, bx, by, R)   # no bias at the MVP
    # extra candidates, biased (the mvc predictor list + (0,0),
    # me.c:207-233)
    for cand in (mvc or []):
        cx = jnp.clip(cand[..., 0], -R, R)
        cy = jnp.clip(cand[..., 1], -R, R)
        c = _surface_at(cost_biased, cx, cy, R)
        better = c < bcost
        bcost = jnp.where(better, c, bcost)
        bx = jnp.where(better, cx, bx)
        by = jnp.where(better, cy, by)
    zc = _surface_at(cost_biased, jnp.zeros_like(bx), jnp.zeros_like(by), R)
    nz_mvp = (bx != 0) | (by != 0)
    better = nz_mvp & (zc < bcost)
    bcost = jnp.where(better, zc, bcost)
    bx = jnp.where(better, 0, bx)
    by = jnp.where(better, 0, by)

    active = jnp.ones(bx.shape, bool)
    if method == 0:          # DIA
        for _ in range(me_range):
            bcost, bx, by, moved = _try_candidates(
                cost_biased, bcost, bx, by, _DIA_PTS, R, gate=active)
            active = active & moved
    else:                    # HEX
        for _ in range(max(me_range >> 1, 1)):
            bcost, bx, by, moved = _try_candidates(
                cost_biased, bcost, bx, by, _HEX_PTS, R, gate=active)
            active = active & moved
        bcost, bx, by, _ = _try_candidates(
            cost_biased, bcost, bx, by, _SQUARE_PTS, R)
    return bx, by, bcost


def _surface_at_lanes(cost, bx, by, R: int):
    """Lane-layout twin of _surface_at: cost (mb_h, n, n, mb_w) —
    [row, dy, dx, mbx] as produced by the Pallas surface16 kernel —
    bx/by (mb_h, mb_w). Keeping mb_w on the minor (lane) axis avoids
    the 35 MB relayout the classic layout would need."""
    n = 2 * R + 1
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, n, n, 1), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, n, n, 1), 2)
    m = ((iy == (by + R)[:, None, None, :])
         & (ix == (bx + R)[:, None, None, :]))
    v = jnp.where(m, cost, 0).sum(axis=(1, 2))
    inb = (jnp.abs(bx) <= R) & (jnp.abs(by) <= R)
    return jnp.where(inb, v, jnp.int32(1 << 28))


def _try_candidates_lanes(cost, bcost, bx, by, cands, R: int, gate=None):
    """Lane-layout twin of _try_candidates."""
    n = 2 * R + 1
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, n, n, 1), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, n, n, 1), 2)
    ox, oy = bx, by
    for dx, dy in cands:
        cx, cy = ox + dx, oy + dy
        m = ((iy == (cy + R)[:, None, None, :])
             & (ix == (cx + R)[:, None, None, :]))
        c = jnp.where(m, cost, 0).sum(axis=(1, 2))
        inb = (jnp.abs(cx) <= R) & (jnp.abs(cy) <= R)
        c = jnp.where(inb, c, jnp.int32(1 << 28))
        better = c < bcost
        if gate is not None:
            better = better & gate
        bcost = jnp.where(better, c, bcost)
        bx = jnp.where(better, cx, bx)
        by = jnp.where(better, cy, by)
    return bcost, bx, by, (bx != ox) | (by != oy)


def _pattern_walk_lanes(cost_raw, cost_biased, mvp_fp, mvc, method: int,
                        me_range: int, mb_w: int, mb_h: int):
    """Lane-layout twin of _pattern_walk (same seeding/loop structure,
    surfaces indexed [row, dy, dx, mbx])."""
    R = me_range
    bx = jnp.clip(mvp_fp[..., 0], -R, R)
    by = jnp.clip(mvp_fp[..., 1], -R, R)
    bcost = _surface_at_lanes(cost_raw, bx, by, R)
    for cand in (mvc or []):
        cx = jnp.clip(cand[..., 0], -R, R)
        cy = jnp.clip(cand[..., 1], -R, R)
        c = _surface_at_lanes(cost_biased, cx, cy, R)
        better = c < bcost
        bcost = jnp.where(better, c, bcost)
        bx = jnp.where(better, cx, bx)
        by = jnp.where(better, cy, by)
    zc = _surface_at_lanes(cost_biased, jnp.zeros_like(bx),
                           jnp.zeros_like(by), R)
    nz_mvp = (bx != 0) | (by != 0)
    better = nz_mvp & (zc < bcost)
    bcost = jnp.where(better, zc, bcost)
    bx = jnp.where(better, 0, bx)
    by = jnp.where(better, 0, by)

    active = jnp.ones(bx.shape, bool)
    if method == 0:          # DIA
        for _ in range(me_range):
            bcost, bx, by, moved = _try_candidates_lanes(
                cost_biased, bcost, bx, by, _DIA_PTS, R, gate=active)
            active = active & moved
    else:                    # HEX
        for _ in range(max(me_range >> 1, 1)):
            bcost, bx, by, moved = _try_candidates_lanes(
                cost_biased, bcost, bx, by, _HEX_PTS, R, gate=active)
            active = active & moved
        bcost, bx, by, _ = _try_candidates_lanes(
            cost_biased, bcost, bx, by, _SQUARE_PTS, R)
    return bx, by, bcost


def decide_mvs_pattern(cost_surf, fenc_y, wins4, lam, mb_w: int, mb_h: int,
                       me_range: int, mv_range: int, subme: int = 1,
                       method: int = 0, surf_lanes=None):
    """DIA/HEX MV decision: the reference's cheap pattern searches
    (me.c:237-387), batched over the whole MB grid with a decoupled
    median-MVP estimate (two passes: a zero-MVP walk seeds a shifted
    -median MVP field, the second walk is the real search — the serial
    raster's neighbor propagation, reborn as one propagation step; the
    entropy stage recomputes the exact MVP from final MVs, so the
    bitstream stays exact). Subpel refinement is shared with the other
    modes.

    Surface input: either cost_surf (mb_h, mb_w, n, n) — the classic
    layout, from the quadrant surfaces — or surf_lanes (mb_h, n, n,
    mb_w) with cost_surf=None — the Pallas surface16 kernel's native
    layout (ops/pallas/me_sad.sad_cost_surface16_lanes), consumed
    as-is so no 35 MB relayout ever happens."""
    R = me_range
    n = 2 * R + 1
    mvmin_x, mvmax_x, mvmin_y, mvmax_y = make_mv_ranges(mb_w, mb_h, mv_range)
    offs = jnp.arange(-R, R + 1)
    lo_x = (mvmin_x >> 2) + 6
    hi_x = (mvmax_x >> 2) - 6
    lo_y = (mvmin_y >> 2) + 6
    hi_y = (mvmax_y >> 2) - 6

    lam_mb = jnp.broadcast_to(jnp.asarray(lam), (mb_h, mb_w))

    if surf_lanes is not None:
        # [row, dy, dx, mbx]: x bounds vary over lanes, y over rows
        ok = ((offs[None, None, :, None] >= lo_x[None, None, None, :])
              & (offs[None, None, :, None] <= hi_x[None, None, None, :])
              & (offs[None, :, None, None] >= lo_y[:, None, None, None])
              & (offs[None, :, None, None] <= hi_y[:, None, None, None]))
        cost_raw = jnp.where(ok, surf_lanes, 1 << 28)

        def biased(mvp):
            mvx_q = offs[None, None, :, None] * 4
            mvy_q = offs[None, :, None, None] * 4
            bias = _mv_cost(lam_mb[:, None, None, :], mvx_q, mvy_q,
                            mvp[..., 0][:, None, None, :],
                            mvp[..., 1][:, None, None, :])
            return jnp.where(ok, surf_lanes + bias, 1 << 28)

        walk = _pattern_walk_lanes
    else:
        ok = ((offs[None, None, :] >= lo_x[:, None, None])
              & (offs[None, None, :] <= hi_x[:, None, None]))
        ok = ok[None, :, :, :] & \
            ((offs[None, :, None] >= lo_y[:, None, None])
             & (offs[None, :, None] <= hi_y[:, None, None]))[:, None, :, :]
        cost_raw = jnp.where(ok, cost_surf, 1 << 28)

        def biased(mvp):
            mvx_q = offs[None, None, None, :] * 4
            mvy_q = offs[None, None, :, None] * 4
            bias = _mv_cost(lam_mb[..., None, None], mvx_q, mvy_q,
                            mvp[..., 0][..., None, None],
                            mvp[..., 1][..., None, None])
            return jnp.where(ok, cost_surf + bias, 1 << 28)

        walk = _pattern_walk

    # pass 1: zero MVP with the zero-anchored rate bias (exactly what
    # the reference's first row/column sees)
    zero_mvp = jnp.zeros((mb_h, mb_w, 2), jnp.int32)
    cb0 = biased(zero_mvp)
    bx0, by0, _ = walk(cost_raw, cb0, zero_mvp, None,
                       method, R, mb_w, mb_h)
    mv0 = jnp.stack([bx0 * 4, by0 * 4], axis=-1)
    # pass 2: median-MVP estimate from the propagated field; the mvc
    # candidate list (x264_mb_predict_mv_ref16x16, mvpred.c:167 —
    # spatial neighbour MVs) comes from pass 1's field, one step stale
    mvp = _mvp_field_parallel(mv0, mb_w, mb_h)
    mvp_fp = jnp.stack([(mvp[..., 0] + 2) >> 2,
                        (mvp[..., 1] + 2) >> 2], axis=-1)   # me.c:141-142
    fp0 = jnp.stack([bx0, by0], -1)

    def shift_fp(dy, dx):
        m = jnp.roll(fp0, (dy, dx), axis=(0, 1))
        ys, xs = jnp.mgrid[0:mb_h, 0:mb_w]
        ok = ((ys - dy >= 0) & (ys - dy < mb_h)
              & (xs - dx >= 0) & (xs - dx < mb_w))
        return jnp.where(ok[..., None], m, 0)
    mvc = [fp0, shift_fp(0, 1), shift_fp(1, 0), shift_fp(1, -1)]
    bx, by, bcost = walk(cost_raw, biased(mvp), mvp_fp,
                         mvc, method, R, mb_w, mb_h)
    # pass 3: one more propagation round — the serial raster's MVP
    # chain reaches arbitrarily far; two Jacobi rounds recover most of
    # it (round 3 closes the scan-order tail: measured on the parity
    # corpus, see tools/parity.py configs 2-4)
    mv1 = jnp.stack([bx * 4, by * 4], axis=-1)
    mvp = _mvp_field_parallel(mv1, mb_w, mb_h)
    mvp_fp = jnp.stack([(mvp[..., 0] + 2) >> 2,
                        (mvp[..., 1] + 2) >> 2], axis=-1)
    fp1 = jnp.stack([bx, by], -1)

    def shift_fp1(dy, dx):
        m = jnp.roll(fp1, (dy, dx), axis=(0, 1))
        ys, xs = jnp.mgrid[0:mb_h, 0:mb_w]
        ok = ((ys - dy >= 0) & (ys - dy < mb_h)
              & (xs - dx >= 0) & (xs - dx < mb_w))
        return jnp.where(ok[..., None], m, 0)
    mvc = [fp1, shift_fp1(0, 1), shift_fp1(1, 0), shift_fp1(1, -1)]
    bx, by, bcost = walk(cost_raw, biased(mvp), mvp_fp,
                         mvc, method, R, mb_w, mb_h)
    mv_field = jnp.stack([bx * 4, by * 4], axis=-1)
    cost_field = bcost
    return _subpel_refine_batch(mv_field, cost_field, mvp, fenc_y, wins4,
                                lam, mb_w, mb_h, mvmin_x, mvmax_x,
                                mvmin_y, mvmax_y, subme=subme)


def decide_mvs_parallel(cost_surf, fenc_y, wins4, lam, mb_w: int, mb_h: int,
                        me_range: int, mv_range: int, subme: int = 1):
    """Fully parallel MV decision (no wavefront) — the ESA/UMH-mapped mode:
    pass 1 picks pure-SAD argmin MVs everywhere, pass 2 derives an MVP
    estimate field from them with one shifted-median step, pass 3 re-picks
    with the λ·mvbits bias and runs the batched subpel refine. ~W+2H×
    lower sequential depth than the exact chain at a small bitrate cost
    (the entropy MVP stays exact either way)."""
    R = me_range
    n = 2 * R + 1
    mvmin_x, mvmax_x, mvmin_y, mvmax_y = make_mv_ranges(mb_w, mb_h, mv_range)
    offs = jnp.arange(-R, R + 1)

    lo_x = (mvmin_x >> 2) + 6
    hi_x = (mvmax_x >> 2) - 6
    lo_y = (mvmin_y >> 2) + 6
    hi_y = (mvmax_y >> 2) - 6
    ok = ((offs[None, None, :] >= lo_x[:, None, None])
          & (offs[None, None, :] <= hi_x[:, None, None]))   # (mb_w, 1, n)
    ok = ok[None, :, :, :] & \
        ((offs[None, :, None] >= lo_y[:, None, None])
         & (offs[None, :, None] <= hi_y[:, None, None]))[:, None, :, :]
    # ok: (mb_h, mb_w, n, n)
    masked0 = jnp.where(ok, cost_surf, 1 << 28)
    k0 = jnp.argmin(masked0.reshape(mb_h, mb_w, -1), axis=-1)
    mv0 = jnp.stack([(k0 % n - R) * 4, (k0 // n - R) * 4], axis=-1)

    mvp = _mvp_field_parallel(mv0, mb_w, mb_h)
    mvx_q = offs[None, None, None, :] * 4
    mvy_q = offs[None, None, :, None] * 4
    mvpx = mvp[..., 0][..., None, None]
    mvpy = mvp[..., 1][..., None, None]
    lam_mb = jnp.broadcast_to(jnp.asarray(lam),
                              (mb_h, mb_w))[..., None, None]
    bias = _mv_cost(lam_mb, mvx_q, mvy_q, mvpx, mvpy)
    cost = jnp.where(ok, cost_surf + bias, 1 << 28)
    k = jnp.argmin(cost.reshape(mb_h, mb_w, -1), axis=-1)
    mv_field = jnp.stack([(k % n - R) * 4, (k // n - R) * 4], axis=-1)
    cost_field = jnp.take_along_axis(cost.reshape(mb_h, mb_w, -1),
                                     k[..., None], axis=-1)[..., 0]

    return _subpel_refine_batch(mv_field, cost_field, mvp, fenc_y, wins4,
                                lam, mb_w, mb_h, mvmin_x, mvmax_x,
                                mvmin_y, mvmax_y, subme=subme)


def tile_mb(plane, mb_w: int, mb_h: int, mbsize: int):
    """(mb_h*mbsize, mb_w*mbsize) -> (mb_h*mb_w, mbsize, mbsize), pure
    relayout."""
    return plane.reshape(mb_h, mbsize, mb_w, mbsize).transpose(
        0, 2, 1, 3).reshape(mb_h * mb_w, mbsize, mbsize)


def untile_mb(tiles, mb_w: int, mb_h: int, mbsize: int):
    return tiles.reshape(mb_h, mb_w, mbsize, mbsize).transpose(
        0, 2, 1, 3).reshape(mb_h * mbsize, mb_w * mbsize)


# combined search+winner-refine subpel recipe per subme level
# (subpel_iterations, me.c:18-33: winner refine adds tab[s][1] qpel iters
# on top of the tab[s][2]/tab[s][3] search refine): subme ->
# (hpel_iters, qpel_iters, use_satd, try_mvp)
SUBME_RECIPE = {
    0: (0, 0, False, False),
    1: (1, 1, False, True),
    2: (1, 1, True, True),
    3: (1, 2, True, False),
    4: (1, 3, True, False),
    5: (1, 4, True, False),
    # subme >= 6: search-stage iters dominate (subpel_iterations[s][2/3],
    # me.c:30-33 {0,0,2,2} / {0,0,4,10}); the winner pass adds nothing.
    # The fork has no trellis/psy-RD, so the RD layers of 6-11 reduce to
    # the larger iteration budgets.
    6: (2, 2, True, False),
    7: (2, 2, True, False),
    8: (4, 10, True, False),
    9: (4, 10, True, False),
    10: (4, 10, True, False),
    11: (4, 10, True, False),
}


def _subpel_refine_batch(mv_field, cost_field, mvp_field, fenc_y, wins4,
                         lam, mb_w, mb_h, mvmin_x, mvmax_x, mvmin_y,
                         mvmax_y, subme: int = 1):
    """Subpel refinement (refine_subpel, me.c:466-581 + the winner
    x264_me_refine_qpel :426-435) for ALL MBs at once: each try is one
    batched window-matmul MC + SAD/SATD — no per-MB gathers anywhere.
    subme >= 2 switches the qpel metric to SATD (mbcmp) with more
    diamond iterations and per-MB early termination."""
    B = mb_h * mb_w
    hpel_iters, qpel_iters, use_satd, try_mvp = \
        SUBME_RECIPE[min(max(subme, 0), 11)]
    f = tile_mb(fenc_y.astype(jnp.int32), mb_w, mb_h, 16)
    bmx = mv_field[..., 0].reshape(B)
    bmy = mv_field[..., 1].reshape(B)
    bcost = cost_field.reshape(B)
    mvpx = mvp_field[..., 0].reshape(B)
    mvpy = mvp_field[..., 1].reshape(B)
    lam = jnp.broadcast_to(jnp.asarray(lam), (mb_h, mb_w)).reshape(B)
    # per-MB legal ranges, flattened
    lo_x = jnp.broadcast_to(mvmin_x[None, :], (mb_h, mb_w)).reshape(B)
    hi_x = jnp.broadcast_to(mvmax_x[None, :], (mb_h, mb_w)).reshape(B)
    lo_y = jnp.broadcast_to(mvmin_y[:, None], (mb_h, mb_w)).reshape(B)
    hi_y = jnp.broadcast_to(mvmax_y[:, None], (mb_h, mb_w)).reshape(B)

    def make_cost_fns(wins, margin):
        def cost_at(mx, my, satd):
            blk = MG.mc_luma_batched(wins, mx, my, 16, 16, margin=margin)
            if satd:
                d = PX.satd(f, blk)
            else:
                d = jnp.abs(f - blk).sum((1, 2))
            return d + _mv_cost(lam, mx, my, mvpx, mvpy)

        def try_mv(bcost, bmx, bmy, mx, my, gate, satd=False):
            c = cost_at(mx, my, satd)
            better = gate & (c < bcost)
            return (jnp.where(better, c, bcost),
                    jnp.where(better, mx, bmx), jnp.where(better, my, bmy))

        def diamond_step(bcost, bmx, bmy, scale, gate, satd):
            # all 4 candidates on one window read (mc_luma_multi)
            omx, omy = bmx, bmy
            mxs = jnp.stack([omx, omx, omx - scale, omx + scale], 1)
            mys = jnp.stack([omy - scale, omy + scale, omy, omy], 1)
            blks = MG.mc_luma_multi(wins, mxs, mys, 16, 16, margin=margin)
            if satd:
                d = PX.satd(f[:, None], blks)
            else:
                d = jnp.abs(f[:, None] - blks).sum((2, 3))
            for k in range(4):
                c = d[:, k] + _mv_cost(lam, mxs[:, k], mys[:, k],
                                       mvpx, mvpy)
                better = gate & (c < bcost)
                bcost = jnp.where(better, c, bcost)
                bmx = jnp.where(better, mxs[:, k], bmx)
                bmy = jnp.where(better, mys[:, k], bmy)
            return bcost, bmx, bmy, omx, omy

        return cost_at, try_mv, diamond_step

    tt = jnp.ones((B,), bool)
    if try_mvp and hpel_iters:
        # try the subpel component of the MVP (me.c:484-491, subme < 3);
        # the window clamp deviates only for |mvp| > 75 qpel candidates.
        # This candidate can be far from the fullpel best, so it runs on
        # the FULL windows, before recentering.
        _, try_mv_full, _ = make_cost_fns(wins4, MG.M_LUMA)
        mx = MG.clamp_qpel(jnp.clip(mvpx, lo_x + 2, hi_x - 2))
        my = MG.clamp_qpel(jnp.clip(mvpy, lo_y + 2, hi_y - 2))
        bcost, bmx, bmy = try_mv_full(bcost, bmx, bmy, mx, my, tt)

    # Recenter the per-MB windows around the current best's fullpel part
    # (extract_windows4): every subsequent MC eval then reads a
    # (B, 4, 16+2m, 16+2m) tensor instead of the ~205 MB full-window
    # tensor — the diamond iterations are the P step's dominant cost
    # otherwise. m covers the recipe's worst-case drift
    # (2 qpel/hpel-iter + 1 qpel/qpel-iter), capped at 4 so the base
    # stays inside the M_LUMA coverage; deeper subme recipes (8-11) are
    # drift-capped by the coverage gate below.
    m = min(4, (2 * hpel_iters + qpel_iters + 3) // 4 + 2)
    base_x = jnp.clip(bmx >> 2, -(MG.M_LUMA - m), MG.M_LUMA - m)
    base_y = jnp.clip(bmy >> 2, -(MG.M_LUMA - m), MG.M_LUMA - m)
    wins_s = MG.extract_windows4(wins4, base_x, base_y, 16, 16, m)
    bx4, by4 = base_x * 4, base_y * 4
    bmx = bmx - bx4
    bmy = bmy - by4
    mvpx = mvpx - bx4
    mvpy = mvpy - by4
    # frame bounds translated to window-relative, intersected with the
    # recentered window's qpel coverage
    cov_lo, cov_hi = -4 * (m - 1), 4 * (m - 1) - 1
    lo_x = jnp.maximum(lo_x - bx4, cov_lo)
    hi_x = jnp.minimum(hi_x - bx4, cov_hi)
    lo_y = jnp.maximum(lo_y - by4, cov_lo)
    hi_y = jnp.minimum(hi_y - by4, cov_hi)
    cost_at, try_mv, diamond_step = make_cost_fns(wins_s, m)
    # half-pel diamond iterations, SAD metric (me.c:494-517), with the
    # per-MB "centre unchanged -> stop" early termination. fori_loop
    # keeps compile time flat for the subme>=6 iteration budgets.
    # The coverage gate never fires for the subme<=5 drift budgets (m is
    # sized for them); it drift-caps the deeper 8-11 recipes.
    def hpel_body(_, st):
        bcost, bmx, bmy, active = st
        inside = (active & (bmy - 2 >= cov_lo) & (bmy + 2 <= cov_hi)
                  & (bmx - 2 >= cov_lo) & (bmx + 2 <= cov_hi))
        bcost, bmx, bmy, omx, omy = diamond_step(bcost, bmx, bmy, 2,
                                                 inside, False)
        return bcost, bmx, bmy, active & ((bmx != omx) | (bmy != omy))

    if hpel_iters:
        bcost, bmx, bmy, _ = jax.lax.fori_loop(
            0, hpel_iters, hpel_body, (bcost, bmx, bmy, tt),
            unroll=hpel_iters <= 2)
    if use_satd:
        # switch metric: re-cost the half-pel best with SATD (me.c:520-524)
        bcost = cost_at(bmx, bmy, True)
    if subme == 1:
        # one qpel step, SAD (subme=1 special case, me.c:565-581)
        inside = ((bmy > lo_y) & (bmy < hi_y)
                  & (bmx > lo_x) & (bmx < hi_x))
        bcost, bmx, bmy, _, _ = diamond_step(bcost, bmx, bmy, 1,
                                             inside, False)
    else:
        # quarter-pel diamond iterations, SATD (me.c:541-564)
        def qpel_body(_, st):
            bcost, bmx, bmy, active = st
            inside = (active & (bmy > lo_y) & (bmy < hi_y)
                      & (bmx > lo_x) & (bmx < hi_x))
            bcost, bmx, bmy, omx, omy = diamond_step(
                bcost, bmx, bmy, 1, inside, use_satd)
            return (bcost, bmx, bmy,
                    active & ((bmx != omx) | (bmy != omy)))

        if qpel_iters:
            bcost, bmx, bmy, _ = jax.lax.fori_loop(
                0, qpel_iters, qpel_body, (bcost, bmx, bmy, tt),
                unroll=qpel_iters <= 2)
    bmx = bmx + bx4
    bmy = bmy + by4
    return jnp.stack([bmx.reshape(mb_h, mb_w), bmy.reshape(mb_h, mb_w)],
                     axis=-1)


# ---------------------------------------------------------------------------
# Phase C: residual encode
# ---------------------------------------------------------------------------

# (4,4) mask that zeroes the DC slot — .at[..., 0, 0].set() lowers to a
# per-element scatter on TPU (~34 ms at 1080p); mask-mul is elementwise
_DC_MASK = LazyConst(np.where(
    (np.arange(4)[:, None] == 0) & (np.arange(4)[None, :] == 0), 0,
    1).astype(np.int32))


def _set_dc(d, val=None):
    """d with [..., 0, 0] replaced by val (0 when None), elementwise."""
    masked = d * _DC_MASK
    if val is None:
        return masked
    return masked + val[..., None, None] * (1 - _DC_MASK)


def _decimate_group(scores):
    """Saturating 8x8 decimate accumulation (encoder/macroblock.c:409-417):
    scores added in block order only while the running sum < 6."""
    s = jnp.int32(0)
    for k in range(scores.shape[-1]):
        s = s + jnp.where(s < 6, scores[..., k], 0)
    return s


def _quad_split(x):
    """(..., 8, 8) -> (..., 4, 4, 4) quadrants in raster order
    [TL, TR, BL, BR] (sub8x8_dct block order, common/dct.c:157). Static
    slices + stack: a minor-dim transpose is a per-element relayout on
    TPU (~30 ms at 1080p); this is ~0."""
    return jnp.stack([x[..., :4, :4], x[..., :4, 4:],
                      x[..., 4:, :4], x[..., 4:, 4:]], axis=-3)


def _assemble_quads(quads, size: int):
    """quads: [[TL, TR], [BL, BR]] of (..., size, size) ->
    (..., 2*size, 2*size)."""
    top = jnp.concatenate([quads[0][0], quads[0][1]], axis=-1)
    bot = jnp.concatenate([quads[1][0], quads[1][1]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


_QUAD_SUB_Y = np.array([0, 0, 8, 8])
_QUAD_SUB_X = np.array([0, 8, 0, 8])


def _mc_luma_mv8(wins4, mv8f):
    """Per-quadrant luma MC: mv8f (B, 2, 2, 2) qpel MVs -> (B, 16, 16).
    MC over precomputed hpel planes is pointwise, so quadrant-wise
    compensation is exact for every partition shape (one uniform path
    for 16x16/16x8/8x16/8x8). All 4 quadrants ride one window read
    (mc_luma_multi)."""
    B = mv8f.shape[0]
    mxy = mv8f.reshape(B, 4, 2)
    q = MG.mc_luma_multi(wins4, mxy[..., 0], mxy[..., 1], 8, 8,
                         _QUAD_SUB_Y, _QUAD_SUB_X)    # (B, 4, 8, 8)
    return _quad_merge(q)


def _mc_chroma_mv8(winsc, mv8f):
    """Per-quadrant chroma MC (4x4 tiles): (B, 2, 2, 2) -> (B, 8, 8)."""
    quads = [[MG.mc_chroma_batched(winsc, mv8f[:, qy, qx, 0],
                                   mv8f[:, qy, qx, 1], 4, 4, qy * 4,
                                   qx * 4)
              for qx in range(2)] for qy in range(2)]
    return _assemble_quads(quads, 4)


def _quad_merge(blk):
    """(..., 4, 4, 4) raster quadrants -> (..., 8, 8) by concat (see
    _quad_split for why not a transpose)."""
    top = jnp.concatenate([blk[..., 0, :, :], blk[..., 1, :, :]], axis=-1)
    bot = jnp.concatenate([blk[..., 2, :, :], blk[..., 3, :, :]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _denoise_cm(cm, off, live_bg):
    """x264_denoise_dct (common/quant.c:194) over coefficient-major
    planes: accumulate per-position |level| sums, then subtract the
    per-position offset toward zero (sign restored). live_bg masks the
    sums to coded MBs only — P_SKIP MBs take the MC-only path and never
    reach denoise in the reference (macroblock.c:319-348). Returns
    (denoised planes, (16,) int64 sums)."""
    out, sums = [], []
    for c in range(16):
        a = jnp.abs(cm[c])
        sums.append(jnp.where(live_bg, a, 0).sum(dtype=jnp.int64))
        lvl = jnp.maximum(a - off[c], 0)
        out.append(jnp.sign(cm[c]) * lvl)
    return out, jnp.stack(sums)


def encode_p_residual(fenc_y, fenc_u, fenc_v, wins4, winsu, winsv, mv8,
                      qp, qpc, mb_w: int, mb_h: int, dct_decimate: bool,
                      force_skip=None, cqm=None, nr_offset=None):
    """Batched inter residual encode for all MBs, plane-resident: MC via
    window matmuls, then the whole-frame matmul-DCT pipeline of
    ops/residual_plane (no per-MB block tensors anywhere — a (B,16,4,4)
    tile wastes 31/32 of every TPU vector register).
    qp/qpc: scalars or per-MB (mb_h, mb_w) grids (AQ / row-VBV).
    force_skip: optional (mb_h, mb_w) bool — MBs whose probe succeeded
    encode as MC-only with all residual dropped (macroblock.c:319-348).
    Returns syntax tensors + recon planes (unfiltered)."""
    B = mb_h * mb_w
    qp_mb = jnp.broadcast_to(jnp.asarray(qp), (mb_h, mb_w))
    qpc_mb = jnp.broadcast_to(jnp.asarray(qpc), (mb_h, mb_w))
    fs = (jnp.zeros((mb_h, mb_w), bool) if force_skip is None
          else force_skip.reshape(mb_h, mb_w))
    mv8f = mv8.reshape(B, 2, 2, 2)

    # ---- luma ----
    pred_y = untile_mb(_mc_luma_mv8(wins4, mv8f), mb_w, mb_h, 16)
    cm = RP.sub_dct_cm(fenc_y.astype(jnp.int32), pred_y)
    live_bg = ~jnp.repeat(jnp.repeat(fs, 4, 0), 4, 1)
    nr = {}
    if nr_offset is not None:
        # noise reduction on every inter-coded path (macroblock.c:520-521)
        cm, nr["nr_sum_y"] = _denoise_cm(cm, nr_offset[0], live_bg)
        nr["nr_count"] = jnp.stack([(~fs).sum(dtype=jnp.int64) * 16,
                                    (~fs).sum(dtype=jnp.int64) * 4])
    q_cm = RP.quant_cm(cm, qp_mb, False, 4, cqm, 1)
    z_cm = RP.zigzag_order(q_cm)
    nnz_bg = RP.nnz_cm(z_cm)                           # (4mbh, 4mbw)
    nnz_bg = nnz_bg * live_bg
    z_cm = RP.mask_cm(z_cm, live_bg)
    if dct_decimate:
        sc_bg = jnp.where(nnz_bg > 0, RP.decimate_score_cm(z_cm), 0)
        sc_mb = RP.luma_nnz_coding(sc_bg, mb_h, mb_w)  # coding order
        gsum = _decimate_group(sc_mb.reshape(mb_h, mb_w, 4, 4))
        msum = gsum.sum(-1)                 # MB total (plain sum, :431)
        keep = (gsum >= 4) & (msum >= 6)[..., None]    # (mbh, mbw, 4q)
        keep_bg = jnp.repeat(jnp.repeat(
            RP.mb_to_blockgrid(keep.reshape(mb_h, mb_w, 2, 2),
                               mb_h, mb_w, 2), 2, 0), 2, 1)
        nnz_bg = nnz_bg * keep_bg
        z_cm = RP.mask_cm(z_cm, keep_bg)
        bits = (1 << jnp.arange(4, dtype=jnp.int32))
        cbp_luma = jnp.where(keep, bits, 0).sum(-1)
    else:
        nnz_mb = RP.luma_nnz_coding(nnz_bg, mb_h, mb_w)
        has = jnp.any(nnz_mb.reshape(mb_h, mb_w, 4, 4) > 0, axis=-1)
        bits = (1 << jnp.arange(4, dtype=jnp.int32))
        cbp_luma = jnp.where(has, bits, 0).sum(-1)
    dq_cm = RP.mask_cm(RP.dequant_cm(q_cm, qp_mb, 4, cqm, 1), nnz_bg)
    recon_y = RP.idct_add_plane(pred_y, dq_cm)
    levels = RP.luma_levels_coding(z_cm, mb_h, mb_w)
    nnz = RP.luma_nnz_coding(nnz_bg, mb_h, mb_w)

    # ---- chroma ----
    pred_u = untile_mb(_mc_chroma_mv8(winsu, mv8f), mb_w, mb_h, 8)
    pred_v = untile_mb(_mc_chroma_mv8(winsv, mv8f), mb_w, mb_h, 8)
    nr_c = None if nr_offset is None else nr_offset[1]
    eu = _encode_chroma_plane(fenc_u, pred_u, qpc_mb, dct_decimate, fs,
                              mb_h, mb_w, cqm, nr_off=nr_c)
    ev = _encode_chroma_plane(fenc_v, pred_v, qpc_mb, dct_decimate, fs,
                              mb_h, mb_w, cqm, nr_off=nr_c)
    if nr_offset is not None:
        nr["nr_sum_c"] = eu["nr_sum"] + ev["nr_sum"]
    any_ac = eu["has_ac"] | ev["has_ac"]
    any_dc = (eu["nz_dc"] | ev["nz_dc"]) != 0
    cbp_chroma = jnp.where(any_ac, 2, jnp.where(any_dc, 1, 0))

    return dict(
        cbp_luma=cbp_luma, cbp_chroma=cbp_chroma,
        luma_levels=levels, luma_nnz=nnz, luma_nnz_bg=nnz_bg,
        recon_y=recon_y, recon_u=eu["recon"], recon_v=ev["recon"],
        chroma_dc_levels=jnp.stack([eu["dc_levels"],
                                    ev["dc_levels"]], 2),
        chroma_ac_levels=jnp.stack([eu["ac_levels"],
                                    ev["ac_levels"]], 2),
        chroma_nnz_ac=jnp.stack([eu["nnz_ac"], ev["nnz_ac"]], 2),
        chroma_nz_dc=jnp.stack([eu["nz_dc"], ev["nz_dc"]], 2),
        **nr,
    )


def _encode_chroma_plane(fenc8p, pred8p, qpc_mb, b_decimate, fs,
                         mb_h: int, mb_w: int, cqm=None, nr_off=None):
    """One chroma channel of x264_mb_encode_chroma (b_inter=1,
    encoder/macroblock.c:175-300), plane-resident. fenc8p/pred8p:
    (8mb_h, 8mb_w) planes; qpc_mb/fs: (mb_h, mb_w). The variance
    early-skip is approximated by the AC decimate path (see the tile
    twin's docstring history — identical streams for the cases it
    prunes). nr_off: (16,) noise-reduction offsets, applied BEFORE the
    2x2 DC extraction (macroblock.c:245-248). Returns per-MB syntax +
    the recon plane."""
    cm = RP.sub_dct_cm(fenc8p.astype(jnp.int32), pred8p)
    nr = {}
    if nr_off is not None:
        live = ~jnp.repeat(jnp.repeat(fs, 2, 0), 2, 1)
        cm, nr["nr_sum"] = _denoise_cm(cm, nr_off, live)
    dc_bg = cm[0]                                      # (2mbh, 2mbw)
    cm_ac = [jnp.zeros_like(cm[0])] + cm[1:]
    q_cm = RP.quant_cm(cm_ac, qpc_mb, False, 2, cqm, 3)
    z_cm = RP.zigzag_order(q_cm)
    nnz_ac_bg = RP.nnz_cm(z_cm)                        # (2mbh, 2mbw)
    ac_levels = RP.chroma_levels_coding(z_cm, mb_h, mb_w)
    nnz_ac = RP.blockgrid_to_mb(nnz_ac_bg, mb_h, mb_w, 2) \
        .reshape(mb_h, mb_w, 4)
    dc_mb = RP.blockgrid_to_mb(dc_bg, mb_h, mb_w, 2) \
        .reshape(mb_h, mb_w, 4)                        # raster quadrants
    dc = T.hadamard2x2(dc_mb)
    q_dc = T.quant_dc(dc, qpc_mb, False, cqm, 3)
    nz_dc = jnp.any(q_dc != 0, axis=-1)

    if b_decimate:
        sc_bg = jnp.where(nnz_ac_bg > 0,
                          RP.decimate_score_cm(z_cm[1:]), 0)
        sc = RP.blockgrid_to_mb(sc_bg, mb_h, mb_w, 2) \
            .reshape(mb_h, mb_w, 4).sum(-1)
        nz_ac = (sc >= 7) & jnp.any(nnz_ac > 0, axis=-1)
    else:
        nz_ac = jnp.any(nnz_ac > 0, axis=-1)
    nz_ac = nz_ac & ~fs
    nz_dc = nz_dc & ~fs

    from .intra_frame import _optimize_chroma_dc
    opt_dc, opt_nz = _optimize_chroma_dc(q_dc, qpc_mb, cqm, 3)
    use_opt = (~nz_ac) & nz_dc & (qpc_mb <= 22)
    dc_final = jnp.where(use_opt[..., None], opt_dc, q_dc)
    nz_dc_final = jnp.where(use_opt, opt_nz, nz_dc)

    dc_levels = jnp.where(nz_dc_final[..., None],
                          dc_final[..., jnp.asarray([0, 2, 1, 3])], 0)
    dq_dc = T.idct_dequant_2x2_dc(dc_final, qpc_mb, cqm, 3)
    dq_cm = RP.dequant_cm(q_cm, qpc_mb, 2, cqm, 3)
    dq_dc_bg = RP.mb_to_blockgrid(dq_dc.reshape(mb_h, mb_w, 2, 2),
                                  mb_h, mb_w, 2)
    nz_dc_bg = jnp.repeat(jnp.repeat(nz_dc_final, 2, 0), 2, 1)
    dq_cm = [jnp.where(nz_dc_bg, dq_dc_bg, 0)] + dq_cm[1:]
    rec_ac = RP.idct_add_plane(pred8p, dq_cm)
    dc_shift = jnp.repeat(jnp.repeat((dq_dc_bg + 32) >> 6, 4, 0), 4, 1)
    rec_dc = jnp.clip(pred8p.astype(jnp.int32) + dc_shift, 0, 255)
    sel_ac = jnp.repeat(jnp.repeat(nz_ac, 8, 0), 8, 1)
    sel_dc = jnp.repeat(jnp.repeat(nz_dc_final, 8, 0), 8, 1)
    recon = jnp.where(sel_ac, rec_ac,
                      jnp.where(sel_dc, rec_dc,
                                pred8p.astype(jnp.int32)))
    nnz_ac = jnp.where(nz_ac[..., None], nnz_ac, 0)
    ac_levels = jnp.where(nz_ac[..., None, None], ac_levels, 0)
    return dict(recon=recon, dc_levels=dc_levels, ac_levels=ac_levels,
                nnz_ac=nnz_ac, nz_dc=nz_dc_final.astype(jnp.int32),
                has_ac=nz_ac, **nr)


def _encode_chroma_p(fenc8, pred8, qpc, b_decimate, force_skip=None):
    """Inter chroma encode, batched over a leading (B,) axis
    (x264_mb_encode_chroma with b_inter=1; the variance early-skip is
    approximated by the AC decimate path producing identical streams for
    the cases it prunes — the early-skip is a speed shortcut whose output
    path (DC-only or nothing) is reproduced by the score<7 rule below for
    nearly all blocks; full variance-path parity lands with rate
    control). qpc: scalar or (B,) per-MB chroma QP."""
    B = fenc8.shape[0]
    qpc = jnp.broadcast_to(jnp.asarray(qpc), (B,))
    blocks_f = _quad_split(fenc8)                      # (B, 4, 4, 4)
    blocks_p = _quad_split(pred8)
    dct = T.sub_dct4x4(blocks_f, blocks_p)
    dc_raw = dct[..., 0, 0]
    dct = _set_dc(dct)
    dc = T.hadamard2x2(dc_raw)
    q_ac = T.quant4x4(dct, qpc[:, None], False)
    nnz_ac = jnp.any(q_ac.reshape(B, 4, 16) != 0, axis=-1).astype(jnp.int32)
    ac_levels = T.zigzag4x4(q_ac)                      # (B, 4, 16)
    q_dc = T.quant_dc(dc, qpc, False)
    nz_dc = jnp.any(q_dc != 0, axis=-1)

    if b_decimate:
        sc = jnp.where(nnz_ac > 0,
                       T.decimate_score(ac_levels[..., 1:]), 0).sum(-1)
        nz_ac = (sc >= 7) & jnp.any(nnz_ac > 0, axis=-1)
    else:
        nz_ac = jnp.any(nnz_ac > 0, axis=-1)
    if force_skip is not None:
        nz_ac = nz_ac & ~force_skip
        nz_dc = nz_dc & ~force_skip

    from .intra_frame import _optimize_chroma_dc
    opt_dc, opt_nz = _optimize_chroma_dc(q_dc, qpc)
    use_opt = (~nz_ac) & nz_dc & (qpc <= 22)
    dc_final = jnp.where(use_opt[:, None], opt_dc, q_dc)
    nz_dc_final = jnp.where(use_opt, opt_nz, nz_dc)

    dc_levels = jnp.where(nz_dc_final[:, None],
                          dc_final[:, jnp.asarray([0, 2, 1, 3])], 0)
    dq_dc = T.idct_dequant_2x2_dc(dc_final, qpc)
    dq_ac = T.dequant4x4(q_ac, qpc[:, None])
    dq_ac = _set_dc(dq_ac, jnp.where(nz_dc_final[:, None], dq_dc, 0))
    rec_ac = T.idct4x4_add(blocks_p, dq_ac)
    dc_shift = (dq_dc + 32) >> 6
    rec_dc = jnp.clip(blocks_p.astype(jnp.int32)
                      + dc_shift[..., None, None], 0, 255)
    sel_ac = nz_ac[:, None, None, None]
    sel_dc = nz_dc_final[:, None, None, None]
    rec_blocks = jnp.where(sel_ac, rec_ac,
                           jnp.where(sel_dc, rec_dc,
                                     blocks_p.astype(jnp.int32)))
    recon = _quad_merge(rec_blocks)                    # (B, 8, 8)
    nnz_ac = jnp.where(nz_ac[:, None], nnz_ac, 0)
    ac_levels = jnp.where(nz_ac[:, None, None], ac_levels, 0)
    return dict(recon=recon, dc_levels=dc_levels, ac_levels=ac_levels,
                nnz_ac=nnz_ac, nz_dc=nz_dc_final.astype(jnp.int32),
                has_ac=nz_ac)


def _refine_block_batch(wins4, f_blk, bmx, bmy, bcost, mvpx, mvpy, lam,
                        lo_x, hi_x, lo_y, hi_y, bh: int, bw: int,
                        sub_y: int, sub_x: int, gate, subme: int = 1):
    """Subpel refinement of one partition geometry for all MBs
    (me.c:466-581 via x264_me_search in the partition MEs). All args are
    (B,)-shaped except the static geometry; `gate` masks MBs whose chosen
    partition shape doesn't include this block."""
    hpel_iters, qpel_iters, use_satd, try_mvp = \
        SUBME_RECIPE[min(max(subme, 0), 11)]
    _DIAMOND = ((0, -1), (0, 1), (-1, 0), (1, 0))   # x scale: 2=hpel 1=qpel

    def cost_at(mx, my, satd):
        blk = MG.mc_luma_batched(wins4, mx, my, bh, bw, sub_y, sub_x)
        if satd:
            d = PX.satd(f_blk, blk)
        else:
            d = jnp.abs(f_blk - blk).sum((1, 2))
        return d + _mv_cost(lam, mx, my, mvpx, mvpy)

    def try_mv(bcost, bmx, bmy, mx, my, g, satd=False):
        c = cost_at(mx, my, satd)
        better = g & (c < bcost)
        return (jnp.where(better, c, bcost), jnp.where(better, mx, bmx),
                jnp.where(better, my, bmy))

    def diamond_step(bcost, bmx, bmy, scale, g, satd):
        """One 4-candidate diamond via mc_luma_multi (one window read
        for all four candidates; selection order preserved)."""
        omx, omy = bmx, bmy
        mxs = jnp.stack([omx + dmx * scale for dmx, _ in _DIAMOND], 1)
        mys = jnp.stack([omy + dmy * scale for _, dmy in _DIAMOND], 1)
        blks = MG.mc_luma_multi(wins4, mxs, mys, bh, bw, sub_y, sub_x)
        if satd:
            d = PX.satd(f_blk[:, None], blks)
        else:
            d = jnp.abs(f_blk[:, None] - blks).sum((2, 3))
        for k in range(4):
            c = d[:, k] + _mv_cost(lam, mxs[:, k], mys[:, k], mvpx, mvpy)
            better = g & (c < bcost)
            bcost = jnp.where(better, c, bcost)
            bmx = jnp.where(better, mxs[:, k], bmx)
            bmy = jnp.where(better, mys[:, k], bmy)
        return bcost, bmx, bmy, omx, omy

    if try_mvp and hpel_iters:
        mx = MG.clamp_qpel(jnp.clip(mvpx, lo_x + 2, hi_x - 2))
        my = MG.clamp_qpel(jnp.clip(mvpy, lo_y + 2, hi_y - 2))
        bcost, bmx, bmy = try_mv(bcost, bmx, bmy, mx, my, gate)
    def hpel_body(_, st):
        bcost, bmx, bmy, active = st
        bcost, bmx, bmy, omx, omy = diamond_step(bcost, bmx, bmy, 2,
                                                 active, False)
        return bcost, bmx, bmy, active & ((bmx != omx) | (bmy != omy))

    if hpel_iters:
        bcost, bmx, bmy, _ = jax.lax.fori_loop(
            0, hpel_iters, hpel_body, (bcost, bmx, bmy, gate),
            unroll=hpel_iters <= 2)
    if use_satd:
        bcost = cost_at(bmx, bmy, True)
    n_qpel = 1 if subme == 1 else qpel_iters

    def qpel_body(_, st):
        bcost, bmx, bmy, active = st
        inside = (active & (bmy > lo_y) & (bmy < hi_y)
                  & (bmx > lo_x) & (bmx < hi_x))
        bcost, bmx, bmy, omx, omy = diamond_step(
            bcost, bmx, bmy, 1, inside, use_satd)
        return bcost, bmx, bmy, active & ((bmx != omx) | (bmy != omy))

    if n_qpel:
        bcost, bmx, bmy, _ = jax.lax.fori_loop(
            0, n_qpel, qpel_body, (bcost, bmx, bmy, gate),
            unroll=n_qpel <= 2)
    return bmx, bmy, bcost


def decide_partitions(cost8, mv16_field, fenc_y, wins4, lam,
                      mb_w: int, mb_h: int, me_range: int, mv_range: int,
                      skip_mask=None, subme: int = 1):
    """P partition analysis (x264_mb_analyse_inter_p8x8/p16x8/p8x16,
    encoder/analyse.c:864-1057, + the partition compare :1145-1182):
    full-pel argmin per sub-block shape on the quadrant cost surfaces,
    min-cost partition pick, then batched subpel refine of the winning
    shape's blocks only. cost8: (mb_h, mb_w, 2, 2, n, n) quadrant SADs;
    mv16_field: the refined 16x16 decision. Returns
    (partition (mb_h, mb_w) in {0:16x16,1:16x8,2:8x16,3:8x8},
     mv8 (mb_h, mb_w, 2, 2, 2) per-quadrant qpel MVs)."""
    R = me_range
    n = 2 * R + 1
    B = mb_h * mb_w
    offs = jnp.arange(-R, R + 1)
    mvmin_x, mvmax_x, mvmin_y, mvmax_y = make_mv_ranges(mb_w, mb_h, mv_range)
    lam_mb = jnp.broadcast_to(jnp.asarray(lam), (mb_h, mb_w))

    lo_x = (mvmin_x >> 2) + 6
    hi_x = (mvmax_x >> 2) - 6
    lo_y = (mvmin_y >> 2) + 6
    hi_y = (mvmax_y >> 2) - 6
    ok = ((offs[None, None, :] >= lo_x[:, None, None])
          & (offs[None, None, :] <= hi_x[:, None, None]))
    ok = ok[None, :, :, :] & \
        ((offs[None, :, None] >= lo_y[:, None, None])
         & (offs[None, :, None] <= hi_y[:, None, None]))[:, None, :, :]

    # search bias around the 16x16 result (the partition MEs seed from
    # me16x16.mv, analyse.c:880)
    mvpx = mv16_field[..., 0][..., None, None]
    mvpy = mv16_field[..., 1][..., None, None]
    bias = _mv_cost(lam_mb[..., None, None], offs[None, None, None, :] * 4,
                    offs[None, None, :, None] * 4, mvpx, mvpy)

    def pick(surf):
        cost = jnp.where(ok, surf + bias, 1 << 28)
        k = jnp.argmin(cost.reshape(mb_h, mb_w, -1), axis=-1)
        mv = jnp.stack([(k % n - R) * 4, (k // n - R) * 4], axis=-1)
        c = jnp.take_along_axis(cost.reshape(mb_h, mb_w, -1),
                                k[..., None], axis=-1)[..., 0]
        return mv, c

    mv_q = [[None, None], [None, None]]
    c_q = [[None, None], [None, None]]
    for qy in range(2):
        for qx in range(2):
            mv_q[qy][qx], c_q[qy][qx] = pick(cost8[:, :, qy, qx])
    mv_t, c_t = pick(cost8[:, :, 0, 0] + cost8[:, :, 0, 1])   # 16x8 top
    mv_b, c_b = pick(cost8[:, :, 1, 0] + cost8[:, :, 1, 1])   # bottom
    mv_l, c_l = pick(cost8[:, :, 0, 0] + cost8[:, :, 1, 0])   # 8x16 left
    mv_r, c_r = pick(cost8[:, :, 0, 1] + cost8[:, :, 1, 1])   # right
    mv16, c16 = pick(cost8.sum(axis=(2, 3)))

    c8x8 = c_q[0][0] + c_q[0][1] + c_q[1][0] + c_q[1][1]
    c16x8 = c_t + c_b
    c8x16 = c_l + c_r

    # COPY3_IF_LT chain order (analyse.c:1151-1182): 8x8, 16x8, 8x16
    part = jnp.zeros((mb_h, mb_w), jnp.int32)
    best = c16
    for cand, pid in ((c8x8, 3), (c16x8, 1), (c8x16, 2)):
        t = cand < best
        best = jnp.where(t, cand, best)
        part = jnp.where(t, pid, part)
    if skip_mask is not None:
        part = jnp.where(skip_mask, 0, part)

    # ---- batched subpel refine of the winning shape's blocks ----
    f16 = tile_mb(fenc_y.astype(jnp.int32), mb_w, mb_h, 16)
    lamf = lam_mb.reshape(B)
    lox = jnp.broadcast_to(mvmin_x[None, :], (mb_h, mb_w)).reshape(B)
    hix = jnp.broadcast_to(mvmax_x[None, :], (mb_h, mb_w)).reshape(B)
    loy = jnp.broadcast_to(mvmin_y[:, None], (mb_h, mb_w)).reshape(B)
    hiy = jnp.broadcast_to(mvmax_y[:, None], (mb_h, mb_w)).reshape(B)
    partf = part.reshape(B)
    mvpxf = mv16_field[..., 0].reshape(B)
    mvpyf = mv16_field[..., 1].reshape(B)

    def refine(mv0, c0, bh, bw, sy, sx, pid):
        f_blk = f16[:, sy:sy + bh, sx:sx + bw]
        bmx, bmy, _ = _refine_block_batch(
            wins4, f_blk, mv0[..., 0].reshape(B), mv0[..., 1].reshape(B),
            c0.reshape(B), mvpxf, mvpyf, lamf, lox, hix, loy, hiy,
            bh, bw, sy, sx, partf == pid, subme=subme)
        return jnp.stack([bmx.reshape(mb_h, mb_w),
                          bmy.reshape(mb_h, mb_w)], axis=-1)

    r_t = refine(mv_t, c_t, 8, 16, 0, 0, 1)
    r_b = refine(mv_b, c_b, 8, 16, 8, 0, 1)
    r_l = refine(mv_l, c_l, 16, 8, 0, 0, 2)
    r_r = refine(mv_r, c_r, 16, 8, 0, 8, 2)
    r_q = [[refine(mv_q[qy][qx], c_q[qy][qx], 8, 8, qy * 8, qx * 8, 3)
            for qx in range(2)] for qy in range(2)]

    # assemble per-quadrant MV field by partition shape (stack, not
    # scatter: minor-dim .at[].set is a per-element scatter on TPU)
    rows = []
    for qy in range(2):
        cols = []
        for qx in range(2):
            v = jnp.where((part == 1)[..., None], (r_t, r_b)[qy],
                          jnp.where((part == 2)[..., None],
                                    (r_l, r_r)[qx],
                                    jnp.where((part == 3)[..., None],
                                              r_q[qy][qx], mv16_field)))
            cols.append(v)
        rows.append(jnp.stack(cols, axis=2))
    mv8 = jnp.stack(rows, axis=2)
    return part, mv8


def pskip_mv_field(mv_field, mb_w: int, mb_h: int):
    """Exact P-SKIP MV (mvpred.c:143-160) for every MB from the decided
    MV field, batched (the A/B neighbours are raster-earlier, so the
    decided field gives the same answer the sequential loop sees)."""
    xs, ys = jnp.meshgrid(jnp.arange(mb_w), jnp.arange(mb_h))
    return jax.vmap(jax.vmap(
        lambda x, y: _pskip_mv(mv_field, x, y, mb_w)))(xs, ys)


def probe_pskip(fenc_y, fenc_u, fenc_v, wins4, winsu, winsv, pskip_mv,
                qp_mb, qpc_mb, mb_w: int, mb_h: int, mv_range: int,
                cqm=None):
    """Batched x264_macroblock_probe_pskip (encoder/macroblock.c:492-604):
    at the P-SKIP MV, the luma residual must fully decimate (score < 6,
    DC included) and each chroma channel must pass the SSD/DC/AC-decimate
    chain. Returns a (mb_h, mb_w) bool mask. Unlike the reference's
    neighbour-gated probe (a speed heuristic, analyse.c:1097-1106), every
    MB is probed — batching makes the full probe free."""
    B = mb_h * mb_w
    qp = jnp.broadcast_to(jnp.asarray(qp_mb), (mb_h, mb_w)).reshape(B)
    qpc = jnp.broadcast_to(jnp.asarray(qpc_mb), (mb_h, mb_w)).reshape(B)
    mvmin_x, mvmax_x, mvmin_y, mvmax_y = make_mv_ranges(mb_w, mb_h, mv_range)
    mvx = MG.clamp_qpel(jnp.clip(
        pskip_mv[..., 0],
        mvmin_x[None, :], mvmax_x[None, :])).reshape(B)
    mvy = MG.clamp_qpel(jnp.clip(
        pskip_mv[..., 1],
        mvmin_y[:, None], mvmax_y[:, None])).reshape(B)

    qp_g = qp.reshape(mb_h, mb_w)
    qpc_g = qpc.reshape(mb_h, mb_w)
    pred_y = untile_mb(MG.mc_luma_batched(wins4, mvx, mvy, 16, 16),
                       mb_w, mb_h, 16)
    z_cm = RP.zigzag_order(RP.quant_cm(
        RP.sub_dct_cm(fenc_y.astype(jnp.int32), pred_y), qp_g, False, 4,
        cqm, 1))
    nnz_bg = RP.nnz_cm(z_cm)
    sc_bg = jnp.where(nnz_bg > 0, RP.decimate_score_cm(z_cm), 0)
    score = sc_bg.reshape(mb_h, 4, mb_w, 4).sum((1, 3))
    luma_ok = score < 6

    thresh = (LAMBDA2_J[jnp.clip(qpc_g, 0, 51)] + 32) >> 6

    def chroma_ok(fenc_c, winsc):
        predc = untile_mb(MG.mc_chroma_batched(winsc, mvx, mvy, 8, 8),
                          mb_w, mb_h, 8)
        d = fenc_c.astype(jnp.int32) - predc
        ssd = (d * d).reshape(mb_h, 8, mb_w, 8).sum((1, 3))
        cm = RP.sub_dct_cm(fenc_c.astype(jnp.int32), predc)
        dc_bg = cm[0]                                  # (2mbh, 2mbw)
        # sub8x8_dct_dc INCLUDES the 2x2 DC Hadamard (common/dct.c:186-
        # 190): the probe must quantize the transformed DCs, else four
        # small same-sign DCs (a uniform chroma offset) sum past the
        # deadzone in the real encode but pass the probe
        dc_mb = RP.blockgrid_to_mb(dc_bg, mb_h, mb_w, 2).reshape(
            mb_h, mb_w, 4)
        s0 = dc_mb[..., 0] + dc_mb[..., 1]
        s1 = dc_mb[..., 2] + dc_mb[..., 3]
        r0 = dc_mb[..., 0] - dc_mb[..., 1]
        r1 = dc_mb[..., 2] - dc_mb[..., 3]
        had = jnp.stack([s0 + s1, r0 + r1, s0 - s1, r0 - r1], axis=-1)
        q_dc = T.quant_dc(had, qpc_g, False, cqm, 3)
        dc_nz = jnp.any(q_dc != 0, axis=-1)
        cm_ac = [jnp.zeros_like(cm[0])] + cm[1:]
        zc = RP.zigzag_order(RP.quant_cm(cm_ac, qpc_g, False, 2,
                                         cqm, 3))
        ac_bg = RP.nnz_cm(zc)
        acs_bg = jnp.where(ac_bg > 0, RP.decimate_score_cm(zc[1:]), 0)
        ac_score = acs_bg.reshape(mb_h, 2, mb_w, 2).sum((1, 3))
        # the chain: ssd<t → pass; DC nz → fail; ssd<4t → pass;
        # AC decimate >= 7 → fail
        return ((ssd < thresh)
                | (~dc_nz & ((ssd < (thresh << 2)) | (ac_score < 7))))

    ok = luma_ok & chroma_ok(fenc_u, winsu) & chroma_ok(fenc_v, winsv)
    return (ok,
            jnp.stack([mvx.reshape(mb_h, mb_w),
                       mvy.reshape(mb_h, mb_w)], axis=-1))


# single-buffer syntax transfer: (key, trailing shape per MB). One packed
# int16 device->host copy replaces 9 small ones (the tunnel has high
# per-transfer latency; levels are int16 in the reference too —
# common/common.h:126)
SYN_PACK_LAYOUT = (
    ("luma_levels", (16, 16)),
    ("chroma_dc_levels", (2, 4)),
    ("chroma_ac_levels", (2, 4, 16)),
    ("luma_nnz", (16,)),
    ("chroma_nnz_ac", (2, 4)),
    ("chroma_nz_dc", (2,)),
    ("cbp_luma", ()),
    ("cbp_chroma", ()),
    ("mv", (2,)),
    ("partition", ()),
    ("mv8", (2, 2, 2)),
    ("ref", ()),
)


def pack_syn_p(out: dict, mb_w: int, mb_h: int):
    """Concatenate the P-frame entropy syntax tensors into one flat int16
    buffer (device-side relayout; see SYN_PACK_LAYOUT)."""
    parts = [out[k].astype(jnp.int16).reshape(-1) for k, _ in
             SYN_PACK_LAYOUT]
    return jnp.concatenate(parts)


def pack_syn_p8(out: dict, mb_w: int, mb_h: int):
    """int8 variant of pack_syn_p: halves the device->host transfer.
    Element [0] is a has-big flag — 1 when any level exceeds the int8
    range (possible at very low QP), in which case the caller must pull
    the int16 pack instead. MVs are window-clamped to ±76 qpel, all
    other fields fit int8 by construction."""
    parts = [out[k].reshape(-1) for k, _ in SYN_PACK_LAYOUT]
    flat = jnp.concatenate(parts)
    has_big = jnp.any((flat > 127) | (flat < -128)).astype(jnp.int8)
    return jnp.concatenate([has_big[None],
                            jnp.clip(flat, -128, 127).astype(jnp.int8)])


_SYN_LEVEL_KEYS = ("luma_levels", "chroma_ac_levels")

# sparse pack: fields every MB needs (20 B/MB) vs the coded-MB payload
_SPARSE_DENSE = (("mv8", 8), ("partition", 1), ("ref", 1),
                 ("cbp_luma", 1), ("cbp_chroma", 1),
                 ("chroma_dc_levels", 8))
_SPARSE_MAX_BLOCKS = 6     # coded 4x4 blocks per MB the row can carry
_SPARSE_ROW = 4 + _SPARSE_MAX_BLOCKS * 8   # bitmap3+nblk1 + 8 B/block


def pack_syn_sparse(out: dict, mb_w: int, mb_h: int):
    """Sparse transfer pack for the ~15 MB/s test tunnel: a dense buffer
    (mv8/partition/ref/cbp/chroma-DC, 20 B/MB + flag + count) plus a
    one-hot-matmul-compacted row per CODED MB: a 24-bit coded-block
    bitmap and the nibble levels of up to 6 coded 4x4 blocks (8 B
    each). Levels outside [-8, 7], >6 coded blocks in one MB, or any
    dense field outside int8 set the has-big flag (caller falls back to
    the dense packs). nnz/nz fields are recomputed on host from the
    levels. Returns (dense, payload (B, 52) uint8, count)."""
    B = mb_h * mb_w
    dense_parts = [out[k].reshape(B, -1).astype(jnp.int32)
                   for k, _ in _SPARSE_DENSE]
    dense = jnp.concatenate(dense_parts, axis=1)       # (B, 20)
    lv = out["luma_levels"].reshape(B, 16, 16).astype(jnp.int32)
    ca = out["chroma_ac_levels"].reshape(B, 8, 16).astype(jnp.int32)
    blocks = jnp.concatenate([lv, ca], axis=1)         # (B, 24, 16)
    big = (jnp.any((blocks > 7) | (blocks < -8))
           | jnp.any((dense > 127) | (dense < -128)))

    nib = ((blocks[:, :, :8] & 15)
           | ((blocks[:, :, 8:] & 15) << 4))           # (B, 24, 8)
    codedb = jnp.any(blocks != 0, axis=2)              # (B, 24)
    nblk = codedb.sum(axis=1).astype(jnp.int32)
    big = big | jnp.any(nblk > _SPARSE_MAX_BLOCKS)
    # per-MB compaction of the <=6 coded blocks (one-hot matmul)
    pos = jnp.cumsum(codedb.astype(jnp.int32), axis=1) - 1
    slot = jax.lax.broadcasted_iota(jnp.int32,
                                    (1, _SPARSE_MAX_BLOCKS, 24), 1)
    sel = ((slot == pos[:, None, :]) & codedb[:, None, :]) \
        .astype(jnp.bfloat16)
    picked = jax.lax.dot_general(
        sel, nib.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (B, 6, 8)
    bits = (codedb.astype(jnp.int32)
            * (1 << (jnp.arange(24) % 8))[None, :])
    bitmap = jnp.stack([bits[:, 0:8].sum(1), bits[:, 8:16].sum(1),
                        bits[:, 16:24].sum(1)], axis=1)
    row = jnp.concatenate(
        [bitmap, nblk[:, None],
         picked.astype(jnp.int32).reshape(B, _SPARSE_MAX_BLOCKS * 8)],
        axis=1).astype(jnp.uint8)                      # (B, 52)

    coded = ((out["cbp_luma"].reshape(B) != 0)
             | (out["cbp_chroma"].reshape(B) != 0))
    pos_mb = jnp.cumsum(coded.astype(jnp.int32)) - 1
    slot_mb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    oh = ((slot_mb == pos_mb[None, :]) & coded[None, :]) \
        .astype(jnp.bfloat16)
    payload = jax.lax.dot(oh, row.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) \
        .astype(jnp.uint8)
    count = coded.sum().astype(jnp.int32)
    cnt_bytes = ((count >> jnp.arange(0, 32, 8)) & 0xFF).astype(jnp.int8)
    dense_flat = jnp.concatenate([
        big.astype(jnp.int8)[None], cnt_bytes,
        jnp.clip(dense, -128, 127).astype(jnp.int8).reshape(-1)])
    return dense_flat, payload, count


def sparse_count(dense_np: np.ndarray) -> int:
    """Coded-MB count embedded in a pack_syn_sparse dense buffer."""
    return int(dense_np[1:5].view(np.uint8).astype(np.uint32)
               @ (1 << np.arange(0, 32, 8, dtype=np.uint32)))


# block-granular wire (v3): per coded 4x4 BLOCK one 12-byte entry
# (4B id = mb*24+blk, 8B nibble levels). The frame-level budget replaces
# pack_syn_sparse's per-MB 6-block cap, which real content blows
# constantly (any MB with >6 coded blocks forced the catastrophic
# full-pack fallback). Compaction is an argsort-gather, not a BxB
# one-hot matmul.
_BLOCKS_PER_MB_BUDGET = 4          # K_cap = 4*B entries


def _pack_blocks_wire(dense, blocks, K):
    """Shared block-granular pack: dense (B, D) int32 per-MB fields +
    blocks (B, 24, 16) int32 4x4 levels (16 luma AC + 8 chroma AC) →
    (dense_flat int8 (5 + B*D,), entries uint8 (K, 12), count).
    Entry rows hold coded blocks first, raster order: [id u32le |
    8B levels as nibbles lo|hi<<4] with id = mb*24 + blk. has-big
    fires when any level leaves [-8, 7], a dense field leaves int8,
    or the frame has more than K coded blocks."""
    B = blocks.shape[0]
    big = (jnp.any((blocks > 7) | (blocks < -8))
           | jnp.any((dense > 127) | (dense < -128)))

    nib = ((blocks[:, :, :8] & 15)
           | ((blocks[:, :, 8:] & 15) << 4)).astype(jnp.uint8)
    codedb = jnp.any(blocks != 0, axis=2).reshape(B * 24)
    count = codedb.sum().astype(jnp.int32)
    big = big | (count > K)
    # stable compaction: coded block ids first, in raster order
    order = jnp.argsort(~codedb, stable=True)[:K].astype(jnp.int32)
    ids = jnp.where(codedb[order], order, -1)
    id_bytes = ((ids[:, None] >> jnp.arange(0, 32, 8)) & 0xFF) \
        .astype(jnp.uint8)                             # (K, 4)
    nib_rows = nib.reshape(B * 24, 8)[order]
    entries = jnp.concatenate([id_bytes, nib_rows], axis=1)  # (K, 12)
    cnt_bytes = ((count >> jnp.arange(0, 32, 8)) & 0xFF).astype(jnp.int8)
    dense_flat = jnp.concatenate([
        big.astype(jnp.int8)[None], cnt_bytes,
        jnp.clip(dense, -128, 127).astype(jnp.int8).reshape(-1)])
    return dense_flat, entries, count


def _unpack_blocks_wire(dense_np, entries_np, B, D):
    """Host half of _pack_blocks_wire: returns (dense (B, D) int16,
    blocks (B, 24, 16) int16) or None when has-big is set."""
    if dense_np[0]:
        return None
    dense = dense_np[5:].astype(np.int16).reshape(B, D)
    count = sparse_count(dense_np)
    blocks = np.zeros((B * 24, 16), np.int16)
    if count:
        rows = entries_np[:count].view(np.uint8)
        ids = rows[:, :4].astype(np.uint32) \
            @ (1 << np.arange(0, 32, 8, dtype=np.uint32))
        nib = rows[:, 4:]
        n0 = (nib & 15).astype(np.int16)
        n1 = ((nib >> 4) & 15).astype(np.int16)
        vals = np.concatenate([n0 - ((n0 > 7) << 4),
                               n1 - ((n1 > 7) << 4)], axis=1)
        blocks[ids.astype(np.int64)] = vals
    return dense, blocks.reshape(B, 24, 16)


def pack_syn_blocks(out: dict, mb_w: int, mb_h: int):
    """P-frame device wire pack, block-granular. Returns (dense,
    entries, count): dense = has-big flag + coded-block count (u32le) +
    per-MB mv8/partition/ref/cbp/chroma-DC (20 B/MB, int8); entries =
    one 12-byte row per coded 4x4 block (see _pack_blocks_wire)."""
    B = mb_h * mb_w
    K = _BLOCKS_PER_MB_BUDGET * B
    dense_parts = [out[k].reshape(B, -1).astype(jnp.int32)
                   for k, _ in _SPARSE_DENSE]
    dense = jnp.concatenate(dense_parts, axis=1)       # (B, 20)
    lv = out["luma_levels"].reshape(B, 16, 16).astype(jnp.int32)
    ca = out["chroma_ac_levels"].reshape(B, 8, 16).astype(jnp.int32)
    blocks = jnp.concatenate([lv, ca], axis=1)         # (B, 24, 16)
    return _pack_blocks_wire(dense, blocks, K)


def unpack_syn_blocks(dense_np: np.ndarray, entries_np: np.ndarray,
                      mb_w: int, mb_h: int):
    """Host unpack for pack_syn_blocks (None when has-big is set)."""
    B = mb_w * mb_h
    db = _unpack_blocks_wire(dense_np, entries_np, B, 20)
    if db is None:
        return None
    dense, blocks = db
    syn = {}
    off = 0
    for k, sz in _SPARSE_DENSE:
        shape = dict(SYN_PACK_LAYOUT)[k]
        syn[k] = dense[:, off:off + sz].reshape((mb_h, mb_w) + shape)
        off += sz
    syn["mv"] = syn["mv8"][:, :, 0, 0]
    syn["luma_levels"] = blocks[:, :16].reshape(mb_h, mb_w, 16, 16)
    syn["chroma_ac_levels"] = blocks[:, 16:].reshape(mb_h, mb_w, 2, 4, 16)
    syn["luma_nnz"] = np.count_nonzero(
        syn["luma_levels"], axis=-1).astype(np.int16)
    syn["chroma_nnz_ac"] = np.count_nonzero(
        syn["chroma_ac_levels"], axis=-1).astype(np.int16)
    syn["chroma_nz_dc"] = (syn["chroma_dc_levels"] != 0).any(-1) \
        .astype(np.int16)
    return syn


# I-slice block wire: same 24-block entry space; dense carries the
# intra decision fields + the DC level vectors (I frames code the DC
# planes separately: I16x16 luma DC hadamard + chroma 2x2 DC). Intra
# frames are denser than P, so the budget is higher.
_I_DENSE = (("mb_type", 1), ("i16_mode", 1), ("i4_modes", 16),
            ("chroma_mode", 1), ("cbp_luma", 1), ("cbp_chroma", 1),
            ("nz_luma_dc", 1), ("luma_dc_levels", 16),
            ("chroma_dc_levels", 8))
_BLOCKS_PER_MB_BUDGET_I = 12


def pack_syn_blocks_i(out: dict, mb_w: int, mb_h: int):
    """I-frame device wire pack, block-granular (see pack_syn_blocks):
    dense = flag + count + 46 B/MB intra fields, entries = 12 B per
    coded 4x4 AC block under a 12-blocks/MB frame budget."""
    B = mb_h * mb_w
    K = _BLOCKS_PER_MB_BUDGET_I * B
    dense_parts = [out[k].reshape(B, -1).astype(jnp.int32)
                   for k, _ in _I_DENSE]
    dense = jnp.concatenate(dense_parts, axis=1)       # (B, 46)
    lv = out["luma_levels"].reshape(B, 16, 16).astype(jnp.int32)
    ca = out["chroma_ac_levels"].reshape(B, 8, 16).astype(jnp.int32)
    blocks = jnp.concatenate([lv, ca], axis=1)         # (B, 24, 16)
    return _pack_blocks_wire(dense, blocks, K)


def unpack_syn_blocks_i(dense_np: np.ndarray, entries_np: np.ndarray,
                        mb_w: int, mb_h: int):
    """Host unpack for pack_syn_blocks_i (None when has-big is set)."""
    from .intra_frame import SYN_I_LAYOUT
    B = mb_w * mb_h
    db = _unpack_blocks_wire(dense_np, entries_np, B, 46)
    if db is None:
        return None
    dense, blocks = db
    syn = {}
    off = 0
    layout = dict(SYN_I_LAYOUT)
    for k, sz in _I_DENSE:
        syn[k] = dense[:, off:off + sz].reshape((mb_h, mb_w) + layout[k])
        off += sz
    syn["luma_levels"] = blocks[:, :16].reshape(mb_h, mb_w, 16, 16)
    syn["chroma_ac_levels"] = blocks[:, 16:].reshape(mb_h, mb_w, 2, 4, 16)
    syn["luma_nnz"] = np.count_nonzero(
        syn["luma_levels"], axis=-1).astype(np.int16)
    syn["chroma_nnz_ac"] = np.count_nonzero(
        syn["chroma_ac_levels"], axis=-1).astype(np.int16)
    syn["chroma_nz_dc"] = (syn["chroma_dc_levels"] != 0).any(-1) \
        .astype(np.int16)
    return syn


def unpack_syn_sparse(dense_np: np.ndarray, rows_np: np.ndarray,
                      mb_w: int, mb_h: int):
    """Host-side unpack for pack_syn_sparse; rows_np holds at least the
    first `sparse_count(dense_np)` payload rows (extra rows ignored).
    Returns the full syn dict (int16 arrays) or None when the has-big
    flag is set."""
    if dense_np[0]:
        return None
    B = mb_w * mb_h
    dense = dense_np[5:].astype(np.int16).reshape(B, 20)
    syn = {}
    off = 0
    for k, sz in _SPARSE_DENSE:
        shape = dict(SYN_PACK_LAYOUT)[k]
        syn[k] = dense[:, off:off + sz].reshape((mb_h, mb_w) + shape)
        off += sz
    syn["mv"] = syn["mv8"][:, :, 0, 0]
    coded = ((syn["cbp_luma"] != 0) | (syn["cbp_chroma"] != 0)).reshape(B)
    count = sparse_count(dense_np)
    idx = np.flatnonzero(coded)
    rows = rows_np[:count].view(np.uint8)
    blocks = np.zeros((B, 24, 16), np.int16)
    if count:
        bitmap = rows[:, :4].copy()
        bitmap[:, 3] = 0
        codedb = np.unpackbits(bitmap[:, :3], axis=1,
                               bitorder="little").astype(bool)  # (c, 24)
        nib = rows[:, 4:].reshape(count, _SPARSE_MAX_BLOCKS, 8)
        n0 = (nib & 15).astype(np.int16)
        n1 = ((nib >> 4) & 15).astype(np.int16)
        vals = np.concatenate([n0 - ((n0 > 7) << 4),
                               n1 - ((n1 > 7) << 4)], axis=2)  # (c, 6, 16)
        # scatter each row's coded blocks back to their positions
        r_idx, b_idx = np.nonzero(codedb)
        ord_in_row = (np.cumsum(codedb, axis=1) - 1)[r_idx, b_idx]
        blocks[idx[r_idx], b_idx] = vals[r_idx, ord_in_row]
    syn["luma_levels"] = blocks[:, :16].reshape(mb_h, mb_w, 16, 16)
    syn["chroma_ac_levels"] = blocks[:, 16:].reshape(mb_h, mb_w, 2, 4, 16)
    syn["luma_nnz"] = np.count_nonzero(
        syn["luma_levels"], axis=-1).astype(np.int16)
    syn["chroma_nnz_ac"] = np.count_nonzero(
        syn["chroma_ac_levels"], axis=-1).astype(np.int16)
    syn["chroma_nz_dc"] = (syn["chroma_dc_levels"] != 0).any(-1) \
        .astype(np.int16)
    return syn


def unpack_syn_p8(buf8: np.ndarray, mb_w: int, mb_h: int):
    """Host-side views for pack_syn_p8. Returns None if the has-big flag
    is set (caller falls back to the int16 pack)."""
    if buf8[0]:
        return None
    return unpack_syn_p(buf8[1:], mb_w, mb_h)


def unpack_syn_p(buf: np.ndarray, mb_w: int, mb_h: int) -> dict:
    """Host-side zero-copy views into a pulled pack_syn_p buffer."""
    B = mb_w * mb_h
    syn = {}
    off = 0
    for k, shape in SYN_PACK_LAYOUT:
        n = B * int(np.prod(shape)) if shape else B
        syn[k] = buf[off:off + n].reshape((mb_h, mb_w) + shape)
        off += n
    return syn


def mv8_to_mv4(mv8, mb_w: int, mb_h: int):
    """(mb_h, mb_w, 2, 2, 2) per-quadrant MVs -> (4mb_h, 4mb_w, 2)
    per-4x4-block grid (each 8x8 quadrant covers 2x2 blocks)."""
    g = mv8.transpose(0, 2, 1, 3, 4).reshape(mb_h * 2, mb_w * 2, 2)
    return jnp.repeat(jnp.repeat(g, 2, 0), 2, 1)


def compute_strengths_p(luma_nnz, cbp_luma, cbp_chroma, mv8,
                        mb_w: int, mb_h: int, ref_mb=None, nnz_bg=None):
    """Device deblock-strength computation for a P frame from the syntax
    tensors (x264_macroblock_deblock_strength, common/macroblock.c:677;
    strengths saved at encode time, encoder.c:1651). Returns (bs, feo).
    nnz_bg: optional (4mb_h, 4mb_w) nnz block grid — skips the
    coding-order relayout when the caller already has the plane form."""
    nnz4 = (nnz_bg if nnz_bg is not None
            else MG.blocks4_grid(luma_nnz, mb_h, mb_w))
    mv4 = mv8_to_mv4(mv8, mb_w, mb_h)
    if ref_mb is None:
        ref4 = jnp.zeros((mb_h * 4, mb_w * 4), jnp.int32)
    else:
        ref4 = jnp.repeat(jnp.repeat(ref_mb, 4, 0), 4, 1)
    intra = jnp.zeros((mb_h, mb_w), bool)
    bs = DB.compute_strengths(nnz4, mv4, ref4, intra)
    feo = ((cbp_luma | (cbp_chroma << 4)) == 0).astype(jnp.int32)
    return bs, feo


# te(n_ref-1) ref-idx bit sizes (x264_cost_ref, analyse.c:300-308)
def _ref_bits(r: int, n_ref: int) -> int:
    if n_ref <= 1:
        return 0
    if n_ref == 2:
        return 1
    return 2 * int(np.floor(np.log2(r + 1))) + 1


@functools.partial(jax.jit, static_argnames=("cqm", "mb_w", "mb_h", "me_range",
                                             "mv_range", "dct_decimate",
                                             "me_parallel", "fast_pskip",
                                             "partitions", "n_ref",
                                             "subme", "me_method"))
def encode_p_frame(fenc_y, fenc_u, fenc_v, ref4, refu, refv,
                   qp, qpc, lam, mb_w: int, mb_h: int, me_range: int,
                   mv_range: int, dct_decimate: bool,
                   me_parallel: bool = False, fast_pskip: bool = True,
                   partitions: bool = False, n_ref: int = 1,
                   subme: int = 1, cqm=None, nr_offset=None,
                   me_method: int = -1):
    """Full P-frame device pipeline. ref4/refu/refv from mc.make_ref_planes
    / mc.pad_chroma on the DEBLOCKED reference(s) — with n_ref > 1 they
    carry a leading reference axis (nearest first, x264_reference_build
    order, encoder.c:813-862).

    me_method selects the full-pel search (x264_me_search_ref,
    me.c:129-394): 0 = DIA and 1 = HEX run the reference's own pattern
    walks, batched on the cost surfaces with a decoupled median-MVP
    estimate (decide_mvs_pattern) — the fork's defaults and the fast
    path; 2 (UMH) = exhaustive-surface argmin with decoupled MVP
    (decide_mvs_parallel); 3 (ESA) = exhaustive argmin with the exact
    sequential-MVP wavefront (decide_mvs). The reference compiles
    UMH/ESA out (me.c:389-394); here they are deliberate
    stronger-than-reference tiers. me_method=-1 keeps the legacy
    me_parallel mapping (True -> 2, False -> 3).

    fast_pskip runs the batched P-SKIP probe (analyse.c:1095-1118) and
    forces successful MBs to MC-only skips. partitions enables the
    16x8/8x16/8x8 analysis (X264_ANALYSE_PSUB16x16, analyse.c:1141-1182).
    Multi-ref: per-MB best reference by fullpel cost + λ·ref bits
    (analyse.c:787-862); partition shapes inherit the MB's reference
    (:869)."""
    # surface16 fast path: when the walk is the only surface consumer
    # (DIA/HEX, single ref, no partition analysis), the Pallas kernel
    # sums the MB SAD in-kernel and never materializes the 4x bigger
    # quadrant tensor (me.c:237-387's searches never look at quadrants
    # either — the cheapness VERDICT r4 missing #1 asked for)
    surf16_path = (n_ref == 1 and me_method in (0, 1) and not partitions
                   and jax.default_backend() == "tpu")
    surf_lanes = None
    if n_ref == 1:
        if ref4.ndim == 4:
            ref4, refu, refv = ref4[0], refu[0], refv[0]
        if surf16_path:
            from ..ops.pallas.me_sad import (make_ref_strips,
                                             sad_cost_surface16_lanes)
            strips = make_ref_strips(ref4[0], MC.PAD_MC, mb_w, mb_h,
                                     me_range)
            surf_lanes = sad_cost_surface16_lanes(
                fenc_y.astype(jnp.int32), strips, mb_w=mb_w, mb_h=mb_h,
                R=me_range)
            cost8 = None
        else:
            cost8 = fullpel_cost_surfaces_8x8(fenc_y, ref4[0], mb_w,
                                              mb_h, me_range)
        wins4 = MG.luma_windows(ref4, mb_w, mb_h)
        winsu = MG.chroma_windows(refu, mb_w, mb_h)
        winsv = MG.chroma_windows(refv, mb_w, mb_h)
        wins4_r0, winsu_r0, winsv_r0 = wins4, winsu, winsv
        ref_mb = jnp.zeros((mb_h, mb_w), jnp.int32)
    else:
        lam_mb = jnp.broadcast_to(jnp.asarray(lam), (mb_h, mb_w))
        cost8_r = [fullpel_cost_surfaces_8x8(fenc_y, ref4[r, 0], mb_w,
                                             mb_h, me_range)
                   for r in range(n_ref)]
        # per-MB best ref: min over fullpel 16x16 SAD + λ·mvbits + λ·ref
        # bits. The mv-rate term is NOT ref-agnostic: a ref k frames
        # back matches at ~k× the motion, and the oracle's per-ref cost
        # (me.cost = SATD + λ·mvbits(mv − mvp_ref) + ref cost,
        # analyse.c:801-851) charges those longer vectors — its MVP for
        # a so-far-unused ref falls back near zero
        # (x264_mb_predict_mv_16x16 medians same-ref neighbours only),
        # so a zero-MVP bit grid is the faithful stand-in here. Without
        # it, sensor noise flips ~30% of MBs to the farther ref, each
        # then coding a doubled MV (PARITY config 5 ×1.04).
        off_bits = _mv_bits(4 * jnp.abs(jnp.arange(-me_range,
                                                   me_range + 1)))
        mv_grid = off_bits[:, None] + off_bits[None, :]   # (n, n)
        best = [(c8.sum(axis=(2, 3))
                 + lam_mb[..., None, None] * mv_grid
                 ).reshape(mb_h, mb_w, -1).min(-1)
                + lam_mb * _ref_bits(r, n_ref)
                for r, c8 in enumerate(cost8_r)]
        ref_mb = jnp.argmin(jnp.stack(best), axis=0).astype(jnp.int32)
        onehot = (jnp.arange(n_ref)[:, None, None]
                  == ref_mb[None]).astype(cost8_r[0].dtype)
        cost8 = sum(c8 * onehot[r][:, :, None, None, None, None]
                    for r, c8 in enumerate(cost8_r))
        wins_r = [MG.luma_windows(ref4[r], mb_w, mb_h)
                  for r in range(n_ref)]
        winsu_r = [MG.chroma_windows(refu[r], mb_w, mb_h)
                   for r in range(n_ref)]
        winsv_r = [MG.chroma_windows(refv[r], mb_w, mb_h)
                   for r in range(n_ref)]
        ohb = (jnp.arange(n_ref)[:, None]
               == ref_mb.reshape(-1)[None]).astype(jnp.bfloat16)
        wins4 = sum(w * ohb[r][:, None, None, None]
                    for r, w in enumerate(wins_r))
        winsu = sum(w * ohb[r][:, None, None]
                    for r, w in enumerate(winsu_r))
        winsv = sum(w * ohb[r][:, None, None]
                    for r, w in enumerate(winsv_r))
        wins4_r0, winsu_r0, winsv_r0 = wins_r[0], winsu_r[0], winsv_r[0]
    surf = None if cost8 is None else cost8.sum(axis=(2, 3))
    if me_method < 0:
        me_method = 2 if me_parallel else 3
    if me_method <= 1:
        mv_field = decide_mvs_pattern(surf, fenc_y, wins4, lam, mb_w,
                                      mb_h, me_range, mv_range,
                                      subme=subme, method=me_method,
                                      surf_lanes=surf_lanes)
    elif me_method == 2:
        mv_field = decide_mvs_parallel(surf, fenc_y, wins4, lam, mb_w,
                                       mb_h, me_range, mv_range,
                                       subme=subme)
    else:
        mv_field = decide_mvs(surf, fenc_y, wins4, lam, mb_w, mb_h,
                              me_range, mv_range, subme=subme)
    skip_ok = None
    if fast_pskip:
        psk = pskip_mv_field(mv_field, mb_w, mb_h)
        # the probe always tests reference 0 (macroblock.c:503-506)
        skip_ok, skip_mv = probe_pskip(
            fenc_y, fenc_u, fenc_v, wins4_r0, winsu_r0, winsv_r0, psk,
            qp, qpc, mb_w, mb_h, mv_range, cqm=cqm)
        mv_field = jnp.where(skip_ok[..., None], skip_mv, mv_field)
        ref_mb = jnp.where(skip_ok, 0, ref_mb)
        if n_ref > 1:
            # skipped MBs compensate from ref 0
            ohb = (jnp.arange(n_ref)[:, None]
                   == ref_mb.reshape(-1)[None]).astype(jnp.bfloat16)
            wins4 = sum(w * ohb[r][:, None, None, None]
                        for r, w in enumerate(wins_r))
            winsu = sum(w * ohb[r][:, None, None]
                        for r, w in enumerate(winsu_r))
            winsv = sum(w * ohb[r][:, None, None]
                        for r, w in enumerate(winsv_r))
    if partitions:
        part, mv8 = decide_partitions(cost8, mv_field, fenc_y, wins4, lam,
                                      mb_w, mb_h, me_range, mv_range,
                                      skip_mask=skip_ok, subme=subme)
    else:
        part = jnp.zeros((mb_h, mb_w), jnp.int32)
        mv8 = jnp.broadcast_to(mv_field[:, :, None, None, :],
                               (mb_h, mb_w, 2, 2, 2))
    out = encode_p_residual(fenc_y, fenc_u, fenc_v, wins4, winsu, winsv,
                            mv8, qp, qpc, mb_w, mb_h, dct_decimate,
                            force_skip=skip_ok, cqm=cqm,
                            nr_offset=nr_offset)
    out["mv"] = mv8[:, :, 0, 0]
    out["mv8"] = mv8
    out["partition"] = part
    out["ref"] = ref_mb
    out["bs"], out["feo"] = compute_strengths_p(
        out["luma_nnz"], out["cbp_luma"], out["cbp_chroma"], mv8,
        mb_w, mb_h, ref_mb=ref_mb, nnz_bg=out["luma_nnz_bg"])
    del out["luma_nnz_bg"]
    return out
