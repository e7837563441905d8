"""Device-side I-frame encoder: wavefront over the MB grid.

The reference encodes MBs serially (x264_slice_write, encoder.c:1503-1664);
the causal dependencies of intra prediction (reconstructed left/top/topright
neighbors) admit a 2:1-slope wavefront: MBs with equal x + 2y are
independent (topright (x+1, y-1) has index x+2y-1). This module runs one
`lax.fori_loop` over those diagonals; each step gathers neighbor pixels for
every MB on the diagonal, runs the full analysis+encode vectorized across
the diagonal (and the stream batch), and scatters reconstruction + syntax
tensors back.

Decision semantics replicate encoder/analyse.c exactly (mode availability
tables :424-484, i16x16 selection :564-638, the i4x4 favor-H/V shortcut
tree :640-746 with MPM discount and early i4x4 abort against the i16x16
cost, chroma selection :509-560) and encoder/macroblock.c's residual
pipeline (x264_mb_encode_i16x16 :72, x264_mb_encode_i4x4 macroblock.h:37,
x264_mb_encode_chroma :175 with the optimize_chroma_2x2_dc lossless DC
rounding, common/quant.c:141-196).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import intra as I
from ..ops import pixel as PX
from ..ops import transforms as T
from ..ops.golden import BLOCK_IDX_X, BLOCK_IDX_Y
from ..ops._lazyconst import LazyConst

COST_MAX = np.int32(1 << 28)

# x264_mb_pred_mode4x4_fix (common/predict.h:60-68), indexed by mode+1
_FIX4 = LazyConst(np.array([-1, 0, 1, 2, 3, 4, 5, 6, 7, 8, 2, 2, 2],
                            np.int32))
# ue(v) bit sizes for fixed mode numbers 0..3
_UE_BITS = np.array([1, 3, 3, 5], np.int32)
# per-physical-mode ue bits for 16x16 (fix: V,H,DC,P,DC,DC,DC → 0,1,2,3,2,2,2)
_BITS16 = LazyConst(_UE_BITS[[0, 1, 2, 3, 2, 2, 2]])
# chroma fix: DC,H,V,P,DC,DC,DC → 0,1,2,3,0,0,0
_BITSC = LazyConst(_UE_BITS[[0, 1, 2, 3, 0, 0, 0]])

# evaluation orders per availability case (encoder/analyse.c:436-442),
# -1 = unused slot (cost forced to +inf)
_ORDER16 = LazyConst(np.array([
    [6, -1, -1, -1],   # none: DC_128
    [4, 1, -1, -1],    # left: DC_LEFT, H
    [5, 0, -1, -1],    # top:  DC_TOP, V
    [0, 1, 2, -1],     # left+top: V, H, DC
    [0, 1, 2, 3],      # all: V, H, DC, P
], np.int32))
_ORDERC = LazyConst(np.array([
    [6, -1, -1, -1],   # DC_128
    [4, 1, -1, -1],    # DC_LEFT, H
    [5, 2, -1, -1],    # DC_TOP, V
    [2, 1, 0, -1],     # V, H, DC
    [2, 1, 0, 3],      # V, H, DC, P
], np.int32))

# i4x4 serial-path mode lists per availability case (i4x4_mode_available[0],
# analyse.c:471-478); only cases 0-2 use the serial loop over the full list
_I4_LIST = np.array([
    [11, -1, -1, -1],   # DC_128
    [9, 1, 8, -1],      # DC_LEFT, H, HU
    [10, 0, 3, 7],      # DC_TOP, V, DDL, VL
    [0, 0, 0, 0],       # unused (case 3 handled by x3+shortcut)
    [0, 0, 0, 0],       # unused (case 4 handled by x3/x4)
], np.int32)

# block idx → idx of the block at (bx+1, by-1) coded-before rule gives the
# static topright availability for by>0 rows
_IDX_OF = {(int(x), int(y)): i for i, (x, y) in
           enumerate(zip(BLOCK_IDX_X, BLOCK_IDX_Y))}


def _avail_case(left, top, tl):
    """Availability case index 0..4 (predict_*_mode_available,
    analyse.c:486-508)."""
    both = left & top
    return jnp.where(both & tl, 4, left + 2 * top)


def _ordered_pick(costs, order):
    """COPY2_IF_LT chain: first index achieving the minimum, in `order`.
    costs: (n_modes,), order: (k,) physical mode ids with -1 padding."""
    oc = jnp.where(order >= 0, costs[jnp.maximum(order, 0)], COST_MAX)
    k = jnp.argmin(oc)  # argmin returns the first occurrence == strict <
    return oc[k], order[k]


def _mbcmp(a, b, use_satd: bool):
    return PX.satd(a, b) if use_satd else PX.sad(a, b)


def _serial_i4(costs12, order, mpm, lam, init_best, init_mode):
    """The reference's serial mode loop (analyse.c:723-746): per mode, MPM
    discount, early accept when discounted cost <= 0, else COPY2_IF_LT."""
    best, mode = init_best, init_mode
    stopped = jnp.bool_(False)
    for j in range(order.shape[0]):
        m = order[j]
        m_ok = m >= 0
        satd = jnp.where(m_ok, costs12[jnp.maximum(m, 0)], COST_MAX)
        is_mpm = m_ok & (mpm == _FIX4[jnp.maximum(m, 0) + 1])
        satd = jnp.where(is_mpm, satd - lam * 3, satd)
        accept = m_ok & (~stopped) & is_mpm & (satd <= 0)
        better = m_ok & (~stopped) & (satd < best)
        take = accept | better
        best = jnp.where(take, satd, best)
        mode = jnp.where(take, m, mode)
        stopped = stopped | accept
    return best, mode


def _encode_4x4(fenc_blk, pred, qp, cqm=None):
    """x264_mb_encode_i4x4 core (encoder/macroblock.h:37-63)."""
    dct = T.sub_dct4x4(fenc_blk, pred)
    q = T.quant4x4(dct, qp, True, cqm, 0)
    nz = jnp.any(q != 0)
    levels = T.zigzag4x4(q)
    dq = T.dequant4x4(q, qp, cqm, 0)
    recon = jnp.where(nz, T.idct4x4_add(pred, dq), pred)
    return recon, levels, nz.astype(jnp.int32)


# 2x2 hadamard signs H[j][c]: out_j = sum_c H[j][c] * d_c (the butterfly
# in optimize_chroma_idct_dequant_2x2, common/quant.c:127-143)
_HAD2x2 = ((1, 1, 1, 1), (1, 1, -1, -1), (1, -1, 1, -1), (1, -1, -1, 1))


def _optimize_chroma_dc(dc, qp, cqm=None, cqm_set: int = 2):
    """optimize_chroma_2x2_dc (common/quant.c:157-192): losslessly round
    DC coefficients toward zero while the (>>6) reconstruction is
    unchanged. Closed form instead of the reference's unit-step while
    loop: with w(a) = (a*dmf)>>5 and r = (w+32)>>6, r is monotone in the
    hadamard output a, so r stays at its original value R_j exactly while
    a_j lies in the integer band [ceil(32*(64R-32)/dmf),
    floor((32*(64R+32)-1)/dmf)]; the maximal lossless reduction of each
    coefficient is the distance to the nearest band edge, taken in the
    reference's 3,2,1,0 order. Fully batched: dc (..., 4) in reference
    storage order, qp scalar or (...,). Returns (new_dc, nz)."""
    dc = jnp.asarray(dc)
    qp = jnp.asarray(qp)
    _, _, DMF = T.cqm_mf(cqm, cqm_set)
    dmf = T.table_rows(DMF, qp % 6)[..., 0] << (qp // 6)

    def had(d):
        return [sum(h * d[c] for c, h in enumerate(row)) for row in _HAD2x2]

    d = [dc[..., c] for c in range(4)]
    a = had(d)                                # running hadamard outputs
    w = [(aj * dmf) >> 5 for aj in a]
    already_zero = jnp.ones_like(dc[..., 0], dtype=bool)
    for wj in w:
        already_zero &= ((wj + 32) >> 6) == 0

    # per-output allowed band from the ORIGINAL rounding R_j (the
    # reference checks every trial against dct_orig, quant.c:166-180)
    amin, amax = [], []
    for wj in w:
        R = (wj + 32) >> 6
        amin.append(-((-32 * (64 * R - 32)) // dmf))   # ceil div
        amax.append((32 * (64 * R + 32) - 1) // dmf)    # floor of <
    for c in (3, 2, 1, 0):
        s = jnp.where(d[c] < 0, -1, 1)
        k = jnp.abs(d[c])                     # cap: reduce at most to 0
        for j in range(4):
            eps_pos = (-s * _HAD2x2[j][c]) > 0     # a_j moves up
            k = jnp.minimum(k, jnp.where(eps_pos, amax[j] - a[j],
                                         a[j] - amin[j]))
        k = jnp.maximum(k, 0)
        d[c] = d[c] - s * k
        for j in range(4):
            a[j] = a[j] - s * _HAD2x2[j][c] * k
    new_dc = jnp.stack(d, axis=-1)
    zero = already_zero[..., None]
    nz = jnp.any(new_dc != 0, axis=-1) & ~already_zero
    return jnp.where(zero, 0, new_dc), nz


def _encode_chroma_channel(fenc8, pred8, qp, intra: bool, cqm=None):
    """One chroma channel of x264_mb_encode_chroma (b_decimate=0 path,
    encoder/macroblock.c:233-300). Returns dict with recon, dc/ac levels,
    nnz flags."""
    cs = 2 if intra else 3  # CQM_4IC / CQM_4PC (set.h:63-64)
    # 4 quadrant blocks in raster order (sub8x8_dct, common/dct.c:157)
    blocks_f = jnp.stack([fenc8[0:4, 0:4], fenc8[0:4, 4:8],
                          fenc8[4:8, 0:4], fenc8[4:8, 4:8]])
    blocks_p = jnp.stack([pred8[0:4, 0:4], pred8[0:4, 4:8],
                          pred8[4:8, 0:4], pred8[4:8, 4:8]])
    dct = T.sub_dct4x4(blocks_f, blocks_p)            # (4, 4, 4)
    dc_raw = dct[:, 0, 0]
    dct = dct.at[:, 0, 0].set(0)
    dc = T.hadamard2x2(dc_raw)                        # reference storage order
    q_ac = T.quant4x4(dct, qp, intra, cqm, cs)        # (4, 4, 4)
    nnz_ac = jnp.any(q_ac.reshape(4, 16) != 0, axis=-1).astype(jnp.int32)
    nz_ac = jnp.any(nnz_ac != 0)
    ac_levels = T.zigzag4x4(q_ac)                     # (4, 16)
    q_dc = T.quant_dc(dc, qp, intra, cqm, cs)
    nz_dc = jnp.any(q_dc != 0)

    # DC-only path with lossless rounding at low QP (macroblock.c:262-284)
    opt_dc, opt_nz = _optimize_chroma_dc(q_dc, qp, cqm, cs)
    use_opt = (~nz_ac) & nz_dc & (qp <= 22)
    dc_final = jnp.where(use_opt, opt_dc, q_dc)
    nz_dc_final = jnp.where(use_opt, opt_nz, nz_dc)

    dc_levels = dc_final[jnp.asarray([0, 2, 1, 3])]   # zigzag_scan_2x2_dc

    # reconstruction:
    dq_dc = T.idct_dequant_2x2_dc(dc_final, qp, cqm, cs)
    # AC path recon: dct4x4 blocks with DC inserted, idct
    dq_ac = T.dequant4x4(q_ac, qp, cqm, cs)
    dq_ac = dq_ac.at[:, 0, 0].set(jnp.where(nz_dc_final, dq_dc, 0))
    rec_blocks_ac = T.idct4x4_add(blocks_p, dq_ac)
    # DC-only recon: (dc+32)>>6 added (add8x8_idct_dc, common/dct.c:253)
    dc_shift = (dq_dc + 32) >> 6
    rec_blocks_dc = jnp.clip(
        blocks_p.astype(jnp.int32) + dc_shift[:, None, None], 0, 255)
    rec_blocks_none = blocks_p.astype(jnp.int32)

    rec_blocks = jnp.where(
        nz_ac, rec_blocks_ac,
        jnp.where(nz_dc_final, rec_blocks_dc, rec_blocks_none))
    recon = jnp.zeros((8, 8), jnp.int32)
    recon = recon.at[0:4, 0:4].set(rec_blocks[0])
    recon = recon.at[0:4, 4:8].set(rec_blocks[1])
    recon = recon.at[4:8, 0:4].set(rec_blocks[2])
    recon = recon.at[4:8, 4:8].set(rec_blocks[3])

    nnz_ac = jnp.where(nz_ac, nnz_ac, jnp.zeros_like(nnz_ac))
    ac_levels = jnp.where(nz_ac, ac_levels, jnp.zeros_like(ac_levels))
    return dict(recon=recon, dc_levels=dc_levels, ac_levels=ac_levels,
                nnz_ac=nnz_ac, nz_dc=nz_dc_final.astype(jnp.int32),
                has_ac=nz_ac)


def _encode_i16(fenc16, pred16, qp, cqm=None):
    """x264_mb_encode_i16x16 (encoder/macroblock.c:72-170), I-slice
    (no decimation)."""
    bx = jnp.asarray(BLOCK_IDX_X * 4)
    by = jnp.asarray(BLOCK_IDX_Y * 4)
    # gather the 16 4x4 blocks in coding (quadrant) order
    rows = by[:, None, None] + jnp.arange(4)[None, :, None]
    cols = bx[:, None, None] + jnp.arange(4)[None, None, :]
    blk_f = fenc16[rows, cols]
    blk_p = pred16[rows, cols]
    dct = T.sub_dct4x4(blk_f, blk_p)                  # (16, 4, 4)
    dc_raw = dct[:, 0, 0]
    dct = dct.at[:, 0, 0].set(0)
    q = T.quant4x4(dct, qp, True, cqm, 0)
    nnz = jnp.any(q.reshape(16, 16) != 0, axis=-1).astype(jnp.int32)
    any_ac = jnp.any(nnz != 0)
    cbp_luma = jnp.where(any_ac, 0xF, 0)
    levels = T.zigzag4x4(q)                           # (16, 16), [:,0] == 0
    dq_ac = T.dequant4x4(q, qp, cqm, 0)

    # DC: natural 4x4 grid position = (block_y, block_x)
    dc_grid = jnp.zeros((4, 4), jnp.int32).at[
        jnp.asarray(BLOCK_IDX_Y), jnp.asarray(BLOCK_IDX_X)].set(dc_raw)
    dc_t = T.hadamard4x4(dc_grid, forward=True)
    q_dc = T.quant_dc(dc_t.reshape(16), qp, True, cqm, 0)
    nz_dc = jnp.any(q_dc != 0)
    dc_levels = T.zigzag4x4(q_dc.reshape(4, 4))
    dc_it = T.hadamard4x4(q_dc.reshape(4, 4), forward=False)
    dc_dq = T.dequant_dc4x4(dc_it, qp, cqm, 0)
    dc_per_block = jnp.where(
        nz_dc, dc_dq[jnp.asarray(BLOCK_IDX_Y), jnp.asarray(BLOCK_IDX_X)], 0)

    dq_full = dq_ac.at[:, 0, 0].set(dc_per_block)
    rec_ac = T.idct4x4_add(blk_p, dq_full)
    rec_dc = jnp.clip(blk_p.astype(jnp.int32)
                      + ((dc_per_block + 32) >> 6)[:, None, None], 0, 255)
    rec_blocks = jnp.where(any_ac, rec_ac,
                           jnp.where(nz_dc, rec_dc, blk_p.astype(jnp.int32)))
    recon = jnp.zeros((16, 16), jnp.int32)
    recon = recon.at[rows, cols].set(rec_blocks)
    return dict(recon=recon, levels=levels, dc_levels=dc_levels,
                nnz=nnz, nz_dc=nz_dc.astype(jnp.int32), cbp_luma=cbp_luma)


# static per-block-index geometry tables
_BX4 = LazyConst(BLOCK_IDX_X.astype(np.int32))
_BY4 = LazyConst(BLOCK_IDX_Y.astype(np.int32))
# static topright availability for by>0 blocks (coded-order rule)
_TR_STATIC = LazyConst(np.array(
    [int(bx < 3 and by > 0
         and _IDX_OF[(int(bx) + 1, int(by) - 1)] < i)
     for i, (bx, by) in enumerate(zip(BLOCK_IDX_X, BLOCK_IDX_Y))],
    np.int32))


def _analyse_encode_i4(fenc16, ytop25, yleft16, qp, lam, thresh, cqm,
                       avail_l, avail_t, avail_tl, avail_tr,
                       left_modes, top_modes, use_satd):
    """i4x4 analysis + inline encode (analyse.c:640-760 + macroblock.h:37).

    Runs as a lax.fori_loop over the 16 blocks in coding order, operating
    on a unified local buffer L (17x25): row 0 = [topleft | top 16 | 8
    topright samples], column 0 = left border, interior = reconstruction
    so far. Pixel (r, c) of the MB lives at L[1+r, 1+c], so every neighbor
    gather is one dynamic slice regardless of block position.

    Returns (cost, valid, modes(16,), recon(16,16), levels(16,16), nnz(16,))."""
    L = jnp.zeros((17, 25), jnp.int32)
    L = L.at[0, :].set(ytop25)
    L = L.at[1:17, 0].set(yleft16)
    # mode grid M (5x5): M[1+by, 1+bx] = decided mode; borders = neighbors
    M = jnp.full((5, 5), -1, jnp.int32)
    M = M.at[0, 1:5].set(top_modes)
    M = M.at[1:5, 0].set(left_modes)

    def block_body(idx, state):
        L, M, all_levels, all_nnz, cost, aborted = state
        bx = _BX4[idx]
        by = _BY4[idx]
        x0, y0 = bx * 4, by * 4

        # ---- neighbor pixels (unified gathers) ----
        top4 = jax.lax.dynamic_slice(L, (y0, x0 + 1), (1, 4))[0]
        tr4_raw = jax.lax.dynamic_slice(L, (y0, x0 + 5), (1, 4))[0]
        left4 = jax.lax.dynamic_slice(L, (y0 + 1, x0), (4, 1))[:, 0]
        tl = jax.lax.dynamic_slice(L, (y0, x0), (1, 1))[0, 0]

        # ---- availability ----
        tt = jnp.bool_(True)
        b_l = jnp.where(bx > 0, tt, avail_l)
        b_t = jnp.where(by > 0, tt, avail_t)
        b_tl = jnp.where((bx > 0) & (by > 0), tt,
                         jnp.where(by == 0,
                                   jnp.where(bx > 0, avail_t, avail_tl),
                                   avail_l))
        b_tr = jnp.where(by == 0,
                         jnp.where(bx < 3, avail_t, avail_tr),
                         _TR_STATIC[idx] > 0)

        # topright emulation (macroblock_encode / analyse.c:677-679)
        patch = b_t & ~b_tr
        tr4 = jnp.where(patch, jnp.broadcast_to(top4[3], (4,)), tr4_raw)

        # ---- most probable mode (common/macroblock.h:373-388) ----
        lmode = M[1 + by, bx]
        tmode = M[by, 1 + bx]
        m = jnp.minimum(_FIX4[lmode + 1], _FIX4[tmode + 1])
        mpm = jnp.where(m < 0, 2, m)

        # ---- all-mode predictions + raw costs ----
        preds = I.predict_4x4_all(left4[None], top4[None], tl[None],
                                  tr4[None])[0]        # (12, 4, 4)
        fenc_blk = jax.lax.dynamic_slice(fenc16, (y0, x0), (4, 4))
        if use_satd:
            costs = PX.satd_4x4(preds, fenc_blk)
        else:
            costs = PX.sad(preds, fenc_blk)
        costs = costs.astype(jnp.int32)

        case = _avail_case(b_l.astype(jnp.int32), b_t.astype(jnp.int32),
                           b_tl.astype(jnp.int32))

        # --- case >= 3: x3 fast path (analyse.c:681-722) ---
        favor_v = costs[1] > costs[0]  # satd[H] > satd[V]
        disc = costs.at[mpm].add(-lam * 3)
        best4 = disc[2]
        mode4 = jnp.int32(2)
        for mseq in (1, 0, 3, 4):
            c = disc[mseq]
            t = c < best4
            best4, mode4 = jnp.where(t, c, best4), jnp.where(t, mseq, mode4)
        for pair_v, pair_h in ((5, 6), (7, 8)):
            msel = jnp.where(favor_v, pair_v, pair_h)
            c = disc[msel]
            t = c < best4
            best4, mode4 = jnp.where(t, c, best4), jnp.where(t, msel, mode4)

        # case 3: x3 over DC,H,V then serial shortcut list (no topleft)
        best3 = disc[2]
        mode3 = jnp.int32(2)
        for mseq in (1, 0):
            c = disc[mseq]
            t = c < best3
            best3, mode3 = jnp.where(t, c, best3), jnp.where(t, mseq, mode3)
        # shortcut list: favor_v ? {DDL, VL} : {HU} (analyse.c:485-491)
        sc_order = jnp.where(favor_v,
                             jnp.asarray([3, 7], jnp.int32),
                             jnp.asarray([8, -1], jnp.int32))
        b3s, m3s = _serial_i4(costs, sc_order, mpm, lam, best3, mode3)
        run_serial = best3 > 0
        best3 = jnp.where(run_serial, b3s, best3)
        mode3 = jnp.where(run_serial, m3s, mode3)

        # cases 0-2: pure serial loop over the availability list
        order_low = jnp.asarray(_I4_LIST)[jnp.minimum(case, 2)]
        best_low, mode_low = _serial_i4(costs, order_low, mpm, lam,
                                        COST_MAX, jnp.int32(11))

        best = jnp.where(case == 4, best4,
                         jnp.where(case == 3, best3, best_low))
        mode = jnp.where(case == 4, mode4,
                         jnp.where(case == 3, mode3, mode_low))

        cost = cost + best + lam * 3
        aborted = aborted | ((cost > thresh) & (idx < 15))

        # ---- encode the block with the chosen mode ----
        pred = preds[mode]
        recon_blk, levels, nz = _encode_4x4(fenc_blk, pred, qp, cqm)
        L = jax.lax.dynamic_update_slice(L, recon_blk, (y0 + 1, x0 + 1))
        M = M.at[1 + by, 1 + bx].set(mode)
        all_levels = all_levels.at[idx].set(levels)
        all_nnz = all_nnz.at[idx].set(nz)
        return (L, M, all_levels, all_nnz, cost, aborted)

    state = (L, M, jnp.zeros((16, 16), jnp.int32), jnp.zeros((16,), jnp.int32),
             lam * 40, jnp.bool_(False))
    L, M, all_levels, all_nnz, cost, aborted = jax.lax.fori_loop(
        0, 16, block_body, state)

    # decided modes in coding order, reconstruction from the local buffer
    decided = M[1 + _BY4, 1 + _BX4]
    cur = L[1:17, 1:17]
    valid = ~aborted
    return cost, valid, decided, cur, all_levels, all_nnz


def make_encode_mb(use_satd: bool, i4x4_enabled: bool, cqm=None):
    """Build the per-MB analyse+encode function (to be vmapped)."""

    def encode_mb(fenc16, fenc_u8, fenc_v8,
                  ytop25, yleft16, utop9, uleft8, vtop9, vleft8,
                  avail_l, avail_t, avail_tl, avail_tr,
                  left_modes, top_modes, qp, qpc, lam):
        case = _avail_case(avail_l.astype(jnp.int32),
                           avail_t.astype(jnp.int32),
                           avail_tl.astype(jnp.int32))

        # ---------- I16x16 analysis (analyse.c:596-638) ----------
        preds16 = I.predict_16x16_all(yleft16[None], ytop25[None, 1:17],
                                      ytop25[None, 0])[0]
        c16 = _mbcmp(preds16, fenc16[None], use_satd).astype(jnp.int32)
        c16 = c16 + lam * _BITS16
        i16_cost, i16_mode = _ordered_pick(c16, _ORDER16[case])

        # ---------- I4x4 analysis + encode ----------
        if i4x4_enabled:
            i4_cost, i4_valid, i4_modes, i4_recon, i4_levels, i4_nnz = \
                _analyse_encode_i4(fenc16, ytop25, yleft16, qp, lam,
                                   i16_cost, cqm, avail_l, avail_t, avail_tl,
                                   avail_tr, left_modes, top_modes, use_satd)
            i4_cost = jnp.where(i4_valid, i4_cost, COST_MAX)
        else:
            i4_cost = COST_MAX
            i4_modes = jnp.full((16,), 2, jnp.int32)
            i4_recon = jnp.zeros((16, 16), jnp.int32)
            i4_levels = jnp.zeros((16, 16), jnp.int32)
            i4_nnz = jnp.zeros((16,), jnp.int32)

        # decision: COPY2_IF_LT — I_4x4 wins only on strictly lower cost
        is_i4 = i4_cost < i16_cost

        # ---------- I16x16 encode ----------
        e16 = _encode_i16(fenc16, preds16[i16_mode], qp, cqm)

        recon_y = jnp.where(is_i4, i4_recon, e16["recon"])
        luma_levels = jnp.where(is_i4, i4_levels, e16["levels"])
        luma_nnz = jnp.where(is_i4, i4_nnz, e16["nnz"])
        luma_dc_levels = jnp.where(is_i4, 0, e16["dc_levels"])
        nz_luma_dc = jnp.where(is_i4, 0, e16["nz_dc"])
        cbp_luma_i4 = (
            (jnp.any(i4_nnz[0:4] != 0)).astype(jnp.int32)
            | ((jnp.any(i4_nnz[4:8] != 0)).astype(jnp.int32) << 1)
            | ((jnp.any(i4_nnz[8:12] != 0)).astype(jnp.int32) << 2)
            | ((jnp.any(i4_nnz[12:16] != 0)).astype(jnp.int32) << 3))
        cbp_luma = jnp.where(is_i4, cbp_luma_i4, e16["cbp_luma"])

        # ---------- chroma analysis (analyse.c:509-560) ----------
        predsU = I.predict_8x8c_all(uleft8[None], utop9[None, 1:9],
                                    utop9[None, 0])[0]
        predsV = I.predict_8x8c_all(vleft8[None], vtop9[None, 1:9],
                                    vtop9[None, 0])[0]
        cc = (_mbcmp(predsU, fenc_u8[None], use_satd)
              + _mbcmp(predsV, fenc_v8[None], use_satd)).astype(jnp.int32)
        cc = cc + lam * _BITSC
        _, chroma_mode = _ordered_pick(cc, _ORDERC[case])

        # ---------- chroma encode ----------
        eu = _encode_chroma_channel(fenc_u8, predsU[chroma_mode], qpc,
                                    True, cqm)
        ev = _encode_chroma_channel(fenc_v8, predsV[chroma_mode], qpc,
                                    True, cqm)
        any_ac = eu["has_ac"] | ev["has_ac"]
        any_dc = (eu["nz_dc"] | ev["nz_dc"]) != 0
        cbp_chroma = jnp.where(any_ac, 2, jnp.where(any_dc, 1, 0))

        return dict(
            mb_type=is_i4.astype(jnp.int32),       # 0 = I16x16, 1 = I4x4
            i16_mode=i16_mode, i4_modes=i4_modes, chroma_mode=chroma_mode,
            cbp_luma=cbp_luma, cbp_chroma=cbp_chroma,
            recon_y=recon_y,
            recon_u=eu["recon"], recon_v=ev["recon"],
            luma_levels=luma_levels, luma_nnz=luma_nnz,
            luma_dc_levels=luma_dc_levels, nz_luma_dc=nz_luma_dc,
            chroma_dc_levels=jnp.stack([eu["dc_levels"], ev["dc_levels"]]),
            chroma_ac_levels=jnp.stack([eu["ac_levels"], ev["ac_levels"]]),
            chroma_nnz_ac=jnp.stack([eu["nnz_ac"], ev["nnz_ac"]]),
            chroma_nz_dc=jnp.stack([eu["nz_dc"], ev["nz_dc"]]),
        )

    return encode_mb


def _diag_schedule(mb_w: int, mb_h: int):
    """Static 2:1 wavefront schedule: diagonals of constant x + 2y."""
    n_diag = (mb_w - 1) + 2 * (mb_h - 1) + 1
    rows = []
    dmax = 0
    for d in range(n_diag):
        mbs = [(y, d - 2 * y) for y in range(mb_h) if 0 <= d - 2 * y < mb_w]
        rows.append(mbs)
        dmax = max(dmax, len(mbs))
    ys = np.full((n_diag, dmax), -1, np.int32)
    xs = np.full((n_diag, dmax), -1, np.int32)
    for d, mbs in enumerate(rows):
        for k, (y, x) in enumerate(mbs):
            ys[d, k] = y
            xs[d, k] = x
    return n_diag, dmax, jnp.asarray(ys), jnp.asarray(xs)


# column indices of left-MB blocks (bx=3) and row indices of top-MB
# bottom blocks (by=3), in coding order
_LEFT_COL_IDX = np.array([_IDX_OF[(3, by)] for by in range(4)])
_TOP_ROW_IDX = np.array([_IDX_OF[(bx, 3)] for bx in range(4)])

PAD = 8


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "use_satd",
                                             "i4x4_enabled", "cqm"))
def encode_i_frame(fenc_y, fenc_u, fenc_v, qp, qpc, lam,
                   mb_w: int, mb_h: int, use_satd: bool, i4x4_enabled: bool,
                   cqm=None):
    """Encode one I-frame (single stream). fenc_* are mod16-padded planes
    (uint8/int32); qp/qpc/lam: scalars or per-MB (mb_h, mb_w) grids (AQ).
    Returns the full per-MB syntax tensor dict + recon planes
    (unfiltered, for intra; deblocking is a separate pass)."""
    H, W = mb_h * 16, mb_w * 16
    qp_mb = jnp.broadcast_to(jnp.asarray(qp), (mb_h, mb_w))
    qpc_mb = jnp.broadcast_to(jnp.asarray(qpc), (mb_h, mb_w))
    lam_mb = jnp.broadcast_to(jnp.asarray(lam), (mb_h, mb_w))
    fy = fenc_y.astype(jnp.int32)
    fu = fenc_u.astype(jnp.int32)
    fv = fenc_v.astype(jnp.int32)
    ry = jnp.zeros((H + 2 * PAD, W + 2 * PAD), jnp.int32)
    ru = jnp.zeros((H // 2 + 2 * PAD, W // 2 + 2 * PAD), jnp.int32)
    rv = jnp.zeros((H // 2 + 2 * PAD, W // 2 + 2 * PAD), jnp.int32)

    n_diag, dmax, diag_ys, diag_xs = _diag_schedule(mb_w, mb_h)
    encode_mb = make_encode_mb(use_satd, i4x4_enabled, cqm)
    vmb = jax.vmap(encode_mb)

    out = dict(
        mb_type=jnp.zeros((mb_h, mb_w), jnp.int32),
        i16_mode=jnp.zeros((mb_h, mb_w), jnp.int32),
        i4_modes=jnp.zeros((mb_h, mb_w, 16), jnp.int32),
        chroma_mode=jnp.zeros((mb_h, mb_w), jnp.int32),
        cbp_luma=jnp.zeros((mb_h, mb_w), jnp.int32),
        cbp_chroma=jnp.zeros((mb_h, mb_w), jnp.int32),
        luma_levels=jnp.zeros((mb_h, mb_w, 16, 16), jnp.int32),
        luma_nnz=jnp.zeros((mb_h, mb_w, 16), jnp.int32),
        luma_dc_levels=jnp.zeros((mb_h, mb_w, 16), jnp.int32),
        nz_luma_dc=jnp.zeros((mb_h, mb_w), jnp.int32),
        chroma_dc_levels=jnp.zeros((mb_h, mb_w, 2, 4), jnp.int32),
        chroma_ac_levels=jnp.zeros((mb_h, mb_w, 2, 4, 16), jnp.int32),
        chroma_nnz_ac=jnp.zeros((mb_h, mb_w, 2, 4), jnp.int32),
        chroma_nz_dc=jnp.zeros((mb_h, mb_w, 2), jnp.int32),
    )

    def slot_gather(plane, ys, xs, y_off, x_off, h, w):
        def one(y, x):
            return jax.lax.dynamic_slice(plane, (y + y_off, x + x_off), (h, w))
        return jax.vmap(one)(ys, xs)

    def step(d, state):
        ry, ru, rv, out = state
        ys = diag_ys[d]
        xs = diag_xs[d]
        valid = ys >= 0
        yc = jnp.maximum(ys, 0)
        xc = jnp.maximum(xs, 0)

        fenc16 = slot_gather(fy, yc * 16, xc * 16, 0, 0, 16, 16)
        fencu = slot_gather(fu, yc * 8, xc * 8, 0, 0, 8, 8)
        fencv = slot_gather(fv, yc * 8, xc * 8, 0, 0, 8, 8)
        ytop25 = slot_gather(ry, yc * 16, xc * 16, PAD - 1, PAD - 1, 1, 25)[:, 0]
        yleft16 = slot_gather(ry, yc * 16, xc * 16, PAD, PAD - 1, 16, 1)[:, :, 0]
        utop9 = slot_gather(ru, yc * 8, xc * 8, PAD - 1, PAD - 1, 1, 9)[:, 0]
        uleft8 = slot_gather(ru, yc * 8, xc * 8, PAD, PAD - 1, 8, 1)[:, :, 0]
        vtop9 = slot_gather(rv, yc * 8, xc * 8, PAD - 1, PAD - 1, 1, 9)[:, 0]
        vleft8 = slot_gather(rv, yc * 8, xc * 8, PAD, PAD - 1, 8, 1)[:, :, 0]

        avail_l = xs > 0
        avail_t = ys > 0
        avail_tl = avail_l & avail_t
        avail_tr = avail_t & (xs < mb_w - 1)

        # neighbor i4 modes for MPM: stored modes if neighbor is I4x4 else DC
        def eff_modes(y, x, idxs, avail):
            mb_modes = out["i4_modes"][y, x][idxs]
            is_i4 = out["mb_type"][y, x] == 1
            mm = jnp.where(is_i4, mb_modes, jnp.full((4,), 2, jnp.int32))
            return jnp.where(avail, mm, jnp.full((4,), -1, jnp.int32))

        left_modes = jax.vmap(
            lambda y, x, a: eff_modes(y, jnp.maximum(x - 1, 0),
                                      _LEFT_COL_IDX, a))(yc, xc, avail_l)
        top_modes = jax.vmap(
            lambda y, x, a: eff_modes(jnp.maximum(y - 1, 0), x,
                                      _TOP_ROW_IDX, a))(yc, xc, avail_t)

        res = vmb(fenc16, fencu, fencv, ytop25, yleft16, utop9, uleft8,
                  vtop9, vleft8, avail_l, avail_t, avail_tl, avail_tr,
                  left_modes, top_modes, qp_mb[yc, xc], qpc_mb[yc, xc],
                  lam_mb[yc, xc])

        # ---------- scatter ----------
        # invalid slots are dropped via out-of-bounds indices + mode="drop"
        oob = jnp.int32(1 << 20)
        sy = jnp.where(valid, yc, oob)
        sx = jnp.where(valid, xc, oob)

        def scat_plane(plane, mbsize, vals):
            r = (sy[:, None, None] * mbsize + PAD
                 + jnp.arange(mbsize)[None, :, None])
            c = (sx[:, None, None] * mbsize + PAD
                 + jnp.arange(mbsize)[None, None, :])
            return plane.at[r, c].set(vals, mode="drop")

        ry2 = scat_plane(ry, 16, res["recon_y"])
        ru2 = scat_plane(ru, 8, res["recon_u"])
        rv2 = scat_plane(rv, 8, res["recon_v"])

        out2 = {k: v.at[sy, sx].set(res[k], mode="drop")
                for k, v in out.items()}
        return ry2, ru2, rv2, out2

    ry, ru, rv, out = jax.lax.fori_loop(0, n_diag, step, (ry, ru, rv, out),
                                        unroll=2)
    out["recon_y"] = ry[PAD:PAD + H, PAD:PAD + W]
    out["recon_u"] = ru[PAD:PAD + H // 2, PAD:PAD + W // 2]
    out["recon_v"] = rv[PAD:PAD + H // 2, PAD:PAD + W // 2]
    return out


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "use_satd",
                                             "i4x4_enabled", "cqm"))
def encode_i_frame_skew(fenc_y, fenc_u, fenc_v, qp, qpc, lam,
                        mb_w: int, mb_h: int, use_satd: bool,
                        i4x4_enabled: bool, cqm=None):
    """encode_i_frame with SKEWED plane storage (bit-identical output).

    MB (y, x) lives in skew column d = x + 2y (ops/pallas/deblock_skew
    layout: [diag, intra-tile col j, lane 4 + tile*y + r]), so every
    neighbor pixel of diagonal d sits in columns d-1..d-3 at STATIC
    lane offsets: each wavefront step is one dynamic_slice of a 3-column
    strip + static strided slices, replacing the ~10 per-slot vmapped
    gathers and 3 full-plane scatters of the gather-based path (the
    deblock skew kernel's trick applied to intra). Unavailable
    neighbors read the never-written zero lanes — the same zeros the
    padded-plane gathers produced, so outputs match exactly."""
    from ..ops.pallas.deblock_skew import deskew_plane, skew_plane

    def rup(n, m=128):
        return (n + m - 1) // m * m

    qp_mb = jnp.broadcast_to(jnp.asarray(qp), (mb_h, mb_w))
    qpc_mb = jnp.broadcast_to(jnp.asarray(qpc), (mb_h, mb_w))
    lam_mb = jnp.broadcast_to(jnp.asarray(lam), (mb_h, mb_w))
    n_diag = mb_w + 2 * mb_h - 2
    Ly = rup(16 * mb_h + 8)
    Lc = rup(8 * mb_h + 8)

    fy_sk = skew_plane(fenc_y.astype(jnp.int32)[None], mb_w, mb_h, 16)[0]
    fu_sk = skew_plane(fenc_u.astype(jnp.int32)[None], mb_w, mb_h, 8)[0]
    fv_sk = skew_plane(fenc_v.astype(jnp.int32)[None], mb_w, mb_h, 8)[0]

    # mutable skewed recon, 3 zero front columns so the d-3..d-1
    # neighbor strip needs no clamping (column c = d + 3)
    sy = jnp.zeros((n_diag + 3, 16, Ly), jnp.int32)
    su = jnp.zeros((n_diag + 3, 8, Lc), jnp.int32)
    sv = jnp.zeros((n_diag + 3, 8, Lc), jnp.int32)

    encode_mb = make_encode_mb(use_satd, i4x4_enabled, cqm)
    vmb = jax.vmap(encode_mb)

    out = dict(
        mb_type=jnp.zeros((mb_h, mb_w), jnp.int32),
        i16_mode=jnp.zeros((mb_h, mb_w), jnp.int32),
        i4_modes=jnp.zeros((mb_h, mb_w, 16), jnp.int32),
        chroma_mode=jnp.zeros((mb_h, mb_w), jnp.int32),
        cbp_luma=jnp.zeros((mb_h, mb_w), jnp.int32),
        cbp_chroma=jnp.zeros((mb_h, mb_w), jnp.int32),
        luma_levels=jnp.zeros((mb_h, mb_w, 16, 16), jnp.int32),
        luma_nnz=jnp.zeros((mb_h, mb_w, 16), jnp.int32),
        luma_dc_levels=jnp.zeros((mb_h, mb_w, 16), jnp.int32),
        nz_luma_dc=jnp.zeros((mb_h, mb_w), jnp.int32),
        chroma_dc_levels=jnp.zeros((mb_h, mb_w, 2, 4), jnp.int32),
        chroma_ac_levels=jnp.zeros((mb_h, mb_w, 2, 4, 16), jnp.int32),
        chroma_nnz_ac=jnp.zeros((mb_h, mb_w, 2, 4), jnp.int32),
        chroma_nz_dc=jnp.zeros((mb_h, mb_w, 2), jnp.int32),
    )

    ys = jnp.arange(mb_h, dtype=jnp.int32)

    def tiles_of(strip, t):
        """(t, 4 + t*mb_h + pad) lanes → (mb_h, t_r, t_j) slot tiles."""
        return strip[:, 4:4 + t * mb_h].reshape(t, mb_h, t).transpose(1, 2, 0)

    def step(d, state):
        sy, su, sv, out = state
        nby = jax.lax.dynamic_slice(sy, (d, 0, 0), (3, 16, Ly))
        nbu = jax.lax.dynamic_slice(su, (d, 0, 0), (3, 8, Lc))
        nbv = jax.lax.dynamic_slice(sv, (d, 0, 0), (3, 8, Lc))
        fY = jax.lax.dynamic_slice(fy_sk, (d, 0, 0), (1, 16, Ly))[0]
        fU = jax.lax.dynamic_slice(fu_sk, (d, 0, 0), (1, 8, Lc))[0]
        fV = jax.lax.dynamic_slice(fv_sk, (d, 0, 0), (1, 8, Lc))[0]

        xs = d - 2 * ys
        valid = (xs >= 0) & (xs < mb_w)
        xc = jnp.clip(xs, 0, mb_w - 1)

        fenc16 = tiles_of(fY, 16)
        fencu = tiles_of(fU, 8)
        fencv = tiles_of(fV, 8)

        # neighbor pixels: lane 4+16y-1 of the row ABOVE each slot is
        # the static strided slice [3 : 3+16*mb_h : 16]
        rowy = nby[:, :, 3:3 + 16 * mb_h:16]          # (3, 16j, mb_h)
        tl = rowy[0, 15]                               # (mb_h,)
        top = rowy[1].T                                # (mb_h, 16)
        tr = rowy[2, 0:8].T                            # (mb_h, 8)
        ytop25 = jnp.concatenate([tl[:, None], top, tr], axis=1)
        yleft16 = nby[2, 15, 4:4 + 16 * mb_h].reshape(mb_h, 16)

        rowu = nbu[:, :, 3:3 + 8 * mb_h:8]
        utop9 = jnp.concatenate([rowu[0, 7][:, None], rowu[1].T], axis=1)
        uleft8 = nbu[2, 7, 4:4 + 8 * mb_h].reshape(mb_h, 8)
        rowv = nbv[:, :, 3:3 + 8 * mb_h:8]
        vtop9 = jnp.concatenate([rowv[0, 7][:, None], rowv[1].T], axis=1)
        vleft8 = nbv[2, 7, 4:4 + 8 * mb_h].reshape(mb_h, 8)

        avail_l = xs > 0
        avail_t = ys > 0
        avail_tl = avail_l & avail_t
        avail_tr = avail_t & (xs < mb_w - 1)

        def eff_modes(y, x, idxs, avail):
            mb_modes = out["i4_modes"][y, x][idxs]
            is_i4 = out["mb_type"][y, x] == 1
            mm = jnp.where(is_i4, mb_modes, jnp.full((4,), 2, jnp.int32))
            return jnp.where(avail, mm, jnp.full((4,), -1, jnp.int32))

        left_modes = jax.vmap(
            lambda y, x, a: eff_modes(y, jnp.maximum(x - 1, 0),
                                      _LEFT_COL_IDX, a))(ys, xc, avail_l)
        top_modes = jax.vmap(
            lambda y, x, a: eff_modes(jnp.maximum(y - 1, 0), x,
                                      _TOP_ROW_IDX, a))(ys, xc, avail_t)

        res = vmb(fenc16, fencu, fencv, ytop25, yleft16, utop9, uleft8,
                  vtop9, vleft8, avail_l, avail_t, avail_tl, avail_tr,
                  left_modes, top_modes, qp_mb[ys, xc], qpc_mb[ys, xc],
                  lam_mb[ys, xc])

        # ---------- write back ----------
        def col_of(recon, t, L):
            # (mb_h, t_r, t_j) → (t_j, lanes), invalid slots stay zero
            # (their lanes map to nonexistent MBs, never read)
            v = jnp.where(valid[:, None, None], recon, 0)
            strip = v.transpose(2, 0, 1).reshape(t, mb_h * t)
            return jnp.pad(strip, ((0, 0), (4, L - 4 - t * mb_h)))[None]

        sy = jax.lax.dynamic_update_slice(
            sy, col_of(res["recon_y"], 16, Ly), (d + 3, 0, 0))
        su = jax.lax.dynamic_update_slice(
            su, col_of(res["recon_u"], 8, Lc), (d + 3, 0, 0))
        sv = jax.lax.dynamic_update_slice(
            sv, col_of(res["recon_v"], 8, Lc), (d + 3, 0, 0))

        oob = jnp.int32(1 << 20)
        sy_i = jnp.where(valid, ys, oob)
        sx_i = jnp.where(valid, xc, oob)
        out2 = {k: v.at[sy_i, sx_i].set(res[k], mode="drop")
                for k, v in out.items()}
        return sy, su, sv, out2

    sy, su, sv, out = jax.lax.fori_loop(0, n_diag, step, (sy, su, sv, out),
                                        unroll=2)
    out["recon_y"] = deskew_plane(sy[3:][None], mb_w, mb_h, 16)[0]
    out["recon_u"] = deskew_plane(su[3:][None], mb_w, mb_h, 8)[0]
    out["recon_v"] = deskew_plane(sv[3:][None], mb_w, mb_h, 8)[0]
    return out


def encode_i_frame_best(*args, **kwargs):
    """Backend dispatch: the skewed-layout wavefront on TPU (strided
    slices instead of per-diagonal gathers — bit-identical output,
    tests/test_intra_skew.py), the gather path elsewhere."""
    if jax.default_backend() == "tpu":
        return encode_i_frame_skew(*args, **kwargs)
    return encode_i_frame(*args, **kwargs)


# I-slice syntax wire layout (the CABAC/CAVLC I writers' input set,
# entropy/native.py write_slice_i / write_slice_cabac is_p=0)
SYN_I_LAYOUT = (
    ("mb_type", ()),
    ("i16_mode", ()),
    ("i4_modes", (16,)),
    ("chroma_mode", ()),
    ("cbp_luma", ()),
    ("cbp_chroma", ()),
    ("luma_levels", (16, 16)),
    ("luma_nnz", (16,)),
    ("luma_dc_levels", (16,)),
    ("nz_luma_dc", ()),
    ("chroma_dc_levels", (2, 4)),
    ("chroma_ac_levels", (2, 4, 16)),
    ("chroma_nnz_ac", (2, 4)),
    ("chroma_nz_dc", (2,)),
)


def pack_syn_i8(out: dict, mb_w: int, mb_h: int):
    """int8 wire pack of the I-slice syntax (element [0] = has-big flag:
    any field outside int8 → caller falls back to int16 pulls)."""
    parts = [out[k].reshape(-1) for k, _ in SYN_I_LAYOUT]
    flat = jnp.concatenate(parts)
    has_big = jnp.any((flat > 127) | (flat < -128)).astype(jnp.int8)
    return jnp.concatenate([has_big[None],
                            jnp.clip(flat, -128, 127).astype(jnp.int8)])


def unpack_syn_i8(buf8: np.ndarray, mb_w: int, mb_h: int):
    """Host-side views for pack_syn_i8 (None when has-big is set)."""
    if buf8[0]:
        return None
    B = mb_w * mb_h
    syn = {}
    off = 1
    for k, shape in SYN_I_LAYOUT:
        n = B * int(np.prod(shape)) if shape else B
        syn[k] = buf8[off:off + n].astype(np.int16) \
            .reshape((mb_h, mb_w) + shape)
        off += n
    return syn
