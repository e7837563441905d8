"""In-loop deblocking — TPU replacement for deblock-a.sa + common/deblock.c.

Semantics follow common/deblock.c exactly: alpha/beta/tc0 spec tables
(:26-78), normal and intra edge filters (:80-295), per-MB strength rules
(deblock_strength_c :297-323 + the intra bs=3/bs=4 rules in
x264_frame_deblock_row :341-430 and x264_macroblock_deblock_strength,
common/macroblock.c:677-691).

Structure: MB raster order is required by the spec (filtered pixels of the
left/top/topright MBs feed later edges), which admits the same 2:1-slope
wavefront as intra prediction (x + 2y diagonals). One lax.fori_loop over
diagonals; each step gathers a 20x20 luma (12x12 chroma) region per MB on
the diagonal, applies the 4+4 luma and 2+2 chroma edges in order
(vectorized across edge rows and across the diagonal), and scatters back.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from ._lazyconst import LazyConst

# spec tables (common/deblock.c:26-78), index 0..51
ALPHA_TABLE = np.zeros(52, np.int32)
ALPHA_TABLE[16:52] = [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25,
                      28, 32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113,
                      127, 144, 162, 182, 203, 226, 255, 255]
BETA_TABLE = np.zeros(52, np.int32)
BETA_TABLE[16:52] = [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9,
                     10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
                     17, 17, 18, 18]
TC0_TABLE = np.zeros((52, 4), np.int32)
TC0_TABLE[:, 0] = -1
_tc0 = [
    (17, [0, 0, 1]), (18, [0, 0, 1]), (19, [0, 0, 1]), (20, [0, 0, 1]),
    (21, [0, 1, 1]), (22, [0, 1, 1]), (23, [1, 1, 1]), (24, [1, 1, 1]),
    (25, [1, 1, 1]), (26, [1, 1, 1]), (27, [1, 1, 2]), (28, [1, 1, 2]),
    (29, [1, 1, 2]), (30, [1, 1, 2]), (31, [1, 2, 3]), (32, [1, 2, 3]),
    (33, [2, 2, 3]), (34, [2, 2, 4]), (35, [2, 3, 4]), (36, [2, 3, 4]),
    (37, [3, 3, 5]), (38, [3, 4, 6]), (39, [3, 4, 6]), (40, [4, 5, 7]),
    (41, [4, 5, 8]), (42, [4, 6, 9]), (43, [5, 7, 10]), (44, [6, 8, 11]),
    (45, [6, 8, 13]), (46, [7, 10, 14]), (47, [8, 11, 16]),
    (48, [9, 12, 18]), (49, [10, 13, 20]), (50, [11, 15, 23]),
    (51, [13, 17, 25]),
]
for _qp, _v in _tc0:
    TC0_TABLE[_qp, 1:] = _v

_ALPHA_J = LazyConst(ALPHA_TABLE)
_BETA_J = LazyConst(BETA_TABLE)
_TC0_J = LazyConst(TC0_TABLE)


def _clamp_idx(i):
    return jnp.clip(i, 0, 51)


def compute_strengths(nnz4, mv4, ref4, intra_mb):
    """Vectorized deblock strength (deblock_strength_c, common/deblock.c:297
    + intra rules). Inputs are frame-level 4x4-block grids:
      nnz4: (4*mb_h, 4*mb_w) nonzero flags
      mv4:  (4*mb_h, 4*mb_w, 2) qpel MVs
      ref4: (4*mb_h, 4*mb_w) ref idx (-1 for intra MBs)
      intra_mb: (mb_h, mb_w) bool
    Returns bs: (mb_h, mb_w, 2, 4, 4) — [dir][edge][i]; dir 0 = vertical
    edges. Internal edges of intra MBs get bs=3 (edge 0 is resolved to the
    bs=4 intra filter inside the wavefront using the intra flags)."""
    h4, w4 = nnz4.shape
    mb_h, mb_w = h4 // 4, w4 // 4

    def one_dir(shift_y, shift_x):
        n_cur = nnz4
        n_nb = jnp.roll(nnz4, (shift_y, shift_x), axis=(0, 1))
        r_cur = ref4
        r_nb = jnp.roll(ref4, (shift_y, shift_x), axis=(0, 1))
        m_cur = mv4
        m_nb = jnp.roll(mv4, (shift_y, shift_x), axis=(0, 1))
        bs2 = (n_cur | n_nb) != 0
        mvd = jnp.abs(m_cur - m_nb)
        bs1 = (r_cur != r_nb) | jnp.any(mvd >= 4, axis=-1)
        return jnp.where(bs2, 2, jnp.where(bs1, 1, 0)).astype(jnp.int32)

    bs_v = one_dir(0, 1)   # vertical edges: neighbor = left block
    bs_h = one_dir(1, 0)   # horizontal edges: neighbor = top block
    # reshape to (mb_h, 4, mb_w, 4) → [mb][edge=block x][i=block y]
    bs_v = bs_v.reshape(mb_h, 4, mb_w, 4).transpose(0, 2, 3, 1)
    # bs_v[mby][mbx][bx][by] → want [edge=bx][i=by]
    bs_h = bs_h.reshape(mb_h, 4, mb_w, 4).transpose(0, 2, 1, 3)
    # bs_h[mby][mbx][by][bx] → [edge=by][i=bx]
    bs = jnp.stack([bs_v, bs_h], axis=2)  # (mb_h, mb_w, 2, 4, 4)
    bs = jnp.where(intra_mb[:, :, None, None, None], 3, bs)
    return bs


def _filter_normal_luma(p3, p2, p1, p0, q0, q1, q2, q3, alpha, beta, tc0):
    """deblock_edge_luma_c (common/deblock.c:80-121), vectorized. All args
    broadcastable; tc0 >= 0 lanes active (tc0 < 0 → no filtering)."""
    filt = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta) & (tc0 >= 0) & (tc0 > 0))
    # note: reference applies p1/q1 deltas only when tc0 != 0, and the
    # p0/q0 delta uses tc = tc0 + ap + aq; with tc0 == 0, tc can be > 0
    filt_any = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
                & (jnp.abs(q1 - q0) < beta) & (tc0 >= 0))
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    pq1 = (p0 + q0 + 1) >> 1
    p1n = p1 + jnp.clip(((p2 + pq1) >> 1) - p1, -tc0, tc0)
    q1n = q1 + jnp.clip(((q2 + pq1) >> 1) - q1, -tc0, tc0)
    p1o = jnp.where(filt_any & ap & (tc0 > 0), p1n, p1)
    q1o = jnp.where(filt_any & aq & (tc0 > 0), q1n, q1)
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0o = jnp.where(filt_any, jnp.clip(p0 + delta, 0, 255), p0)
    q0o = jnp.where(filt_any, jnp.clip(q0 - delta, 0, 255), q0)
    return p1o, p0o, q0o, q1o


def _filter_intra_luma(p3, p2, p1, p0, q0, q1, q2, q3, alpha, beta):
    """deblock_edge_luma_intra_c (common/deblock.c:196-246), vectorized."""
    filt = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta))
    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    # strong 4/5-tap
    p0s = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
    p1s = (p2 + p1 + p0 + q0 + 2) >> 2
    p2s = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
    q0s = (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3
    q1s = (p0 + q0 + q1 + q2 + 2) >> 2
    q2s = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
    # weak 3-tap
    p0w = (2 * p1 + p0 + q1 + 2) >> 2
    q0w = (2 * q1 + q0 + p1 + 2) >> 2

    p0o = jnp.where(filt, jnp.where(strong, jnp.where(ap, p0s, p0w), p0w), p0)
    p1o = jnp.where(filt & strong & ap, p1s, p1)
    p2o = jnp.where(filt & strong & ap, p2s, p2)
    q0o = jnp.where(filt, jnp.where(strong, jnp.where(aq, q0s, q0w), q0w), q0)
    q1o = jnp.where(filt & strong & aq, q1s, q1)
    q2o = jnp.where(filt & strong & aq, q2s, q2)
    return p2o, p1o, p0o, q0o, q1o, q2o


def _filter_normal_chroma(p1, p0, q0, q1, alpha, beta, tc):
    """deblock_edge_chroma_c (common/deblock.c:147-168); tc already +1."""
    filt = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta) & (tc > 0))
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0o = jnp.where(filt, jnp.clip(p0 + delta, 0, 255), p0)
    q0o = jnp.where(filt, jnp.clip(q0 - delta, 0, 255), q0)
    return p0o, q0o


def _filter_intra_chroma(p1, p0, q0, q1, alpha, beta):
    filt = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta))
    p0o = jnp.where(filt, (2 * p1 + p0 + q1 + 2) >> 2, p0)
    q0o = jnp.where(filt, (2 * q1 + q0 + p1 + 2) >> 2, q0)
    return p0o, q0o


def _deblock_mb_luma(region, bs_mb, intra_cur, intra_left, intra_top,
                     has_left, has_top, first_edge_only,
                     alpha_e, beta_e, index_a_e):
    """Deblock one MB's luma. region: (20, 20), MB at [4:20, 4:20].
    bs_mb: (2, 4, 4). alpha_e/beta_e/index_a_e: (2, 4) per-edge params
    (MB edges use neighbour-QP averaging, common/deblock.c:341-430)."""
    rows = jnp.arange(16)
    grp = rows >> 2  # tc0 group per row

    def _edge_out(p3, p2, p1, p0, q0, q1, q2, q3, bs, use_intra, enabled,
                  alpha, beta, index_a):
        """Filter one 8-sample-deep edge; returns the replacement 6-slot
        stack [p2,p1,p0,q0,q1,q2] with enabled/intra selection applied."""
        tc0 = _TC0_J[_clamp_idx(index_a), jnp.clip(bs, 0, 3)][grp]
        p1n, p0n, q0n, q1n = _filter_normal_luma(
            p3, p2, p1, p0, q0, q1, q2, q3, alpha, beta, tc0)
        p2i, p1i, p0i, q0i, q1i, q2i = _filter_intra_luma(
            p3, p2, p1, p0, q0, q1, q2, q3, alpha, beta)
        sel = use_intra
        out = jnp.stack([
            jnp.where(sel, p2i, p2),
            jnp.where(sel, p1i, p1n),
            jnp.where(sel, p0i, p0n),
            jnp.where(sel, q0i, q0n),
            jnp.where(sel, q1i, q1n),
            jnp.where(sel, q2i, q2),
        ])                                    # (6, 16)
        old = jnp.stack([p2, p1, p0, q0, q1, q2])
        return jnp.where(enabled, out, old)

    def v_edge(reg, edge_i, use_intra, enabled):
        c = 4 + edge_i * 4
        blk = reg[4:20, c - 4:c + 4]          # (16, 8) p3..q3 columns
        out = _edge_out(*[blk[:, i] for i in range(8)],
                        bs_mb[0, edge_i], use_intra, enabled,
                        alpha_e[0, edge_i], beta_e[0, edge_i],
                        index_a_e[0, edge_i])
        return reg.at[4:20, c - 3:c + 3].set(out.T)

    def h_edge(reg, edge_i, use_intra, enabled):
        r = 4 + edge_i * 4
        blk = reg[r - 4:r + 4, 4:20]          # (8, 16) p3..q3 rows
        out = _edge_out(*[blk[i] for i in range(8)],
                        bs_mb[1, edge_i], use_intra, enabled,
                        alpha_e[1, edge_i], beta_e[1, edge_i],
                        index_a_e[1, edge_i])
        return reg.at[r - 3:r + 3, 4:20].set(out)

    f = jnp.bool_(False)
    # vertical edges first (x264_frame_deblock_row order, deblock.c:379-398)
    region = v_edge(region, 0, intra_cur | intra_left, has_left)
    internal = ~first_edge_only
    region = v_edge(region, 1, f, internal)
    region = v_edge(region, 2, f, internal)
    region = v_edge(region, 3, f, internal)
    region = h_edge(region, 0, intra_cur | intra_top, has_top)
    region = h_edge(region, 1, f, internal)
    region = h_edge(region, 2, f, internal)
    region = h_edge(region, 3, f, internal)
    return region


def _deblock_mb_chroma(region, bs_mb, intra_cur, intra_left, intra_top,
                       has_left, has_top, first_edge_only,
                       alpha_e, beta_e, index_a_e):
    """region: (12, 12), chroma MB at [4:12, 4:12]; edges at 0 and 4 use
    bs rows 0 and 2; tc0 group per 2 samples; chroma tc = tc0 + 1.
    alpha_e/beta_e/index_a_e: (2, 2) per-edge chroma-QP params."""
    rows = jnp.arange(8)
    grp = rows >> 1  # 4 groups of 2 samples

    def v_edge(reg, edge_c, bs_row, use_intra, enabled, e):
        c = 4 + edge_c
        alpha, beta = alpha_e[0, e], beta_e[0, e]
        p1, p0, q0, q1 = (reg[4:12, c - 2], reg[4:12, c - 1],
                          reg[4:12, c], reg[4:12, c + 1])
        bs = bs_mb[0, bs_row]
        tc = _TC0_J[_clamp_idx(index_a_e[0, e]), jnp.clip(bs, 0, 3)][grp] + 1
        # reference skips groups with tc0 <= 0 (tc0 == -1 → tc == 0)
        p0n, q0n = _filter_normal_chroma(p1, p0, q0, q1, alpha, beta, tc)
        p0i, q0i = _filter_intra_chroma(p1, p0, q0, q1, alpha, beta)
        out = jnp.stack([jnp.where(use_intra, p0i, p0n),
                         jnp.where(use_intra, q0i, q0n)], axis=1)  # (8, 2)
        old = jnp.stack([p0, q0], axis=1)
        return reg.at[4:12, c - 1:c + 1].set(jnp.where(enabled, out, old))

    def h_edge(reg, edge_c, bs_row, use_intra, enabled, e):
        r = 4 + edge_c
        alpha, beta = alpha_e[1, e], beta_e[1, e]
        p1, p0, q0, q1 = (reg[r - 2, 4:12], reg[r - 1, 4:12],
                          reg[r, 4:12], reg[r + 1, 4:12])
        bs = bs_mb[1, bs_row]
        tc = _TC0_J[_clamp_idx(index_a_e[1, e]), jnp.clip(bs, 0, 3)][grp] + 1
        p0n, q0n = _filter_normal_chroma(p1, p0, q0, q1, alpha, beta, tc)
        p0i, q0i = _filter_intra_chroma(p1, p0, q0, q1, alpha, beta)
        out = jnp.stack([jnp.where(use_intra, p0i, p0n),
                         jnp.where(use_intra, q0i, q0n)])           # (2, 8)
        old = jnp.stack([p0, q0])
        return reg.at[r - 1:r + 1, 4:12].set(jnp.where(enabled, out, old))

    f = jnp.bool_(False)
    internal = ~first_edge_only
    region = v_edge(region, 0, 0, intra_cur | intra_left, has_left, 0)
    region = v_edge(region, 4, 2, f, internal, 1)
    region = h_edge(region, 0, 0, intra_cur | intra_top, has_top, 0)
    region = h_edge(region, 4, 2, f, internal, 1)
    return region


def _diag_schedule(mb_w, mb_h):
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
            ys[d, k], xs[d, k] = y, x
    return n_diag, dmax, jnp.asarray(ys), jnp.asarray(xs)


PAD_DB = 8


def _onehot_cols(col0, rsize, n_cols):
    """B[k, j, c] = (c == col0[k]+j), bf16."""
    K = col0.shape[0]
    tgt = col0[:, None, None] + jnp.arange(rsize)[None, :, None]
    c = jax.lax.broadcasted_iota(jnp.int32, (K, rsize, n_cols), 2)
    return (c == tgt).astype(jnp.bfloat16)


def _band_windows(plane, r0, K, mbsize, rsize):
    """One contiguous band slice → K overlapping row windows.

    MBs on one 2:1 wavefront diagonal have CONSECUTIVE y, so window k
    (rows r0 + k*mbsize .. + rsize) is a pure relayout of the band
    starting at r0 — no gather. Returns (band, wins) with wins
    (K, rsize, W)."""
    W = plane.shape[1]
    bandH = K * mbsize + (rsize - mbsize)
    band = jax.lax.dynamic_slice(plane, (r0, 0), (bandH, W))
    core = band[:K * mbsize].reshape(K, mbsize, W)
    halo = rsize - mbsize
    tails = jnp.concatenate([core[1:, :halo], band[None, K * mbsize:]], 0)
    wins = jnp.concatenate([core, tails], axis=1)        # (K, rsize, W)
    return band, wins


def _cols_gather(wins, B):
    """regs[k,i,j] = Σ_w wins[k,i,w]·B[k,j,w] — one-hot column selection
    on the MXU (values ≤ 255 and 0/1 selectors are exact in bf16 with
    f32 accumulation)."""
    regs = jax.lax.dot_general(
        wins.astype(jnp.bfloat16), B, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return regs.astype(jnp.int32)


def _band_scatter_delta(plane, band, regs_new, regs_old, valid, B, r0,
                        K, mbsize, rsize):
    """plane band += per-window deltas placed by B. Regions on a diagonal
    are disjoint (same rows only at disjoint columns), so summing the
    window overlaps is exact; deltas are in [-255, 255] (exact bf16)."""
    W = plane.shape[1]
    halo = rsize - mbsize
    delta = jnp.where(valid[:, None, None], regs_new - regs_old, 0)
    wide = jax.lax.dot_general(
        delta.astype(jnp.bfloat16), B, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (K, rsize, W)
    wide = wide.astype(jnp.int32)
    core_d = wide[:, :mbsize]
    shift = jnp.concatenate(
        [jnp.zeros((1, halo, W), jnp.int32), wide[:-1, mbsize:]], 0)
    core_d = jnp.concatenate([core_d[:, :halo] + shift, core_d[:, halo:]],
                             axis=1)
    band_d = jnp.concatenate([core_d.reshape(K * mbsize, W),
                              wide[-1, mbsize:]], 0)
    return jax.lax.dynamic_update_slice(plane, band + band_d, (r0, 0))


def effective_qp(qp_mb, coded, slice_qp):
    """Decoded per-MB QP for deblocking: MBs that emit no qp_delta (no
    coded residual / skip) inherit the running QP in raster order — the
    decoder's view (x264 stores this via h->mb.qp in cache_save).
    qp_mb: (mb_h, mb_w) encoder-intended QPs; coded: (mb_h, mb_w) bool.
    One associative carry-scan, no wavefront."""
    shape = qp_mb.shape
    vals = qp_mb.reshape(-1)
    m = coded.reshape(-1)

    def op(a, b):
        va, ma = a
        vb, mb = b
        return jnp.where(mb, vb, va), ma | mb

    out, got = jax.lax.associative_scan(op, (vals, m))
    return jnp.where(got, out, slice_qp).reshape(shape)


def _wave_lanes(bs, intra_mb, first_edge_only, qp_mb, qpc_mb,
                alpha_off, beta_off, mb_w: int, mb_h: int):
    """Per-diagonal per-slot filter lanes for ALL wavefront steps at once
    (the step() computation below, vectorized over the diagonal axis) —
    feeds the single-call wavefront kernel (ops/pallas/deblock_wave)."""
    n_diag, dmax, diag_ys, diag_xs = _diag_schedule(mb_w, mb_h)
    ys, xs = diag_ys, diag_xs                      # (n_diag, K)
    valid = ys >= 0
    yc = jnp.maximum(ys, 0)
    xc = jnp.maximum(xs, 0)

    bs_mb = bs[yc, xc]                             # (n_diag, K, 2, 4, 4)
    ic = intra_mb[yc, xc] > 0
    il = intra_mb[yc, jnp.maximum(xc - 1, 0)] > 0
    it = intra_mb[jnp.maximum(yc - 1, 0), xc] > 0
    feo = first_edge_only[yc, xc] > 0
    has_l = (xs > 0) & valid
    has_t = (ys > 0) & valid

    def edge_qps(grid, n_edges):
        cur = grid[yc, xc]
        left = grid[yc, jnp.maximum(xc - 1, 0)]
        top = grid[jnp.maximum(yc - 1, 0), xc]
        qpe = jnp.broadcast_to(cur[..., None, None],
                               cur.shape + (2, n_edges))
        qpe = qpe.at[..., 0, 0].set((cur + left + 1) >> 1)
        qpe = qpe.at[..., 1, 0].set((cur + top + 1) >> 1)
        return qpe

    qpe_l = edge_qps(qp_mb, 4)
    qpe_c = edge_qps(qpc_mb, 2)
    ia_l = jnp.clip(qpe_l + alpha_off, 0, 51)
    ib_l = jnp.clip(qpe_l + beta_off, 0, 51)
    ia_c = jnp.clip(qpe_c + alpha_off, 0, 51)
    ib_c = jnp.clip(qpe_c + beta_off, 0, 51)

    D, K = ys.shape
    internal = ((~feo) & valid).astype(jnp.int32)
    f0 = jnp.zeros((D, K), jnp.int32)
    tc0y = _TC0_J[ia_l[..., None], jnp.clip(bs_mb, 0, 3)]
    tc0y = tc0y[..., jnp.arange(16) >> 2].reshape(D, K, 128)
    bsc = bs_mb[:, :, :, ::2]                      # bs edge rows 0, 2
    tcc = _TC0_J[ia_c[..., None], jnp.clip(bsc, 0, 3)] + 1
    tcc = tcc[..., jnp.arange(8) >> 1].reshape(D, K, 32)
    tcc = jnp.repeat(tcc, 2, axis=1)               # interleave (u, v)
    eny = jnp.stack([has_l.astype(jnp.int32), internal, internal,
                     internal, has_t.astype(jnp.int32), internal,
                     internal, internal], axis=-1)
    uiy = jnp.stack([(ic | il).astype(jnp.int32), f0, f0, f0,
                     (ic | it).astype(jnp.int32), f0, f0, f0], axis=-1)
    enc = jnp.repeat(jnp.stack(
        [has_l.astype(jnp.int32), internal,
         has_t.astype(jnp.int32), internal], axis=-1), 2, axis=1)
    uic = jnp.repeat(jnp.stack(
        [(ic | il).astype(jnp.int32), f0,
         (ic | it).astype(jnp.int32), f0], axis=-1), 2, axis=1)
    aly = _ALPHA_J[ia_l].reshape(D, K, 8)
    bly = _BETA_J[ib_l].reshape(D, K, 8)
    alc = jnp.repeat(_ALPHA_J[ia_c].reshape(D, K, 4), 2, axis=1)
    blc = jnp.repeat(_BETA_J[ib_c].reshape(D, K, 4), 2, axis=1)
    return (tc0y, eny, uiy, aly, bly), (tcc, enc, uic, alc, blc)


def _skew_grid(v, mb_w: int, mb_h: int):
    """(mb_h, mb_w, C) MB-grid values -> (n_diag, C, mb_h) diagonal
    slots via the stride trick (see pallas/deblock_skew.skew_plane):
    out[d, :, y] = v[y, d - 2y] (zeros where x out of range)."""
    C = v.shape[-1]
    n_diag = mb_w + 2 * mb_h - 2
    W2 = n_diag + 2
    t = jnp.pad(v, ((0, 0), (0, W2 - mb_w), (0, 0)))
    t = t.reshape(mb_h * W2, C)[:mb_h * (W2 - 2)]
    t = t.reshape(mb_h, n_diag, C)
    return jnp.transpose(t, (1, 2, 0))


def _skew_params_packed(bs, intra_mb, first_edge_only, qp_mb, qpc_mb,
                        alpha_off, beta_off, mb_w: int, mb_h: int,
                        L: int, Lc: int):
    """Packed per-lane filter parameter streams for the skewed wavefront
    kernel (ops/pallas/deblock_skew._kernel has the channel map).
    Everything is computed on the (mb_h, mb_w) MB grid with shifts —
    no gathers — then skewed to diagonal slots in one stride-trick
    reshape per plane family and expanded to the kernel lane layout
    (lane = 4 + tile*y + r) with a broadcast. Returns (pla, pca):
    (n_diag, 36, L) luma and (n_diag, 26, Lc) chroma int32 tensors."""
    n_diag = mb_w + 2 * mb_h - 2
    i32 = lambda a: a.astype(jnp.int32)
    ic = intra_mb > 0
    il = jnp.pad(ic, ((0, 0), (1, 0)))[:, :mb_w]
    it = jnp.pad(ic, ((1, 0), (0, 0)))[:mb_h]
    xg = jnp.arange(mb_w)[None, :]
    yg = jnp.arange(mb_h)[:, None]
    has_l = i32(jnp.broadcast_to(xg > 0, (mb_h, mb_w)))
    has_t = i32(jnp.broadcast_to(yg > 0, (mb_h, mb_w)))
    internal = i32(first_edge_only == 0)
    zero = jnp.zeros((mb_h, mb_w), jnp.int32)

    def left(g):
        return jnp.concatenate([g[:, :1], g[:, :-1]], axis=1)

    def top(g):
        return jnp.concatenate([g[:1], g[:-1]], axis=0)

    def ab(qpe):
        ia = jnp.clip(qpe + alpha_off, 0, 51)
        ib = jnp.clip(qpe + beta_off, 0, 51)
        return _ALPHA_J[ia], _BETA_J[ib], ia

    bs3 = jnp.clip(bs, 0, 3)

    def family(qp_g, tc_bias, groups):
        """One plane family. Returns (A, B): A (mb_h, mb_w, 16 + 4*E)
        MB-constant channels [v-edge0 4, v-internal 4, h-edge0 4,
        h-internal 4, h-tc (E, 4 col groups)], B (mb_h, mb_w, E, 4) the
        v tc values per row group. E = 4 luma / 2 chroma edges."""
        a_l0, b_l0, ia_l0 = ab((qp_g + left(qp_g) + 1) >> 1)
        a_t0, b_t0, ia_t0 = ab((qp_g + top(qp_g) + 1) >> 1)
        a_in, b_in, ia_in = ab(qp_g)
        E = len(groups)
        tv = jnp.stack(
            [_TC0_J[(ia_l0 if e == 0 else ia_in)[..., None],
                    bs3[:, :, 0, g]] + tc_bias for e, g in enumerate(groups)],
            axis=2)                                    # (h, w, E, 4)
        th = [_TC0_J[(ia_t0 if e == 0 else ia_in)[..., None],
                     bs3[:, :, 1, g]] + tc_bias for e, g in enumerate(groups)]
        A = jnp.stack(
            [a_l0, b_l0, has_l, i32(ic | il),
             a_in, b_in, internal, zero,
             a_t0, b_t0, has_t, i32(ic | it),
             a_in, b_in, internal, zero]
            + [t[..., gg] for t in th for gg in range(4)], axis=-1)
        return A, tv

    def pack(A, B, tile, Ln):
        """Skew + lane-expand one family into the packed kernel tensor:
        channels [v-params 8, v-tc E, h-params 8, h-tc 4E]."""
        E = B.shape[2]
        sa = _skew_grid(A, mb_w, mb_h)                 # (D, 16+4E, h)
        sb = _skew_grid(B.reshape(mb_h, mb_w, 4 * E), mb_w, mb_h)
        rep = tile // 4
        D = n_diag
        ea = jnp.broadcast_to(sa[..., None],
                              sa.shape + (tile,)).reshape(D, -1, mb_h * tile)
        eb = sb.reshape(D, E, 4, mb_h).transpose(0, 1, 3, 2)
        eb = jnp.broadcast_to(eb[..., None],
                              eb.shape + (rep,)).reshape(D, E, mb_h * tile)
        p = jnp.concatenate([ea[:, :8], eb, ea[:, 8:]], axis=1)
        return jnp.pad(p, ((0, 0), (0, 0), (4, Ln - 4 - tile * mb_h)))

    Al, Bl = family(qp_mb, 0, (0, 1, 2, 3))
    Ac, Bc = family(qpc_mb, 1, (0, 2))
    return pack(Al, Bl, 16, L), pack(Ac, Bc, 8, Lc)


def _stack_lanes(p):
    """(S, D, ..., L) -> (D, ..., S*L): fold the stream axis into lanes
    (stream s occupies lane block [s*L, (s+1)*L)). Safe for the skew
    kernel: L is a multiple of 128 (masks computed from the global lane
    index stay segment-aligned) and every roll is <= +-4 lanes while
    enabled lanes sit >= 4 lanes inside each segment's halo padding."""
    S = p.shape[0]
    m = jnp.moveaxis(p, 0, -2)
    return m.reshape(m.shape[:-2] + (S * p.shape[-1],))


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "interpret",
                                             "intra_mode"))
def deblock_frame_skew_batched(y, u, v, bs, intra_mb, first_edge_only,
                               qp, qpc, alpha_off, beta_off,
                               mb_w: int, mb_h: int,
                               interpret: bool = False,
                               intra_mode: str = "mixed"):
    """Whole-frame deblock via the skewed-layout wavefront kernel
    (ops/pallas/deblock_skew) — ONE Pallas call for luma+chroma, no
    per-slot gathers. Arguments as deblock_frame, each with a leading
    (S, ...) stream axis; qp/qpc scalars or (S, mb_h, mb_w) grids.

    All S streams ride ONE kernel pass: stream s is lane block s of
    every tile (see _stack_lanes), so the ~mb_w+2*mb_h sequential
    wavefront steps are paid once per BATCH, not once per frame."""
    from .pallas.deblock_skew import (deblock_skew_call, deskew_chroma,
                                      deskew_plane, skew_chroma,
                                      skew_plane)
    S = y.shape[0]
    L = ((16 * mb_h + 8 + 127) // 128) * 128
    Lc = ((8 * mb_h + 8 + 127) // 128) * 128
    qp_mb = jnp.broadcast_to(jnp.asarray(qp), (S, mb_h, mb_w))
    qpc_mb = jnp.broadcast_to(jnp.asarray(qpc), (S, mb_h, mb_w))
    pla, pca = jax.vmap(
        lambda b, i, f, q, qc: _skew_params_packed(
            b, i, f, q, qc, alpha_off, beta_off, mb_w, mb_h, L, Lc))(
        bs, intra_mb, first_edge_only, qp_mb, qpc_mb)
    sky = skew_plane(y, mb_w, mb_h, 16)
    skc = skew_chroma(u, v, mb_w, mb_h)                # (S, D, 16, Lc)
    oy, oc = deblock_skew_call(_stack_lanes(sky)[None],
                               _stack_lanes(skc)[None],
                               _stack_lanes(pla)[None],
                               _stack_lanes(pca)[None],
                               mb_w=mb_w, mb_h=mb_h, interpret=interpret,
                               intra_mode=intra_mode)
    D = sky.shape[1]
    oy = jnp.moveaxis(oy.reshape(D, 16, S, L), 2, 0)
    oc = jnp.moveaxis(oc.reshape(D, 16, S, Lc), 2, 0)
    dy = deskew_plane(oy, mb_w, mb_h, 16)
    du, dv = deskew_chroma(oc, mb_w, mb_h)
    return dy, du, dv


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "interpret"))
def deblock_frame_wave_batched(y, u, v, bs, intra_mb, first_edge_only,
                               qp, qpc, alpha_off, beta_off,
                               mb_w: int, mb_h: int,
                               interpret: bool = False):
    """Whole-frame wavefront deblock in ONE Pallas call per plane set
    (ops/pallas/deblock_wave), batched over a leading stream axis.
    Arguments as deblock_frame, each with a leading (S, ...) axis;
    qp/qpc may be scalars or (S, mb_h, mb_w) decoded-QP grids."""
    from .pallas.deblock_wave import deblock_wave_chroma, deblock_wave_luma
    S = y.shape[0]
    qp_mb = jnp.broadcast_to(jnp.asarray(qp), (S, mb_h, mb_w))
    qpc_mb = jnp.broadcast_to(jnp.asarray(qpc), (S, mb_h, mb_w))
    luma_l, chroma_l = jax.vmap(
        lambda b, i, f, q, qc: _wave_lanes(b, i, f, q, qc, alpha_off,
                                           beta_off, mb_w, mb_h))(
        bs, intra_mb, first_edge_only, qp_mb, qpc_mb)
    # X264_DEBLOCK_UNROLL: diagonals per wavefront grid step (bit-exact
    # either way; on-chip A/B knob, and the fallback if Mosaic rejects
    # the larger unrolled body on some toolchain)
    unroll = int(os.environ.get("X264_DEBLOCK_UNROLL", "2"))
    dy = deblock_wave_luma(y.astype(jnp.int32), *luma_l,
                           mb_w=mb_w, mb_h=mb_h, interpret=interpret,
                           unroll=unroll)
    du, dv = deblock_wave_chroma(u.astype(jnp.int32), v.astype(jnp.int32),
                                 *chroma_l, mb_w=mb_w, mb_h=mb_h,
                                 interpret=interpret, unroll=unroll)
    return dy, du, dv


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "use_pallas",
                                             "intra_mode"))
def deblock_frame(y, u, v, bs, intra_mb, first_edge_only, qp, qpc,
                  alpha_off, beta_off, mb_w: int, mb_h: int,
                  use_pallas: bool | None = None,
                  intra_mode: str = "mixed"):
    """Deblock a full frame in place (wavefront). y/u/v: recon planes
    int32; bs: (mb_h, mb_w, 2, 4, 4); intra_mb/first_edge_only:
    (mb_h, mb_w); qp/qpc: scalars or per-MB (mb_h, mb_w) grids of
    *decoded* QPs (see effective_qp) — MB edges use the neighbour
    average (qp+qp_nb+1)>>1 (common/deblock.c:341-430);
    alpha_off/beta_off: slice offsets (already <<1 removed — raw offsets).
    intra_mode: static MB-boundary specialization for the skew kernel
    ('none' = P frame, 'all' = I frame, 'mixed' = select per MB).
    Returns filtered (y, u, v)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas is True and jax.default_backend() == "tpu":
        # skewed-layout wavefront: 12 ms vs 37 ms (wave) at 1080p
        dy, du, dv = deblock_frame_skew_batched.__wrapped__(
            y[None], u[None], v[None], bs[None], intra_mb[None],
            first_edge_only[None], jnp.asarray(qp)[None],
            jnp.asarray(qpc)[None], alpha_off, beta_off,
            mb_w=mb_w, mb_h=mb_h, intra_mode=intra_mode)
        return dy[0], du[0], dv[0]
    if use_pallas == "wave":
        # single-kernel gather wavefront (plane resident in VMEM)
        dy, du, dv = deblock_frame_wave_batched.__wrapped__(
            y[None], u[None], v[None], bs[None], intra_mb[None],
            first_edge_only[None], jnp.asarray(qp)[None],
            jnp.asarray(qpc)[None], alpha_off, beta_off,
            mb_w=mb_w, mb_h=mb_h)
        return dy[0], du[0], dv[0]
    qp_mb = jnp.broadcast_to(jnp.asarray(qp), (mb_h, mb_w))
    qpc_mb = jnp.broadcast_to(jnp.asarray(qpc), (mb_h, mb_w))

    H, W = mb_h * 16, mb_w * 16
    n_diag, dmax, diag_ys, diag_xs = _diag_schedule(mb_w, mb_h)

    if use_pallas:
        # bands of the longest diagonal may run past the frame bottom
        # (invalid slots write zero deltas there) — pad accordingly
        yp = jnp.pad(y.astype(jnp.int32),
                     ((PAD_DB, PAD_DB + dmax * 16 + 16), (PAD_DB, PAD_DB)))
        Hcp = H // 2 + 2 * PAD_DB
        cp = jnp.concatenate([
            jnp.pad(u.astype(jnp.int32), PAD_DB),
            jnp.pad(v.astype(jnp.int32), PAD_DB),
            jnp.zeros((dmax * 8 + 16, W // 2 + 2 * PAD_DB), jnp.int32)])
    else:
        yp = jnp.pad(y.astype(jnp.int32), PAD_DB)
        # u and v share every filter parameter → one stacked (2,...) plane
        cp = jnp.stack([jnp.pad(u.astype(jnp.int32), PAD_DB),
                        jnp.pad(v.astype(jnp.int32), PAD_DB)])

    def gather(plane, ys, xs, mbsize, rsize):
        def one(yy, xx):
            return jax.lax.dynamic_slice(
                plane, (yy * mbsize + PAD_DB - 4, xx * mbsize + PAD_DB - 4),
                (rsize, rsize))
        return jax.vmap(one)(ys, xs)

    def step(d, state):
        yp, cp = state
        ys = diag_ys[d]
        xs = diag_xs[d]
        valid = ys >= 0
        yc = jnp.maximum(ys, 0)
        xc = jnp.maximum(xs, 0)
        K = ys.shape[0]

        if use_pallas:
            # one contiguous band slice per plane + one-hot column
            # selection on the MXU (XLA gather/scatter are per-element
            # on TPU; this is exact for pixel-range values)
            Wp = yp.shape[1]
            Wcp = cp.shape[1]
            y0 = diag_ys[d, 0]                 # first slot always valid
            r0y = y0 * 16 + PAD_DB - 4
            r0c = y0 * 8 + PAD_DB - 4
            bandy, winsy = _band_windows(yp, r0y, K, 16, 20)
            By = _onehot_cols(xc * 16 + PAD_DB - 4, 20, Wp)
            regy = _cols_gather(winsy, By)
            bandu, winsu = _band_windows(cp, r0c, K, 8, 12)
            bandv, winsv = _band_windows(cp, Hcp + r0c, K, 8, 12)
            Bc = _onehot_cols(xc * 8 + PAD_DB - 4, 12, Wcp)
            regs_u = _cols_gather(winsu, Bc)
            regs_v = _cols_gather(winsv, Bc)
            # kernel layout: chroma rows interleaved per MB (u, v)
            regcf = jnp.stack([regs_u, regs_v], 1).reshape(2 * K, 12, 12)
        else:
            regy = gather(yp, yc, xc, 16, 24)[:, :20, :20]

            def gather_c(yy, xx):  # (2,16,16) — both chroma channels
                return jax.lax.dynamic_slice(
                    cp, (0, yy * 8 + PAD_DB - 4, xx * 8 + PAD_DB - 4),
                    (2, 16, 16))
            regc = jax.vmap(gather_c)(yc, xc)[:, :, :12, :12]

        bs_mb = bs[yc, xc]
        ic = intra_mb[yc, xc] > 0
        il = intra_mb[yc, jnp.maximum(xc - 1, 0)] > 0
        it = intra_mb[jnp.maximum(yc - 1, 0), xc] > 0
        feo = first_edge_only[yc, xc] > 0
        has_l = xs > 0
        has_t = ys > 0

        # per-edge QP: MB edges average with the neighbour's decoded QP
        # (x264_frame_deblock_row, common/deblock.c:341-430)
        def edge_qps(grid, n_edges):
            cur = grid[yc, xc]
            left = grid[yc, jnp.maximum(xc - 1, 0)]
            top = grid[jnp.maximum(yc - 1, 0), xc]
            qpe = jnp.broadcast_to(cur[:, None, None], (K, 2, n_edges))
            qpe = qpe.at[:, 0, 0].set((cur + left + 1) >> 1)
            qpe = qpe.at[:, 1, 0].set((cur + top + 1) >> 1)
            return qpe

        qpe_l = edge_qps(qp_mb, 4)                     # (K, 2, 4)
        qpe_c = edge_qps(qpc_mb, 2)                    # (K, 2, 2)
        ia_l = jnp.clip(qpe_l + alpha_off, 0, 51)
        ib_l = jnp.clip(qpe_l + beta_off, 0, 51)
        ia_c = jnp.clip(qpe_c + alpha_off, 0, 51)
        ib_c = jnp.clip(qpe_c + beta_off, 0, 51)
        alpha_e = _ALPHA_J[ia_l]
        beta_e = _BETA_J[ib_l]
        alphac_e = _ALPHA_J[ia_c]
        betac_e = _BETA_J[ib_c]

        if use_pallas:
            from .pallas.deblock_filter import filter_regions
            internal = (~feo).astype(jnp.int32)
            f0 = jnp.zeros((K,), jnp.int32)
            # per-row tc0 lanes: luma 4 groups of 4 rows, chroma 4 of 2
            tc0y = _TC0_J[ia_l[..., None], jnp.clip(bs_mb, 0, 3)]
            tc0y = tc0y[..., jnp.arange(16) >> 2].reshape(K, 128)
            bsc = bs_mb[:, :, ::2]                        # bs rows 0, 2
            tcc = _TC0_J[ia_c[..., None], jnp.clip(bsc, 0, 3)] + 1
            tcc = jnp.repeat(tcc[..., jnp.arange(8) >> 1].reshape(K, 32),
                             2, axis=0)
            eny = jnp.stack([has_l.astype(jnp.int32), internal, internal,
                             internal, has_t.astype(jnp.int32), internal,
                             internal, internal], axis=1)
            uiy = jnp.stack([(ic | il).astype(jnp.int32), f0, f0, f0,
                             (ic | it).astype(jnp.int32), f0, f0, f0],
                            axis=1)
            enc = jnp.repeat(jnp.stack(
                [has_l.astype(jnp.int32), internal,
                 has_t.astype(jnp.int32), internal], axis=1), 2, axis=0)
            uic = jnp.repeat(jnp.stack(
                [(ic | il).astype(jnp.int32), f0,
                 (ic | it).astype(jnp.int32), f0], axis=1), 2, axis=0)
            aly = alpha_e.reshape(K, 8)
            bly = beta_e.reshape(K, 8)
            alc = jnp.repeat(alphac_e.reshape(K, 4), 2, axis=0)
            blc = jnp.repeat(betac_e.reshape(K, 4), 2, axis=0)
            # pad to the kernel's block multiple with zero regions +
            # zero enable masks (no-op slots)
            from .pallas.deblock_filter import KB
            padn = (-K) % KB

            def padk(a, rep=1):
                return jnp.pad(a, ((0, padn * rep),)
                               + ((0, 0),) * (a.ndim - 1))
            regy2, regcf2 = filter_regions(
                padk(regy), padk(regcf, 2), padk(tc0y), padk(tcc, 2),
                padk(eny), padk(uiy), padk(enc, 2), padk(uic, 2),
                padk(aly), padk(bly), padk(alc, 2), padk(blc, 2),
                interpret=jax.default_backend() != "tpu")
            regy2 = regy2[:K]
            rc2 = regcf2[:2 * K].reshape(K, 2, 12, 12)
            yp2 = _band_scatter_delta(yp, bandy, regy2, regy, valid, By,
                                      r0y, K, 16, 20)
            cp2 = _band_scatter_delta(cp, bandu, rc2[:, 0], regs_u,
                                      valid, Bc, r0c, K, 8, 12)
            cp2 = _band_scatter_delta(cp2, bandv, rc2[:, 1], regs_v,
                                      valid, Bc, Hcp + r0c, K, 8, 12)
            return (yp2, cp2)
        else:
            vy = jax.vmap(_deblock_mb_luma)
            regy2 = vy(regy, bs_mb, ic, il, it, has_l, has_t, feo,
                       alpha_e, beta_e, ia_l)
            vc = jax.vmap(jax.vmap(
                _deblock_mb_chroma,
                in_axes=(0,) + (None,) * 10))
            regc2 = vc(regc, bs_mb, ic, il, it, has_l, has_t, feo,
                       alphac_e, betac_e, ia_c)

        oob = jnp.int32(1 << 20)
        sy = jnp.where(valid, yc, oob)
        sx = jnp.where(valid, xc, oob)

        def scatter(plane, reg, mbsize, rsize):
            r = (sy[:, None, None] * mbsize + PAD_DB - 4
                 + jnp.arange(rsize)[None, :, None])
            c = (sx[:, None, None] * mbsize + PAD_DB - 4
                 + jnp.arange(rsize)[None, None, :])
            return plane.at[r, c].set(reg, mode="drop")

        yp2 = scatter(yp, regy2, 16, 20)
        ch = jnp.arange(2)[None, :, None, None]
        rr = (sy[:, None, None, None] * 8 + PAD_DB - 4
              + jnp.arange(12)[None, None, :, None])
        cc = (sx[:, None, None, None] * 8 + PAD_DB - 4
              + jnp.arange(12)[None, None, None, :])
        cp2 = cp.at[ch, rr, cc].set(regc2, mode="drop")
        return (yp2, cp2)

    yp, cp = jax.lax.fori_loop(0, n_diag, step, (yp, cp))
    if use_pallas:
        Hcp = H // 2 + 2 * PAD_DB
        return (yp[PAD_DB:PAD_DB + H, PAD_DB:PAD_DB + W],
                cp[PAD_DB:PAD_DB + H // 2, PAD_DB:PAD_DB + W // 2],
                cp[Hcp + PAD_DB:Hcp + PAD_DB + H // 2,
                   PAD_DB:PAD_DB + W // 2])
    return (yp[PAD_DB:PAD_DB + H, PAD_DB:PAD_DB + W],
            cp[0, PAD_DB:PAD_DB + H // 2, PAD_DB:PAD_DB + W // 2],
            cp[1, PAD_DB:PAD_DB + H // 2, PAD_DB:PAD_DB + W // 2])
