"""Plane-resident residual pipeline (the TPU-fast path for dct-a.sa /
quant-a.sa over a whole frame).

The block-tensor formulation ((B, nblk, 4, 4) tiles) wastes ~31/32 of
every TPU vector tile: a 4x4 int32 block pads to an (8, 128) register.
This module keeps everything in plane layout instead:

- Forward 4x4 DCT of the whole frame is two dense f32 matmuls
  ``A_H @ res @ A_W^T`` where ``A = P @ blockdiag(C)`` fuses the DCT
  butterfly (C, common/dct.c:121) with a row-grouping permutation P that
  sorts rows by (row % 4). The result is a *grouped* plane in which
  coefficient (i, j) of block (a, b) sits at ``[i*H/4 + a, j*W/4 + b]``
  — so the 16 coefficient planes are contiguous static slices, each
  (H/4, W/4) with full-width lanes. Exact: inputs/outputs are integers
  < 2^24, f32 matmul accumulation is exact in that range.
- Quant/dequant/zigzag/decimate are elementwise over the 16 coefficient
  planes (zigzag is a reorder of a Python list — free).
- The inverse transform runs as unrolled butterflies over the 16 planes
  (the mid-transform ``>>1`` floors need integer ops, common/dct.c:197),
  then two 0/1 permutation matmuls assemble the residual plane.

Measured on one v5e chip at 1080p: the full sub_dct->quant->dequant->
idct->recon round trip is ~2 ms vs ~60 ms for the tile formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import transforms as T
from .tables import ZIGZAG_4x4

_C_NP = np.array([[1, 1, 1, 1],
                  [2, 1, -1, -2],
                  [1, -1, -1, 1],
                  [1, -2, 2, -1]], np.float32)


@functools.lru_cache(maxsize=None)
def _mats_np(n: int):
    q = n // 4
    P = np.zeros((n, n), np.float32)
    for i in range(4):
        P[np.arange(q) + i * q, np.arange(q) * 4 + i] = 1
    A = P @ np.kron(np.eye(q, dtype=np.float32), _C_NP)
    return A, P


def _mats(n: int):
    """(A, P) for axis length n: P (n, n) groups rows by row%4
    (out row i*(n/4)+a = in row a*4+i); A = P @ blockdiag(C).
    NumPy is cached; the jnp conversion happens per call site so no
    device array created under a jit trace is ever retained (tracer
    leak)."""
    A, P = _mats_np(n)
    return jnp.asarray(A), jnp.asarray(P)


def _hilo_lmul(lhs_bf16, x_int):
    """Exact lhs @ x for integer-valued x in [-2^15, 2^15) against a
    bf16-exact lhs: split x into (hi << 8) + lo bytes — both exactly
    representable in bf16 — and run ONE single-pass bf16 dot over the
    column-concatenated pair with f32 accumulation. Bit-exact regardless
    of the backend's DEFAULT f32 dot precision (which may round f32
    operands to bf16), and cheaper than a HIGHEST-precision f32 dot
    (6 MXU passes)."""
    hi = (x_int >> 8).astype(jnp.bfloat16)
    lo = (x_int & 0xFF).astype(jnp.bfloat16)
    out = jnp.dot(lhs_bf16, jnp.concatenate([hi, lo], axis=1),
                  preferred_element_type=jnp.float32)
    n = x_int.shape[1]
    return out[:, :n] * 256.0 + out[:, n:]


def sub_dct_cm(fenc, pred):
    """Whole-plane forward DCT of (fenc - pred): returns a list of 16
    int32 coefficient planes (H/4, W/4), natural order c = 4*i + j."""
    H, W = fenc.shape
    AH, _ = _mats(H)
    AW, _ = _mats(W)
    # res is in [-255, 255] — exact in bf16 — so the first pass is one
    # exact bf16 dot; its output reaches +-2040 (11 bits), so the second
    # pass goes through the hi/lo split (see _hilo_lmul).
    res = (fenc - pred).astype(jnp.bfloat16)
    R1 = jnp.dot(res, AW.T.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32).astype(jnp.int32)
    D = _hilo_lmul(AH.astype(jnp.bfloat16), R1)
    Hq, Wq = H // 4, W // 4
    return [D[i * Hq:(i + 1) * Hq, j * Wq:(j + 1) * Wq].astype(jnp.int32)
            for i in range(4) for j in range(4)]


def idct_add_plane(pred, dq_cm):
    """Whole-plane inverse transform + add + clip (add4x4_idct,
    common/dct.c:197). dq_cm: list of 16 int32 planes (natural order);
    blocks whose coefficients are all zero reconstruct to pred exactly
    (the butterfly of zeros is (32 >> 6) = 0)."""
    H, W = pred.shape
    _, PH = _mats(H)
    _, PW = _mats(W)
    # horizontal pass: combine planes along j for each i
    t = []
    for i in range(4):
        d0, d1, d2, d3 = dq_cm[4 * i:4 * i + 4]
        s02, d02 = d0 + d2, d0 - d2
        s13 = d1 + (d3 >> 1)
        d13 = (d1 >> 1) - d3
        t += [s02 + s13, d02 + d13, d02 - d13, s02 - s13]
    # vertical pass: combine along i for each output column j
    r = [None] * 16
    for j in range(4):
        d0, d1, d2, d3 = t[j], t[4 + j], t[8 + j], t[12 + j]
        s02, d02 = d0 + d2, d0 - d2
        s13 = d1 + (d3 >> 1)
        d13 = (d1 >> 1) - d3
        r[0 * 4 + j] = (s02 + s13 + 32) >> 6
        r[1 * 4 + j] = (d02 + d13 + 32) >> 6
        r[2 * 4 + j] = (d02 - d13 + 32) >> 6
        r[3 * 4 + j] = (s02 - s13 + 32) >> 6
    grouped = jnp.concatenate(
        [jnp.concatenate(r[4 * i:4 * i + 4], axis=1) for i in range(4)],
        axis=0)
    # Residual values reach +-2^13 (dequant growth), past bf16's 8-bit
    # significand, so ungroup via the hi/lo byte split (_hilo_lmul note).
    # PH/PW are permutations — they never mix values — so the hi and lo
    # halves stay within their bf16-exact ranges through both dots and
    # recombine only at the end.
    hi = grouped >> 8
    lo = grouped & 0xFF
    X = jnp.dot(PH.T.astype(jnp.bfloat16),
                jnp.concatenate([hi, lo], axis=1).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    Wd = grouped.shape[1]
    Y = jnp.dot(jnp.concatenate([X[:, :Wd], X[:, Wd:]],
                                axis=0).astype(jnp.bfloat16),
                PW.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    Hd = grouped.shape[0]
    res = (Y[:Hd] * 256.0 + Y[Hd:]).astype(jnp.int32)
    return jnp.clip(pred.astype(jnp.int32) + res, 0, 255)


def _up4(x, k: int):
    """(mb_h, mb_w) -> block grid by repeating k times per axis."""
    return jnp.repeat(jnp.repeat(x, k, axis=0), k, axis=1)


def quant_cm(cm, qp_mb, intra: bool, k_up: int, cqm=None,
             cqm_set: int = 0):
    """Quant the 16 coefficient planes (QUANT_ONE semantics,
    common/quant.c:31-38). qp_mb: (mb_h, mb_w) int; k_up = blocks per MB
    axis (4 luma, 2 chroma); cqm/cqm_set pick a scaling-list table set."""
    QMF, QBIAS, _ = T.cqm_mf(cqm, cqm_set)
    mf_mb = T.table_rows(QMF, qp_mb)                  # (mb_h, mb_w, 16)
    bias_mb = T.table_rows(QBIAS[1 if intra else 0], qp_mb)
    out = []
    for c in range(16):
        mf = _up4(mf_mb[..., c], k_up)
        bias = _up4(bias_mb[..., c], k_up)
        out.append(T._quant_core(cm[c], mf, bias))
    return out


def dequant_cm(q_cm, qp_mb, k_up: int, cqm=None, cqm_set: int = 0):
    """Dequant (common/quant.c:66-83), shl/shr branches per qp."""
    _, _, DMF = T.cqm_mf(cqm, cqm_set)
    dmf_mb = T.table_rows(DMF, qp_mb % 6)             # (mb_h, mb_w, 16)
    qbits_mb = qp_mb // 6 - 4
    qb = _up4(qbits_mb, k_up)
    nq = jnp.maximum(-qb, 0)
    f = (1 << nq) >> 1
    out = []
    for c in range(16):
        dmf = _up4(dmf_mb[..., c], k_up)
        x = q_cm[c]
        shl = (x * dmf) << jnp.maximum(qb, 0)
        shr = (x * dmf + f) >> nq
        out.append(jnp.where(qb >= 0, shl, shr))
    return out


def zigzag_order(cm):
    """Reorder the 16 natural-order planes into zigzag scan order."""
    return [cm[c] for c in ZIGZAG_4x4]


def decimate_score_cm(z_cm):
    """x264_decimate_score (common/quant.c:227-252) per block, on zigzag
    -ordered planes: ascending sweep keeping a zero-run counter; the
    run-weight table [3,2,2,1,1,1,0...] is (run<1)+(run<3)+(run<6).
    Any |level| > 1 forces score 9 (the reference's early return)."""
    shape = z_cm[0].shape
    score = jnp.zeros(shape, jnp.int32)
    run = jnp.zeros(shape, jnp.int32)
    big = jnp.zeros(shape, bool)
    for lv in z_cm:
        nz = lv != 0
        tab = ((run < 1).astype(jnp.int32) + (run < 3) + (run < 6))
        score = score + jnp.where(nz, tab, 0)
        run = jnp.where(nz, 0, run + 1)
        big = big | (jnp.abs(lv) > 1)
    return jnp.where(big, 9, score)


def nnz_cm(z_cm):
    """Per-block nonzero flag (0/1 int32) over the 16 planes."""
    nz = jnp.zeros(z_cm[0].shape, bool)
    for lv in z_cm:
        nz = nz | (lv != 0)
    return nz.astype(jnp.int32)


def mask_cm(cm, keep):
    """Zero every plane where keep (block grid, 0/1 or bool) is false."""
    k = keep.astype(cm[0].dtype) if keep.dtype != cm[0].dtype else keep
    return [x * k for x in cm]


# ---------------------------------------------------------------------------
# block-grid <-> MB-grid regrouping (small tensors; the per-element
# relayouts here are on (mb_h, mb_w, k, k)-sized data, not pixel planes)
# ---------------------------------------------------------------------------

def blockgrid_to_mb(x, mb_h: int, mb_w: int, k: int):
    """(mb_h*k, mb_w*k) block grid -> (mb_h, mb_w, k, k)."""
    return x.reshape(mb_h, k, mb_w, k).transpose(0, 2, 1, 3)


def mb_to_blockgrid(x, mb_h: int, mb_w: int, k: int):
    """(mb_h, mb_w, k, k) -> (mb_h*k, mb_w*k)."""
    return x.transpose(0, 2, 1, 3).reshape(mb_h * k, mb_w * k)


def luma_nnz_coding(nnz_bg, mb_h: int, mb_w: int):
    """nnz block grid (4mb_h, 4mb_w) -> (mb_h, mb_w, 16) in coding
    (scan8 quadrant) order."""
    g = blockgrid_to_mb(nnz_bg, mb_h, mb_w, 4)        # (mbh, mbw, by, bx)
    g = g.reshape(mb_h, mb_w, 2, 2, 2, 2)             # (qy, iy, qx, ix)
    g = g.transpose(0, 1, 2, 4, 3, 5)                 # (qy, qx, iy, ix)
    return g.reshape(mb_h, mb_w, 16)


def luma_levels_coding(z_cm, mb_h: int, mb_w: int):
    """Zigzag-ordered coefficient planes -> (mb_h, mb_w, 16, 16) levels
    in coding block order (the entropy writers' input layout)."""
    per_c = [blockgrid_to_mb(p, mb_h, mb_w, 4) for p in z_cm]
    lv = jnp.stack(per_c, axis=-1)                    # (mbh,mbw,by,bx,16)
    lv = lv.reshape(mb_h, mb_w, 2, 2, 2, 2, 16)
    lv = lv.transpose(0, 1, 2, 4, 3, 5, 6)            # (qy,qx,iy,ix)
    return lv.reshape(mb_h, mb_w, 16, 16)


def chroma_levels_coding(z_cm, mb_h: int, mb_w: int):
    """Chroma AC planes (2mb_h, 2mb_w each) -> (mb_h, mb_w, 4, 16)
    (blocks are the 2x2 quadrants, already in coding = raster order)."""
    per_c = [blockgrid_to_mb(p, mb_h, mb_w, 2) for p in z_cm]
    lv = jnp.stack(per_c, axis=-1)                    # (mbh,mbw,2,2,16)
    return lv.reshape(mb_h, mb_w, 4, 16)
