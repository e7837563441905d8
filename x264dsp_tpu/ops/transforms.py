"""Batched JAX transform/quant kernels — the TPU replacement for the
reference's dct-a.sa and quant-a.sa linear-assembly layer (SURVEY §2.5).

All functions are jit-compatible, operate on int32 tensors with arbitrary
leading batch dims (..., 4, 4), and are integer-exact twins of
ops/golden.py (which follows common/dct.c / common/quant.c line by line).

On TPU these lower to VPU element-wise ops; the 4x4 butterflies are
unrolled adds/shifts (XLA fuses the whole residual pipeline into a few
kernels), so there is no scalar loop anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .tables import (DEQUANT4_MF, QUANT4_BIAS_INTER, QUANT4_BIAS_INTRA,
                     QUANT4_MF, ZIGZAG_4x4)
from ._lazyconst import LazyConst

_C = LazyConst(np.array([[1, 1, 1, 1],
                         [2, 1, -1, -2],
                         [1, -1, -1, 1],
                         [1, -2, 2, -1]], dtype=np.int32))
_H = LazyConst(np.array([[1, 1, 1, 1],
                         [1, 1, -1, -1],
                         [1, -1, -1, 1],
                         [1, -1, 1, -1]], dtype=np.int32))

# device-resident copies of the quant tables (lazy: no backend init at
# import — see ops/_lazyconst.py)
QUANT4_MF_J = LazyConst(QUANT4_MF)                   # (70, 16)
QUANT4_BIAS_J = LazyConst(np.stack([np.asarray(QUANT4_BIAS_INTER),
                                    np.asarray(QUANT4_BIAS_INTRA)]))
DEQUANT4_MF_J = LazyConst(DEQUANT4_MF)               # (6, 16)
ZIGZAG_J = LazyConst(ZIGZAG_4x4)


def cqm_mf(cqm, cqm_set: int):
    """(quant_mf (70,16), bias (2,70,16), dequant_mf (6,16)) for one
    scaling-list set. cqm: None (flat — the module globals) or a tuple
    of 4 16-tuples (4IY/4PY/4IC/4PC, common/set.h:61-64) usable as a
    jit static arg; the derived tables bake into the trace as
    constants."""
    if cqm is None:
        return QUANT4_MF_J, QUANT4_BIAS_J, DEQUANT4_MF_J
    from .tables import cqm_tables
    qmf, bi, binter, dmf = cqm_tables(cqm)
    return (jnp.asarray(qmf[cqm_set]),
            jnp.stack([jnp.asarray(binter[cqm_set]),
                       jnp.asarray(bi[cqm_set])]),
            jnp.asarray(dmf[cqm_set]))


def sub_dct4x4(pix1: jnp.ndarray, pix2: jnp.ndarray) -> jnp.ndarray:
    """Batched forward 4x4 DCT of (pix1 - pix2): D = C·X·Cᵀ
    (sub4x4_dct, common/dct.c:121; natural orientation)."""
    d = pix1.astype(jnp.int32) - pix2.astype(jnp.int32)
    return jnp.einsum("ij,...jk,lk->...il", _C, d, _C)


def dct4x4(res: jnp.ndarray) -> jnp.ndarray:
    """Forward 4x4 DCT of a residual tensor (..., 4, 4)."""
    return jnp.einsum("ij,...jk,lk->...il", _C, res.astype(jnp.int32), _C)


def idct4x4_add(pred: jnp.ndarray, dct: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse 4x4 transform + add (add4x4_idct, common/dct.c:197).
    The >>1 on odd-frequency terms is an arithmetic shift (floor), applied
    per element before combination — exact twin of the C."""
    d = dct.astype(jnp.int32)
    # horizontal pass over the last axis
    s02 = d[..., :, 0] + d[..., :, 2]
    d02 = d[..., :, 0] - d[..., :, 2]
    s13 = d[..., :, 1] + (d[..., :, 3] >> 1)
    d13 = (d[..., :, 1] >> 1) - d[..., :, 3]
    tmp = jnp.stack([s02 + s13, d02 + d13, d02 - d13, s02 - s13], axis=-1)
    # vertical pass over the rows axis
    s02 = tmp[..., 0, :] + tmp[..., 2, :]
    d02 = tmp[..., 0, :] - tmp[..., 2, :]
    s13 = tmp[..., 1, :] + (tmp[..., 3, :] >> 1)
    d13 = (tmp[..., 1, :] >> 1) - tmp[..., 3, :]
    out = jnp.stack([(s02 + s13 + 32) >> 6, (d02 + d13 + 32) >> 6,
                     (d02 - d13 + 32) >> 6, (s02 - s13 + 32) >> 6], axis=-2)
    return jnp.clip(pred.astype(jnp.int32) + out, 0, 255)


def hadamard4x4(d: jnp.ndarray, forward: bool) -> jnp.ndarray:
    """Luma DC hadamard. forward: (H·D·H + 1) >> 1 (dct4x4dc,
    common/dct.c:36); inverse: H·D·H (idct4x4dc, :72)."""
    out = jnp.einsum("ij,...jk,lk->...il", _H, d.astype(jnp.int32), _H)
    return (out + 1) >> 1 if forward else out


def hadamard2x2(dc: jnp.ndarray) -> jnp.ndarray:
    """Chroma 2x2 DC hadamard in the reference storage order
    (dct2x2dc, encoder/macroblock.c:44-59). dc: (..., 4) raster quadrant DCs."""
    d0 = dc[..., 0] + dc[..., 1]
    d1 = dc[..., 2] + dc[..., 3]
    d2 = dc[..., 0] - dc[..., 1]
    d3 = dc[..., 2] - dc[..., 3]
    return jnp.stack([d0 + d1, d0 - d1, d2 + d3, d2 - d3], axis=-1)


def idct_dequant_2x2_dc(dc: jnp.ndarray, qp, cqm=None,
                        cqm_set: int = 0) -> jnp.ndarray:
    """Inverse 2x2 DC + dequant (encoder/macroblock.c:17-29); qp may be a
    traced scalar or a batched tensor broadcastable against dc[..., 0]."""
    qp = jnp.asarray(qp)
    _, _, DMF = cqm_mf(cqm, cqm_set)
    dmf = (table_rows(DMF, qp % 6)[..., 0] << (qp // 6)) >> 5
    d0 = dc[..., 0] + dc[..., 1]
    d1 = dc[..., 2] + dc[..., 3]
    d2 = dc[..., 0] - dc[..., 1]
    d3 = dc[..., 2] - dc[..., 3]
    return jnp.stack([(d0 + d1) * dmf, (d0 - d1) * dmf,
                      (d2 + d3) * dmf, (d2 - d3) * dmf], axis=-1)


def table_rows(table, idx):
    """Row lookup table[idx] for a batched int index tensor, computed as a
    one-hot matmul on the MXU. TPU gathers are per-element (hundreds of ms
    for a (B,) lookup at 1080p); a (B, N) one-hot times the (N, K) table is
    exact in f32 for table values < 2^24 and costs microseconds. Scalar
    (0-d) indices keep the direct path."""
    idx = jnp.asarray(idx)
    if idx.ndim == 0:
        return table[idx]
    N, K = table.shape
    flat = idx.reshape(-1)
    oh = (flat[:, None] == jnp.arange(N, dtype=idx.dtype)[None, :]
          ).astype(jnp.float32)
    # precision must be pinned: quant/dequant mf values run past 2^16
    # (custom CQM scales them), and the TPU's DEFAULT dot precision may
    # round f32 operands to bf16. HIGHEST keeps true-f32 semantics —
    # exact for < 2^24 — and these dots contract over N <= 52, so the
    # extra passes are free.
    out = jax.lax.dot(oh, table.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return out.astype(table.dtype).reshape(idx.shape + (K,))


def _quant_core(c, mf, bias):
    # (f + |coef|) * mf >> 16 with sign restore (QUANT_ONE, quant.c:31-38).
    # 32-bit is safe: |coef| <= ~2^15+bias, mf <= 26214 → < 2^31.
    pos = (bias + c) * mf >> 16
    neg = (bias - c) * mf >> 16
    return jnp.where(c > 0, pos, -neg).astype(jnp.int32)


def quant4x4(dct: jnp.ndarray, qp, intra, cqm=None,
             cqm_set: int = 0) -> jnp.ndarray:
    """Batched quant_4x4 (common/quant.c:40). qp: scalar or (...,) batch;
    intra: bool scalar or (...,) int tensor (1=intra); cqm/cqm_set pick
    a scaling-list table set (None = flat)."""
    qp = jnp.asarray(qp)
    intra = jnp.asarray(intra, dtype=jnp.int32)
    QMF, QBIAS, _ = cqm_mf(cqm, cqm_set)
    mf = table_rows(QMF, qp).reshape(qp.shape + (4, 4))
    if intra.ndim == 0:
        bias = table_rows(QBIAS[intra], qp)
    else:
        bias = jnp.where((intra != 0).reshape(intra.shape + (1,)),
                         table_rows(QBIAS[1], qp),
                         table_rows(QBIAS[0], qp))
    bias = bias.reshape(qp.shape + (4, 4))
    return _quant_core(dct.astype(jnp.int32), mf, bias)


def quant_dc(dct: jnp.ndarray, qp, intra, cqm=None,
             cqm_set: int = 0) -> jnp.ndarray:
    """Batched DC quant: mf[0]>>1, bias[0]<<1 (encoder/macroblock.c:124).
    dct: (..., N) flat DC coeffs."""
    qp = jnp.asarray(qp)
    intra = jnp.asarray(intra, dtype=jnp.int32)
    QMF, QBIAS, _ = cqm_mf(cqm, cqm_set)
    mf = (table_rows(QMF, qp)[..., 0] >> 1).reshape(qp.shape + (1,))
    if intra.ndim == 0:
        bias = table_rows(QBIAS[intra], qp)[..., 0]
    else:
        bias = jnp.where(intra != 0,
                         table_rows(QBIAS[1], qp)[..., 0],
                         table_rows(QBIAS[0], qp)[..., 0])
    bias = (bias << 1).reshape(qp.shape + (1,))
    return _quant_core(dct.astype(jnp.int32), mf, bias)


def dequant4x4(q: jnp.ndarray, qp, cqm=None,
               cqm_set: int = 0) -> jnp.ndarray:
    """Batched dequant_4x4 (common/quant.c:66-83). Handles both the shl
    (qp >= 24) and shr branches with lane-wise select."""
    qp = jnp.asarray(qp)
    _, _, DMF = cqm_mf(cqm, cqm_set)
    mf = table_rows(DMF, qp % 6).reshape(qp.shape + (4, 4))
    qbits = (qp // 6 - 4).reshape(qp.shape + (1, 1))
    q = q.astype(jnp.int32)
    shl = (q * mf) << jnp.maximum(qbits, 0)
    nq = jnp.maximum(-qbits, 0)
    f = (1 << nq) >> 1
    shr = (q * mf + f) >> nq
    return jnp.where(qbits >= 0, shl, shr)


def dequant_dc4x4(q: jnp.ndarray, qp, cqm=None,
                  cqm_set: int = 0) -> jnp.ndarray:
    """Batched dequant_4x4_dc (common/quant.c:85-103); q: (..., 4, 4)."""
    qp = jnp.asarray(qp)
    _, _, DMF = cqm_mf(cqm, cqm_set)
    dmf = table_rows(DMF, qp % 6)[..., 0].reshape(
        qp.shape + (1, 1))
    qbits = (qp // 6 - 6).reshape(qp.shape + (1, 1))
    q = q.astype(jnp.int32)
    shl = q * (dmf << jnp.maximum(qbits, 0))
    nq = jnp.maximum(-qbits, 0)
    f = (1 << nq) >> 1
    shr = (q * dmf + f) >> nq
    return jnp.where(qbits >= 0, shl, shr)


# constant permutation as a 0/1 matrix: out[j] = flat[ZIGZAG[j]]
_ZIGZAG_P = LazyConst(
    (np.asarray(ZIGZAG_4x4)[:, None] == np.arange(16)[None, :])
    .astype(np.float32))


def zigzag4x4(block: jnp.ndarray) -> jnp.ndarray:
    """Batched zigzag scan: (..., 4, 4) → (..., 16) levels. A fixed
    permutation runs as a matmul with a 0/1 matrix (exact in f32 for
    |coeff| < 2^24): per-element TPU gathers are orders of magnitude
    slower."""
    flat = block.reshape(-1, 16).astype(jnp.float32)
    out = jax.lax.dot(flat, _ZIGZAG_P.T,
                      preferred_element_type=jnp.float32)
    return out.astype(jnp.int32).reshape(block.shape[:-2] + (16,))


_DECIMATE_W = LazyConst(
    np.array([3, 2, 2, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], np.int32))


def decimate_score(levels: jnp.ndarray) -> jnp.ndarray:
    """Batched x264_decimate_score (common/quant.c:227-252) on zigzagged
    levels (..., L). Returns per-block score with the ">1 coeff → 9" rule.

    Vectorized reformulation: for each nonzero position (except the last
    in scan order), score += table[run of zeros that follows it]; if any
    |level| > 1, the score is >= 9 (the serial code early-outs at the
    first such coeff from the tail — the result is only ever compared
    against thresholds < 9, and our value is also >= 9 in that case)."""
    lv = levels.astype(jnp.int32)
    L = lv.shape[-1]
    nz = lv != 0
    idx = jnp.arange(L, dtype=jnp.int32)
    last = jnp.max(jnp.where(nz, idx, -1), axis=-1)  # -1 if all zero
    # next nonzero position at or after i+1 (suffix scan)
    big = jnp.int32(L)
    nxt = jnp.where(nz, idx, big)
    nxt_after = jnp.flip(jax.lax.associative_scan(
        jnp.minimum, jnp.flip(nxt, axis=-1), axis=-1), axis=-1)
    # run of zeros after position i = next_nz(i+1) - i - 1 (within last)
    nxt_shift = jnp.concatenate(
        [nxt_after[..., 1:], jnp.full(nxt_after.shape[:-1] + (1,), big)],
        axis=-1)
    run = jnp.clip(nxt_shift - idx - 1, 0, 15)
    contrib = jnp.where(nz & (idx < last[..., None]), _DECIMATE_W[run], 0)
    score = jnp.sum(contrib, axis=-1)
    # the last nonzero coeff contributes table[0]... no: the serial code
    # scores the run BELOW each nonzero, including the lowest one (run down
    # to index 0). Add that term: run below lowest nz = index of first nz.
    first = jnp.min(jnp.where(nz, idx, big), axis=-1)
    has = last >= 0
    score = score + jnp.where(has, _DECIMATE_W[jnp.clip(first, 0, 15)], 0)
    any_big = jnp.any(jnp.abs(lv) > 1, axis=-1)
    return jnp.where(any_big, 9, score)


def coeff_last(levels: jnp.ndarray) -> jnp.ndarray:
    """Batched coeff_last (common/quant.c:255-263, coeff_last16 in
    quant-a.sa:806): index of last nonzero, -1 if none. Kernel-layer
    parity twin — in the pipeline this role lives inside the host
    entropy writers (entropy.cpp write_block_residual scans levels
    directly), so this is used by tests and external callers only."""
    L = levels.shape[-1]
    idx = jnp.arange(L, dtype=jnp.int32)
    return jnp.max(jnp.where(levels != 0, idx, -1), axis=-1)
