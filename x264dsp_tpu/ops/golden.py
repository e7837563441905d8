"""Golden scalar NumPy kernel twins.

The reference keeps a dual implementation of every hot kernel: portable C
plus TI linear assembly, with the C path as the de-facto oracle
(SURVEY §4.1). This module plays the portable-C role for the TPU build:
simple, loop-level NumPy that follows the reference C line by line
(common/dct.c, common/quant.c, common/predict.c, common/pixel.c,
encoder/macroblock.c helpers). The batched JAX/Pallas kernels in the
sibling modules are tested against these.

All functions operate on small ndarray blocks in natural (row, col)
orientation. NOTE: the reference's DCT stores blocks transposed
(common/dct.c:121-155) with a compensating zigzag; we keep natural
orientation and the standard scan (ops/tables.py) — the zigzagged level
streams are identical.
"""

from __future__ import annotations

import numpy as np

from .tables import (CHROMA_QP_TABLE, CQM_JVT4I, CQM_JVT4P,  # noqa: F401
                     DECIMATE_TABLE4, DEQUANT4_MF, DEQUANT4_SCALE,
                     QUANT4_BIAS_INTER, QUANT4_BIAS_INTRA, QUANT4_MF,
                     ZIGZAG_4x4)

# luma 4x4 block index (quadrant order, idx = i8x8*4 + i4x4) → block coords
BLOCK_IDX_X = np.array([0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3])
BLOCK_IDX_Y = np.array([0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3])
# block idx → raster position in the 4x4 DC grid (encoder/macroblock.c:137)
BLOCK_IDX_XY_1D = BLOCK_IDX_Y * 4 + BLOCK_IDX_X


def clip_pixel(x):
    return np.clip(x, 0, 255)


# ---------------------------------------------------------------------------
# Transforms (common/dct.c)
# ---------------------------------------------------------------------------

_C = np.array([[1, 1, 1, 1],
               [2, 1, -1, -2],
               [1, -1, -1, 1],
               [1, -2, 2, -1]], dtype=np.int32)


def sub4x4_dct(pix1: np.ndarray, pix2: np.ndarray) -> np.ndarray:
    """Forward 4x4 integer DCT of (pix1 - pix2) (sub4x4_dct,
    common/dct.c:121). Natural orientation: D = C·X·Cᵀ."""
    d = pix1.astype(np.int32) - pix2.astype(np.int32)
    return _C @ d @ _C.T


def add4x4_idct(dst: np.ndarray, dct: np.ndarray) -> np.ndarray:
    """Inverse 4x4 transform + add to predictor (add4x4_idct,
    common/dct.c:197-235)."""
    dct = dct.astype(np.int32)
    # horizontal pass (rows)
    tmp = np.zeros((4, 4), dtype=np.int32)
    for i in range(4):
        s02 = dct[i, 0] + dct[i, 2]
        d02 = dct[i, 0] - dct[i, 2]
        s13 = dct[i, 1] + (dct[i, 3] >> 1)
        d13 = (dct[i, 1] >> 1) - dct[i, 3]
        tmp[i] = [s02 + s13, d02 + d13, d02 - d13, s02 - s13]
    out = np.zeros((4, 4), dtype=np.int32)
    for j in range(4):
        s02 = tmp[0, j] + tmp[2, j]
        d02 = tmp[0, j] - tmp[2, j]
        s13 = tmp[1, j] + (tmp[3, j] >> 1)
        d13 = (tmp[1, j] >> 1) - tmp[3, j]
        out[:, j] = [(s02 + s13 + 32) >> 6, (d02 + d13 + 32) >> 6,
                     (d02 - d13 + 32) >> 6, (s02 - s13 + 32) >> 6]
    return clip_pixel(dst.astype(np.int32) + out).astype(np.uint8)


def dct4x4dc(d: np.ndarray) -> np.ndarray:
    """Hadamard of the 16 luma DC coeffs with (x+1)>>1 scaling
    (common/dct.c:36-70)."""
    d = d.astype(np.int32)
    _H = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                   [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int32)
    # first pass columns, second rows, with final (x+1)>>1
    tmp = _H @ d          # column butterfly (reference pass 1 writes tmpᵀ)
    out = tmp @ _H.T
    return (out + 1) >> 1


def idct4x4dc(d: np.ndarray) -> np.ndarray:
    """Inverse DC hadamard, no scaling (common/dct.c:72-103)."""
    d = d.astype(np.int32)
    _H = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                   [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int32)
    return _H @ d @ _H.T


def sub8x8_dct_dc(pix1: np.ndarray, pix2: np.ndarray) -> np.ndarray:
    """DC-only 2x2 transform of an 8x8 residual (common/dct.c:176-196).
    Returns dct[4] in the reference's storage order [s00+s01+s10+s11,
    (s00+s01)-(s10+s11), (s00-s01)+(s10-s11), (s00-s01)-(s10-s11)] where
    sRC is the DC (pixel sum diff) of quadrant (row R, col C)."""
    d = pix1.astype(np.int32) - pix2.astype(np.int32)
    q = np.array([d[0:4, 0:4].sum(), d[0:4, 4:8].sum(),
                  d[4:8, 0:4].sum(), d[4:8, 4:8].sum()], dtype=np.int32)
    d0, d1 = q[0] + q[1], q[2] + q[3]
    d2, d3 = q[0] - q[1], q[2] - q[3]
    return np.array([d0 + d1, d0 - d1, d2 + d3, d2 - d3], dtype=np.int32)


def dct2x2dc(dc: np.ndarray) -> np.ndarray:
    """2x2 chroma DC hadamard (encoder/macroblock.c:44-59). Input: the 4
    quadrant DCs of the chroma residual DCT (raster), output in the
    reference's storage order."""
    d0, d1 = dc[0] + dc[1], dc[2] + dc[3]
    d2, d3 = dc[0] - dc[1], dc[2] - dc[3]
    return np.array([d0 + d1, d0 - d1, d2 + d3, d2 - d3], dtype=np.int32)


def idct_dequant_2x2_dc(dc: np.ndarray, qp: int, dmf_tab=None) -> np.ndarray:
    """Inverse 2x2 DC + dequant (encoder/macroblock.c:17-29). Returns the
    4 dequantized DC values (raster quadrant order). dmf_tab: optional
    (6, 16) dequant table (scaling-list sets); default flat."""
    tab = DEQUANT4_MF if dmf_tab is None else dmf_tab
    dmf = (int(tab[qp % 6][0]) << (qp // 6)) >> 5
    d0, d1 = dc[0] + dc[1], dc[2] + dc[3]
    d2, d3 = dc[0] - dc[1], dc[2] - dc[3]
    return np.array([(d0 + d1) * dmf, (d0 - d1) * dmf,
                     (d2 + d3) * dmf, (d2 - d3) * dmf], dtype=np.int32)


ZIGZAG_2x2_DC = np.array([0, 2, 1, 3])  # encoder/macroblock.c:9-15


# ---------------------------------------------------------------------------
# Quantization (common/quant.c, tables from common/set.c)
# ---------------------------------------------------------------------------

def quant_4x4(dct: np.ndarray, qp: int, intra: bool):
    """quant_4x4 (common/quant.c:36-45): (f + |coef|) * mf >> 16 with sign.
    Returns (quantized block int32 4x4 raster, nz flag)."""
    mf = QUANT4_MF[qp].reshape(4, 4).astype(np.int64)
    bias = (QUANT4_BIAS_INTRA if intra else QUANT4_BIAS_INTER)[qp].reshape(4, 4).astype(np.int64)
    c = dct.astype(np.int64)
    q = np.where(c > 0, (bias + c) * mf >> 16, -((bias - c) * mf >> 16))
    return q.astype(np.int32), bool(np.any(q))


def quant_dc(dct: np.ndarray, qp: int, intra: bool):
    """quant_4x4_dc / quant_2x2_dc: scalar mf[0]>>1, bias[0]<<1
    (encoder/macroblock.c:124,232)."""
    mf = int(QUANT4_MF[qp][0]) >> 1
    bias = int((QUANT4_BIAS_INTRA if intra else QUANT4_BIAS_INTER)[qp][0]) << 1
    c = dct.astype(np.int64)
    q = np.where(c > 0, (bias + c) * mf >> 16, -((bias - c) * mf >> 16))
    return q.astype(np.int32), bool(np.any(q))


def dequant_4x4(q: np.ndarray, qp: int, dmf_tab=None) -> np.ndarray:
    """dequant_4x4 (common/quant.c:66-83). dmf_tab: optional (6, 16)
    dequant table for scaling-list sets (flat when None)."""
    tab = DEQUANT4_MF if dmf_tab is None else np.asarray(dmf_tab)
    mf = tab[qp % 6].reshape(4, 4).astype(np.int32)
    qbits = qp // 6 - 4
    q = q.astype(np.int32)
    if qbits >= 0:
        return (q * mf) << qbits
    f = 1 << (-qbits - 1)
    return (q * mf + f) >> (-qbits)


def dequant_4x4_dc(q: np.ndarray, qp: int, dmf_tab=None) -> np.ndarray:
    """dequant_4x4_dc (common/quant.c:85-103)."""
    tab = DEQUANT4_MF if dmf_tab is None else dmf_tab
    dmf = int(tab[qp % 6][0])
    qbits = qp // 6 - 6
    q = q.astype(np.int32)
    if qbits >= 0:
        return q * (dmf << qbits)
    f = 1 << (-qbits - 1)
    return (q * dmf + f) >> (-qbits)


def zigzag_scan_4x4(block: np.ndarray) -> np.ndarray:
    return block.reshape(16)[ZIGZAG_4x4]


def decimate_score(levels: np.ndarray) -> int:
    """x264_decimate_score_internal (common/quant.c:227-252) on a zigzagged
    level array (length 15 or 16)."""
    idx = len(levels) - 1
    while idx >= 0 and levels[idx] == 0:
        idx -= 1
    score = 0
    while idx >= 0:
        if abs(int(levels[idx])) > 1:
            return 9
        idx -= 1
        run = 0
        while idx >= 0 and levels[idx] == 0:
            idx -= 1
            run += 1
        score += int(DECIMATE_TABLE4[run])
    return score


def coeff_level_run(levels: np.ndarray):
    """x264_coeff_level_run (common/quant.c:283-299): last index, levels in
    reverse scan order, and runs of zeros before each."""
    last = len(levels) - 1
    while last >= 0 and levels[last] == 0:
        last -= 1
    out_levels, out_runs = [], []
    i = last
    while i >= 0:
        out_levels.append(int(levels[i]))
        run = 0
        i -= 1
        while i >= 0 and levels[i] == 0:
            i -= 1
            run += 1
        out_runs.append(run)
    return last, out_levels, out_runs


def chroma_qp(qp: int, offset: int = 0) -> int:
    return int(CHROMA_QP_TABLE[np.clip(qp + offset, 0, 51)])


# ---------------------------------------------------------------------------
# Intra prediction (common/predict.c). Neighbor arguments:
#   left: column of pixels left of the block (top to bottom)
#   top: row above the block; topleft: single pixel; topright: row above-right
#   avail flags select the exact DC variant, matching predict.c.
# ---------------------------------------------------------------------------

def predict_16x16(mode: int, left, top, topleft) -> np.ndarray:
    out = np.zeros((16, 16), dtype=np.int32)
    if mode == 0:    # V
        out[:] = top[None, :]
    elif mode == 1:  # H
        out[:] = np.asarray(left)[:, None]
    elif mode == 2:  # DC
        dc = (int(np.sum(left)) + int(np.sum(top)) + 16) >> 5
        out[:] = dc
    elif mode == 3:  # P (predict_16x16_p_c, common/predict.c:128-160)
        top = np.asarray(top, dtype=np.int64)
        left = np.asarray(left, dtype=np.int64)
        tl = int(topleft)
        H = sum((i + 1) * (int(top[8 + i]) - int(top[6 - i] if 6 - i >= 0 else tl))
                for i in range(8))
        V = sum((i + 1) * (int(left[8 + i]) - int(left[6 - i] if 6 - i >= 0 else tl))
                for i in range(8))
        a = 16 * (int(left[15]) + int(top[15]))
        b = (5 * H + 32) >> 6
        c = (5 * V + 32) >> 6
        i00 = a - b * 7 - c * 7 + 16
        for y in range(16):
            pix = i00 + c * y
            for x in range(16):
                out[y, x] = min(255, max(0, (pix + b * x) >> 5))
        return out
    elif mode == 4:  # DC_LEFT
        out[:] = (int(np.sum(left)) + 8) >> 4
    elif mode == 5:  # DC_TOP
        out[:] = (int(np.sum(top)) + 8) >> 4
    else:            # DC_128
        out[:] = 128
    return out


def predict_8x8c(mode: int, left, top, topleft) -> np.ndarray:
    """Chroma 8x8: modes DC=0,H=1,V=2,P=3,DC_LEFT=4,DC_TOP=5,DC_128=6."""
    out = np.zeros((8, 8), dtype=np.int32)
    if mode == 0:    # DC (quadrant rule, predict.c:8x8c_dc_c)
        s0 = int(np.sum(top[0:4]))
        s1 = int(np.sum(top[4:8]))
        s2 = int(np.sum(left[0:4]))
        s3 = int(np.sum(left[4:8]))
        out[0:4, 0:4] = (s0 + s2 + 4) >> 3
        out[0:4, 4:8] = (s1 + 2) >> 2
        out[4:8, 0:4] = (s3 + 2) >> 2
        out[4:8, 4:8] = (s1 + s3 + 4) >> 3
    elif mode == 1:  # H
        out[:] = np.asarray(left)[:, None]
    elif mode == 2:  # V
        out[:] = np.asarray(top)[None, :]
    elif mode == 3:  # P (predict_8x8c_p_c)
        tl = int(topleft)
        top = np.asarray(top, dtype=np.int64)
        left = np.asarray(left, dtype=np.int64)
        H = sum((i + 1) * (int(top[4 + i]) - int(top[2 - i] if 2 - i >= 0 else tl))
                for i in range(4))
        V = sum((i + 1) * (int(left[4 + i]) - int(left[2 - i] if 2 - i >= 0 else tl))
                for i in range(4))
        a = 16 * (int(left[7]) + int(top[7]))
        b = (17 * H + 16) >> 5
        c = (17 * V + 16) >> 5
        i00 = a - 3 * b - 3 * c + 16
        for y in range(8):
            for x in range(8):
                out[y, x] = min(255, max(0, (i00 + b * x + c * y) >> 5))
        return out
    elif mode == 4:  # DC_LEFT (two halves)
        out[0:4, :] = (int(np.sum(left[0:4])) + 2) >> 2
        out[4:8, :] = (int(np.sum(left[4:8])) + 2) >> 2
    elif mode == 5:  # DC_TOP
        out[:, 0:4] = (int(np.sum(top[0:4])) + 2) >> 2
        out[:, 4:8] = (int(np.sum(top[4:8])) + 2) >> 2
    else:
        out[:] = 128
    return out


def _f1(a, b):
    return (a + b + 1) >> 1


def _f2(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def predict_4x4(mode: int, left, top, topleft, topright) -> np.ndarray:
    """4x4 intra predictors (common/predict.c:322-470). Inputs are the
    exact neighbor pixels (already patched for missing topright —
    the caller replicates top[3], matching encoder/macroblock.c:371-373)."""
    l0, l1, l2, l3 = [int(v) for v in left]
    t0, t1, t2, t3 = [int(v) for v in top]
    t4, t5, t6, t7 = [int(v) for v in topright]
    lt = int(topleft)
    out = np.zeros((4, 4), dtype=np.int32)
    if mode == 0:    # V
        out[:] = np.array([t0, t1, t2, t3])[None, :]
    elif mode == 1:  # H
        out[:] = np.array([l0, l1, l2, l3])[:, None]
    elif mode == 2:  # DC
        out[:] = (l0 + l1 + l2 + l3 + t0 + t1 + t2 + t3 + 4) >> 3
    elif mode == 3:  # DDL
        out[0, 0] = _f2(t0, t1, t2)
        out[1, 0] = out[0, 1] = _f2(t1, t2, t3)
        out[2, 0] = out[1, 1] = out[0, 2] = _f2(t2, t3, t4)
        out[3, 0] = out[2, 1] = out[1, 2] = out[0, 3] = _f2(t3, t4, t5)
        out[3, 1] = out[2, 2] = out[1, 3] = _f2(t4, t5, t6)
        out[3, 2] = out[2, 3] = _f2(t5, t6, t7)
        out[3, 3] = _f2(t6, t7, t7)
        # note: reference writes SRC(x,y); out[y,x] here
        out = out.T
    elif mode == 4:  # DDR
        o = {}
        o[(3, 0)] = _f2(t3, t2, t1)
        o[(2, 0)] = o[(3, 1)] = _f2(t2, t1, t0)
        o[(1, 0)] = o[(2, 1)] = o[(3, 2)] = _f2(t1, t0, lt)
        o[(0, 0)] = o[(1, 1)] = o[(2, 2)] = o[(3, 3)] = _f2(t0, lt, l0)
        o[(0, 1)] = o[(1, 2)] = o[(2, 3)] = _f2(lt, l0, l1)
        o[(0, 2)] = o[(1, 3)] = _f2(l0, l1, l2)
        o[(0, 3)] = _f2(l1, l2, l3)
        for (x, y), v in o.items():
            out[y, x] = v
    elif mode == 5:  # VR
        o = {}
        o[(0, 3)] = _f2(l2, l1, l0)
        o[(0, 2)] = _f2(l1, l0, lt)
        o[(0, 1)] = o[(1, 3)] = _f2(l0, lt, t0)
        o[(0, 0)] = o[(1, 2)] = _f1(lt, t0)
        o[(1, 1)] = o[(2, 3)] = _f2(lt, t0, t1)
        o[(1, 0)] = o[(2, 2)] = _f1(t0, t1)
        o[(2, 1)] = o[(3, 3)] = _f2(t0, t1, t2)
        o[(2, 0)] = o[(3, 2)] = _f1(t1, t2)
        o[(3, 1)] = _f2(t1, t2, t3)
        o[(3, 0)] = _f1(t2, t3)
        for (x, y), v in o.items():
            out[y, x] = v
    elif mode == 6:  # HD
        o = {}
        o[(0, 3)] = _f1(l2, l3)
        o[(1, 3)] = _f2(l1, l2, l3)
        o[(0, 2)] = o[(2, 3)] = _f1(l1, l2)
        o[(1, 2)] = o[(3, 3)] = _f2(l0, l1, l2)
        o[(0, 1)] = o[(2, 2)] = _f1(l0, l1)
        o[(1, 1)] = o[(3, 2)] = _f2(lt, l0, l1)
        o[(0, 0)] = o[(2, 1)] = _f1(lt, l0)
        o[(1, 0)] = o[(3, 1)] = _f2(t0, lt, l0)
        o[(2, 0)] = _f2(t1, t0, lt)
        o[(3, 0)] = _f2(t2, t1, t0)
        for (x, y), v in o.items():
            out[y, x] = v
    elif mode == 7:  # VL
        o = {}
        o[(0, 0)] = _f1(t0, t1)
        o[(0, 1)] = _f2(t0, t1, t2)
        o[(1, 0)] = o[(0, 2)] = _f1(t1, t2)
        o[(1, 1)] = o[(0, 3)] = _f2(t1, t2, t3)
        o[(2, 0)] = o[(1, 2)] = _f1(t2, t3)
        o[(2, 1)] = o[(1, 3)] = _f2(t2, t3, t4)
        o[(3, 0)] = o[(2, 2)] = _f1(t3, t4)
        o[(3, 1)] = o[(2, 3)] = _f2(t3, t4, t5)
        o[(3, 2)] = _f1(t4, t5)
        o[(3, 3)] = _f2(t4, t5, t6)
        for (x, y), v in o.items():
            out[y, x] = v
    elif mode == 8:  # HU
        o = {}
        o[(0, 0)] = _f1(l0, l1)
        o[(1, 0)] = _f2(l0, l1, l2)
        o[(2, 0)] = o[(0, 1)] = _f1(l1, l2)
        o[(3, 0)] = o[(1, 1)] = _f2(l1, l2, l3)
        o[(2, 1)] = o[(0, 2)] = _f1(l2, l3)
        o[(3, 1)] = o[(1, 2)] = _f2(l2, l3, l3)
        for k in [(3, 2), (1, 3), (0, 3), (2, 2), (2, 3), (3, 3)]:
            o[k] = l3
        for (x, y), v in o.items():
            out[y, x] = v
    elif mode == 9:   # DC_LEFT
        out[:] = (l0 + l1 + l2 + l3 + 2) >> 2
    elif mode == 10:  # DC_TOP
        out[:] = (t0 + t1 + t2 + t3 + 2) >> 2
    else:             # DC_128
        out[:] = 128
    return out


# ---------------------------------------------------------------------------
# Pixel metrics (common/pixel.c)
# ---------------------------------------------------------------------------

def sad(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int32) - b.astype(np.int32)).sum())


def ssd(a: np.ndarray, b: np.ndarray) -> int:
    d = a.astype(np.int64) - b.astype(np.int64)
    return int((d * d).sum())


_H4 = np.array([[1, 1, 1, 1], [1, -1, 1, -1],
                [1, 1, -1, -1], [1, -1, -1, 1]], dtype=np.int32)


def _hadamard_abs_sum(a, b):
    d = a.astype(np.int32) - b.astype(np.int32)
    t = _H4 @ d @ _H4.T
    return int(np.abs(t).sum())


def satd_4x4(a: np.ndarray, b: np.ndarray) -> int:
    """pixel_satd_4x4 (common/pixel.c:267-291): abs hadamard sum >> 1."""
    return _hadamard_abs_sum(a, b) >> 1


def satd(a: np.ndarray, b: np.ndarray) -> int:
    """SATD of a WxH region. Matches the reference composition exactly:
    widths >= 8 sum floor-halved 8x4 sub-satds (x264_pixel_satd_8x4 base,
    pixel.c:293-330); width 4 sums floor-halved 4x4s."""
    h, w = a.shape
    total = 0
    if w >= 8:
        for y in range(0, h, 4):
            for x in range(0, w, 8):
                s = (_hadamard_abs_sum(a[y:y+4, x:x+4], b[y:y+4, x:x+4]) +
                     _hadamard_abs_sum(a[y:y+4, x+4:x+8], b[y:y+4, x+4:x+8]))
                total += s >> 1
    else:
        for y in range(0, h, 4):
            total += _hadamard_abs_sum(a[y:y+4, 0:4], b[y:y+4, 0:4]) >> 1
    return total


def var_8x8(p: np.ndarray):
    """pixel var 8x8: returns (sum, sqr_sum) based variance as in
    ratecontrol AQ (ratecontrol.c:192-235)."""
    p = p.astype(np.int64)
    s = int(p.sum())
    sq = int((p * p).sum())
    return sq - (s * s >> 6)


def var2_8x8(fenc: np.ndarray, fdec: np.ndarray):
    """pixel var2_8x8 (pixel-a.sa:4188): variance of the diff; returns
    (var, ssd)."""
    d = fenc.astype(np.int64) - fdec.astype(np.int64)
    s = int(d.sum())
    sq = int((d * d).sum())
    return sq - (s * s >> 6), sq


# ---------------------------------------------------------------------------
# Motion compensation (common/mc.c)
# ---------------------------------------------------------------------------

HPEL_REF0 = np.array([0, 1, 1, 1, 0, 1, 1, 1, 2, 3, 3, 3, 0, 1, 1, 1])
HPEL_REF1 = np.array([0, 0, 0, 0, 2, 2, 3, 2, 2, 2, 3, 2, 2, 2, 3, 2])


def hpel_filter(plane: np.ndarray):
    """Scalar twin of hpel_filter (common/mc.c:144-167). Returns (h, v, c);
    the outer 3 pixels of each edge are invalid."""
    p = plane.astype(np.int64)
    H, W = p.shape
    h = np.zeros_like(p)
    v = np.zeros_like(p)
    c = np.zeros_like(p)
    vfull = np.zeros_like(p)
    for y in range(2, H - 3):
        for x in range(W):
            t = (p[y - 2, x] + p[y + 3, x] - 5 * (p[y - 1, x] + p[y + 2, x])
                 + 20 * (p[y, x] + p[y + 1, x]))
            vfull[y, x] = t
            v[y, x] = clip_pixel((t + 16) >> 5)
    for y in range(H):
        for x in range(2, W - 3):
            t = (p[y, x - 2] + p[y, x + 3] - 5 * (p[y, x - 1] + p[y, x + 2])
                 + 20 * (p[y, x] + p[y, x + 1]))
            h[y, x] = clip_pixel((t + 16) >> 5)
    for y in range(2, H - 3):
        for x in range(2, W - 3):
            t = (vfull[y, x - 2] + vfull[y, x + 3]
                 - 5 * (vfull[y, x - 1] + vfull[y, x + 2])
                 + 20 * (vfull[y, x] + vfull[y, x + 1]))
            c[y, x] = clip_pixel((t + 512) >> 10)
    return h, v, c


def mc_luma(ref4, x0, y0, mvx, mvy, bw, bh):
    """Scalar twin of mc_luma (common/mc.c:216-240). ref4: list of 4
    planes (same shape); coords are plane coords (already padded)."""
    qidx = ((mvy & 3) << 2) + (mvx & 3)
    fy = y0 + (mvy >> 2)
    fx = x0 + (mvx >> 2)
    y1 = fy + (1 if (mvy & 3) == 3 else 0)
    src1 = ref4[HPEL_REF0[qidx]][y1:y1 + bh, fx:fx + bw].astype(np.int32)
    if qidx & 5:
        x2 = fx + (1 if (mvx & 3) == 3 else 0)
        src2 = ref4[HPEL_REF1[qidx]][fy:fy + bh, x2:x2 + bw].astype(np.int32)
        return (src1 + src2 + 1) >> 1
    return src1


def mc_chroma(refc, x0, y0, mvx, mvy, bw, bh):
    """Scalar twin of mc_chroma (common/mc.c:295-323), planar."""
    d8x, d8y = mvx & 7, mvy & 7
    cA = (8 - d8x) * (8 - d8y)
    cB = d8x * (8 - d8y)
    cC = (8 - d8x) * d8y
    cD = d8x * d8y
    fy = y0 + (mvy >> 3)
    fx = x0 + (mvx >> 3)
    out = np.zeros((bh, bw), np.int32)
    s = refc.astype(np.int32)
    for y in range(bh):
        for x in range(bw):
            out[y, x] = (cA * s[fy + y, fx + x] + cB * s[fy + y, fx + x + 1]
                         + cC * s[fy + y + 1, fx + x]
                         + cD * s[fy + y + 1, fx + x + 1] + 32) >> 6
    return out


# ---------------------------------------------------------------------------
# Deblocking (common/deblock.c) — scalar twin of x264_frame_deblock_row
# ---------------------------------------------------------------------------

from .deblock import ALPHA_TABLE, BETA_TABLE, TC0_TABLE  # noqa: E402


def _db_edge_luma(pix, y0, x0, dy, dx, alpha, beta, tc0):
    """Filter one luma sample position across an edge; (dy,dx) = direction
    of the p→q axis (xstride)."""
    def g(k):
        return int(pix[y0 + dy * k, x0 + dx * k])
    p3, p2, p1, p0 = g(-4), g(-3), g(-2), g(-1)
    q0, q1, q2, q3 = g(0), g(1), g(2), g(3)
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return
    tc = tc0
    if abs(p2 - p0) < beta:
        if tc0:
            pix[y0 - dy * 2, x0 - dx * 2] = p1 + np.clip(
                ((p2 + ((p0 + q0 + 1) >> 1)) >> 1) - p1, -tc0, tc0)
        tc += 1
    if abs(q2 - q0) < beta:
        if tc0:
            pix[y0 + dy, x0 + dx] = q1 + np.clip(
                ((q2 + ((p0 + q0 + 1) >> 1)) >> 1) - q1, -tc0, tc0)
        tc += 1
    delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    pix[y0 - dy, x0 - dx] = np.clip(p0 + delta, 0, 255)
    pix[y0, x0] = np.clip(q0 - delta, 0, 255)


def _db_edge_luma_intra(pix, y0, x0, dy, dx, alpha, beta):
    def g(k):
        return int(pix[y0 + dy * k, x0 + dx * k])
    p3, p2, p1, p0 = g(-4), g(-3), g(-2), g(-1)
    q0, q1, q2, q3 = g(0), g(1), g(2), g(3)
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return
    if abs(p0 - q0) < (alpha >> 2) + 2:
        if abs(p2 - p0) < beta:
            pix[y0 - dy, x0 - dx] = (p2 + 2*p1 + 2*p0 + 2*q0 + q1 + 4) >> 3
            pix[y0 - 2*dy, x0 - 2*dx] = (p2 + p1 + p0 + q0 + 2) >> 2
            pix[y0 - 3*dy, x0 - 3*dx] = (2*p3 + 3*p2 + p1 + p0 + q0 + 4) >> 3
        else:
            pix[y0 - dy, x0 - dx] = (2*p1 + p0 + q1 + 2) >> 2
        if abs(q2 - q0) < beta:
            pix[y0, x0] = (p1 + 2*p0 + 2*q0 + 2*q1 + q2 + 4) >> 3
            pix[y0 + dy, x0 + dx] = (p0 + q0 + q1 + q2 + 2) >> 2
            pix[y0 + 2*dy, x0 + 2*dx] = (2*q3 + 3*q2 + q1 + q0 + p0 + 4) >> 3
        else:
            pix[y0, x0] = (2*q1 + q0 + p1 + 2) >> 2
    else:
        pix[y0 - dy, x0 - dx] = (2*p1 + p0 + q1 + 2) >> 2
        pix[y0, x0] = (2*q1 + q0 + p1 + 2) >> 2


def _db_edge_chroma(pix, y0, x0, dy, dx, alpha, beta, tc):
    def g(k):
        return int(pix[y0 + dy * k, x0 + dx * k])
    p1, p0, q0, q1 = g(-2), g(-1), g(0), g(1)
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return
    delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    pix[y0 - dy, x0 - dx] = np.clip(p0 + delta, 0, 255)
    pix[y0, x0] = np.clip(q0 - delta, 0, 255)


def _db_edge_chroma_intra(pix, y0, x0, dy, dx, alpha, beta):
    def g(k):
        return int(pix[y0 + dy * k, x0 + dx * k])
    p1, p0, q0, q1 = g(-2), g(-1), g(0), g(1)
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return
    pix[y0 - dy, x0 - dx] = (2*p1 + p0 + q1 + 2) >> 2
    pix[y0, x0] = (2*q1 + q0 + p1 + 2) >> 2


def deblock_frame_golden(y, u, v, bs, intra_mb, first_edge_only, qp, qpc,
                         a_off=0, b_off=0):
    """Scalar x264_frame_deblock_row over the whole frame
    (common/deblock.c:341-430). Arrays are modified copies returned.
    qp/qpc: scalars or per-MB (mb_h, mb_w) decoded-QP grids; MB edges
    average with the neighbour's QP ((qp+qp_nb+1)>>1, deblock.c:360)."""
    y = y.astype(np.int32).copy()
    u = u.astype(np.int32).copy()
    v = v.astype(np.int32).copy()
    mb_h, mb_w = intra_mb.shape
    qp_mb = np.broadcast_to(np.asarray(qp), (mb_h, mb_w))
    qpc_mb = np.broadcast_to(np.asarray(qpc), (mb_h, mb_w))

    def edge_params(mbx, mby, dirn, edge, chroma):
        grid = qpc_mb if chroma else qp_mb
        q = int(grid[mby, mbx])
        if edge == 0:
            nb = int(grid[mby, mbx - 1] if dirn == 0 else grid[mby - 1, mbx])
            q = (q + nb + 1) >> 1
        ia = int(np.clip(q + a_off, 0, 51))
        ib = int(np.clip(q + b_off, 0, 51))
        return ia, int(ALPHA_TABLE[ia]), int(BETA_TABLE[ib])

    def luma_edge(mbx, mby, dirn, edge, use_intra):
        bss = bs[mby, mbx, dirn, edge]
        idx_a, alpha, beta = edge_params(mbx, mby, dirn, edge, False)
        for i in range(4):
            for d in range(4):
                k = i * 4 + d
                if dirn == 0:
                    yy, xx = mby * 16 + k, mbx * 16 + edge * 4
                    dy, dx = 0, 1
                else:
                    yy, xx = mby * 16 + edge * 4, mbx * 16 + k
                    dy, dx = 1, 0
                if use_intra:
                    _db_edge_luma_intra(y, yy, xx, dy, dx, alpha, beta)
                else:
                    tc0 = int(TC0_TABLE[idx_a, bss[i]])
                    if tc0 < 0:
                        continue
                    _db_edge_luma(y, yy, xx, dy, dx, alpha, beta, tc0)

    def chroma_edge(plane, mbx, mby, dirn, edge_c, bs_row, use_intra):
        bss = bs[mby, mbx, dirn, bs_row]
        idx_ac, alphac, betac = edge_params(mbx, mby, dirn,
                                            0 if edge_c == 0 else 1, True)
        for i in range(4):
            for d in range(2):
                k = i * 2 + d
                if dirn == 0:
                    yy, xx = mby * 8 + k, mbx * 8 + edge_c
                    dy, dx = 0, 1
                else:
                    yy, xx = mby * 8 + edge_c, mbx * 8 + k
                    dy, dx = 1, 0
                if use_intra:
                    _db_edge_chroma_intra(plane, yy, xx, dy, dx,
                                          alphac, betac)
                else:
                    tc = int(TC0_TABLE[idx_ac, bss[i]]) + 1
                    if tc <= 0:
                        continue
                    _db_edge_chroma(plane, yy, xx, dy, dx, alphac, betac, tc)

    for mby in range(mb_h):
        for mbx in range(mb_w):
            ic = bool(intra_mb[mby, mbx])
            feo = bool(first_edge_only[mby, mbx])
            if mbx > 0:
                uin = ic or bool(intra_mb[mby, mbx - 1])
                luma_edge(mbx, mby, 0, 0, uin)
                chroma_edge(u, mbx, mby, 0, 0, 0, uin)
                chroma_edge(v, mbx, mby, 0, 0, 0, uin)
            if not feo:
                for e in (1, 2, 3):
                    luma_edge(mbx, mby, 0, e, False)
                chroma_edge(u, mbx, mby, 0, 4, 2, False)
                chroma_edge(v, mbx, mby, 0, 4, 2, False)
            if mby > 0:
                uin = ic or bool(intra_mb[mby - 1, mbx])
                luma_edge(mbx, mby, 1, 0, uin)
                chroma_edge(u, mbx, mby, 1, 0, 0, uin)
                chroma_edge(v, mbx, mby, 1, 0, 0, uin)
            if not feo:
                for e in (1, 2, 3):
                    luma_edge(mbx, mby, 1, e, False)
                chroma_edge(u, mbx, mby, 1, 4, 2, False)
                chroma_edge(v, mbx, mby, 1, 4, 2, False)
    return y, u, v
