"""Batched intra predictors — TPU replacement for predict-a.sa.

Each function computes ALL prediction modes for a batch of blocks at once
from explicit neighbor tensors, returning (..., n_modes, H, W) int32.
Mode indices match the reference enums (common/predict.h:10-68):

  16x16: V=0 H=1 DC=2 P=3 DC_LEFT=4 DC_TOP=5 DC_128=6
  8x8c:  DC=0 H=1 V=2 P=3 DC_LEFT=4 DC_TOP=5 DC_128=6
  4x4:   V=0 H=1 DC=2 DDL=3 DDR=4 VR=5 HD=6 VL=7 HU=8
         DC_LEFT=9 DC_TOP=10 DC_128=11

Semantics match common/predict.c exactly (validated against ops/golden.py).
The analysis stage masks unavailable modes by cost rather than branching,
which is the TPU-idiomatic replacement for the reference's per-MB
function-pointer dispatch (common/common.h:1095-1098).
"""

from __future__ import annotations

import jax.numpy as jnp


def _i32(x):
    return jnp.asarray(x).astype(jnp.int32)


def predict_16x16_all(left, top, topleft):
    """left/top: (..., 16), topleft: (...,) → (..., 7, 16, 16)."""
    left, top, topleft = _i32(left), _i32(top), _i32(topleft)
    B = left.shape[:-1]
    ones = jnp.ones(B + (16, 16), jnp.int32)
    v = jnp.broadcast_to(top[..., None, :], B + (16, 16))
    h = jnp.broadcast_to(left[..., :, None], B + (16, 16))
    dc = ((left.sum(-1) + top.sum(-1) + 16) >> 5)[..., None, None] * ones
    dcl = ((left.sum(-1) + 8) >> 4)[..., None, None] * ones
    dct_ = ((top.sum(-1) + 8) >> 4)[..., None, None] * ones
    dc128 = 128 * ones
    # plane (x264_predict_16x16_p_c, common/predict.c:128-160)
    w = jnp.arange(1, 9, dtype=jnp.int32)
    top_ext = jnp.concatenate([topleft[..., None], top], axis=-1)   # idx -1..15
    left_ext = jnp.concatenate([topleft[..., None], left], axis=-1)
    H = (w * (top_ext[..., 9:17] - jnp.flip(top_ext[..., 0:8], -1))).sum(-1)
    V = (w * (left_ext[..., 9:17] - jnp.flip(left_ext[..., 0:8], -1))).sum(-1)
    a = 16 * (left[..., 15] + top[..., 15])
    b = (5 * H + 32) >> 6
    c = (5 * V + 32) >> 6
    i00 = a - 7 * b - 7 * c + 16
    xs = jnp.arange(16, dtype=jnp.int32)
    plane = (i00[..., None, None]
             + b[..., None, None] * xs[None, :]
             + c[..., None, None] * xs[:, None]) >> 5
    plane = jnp.clip(plane, 0, 255)
    return jnp.stack([v, h, dc, plane, dcl, dct_, dc128], axis=-3)


def predict_8x8c_all(left, top, topleft):
    """left/top: (..., 8), topleft: (...,) → (..., 7, 8, 8)."""
    left, top, topleft = _i32(left), _i32(top), _i32(topleft)
    B = left.shape[:-1]
    ones = jnp.ones(B + (8, 8), jnp.int32)
    h = jnp.broadcast_to(left[..., :, None], B + (8, 8))
    v = jnp.broadcast_to(top[..., None, :], B + (8, 8))
    s0 = top[..., 0:4].sum(-1)
    s1 = top[..., 4:8].sum(-1)
    s2 = left[..., 0:4].sum(-1)
    s3 = left[..., 4:8].sum(-1)
    # quadrant DC rule (x264_predict_8x8c_dc_c, predict.c:231-270)
    q = jnp.arange(8)
    qx = (q >= 4).astype(jnp.int32)
    dc00 = (s0 + s2 + 4) >> 3
    dc01 = (s1 + 2) >> 2
    dc10 = (s3 + 2) >> 2
    dc11 = (s1 + s3 + 4) >> 3
    dcq = jnp.stack([jnp.stack([dc00, dc01], -1),
                     jnp.stack([dc10, dc11], -1)], -2)  # (..., 2, 2)
    dc = dcq[..., qx[:, None], qx[None, :]]
    dl0 = (s2 + 2) >> 2
    dl1 = (s3 + 2) >> 2
    dcl = jnp.where((q < 4)[:, None] * jnp.ones(8, jnp.int32)[None, :] > 0,
                    dl0[..., None, None] * ones, dl1[..., None, None] * ones)
    dt0 = (s0 + 2) >> 2
    dt1 = (s1 + 2) >> 2
    dct_ = jnp.where((q < 4)[None, :] * jnp.ones(8, jnp.int32)[:, None] > 0,
                     dt0[..., None, None] * ones, dt1[..., None, None] * ones)
    dc128 = 128 * ones
    # plane (x264_predict_8x8c_p_c, predict.c:289-318)
    w = jnp.arange(1, 5, dtype=jnp.int32)
    top_ext = jnp.concatenate([topleft[..., None], top], axis=-1)
    left_ext = jnp.concatenate([topleft[..., None], left], axis=-1)
    H = (w * (top_ext[..., 5:9] - jnp.flip(top_ext[..., 0:4], -1))).sum(-1)
    V = (w * (left_ext[..., 5:9] - jnp.flip(left_ext[..., 0:4], -1))).sum(-1)
    a = 16 * (left[..., 7] + top[..., 7])
    b = (17 * H + 16) >> 5
    c = (17 * V + 16) >> 5
    i00 = a - 3 * b - 3 * c + 16
    xs = jnp.arange(8, dtype=jnp.int32)
    plane = (i00[..., None, None]
             + b[..., None, None] * xs[None, :]
             + c[..., None, None] * xs[:, None]) >> 5
    plane = jnp.clip(plane, 0, 255)
    return jnp.stack([dc, h, v, plane, dcl, dct_, dc128], axis=-3)


# --- 4x4: closed-form index matrices per directional mode -------------------
# Each directional predictor is a gather over the 13-neighbor vector
# n = [l3,l2,l1,l0, lt, t0..t3, t4..t7] (index 0..12) with F1/F2 filters.
# We express each mode as out = f(filtered neighbor sequences).

def predict_4x4_all(left, top, topleft, topright):
    """left/top/topright: (..., 4), topleft: (...,) → (..., 12, 4, 4).

    topright must already be patched for unavailability (replicate top[3],
    encoder/macroblock.c:371-373 / analyse.c i4x4 loop)."""
    l = _i32(left)
    t = _i32(top)
    lt = _i32(topleft)
    tr = _i32(topright)
    B = l.shape[:-1]
    ones = jnp.ones(B + (4, 4), jnp.int32)
    l0, l1, l2, l3 = (l[..., i] for i in range(4))
    t0, t1, t2, t3 = (t[..., i] for i in range(4))
    t4, t5, t6, t7 = (tr[..., i] for i in range(4))

    def F1(a, b):
        return (a + b + 1) >> 1

    def F2(a, b, c):
        return (a + 2 * b + c + 2) >> 2

    def grid(rows):
        # rows: list of 4 lists of 4 scalars (..., ) → (..., 4, 4)
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    v = jnp.broadcast_to(t[..., None, :], B + (4, 4))
    h = jnp.broadcast_to(l[..., :, None], B + (4, 4))
    dc = ((l0 + l1 + l2 + l3 + t0 + t1 + t2 + t3 + 4) >> 3)[..., None, None] * ones
    dcl = ((l0 + l1 + l2 + l3 + 2) >> 2)[..., None, None] * ones
    dct_ = ((t0 + t1 + t2 + t3 + 2) >> 2)[..., None, None] * ones
    dc128 = 128 * ones

    # DDL (predict.c:385-395)
    f01 = F2(t0, t1, t2)
    f12 = F2(t1, t2, t3)
    f23 = F2(t2, t3, t4)
    f34 = F2(t3, t4, t5)
    f45 = F2(t4, t5, t6)
    f56 = F2(t5, t6, t7)
    f67 = F2(t6, t7, t7)
    ddl = grid([[f01, f12, f23, f34],
                [f12, f23, f34, f45],
                [f23, f34, f45, f56],
                [f34, f45, f56, f67]])

    # DDR (predict.c:396-408)
    a3 = F2(t3, t2, t1)
    a2 = F2(t2, t1, t0)
    a1 = F2(t1, t0, lt)
    a0 = F2(t0, lt, l0)
    b1 = F2(lt, l0, l1)
    b2 = F2(l0, l1, l2)
    b3 = F2(l1, l2, l3)
    ddr = grid([[a0, a1, a2, a3],
                [b1, a0, a1, a2],
                [b2, b1, a0, a1],
                [b3, b2, b1, a0]])

    # VR (predict.c:410-424)
    vr_l2 = F2(l2, l1, l0)
    vr_l1 = F2(l1, l0, lt)
    vr_l0 = F2(l0, lt, t0)
    g0 = F1(lt, t0)
    g1 = F1(t0, t1)
    g2 = F1(t1, t2)
    g3 = F1(t2, t3)
    e1 = F2(lt, t0, t1)
    e2 = F2(t0, t1, t2)
    e3 = F2(t1, t2, t3)
    vr = grid([[g0, g1, g2, g3],
               [vr_l0, e1, e2, e3],
               [vr_l1, g0, g1, g2],
               [vr_l2, vr_l0, e1, e2]])

    # HD (predict.c:426-439)
    hd_0 = F1(lt, l0)
    hd_1 = F2(t0, lt, l0)
    hd_2 = F2(t1, t0, lt)
    hd_3 = F2(t2, t1, t0)
    p0 = F1(l0, l1)
    p1 = F2(lt, l0, l1)
    q0 = F1(l1, l2)
    q1 = F2(l0, l1, l2)
    r0 = F1(l2, l3)
    r1 = F2(l1, l2, l3)
    hd = grid([[hd_0, hd_1, hd_2, hd_3],
               [p0, p1, hd_0, hd_1],
               [q0, q1, p0, p1],
               [r0, r1, q0, q1]])

    # VL (predict.c:441-455)
    u0 = F1(t0, t1)
    u1 = F1(t1, t2)
    u2 = F1(t2, t3)
    u3 = F1(t3, t4)
    u4 = F1(t4, t5)
    w0 = F2(t0, t1, t2)
    w1 = F2(t1, t2, t3)
    w2 = F2(t2, t3, t4)
    w3 = F2(t3, t4, t5)
    w4 = F2(t4, t5, t6)
    vl = grid([[u0, u1, u2, u3],
               [w0, w1, w2, w3],
               [u1, u2, u3, u4],
               [w1, w2, w3, w4]])

    # HU (predict.c:457-470)
    s0 = F1(l0, l1)
    s1 = F2(l0, l1, l2)
    s2 = F1(l1, l2)
    s3 = F2(l1, l2, l3)
    s4 = F1(l2, l3)
    s5 = F2(l2, l3, l3)
    hu = grid([[s0, s1, s2, s3],
               [s2, s3, s4, s5],
               [s4, s5, l3, l3],
               [l3, l3, l3, l3]])

    return jnp.stack([v, h, dc, ddl, ddr, vr, hd, vl, hu, dcl, dct_, dc128],
                     axis=-3)
