"""Motion compensation kernels — TPU replacement for mc-a.sa.

Follows common/mc.c exactly:
- hpel_filter (:144-167): 6-tap (1,-5,20,20,-5,1); H and V from source with
  (v+16)>>5 clip; the HV ("c") plane filters the UNCLIPPED vertical
  intermediate, (+512)>>10 (this is the reference's portable-C path, which
  the gcc oracle uses; the TI composition differs slightly).
- mc_luma / get_ref (:216-264): qpel by averaging two hpel-plane samples
  selected via hpel_ref0/1, with the +stride / +1 adjustments for the
  3-offsets.
- mc_chroma (:295-323): 1/8-pel bilinear, planar form (the reference's
  NV12 interleaving was a DSP layout optimization; we keep planes).
- frame_init_lowres (:404-460): half-res pyramid for lookahead.

All batched over leading dims; planes are edge-replicated padded (PAD_MC)
so out-of-frame reads match the spec's coordinate clamping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from ._lazyconst import LazyConst

PAD_MC = 32  # reference PADH/PADV (common/frame.h:9-10)

# qpel position → hpel plane selection (common/mc.c:192-193)
HPEL_REF0 = np.array([0, 1, 1, 1, 0, 1, 1, 1, 2, 3, 3, 3, 0, 1, 1, 1], np.int32)
HPEL_REF1 = np.array([0, 0, 0, 0, 2, 2, 3, 2, 2, 2, 3, 2, 2, 2, 3, 2], np.int32)


def _tap6(a, b, c, d, e, f):
    """(1,-5,20,20,-5,1) 6-tap."""
    return a + f - 5 * (b + e) + 20 * (c + d)


def hpel_filter(plane: jnp.ndarray):
    """Compute the H, V, HV half-pel planes of a (padded) plane.
    plane: (..., H, W) int32. Returns (h, v, c) same shape; the outer 3
    pixels of each edge are invalid (callers pad by >= PAD_MC)."""
    p = plane.astype(jnp.int32)
    z = jnp.zeros_like(p)

    def sh(arr, dy, dx):
        # shift with zero fill; only interior (3 px margin) is used
        out = jnp.roll(arr, (-dy, -dx), axis=(-2, -1))
        return out

    v_full = _tap6(sh(p, -2, 0), sh(p, -1, 0), p, sh(p, 1, 0),
                   sh(p, 2, 0), sh(p, 3, 0))
    v = jnp.clip((v_full + 16) >> 5, 0, 255)
    h_full = _tap6(sh(p, 0, -2), sh(p, 0, -1), p, sh(p, 0, 1),
                   sh(p, 0, 2), sh(p, 0, 3))
    h = jnp.clip((h_full + 16) >> 5, 0, 255)
    c_full = _tap6(sh(v_full, 0, -2), sh(v_full, 0, -1), v_full,
                   sh(v_full, 0, 1), sh(v_full, 0, 2), sh(v_full, 0, 3))
    c = jnp.clip((c_full + 512) >> 10, 0, 255)
    return h, v, c


@jax.jit
def make_ref_planes(recon: jnp.ndarray) -> jnp.ndarray:
    """Edge-replicate pad a reconstructed (deblocked) plane and build the
    4 luma planes [full, h, v, hv]: x264_frame_filter (common/mc.c:506).
    Jitted: the API path and the conformance decoder call it eagerly
    once per reference frame — unjitted it dispatched every pad/filter
    op as its own kernel launch (an RPC each on a remote-attached
    device)."""
    p = jnp.pad(recon.astype(jnp.int32),
                ((PAD_MC, PAD_MC), (PAD_MC, PAD_MC)), mode="edge")
    h, v, c = hpel_filter(p)
    return jnp.stack([p, h, v, c])


@jax.jit
def pad_chroma(recon: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(recon.astype(jnp.int32),
                   ((PAD_MC // 2, PAD_MC // 2), (PAD_MC // 2, PAD_MC // 2)),
                   mode="edge")


_HPEL_REF0_J = LazyConst(HPEL_REF0)
_HPEL_REF1_J = LazyConst(HPEL_REF1)


def mc_luma_block(ref4: jnp.ndarray, x0, y0, mvx, mvy, bw: int, bh: int):
    """Motion-compensated luma block (mc_luma, common/mc.c:216-240).
    ref4: (4, Hp, Wp) padded planes; (x0, y0): block position in unpadded
    coords; mv in qpel units. Returns (bh, bw) int32."""
    mvx = jnp.asarray(mvx, jnp.int32)
    mvy = jnp.asarray(mvy, jnp.int32)
    qidx = ((mvy & 3) << 2) + (mvx & 3)
    fy = y0 + PAD_MC + (mvy >> 2)
    fx = x0 + PAD_MC + (mvx >> 2)
    p0 = _HPEL_REF0_J[qidx]
    p1 = _HPEL_REF1_J[qidx]
    y1 = fy + ((mvy & 3) == 3).astype(jnp.int32)
    src1 = jax.lax.dynamic_slice(ref4, (p0, y1, fx), (1, bh, bw))[0]
    x2 = fx + ((mvx & 3) == 3).astype(jnp.int32)
    src2 = jax.lax.dynamic_slice(ref4, (p1, fy, x2), (1, bh, bw))[0]
    avg = (src1 + src2 + 1) >> 1
    return jnp.where((qidx & 5) != 0, avg, src1)


def mc_chroma_block(refc: jnp.ndarray, x0, y0, mvx, mvy, bw: int, bh: int):
    """1/8-pel bilinear chroma MC (mc_chroma, common/mc.c:295-323), planar.
    refc: (Hp, Wp) padded chroma plane; (x0, y0) unpadded block position;
    mv in chroma 1/8-pel units (= luma qpel values used directly)."""
    d8x = mvx & 7
    d8y = mvy & 7
    cA = (8 - d8x) * (8 - d8y)
    cB = d8x * (8 - d8y)
    cC = (8 - d8x) * d8y
    cD = d8x * d8y
    fy = y0 + PAD_MC // 2 + (mvy >> 3)
    fx = x0 + PAD_MC // 2 + (mvx >> 3)
    win = jax.lax.dynamic_slice(refc, (fy, fx), (bh + 1, bw + 1))
    s00 = win[0:bh, 0:bw]
    s01 = win[0:bh, 1:bw + 1]
    s10 = win[1:bh + 1, 0:bw]
    s11 = win[1:bh + 1, 1:bw + 1]
    return (cA * s00 + cB * s01 + cC * s10 + cD * s11 + 32) >> 6


def lowres_planes(plane: jnp.ndarray):
    """Half-res pyramid (frame_init_lowres_core, common/mc.c:433-460):
    4 phase-shifted half-res planes via the (avg,avg)→avg filter.
    plane: (H, W) with H, W even. Returns (4, H/2, W/2)."""
    p = plane.astype(jnp.int32)
    # replicate last row/col so interpolation needs no special case
    p = jnp.pad(p, ((0, 2), (0, 2)), mode="edge")

    def F(a, b, c, d):
        return (((a + b + 1) >> 1) + ((c + d + 1) >> 1) + 1) >> 1

    H, W = plane.shape
    s0 = p[0:H:2, :]
    s1 = p[1:H + 1:2, :]
    s2 = p[2:H + 2:2, :]
    x0 = slice(0, W, 2)
    x1 = slice(1, W + 1, 2)
    x2 = slice(2, W + 2, 2)
    dst0 = F(s0[:, x0], s1[:, x0], s0[:, x1], s1[:, x1])
    dsth = F(s0[:, x1], s1[:, x1], s0[:, x2], s1[:, x2])
    dstv = F(s1[:, x0], s2[:, x0], s1[:, x1], s2[:, x1])
    dstc = F(s1[:, x1], s2[:, x1], s1[:, x2], s2[:, x2])
    return jnp.stack([dst0, dsth, dstv, dstc])
