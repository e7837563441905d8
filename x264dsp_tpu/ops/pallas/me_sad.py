"""Pallas kernel: full-pel SAD cost surfaces for motion estimation.

Replaces the XLA formulation in encoder/inter_frame.fullpel_cost_surfaces
(which re-reads the reference plane from HBM once per offset — ~6.5 GB of
traffic per 1080p frame). Here each grid program pins one MB row's fenc
strip (16 x W) and its search window strip ((16+2R) x (W+2R)) in VMEM and
sweeps all (2R+1)^2 offsets on the VPU, writing the (mb_w, 2R+1, 2R+1)
cost tile. HBM traffic drops to one read of each strip.

This is the pixel-a.sa sad_x4/ESA role on TPU (SURVEY §2.5/§7.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(R: int, mb_w: int, f_ref, r_ref, o_ref):
    W = mb_w * 16
    n = 2 * R + 1
    f = f_ref[0]  # (16, W)

    # 8-column segment sums as a matmul with a 0/1 selection matrix (the
    # (W,)→(2*mb_w,8) reshape isn't lowerable in Mosaic; the MXU does this
    # for free, and values < 2^17 are exact in f32). 8-granularity gives
    # the four 8x8 quadrant SADs per MB — the P partition cost surfaces
    # (16x16/16x8/8x16 are quadrant sums).
    col = jax.lax.broadcasted_iota(jnp.int32, (W, 2 * mb_w), 0)
    mbi = jax.lax.broadcasted_iota(jnp.int32, (W, 2 * mb_w), 1)
    sel = ((col >> 3) == mbi).astype(jnp.bfloat16)

    # The dy sweep is a fori_loop INSIDE the kernel (as a grid dimension
    # it multiplied the program count by 2R+1 — at 1080p x 8 streams
    # ~18k programs whose fixed launch overhead dominated the measured
    # 90 ms/batch); dynamic sublane starts must be 8-aligned, so the
    # 16-row window at offset dy comes from a dynamic sublane rotate.
    # The dx sweep stays unrolled: lane offsets can't be dynamic, and
    # the compiler lowers the misaligned static slices to vector shifts.
    def body(dy, _):
        rows = pltpu.roll(r_ref[0], (16 + 2 * R) - dy, axis=0)[:16]
        halves = []
        for dx in range(n):
            win = rows[:, dx:dx + W]
            ad = jnp.abs(f - win)            # (16, W) int32
            halves.append(ad[:8].sum(axis=0, keepdims=True))
            halves.append(ad[8:].sum(axis=0, keepdims=True))
        # ONE (4n, W) @ (W, 2mb_w) matmul for the whole dx sweep: a
        # 2-row lhs uses 2/128 of the MXU's systolic rows, 132 rows use
        # ~full. The 8-row sums reach 8*255 = 2040 > 2^8, which bf16's
        # 8-bit significand can't hold, so the lhs is split into hi/lo
        # bytes (both <= 255, exactly representable): two stacked
        # single-pass bf16 dots with f32 accumulation are bit-exact and
        # 3x cheaper on the MXU than a Precision.HIGHEST (6-pass) dot.
        stacked = jnp.concatenate(halves, axis=0)      # (2n, W) int32
        hilo = jnp.concatenate([stacked >> 8, stacked & 0xFF],
                               axis=0).astype(jnp.bfloat16)
        out = jnp.dot(hilo, sel, preferred_element_type=jnp.float32)
        tile = out[:2 * n] * 256.0 + out[2 * n:]
        o_ref[0, dy] = tile.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "R",
                                             "interpret"))
def sad_cost_surfaces_8x8(fenc_y, ref_strips, mb_w: int, mb_h: int, R: int,
                          interpret: bool = False):
    """Quadrant SAD surfaces: fenc_y (mb_h*16, mb_w*16) int32; ref_strips
    (mb_h, 16+2R, mb_w*16+2R) int32. Returns
    (mb_h, mb_w, 2, 2, 2R+1, 2R+1) int32 — per-MB 8x8 quadrant SADs
    [qy][qx] at every fullpel offset."""
    W = mb_w * 16
    n = 2 * R + 1
    kernel = functools.partial(_kernel, R, mb_w)
    out = pl.pallas_call(
        kernel,
        grid=(mb_h,),
        in_specs=[
            pl.BlockSpec((1, 16, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16 + 2 * R, W + 2 * R),
                         lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, n * 2, 2 * mb_w),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mb_h, n, n * 2, 2 * mb_w),
                                       jnp.int32),
        interpret=interpret,
    )(fenc_y.reshape(mb_h, 16, W), ref_strips)
    # (mb_h, n*n, qy, mb_w, qx) -> (mb_h, mb_w, qy, qx, n, n)
    out = out.reshape(mb_h, n * n, 2, mb_w, 2)
    return out.transpose(0, 3, 2, 4, 1).reshape(mb_h, mb_w, 2, 2, n, n)


def _kernel16(R: int, mb_w: int, f_ref, r_ref, o_ref):
    """16x16-summed variant of _kernel: accumulates the whole-MB SAD in
    one 16-row column sum + one (2n, W) @ (W, mb_w) hi/lo-byte dot per
    dy. Used by the no-partitions DIA/HEX path, where the walk only ever
    reads the 16x16 surface — writing the 4x bigger quadrant tensor to
    HBM (and summing it back) was ~40% of the P step's surface cost."""
    W = mb_w * 16
    n = 2 * R + 1
    f = f_ref[0]  # (16, W)

    col = jax.lax.broadcasted_iota(jnp.int32, (W, mb_w), 0)
    mbi = jax.lax.broadcasted_iota(jnp.int32, (W, mb_w), 1)
    sel = ((col >> 4) == mbi).astype(jnp.bfloat16)

    def body(dy, _):
        rows = pltpu.roll(r_ref[0], (16 + 2 * R) - dy, axis=0)[:16]
        sums = []
        for dx in range(n):
            win = rows[:, dx:dx + W]
            ad = jnp.abs(f - win)            # (16, W) int32
            sums.append(ad.sum(axis=0, keepdims=True))
        # 16-row sums reach 16*255 = 4080 > 2^8: hi/lo-byte split keeps
        # the bf16 dots exact (see _kernel)
        stacked = jnp.concatenate(sums, axis=0)        # (n, W) int32
        hilo = jnp.concatenate([stacked >> 8, stacked & 0xFF],
                               axis=0).astype(jnp.bfloat16)
        out = jnp.dot(hilo, sel, preferred_element_type=jnp.float32)
        o_ref[0, dy] = (out[:n] * 256.0 + out[n:]).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "R",
                                             "interpret"))
def sad_cost_surface16_lanes(fenc_y, ref_strips, mb_w: int, mb_h: int,
                             R: int, interpret: bool = False):
    """Whole-MB 16x16 SAD surfaces in LANE layout: fenc_y (mb_h*16,
    mb_w*16) int32; ref_strips (mb_h, 16+2R, mb_w*16+2R) int32. Returns
    (mb_h, 2R+1, 2R+1, mb_w) int32 — [row, dy, dx, mbx]. Consumers that
    want the classic (mb_h, mb_w, n, n) layout transpose (35 MB at
    1080p); the pattern-walk path reads this layout directly."""
    W = mb_w * 16
    n = 2 * R + 1
    kernel = functools.partial(_kernel16, R, mb_w)
    return pl.pallas_call(
        kernel,
        grid=(mb_h,),
        in_specs=[
            pl.BlockSpec((1, 16, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16 + 2 * R, W + 2 * R),
                         lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, n, mb_w),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mb_h, n, n, mb_w), jnp.int32),
        interpret=interpret,
    )(fenc_y.reshape(mb_h, 16, W), ref_strips)


def sad_cost_surfaces(fenc_y, ref_strips, mb_w: int, mb_h: int, R: int,
                      interpret: bool = False):
    """16x16 SAD surfaces (sum of the quadrant surfaces). Returns
    (mb_h, mb_w, 2R+1, 2R+1) int32."""
    q = sad_cost_surfaces_8x8(fenc_y, ref_strips, mb_w, mb_h, R,
                              interpret=interpret)
    return q.sum(axis=(2, 3))


def make_ref_strips(ref_full_pad, pad: int, mb_w: int, mb_h: int, R: int):
    """Gather per-MB-row search-window strips from the padded full-pel
    reference plane: strip i covers rows i*16 - R .. i*16 + 15 + R."""
    W = mb_w * 16
    idx = jnp.arange(mb_h) * 16 + pad - R

    def one(i0):
        return jax.lax.dynamic_slice(ref_full_pad, (i0, pad - R),
                                     (16 + 2 * R, W + 2 * R))
    return jax.vmap(one)(idx)
