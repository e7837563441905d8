"""Pallas kernel: in-loop deblock edge filtering of gathered MB regions.

The wavefront in ops/deblock.py gathers one 20x20 luma (12x12 chroma)
region per MB on a diagonal, then applies 8 luma + 4 chroma sequential
edge filters. As XLA ops that filter chain is ~100 small elementwise
kernels per wavefront step (~110 ms/frame of pure dispatch at 1080p).
This kernel runs the whole chain as one program: all K regions sit in
VMEM with K on the sublane axis, the 12 edges are straight-line vector
code, and per-edge tc0/enable/intra-select inputs are precomputed
per-row lanes by the caller.

Semantics are identical to deblock.c:80-295 (the jnp filter math is
shared with ops/deblock.py — see _filter_normal_luma etc. there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..deblock import (_filter_intra_chroma, _filter_intra_luma,
                       _filter_normal_chroma, _filter_normal_luma)


def _kernel(y_ref, c_ref, tc0y_ref, tcc_ref, eny_ref, uiy_ref,
            enc_ref, uic_ref, aly_ref, bly_ref, alc_ref, blc_ref,
            oy_ref, oc_ref):
    # Mosaic has no scatter; sequential edges are in-ref read-modify-write
    # with static slice offsets (supported for any static offset).
    # Blocks are KB MBs (grid-tiled so VMEM stays small and vmap over a
    # stream batch just extends the grid); chroma rows are interleaved
    # per MB (u, v) so a block of MBs is contiguous.
    oy_ref[...] = y_ref[...]          # (KB, 20, 20)
    oc_ref[...] = c_ref[...]          # (2*KB, 12, 12)
    tc0y = tc0y_ref[...]     # (K, 128) = (dir, edge, row)
    tcc = tcc_ref[...]       # (2K, 32) = (dir, edge, row)
    eny = eny_ref[...]       # (K, 8)   = (dir, edge)
    uiy = uiy_ref[...]
    enc = enc_ref[...]       # (2K, 4)
    uic = uic_ref[...]
    aly = aly_ref[...]       # (K, 8) per-edge alpha (neighbour-QP avg)
    bly = bly_ref[...]       # (K, 8) per-edge beta
    alc = alc_ref[...]       # (2K, 4)
    blc = blc_ref[...]       # (2K, 4)

    def luma_edge(d, e):
        if d == 0:  # vertical edge at column c
            c = 4 + e * 4
            blk = oy_ref[:, 4:20, c - 4:c + 4]                # (K, 16, 8)
            cols = [blk[:, :, i] for i in range(8)]
        else:       # horizontal edge at row r
            r = 4 + e * 4
            blk = oy_ref[:, r - 4:r + 4, 4:20]                # (K, 8, 16)
            cols = [blk[:, i, :] for i in range(8)]
        p3, p2, p1, p0, q0, q1, q2, q3 = cols
        tc0 = tc0y[:, d * 64 + e * 16:d * 64 + e * 16 + 16]   # (K, 16)
        en = (eny[:, d * 4 + e:d * 4 + e + 1] != 0)           # (K, 1)
        ui = (uiy[:, d * 4 + e:d * 4 + e + 1] != 0)
        alpha = aly[:, d * 4 + e:d * 4 + e + 1]               # (K, 1)
        beta = bly[:, d * 4 + e:d * 4 + e + 1]
        p1n, p0n, q0n, q1n = _filter_normal_luma(
            p3, p2, p1, p0, q0, q1, q2, q3, alpha, beta, tc0)
        p2i, p1i, p0i, q0i, q1i, q2i = _filter_intra_luma(
            p3, p2, p1, p0, q0, q1, q2, q3, alpha, beta)
        outs = [jnp.where(ui, p2i, p2), jnp.where(ui, p1i, p1n),
                jnp.where(ui, p0i, p0n), jnp.where(ui, q0i, q0n),
                jnp.where(ui, q1i, q1n), jnp.where(ui, q2i, q2)]
        olds = [p2, p1, p0, q0, q1, q2]
        outs = [jnp.where(en, o, old) for o, old in zip(outs, olds)]
        if d == 0:
            oy_ref[:, 4:20, c - 3:c + 3] = jnp.stack(outs, axis=2)
        else:
            oy_ref[:, r - 3:r + 3, 4:20] = jnp.stack(outs, axis=1)

    def chroma_edge(d, e):
        if d == 0:
            c = 4 + e * 4
            blk = oc_ref[:, 4:12, c - 2:c + 2]                # (2K, 8, 4)
            p1, p0, q0, q1 = [blk[:, :, i] for i in range(4)]
        else:
            r = 4 + e * 4
            blk = oc_ref[:, r - 2:r + 2, 4:12]                # (2K, 4, 8)
            p1, p0, q0, q1 = [blk[:, i, :] for i in range(4)]
        tc = tcc[:, d * 16 + e * 8:d * 16 + e * 8 + 8]        # (2K, 8)
        en = (enc[:, d * 2 + e:d * 2 + e + 1] != 0)
        ui = (uic[:, d * 2 + e:d * 2 + e + 1] != 0)
        alphac = alc[:, d * 2 + e:d * 2 + e + 1]              # (2K, 1)
        betac = blc[:, d * 2 + e:d * 2 + e + 1]
        p0n, q0n = _filter_normal_chroma(p1, p0, q0, q1, alphac, betac, tc)
        p0i, q0i = _filter_intra_chroma(p1, p0, q0, q1, alphac, betac)
        p0o = jnp.where(en, jnp.where(ui, p0i, p0n), p0)
        q0o = jnp.where(en, jnp.where(ui, q0i, q0n), q0)
        if d == 0:
            oc_ref[:, 4:12, c - 1:c + 1] = jnp.stack([p0o, q0o], axis=2)
        else:
            oc_ref[:, r - 1:r + 1, 4:12] = jnp.stack([p0o, q0o], axis=1)

    # x264_frame_deblock_row order: all vertical, then all horizontal
    for e in range(4):
        luma_edge(0, e)
    for e in range(4):
        luma_edge(1, e)
    for e in range(2):
        chroma_edge(0, e)
    for e in range(2):
        chroma_edge(1, e)


KB = 16  # MBs per grid block (VMEM-safe even under a stream-batch vmap)


@functools.partial(jax.jit, static_argnames=("interpret",))
def filter_regions(regy, regc, tc0y, tcc, eny, uiy, enc, uic,
                   aly, bly, alc, blc, interpret: bool = False):
    """regy: (K,20,20) i32, regc: (2K,12,12) i32 with chroma rows
    interleaved per MB (u then v); per-edge lanes as documented in
    _kernel (aly/bly: (K,8) per-edge luma alpha/beta, alc/blc: (2K,4)
    chroma — per-MB QP support). K must be a multiple of KB (caller pads
    with zero regions and zero enable masks). Returns (regy', regc')."""
    K = regy.shape[0]
    assert K % KB == 0, K
    blk = lambda s: pl.BlockSpec(s, lambda i: (i,) + (0,) * (len(s) - 1),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(K // KB,),
        in_specs=[blk((KB, 20, 20)), blk((2 * KB, 12, 12)),
                  blk((KB, 128)), blk((2 * KB, 32)),
                  blk((KB, 8)), blk((KB, 8)),
                  blk((2 * KB, 4)), blk((2 * KB, 4)),
                  blk((KB, 8)), blk((KB, 8)),
                  blk((2 * KB, 4)), blk((2 * KB, 4))],
        out_specs=[blk((KB, 20, 20)), blk((2 * KB, 12, 12))],
        out_shape=[jax.ShapeDtypeStruct((K, 20, 20), jnp.int32),
                   jax.ShapeDtypeStruct((2 * K, 12, 12), jnp.int32)],
        interpret=interpret,
    )(regy, regc, tc0y, tcc, eny, uiy, enc, uic, aly, bly, alc, blc)
