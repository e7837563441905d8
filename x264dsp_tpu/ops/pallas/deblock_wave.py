"""Whole-frame wavefront deblock in ONE Pallas call.

The XLA wavefront in ops/deblock.py dispatches ~(mb_w + 2 mb_h) kernel
rounds per frame; at 1080p that is ~190 sequential launches whose fixed
cost dominates (56 ms). Here the whole wavefront runs inside a single
kernel: the plane stays resident in VMEM across all diagonals (9 MB at
1080p), each slot's 20x20 (12x12 chroma) region is gathered from a
128-aligned 256-wide superwindow with a one-hot column matmul (TPU has
no unaligned dynamic lane slicing; rows ARE dynamically sliceable since
16y/8y is 8-aligned), filtered with the shared edge math from
ops/deblock.py, and scattered back as a delta through the transposed
one-hot. Per-diagonal filter lanes (tc0/alpha/beta/enables) are
precomputed for ALL diagonals by the caller and pipelined via BlockSpec.

Semantics identical to deblock.c:80-295 + x264_frame_deblock_row order
(:341-430); bit-exactness vs the golden model is test-enforced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..deblock import (_filter_intra_chroma, _filter_intra_luma,
                       _filter_normal_chroma, _filter_normal_luma)

SUPER = 256   # aligned column superwindow (128-aligned base + <=148 used)


def _slot_geom(d, k, mb_w: int, mb_h: int):
    """Slot k of 2:1 diagonal d (x + 2y == d): y = y0 + k."""
    y0 = jnp.maximum(0, (d - (mb_w - 1) + 1) // 2)
    y = y0 + k
    x = d - 2 * y
    valid = (y < mb_h) & (x >= 0)
    return jnp.minimum(y, mb_h - 1), jnp.clip(x, 0, mb_w - 1), valid


def _onehot_cols(off, n_sel: int):
    """(SUPER, n_sel) bf16 with [c, j] = (c == off + j)."""
    c = jax.lax.broadcasted_iota(jnp.int32, (SUPER, n_sel), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (SUPER, n_sel), 1)
    return (c == off + j).astype(jnp.bfloat16)



def _shift_mat(n_in: int, n_out: int):
    """(n_in, n_out) bf16 one-hot P[i, i+4] = 1, built from iota (pallas
    kernels cannot capture array constants)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 1)
    return (j == i + 4).astype(jnp.bfloat16)


def _row_place16(x16):
    """(K, 16) per-edge lanes -> (K, 20) aligned to plane rows 4..20,
    via a one-hot matmul (no pad/concat — Mosaic rejects misaligned
    lane concats)."""
    return jnp.dot(x16.astype(jnp.bfloat16), _shift_mat(16, 20),
                   preferred_element_type=jnp.float32).astype(jnp.int32)


def _span(n: int):
    """(1, n) bool mask of plane positions 4..n (the filtered span)."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) >= 4


def _hot(n: int, i: int):
    """(n,) int32 one-hot from iota."""
    return (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
            == i).astype(jnp.int32)


def _filter_luma_regs(regs, tc0y, eny, uiy, aly, bly):
    """The 8-edge luma chain on (K, 20, 20) regions. Every update is a
    full-length column/row filter (pad lanes masked by the static span)
    plus an additive one-hot placement — no slice assignment, no
    concat: Mosaic supports neither scatter nor misaligned concats."""
    span = _span(20)

    def luma_edge(regs, d, e):
        c = 4 + e * 4
        if d == 0:
            cols = [regs[:, :, c - 4 + i] for i in range(8)]   # (K, 20)
        else:
            cols = [regs[:, c - 4 + i, :] for i in range(8)]
        p3, p2, p1, p0, q0, q1, q2, q3 = cols
        tc0 = _row_place16(tc0y[:, d * 64 + e * 16:d * 64 + e * 16 + 16])
        en = (eny[:, d * 4 + e:d * 4 + e + 1] != 0)
        ui = (uiy[:, d * 4 + e:d * 4 + e + 1] != 0)
        alpha = aly[:, d * 4 + e:d * 4 + e + 1]
        beta = bly[:, d * 4 + e:d * 4 + e + 1]
        p1n, p0n, q0n, q1n = _filter_normal_luma(
            p3, p2, p1, p0, q0, q1, q2, q3, alpha, beta, tc0)
        p2i, p1i, p0i, q0i, q1i, q2i = _filter_intra_luma(
            p3, p2, p1, p0, q0, q1, q2, q3, alpha, beta)
        outs = [jnp.where(ui, p2i, p2), jnp.where(ui, p1i, p1n),
                jnp.where(ui, p0i, p0n), jnp.where(ui, q0i, q0n),
                jnp.where(ui, q1i, q1n), jnp.where(ui, q2i, q2)]
        olds = [p2, p1, p0, q0, q1, q2]
        deltas = [jnp.where(en & span, o, old) - old
                  for o, old in zip(outs, olds)]
        upd = regs
        for i, dl in enumerate(deltas):
            hot = _hot(20, c - 3 + i)
            if d == 0:
                upd = upd + dl[:, :, None] * hot[None, None, :]
            else:
                upd = upd + dl[:, None, :] * hot[None, :, None]
        return upd

    for e in range(4):
        regs = luma_edge(regs, 0, e)
    for e in range(4):
        regs = luma_edge(regs, 1, e)
    return regs


def _filter_chroma_regs(regs, tcc, enc, uic, alc, blc):
    """The 4-edge chroma chain on (2K, 12, 12) regions (same placement
    scheme as the luma chain)."""
    span = _span(12)

    def chroma_edge(regs, d, e):
        c = 4 + e * 4
        if d == 0:
            p1, p0, q0, q1 = [regs[:, :, c - 2 + i] for i in range(4)]
        else:
            p1, p0, q0, q1 = [regs[:, c - 2 + i, :] for i in range(4)]
        tc8 = tcc[:, d * 16 + e * 8:d * 16 + e * 8 + 8]
        tc = jnp.dot(tc8.astype(jnp.bfloat16), _shift_mat(8, 12),
                     preferred_element_type=jnp.float32).astype(jnp.int32)
        en = (enc[:, d * 2 + e:d * 2 + e + 1] != 0)
        ui = (uic[:, d * 2 + e:d * 2 + e + 1] != 0)
        alpha = alc[:, d * 2 + e:d * 2 + e + 1]
        beta = blc[:, d * 2 + e:d * 2 + e + 1]
        p0n, q0n = _filter_normal_chroma(p1, p0, q0, q1, alpha, beta, tc)
        p0i, q0i = _filter_intra_chroma(p1, p0, q0, q1, alpha, beta)
        d0 = jnp.where(en & span, jnp.where(ui, p0i, p0n), p0) - p0
        d1 = jnp.where(en & span, jnp.where(ui, q0i, q0n), q0) - q0
        h0 = _hot(12, c - 1)
        h1 = _hot(12, c)
        if d == 0:
            return (regs + d0[:, :, None] * h0[None, None, :]
                    + d1[:, :, None] * h1[None, None, :])
        return (regs + d0[:, None, :] * h0[None, :, None]
                + d1[:, None, :] * h1[None, :, None])

    regs = chroma_edge(regs, 0, 0)
    regs = chroma_edge(regs, 0, 1)
    regs = chroma_edge(regs, 1, 0)
    regs = chroma_edge(regs, 1, 1)
    return regs


def _luma_kernel(mb_w: int, mb_h: int, K: int, U: int,
                 yin_ref, tc0_ref, en_ref, ui_ref, al_ref, bl_ref,
                 yout_ref, sem):
    s_idx = pl.program_id(0)   # stream (batch) axis
    dblk = pl.program_id(1)    # block of U consecutive wavefront diagonals

    @pl.when(dblk == 0)
    def _init():
        dma = pltpu.make_async_copy(yin_ref.at[s_idx], yout_ref.at[0],
                                    sem)
        dma.start()
        dma.wait()

    # U diagonals per grid step, processed IN ORDER (diagonal d+1 reads
    # pixels diagonal d just wrote) — identical semantics, ~U× fewer
    # grid steps of fixed scheduling overhead on the latency-bound
    # wavefront
    for u in range(U):
        d = dblk * U + u
        # ---- gather slot regions (one-hot column select on the MXU) ----
        regs = []
        geoms = []
        for k in range(K):
            y, x, _ = _slot_geom(d, k, mb_w, mb_h)
            row = pl.multiple_of(16 * y, 8)
            col0 = 16 * x
            base = pl.multiple_of((col0 // 128) * 128, 128)
            off = col0 - base
            win = yout_ref[0, pl.ds(row, 20), pl.ds(base, SUPER)]
            Bk = _onehot_cols(off, 20)
            reg = jnp.dot(win.astype(jnp.bfloat16), Bk,
                          preferred_element_type=jnp.float32)
            regs.append(reg.astype(jnp.int32))
            geoms.append((row, base, Bk))
        regs_old = jnp.stack(regs)                   # (K, 20, 20)

        regs_new = _filter_luma_regs(regs_old, tc0_ref[0, u],
                                     en_ref[0, u], ui_ref[0, u],
                                     al_ref[0, u], bl_ref[0, u])

        # ---- scatter deltas back (regions on a diagonal are disjoint) ----
        # bf16 is exact here and in every dot in this kernel: pixels and
        # filter deltas are in [-255, 255] and tc0 <= 25, all within
        # bf16's 8-bit significand, and accumulation is f32
        delta = (regs_new - regs_old).astype(jnp.bfloat16)
        for k in range(K):
            row, base, Bk = geoms[k]
            wide = jnp.dot(Bk, delta[k].T,
                           preferred_element_type=jnp.float32)
            cur = yout_ref[0, pl.ds(row, 20), pl.ds(base, SUPER)]
            yout_ref[0, pl.ds(row, 20), pl.ds(base, SUPER)] = (
                cur + wide.T.astype(jnp.int32))


def _chroma_kernel(mb_w: int, mb_h: int, K: int, U: int,
                   cin_ref, tcc_ref, enc_ref, uic_ref, alc_ref, blc_ref,
                   cout_ref, sem):
    s_idx = pl.program_id(0)   # stream (batch) axis
    dblk = pl.program_id(1)    # block of U consecutive diagonals

    @pl.when(dblk == 0)
    def _init():
        dma = pltpu.make_async_copy(cin_ref.at[s_idx], cout_ref.at[0],
                                    sem)
        dma.start()
        dma.wait()

    for u in range(U):
        d = dblk * U + u
        regs = []
        geoms = []
        for k in range(K):
            y, x, _ = _slot_geom(d, k, mb_w, mb_h)
            row = pl.multiple_of(8 * y, 8)
            col0 = 8 * x
            base = pl.multiple_of((col0 // 128) * 128, 128)
            off = col0 - base
            Bk = _onehot_cols(off, 12)
            for ch in range(2):
                win = cout_ref[0, ch, pl.ds(row, 12), pl.ds(base, SUPER)]
                reg = jnp.dot(win.astype(jnp.bfloat16), Bk,
                              preferred_element_type=jnp.float32)
                regs.append(reg.astype(jnp.int32))
            geoms.append((row, base, Bk))
        regs_old = jnp.stack(regs)                   # (2K, 12, 12)

        regs_new = _filter_chroma_regs(regs_old, tcc_ref[0, u],
                                       enc_ref[0, u], uic_ref[0, u],
                                       alc_ref[0, u], blc_ref[0, u])

        delta = (regs_new - regs_old).astype(jnp.bfloat16)
        for k in range(K):
            row, base, Bk = geoms[k]
            for ch in range(2):
                wide = jnp.dot(Bk, delta[2 * k + ch].T,
                               preferred_element_type=jnp.float32)
                cur = cout_ref[0, ch, pl.ds(row, 12), pl.ds(base, SUPER)]
                cout_ref[0, ch, pl.ds(row, 12), pl.ds(base, SUPER)] = (
                    cur + wide.T.astype(jnp.int32))


def _plane_dims(mb_w: int, size: int):
    w0 = size * mb_w + 8
    base_max = ((size * (mb_w - 1)) // 128) * 128
    return max(w0, base_max + SUPER)


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "interpret",
                                              "unroll"))
def deblock_wave_luma(y, tc0y, eny, uiy, aly, bly, mb_w: int, mb_h: int,
                      interpret: bool = False, unroll: int = 2):
    """y: (S, 16mb_h, 16mb_w) int32 recon planes (leading stream axis).
    Lane tensors: (S, n_diag, K, ...) per-diagonal per-slot filter params
    (layouts as in ops/pallas/deblock_filter.py). Returns the filtered
    planes. unroll: diagonals per grid step (the lane tensors are padded
    with en=0 no-op diagonals to a multiple)."""
    S, n_diag, K = eny.shape[:3]
    U = max(1, min(unroll, n_diag))
    pad_d = (-n_diag) % U
    if pad_d:
        padl = lambda t: jnp.pad(t, ((0, 0), (0, pad_d)) + ((0, 0),)
                                 * (t.ndim - 2))
        tc0y, eny, uiy, aly, bly = map(padl, (tc0y, eny, uiy, aly, bly))
        n_diag += pad_d
    Wp = _plane_dims(mb_w, 16)
    yp = jnp.pad(y.astype(jnp.int32),
                 ((0, 0), (4, 4), (4, Wp - 4 - 16 * mb_w)))
    kernel = functools.partial(_luma_kernel, mb_w, mb_h, K, U)
    blk = lambda shp: pl.BlockSpec(
        shp, lambda si, d: (si, d) + (0,) * (len(shp) - 2),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(S, n_diag // U),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  blk((1, U, K, 128)), blk((1, U, K, 8)),
                  blk((1, U, K, 8)), blk((1, U, K, 8)),
                  blk((1, U, K, 8))],
        out_specs=pl.BlockSpec((1,) + yp.shape[1:],
                               lambda si, d: (si, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(yp.shape, jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yp, tc0y, eny, uiy, aly, bly)
    return out[:, 4:4 + 16 * mb_h, 4:4 + 16 * mb_w]


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "interpret",
                                              "unroll"))
def deblock_wave_chroma(u, v, tcc, enc, uic, alc, blc,
                        mb_w: int, mb_h: int, interpret: bool = False,
                        unroll: int = 2):
    """u/v: (S, 8mb_h, 8mb_w) int32 (leading stream axis). Chroma lane
    tensors interleave (u, v) per slot: (S, n_diag, 2K, ...). Returns
    filtered (u, v). unroll: diagonals per grid step."""
    S, n_diag, K2 = enc.shape[:3]
    K = K2 // 2
    U = max(1, min(unroll, n_diag))
    pad_d = (-n_diag) % U
    if pad_d:
        padl = lambda t: jnp.pad(t, ((0, 0), (0, pad_d)) + ((0, 0),)
                                 * (t.ndim - 2))
        tcc, enc, uic, alc, blc = map(padl, (tcc, enc, uic, alc, blc))
        n_diag += pad_d
    Wp = _plane_dims(mb_w, 8)
    padw = ((0, 0), (4, 4), (4, Wp - 4 - 8 * mb_w))
    cp = jnp.stack([jnp.pad(u.astype(jnp.int32), padw),
                    jnp.pad(v.astype(jnp.int32), padw)], axis=1)
    kernel = functools.partial(_chroma_kernel, mb_w, mb_h, K, U)
    blk = lambda shp: pl.BlockSpec(
        shp, lambda si, d: (si, d) + (0,) * (len(shp) - 2),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(S, n_diag // U),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  blk((1, U, 2 * K, 32)), blk((1, U, 2 * K, 4)),
                  blk((1, U, 2 * K, 4)), blk((1, U, 2 * K, 4)),
                  blk((1, U, 2 * K, 4))],
        out_specs=pl.BlockSpec((1,) + cp.shape[1:],
                               lambda si, d: (si, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(cp.shape, jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cp, tcc, enc, uic, alc, blc)
    return (out[:, 0, 4:4 + 8 * mb_h, 4:4 + 8 * mb_w],
            out[:, 1, 4:4 + 8 * mb_h, 4:4 + 8 * mb_w])
