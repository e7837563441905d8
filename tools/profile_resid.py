"""Bisect encode_p_residual internals on the real chip."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/x264tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tputime import sync_time_ms, baseline

W, H = 1920, 1088
MB_W, MB_H = W // 16, H // 16
B = MB_W * MB_H
QP, QPC = 26, 26
NVAR = 4


def timeit(name, fn, argsets, n=5):
    dt = sync_time_ms(fn, argsets, n=n)
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    from x264dsp_tpu.encoder import inter_frame as IF
    from x264dsp_tpu.encoder.intra_frame import _optimize_chroma_dc
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops import mcgather as MG
    from x264dsp_tpu.ops import transforms as T

    rng = np.random.default_rng(0)
    print(f"roundtrip {baseline()*1e3:.1f} ms", file=sys.stderr)

    fys = [jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
           for _ in range(NVAR)]
    fus = [jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.uint8))
           for _ in range(NVAR)]
    fvs = [jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.uint8))
           for _ in range(NVAR)]
    ry = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    ref4 = jax.jit(MC.make_ref_planes)(ry)
    refu = jax.jit(MC.pad_chroma)(fus[0])
    refv = jax.jit(MC.pad_chroma)(fvs[0])
    wins4 = jax.jit(lambda r: MG.luma_windows(r, MB_W, MB_H))(ref4)
    winsu = jax.jit(lambda u: MG.chroma_windows(u, MB_W, MB_H))(refu)
    winsv = jax.jit(lambda v: MG.chroma_windows(v, MB_W, MB_H))(refv)
    mv8 = jnp.zeros((MB_H, MB_W, 2, 2, 2), jnp.int32)
    mv8f = mv8.reshape(B, 2, 2, 2)
    jax.block_until_ready((wins4, winsu, winsv))

    # full residual
    epr = jax.jit(lambda *a: IF.encode_p_residual(
        *a, QP, QPC, MB_W, MB_H, True))
    timeit("encode_p_residual (full)", epr,
           [(fys[i], fus[i], fvs[i], wins4, winsu, winsv, mv8)
            for i in range(NVAR)])

    # luma-only piece
    def luma_piece(fy, wins4):
        f16 = IF.tile_mb(fy.astype(jnp.int32), MB_W, MB_H, 16)
        pred = IF._mc_luma_mv8(wins4, mv8f)
        blk_f = MG.mb_to_blocks4(f16)
        blk_p = MG.mb_to_blocks4(pred)
        dct = T.sub_dct4x4(blk_f, blk_p)
        q = T.quant4x4(dct, jnp.full((B, 1), QP), False)
        nnz = jnp.any(q.reshape(B, 16, 16) != 0, axis=-1).astype(jnp.int32)
        levels = T.zigzag4x4(q)
        dq = T.dequant4x4(q, jnp.full((B, 1), QP))
        rec = jnp.where((nnz > 0)[..., None, None],
                        T.idct4x4_add(blk_p, dq), blk_p)
        return MG.blocks4_to_mb(rec), levels, nnz
    timeit("  luma piece", jax.jit(luma_piece),
           [(fys[i], wins4) for i in range(NVAR)])

    def mc_only(fy, wins4):
        pred = IF._mc_luma_mv8(wins4, mv8f)
        return pred.sum()
    timeit("  _mc_luma_mv8 only", jax.jit(mc_only),
           [(fys[i], wins4) for i in range(NVAR)])

    # one chroma channel
    def chroma_piece(fu, winsu):
        fu8 = IF.tile_mb(fu.astype(jnp.int32), MB_W, MB_H, 8)
        predu = IF._mc_chroma_mv8(winsu, mv8f)
        return IF._encode_chroma_p(fu8, predu, jnp.full((B,), QPC), True)
    timeit("  chroma channel (full)", jax.jit(chroma_piece),
           [(fus[i], winsu) for i in range(NVAR)])

    # optimize_chroma_dc alone
    dcs = [jnp.asarray(rng.integers(-40, 40, (B, 4), np.int32))
           for _ in range(NVAR)]
    ocd = jax.jit(lambda d: jax.vmap(_optimize_chroma_dc)(
        d, jnp.full((B,), QPC)))
    timeit("  vmap(_optimize_chroma_dc)", ocd, [(d,) for d in dcs])

    # chroma without the optimize path
    def chroma_noopt(fu, winsu):
        fu8 = IF.tile_mb(fu.astype(jnp.int32), MB_W, MB_H, 8)
        pred8 = IF._mc_chroma_mv8(winsu, mv8f)
        qpc = jnp.full((B,), QPC)
        blocks_f = IF._quad_split(fu8)
        blocks_p = IF._quad_split(pred8)
        dct = T.sub_dct4x4(blocks_f, blocks_p)
        dc_raw = dct[..., 0, 0]
        dct = IF._set_dc(dct)
        dc = T.hadamard2x2(dc_raw)
        q_ac = T.quant4x4(dct, qpc[:, None], False)
        nnz_ac = jnp.any(q_ac.reshape(B, 4, 16) != 0,
                         axis=-1).astype(jnp.int32)
        ac_levels = T.zigzag4x4(q_ac)
        q_dc = T.quant_dc(dc, qpc, False)
        nz_dc = jnp.any(q_dc != 0, axis=-1)
        sc = jnp.where(nnz_ac > 0,
                       T.decimate_score(ac_levels[..., 1:]), 0).sum(-1)
        nz_ac = (sc >= 7) & jnp.any(nnz_ac > 0, axis=-1)
        dc_levels = jnp.where(nz_dc[:, None],
                              q_dc[:, jnp.asarray([0, 2, 1, 3])], 0)
        dq_dc = T.idct_dequant_2x2_dc(q_dc, qpc)
        dq_ac = T.dequant4x4(q_ac, qpc[:, None])
        dq_ac = IF._set_dc(dq_ac, jnp.where(nz_dc[:, None], dq_dc, 0))
        rec_ac = T.idct4x4_add(blocks_p, dq_ac)
        dc_shift = (dq_dc + 32) >> 6
        rec_dc = jnp.clip(blocks_p.astype(jnp.int32)
                          + dc_shift[..., None, None], 0, 255)
        rec = jnp.where(nz_ac[:, None, None, None], rec_ac,
                        jnp.where(nz_dc[:, None, None, None], rec_dc,
                                  blocks_p.astype(jnp.int32)))
        return IF._quad_merge(rec), dc_levels, ac_levels
    timeit("  chroma channel (no opt-dc)", jax.jit(chroma_noopt),
           [(fus[i], winsu) for i in range(NVAR)])


if __name__ == "__main__":
    main()
