"""One-shot TPU measurement burst: fused P step, partitions, deblock
band vs wave, I-frame, lookahead. Single process, exits cleanly."""
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
QP, QPC, LAM, R = 26, 26, 5, 16
NVAR = 4


def timeit(name, fn, argsets, n=4):
    dt = sync_time_ms(jax.jit(fn), argsets, n=n)
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from x264dsp_tpu.encoder import inter_frame as IF
    from x264dsp_tpu.encoder import intra_frame as INTRA
    from x264dsp_tpu.encoder.slicetype import lowres_costs
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops import mcgather as MG

    rng = np.random.default_rng(0)
    print(f"roundtrip {baseline()*1e3:.1f} ms", flush=True)

    def frame():
        return (jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)),
                jnp.asarray(rng.integers(0, 256, (H // 2, W // 2),
                                         np.uint8)),
                jnp.asarray(rng.integers(0, 256, (H // 2, W // 2),
                                         np.uint8)))

    fys, fus, fvs = zip(*(frame() for _ in range(NVAR)))
    ry = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    ref4 = jax.jit(MC.make_ref_planes)(ry)
    refu = jax.jit(MC.pad_chroma)(fus[0])
    refv = jax.jit(MC.pad_chroma)(fvs[0])
    jax.block_until_ready((ref4, refu, refv))

    step = jax.jit(lambda *a: IF.encode_p_frame.__wrapped__(
        *a, QP, QPC, LAM, mb_w=MB_W, mb_h=MB_H, me_range=R, mv_range=512,
        dct_decimate=True, me_parallel=True))
    timeit("encode_p_frame (fused)", step,
           [(fys[i], fus[i], fvs[i], ref4, refu, refv)
            for i in range(NVAR)])
    stepp = jax.jit(lambda *a: IF.encode_p_frame.__wrapped__(
        *a, QP, QPC, LAM, mb_w=MB_W, mb_h=MB_H, me_range=R, mv_range=512,
        dct_decimate=True, me_parallel=True, partitions=True))
    timeit("encode_p_frame (+partitions)", stepp,
           [(fys[i], fus[i], fvs[i], ref4, refu, refv)
            for i in range(NVAR)])

    wins4 = jax.jit(lambda r: MG.luma_windows(r, MB_W, MB_H))(ref4)
    from x264dsp_tpu.ops.pallas.me_sad import (make_ref_strips,
                                               sad_cost_surfaces_8x8)
    strips = jax.jit(lambda r: make_ref_strips(
        r, MC.PAD_MC, MB_W, MB_H, R))(ref4[0])
    cost8 = jax.jit(lambda f, s: sad_cost_surfaces_8x8(
        f.astype(jnp.int32), s, mb_w=MB_W, mb_h=MB_H, R=R))(fys[0], strips)
    mv16 = jnp.zeros((MB_H, MB_W, 2), jnp.int32)
    jax.block_until_ready((wins4, cost8))
    dp = jax.jit(lambda c, m, f, w: IF.decide_partitions(
        c, m, f, w, LAM, MB_W, MB_H, R, 512))
    timeit("decide_partitions", dp,
           [(cost8, mv16, f, wins4) for f in fys])

    # deblock: band path vs single-kernel wave
    bs = jnp.asarray(rng.integers(0, 4, (MB_H, MB_W, 2, 4, 4), np.int32))
    zero = jnp.zeros((MB_H, MB_W), jnp.int32)
    dbf = jax.jit(lambda y, u, v: DB.deblock_frame.__wrapped__(
        y, u, v, bs, zero, zero, QP, QPC, 0, 0, mb_w=MB_W, mb_h=MB_H))
    timeit("deblock band path", dbf,
           [(fys[i].astype(jnp.int32), fus[i].astype(jnp.int32),
             fvs[i].astype(jnp.int32)) for i in range(NVAR)])
    dbw = jax.jit(lambda y, u, v: DB.deblock_frame_wave_batched.__wrapped__(
        y[None], u[None], v[None], bs[None], zero[None], zero[None],
        QP, QPC, 0, 0, mb_w=MB_W, mb_h=MB_H))
    timeit("deblock wave kernel (S=1)", dbw,
           [(fys[i].astype(jnp.int32), fus[i].astype(jnp.int32),
             fvs[i].astype(jnp.int32)) for i in range(NVAR)])

    # I frame + lookahead
    ifr = jax.jit(lambda y, u, v: INTRA.encode_i_frame.__wrapped__(
        y, u, v, QP, QPC, LAM, mb_w=MB_W, mb_h=MB_H, use_satd=False,
        i4x4_enabled=True))
    timeit("encode_i_frame", ifr,
           [(fys[i], fus[i], fvs[i]) for i in range(NVAR)], n=3)
    low4s = [jax.jit(MC.lowres_planes)(f) for f in fys]
    jax.block_until_ready(low4s)
    lr = jax.jit(lambda a, b: lowres_costs(a, b, bw=MB_W, bh=MB_H))
    timeit("lookahead lowres_costs", lr,
           [(low4s[i][0], low4s[(i + 1) % NVAR]) for i in range(NVAR)])
    timeit("lowres_planes", jax.jit(MC.lowres_planes),
           [(f,) for f in fys])


if __name__ == "__main__":
    main()
