"""Per-stage timing of the 1080p P-frame device pipeline on the real chip.

Times each stage of encode_p_frame (inter_frame.py) in isolation with its
inputs already on device. The attached-runtime memoizes executions with
identical inputs, so every stage is timed over a cycle of DIFFERENT
inputs (varying the frame argument).

Run: python tools/profile_p.py
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/x264tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

W, H = 1920, 1088
MB_W, MB_H = W // 16, H // 16
QP, QPC, LAM = 26, 26, 5
R = 16
NVAR = 4  # input variants to defeat execution memoization


from tputime import sync_time_ms, baseline


def timeit(name, fn, argsets, n=5):
    t0 = time.perf_counter()
    dt = sync_time_ms(fn, argsets, n=n)
    tc = time.perf_counter() - t0
    print(f"{name:44s} {dt:8.2f} ms   (wall {tc:.1f} s)")
    return dt


def main():
    from x264dsp_tpu.encoder import inter_frame as IF
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops import mcgather as MG
    from x264dsp_tpu.ops.pallas.me_sad import (make_ref_strips,
                                               sad_cost_surfaces_8x8)

    rng = np.random.default_rng(0)

    def frame():
        return (jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8)),
                jnp.asarray(rng.integers(0, 256, (H // 2, W // 2),
                                         dtype=np.uint8)),
                jnp.asarray(rng.integers(0, 256, (H // 2, W // 2),
                                         dtype=np.uint8)))

    fys, fus, fvs = zip(*(frame() for _ in range(NVAR)))
    ry = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))

    ref4 = jax.jit(MC.make_ref_planes)(ry)
    refu = jax.jit(MC.pad_chroma)(fus[0])
    refv = jax.jit(MC.pad_chroma)(fvs[0])
    jax.block_until_ready((ref4, refu, refv))

    print(f"device: {jax.devices()[0].platform}  "
          f"grid {MB_W}x{MB_H} = {MB_W*MB_H} MBs  "
          f"roundtrip {baseline()*1e3:.1f} ms", file=sys.stderr)

    timeit("make_ref_planes (hpel pyramid)",
           jax.jit(MC.make_ref_planes), [(f,) for f in fys])

    mk = jax.jit(lambda r: make_ref_strips(r, MC.PAD_MC, MB_W, MB_H, R))
    timeit("make_ref_strips", mk, [(ref4[p % 4],) for p in range(NVAR)])
    strips = mk(ref4[0])
    jax.block_until_ready(strips)
    sad = jax.jit(lambda f, s: sad_cost_surfaces_8x8(
        f.astype(jnp.int32), s, mb_w=MB_W, mb_h=MB_H, R=R))
    timeit("sad_cost_surfaces_8x8 (Pallas)", sad,
           [(f, strips) for f in fys])
    cost8 = sad(fys[0], strips)
    jax.block_until_ready(cost8)

    lw = jax.jit(lambda r: MG.luma_windows(r, MB_W, MB_H))
    timeit("luma_windows", lw, [(jnp.roll(ref4, p, 1),) for p in range(NVAR)])
    cw = jax.jit(lambda u, v: (MG.chroma_windows(u, MB_W, MB_H),
                               MG.chroma_windows(v, MB_W, MB_H)))
    timeit("chroma_windows x2", cw,
           [(jnp.roll(refu, p, 0), refv) for p in range(NVAR)])
    wins4 = lw(ref4)
    winsu, winsv = cw(refu, refv)
    jax.block_until_ready((wins4, winsu, winsv))

    surf = cost8.sum(axis=(2, 3))
    dmp = jax.jit(lambda c, f, w: IF.decide_mvs_parallel(
        c, f, w, LAM, MB_W, MB_H, R, 512))
    timeit("decide_mvs_parallel (incl. subpel)", dmp,
           [(surf, f, wins4) for f in fys])
    mv_field = dmp(surf, fys[0], wins4)
    jax.block_until_ready(mv_field)

    pmf = jax.jit(lambda m: IF.pskip_mv_field(m, MB_W, MB_H))
    psk = pmf(mv_field)
    jax.block_until_ready(psk)
    timeit("pskip_mv_field", pmf,
           [(jnp.roll(mv_field, p, 0),) for p in range(NVAR)])
    pp = jax.jit(lambda *a: IF.probe_pskip(*a, QP, QPC, MB_W, MB_H, 512))
    timeit("probe_pskip", pp,
           [(fys[i], fus[i], fvs[i], wins4, winsu, winsv, psk)
            for i in range(NVAR)])

    mv8 = jnp.broadcast_to(mv_field[:, :, None, None, :],
                           (MB_H, MB_W, 2, 2, 2))
    epr = jax.jit(lambda *a: IF.encode_p_residual(
        *a, QP, QPC, MB_W, MB_H, True))
    timeit("encode_p_residual", epr,
           [(fys[i], fus[i], fvs[i], wins4, winsu, winsv, mv8)
            for i in range(NVAR)])
    out = epr(fys[0], fus[0], fvs[0], wins4, winsu, winsv, mv8)
    jax.block_until_ready(out)

    dp = jax.jit(lambda c, m, f, w: IF.decide_partitions(
        c, m, f, w, LAM, MB_W, MB_H, R, 512))
    timeit("decide_partitions", dp,
           [(cost8, mv_field, f, wins4) for f in fys])

    cs = jax.jit(lambda *a: IF.compute_strengths_p(*a, MB_W, MB_H))
    bs, feo = cs(out["luma_nnz"], out["cbp_luma"], out["cbp_chroma"], mv8)
    jax.block_until_ready((bs, feo))
    timeit("compute_strengths_p", cs,
           [(jnp.roll(out["luma_nnz"], p, 0), out["cbp_luma"],
             out["cbp_chroma"], mv8) for p in range(NVAR)])
    zero_mb = jnp.zeros((MB_H, MB_W), jnp.int32)
    dbf = jax.jit(lambda y, u, v, b, f: DB.deblock_frame.__wrapped__(
        y, u, v, b, zero_mb, f, QP, QPC, 0, 0, mb_w=MB_W, mb_h=MB_H))
    timeit("deblock_frame", dbf,
           [(jnp.roll(out["recon_y"], p, 0), out["recon_u"],
             out["recon_v"], bs, feo) for p in range(NVAR)])
    pk = jax.jit(lambda o: (IF.pack_syn_p8(o, MB_W, MB_H),
                            IF.pack_syn_p(o, MB_W, MB_H)))
    od = dict(out, mv=mv8[:, :, 0, 0], mv8=mv8,
              partition=jnp.zeros((MB_H, MB_W), jnp.int32),
              ref=jnp.zeros((MB_H, MB_W), jnp.int32))
    timeit("pack_syn_p8 + pack_syn_p", pk,
           [(dict(od, luma_levels=jnp.roll(od["luma_levels"], p, 0)),)
            for p in range(NVAR)])

    step = jax.jit(lambda *a: IF.encode_p_frame.__wrapped__(
        *a, QP, QPC, LAM, mb_w=MB_W, mb_h=MB_H, me_range=R, mv_range=512,
        dct_decimate=True, me_parallel=True))
    timeit("encode_p_frame (fused, parallel ME)", step,
           [(fys[i], fus[i], fvs[i], ref4, refu, refv)
            for i in range(NVAR)], n=4)
    stepp = jax.jit(lambda *a: IF.encode_p_frame.__wrapped__(
        *a, QP, QPC, LAM, mb_w=MB_W, mb_h=MB_H, me_range=R, mv_range=512,
        dct_decimate=True, me_parallel=True, partitions=True))
    timeit("encode_p_frame (+partitions)", stepp,
           [(fys[i], fus[i], fvs[i], ref4, refu, refv)
            for i in range(NVAR)], n=4)


if __name__ == "__main__":
    main()
