"""Per-stage timing of the 1080p P pipeline, memoization-proof.

The attached runtime memoizes executions with identical inputs, so each
stage is timed as one synchronous sweep over K UNIQUE input sets
(different frame content per call); per-call time = (sweep - sync
overhead) / K. The single block_until_ready at the end amortizes the
tunnel round-trip across the whole sweep.

Run: python tools/profile_p2.py [stage ...]
"""

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
K = 6


def sweep(name, fn, argsets):
    """One warmup on argsets[0], then time len(argsets) unique calls.
    Blocks on the argsets first: async dispatch would otherwise charge
    any upstream stage calls embedded in them to the timed stage."""
    jax.block_until_ready(argsets)
    outs = fn(*argsets[0])
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(argsets)
    print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)
    return outs[0]


def main():
    from x264dsp_tpu.encoder import inter_frame as IF
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops import mcgather as MG
    from x264dsp_tpu.ops.pallas.me_sad import (make_ref_strips,
                                               sad_cost_surfaces_8x8)

    only = set(sys.argv[1:])

    def want(name):
        return not only or any(o in name for o in only)

    rng = np.random.default_rng(0)
    # K unique frames + K unique refs (prev frame shifted)
    base = rng.integers(0, 256, (H + 8, W + 8), dtype=np.uint8)
    fys = [jnp.asarray(base[k:k + H, k:k + W]) for k in range(K)]
    fus = [jnp.asarray(base[k:k + H // 2, k:k + W // 2]) for k in range(K)]
    fvs = [jnp.asarray(base[k + 1:k + 1 + H // 2, k:k + W // 2])
           for k in range(K)]
    rys = [jnp.asarray(base[k + 2:k + 2 + H, k + 1:k + 1 + W])
           for k in range(K)]

    mrp = jax.jit(MC.make_ref_planes)
    pc = jax.jit(MC.pad_chroma)
    ref4s = [mrp(r) for r in rys]
    refus = [pc(f) for f in fus[::-1]]
    refvs = [pc(f) for f in fvs[::-1]]
    jax.block_until_ready((ref4s, refus, refvs))
    print(f"device: {jax.devices()[0].platform}  grid {MB_W}x{MB_H}",
          flush=True)

    if want("make_ref_planes"):
        sweep("make_ref_planes (hpel pyramid)", mrp, [(r,) for r in rys])

    mk = jax.jit(lambda r: make_ref_strips(r, MC.PAD_MC, MB_W, MB_H, R))
    stripss = [mk(r[0]) for r in ref4s]
    jax.block_until_ready(stripss)
    if want("strips"):
        sweep("make_ref_strips", mk, [(r[0],) for r in ref4s])
    sad = jax.jit(lambda f, s: sad_cost_surfaces_8x8(
        f.astype(jnp.int32), s, mb_w=MB_W, mb_h=MB_H, R=R))
    cost8 = sad(fys[0], stripss[0])
    if want("sad"):
        sweep("sad_cost_surfaces_8x8 (Pallas)", sad,
              [(f, s) for f, s in zip(fys, stripss)])

    lw = jax.jit(lambda r: MG.luma_windows(r, MB_W, MB_H))
    cw = jax.jit(lambda u: MG.chroma_windows(u, MB_W, MB_H))
    wins4 = lw(ref4s[0])
    winsu = cw(refus[0])
    winsv = cw(refvs[0])
    jax.block_until_ready((wins4, winsu, winsv))
    if want("windows"):
        sweep("luma_windows", lw, [(r,) for r in ref4s])
        sweep("chroma_windows", cw, [(u,) for u in refus])

    surf = cost8.sum(axis=(2, 3))
    dmp = jax.jit(lambda c, f, w: IF.decide_mvs_parallel(
        c, f, w, LAM, MB_W, MB_H, R, 512))
    mv_field = dmp(surf, fys[0], wins4)
    if want("decide"):
        sweep("decide_mvs_parallel (incl. subpel)", dmp,
              [(sad(f, s).sum(axis=(2, 3)), f, wins4)
               for f, s in zip(fys, stripss)])

    pmf = jax.jit(lambda m: IF.pskip_mv_field(m, MB_W, MB_H))
    psk = pmf(mv_field)
    pp = jax.jit(lambda *a: IF.probe_pskip(*a, QP, QPC, MB_W, MB_H, 512))
    if want("pskip"):
        sweep("probe_pskip", pp,
              [(fys[i], fus[i], fvs[i], wins4, winsu, winsv, psk)
               for i in range(K)])

    mv8 = jnp.broadcast_to(mv_field[:, :, None, None, :],
                           (MB_H, MB_W, 2, 2, 2))
    epr = jax.jit(lambda *a: IF.encode_p_residual(
        *a, QP, QPC, MB_W, MB_H, True))
    out = epr(fys[0], fus[0], fvs[0], wins4, winsu, winsv, mv8)
    if want("residual"):
        sweep("encode_p_residual", epr,
              [(fys[i], fus[i], fvs[i], wins4, winsu, winsv, mv8)
               for i in range(K)])

    if want("partitions"):
        dp = jax.jit(lambda c, m, f, w: IF.decide_partitions(
            c, m, f, w, LAM, MB_W, MB_H, R, 512))
        sweep("decide_partitions", dp,
              [(sad(f, s), dmp(sad(f, s).sum(axis=(2, 3)), f, wins4),
                f, wins4) for f, s in zip(fys, stripss)])

    cs = jax.jit(lambda *a: IF.compute_strengths_p(*a, MB_W, MB_H))
    bs, feo = cs(out["luma_nnz"], out["cbp_luma"], out["cbp_chroma"], mv8)
    if want("strengths"):
        sweep("compute_strengths_p", cs,
              [(epr(fys[i], fus[i], fvs[i], wins4, winsu, winsv,
                    mv8)["luma_nnz"], out["cbp_luma"], out["cbp_chroma"],
                mv8) for i in range(K)])

    zero_mb = jnp.zeros((MB_H, MB_W), jnp.int32)
    if want("deblock"):
        dbf = jax.jit(lambda y, u, v, b, f: DB.deblock_frame.__wrapped__(
            y, u, v, b, zero_mb, f, QP, QPC, 0, 0, mb_w=MB_W, mb_h=MB_H,
            intra_mode="none"))
        sweep("deblock_frame (skew)", dbf,
              [(fys[i].astype(jnp.int32), fus[i].astype(jnp.int32),
                fvs[i].astype(jnp.int32), bs, feo) for i in range(K)])

    if want("pack"):
        pk = jax.jit(lambda o: IF.pack_syn_sparse(o, MB_W, MB_H))
        od = dict(out, mv=mv8[:, :, 0, 0], mv8=mv8,
                  partition=jnp.zeros((MB_H, MB_W), jnp.int32),
                  ref=jnp.zeros((MB_H, MB_W), jnp.int32))
        sweep("pack_syn_sparse", pk,
              [(dict(od, luma_levels=jnp.roll(od["luma_levels"], p + 1,
                                              0)),) for p in range(K)])

    if want("fused"):
        step = jax.jit(lambda *a: IF.encode_p_frame.__wrapped__(
            *a, QP, QPC, LAM, mb_w=MB_W, mb_h=MB_H, me_range=R,
            mv_range=512, dct_decimate=True, me_parallel=True))
        sweep("encode_p_frame (fused)", step,
              [(fys[i], fus[i], fvs[i], ref4s[i], refus[i], refvs[i])
               for i in range(K)])


if __name__ == "__main__":
    main()
