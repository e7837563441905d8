"""Per-stage timing of the DEFAULT P path (me_method=0 pattern walk) at
1080p on the real chip — the breakdown VERDICT r4 asked for before the
candidate-sparse ME rework (P encode = 319.7 ms/batch, 58% of the
pipeline; which term inside it dominates?).

Run: python tools/profile_pattern.py
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
QP, QPC, LAM = 30, 30, 11
R = 16
NVAR = 4

from tputime import sync_time_ms, baseline


def timeit(name, fn, argsets, n=5):
    t0 = time.perf_counter()
    dt = sync_time_ms(fn, argsets, n=n)
    tc = time.perf_counter() - t0
    print(f"{name:44s} {dt:8.2f} ms   (wall {tc:.1f} s)", flush=True)
    return dt


def main():
    from x264dsp_tpu.encoder import inter_frame as IF
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops import mcgather as MG
    from x264dsp_tpu.ops.pallas.me_sad import (make_ref_strips,
                                               sad_cost_surfaces_8x8)

    rng = np.random.default_rng(0)

    # correlated content (pure noise defeats pskip/decimation and skews
    # the walk's convergence profile): smooth base + noise + shift
    base = rng.integers(0, 256, (H // 8, W // 8)).astype(np.float32)
    big = np.kron(base, np.ones((8, 8), np.float32))

    def frame(shift):
        y = np.clip(np.roll(big, shift, 1)
                    + rng.normal(0, 6, (H, W)), 0, 255).astype(np.uint8)
        u = np.clip(128 + rng.normal(0, 4, (H // 2, W // 2)),
                    0, 255).astype(np.uint8)
        return jnp.asarray(y), jnp.asarray(u), jnp.asarray(u)

    frames = [frame(3 * i + 1) for i in range(NVAR)]
    fys, fus, fvs = zip(*frames)
    ry = jnp.asarray(np.clip(big + rng.normal(0, 6, (H, W)), 0,
                             255).astype(np.uint8))

    ref4 = jax.jit(MC.make_ref_planes)(ry)
    refu = jax.jit(MC.pad_chroma)(fus[0])
    refv = jax.jit(MC.pad_chroma)(fvs[0])
    jax.block_until_ready((ref4, refu, refv))

    print(f"device: {jax.devices()[0].platform}  grid {MB_W}x{MB_H}  "
          f"roundtrip {baseline()*1e3:.1f} ms", file=sys.stderr, flush=True)

    mk = jax.jit(lambda r: make_ref_strips(r, MC.PAD_MC, MB_W, MB_H, R))
    strips = mk(ref4[0])
    jax.block_until_ready(strips)
    sad = jax.jit(lambda f, s: sad_cost_surfaces_8x8(
        f.astype(jnp.int32), s, mb_w=MB_W, mb_h=MB_H, R=R))
    timeit("sad_cost_surfaces_8x8 (Pallas, cost8 out)", sad,
           [(f, strips) for f in fys])
    cost8 = sad(fys[0], strips)
    surf = jax.jit(lambda c: c.sum(axis=(2, 3)))(cost8)
    jax.block_until_ready(surf)
    timeit("cost8 -> surf16 (HBM sum)",
           jax.jit(lambda c: c.sum(axis=(2, 3))),
           [(jnp.roll(cost8, p, 1),) for p in range(NVAR)])

    lw = jax.jit(lambda r: MG.luma_windows(r, MB_W, MB_H))
    wins4 = lw(ref4)
    jax.block_until_ready(wins4)
    timeit("luma_windows", lw, [(jnp.roll(ref4, p, 1),)
                                for p in range(NVAR)])

    # ---- walk only (no subpel): replicate decide_mvs_pattern's body ----
    def walks_only(cost_surf, method=0):
        mvmin_x, mvmax_x, mvmin_y, mvmax_y = IF.make_mv_ranges(
            MB_W, MB_H, 512)
        offs = jnp.arange(-R, R + 1)
        lo_x = (mvmin_x >> 2) + 6
        hi_x = (mvmax_x >> 2) - 6
        lo_y = (mvmin_y >> 2) + 6
        hi_y = (mvmax_y >> 2) - 6
        ok = ((offs[None, None, :] >= lo_x[:, None, None])
              & (offs[None, None, :] <= hi_x[:, None, None]))
        ok = ok[None, :, :, :] & \
            ((offs[None, :, None] >= lo_y[:, None, None])
             & (offs[None, :, None] <= hi_y[:, None, None]))[:, None, :, :]
        cost_raw = jnp.where(ok, cost_surf, 1 << 28)
        lam_mb = jnp.broadcast_to(jnp.asarray(LAM), (MB_H, MB_W))

        def biased(mvp):
            mvx_q = offs[None, None, None, :] * 4
            mvy_q = offs[None, None, :, None] * 4
            bias = IF._mv_cost(lam_mb[..., None, None], mvx_q, mvy_q,
                               mvp[..., 0][..., None, None],
                               mvp[..., 1][..., None, None])
            return jnp.where(ok, cost_surf + bias, 1 << 28)

        zero_mvp = jnp.zeros((MB_H, MB_W, 2), jnp.int32)
        bx0, by0, _ = IF._pattern_walk(cost_raw, biased(zero_mvp),
                                       zero_mvp, None, method, R,
                                       MB_W, MB_H)
        mv0 = jnp.stack([bx0 * 4, by0 * 4], axis=-1)
        mvp = IF._mvp_field_parallel(mv0, MB_W, MB_H)
        mvp_fp = jnp.stack([(mvp[..., 0] + 2) >> 2,
                            (mvp[..., 1] + 2) >> 2], axis=-1)
        bx, by, bc = IF._pattern_walk(cost_raw, biased(mvp), mvp_fp,
                                      None, method, R, MB_W, MB_H)
        return bx, by, bc

    w1 = jax.jit(lambda c: walks_only(c))
    timeit("pattern walks x2 (DIA, no mvc/subpel)", w1,
           [(jnp.roll(surf, p, 1),) for p in range(NVAR)])

    dmp = jax.jit(lambda c, f, w: IF.decide_mvs_pattern(
        c, f, w, LAM, MB_W, MB_H, R, 512, subme=1, method=0))
    timeit("decide_mvs_pattern (full: 3 walks+subpel)", dmp,
           [(surf, f, wins4) for f in fys])
    mv_field = dmp(surf, fys[0], wins4)
    jax.block_until_ready(mv_field)

    # subpel alone
    def subpel_only(mv, f, w):
        mvmin_x, mvmax_x, mvmin_y, mvmax_y = IF.make_mv_ranges(
            MB_W, MB_H, 512)
        mvp = IF._mvp_field_parallel(mv, MB_W, MB_H)
        cost = jnp.zeros((MB_H, MB_W), jnp.int32) + (1 << 20)
        return IF._subpel_refine_batch(mv, cost, mvp, f, w, LAM,
                                       MB_W, MB_H, mvmin_x, mvmax_x,
                                       mvmin_y, mvmax_y, subme=1)
    sp = jax.jit(subpel_only)
    fp = (mv_field // 4) * 4
    timeit("subpel refine alone (subme=1)", sp,
           [(fp, f, wins4) for f in fys])

    cw = jax.jit(lambda u, v: (MG.chroma_windows(u, MB_W, MB_H),
                               MG.chroma_windows(v, MB_W, MB_H)))
    winsu, winsv = cw(refu, refv)
    jax.block_until_ready((winsu, winsv))

    pmf = jax.jit(lambda m: IF.pskip_mv_field(m, MB_W, MB_H))
    psk = pmf(mv_field)
    jax.block_until_ready(psk)
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

    step = jax.jit(lambda *a: IF.encode_p_frame.__wrapped__(
        *a, QP, QPC, LAM, mb_w=MB_W, mb_h=MB_H, me_range=R, mv_range=512,
        dct_decimate=True, me_method=0, subme=1))
    timeit("encode_p_frame (fused, me_method=0)", step,
           [(fys[i], fus[i], fvs[i], ref4, refu, refv)
            for i in range(NVAR)], n=4)


if __name__ == "__main__":
    main()
