"""Bisect decide_partitions on TPU."""
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
R = 16
LAM = 5
NVAR = 4


def timeit(name, fn, argsets, n=4):
    dt = sync_time_ms(jax.jit(fn), argsets, n=n)
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from x264dsp_tpu.encoder import inter_frame as IF
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops import mcgather as MG
    from x264dsp_tpu.ops.pallas.me_sad import (make_ref_strips,
                                               sad_cost_surfaces_8x8)

    rng = np.random.default_rng(0)
    print(f"roundtrip {baseline()*1e3:.1f} ms", file=sys.stderr)
    fys = [jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
           for _ in range(NVAR)]
    ry = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    ref4 = jax.jit(MC.make_ref_planes)(ry)
    wins4 = jax.jit(lambda r: MG.luma_windows(r, MB_W, MB_H))(ref4)
    strips = jax.jit(lambda r: make_ref_strips(
        r, MC.PAD_MC, MB_W, MB_H, R))(ref4[0])
    cost8 = jax.jit(lambda f, s: sad_cost_surfaces_8x8(
        f.astype(jnp.int32), s, mb_w=MB_W, mb_h=MB_H, R=R))(fys[0], strips)
    mv16 = jnp.zeros((MB_H, MB_W, 2), jnp.int32)
    jax.block_until_ready((wins4, cost8))

    dp = jax.jit(lambda c, m, f, w: IF.decide_partitions(
        c, m, f, w, LAM, MB_W, MB_H, R, 512))
    timeit("decide_partitions (full)", dp,
           [(cost8, mv16, f, wins4) for f in fys])

    # picks only: replicate the pick phase
    def picks_only(cost8, mv16_field):
        n = 2 * R + 1
        offs = jnp.arange(-R, R + 1)
        mvmin_x, mvmax_x, mvmin_y, mvmax_y = IF.make_mv_ranges(
            MB_W, MB_H, 512)
        lam_mb = jnp.full((MB_H, MB_W), LAM)
        lo_x = (mvmin_x >> 2) + 6
        hi_x = (mvmax_x >> 2) - 6
        lo_y = (mvmin_y >> 2) + 6
        hi_y = (mvmax_y >> 2) - 6
        ok = ((offs[None, None, :] >= lo_x[:, None, None])
              & (offs[None, None, :] <= hi_x[:, None, None]))
        ok = ok[None, :, :, :] & \
            ((offs[None, :, None] >= lo_y[:, None, None])
             & (offs[None, :, None] <= hi_y[:, None, None]))[:, None, :, :]
        mvpx = mv16_field[..., 0][..., None, None]
        mvpy = mv16_field[..., 1][..., None, None]
        bias = IF._mv_cost(lam_mb[..., None, None],
                           offs[None, None, None, :] * 4,
                           offs[None, None, :, None] * 4, mvpx, mvpy)

        def pick(surf):
            cost = jnp.where(ok, surf + bias, 1 << 28)
            k = jnp.argmin(cost.reshape(MB_H, MB_W, -1), axis=-1)
            mv = jnp.stack([(k % n - R) * 4, (k // n - R) * 4], axis=-1)
            c = jnp.take_along_axis(cost.reshape(MB_H, MB_W, -1),
                                    k[..., None], axis=-1)[..., 0]
            return mv, c
        outs = []
        for qy in range(2):
            for qx in range(2):
                outs += list(pick(cost8[:, :, qy, qx]))
        outs += list(pick(cost8[:, :, 0, 0] + cost8[:, :, 0, 1]))
        outs += list(pick(cost8[:, :, 1, 0] + cost8[:, :, 1, 1]))
        outs += list(pick(cost8[:, :, 0, 0] + cost8[:, :, 1, 0]))
        outs += list(pick(cost8[:, :, 0, 1] + cost8[:, :, 1, 1]))
        outs += list(pick(cost8.sum(axis=(2, 3))))
        return outs
    timeit("  9x pick (argmin+bias)", picks_only,
           [(cost8 + i, mv16) for i in range(NVAR)])

    # one refine geometry (8x8 quadrant)
    f16 = IF.tile_mb(fys[0].astype(jnp.int32), MB_W, MB_H, 16)

    def one_refine(fy, wins4):
        f16 = IF.tile_mb(fy.astype(jnp.int32), MB_W, MB_H, 16)
        f_blk = f16[:, 0:8, 0:8]
        Bq = B
        z = jnp.zeros((Bq,), jnp.int32)
        bmx, bmy, bcost = IF._refine_block_batch(
            wins4, f_blk, z, z, jnp.full((Bq,), 1 << 20), z, z,
            jnp.full((Bq,), LAM), jnp.full((Bq,), -64), jnp.full((Bq,), 64),
            jnp.full((Bq,), -64), jnp.full((Bq,), 64),
            8, 8, 0, 0, jnp.ones((Bq,), bool))
        return bmx, bmy, bcost
    timeit("  one 8x8 refine (9 cand evals)", one_refine,
           [(f, wins4) for f in fys])

    def one_mc(fy, wins4):
        mvx = jnp.zeros((B,), jnp.int32)
        blk = MG.mc_luma_batched(wins4, mvx, mvx, 8, 8)
        return blk
    timeit("  single mc_luma_batched 8x8", one_mc,
           [(f, wins4) for f in fys])


if __name__ == "__main__":
    main()
