"""Micro-profile of the subme=1 subpel refine internals at 1080p.

Which term dominates the measured ~8 ms: the full-window MVP try, the
extract_windows4 recenter, or the diamond steps?

Run: python tools/profile_subpel.py
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
B = MB_W * MB_H
LAM = 11
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
    from x264dsp_tpu.ops import pixel as PX

    rng = np.random.default_rng(0)
    ry = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    fy = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    ref4 = jax.jit(MC.make_ref_planes)(ry)
    wins4 = jax.jit(lambda r: MG.luma_windows(r, MB_W, MB_H))(ref4)
    jax.block_until_ready(wins4)
    print(f"wins4 {wins4.shape} {wins4.dtype}", file=sys.stderr)
    print(f"roundtrip {baseline()*1e3:.1f} ms", file=sys.stderr, flush=True)

    mvs = [jnp.asarray(rng.integers(-60, 60, (B,), dtype=np.int32) & ~0)
           for _ in range(NVAR * 2)]

    # 1. full-window single-candidate MC (the try_mvp path)
    mcb = jax.jit(lambda mx, my: MG.mc_luma_batched(wins4, mx, my, 16, 16))
    timeit("mc_luma_batched full wins (1 cand)", mcb,
           [(mvs[2 * i], mvs[2 * i + 1]) for i in range(NVAR)])

    # 2. extract_windows4 recenter (m=4)
    ex = jax.jit(lambda bx, by: MG.extract_windows4(
        wins4, jnp.clip(bx >> 2, -16, 16), jnp.clip(by >> 2, -16, 16),
        16, 16, 4))
    timeit("extract_windows4 (m=4)", ex,
           [(mvs[2 * i], mvs[2 * i + 1]) for i in range(NVAR)])
    wins_s = ex(mvs[0], mvs[1])
    jax.block_until_ready(wins_s)

    # 3. one diamond step on the recentered windows (4 cands)
    f = IF.tile_mb(fy.astype(jnp.int32), MB_W, MB_H, 16)

    def diamond(bmx, bmy):
        mxs = jnp.stack([bmx, bmx, bmx - 2, bmx + 2], 1)
        mys = jnp.stack([bmy - 2, bmy + 2, bmy, bmy], 1)
        blks = MG.mc_luma_multi(wins_s, mxs, mys, 16, 16, margin=4)
        return jnp.abs(f[:, None] - blks).sum((2, 3))
    dm = jax.jit(diamond)
    small = [jnp.asarray(rng.integers(-8, 8, (B,), dtype=np.int32))
             for _ in range(NVAR * 2)]
    timeit("diamond step on recentered (4 cands)", dm,
           [(small[2 * i], small[2 * i + 1]) for i in range(NVAR)])

    # 4. mc_luma_multi quadrants on full windows (residual-path shape)
    def mv8mc(mx, my):
        mxs = jnp.stack([mx] * 4, 1)
        mys = jnp.stack([my] * 4, 1)
        return MG.mc_luma_multi(wins4, mxs, mys, 8, 8,
                                np.array([0, 0, 8, 8]),
                                np.array([0, 8, 0, 8]))
    m8 = jax.jit(mv8mc)
    timeit("mc_luma_multi 4-quadrant on full wins", m8,
           [(mvs[2 * i], mvs[2 * i + 1]) for i in range(NVAR)])


if __name__ == "__main__":
    main()
