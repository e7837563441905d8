"""Microbenchmarks of candidate layout primitives for the plane-resident
residual pipeline (1080p luma)."""
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
NVAR = 4


def timeit(name, fn, argsets, n=5):
    dt = sync_time_ms(jax.jit(fn), argsets, n=n)
    print(f"{name:52s} {dt:8.3f} ms")
    return dt


def perm_rows(n):
    """(n, n) 0/1 f32: out row (i*n//4 + a) = in row (a*4 + i)."""
    P = np.zeros((n, n), np.float32)
    for i in range(4):
        for a in range(n // 4):
            P[i * (n // 4) + a, a * 4 + i] = 1
    return jnp.asarray(P)


def main():
    rng = np.random.default_rng(0)
    print(f"roundtrip {baseline()*1e3:.1f} ms", file=sys.stderr)
    planes = [jnp.asarray(rng.integers(-255, 256, (H, W)).astype(np.float32))
              for _ in range(NVAR)]
    planes_i = [p.astype(jnp.int32) for p in planes]
    tiles = [jnp.asarray(rng.integers(0, 256, (B, 16, 16)).astype(np.int32))
             for _ in range(NVAR)]

    PH = perm_rows(H)
    PW = perm_rows(W)

    # elementwise floor on a full plane chain (10 ops)
    def chain(p):
        x = p
        for _ in range(10):
            x = (x * 3 + 7) // 5
        return x
    timeit("elementwise x10 on (H,W) int32", chain,
           [(p,) for p in planes_i])

    # permutation matmuls both sides, f32
    def permboth(p):
        return PH @ p @ PW.T
    timeit("P @ plane @ Q^T f32 (grouped extract)", permboth,
           [(p,) for p in planes])

    # DCT both sides as dense blockdiag+perm f32 matmuls
    C = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                  [1, -1, -1, 1], [1, -2, 2, -1]], np.float32)
    A = np.asarray(PH) @ np.kron(np.eye(H // 4, dtype=np.float32), C)
    Bm = np.asarray(PW) @ np.kron(np.eye(W // 4, dtype=np.float32), C)
    A = jnp.asarray(A)
    Bm = jnp.asarray(Bm)

    def dct_mm(p):
        return A @ p @ Bm.T
    timeit("DCT+extract as A @ plane @ B^T f32", dct_mm,
           [(p,) for p in planes])

    def dct_roundtrip(p):
        d = A @ p @ Bm.T
        return PH.T @ d @ PW        # just perms back
    timeit("  + perm back (4 matmuls total)", dct_roundtrip,
           [(p,) for p in planes])

    # 16 static slices of the grouped plane + stack
    def extract16(p):
        g = PH @ p @ PW.T
        sl = [g[i * (H // 4):(i + 1) * (H // 4),
                j * (W // 4):(j + 1) * (W // 4)]
              for i in range(4) for j in range(4)]
        return jnp.stack(sl)
    timeit("perm + 16 slices -> (16, H/4, W/4)", extract16,
           [(p,) for p in planes])

    # tiles <-> plane via transpose (what untile_mb does)
    def untile(t):
        return t.reshape(MB_H, MB_W, 16, 16).transpose(0, 2, 1, 3) \
                .reshape(H, W)
    timeit("untile (B,16,16)->(H,W) transpose", untile,
           [(t,) for t in tiles])

    def tile(p):
        return p.reshape(MB_H, 16, MB_W, 16).transpose(0, 2, 1, 3) \
                .reshape(B, 16, 16)
    timeit("tile (H,W)->(B,16,16) transpose", tile,
           [(p,) for p in planes_i])

    # strided-slice extraction straight from plane
    def strided16(p):
        sl = [p[i::4, j::4] for i in range(4) for j in range(4)]
        return jnp.stack(sl)
    timeit("16 strided slices p[i::4,j::4] + stack", strided16,
           [(p,) for p in planes_i])

    # cm (16, H/4, W/4) butterfly idct-ish chain
    cms = [jnp.asarray(rng.integers(-2000, 2000, (16, H // 4, W // 4))
                       .astype(np.int32)) for _ in range(NVAR)]

    def idct_cm(d):
        r = [d[i] for i in range(16)]
        out = []
        for col in range(4):
            d0, d1, d2, d3 = r[col], r[col + 4], r[col + 8], r[col + 12]
            s02, d02 = d0 + d2, d0 - d2
            s13 = d1 + (d3 >> 1)
            d13 = (d1 >> 1) - d3
            out += [s02 + s13, d02 + d13, d02 - d13, s02 - s13]
        out2 = []
        for row in range(4):
            d0, d1, d2, d3 = (out[row * 1], out[4 + row], out[8 + row],
                              out[12 + row])
            s02, d02 = d0 + d2, d0 - d2
            s13 = d1 + (d3 >> 1)
            d13 = (d1 >> 1) - d3
            out2 += [(s02 + s13 + 32) >> 6, (d02 + d13 + 32) >> 6,
                     (d02 - d13 + 32) >> 6, (s02 - s13 + 32) >> 6]
        return jnp.stack(out2)
    timeit("idct butterflies on cm (16, H/4, W/4)", idct_cm,
           [(c,) for c in cms])

    # scatter cm back to plane: stack -> (H,W) grouped -> perm back
    def cm_to_plane(d):
        g = d.reshape(4, 4, H // 4, W // 4)
        rows = jnp.concatenate(
            [jnp.concatenate([g[i, j] for j in range(4)], axis=1)
             for i in range(4)], axis=0)
        return (PH.T @ rows.astype(jnp.float32) @ PW).astype(jnp.int32)
    timeit("cm -> plane (concat + perm back)", cm_to_plane,
           [(c,) for c in cms])


if __name__ == "__main__":
    main()
