"""Benchmark: device encode throughput on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 300 fps/chip 1080p (BASELINE.md build target).

Measures the 1080p IPPP device pipeline in steady state: P-frame encode
(full-pel cost surfaces + wavefront MV decisions + residual encode) plus
the in-loop deblock + hpel reference update — i.e. everything except the
host entropy stage (which overlaps device work in the production setup).
IPPP with keyint 50 is ~98% P frames, the headline config (BASELINE.json
config 4). Set BENCH_INTRA=1 for the all-intra variant.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/x264tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from x264dsp_tpu.encoder.inter_frame import encode_p_frame
    from x264dsp_tpu.encoder.intra_frame import encode_i_frame
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops import deblock as DB

    w, h = 1920, 1088
    mb_w, mb_h = w // 16, h // 16
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    qp, qpc, lam = 26, 26, 5

    streams = int(os.environ.get("BENCH_STREAMS", "1"))
    intra = os.environ.get("BENCH_INTRA") == "1"
    if streams > 1 and not intra:
        from x264dsp_tpu.parallel.mesh import encode_p_frames_batched
        S = streams
        ys = rng.integers(0, 256, (S, h, w)).astype(np.uint8)
        us = rng.integers(0, 256, (S, h // 2, w // 2)).astype(np.uint8)
        vs = rng.integers(0, 256, (S, h // 2, w // 2)).astype(np.uint8)
        ref_y = rng.integers(0, 256, (S, h, w)).astype(np.uint8)
        ref4 = jax.vmap(MC.make_ref_planes)(jnp.asarray(ref_y))
        refu = jax.vmap(MC.pad_chroma)(jnp.asarray(us))
        refv = jax.vmap(MC.pad_chroma)(jnp.asarray(vs))

        def run(_):
            out = encode_p_frames_batched(
                ys, us, vs, ref4, refu, refv, qp, qpc, lam,
                mb_w=mb_w, mb_h=mb_h, me_range=16, mv_range=512,
                dct_decimate=True, me_parallel=True)
            jax.block_until_ready(out["recon_y"])
            return None

        run(None)  # compile
        n = 4
        t0 = time.perf_counter()
        for _ in range(n):
            run(None)
        dt = time.perf_counter() - t0
        fps = n * S / dt
        print(json.dumps({
            "metric": f"1080p IPPP device-pipeline fps/chip "
                      f"({S}-stream batched, aggregate)",
            "value": round(fps, 2),
            "unit": "fps",
            "vs_baseline": round(fps / 300.0, 4),
        }))
        return

    if intra:
        def run(_):
            out = encode_i_frame(y, u, v, qp, qpc, lam, mb_w=mb_w,
                                 mb_h=mb_h, use_satd=False,
                                 i4x4_enabled=True)
            jax.block_until_ready(out["recon_y"])
            return out
        metric = "1080p all-intra device-pipeline fps/chip"
        state = None
    else:
        ref_y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        ref4 = MC.make_ref_planes(jnp.asarray(ref_y))
        refu = MC.pad_chroma(jnp.asarray(u))
        refv = MC.pad_chroma(jnp.asarray(v))
        bs = jnp.zeros((mb_h, mb_w, 2, 4, 4), jnp.int32) + 1
        zero_mb = jnp.zeros((mb_h, mb_w), jnp.int32)

        def run(state):
            ref4, refu, refv = state
            out = encode_p_frame(y, u, v, ref4, refu, refv, qp, qpc, lam,
                                 mb_w=mb_w, mb_h=mb_h, me_range=16,
                                 mv_range=512, dct_decimate=True,
                                 me_parallel=True)
            dy, du, dv = DB.deblock_frame(
                out["recon_y"], out["recon_u"], out["recon_v"], bs,
                zero_mb, zero_mb, qp, qpc, 0, 0, mb_w=mb_w, mb_h=mb_h)
            ref4 = MC.make_ref_planes(dy)
            refu = MC.pad_chroma(du)
            refv = MC.pad_chroma(dv)
            jax.block_until_ready(ref4)
            return (ref4, refu, refv)
        metric = "1080p IPPP device-pipeline fps/chip"
        state = (ref4, refu, refv)

    state = run(state)  # compile
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        state = run(state)
    dt = time.perf_counter() - t0
    fps = n / dt

    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 300.0, 4),
    }))


if __name__ == "__main__":
    main()
