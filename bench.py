"""Benchmark: end-to-end encode throughput on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 300 fps/chip 1080p (BASELINE.md build target).

Measures the CONFORMANT 1080p IPPP pipeline in steady state:
  device: P-frame encode (Pallas ME cost surfaces + MV decision + subpel
          refine + residual) + REAL deblock strengths computed on device
          + in-loop deblock + hpel reference update
  host:   C++ CABAC entropy on the pulled syntax tensors (int16-compacted
          transfer), overlapped with the device encode of the next frame
          (the reference's row-lag pipeline, encoder.c:1359, reborn as
          frame-lag).
End-to-end fps = frames / wall-clock including both stages.

Env: BENCH_STREAMS=N (default 1) batches N independent streams
(BASELINE.json config 5); entropy then runs in a thread pool (the C++
writer releases the GIL). BENCH_FRAMES overrides the frame count.
A per-stage breakdown goes to stderr; the JSON line is the last stdout
line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/x264tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import numpy as np

W, H = 1920, 1088
MB_W, MB_H = W // 16, H // 16
QP = 26

# syntax keys the CABAC P writer consumes (entropy/native.py)
SYN_KEYS = ("cbp_luma", "cbp_chroma", "luma_nnz", "chroma_nnz_ac",
            "chroma_nz_dc", "luma_levels", "chroma_dc_levels",
            "chroma_ac_levels", "mv")


def synth_video(n_frames, seed=0):
    """Synthetic 1080p clip: smooth gradient + two moving sinusoid
    textures + light noise — realistic motion for ME and realistic
    coefficient density for entropy (pure noise would be pathological)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 96 + 48 * np.sin(yy / 97.0) + 32 * np.cos(xx / 131.0)
    noise = rng.normal(0, 2.0, (H, W)).astype(np.float32)
    frames = []
    for t in range(n_frames):
        dx, dy = 2.6 * t, 1.3 * t
        tex = (28 * np.sin((xx + dx) / 11.0 + (yy + dy) / 17.0)
               + 22 * np.cos((xx - 1.7 * dx) / 23.0))
        y = np.clip(base + tex + noise, 0, 255).astype(np.uint8)
        u = np.clip(120 + 40 * np.sin((xx[::2, ::2] + dx) / 53.0),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos((yy[::2, ::2] + dy) / 47.0),
                    0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main():
    import jax
    import jax.numpy as jnp
    from x264dsp_tpu.encoder.inter_frame import (encode_p_frame, pack_syn_p,
                                                 pack_syn_p4, pack_syn_p8,
                                                 unpack_syn_p, unpack_syn_p4,
                                                 unpack_syn_p8)
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.entropy import native

    streams = int(os.environ.get("BENCH_STREAMS", "1"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "24"))
    qpc = QP  # chroma_qp_offset 0 at QP 26
    lam = 5

    zero_mb = jnp.zeros((MB_H, MB_W), jnp.int32)

    def device_step(fy, fu, fv, ref4, refu, refv):
        """Full conformant P step: encode + real strengths + deblock +
        reference update. Returns (int8 syn pack, int16 fallback, refs)."""
        out = encode_p_frame.__wrapped__(
            fy, fu, fv, ref4, refu, refv, QP, qpc, lam,
            mb_w=MB_W, mb_h=MB_H, me_range=16, mv_range=512,
            dct_decimate=True, me_parallel=True)
        dy, du, dv = DB.deblock_frame.__wrapped__(
            out["recon_y"], out["recon_u"], out["recon_v"], out["bs"],
            zero_mb, out["feo"], QP, qpc, 0, 0, mb_w=MB_W, mb_h=MB_H)
        refs = (MC.make_ref_planes(dy), MC.pad_chroma(du),
                MC.pad_chroma(dv))
        return (pack_syn_p4(out, MB_W, MB_H),
                pack_syn_p8(out, MB_W, MB_H),
                pack_syn_p(out, MB_W, MB_H), refs)

    frames = synth_video(3)
    header = bytes([0x40])  # byte-aligned dummy slice header for timing

    def pull(syn4, syn8, syn16):
        """nibble transfer; int8/int16 fallbacks for big levels."""
        syn_np = unpack_syn_p4(np.asarray(syn4), MB_W, MB_H)
        if syn_np is None:
            syn_np = unpack_syn_p8(np.asarray(syn8), MB_W, MB_H)
        if syn_np is None:
            syn_np = unpack_syn_p(np.asarray(syn16), MB_W, MB_H)
        return syn_np

    def entropy(syn_np):
        res = native.write_slice_cabac(header, MB_W, MB_H, QP, 1, True,
                                       syn_np)
        assert res is not None, "native entropy library unavailable"
        return len(res[0])

    if streams == 1:
        step = jax.jit(device_step, donate_argnums=(3, 4, 5))
        ref4 = MC.make_ref_planes(jnp.asarray(frames[0][0]))
        refu = MC.pad_chroma(jnp.asarray(frames[0][1]))
        refv = MC.pad_chroma(jnp.asarray(frames[0][2]))
        refs = (ref4, refu, refv)
        # warm up compile + entropy lib
        warm = step(*map(jnp.asarray, frames[1]), *refs)
        entropy(pull(warm[0], warm[1], warm[2]))

        # timed loop, one frame in flight: pull frame N's syntax FIRST
        # (its compute finished last iteration — the transfer starts
        # immediately instead of queueing behind frame N+1's step),
        # then dispatch N+1, then run host entropy while the device
        # encodes
        t_dev = t_ent = t_pull = 0.0
        nbytes = 0
        prev = step(*map(jnp.asarray, frames[1]), *warm[3])
        t0 = time.perf_counter()
        for i in range(n_frames):
            f = frames[1 + (i % 2)]
            tp = time.perf_counter()
            syn_np = pull(prev[0], prev[1], prev[2])
            t_pull += time.perf_counter() - tp
            td = time.perf_counter()
            cur = step(*map(jnp.asarray, f), *prev[3])      # async
            t_dev += time.perf_counter() - td
            te = time.perf_counter()
            nbytes += entropy(syn_np)
            t_ent += time.perf_counter() - te
            prev = cur
        nbytes += entropy(pull(prev[0], prev[1], prev[2]))
        dt = time.perf_counter() - t0
        fps = (n_frames + 1) / dt
        print(f"breakdown: dispatch {t_dev/n_frames*1e3:.1f} ms  "
              f"entropy {t_ent/n_frames*1e3:.1f} ms  "
              f"pull {t_pull/n_frames*1e3:.1f} ms  "
              f"slice {nbytes//n_frames} B/frame", file=sys.stderr)
        metric = "1080p IPPP end-to-end fps/chip (device + CABAC entropy)"
    else:
        from concurrent.futures import ThreadPoolExecutor
        S = streams
        vstep = jax.jit(jax.vmap(device_step), donate_argnums=(3, 4, 5))
        ys = np.stack([frames[0][0]] * S)
        us = np.stack([frames[0][1]] * S)
        vs = np.stack([frames[0][2]] * S)
        refs = (jax.jit(jax.vmap(MC.make_ref_planes))(jnp.asarray(ys)),
                jax.jit(jax.vmap(MC.pad_chroma))(jnp.asarray(us)),
                jax.jit(jax.vmap(MC.pad_chroma))(jnp.asarray(vs)))

        def batch(i):
            f = frames[1 + (i % 2)]
            return (jnp.asarray(np.stack([f[0]] * S)),
                    jnp.asarray(np.stack([f[1]] * S)),
                    jnp.asarray(np.stack([f[2]] * S)))

        pool = ThreadPoolExecutor(max_workers=min(S, 8))

        def entropy_batch(syn4, syn8, syn16):
            b4 = np.asarray(syn4)
            b8 = b16 = None

            def one(s):
                nonlocal b8, b16
                syn_np = unpack_syn_p4(b4[s], MB_W, MB_H)
                if syn_np is None:
                    if b8 is None:
                        b8 = np.asarray(syn8)
                    syn_np = unpack_syn_p8(b8[s], MB_W, MB_H)
                if syn_np is None:
                    if b16 is None:
                        b16 = np.asarray(syn16)
                    syn_np = unpack_syn_p(b16[s], MB_W, MB_H)
                return entropy(syn_np)
            return sum(pool.map(one, range(S)))

        warm = vstep(*batch(0), *refs)
        entropy_batch(warm[0], warm[1], warm[2])

        prev = vstep(*batch(0), *warm[3])
        t0 = time.perf_counter()
        for i in range(n_frames):
            ent_args = (prev[0], prev[1], prev[2])
            cur = vstep(*batch(i), *prev[3])
            entropy_batch(*ent_args)
            prev = cur
        entropy_batch(prev[0], prev[1], prev[2])
        dt = time.perf_counter() - t0
        fps = (n_frames + 1) * S / dt
        metric = (f"1080p IPPP end-to-end fps/chip ({S}-stream batched, "
                  f"aggregate, device + CABAC entropy)")

    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 300.0, 4),
    }))


if __name__ == "__main__":
    main()
