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


def make_synth_device():
    """Device-side twin of synth_video: one jitted call produces frame t
    (input frames live in HBM — the tunnel's ~20 MB/s h2d would charge
    ~150 ms/frame of test-rig transfer to the encoder; real deployments
    ingest over PCIe at GB/s. The full pipeline otherwise runs
    end-to-end: encode on device, syntax pull to host, C++ entropy)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    noise_np = rng.normal(0, 2.0, (H, W)).astype(np.float32)

    @jax.jit
    def synth(t):
        yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        base = 96 + 48 * jnp.sin(yy / 97.0) + 32 * jnp.cos(xx / 131.0)
        dx, dy = 2.6 * t, 1.3 * t
        tex = (28 * jnp.sin((xx + dx) / 11.0 + (yy + dy) / 17.0)
               + 22 * jnp.cos((xx - 1.7 * dx) / 23.0))
        y = jnp.clip(base + tex + jnp.asarray(noise_np), 0, 255
                     ).astype(jnp.uint8)
        yyc = yy[::2, ::2]
        xxc = xx[::2, ::2]
        u = jnp.clip(120 + 40 * jnp.sin((xxc + dx) / 53.0), 0, 255
                     ).astype(jnp.uint8)
        v = jnp.clip(128 + 40 * jnp.cos((yyc + dy) / 47.0), 0, 255
                     ).astype(jnp.uint8)
        return y, u, v
    return synth


def main():
    import jax
    import jax.numpy as jnp
    from x264dsp_tpu.encoder.inter_frame import (encode_p_frame, pack_syn_p,
                                                 pack_syn_p8, pack_syn_sparse,
                                                 sparse_count, unpack_syn_p,
                                                 unpack_syn_p8,
                                                 unpack_syn_sparse)
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.entropy import native

    streams = int(os.environ.get("BENCH_STREAMS", "1"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "24"))
    qpc = QP  # chroma_qp_offset 0 at QP 26
    lam = 5

    zero_mb = jnp.zeros((MB_H, MB_W), jnp.int32)

    synth = make_synth_device()

    def device_step(t, ref4, refu, refv):
        """Full conformant P step: device frame synth + encode + real
        strengths + deblock + reference update."""
        fy, fu, fv = synth(t)
        out = encode_p_frame.__wrapped__(
            fy, fu, fv, ref4, refu, refv, QP, qpc, lam,
            mb_w=MB_W, mb_h=MB_H, me_range=16, mv_range=512,
            dct_decimate=True, me_parallel=True)
        dy, du, dv = DB.deblock_frame.__wrapped__(
            out["recon_y"], out["recon_u"], out["recon_v"], out["bs"],
            zero_mb, out["feo"], QP, qpc, 0, 0, mb_w=MB_W, mb_h=MB_H)
        refs = (MC.make_ref_planes(dy), MC.pad_chroma(du),
                MC.pad_chroma(dv))
        dense, payload, count = pack_syn_sparse(out, MB_W, MB_H)
        return (dense, payload, count,
                pack_syn_p8(out, MB_W, MB_H),
                pack_syn_p(out, MB_W, MB_H), refs)

    header = bytes([0x40])  # byte-aligned dummy slice header for timing

    B = MB_W * MB_H
    BUCKETS = (B // 16, B // 8, B // 4, B // 2, B)

    def pull(dense, payload, count, syn8, syn16):
        """sparse transfer: one dense buffer (fields + embedded count)
        + the smallest bucketed payload slice covering the coded count
        (a handful of fixed slice shapes so nothing recompiles per
        frame); int8/int16 dense fallbacks for out-of-range levels."""
        d = np.asarray(dense)
        if not d[0]:
            c = sparse_count(d)
            cap = next((b for b in BUCKETS if b >= c), B)
            rows = np.asarray(payload[:cap])
            return unpack_syn_sparse(d, rows, MB_W, MB_H)
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
        step = jax.jit(device_step, donate_argnums=(1, 2, 3))
        f0 = synth(jnp.float32(0))
        ref4 = MC.make_ref_planes(f0[0])
        refu = MC.pad_chroma(f0[1])
        refv = MC.pad_chroma(f0[2])
        refs = (ref4, refu, refv)
        # warm up compile + entropy lib
        warm = step(jnp.float32(1), *refs)
        entropy(pull(*warm[:5]))

        # device-only throughput (synchronous steps; excludes the
        # test-tunnel syntax transfer) for the breakdown line
        r = warm[5]
        t0 = time.perf_counter()
        for k in range(4):
            o = step(jnp.float32(1 + (k % 2)), *r)
            r = o[5]
            jax.block_until_ready(o[0])
        dev_fps = 4 / (time.perf_counter() - t0)
        refs = r

        # timed loop, one frame in flight: pull frame N's syntax FIRST
        # (its compute finished last iteration — the transfer starts
        # immediately instead of queueing behind frame N+1's step),
        # then dispatch N+1, then run host entropy while the device
        # encodes
        t_dev = t_ent = t_pull = 0.0
        nbytes = 0
        prev = step(jnp.float32(1), *refs)
        t0 = time.perf_counter()
        for i in range(n_frames):
            tp = time.perf_counter()
            syn_np = pull(*prev[:5])
            t_pull += time.perf_counter() - tp
            td = time.perf_counter()
            cur = step(jnp.float32(1 + (i % 2)), *prev[5])  # async
            t_dev += time.perf_counter() - td
            te = time.perf_counter()
            nbytes += entropy(syn_np)
            t_ent += time.perf_counter() - te
            prev = cur
        nbytes += entropy(pull(*prev[:5]))
        dt = time.perf_counter() - t0
        fps = (n_frames + 1) / dt
        print(f"breakdown: dispatch {t_dev/n_frames*1e3:.1f} ms  "
              f"entropy {t_ent/n_frames*1e3:.1f} ms  "
              f"pull {t_pull/n_frames*1e3:.1f} ms  "
              f"slice {nbytes//n_frames} B/frame  "
              f"device-only {dev_fps:.1f} fps", file=sys.stderr)
        metric = "1080p IPPP end-to-end fps/chip (device + CABAC entropy)"
    else:
        from concurrent.futures import ThreadPoolExecutor
        S = streams
        vstep = jax.jit(jax.vmap(device_step), donate_argnums=(1, 2, 3))
        f0 = synth(jnp.float32(0))
        r4 = MC.make_ref_planes(f0[0])
        ru = MC.pad_chroma(f0[1])
        rv = MC.pad_chroma(f0[2])
        refs = (jnp.broadcast_to(r4[None], (S,) + r4.shape).copy(),
                jnp.broadcast_to(ru[None], (S,) + ru.shape).copy(),
                jnp.broadcast_to(rv[None], (S,) + rv.shape).copy())

        def batch(i):
            return (jnp.full((S,), 1 + (i % 2), jnp.float32),)

        pool = ThreadPoolExecutor(max_workers=min(S, 8))

        def entropy_batch(dense, payload, count, syn8, syn16):
            bd = np.asarray(dense)
            bc = np.asarray(count)
            b8 = b16 = None
            CAP = MB_W * MB_H // 2
            rows = [None] * S
            for s in range(S):
                if not bd[s][0] and sparse_count(bd[s]) <= CAP:
                    rows[s] = np.asarray(payload[s, :CAP])

            def one(s):
                nonlocal b8, b16
                syn_np = None
                if rows[s] is not None:
                    syn_np = unpack_syn_sparse(bd[s], rows[s], MB_W, MB_H)
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
        entropy_batch(*warm[:5])

        prev = vstep(*batch(0), *warm[5])
        t0 = time.perf_counter()
        for i in range(n_frames):
            ent_args = prev[:5]
            cur = vstep(*batch(i), *prev[5])
            entropy_batch(*ent_args)
            prev = cur
        entropy_batch(*prev[:5])
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
