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

Env: BENCH_STREAMS=N (default 4 — the measured sweet spot on this
rig) batches N independent streams (BASELINE.json config 5); entropy
then runs in a thread pool. BENCH_FRAMES overrides the frame count.
NOTE: this rig reaches the chip through a ~15 MB/s, ~30 ms/RPC tunnel;
the syntax transfer dominates the end-to-end number here. On a
PCIe-attached host the transfer term is negligible (see README).
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

    streams = int(os.environ.get("BENCH_STREAMS", "4"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "16"))
    qpc = QP  # chroma_qp_offset 0 at QP 26
    lam = 5

    zero_mb = jnp.zeros((MB_H, MB_W), jnp.int32)

    synth = make_synth_device()

    def encode_core(t, ref4, refu, refv):
        fy, fu, fv = synth(t)
        out = encode_p_frame.__wrapped__(
            fy, fu, fv, ref4, refu, refv, QP, qpc, lam,
            mb_w=MB_W, mb_h=MB_H, me_range=16, mv_range=512,
            dct_decimate=True, me_parallel=True)
        dy, du, dv = DB.deblock_frame_skew_batched.__wrapped__(
            out["recon_y"][None], out["recon_u"][None],
            out["recon_v"][None], out["bs"][None], zero_mb[None],
            out["feo"][None], QP, qpc, 0, 0, mb_w=MB_W, mb_h=MB_H,
            intra_mode="none")
        dy, du, dv = dy[0], du[0], dv[0]
        refs = (MC.make_ref_planes(dy), MC.pad_chroma(du),
                MC.pad_chroma(dv))
        return out, refs

    def device_step(t, ref4, refu, refv):
        """Full conformant P step: device frame synth + encode + real
        strengths + deblock + reference update. ONE wire output (every
        extra host-visible array costs a tunnel round trip); the frame
        phase t advances on device so no per-frame upload happens. The
        int8/int16 fallback packs live in a separate jit that re-runs
        the step on the rare has-big frame."""
        out, refs = encode_core(t, ref4, refu, refv)
        dense, payload, count = pack_syn_sparse(out, MB_W, MB_H)
        wire = jnp.concatenate([dense.astype(jnp.uint8),
                                payload.reshape(-1)])
        t_next = 1.0 + jnp.float32(t == 1.0)   # cycle 1, 2, 1, 2...
        return wire, refs, t_next

    @jax.jit
    def fallback_packs(t, ref4, refu, refv):
        out, _ = encode_core(t, ref4, refu, refv)
        return pack_syn_p8(out, MB_W, MB_H), pack_syn_p(out, MB_W, MB_H)

    def device_step_batched(ts, ref4, refu, refv):
        """Batched variant: encode vmapped over the stream axis, the
        wavefront deblock through its native batched entry (its ANY-
        memspace plane block cannot ride vmap)."""
        S = ts.shape[0]
        fy, fu, fv = jax.vmap(synth)(ts)
        out = jax.vmap(lambda a, b, c, d, e, f: encode_p_frame.__wrapped__(
            a, b, c, d, e, f, QP, qpc, lam,
            mb_w=MB_W, mb_h=MB_H, me_range=16, mv_range=512,
            dct_decimate=True, me_parallel=True))(fy, fu, fv,
                                                  ref4, refu, refv)
        zeros = jnp.zeros((S, MB_H, MB_W), jnp.int32)
        # all S streams share ONE stacked-lane skew kernel pass
        dy, du, dv = DB.deblock_frame_skew_batched.__wrapped__(
            out["recon_y"], out["recon_u"], out["recon_v"], out["bs"],
            zeros, out["feo"], QP, qpc, 0, 0, mb_w=MB_W, mb_h=MB_H,
            intra_mode="none")
        refs = (jax.vmap(MC.make_ref_planes)(dy),
                jax.vmap(MC.pad_chroma)(du), jax.vmap(MC.pad_chroma)(dv))
        dense, payload, count = jax.vmap(
            lambda o: pack_syn_sparse(o, MB_W, MB_H))(out)
        wire = jnp.concatenate([dense.astype(jnp.uint8),
                                payload.reshape(S, -1)], axis=1)
        return (wire,
                jax.vmap(lambda o: pack_syn_p8(o, MB_W, MB_H))(out),
                jax.vmap(lambda o: pack_syn_p(o, MB_W, MB_H))(out), refs)

    header = bytes([0x40])  # byte-aligned dummy slice header for timing

    B = MB_W * MB_H
    DLEN = 5 + B * 20            # dense segment of the wire buffer

    def pull(wire):
        """one host-visible array per frame; None when the has-big
        escape fires (caller re-encodes via fallback_packs)."""
        w = np.asarray(wire)
        d = w[:DLEN].view(np.int8)
        if d[0]:
            return None
        rows = w[DLEN:].reshape(B, -1)
        return unpack_syn_sparse(d, rows, MB_W, MB_H)

    def entropy(syn_np):
        res = native.write_slice_cabac(header, MB_W, MB_H, QP, 1, True,
                                       syn_np)
        assert res is not None, "native entropy library unavailable"
        return len(res[0])

    if streams == 1:
        step = jax.jit(device_step)
        f0 = synth(jnp.float32(0))
        ref4 = MC.make_ref_planes(f0[0])
        refu = MC.pad_chroma(f0[1])
        refv = MC.pad_chroma(f0[2])
        refs = (ref4, refu, refv)

        def pull1(prev):
            syn_np = pull(prev[0])
            if syn_np is None:     # rare has-big escape: re-encode
                syn8, syn16 = fallback_packs(prev[3], *prev[4])
                syn_np = unpack_syn_p8(np.asarray(syn8), MB_W, MB_H)
                if syn_np is None:
                    syn_np = unpack_syn_p(np.asarray(syn16), MB_W, MB_H)
            return syn_np

        # warm up compile + entropy lib
        tprev = jnp.float32(1)
        warm = step(tprev, *refs) + (tprev, refs)
        entropy(pull1(warm))

        # device-only throughput (synchronous steps; excludes the
        # test-tunnel syntax transfer) for the breakdown line
        r, t = warm[1], warm[2]
        t0 = time.perf_counter()
        for k in range(4):
            o = step(t, *r)
            r, t = o[1], o[2]
            jax.block_until_ready(o[0])
        dev_fps = 4 / (time.perf_counter() - t0)
        refs = r

        # timed loop, one frame in flight: pull frame N's syntax FIRST
        # (its compute finished last iteration), then dispatch N+1,
        # then run host entropy while the device encodes
        t_dev = t_ent = t_pull = 0.0
        nbytes = 0
        o = step(t, *refs)
        prev = o + (t, refs)
        t0 = time.perf_counter()
        for i in range(n_frames):
            tp = time.perf_counter()
            syn_np = pull1(prev)
            t_pull += time.perf_counter() - tp
            td = time.perf_counter()
            o = step(prev[2], *prev[1])                 # async
            cur = o + (prev[2], prev[1])
            t_dev += time.perf_counter() - td
            te = time.perf_counter()
            nbytes += entropy(syn_np)
            t_ent += time.perf_counter() - te
            prev = cur
        nbytes += entropy(pull1(prev))
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
        vstep = jax.jit(device_step_batched, donate_argnums=(1, 2, 3))
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

        def entropy_batch(wire, syn8, syn16):
            bw_ = np.asarray(wire)
            b8 = b16 = None

            def one(s):
                nonlocal b8, b16
                d = bw_[s, :DLEN].view(np.int8)
                syn_np = None
                if not d[0]:
                    syn_np = unpack_syn_sparse(
                        d, bw_[s, DLEN:].reshape(B, -1), MB_W, MB_H)
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
        entropy_batch(*warm[:3])

        prev = vstep(*batch(0), *warm[3])
        t0 = time.perf_counter()
        for i in range(n_frames):
            ent_args = prev[:3]
            cur = vstep(*batch(i), *prev[3])
            entropy_batch(*ent_args)
            prev = cur
        entropy_batch(*prev[:3])
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
