"""Benchmark: 1080p encode throughput on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 300 fps/chip 1080p (BASELINE.md build target).

Measures the CONFORMANT 1080p pipeline in steady state WITH the
keyint-50 I-frame share (1 I per 50 frames, like the fork's default
GOP, common/common.c:51):
  device: P-frame encode (Pallas ME cost surfaces + MV decision +
          P-SKIP probe + plane-resident residual + device strengths) or
          the I-frame wavefront, + in-loop deblock + hpel reference
          update + the block-granular syntax wire pack
  host:   C++ CABAC entropy (real byte-aligned slice header) on the
          pulled wire, overlapped with the device encode of the next
          frame (the reference's row-lag pipeline, encoder.c:1359,
          reborn as frame-lag: frame N+1 is dispatched BEFORE frame N's
          wire is pulled, so transfer and entropy hide under compute).
End-to-end fps = frames / wall-clock including both stages.

A second stderr line reports the public-API path (cli.py flow: RC/AQ/
slicetype/headers on) on a short clip for cross-checking; its per-tensor
pulls pay ~20 tunnel RPCs/frame on this rig, which a PCIe host doesn't.

Env: BENCH_STREAMS=N (default 4) batches N independent streams
(BASELINE.json config 5); entropy then runs in a thread pool.
BENCH_FRAMES overrides the frame count. BENCH_API=0 skips the API line.
NOTE: this rig reaches the chip through a ~30 ms/RPC tunnel at
~30 MB/s; on a PCIe-attached host the transfer term is negligible.
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
KEYINT = 50


def make_synth_device():
    """Device-side synthetic 1080p clip: smooth gradient + two moving
    sinusoid textures + light noise (frames live in HBM — the tunnel's
    h2d would charge ~150 ms/frame of test-rig transfer to the encoder;
    real deployments ingest over PCIe at GB/s)."""
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


def synth_host_frame(t):
    """Host twin of make_synth_device for the API cross-check."""
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 2.0, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 96 + 48 * np.sin(yy / 97.0) + 32 * np.cos(xx / 131.0)
    dx, dy = 2.6 * t, 1.3 * t
    tex = (28 * np.sin((xx + dx) / 11.0 + (yy + dy) / 17.0)
           + 22 * np.cos((xx - 1.7 * dx) / 23.0))
    y = np.clip(base + tex + noise, 0, 255).astype(np.uint8)
    u = np.clip(120 + 40 * np.sin((xx[::2, ::2] + dx) / 53.0),
                0, 255).astype(np.uint8)
    v = np.clip(128 + 40 * np.cos((yy[::2, ::2] + dy) / 47.0),
                0, 255).astype(np.uint8)
    return y, u, v


def api_fps(n_frames=6):
    """Public-API path (cli.py flow) wall-clock fps on the same clip."""
    import x264dsp_tpu as xt
    from x264dsp_tpu import params as P
    p = xt.param_default()
    p.i_width, p.i_height = W, 1080
    frames = [synth_host_frame(t) for t in range(n_frames + 1)]
    frames = [(y[:1080], u[:540], v) for (y, u, v) in frames]
    enc = xt.Encoder(p)
    enc.headers()
    enc.encode(xt.Picture.from_planes(*frames[0]))   # warm compiles
    t0 = time.perf_counter()
    for f in frames[1:]:
        enc.encode(xt.Picture.from_planes(*f))
    dt = time.perf_counter() - t0
    enc.close()
    return n_frames / dt


def main():
    import jax
    import jax.numpy as jnp
    from x264dsp_tpu.encoder import intra_frame as IFR
    from x264dsp_tpu.encoder.inter_frame import (encode_p_frame,
                                                 pack_syn_blocks,
                                                 pack_syn_p, pack_syn_p8,
                                                 unpack_syn_blocks,
                                                 unpack_syn_p,
                                                 unpack_syn_p8)
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.entropy import native

    streams = int(os.environ.get("BENCH_STREAMS", "4"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "24"))
    qpc = QP  # chroma_qp_offset 0 at QP 26
    lam = 5

    zero_mb = jnp.zeros((MB_H, MB_W), jnp.int32)
    synth = make_synth_device()
    B = MB_W * MB_H
    DLEN = 5 + B * 20              # dense segment of the P wire

    def deblock(out, S, intra):
        mode = "all" if intra else "none"
        if intra:
            bs = jnp.full((S, MB_H, MB_W, 2, 4, 4), 3, jnp.int32)
            feo = jnp.zeros((S, MB_H, MB_W), jnp.int32)
            imb = jnp.ones((S, MB_H, MB_W), jnp.int32)
        else:
            bs, feo = out["bs"], out["feo"]
            imb = jnp.zeros((S, MB_H, MB_W), jnp.int32)
        dy, du, dv = DB.deblock_frame_skew_batched.__wrapped__(
            out["recon_y"], out["recon_u"], out["recon_v"], bs, imb,
            feo, QP, qpc, 0, 0, mb_w=MB_W, mb_h=MB_H, intra_mode=mode)
        return dy, du, dv

    def refs_of(dy, du, dv):
        return (jax.vmap(MC.make_ref_planes)(dy),
                jax.vmap(MC.pad_chroma)(du), jax.vmap(MC.pad_chroma)(dv))

    def p_step_batched(ts, ref4, refu, refv):
        """Batched conformant P step: encode + strengths + deblock +
        hpel reference update + the block wire, ONE jit."""
        fy, fu, fv = jax.vmap(synth)(ts)
        out = jax.vmap(lambda a, b, c, d, e, f: encode_p_frame.__wrapped__(
            a, b, c, d, e, f, QP, qpc, lam,
            mb_w=MB_W, mb_h=MB_H, me_range=16, mv_range=512,
            dct_decimate=True, me_parallel=True))(fy, fu, fv,
                                                  ref4, refu, refv)
        dy, du, dv = deblock(out, ts.shape[0], intra=False)
        dense, entries, _ = jax.vmap(
            lambda o: pack_syn_blocks(o, MB_W, MB_H))(out)
        wire = jnp.concatenate(
            [dense.astype(jnp.uint8),
             entries.reshape(ts.shape[0], -1)], axis=1)
        return wire, refs_of(dy, du, dv)

    def i_step_batched(ts):
        """Batched I step (keyint share): wavefront intra encode +
        intra deblock + reference update + int8 syntax wire."""
        fy, fu, fv = jax.vmap(synth)(ts)
        out = jax.vmap(lambda a, b, c: IFR.encode_i_frame(
            a, b, c, QP, qpc, lam, mb_w=MB_W, mb_h=MB_H,
            use_satd=True, i4x4_enabled=True))(fy, fu, fv)
        dy, du, dv = deblock(out, ts.shape[0], intra=True)
        wire = jax.vmap(lambda o: IFR.pack_syn_i8(o, MB_W, MB_H))(out)
        return wire, refs_of(dy, du, dv)

    @jax.jit
    def fallback_packs(ts, ref4, refu, refv):
        fy, fu, fv = jax.vmap(synth)(ts)
        out = jax.vmap(lambda a, b, c, d, e, f: encode_p_frame.__wrapped__(
            a, b, c, d, e, f, QP, qpc, lam,
            mb_w=MB_W, mb_h=MB_H, me_range=16, mv_range=512,
            dct_decimate=True, me_parallel=True))(fy, fu, fv,
                                                  ref4, refu, refv)
        return (jax.vmap(lambda o: pack_syn_p8(o, MB_W, MB_H))(out),
                jax.vmap(lambda o: pack_syn_p(o, MB_W, MB_H))(out))

    S = streams
    # no donation: the has-big fallback must be able to re-encode from
    # the previous refs after the next step was dispatched
    pstep = jax.jit(p_step_batched)
    istep = jax.jit(i_step_batched)

    # real byte-aligned CABAC P slice header for the default PPS
    from x264dsp_tpu.entropy.bitstream import BitWriter
    hw = BitWriter()
    hw.write_ue(0)            # first_mb
    hw.write_ue(5)            # slice_type P (+5)
    hw.write_ue(0)            # pps id
    hw.write(4, 1)            # frame_num (log2_max 4)
    hw.write1(0)              # num_ref_idx_override
    hw.write1(0)              # ref_pic_list_modification
    hw.write1(0)              # adaptive_ref_pic_marking
    hw.write_ue(0)            # cabac_init_idc
    hw.write_se(0)            # qp delta
    hw.write_ue(0)            # deblock idc
    hw.write_se(0)
    hw.write_se(0)
    hw.align_1()
    p_header = hw.get_bytes()

    def entropy_p(syn_np):
        res = native.write_slice_cabac(p_header, MB_W, MB_H, QP, 1, True,
                                       syn_np)
        assert res is not None, "native entropy library unavailable"
        return len(res[0])

    def entropy_i(syn_np):
        res = native.write_slice_cabac(p_header, MB_W, MB_H, QP, 0, False,
                                       syn_np)
        assert res is not None
        return len(res[0])

    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=min(max(S, 2), 8))

    def entropy_batch(prev):
        """Pull the previous step's wire (one host-visible array) and
        run host entropy for each stream in the pool."""
        kind, wire, fb_args = prev
        bw_ = np.asarray(wire)
        nbytes = 0
        if kind == "I":
            def one_i(s):
                syn = IFR.unpack_syn_i8(bw_[s].view(np.int8), MB_W, MB_H)
                assert syn is not None
                return entropy_i(syn)
            return sum(pool.map(one_i, range(S)))

        b8 = b16 = None

        def one_p(s):
            nonlocal b8, b16
            d = bw_[s, :DLEN].view(np.int8)
            syn = None
            if not d[0]:
                syn = unpack_syn_blocks(
                    d, bw_[s, DLEN:].reshape(-1, 12), MB_W, MB_H)
            if syn is None:       # rare has-big escape: re-encode
                if b8 is None:
                    syn8, syn16 = fallback_packs(*fb_args)
                    b8, b16 = np.asarray(syn8), syn16
                syn = unpack_syn_p8(b8[s], MB_W, MB_H)
                if syn is None:
                    if not isinstance(b16, np.ndarray):
                        b16 = np.asarray(b16)
                    syn = unpack_syn_p(b16[s], MB_W, MB_H)
            return entropy_p(syn)
        return sum(pool.map(one_p, range(S)))

    def batch_ts(i):
        # frame phase: triangle wave 1,2,3,4,3,2,... — steady |delta|=1
        # motion per frame (like a real pan) and enough distinct states
        # to defeat the runtime's execution memoization
        ph = i % 6
        t = 1 + ph if ph < 4 else 7 - ph
        return jnp.full((S,), float(t), jnp.float32)

    def dispatch(i, refs):
        if i % KEYINT == 0:
            wire, refs2 = istep(batch_ts(i))
            return ("I", wire, None), refs2
        wire, refs2 = pstep(batch_ts(i), *refs)
        return ("P", wire, (batch_ts(i),) + refs), refs2

    # bootstrap refs from an I step + warm all compiles (including the
    # has-big fallback — compiling it mid-loop would bill ~2 min of
    # compile to one frame)
    warm_i, refs = istep(batch_ts(0))
    entropy_batch(("I", warm_i, None))
    warm_p, refs = pstep(batch_ts(1), *refs)
    entropy_batch(("P", warm_p, None))
    jax.block_until_ready(fallback_packs(batch_ts(1), *refs))
    jax.block_until_ready(refs)

    # timed loop, one batch in flight: dispatch N+1, then pull + entropy
    # N while the device computes
    prev, refs = dispatch(2, refs)
    t0 = time.perf_counter()
    done = 0
    for i in range(n_frames):
        cur, refs = dispatch(3 + i, refs)
        entropy_batch(prev)
        done += S
        prev = cur
    entropy_batch(prev)
    done += S
    dt = time.perf_counter() - t0
    fps = done / dt
    print(f"steady pipeline: {fps:.2f} fps aggregate "
          f"({S} streams, {dt/ (n_frames+1) * 1e3:.1f} ms/batch, "
          f"keyint {KEYINT})", file=sys.stderr)

    if os.environ.get("BENCH_API", "1") != "0":
        try:
            afps = api_fps()
            print(f"public-API path: {afps:.2f} fps single-stream "
                  f"(per-tensor tunnel pulls; see module docstring)",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover - diagnostic only
            print(f"public-API path failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": (f"1080p IPPP+keyint{KEYINT} steady pipeline fps/chip "
                   f"({S}-stream aggregate: device encode+deblock+ref "
                   f"update + wire pull + C++ CABAC entropy)"),
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 300.0, 4),
    }))


if __name__ == "__main__":
    main()
