"""Benchmark: 1080p encode throughput on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 300 fps/chip 1080p (BASELINE.md build target).

Measures the PUBLIC API in steady state WITH the keyint-50 I-frame
share (1 I per 50 frames, the fork's default GOP, common/common.c:51):
the measured product is x264dsp_tpu.BatchEncoder — the multi-stream
public encoder (the reference's frame threading reborn as stream
batching, SURVEY §2.6) — fed device-resident frames over its zero-copy
ingest path. Each slot is ONE fused device dispatch (encode + deblock
strengths + device CAVLC + in-loop deblock + hpel reference pyramid,
refs donated in place); the host pulls the exact-size slice payloads
and frames the NALs for the previous slot while the device computes
the next (the reference's row-lag pipeline, encoder.c:1359, reborn as
slot-lag). End-to-end fps = frames / wall-clock including both stages.

A second stderr line reports the single-stream Encoder path (cli.py
flow: RC/AQ/slicetype/headers on) on a short clip for cross-checking.

Env: BENCH_STREAMS=N (default 8) batches N streams (BASELINE.json
config 5); BENCH_CALIBRATE=1 sweeps 8 vs 16 instead. BENCH_FRAMES
overrides the frame count. BENCH_API=0 skips the API line.
BENCH_PROFILE=1 prints the per-stage internal breakdown instead of
running the pipeline. BENCH_DEADLINE_S (default 900) is a global soft
budget: optional sections (profile, API cross-check) are skipped when
the remaining budget can't fit them, so the JSON line ALWAYS prints
(VERDICT r4 weak #1: a bench that times out records nothing).
NOTE: this rig reaches the chip through a ~30 ms/RPC tunnel at
~30 MB/s; on a PCIe-attached host the transfer term is negligible.
"""

import json
import os
import signal
import sys
import time

_T0 = time.monotonic()
_DEADLINE = float(os.environ.get("BENCH_DEADLINE_S", "900"))


def _remaining():
    return _DEADLINE - (time.monotonic() - _T0)


# filled in as soon as the headline is measured; the SIGTERM rescue
# prints it so even a driver-killed run records a parsed metric
_HEADLINE = {}


def _emit_json():
    if _HEADLINE and not _HEADLINE.get("_printed"):
        _HEADLINE["_printed"] = True
        rec = {k: v for k, v in _HEADLINE.items() if not k.startswith("_")}
        print(json.dumps(rec), flush=True)


def _on_term(signum, frame):  # pragma: no cover - timeout path
    print("bench: SIGTERM — emitting headline before exit",
          file=sys.stderr, flush=True)
    _emit_json()
    os._exit(124)


signal.signal(signal.SIGTERM, _on_term)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/x264tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

import numpy as np

from x264dsp_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()

if os.environ.get("BENCH_PLATFORM"):
    # this image's axon site hook overrides JAX_PLATFORMS, so a CPU
    # smoke run must pin the platform through jax.config instead
    import jax
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

W = int(os.environ.get("BENCH_W", "1920"))
H = int(os.environ.get("BENCH_H", "1088"))
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


def api_fps(n_frames=4):
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


def backend_ready(timeout_s: float) -> bool:
    """Probe jax backend init with a watchdog: this rig's TPU tunnel can
    wedge in a way that makes jax.devices() hang for hours, which would
    otherwise hang the whole bench run. The probe runs in a daemon
    thread so a hung init can't block process exit."""
    import threading
    ok = []

    def probe():
        try:
            import jax
            ok.append(len(jax.devices()))
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    if not backend_ready(float(os.environ.get("BENCH_INIT_TIMEOUT",
                                              "600"))):
        print("bench: jax backend init did not complete within the "
              "watchdog window (wedged TPU tunnel?) — failing fast "
              "instead of hanging; set BENCH_INIT_TIMEOUT to extend",
              file=sys.stderr)
        sys.exit(1)
    import jax
    import jax.numpy as jnp
    from x264dsp_tpu.encoder import intra_frame as IFR
    from x264dsp_tpu.encoder.inter_frame import encode_p_frame
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.entropy import native
    from x264dsp_tpu.entropy import cavlc_device as CD

    streams = int(os.environ.get("BENCH_STREAMS", "4"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "24"))
    qpc = QP  # chroma_qp_offset 0 at QP 26
    lam = 5

    zero_mb = jnp.zeros((MB_H, MB_W), jnp.int32)
    synth = make_synth_device()
    B = MB_W * MB_H
    # per-stream payload cap for the device CAVLC pack (worst bench
    # frame measured ~125 KB)
    CAP_S = 256 * 1024

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
            feo, QP, qpc, 0, 0, mb_w=MB_W, mb_h=MB_H, intra_mode=mode,
            interpret=jax.default_backend() != "tpu")
        return dy, du, dv

    def refs_of(dy, du, dv):
        return (jax.vmap(MC.make_ref_planes)(dy),
                jax.vmap(MC.pad_chroma)(du), jax.vmap(MC.pad_chroma)(dv))

    # CAVLC P slice header (baseline profile, the BASELINE.json north
    # star): first_mb, slice_type P, pps, frame_num, flags, dqp,
    # deblock idc + offsets
    from x264dsp_tpu.entropy.bitstream import BitWriter
    hw = BitWriter()
    hw.write_ue(0)
    hw.write_ue(5)
    hw.write_ue(0)
    hw.write(4, 1)
    hw.write1(0)
    hw.write1(0)
    hw.write1(0)
    hw.write_se(0)
    hw.write_ue(0)
    hw.write_se(0)
    hw.write_se(0)
    hv_np, hl_np = CD.header_elements(*hw.get_unaligned())
    hv_j, hl_j = jnp.asarray(hv_np), jnp.asarray(hl_np)

    def p_step_batched(fy, fu, fv, ref4, refu, refv):
        """Batched conformant P step: encode + strengths + deblock +
        hpel reference update + the DEVICE CAVLC entropy stage, ONE
        jit. The wire pulled to the host is the packed slice payloads
        themselves (entropy/cavlc_device.py) — the host only escapes
        and frames the NALs. Frames arrive as device arrays: clip
        synthesis is NOT the encoder's work (a real deployment ingests
        over PCIe), so it happens outside the timed step."""
        S = fy.shape[0]
        out = jax.vmap(lambda a, b, c, d, e, f: encode_p_frame.__wrapped__(
            a, b, c, d, e, f, QP, qpc, lam,
            mb_w=MB_W, mb_h=MB_H, me_range=16, mv_range=512,
            dct_decimate=True, me_method=0, subme=1))(fy, fu, fv,
                                                      ref4, refu, refv)
        dy, du, dv = deblock(out, S, intra=False)
        syn = {k: out[k] for k in
               ("partition", "ref", "cbp_luma", "cbp_chroma", "mv8",
                "luma_levels", "chroma_dc_levels", "chroma_ac_levels")}
        qp_mb = jnp.full((S, MB_H, MB_W), QP, jnp.int32)
        payload, off, n_skip, ov = CD.cavlc_p_payload_batched(
            syn, qp_mb, QP, 1, MB_H, MB_W, hv_j, hl_j,
            cap_bytes=CAP_S * S)
        return (payload, off, ov), refs_of(dy, du, dv)

    # device CAVLC I slice header (IDR)
    hwi = BitWriter()
    hwi.write_ue(0)           # first_mb
    hwi.write_ue(7)           # slice_type I (+5)
    hwi.write_ue(0)           # pps id
    hwi.write(4, 0)           # frame_num
    hwi.write_ue(0)           # idr_pic_id
    hwi.write1(0)             # no_output_of_prior_pics
    hwi.write1(0)             # long_term_reference
    hwi.write_se(0)           # qp delta
    hwi.write_ue(0)           # deblock idc
    hwi.write_se(0)
    hwi.write_se(0)
    ihv_np, ihl_np = CD.header_elements(*hwi.get_unaligned())
    ihv_j, ihl_j = jnp.asarray(ihv_np), jnp.asarray(ihl_np)

    def i_step_batched(fy, fu, fv):
        """Batched I step (keyint share): wavefront intra encode +
        intra deblock + reference update + device CAVLC entropy."""
        S = fy.shape[0]
        out = jax.vmap(lambda a, b, c: IFR.encode_i_frame_best(
            a, b, c, QP, qpc, lam, mb_w=MB_W, mb_h=MB_H,
            use_satd=True, i4x4_enabled=True))(fy, fu, fv)
        dy, du, dv = deblock(out, S, intra=True)
        syn = {k: out[k] for k in
               ("mb_type", "i16_mode", "i4_modes", "chroma_mode",
                "cbp_luma", "cbp_chroma", "nz_luma_dc", "luma_levels",
                "luma_dc_levels", "chroma_dc_levels",
                "chroma_ac_levels")}
        qp_mb = jnp.full((S, MB_H, MB_W), QP, jnp.int32)
        payload, off, ov = CD.cavlc_i_payload_batched(
            syn, qp_mb, QP, MB_H, MB_W, ihv_j, ihl_j,
            cap_bytes=2 * CAP_S * S)
        return (payload, off, ov), refs_of(dy, du, dv)

    S = streams
    # donate the previous reference pyramid: each step consumes refs
    # exactly once and emits the next set, so XLA can write the new
    # hpel planes in place instead of holding both generations in HBM
    pstep = jax.jit(p_step_batched, donate_argnums=(3, 4, 5))
    istep = jax.jit(i_step_batched)
    synthb = jax.jit(lambda ts: jax.vmap(synth)(ts))

    def frame_ring(S):
        """Device-resident 6-phase frame ring (triangle wave 1,2,3,4,
        3,2 — steady |delta|=1 motion like a real pan): the clip is
        synthesized ONCE outside the timed loop."""
        ring = {}
        for t in (1, 2, 3, 4):
            ring[t] = synthb(jnp.full((S,), float(t), jnp.float32))
        jax.block_until_ready(ring)
        return ring

    def stage_profile(K=4):
        """Per-stage breakdown of the BATCHED pipeline (memoization-proof
        unique-input sweeps, tunnel round-trip amortized). Returns
        {stage: ms_per_batch} — embedded in the bench JSON so a round
        record is always attributable (VERDICT r3 weak #3)."""
        prof = {}

        # block_until_ready does NOT reliably wait for device completion
        # on this tunneled runtime (see tools/tputime.py): the only
        # trustworthy sync is pulling one element of one output leaf.
        # r4's profile numbers were sync'd by luck of dispatch depth;
        # this sweep syncs explicitly and subtracts the RPC baseline.
        def _pull1(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(jax.device_get(leaf.ravel()[0]))

        _triv = jax.jit(lambda x, i: x * i)
        _xb = jnp.ones((8, 128))
        _pull1(_triv(_xb, jnp.float32(0)))
        _bts = []
        for i in range(1, 6):
            t0 = time.perf_counter()
            _pull1(_triv(_xb, jnp.float32(i)))
            _bts.append(time.perf_counter() - t0)
        base = float(np.median(_bts))
        print(f"tunnel round-trip baseline: {base*1e3:.1f} ms",
              file=sys.stderr)

        def sweep(name, fn, argsets):
            # sync every argset's producer chain first: async dispatch
            # would charge upstream stage calls to this stage
            for a in argsets:
                _pull1(a)
            _pull1(fn(*argsets[0]))            # compile + warm
            ts = []
            for a in argsets:
                t0 = time.perf_counter()
                _pull1(fn(*a))
                ts.append(time.perf_counter() - t0)
            dt = max(0.0, float(np.median(ts)) - base)
            prof[name] = round(dt * 1e3, 2)
            print(f"{name:34s} {dt*1e3:8.2f} ms/batch  "
                  f"({dt*1e3/S:6.2f} ms/frame)", file=sys.stderr)
            return fn(*argsets[0])

        ring = frame_ring(S)
        fsets = [ring[1 + k] for k in range(K)]

        sweep("synth (batched, untimed in runs)", synthb,
              [(jnp.full((S,), float(1 + k), jnp.float32),)
               for k in range(K)])

        _, refs0 = istep(*fsets[0])
        jax.block_until_ready(refs0)

        encb = jax.jit(lambda fy, fu, fv, r4, ru, rv: jax.vmap(
            lambda a, b, c, d, e, f: encode_p_frame.__wrapped__(
                a, b, c, d, e, f, QP, qpc, lam, mb_w=MB_W, mb_h=MB_H,
                me_range=16, mv_range=512, dct_decimate=True,
                me_method=0, subme=1))(fy, fu, fv, r4, ru, rv))
        out0 = sweep("P encode (no deblock/entropy)", encb,
                     [f + refs0 for f in fsets])

        dbb = jax.jit(lambda o: deblock(o, S, intra=False))
        sweep("deblock (skew, batched)", dbb, [(encb(*f, *refs0),)
                                               for f in fsets])
        dy0, du0, dv0 = dbb(out0)
        refb = jax.jit(refs_of)
        sweep("hpel ref update", refb, [(dbb(encb(*f, *refs0)))
                                        for f in fsets])

        def cavlc_only(o):
            syn = {k: o[k] for k in
                   ("partition", "ref", "cbp_luma", "cbp_chroma", "mv8",
                    "luma_levels", "chroma_dc_levels", "chroma_ac_levels")}
            qp_mb = jnp.full((S, MB_H, MB_W), QP, jnp.int32)
            return CD.cavlc_p_payload_batched(
                syn, qp_mb, QP, 1, MB_H, MB_W, hv_j, hl_j,
                cap_bytes=CAP_S * S)
        cvb = jax.jit(cavlc_only)
        sweep("device CAVLC (batched)", cvb, [(encb(*f, *refs0),)
                                              for f in fsets])
        # undonated variant: the sweep reuses refs0 across calls
        sweep("FUSED P step (all stages)", jax.jit(p_step_batched),
              [f + refs0 for f in fsets])
        sweep("FUSED I step", istep, [f for f in fsets])

        wire0, _ = pstep(*fsets[0], *refs0)
        jax.block_until_ready(wire0)
        payload, off, ov = wire0
        t0 = time.perf_counter()
        off_np = np.asarray(off)
        raw = np.asarray(payload[:int(off_np[-1])])
        for s in range(S):
            body = raw[off_np[s]:off_np[s + 1]].tobytes()
            native.nal_escape(body)
        dt = (time.perf_counter() - t0) * 1e3
        prof["host pull+escape+frame"] = round(dt, 2)
        print(f"{'host pull+escape+frame':34s} {dt:8.2f} ms/batch",
              file=sys.stderr)
        return prof

    if os.environ.get("BENCH_PROFILE") == "1":
        stage_profile()
        return

    def run_pipeline(S, frames):
        """Warm + run the PUBLIC BatchEncoder at batch size S; returns
        (aggregate fps, ms/batch, worker_crashes). The encoder's
        internal one-slot pipelining overlaps host entropy with device
        compute.

        This rig's tunneled TPU worker sporadically crashes/restarts
        under sustained load (jax UNAVAILABLE: "TPU worker process
        crashed or restarted" — seen across unrelated programs and
        iterations). A crash loses the device-resident ring and refs;
        the loop re-synthesizes, re-warms (compile caches survive) and
        continues, excluding the recovery time from the fps clock but
        recording the crash count in the artifact."""
        import x264dsp_tpu as xt
        import jax
        p = xt.param_default()
        p.i_width, p.i_height = W, H
        p.b_cabac = 0
        p.rc.i_rc_method = xt.RC_CQP
        p.rc.i_qp_constant = QP
        p.i_keyint_max = KEYINT
        p.i_scenecut_threshold = 0

        state = {}

        def fresh():
            state["enc"] = xt.BatchEncoder(p, S)
            state["ring"] = frame_ring(S)

        def batch_frames(i):
            # frame phase: triangle wave 1,2,3,4,3,2,... — steady
            # |delta|=1 motion per frame (like a real pan); the 6-phase
            # device-resident ring was synthesized before the timed loop
            ph = i % 6
            t = 1 + ph if ph < 4 else 7 - ph
            return state["ring"][t]

        fresh()
        # warm both compiles (I at slot 0, P at slot 1) + the pulls
        state["enc"].encode_batch(batch_frames(0))
        state["enc"].encode_batch(batch_frames(1))
        state["enc"].encode_batch(None)

        done = 0
        nbytes = 0
        crashes = 0
        timed = 0.0
        i = 0
        t0 = time.perf_counter()
        while i < frames:
            try:
                out = state["enc"].encode_batch(batch_frames(2 + i))
                if out is not None:
                    done += S
                    nbytes += sum(len(n.payload)
                                  for nl in out for n in nl)
                i += 1
            except jax.errors.JaxRuntimeError as e:
                timed += time.perf_counter() - t0
                crashes += 1
                print(f"bench: TPU worker fault at batch {i} "
                      f"({str(e)[:90]}) — recovering", file=sys.stderr,
                      flush=True)
                if crashes > 3 or _remaining() < 180:
                    break
                try:
                    state["enc"].close()
                except Exception:
                    pass
                try:
                    fresh()
                    state["enc"].encode_batch(batch_frames(2 + i))
                    state["enc"].encode_batch(None)
                except Exception as e2:   # tunnel fully wedged
                    print(f"bench: recovery failed ({str(e2)[:90]})",
                          file=sys.stderr, flush=True)
                    break
                i += 1
                t0 = time.perf_counter()
        timed += time.perf_counter() - t0
        try:
            out = state["enc"].encode_batch(None)
            done += S
        except Exception:
            pass
        state["enc"].close()
        n_timed = max(done // S, 1)
        return done / timed, timed / n_timed * 1e3, crashes

    if os.environ.get("BENCH_STREAMS"):
        S = streams
    elif os.environ.get("BENCH_CALIBRATE") == "1":
        # optional sweep: batching amortization vs HBM pressure trade
        # differently per chip; NOT the default (r4's S=16 probe hit a
        # flaky remote compile and blew the driver budget)
        best = None
        for cand in (8, 16):
            try:
                f, ms, _ = run_pipeline(cand, 6)
            except Exception as e:  # HBM OOM at the larger batch
                print(f"calibrate S={cand}: skipped "
                      f"({type(e).__name__}: {str(e)[:120]})",
                      file=sys.stderr)
                continue
            print(f"calibrate S={cand}: {f:.2f} fps aggregate "
                  f"({ms:.1f} ms/batch)", file=sys.stderr)
            if best is None or f > best[1]:
                best = (cand, f)
        S = best[0]
    else:
        S = 8

    fps, msb, crashes = run_pipeline(S, n_frames)
    print(f"steady pipeline (public BatchEncoder): {fps:.2f} fps "
          f"aggregate ({S} streams, {msb:.1f} ms/batch, keyint "
          f"{KEYINT}, {crashes} worker faults)", file=sys.stderr,
          flush=True)
    _HEADLINE.update({
        "metric": (f"{W}x{H} IPPP+keyint{KEYINT} baseline-profile "
                   f"fps/chip through the PUBLIC BatchEncoder API "
                   f"({S}-stream aggregate: fused device encode+deblock"
                   f"+hpel refs+device CAVLC in one dispatch, host "
                   f"payload pull + NAL framing overlapped)"),
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 300.0, 4),
        "streams": S,
        "ms_per_batch": round(msb, 1),
        "tpu_worker_faults": crashes,
    })

    # per-stage breakdown embedded in the round artifact so the record
    # is attributable even when later runs can't reach the chip.
    # budget-gated: the headline is already secured above.
    if _remaining() > 300:
        try:
            _HEADLINE["profile_ms_per_batch"] = stage_profile(K=2)
        except Exception as e:  # pragma: no cover - diagnostic only
            _HEADLINE["profile_ms_per_batch"] = {
                "error": f"{type(e).__name__}: {str(e)[:200]}"}
    else:
        print(f"profile skipped ({_remaining():.0f} s left of "
              f"BENCH_DEADLINE_S={_DEADLINE:.0f})", file=sys.stderr)

    if os.environ.get("BENCH_API", "1") != "0" and _remaining() > 240:
        try:
            afps = api_fps()
            print(f"public-API path: {afps:.2f} fps single-stream "
                  f"(per-tensor tunnel pulls; see module docstring)",
                  file=sys.stderr)
            _HEADLINE["api_single_stream_fps"] = round(afps, 3)
        except Exception as e:  # pragma: no cover - diagnostic only
            print(f"public-API path failed: {e}", file=sys.stderr)
    elif os.environ.get("BENCH_API", "1") != "0":
        print(f"API cross-check skipped ({_remaining():.0f} s left)",
              file=sys.stderr)

    _emit_json()


if __name__ == "__main__":
    main()
