"""Quality-parity harness: run the BASELINE.json configs against the
reference C oracle and record PSNR/bitrate deltas per round.

Usage:
    python tools/parity.py [--out PARITY.json] [--configs 1,2,3,4]

For each config it encodes the same synthetic clip with this framework
and with the reference oracle build (tools/build_reference_oracle.sh),
decodes our stream with the conformance decoder (round-trip check), and
records {bitrate, PSNR} for both plus the deltas. The oracle takes no
flags (the fork's CLI parses only in/out filenames, x264.c:94-104), so
configs are expressed through the fork's DEFAULTS (CRF28, CABAC, DIA,
subme1, keyint 50) — config 1..4 vary resolution/content; our encoder is
run with matching parameters.

Results are written as JSON for the round artifacts (PARITY_r{N}.json).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/x264tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

import numpy as np  # noqa: E402


def synth_clip(w, h, n, seed=3, sensor_noise=2.0):
    """Deterministic natural-ish clip: moving textures + static detail
    noise + temporally-INDEPENDENT sensor noise.

    The per-frame sensor noise matters for fairness: a noise-free pure
    pan has exact sub-pel self-matches, which makes lookahead/ME costs
    (and therefore CRF/ABR QP choices) hypersensitive to search
    convergence order rather than to cost-model parity — real camera
    input always carries temporally-independent noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h * 2, 0:w * 2].astype(np.float32)
    base = (110 + 55 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
            + 25 * np.sin((xx + yy) / 7.0)
            + rng.normal(0, 3, (h * 2, w * 2))).clip(0, 255)
    nrng = np.random.default_rng(seed + 1000)
    frames = []
    for t in range(n):
        dx, dy = int(2.5 * t), int(1.25 * t)
        y = base[dy:dy + h, dx:dx + w]
        if sensor_noise > 0:
            y = y + np.round(nrng.normal(0, sensor_noise, y.shape))
        y = y.clip(0, 255).astype(np.uint8)
        u = (120 + 35 * np.sin((xx[:h:2, :w:2] + 3 * t) / 31.0)).clip(
            0, 255).astype(np.uint8)
        v = (128 + 35 * np.cos((yy[:h:2, :w:2] + 2 * t) / 29.0)).clip(
            0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def run_ours(frames, w, h, cfg):
    import x264dsp_tpu as xt
    from x264dsp_tpu import params as P

    p = xt.param_default()
    p.i_width, p.i_height = w, h
    for k, v in cfg.items():
        if k.startswith("rc."):
            setattr(p.rc, k[3:], v)
        elif k.startswith("analyse."):
            setattr(p.analyse, k[8:], v)
        else:
            setattr(p, k, v)
    enc = xt.Encoder(p)
    # no explicit header write: like the reference CLI at default
    # b_repeat_headers=1 (x264.c:231), SPS/PPS arrive in-band on the
    # first frame so our byte total matches the oracle file exactly
    total = 0
    stream = b""
    psnrs = []
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        stream += b"".join(n.payload for n in nals)
        total += sum(len(n.payload) for n in nals)
        psnrs.append(psnr(po.y, y))
    enc.close()

    # conformance: our own decoder must reproduce the recon exactly
    from h264_decode import Decoder
    dec = Decoder().decode(stream)
    assert len(dec) == len(frames), "decode frame count mismatch"
    dec_psnrs = [psnr(dy, fy) for (dy, _, _), (fy, _, _) in
                 zip(dec, frames)]
    return total, float(np.mean(psnrs)), float(np.mean(dec_psnrs))


def run_mesh8(n_frames=3, s=8, w=1920, h=1088):
    """BASELINE config 5 parity: 8-stream batched 1080p through
    parallel/mesh.py on the 8-virtual-device CPU mesh. Multi-sequence
    macroblock batching is a throughput axis, never an output axis —
    the batched encode must be tensor-identical per stream to the
    single-stream pipeline. Asserts identity on spot-checked streams
    and records recon PSNR of the batched run."""
    import jax
    import jax.numpy as jnp
    from x264dsp_tpu.parallel import mesh as M
    from x264dsp_tpu.encoder import intra_frame as IFR
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops import mc as MC

    mb_w, mb_h = w // 16, h // 16
    qp = qpc = 26
    lam = 5
    clips = [synth_clip(w, h, n_frames, seed=100 + si) for si in range(s)]

    def stack(t, plane):
        return jnp.stack([jnp.asarray(clips[si][t][plane])
                          for si in range(s)])

    def deblock_refs(out, intra):
        if intra:
            bs = jnp.full((mb_h, mb_w, 2, 4, 4), 3, jnp.int32)
            feo = jnp.zeros((mb_h, mb_w), jnp.int32)
            bs_s = jnp.broadcast_to(bs, (out["recon_y"].shape[0],) + bs.shape)
            feo_s = jnp.broadcast_to(feo, (out["recon_y"].shape[0],) + feo.shape)
        else:
            bs_s, feo_s = out["bs"], out["feo"]
        zero = jnp.zeros((mb_h, mb_w), jnp.int32)

        def post(y, u, v, bs1, feo1):
            dy, du, dv = DB.deblock_frame.__wrapped__(
                y, u, v, bs1, zero + (1 if intra else 0), feo1, qp, qpc,
                0, 0, mb_w=mb_w, mb_h=mb_h, use_pallas=None)
            return (dy, MC.make_ref_planes(dy), MC.pad_chroma(du),
                    MC.pad_chroma(dv))
        return jax.vmap(post)(out["recon_y"], out["recon_u"],
                              out["recon_v"], bs_s, feo_s)

    def run(streams_sel, mesh=None):
        """Encode I + (n-1) chained P steps for the selected streams."""
        sel = np.asarray(list(streams_sel))
        fy = stack(0, 0)[sel]
        fu = stack(0, 1)[sel]
        fv = stack(0, 2)[sel]
        if mesh is not None:
            fy, fu, fv = M.shard_streams(mesh, fy, fu, fv)
        outs = []
        out = M.encode_i_frames_batched(fy, fu, fv, qp, qpc, lam,
                                        mb_w=mb_w, mb_h=mb_h,
                                        use_satd=True, i4x4_enabled=True)
        dy, ref4, refu, refv = deblock_refs(out, intra=True)
        outs.append({k: np.asarray(v) for k, v in out.items()} |
                    {"deblocked_y": np.asarray(dy)})
        for t in range(1, n_frames):
            fy = stack(t, 0)[sel]
            fu = stack(t, 1)[sel]
            fv = stack(t, 2)[sel]
            if mesh is not None:
                fy, fu, fv = M.shard_streams(mesh, fy, fu, fv)
            out, (ref4, refu, refv) = M.encode_p_pipeline_batched(
                fy, fu, fv, ref4, refu, refv, qp, qpc, lam,
                mb_w=mb_w, mb_h=mb_h, me_range=16, mv_range=512,
                dct_decimate=True, me_parallel=True)
            outs.append({k: np.asarray(v) for k, v in out.items()})
        return outs

    mesh = M.make_stream_mesh()
    batched = run(range(s), mesh=mesh)

    # spot-check: streams 0 and s-1 re-encoded single-stream must match
    # the batched tensors exactly
    bitexact = True
    for si in (0, s - 1):
        single = run([si])
        for t, (b, o) in enumerate(zip(batched, single)):
            for k in o:
                if not np.array_equal(b[k][si], o[k][0]):
                    bitexact = False
                    print(f"MISMATCH stream {si} frame {t} field {k}")

    psnrs = []
    for si in range(s):
        crop = batched[0]["deblocked_y"][si][:clips[si][0][0].shape[0]]
        psnrs.append(psnr(crop, clips[si][0][0]))
        for t in range(1, n_frames):
            ry = batched[t]["recon_y"][si][:clips[si][t][0].shape[0]]
            psnrs.append(psnr(ry, clips[si][t][0]))
    return {"streams": s, "frames": n_frames,
            "bitexact_vs_single_stream": bool(bitexact),
            "devices": len(jax.devices()),
            "recon_psnr_y": round(float(np.mean(psnrs)), 3)}


def run_oracle(frames, w, h, workdir, env_cfg):
    """Encode with the reference via the env-configurable oracle CLI
    (tools/oracle/oracle_cli.c) at MATCHED settings."""
    oracle = Path(os.environ.get("X264_ORACLE_DIR", "/tmp/x264ref"))
    exe = oracle / "oracle_cli"
    if not exe.exists():
        subprocess.run(["bash", str(REPO / "tools/build_reference_oracle.sh"),
                        str(oracle)], check=True, capture_output=True)
    from x264dsp_tpu.utils.yuv import write_yuv
    yuv = Path(workdir) / f"{w}x{h}.yuv"
    out = Path(workdir) / "ref.264"
    write_yuv(str(yuv), frames)
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_cfg.items()})
    subprocess.run([str(exe), str(yuv), str(out)], check=True,
                   capture_output=True, env=env)
    size = out.stat().st_size
    from h264_decode import Decoder
    dec = Decoder().decode(out.read_bytes())
    psnrs = [psnr(dy, fy) for (dy, _, _), (fy, _, _) in zip(dec, frames)]
    return size, float(np.mean(psnrs))


# configs: name -> (w, h, n_frames, our-params, matched oracle env)
CONFIGS = {
    "1_qcif_intra_cavlc_cqp": dict(
        w=176, h=144, n=4,
        params={"b_cabac": 0, "rc.i_rc_method": 0, "rc.i_qp_constant": 26,
                "i_keyint_max": 1},
        oracle={"ORACLE_CABAC": 0, "ORACLE_QP": 26, "ORACLE_KEYINT": 1}),
    "2_cif_ippp_cavlc_cqp": dict(
        # subme=1 floor: the reference crashes at subme 0 (refine_subpel
        # assumes >= 1), so the "full-pel" config uses the fork's minimum
        w=352, h=288, n=6,
        params={"b_cabac": 0, "rc.i_rc_method": 0, "rc.i_qp_constant": 26,
                "analyse.i_subpel_refine": 1},
        oracle={"ORACLE_CABAC": 0, "ORACLE_QP": 26, "ORACLE_SUBME": 1}),
    "3_cif_ippp_subpel_deblock": dict(
        w=352, h=288, n=6,
        params={"b_cabac": 0, "rc.i_rc_method": 0, "rc.i_qp_constant": 26,
                "analyse.i_subpel_refine": 2},
        oracle={"ORACLE_CABAC": 0, "ORACLE_QP": 26, "ORACLE_SUBME": 2}),
    "4_cif_ippp_cabac_crf": dict(
        w=352, h=288, n=30,
        params={"b_cabac": 1, "rc.i_rc_method": 1,
                "rc.f_rf_constant": 28.0},
        oracle={"ORACLE_CABAC": 1, "ORACLE_CRF": 28}),
    "5_cif_partitions_multiref": dict(
        w=352, h=288, n=6,
        params={"b_cabac": 1, "rc.i_rc_method": 0, "rc.i_qp_constant": 26,
                "analyse.inter": 0x10, "i_frame_reference": 2,
                "analyse.i_subpel_refine": 2},
        oracle={"ORACLE_CABAC": 1, "ORACLE_QP": 26, "ORACLE_PSUB16": 1,
                "ORACLE_REF": 2, "ORACLE_SUBME": 2}),
    # BASELINE.json resolutions (VERDICT r2 item 4): the configs above
    # are the fast CI variants; these run the specified 720p/1080p
    # points with >= 30 frames so ABR's blurred-complexity window
    # converges (ratecontrol.c:1135-1146)
    "6_720p_ippp_subpel_deblock": dict(
        w=1280, h=720, n=30,
        params={"b_cabac": 0, "rc.i_rc_method": 0, "rc.i_qp_constant": 26,
                "analyse.i_subpel_refine": 2},
        oracle={"ORACLE_CABAC": 0, "ORACLE_QP": 26, "ORACLE_SUBME": 2}),
    "7_1080p_cabac_abr": dict(
        w=1920, h=1080, n=30,
        params={"b_cabac": 1, "rc.i_rc_method": 2, "rc.i_bitrate": 4000},
        oracle={"ORACLE_CABAC": 1, "ORACLE_BITRATE": 4000}),
    # fast ABR-dynamics twin of config 7 (CIF scale) for mbdiff RC
    # trajectory comparison
    "9_cif_cabac_abr": dict(
        w=352, h=288, n=30,
        params={"b_cabac": 1, "rc.i_rc_method": 2, "rc.i_bitrate": 400},
        oracle={"ORACLE_CABAC": 1, "ORACLE_BITRATE": 400}),
}


def main():
    # pin the 8-virtual-device CPU mesh (matches tests/conftest.py; the
    # image's axon hook force-registers the TPU platform otherwise)
    if os.environ.get("X264_PARITY_ON_TPU") != "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY.json")
    ap.add_argument("--configs",
                    default=",".join(CONFIGS) + ",8_1080p_8stream_mesh")
    ap.add_argument("--frames", type=int, default=0,
                    help="override per-config frame count (smoke runs)")
    args = ap.parse_args()
    all_names = list(CONFIGS) + ["8_1080p_8stream_mesh"]
    results = {}
    for name in args.configs.split(","):
        name = name.strip()
        # accept bare config numbers ("--configs 1,2") as prefixes
        if name not in all_names:
            hits = [n for n in all_names if n.split("_")[0] == name]
            if len(hits) != 1:
                raise SystemExit(f"unknown parity config {name!r}; "
                                 f"choose from {all_names}")
            name = hits[0]
        if name == "8_1080p_8stream_mesh":
            r = run_mesh8(n_frames=args.frames or 3)
            results[name] = r
            print(f"{name}: bitexact={r['bitexact_vs_single_stream']} "
                  f"recon {r['recon_psnr_y']:.2f} dB "
                  f"({r['streams']} streams x {r['frames']} frames, "
                  f"{r['devices']} devices)")
            continue
        if name not in CONFIGS:
            continue
        c = CONFIGS[name]
        frames = synth_clip(c["w"], c["h"], args.frames or c["n"])
        with tempfile.TemporaryDirectory() as td:
            ref_size, ref_psnr = run_oracle(frames, c["w"], c["h"], td,
                                            c["oracle"])
        our_size, our_psnr, dec_psnr = run_ours(frames, c["w"], c["h"],
                                                c["params"])
        assert abs(our_psnr - dec_psnr) < 1e-9, \
            "encoder/decoder recon mismatch"
        results[name] = {
            "ours": {"bytes": our_size, "psnr_y": round(our_psnr, 3)},
            "oracle": {"bytes": ref_size, "psnr_y": round(ref_psnr, 3)},
            "psnr_delta_db": round(our_psnr - ref_psnr, 3),
            "size_ratio": round(our_size / ref_size, 3),
        }
        print(f"{name}: ours {our_size} B / {our_psnr:.2f} dB, "
              f"oracle {ref_size} B / {ref_psnr:.2f} dB "
              f"(Δ {our_psnr - ref_psnr:+.2f} dB, "
              f"size ×{our_size / ref_size:.2f})")
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
