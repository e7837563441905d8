"""Config-7 parity at MATCHED bitrate (VERDICT r3 weak #4 / task #5).

The recorded config 7 (tools/parity.py, 1080p 30-frame ABR 4000 kbps)
sits at -0.065 dB vs the oracle — but at x0.984 of its bits: our ABR
undershoots the ask slightly (stronger lowres ME -> lower measured
complexity -> the QP trajectory sits one step lower, README
"Performance notes"). A PSNR delta at unequal bits is not a
rate-distortion verdict. This tool turns the claim into a recorded
fact, two ways:

1. matched-bitrate point: re-run ours with the ask scaled so our
   ACHIEVED bytes land within 0.5% of the oracle's achieved bytes
   (one secant-step iteration), then compare PSNR at equal bits —
   the direct analog of the reference's own "final ratefactor"
   convergence check (ratecontrol.c:482-493).
2. 4-point BD-PSNR: both encoders swept over {2500, 4000, 5500, 7000}
   kbps; the standard Bjontegaard cubic fit in log-rate integrates the
   PSNR gap over the overlapping rate range.

Writes PARITY_BD7.json. Run on the CPU backend (like parity.py) for
record parity with PARITY.json.
"""

from __future__ import annotations

import json
import os
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


def bd_psnr(rate_a, psnr_a, rate_b, psnr_b):
    """Bjontegaard delta-PSNR of curve B vs curve A (positive = B
    better), cubic fit of PSNR over log10(rate), integrated over the
    overlapping log-rate range."""
    la, lb = np.log10(rate_a), np.log10(rate_b)
    pa = np.polyfit(la, psnr_a, 3)
    pb = np.polyfit(lb, psnr_b, 3)
    lo = max(la.min(), lb.min())
    hi = min(la.max(), lb.max())
    ia = np.polyval(np.polyint(pa), [lo, hi])
    ib = np.polyval(np.polyint(pb), [lo, hi])
    return ((ib[1] - ib[0]) - (ia[1] - ia[0])) / (hi - lo)


def main():
    if os.environ.get("X264_PARITY_ON_TPU") != "1":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from parity import CONFIGS, run_oracle, run_ours, synth_clip

    cfg = CONFIGS["7_1080p_cabac_abr"]
    w, h, n = cfg["w"], cfg["h"], cfg["n"]
    frames = synth_clip(w, h, n)
    out = {}

    bitrates = [int(b) for b in os.environ.get(
        "BD_BITRATES", "2500,4000,5500,7000").split(",")]
    out_path = Path(os.environ.get("BD_OUT", "PARITY_BD7.json"))

    def dump(partial: bool):
        # incremental writes: a time-boxed run still records every
        # completed point (VERDICT r4 weak #1 — artifacts must not be
        # all-or-nothing on a budgeted rig)
        rec = dict(out)
        if partial:
            rec["partial"] = True
        out_path.write_text(json.dumps(rec, indent=2) + "\n")

    ours_pts, oracle_pts = [], []
    for r in bitrates:
        with tempfile.TemporaryDirectory() as td:
            osize, opsnr = run_oracle(frames, w, h, td,
                                      {"ORACLE_CABAC": 1,
                                       "ORACLE_BITRATE": r})
        usize, upsnr, _ = run_ours(frames, w, h,
                                   {"b_cabac": 1, "rc.i_rc_method": 2,
                                    "rc.i_bitrate": r})
        ours_pts.append((usize, upsnr))
        oracle_pts.append((osize, opsnr))
        print(f"ask {r} kbps: ours {usize} B / {upsnr:.3f} dB, "
              f"oracle {osize} B / {opsnr:.3f} dB", flush=True)
        out["bd_points"] = {
            "bitrates_kbps": bitrates[:len(ours_pts)],
            "ours": [{"bytes": int(b), "psnr_y": round(float(p), 3)}
                     for b, p in ours_pts],
            "oracle": [{"bytes": int(b), "psnr_y": round(float(p), 3)}
                       for b, p in oracle_pts],
        }
        dump(partial=True)
    if len(bitrates) >= 4:
        ub = np.array([p[0] for p in ours_pts], float)
        up = np.array([p[1] for p in ours_pts])
        ob = np.array([p[0] for p in oracle_pts], float)
        op = np.array([p[1] for p in oracle_pts])
        out["bd_psnr_db_ours_minus_oracle"] = round(
            float(bd_psnr(ob, op, ub, up)), 4)

    # matched-bitrate point at the headline 4000 kbps ask: scale our ask
    # so our achieved bytes land on the oracle's, one secant iteration
    o4 = oracle_pts[bitrates.index(4000)] if 4000 in bitrates else None
    if o4 is not None:
        target = o4[0]
        u4 = ours_pts[bitrates.index(4000)]
        ask = 4000 * target / u4[0]
        for _ in range(2):
            usize, upsnr, _ = run_ours(
                frames, w, h, {"b_cabac": 1, "rc.i_rc_method": 2,
                               "rc.i_bitrate": int(round(ask))})
            print(f"matched ask {ask:.0f} kbps: ours {usize} B / "
                  f"{upsnr:.3f} dB (target {target} B)", flush=True)
            out["matched_bitrate_4000"] = {
                "ours": {"bytes": int(usize), "psnr_y": round(upsnr, 3),
                         "ask_kbps": int(round(ask))},
                "oracle": {"bytes": int(target),
                           "psnr_y": round(o4[1], 3)},
                "size_ratio": round(usize / target, 4),
                "psnr_delta_db_at_matched_bits": round(upsnr - o4[1], 3),
            }
            dump(partial=True)
            if abs(usize / target - 1) <= 0.005:
                break
            ask *= target / usize

    dump(partial=False)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
