"""Count host<->device transfers per frame on the single-stream API path.

The r5 single-stream attribution (SINGLESTREAM_r05.json) measured ~76
h2d RPCs/frame on the default CRF+CABAC config — on the tunneled rig
(~24 ms/RPC) that is the 0.07 fps floor. This tool makes the number a
repeatable measurement: it runs Encoder.encode under
jax.transfer_guard("log") and counts the guard's stderr lines per
frame (the guard logs from C++, so the capture is an fd redirect, not
a logging handler).

Run: python tools/count_transfers.py  [--frames N] [--cavlc] [--cqp]
Ref: /root/reference/x264.c:145 (the CLI's per-frame encode loop).
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


class FdCapture:
    """Redirect OS-level fd 2 to a pipe file and count matching lines."""

    def __init__(self):
        import tempfile
        self.tmp = tempfile.NamedTemporaryFile(mode="w+", delete=False)

    def __enter__(self):
        sys.stderr.flush()
        self.saved = os.dup(2)
        os.dup2(self.tmp.fileno(), 2)
        self.start = self.tmp.tell()
        return self

    def __exit__(self, *exc):
        sys.stderr.flush()
        os.fsync(2)
        os.dup2(self.saved, 2)
        os.close(self.saved)
        return False

    def lines(self):
        self.tmp.flush()
        self.tmp.seek(0)
        data = self.tmp.read()
        return data.splitlines()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--w", type=int, default=176)
    ap.add_argument("--h", type=int, default=144)
    ap.add_argument("--cavlc", action="store_true",
                    help="CAVLC instead of the default CABAC")
    ap.add_argument("--cqp", action="store_true",
                    help="CQP 26 instead of the default CRF")
    ap.add_argument("--nomemo", action="store_true",
                    help="bypass the Encoder's device-constant memo "
                         "(the pre-fix upload behavior, for A/B)")
    args = ap.parse_args()

    import jax
    from x264dsp_tpu import params as P
    from x264dsp_tpu.api import Encoder, Picture

    p = P.Param()
    p.i_width, p.i_height = args.w, args.h
    p.i_fps_num, p.i_fps_den = 25, 1
    if args.cavlc:
        p.b_cabac = 0
    if args.cqp:
        p.rc.i_rc_method = P.RC_CQP
        p.rc.i_qp_constant = 26

    rng = np.random.default_rng(7)
    enc = Encoder(p)
    if args.nomemo:
        import jax.numpy as jnp
        enc._core._dev_const = lambda a: (
            jnp.asarray(int(a)) if isinstance(a, (int, np.integer))
            else jnp.asarray(np.asarray(a)))
    enc.headers()

    mb_w, mb_h = args.w // 16, args.h // 16
    per_frame = []
    for i in range(args.frames):
        y = rng.integers(0, 256, (args.h, args.w), np.uint8)
        u = rng.integers(0, 256, (args.h // 2, args.w // 2), np.uint8)
        v = rng.integers(0, 256, (args.h // 2, args.w // 2), np.uint8)
        pic = Picture.from_planes(y, u, v, pts=i)
        with jax.transfer_guard("log"):
            with FdCapture() as cap:
                enc.encode(pic)
        h2d = sum(1 for ln in cap.lines() if "host-to-device" in ln)
        d2h = sum(1 for ln in cap.lines() if "device-to-host" in ln)
        per_frame.append((h2d, d2h))
        print(f"frame {i}: h2d={h2d} d2h={d2h}", flush=True)

    # frames 0/1 pay compile+warmup transfers; steady state is the tail
    tail = per_frame[2:] or per_frame
    h2d = float(np.mean([t[0] for t in tail]))
    d2h = float(np.mean([t[1] for t in tail]))
    print(f"steady-state per frame: h2d={h2d:.1f} d2h={d2h:.1f}")


if __name__ == "__main__":
    main()
