"""Benchmark: device intra-encode throughput on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 300 fps/chip 1080p (BASELINE.md build target).

Round 1 scope: the all-intra device pipeline (wavefront mode decision +
full residual encode + reconstruction). Inter P, CABAC and the native host
entropy stage land in later rounds; the metric name states what is
measured so rounds are comparable.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    from x264dsp_tpu.encoder.intra_frame import encode_i_frame

    w, h = 1920, 1088
    mb_w, mb_h = w // 16, h // 16
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)

    qp, qpc, lam = 26, 26, 5

    def run():
        out = encode_i_frame(y, u, v, qp, qpc, lam, mb_w=mb_w, mb_h=mb_h,
                             use_satd=False, i4x4_enabled=True)
        jax.block_until_ready(out["recon_y"])
        return out

    run()  # compile
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        run()
    dt = time.perf_counter() - t0
    fps = n / dt

    print(json.dumps({
        "metric": "1080p all-intra device-pipeline fps/chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 300.0, 4),
    }))


if __name__ == "__main__":
    main()
