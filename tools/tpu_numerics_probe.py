"""On-chip numerics probe: validates the exactness assumptions the
encoder's MXU formulations rest on, on the REAL TPU backend.

The CI suite runs on the CPU backend, where f32 dots are true f32 — it
cannot see TPU matmul-precision effects. This probe runs the
exactness-critical kernels on the attached chip and bit-compares against
the NumPy goldens:

1. What DEFAULT f32 dot precision does to >8-bit operands (documents
   the rig; the encoder no longer relies on it either way).
2. table_rows one-hot lookups with 19-bit table values (quant mf range).
3. Plane-resident DCT -> quant -> dequant -> IDCT round trip vs golden.
4. Pallas SAD cost surfaces vs golden.
5. The skewed deblock wavefront vs the XLA reference path.

Usage (needs the axon tunnel up):  python tools/tpu_numerics_probe.py
Exit code 0 = all exact.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/x264tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}{'  ' + detail if detail else ''}")
    return bool(ok)


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — this probe only proves anything "
              "on the TPU backend")
    rng = np.random.default_rng(0)
    ok = True

    # 1. document DEFAULT f32 dot behavior with 15-bit operands
    a = rng.integers(0, 1 << 15, (128, 128)).astype(np.float32)
    b = np.eye(128, dtype=np.float32)
    got = np.asarray(jax.jit(lambda x, y: x @ y)(a, b))
    exact = np.array_equal(got, a)
    print(f"INFO  DEFAULT f32 dot with 15-bit values is "
          f"{'EXACT' if exact else 'INEXACT (bf16-rounded)'} on this backend")

    # 2. table_rows with 19-bit values (custom-CQM quant mf range)
    from x264dsp_tpu.ops.transforms import table_rows
    table = jnp.asarray(rng.integers(0, 1 << 19, (6, 16)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 6, (8160,)).astype(np.int32))
    got = np.asarray(jax.jit(table_rows)(table, idx))
    want = np.asarray(table)[np.asarray(idx)]
    ok &= check("table_rows 19-bit lookup", np.array_equal(got, want))

    # 3. plane residual round trip vs golden (1 MB row at 1080p width)
    from x264dsp_tpu.ops import residual_plane as RP
    from x264dsp_tpu.ops import golden as G
    H, W = 64, 1920
    fenc = rng.integers(0, 256, (H, W)).astype(np.int32)
    pred = rng.integers(0, 256, (H, W)).astype(np.int32)
    qp = 30

    def dev_path(fenc, pred):
        cm = RP.sub_dct_cm(fenc, pred)
        q = RP.quant_cm(cm, jnp.full((H // 16, W // 16), qp, jnp.int32),
                        False, 4)
        dq = RP.dequant_cm(q, jnp.full((H // 16, W // 16), qp, jnp.int32), 4)
        return RP.idct_add_plane(pred, dq), q

    recon, q = jax.jit(dev_path)(jnp.asarray(fenc), jnp.asarray(pred))
    recon = np.asarray(recon)
    # golden: per-4x4-block scalar path
    want = np.empty_like(fenc)
    for by in range(H // 4):
        for bx in range(W // 4):
            sl = (slice(by * 4, by * 4 + 4), slice(bx * 4, bx * 4 + 4))
            d = G.sub4x4_dct(fenc[sl], pred[sl])
            qq, _ = G.quant_4x4(d, qp, intra=False)
            dd = G.dequant_4x4(qq, qp)
            want[sl] = G.add4x4_idct(pred[sl], dd)
    ok &= check("plane DCT/quant/dequant/IDCT round trip",
                np.array_equal(recon, want))

    # 4. Pallas SAD surfaces vs golden
    from x264dsp_tpu.ops.pallas import me_sad as MS
    mb_w, mb_h, R = 8, 2, 16
    fy = rng.integers(0, 256, (mb_h * 16, mb_w * 16)).astype(np.int32)
    pad = 32
    ref = rng.integers(0, 256, (mb_h * 16 + 2 * pad,
                                mb_w * 16 + 2 * pad)).astype(np.int32)
    strips = MS.make_ref_strips(jnp.asarray(ref), pad, mb_w, mb_h, R)
    got = np.asarray(MS.sad_cost_surfaces(
        jnp.asarray(fy), strips, mb_w, mb_h, R,
        interpret=jax.default_backend() != "tpu"))
    n = 2 * R + 1
    want = np.zeros((mb_h, mb_w, n, n), np.int64)
    for my in range(mb_h):
        for mx in range(mb_w):
            blk = fy[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
            for dy in range(-R, R + 1):
                for dx in range(-R, R + 1):
                    r0, c0 = my * 16 + pad + dy, mx * 16 + pad + dx
                    win = ref[r0:r0 + 16, c0:c0 + 16]
                    want[my, mx, dy + R, dx + R] = np.abs(blk - win).sum()
    ok &= check("pallas SAD cost surfaces", np.array_equal(got, want))

    # 5. deblock wavefront vs the plain XLA path (exercised by
    #    tests/test_deblock.py on CPU; here re-run on the chip)
    import subprocess
    env = dict(os.environ, X264_TEST_ON_TPU="1")
    r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-n", "0",
                        "tests/test_deblock.py", "tests/test_residual_plane.py"],
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), env=env)
    ok &= check("deblock + residual suites on this backend", r.returncode == 0)

    print("ALL EXACT" if ok else "NUMERICS FAILURES — see above")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
