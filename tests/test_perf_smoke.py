"""Per-kernel performance regression smoke (real chip only).

The reference tracked per-kernel cycle budgets in the .sa headers
(pixel-a.sa:11-40 etc.); this is the TPU rebirth: assert ms budgets for
the hot 1080p kernels so a kernel regression fails CI instead of
silently landing. Round 5 tightened the budgets to ~1.3-1.5x of the
fresh per-frame numbers from the r5 S=8 stage profile (BENCH r5:
P encode 38.7 ms/frame, deblock 6.2, hpel 1.2, device CAVLC 8.3) —
single-stream runs lack batch amortization, hence the margin.

Runs ONLY with X264_TEST_ON_TPU=1 on a real chip; the CPU suite skips
it (CPU times are meaningless for these budgets).
"""

import os
import time

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("X264_TEST_ON_TPU") != "1",
    reason="perf budgets only hold on the real chip (X264_TEST_ON_TPU=1)")

W, H = 1920, 1088
MB_W, MB_H = W // 16, H // 16
QP, QPC, LAM, R = 26, 26, 5, 16
K = 4  # unique input sets per sweep (defeats execution memoization)


@pytest.fixture(scope="module")
def rig():
    import jax
    import jax.numpy as jnp
    from x264dsp_tpu.ops import mc as MC

    if jax.devices()[0].platform == "cpu":
        pytest.skip("no TPU attached")

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H + 8, W + 8), dtype=np.uint8)
    fys = [jnp.asarray(base[k:k + H, k:k + W]) for k in range(K)]
    fus = [jnp.asarray(base[k:k + H // 2, k:k + W // 2]) for k in range(K)]
    fvs = [jnp.asarray(base[k + 1:k + 1 + H // 2, k:k + W // 2])
           for k in range(K)]
    rys = [jnp.asarray(base[k + 2:k + 2 + H, k + 1:k + 1 + W])
           for k in range(K)]
    mrp = jax.jit(MC.make_ref_planes)
    pc = jax.jit(MC.pad_chroma)
    ref4s = [mrp(r) for r in rys]
    refus = [pc(f) for f in fus[::-1]]
    refvs = [pc(f) for f in fvs[::-1]]
    jax.block_until_ready((ref4s, refus, refvs))
    return dict(fys=fys, fus=fus, fvs=fvs, ref4s=ref4s, refus=refus,
                refvs=refvs)


def _pull1(out):
    """True device sync: block_until_ready does not reliably wait on the
    tunneled runtime (see tools/tputime.py / bench.py stage_profile) —
    pull one element of one output leaf instead."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _rpc_baseline():
    import jax
    import jax.numpy as jnp
    triv = jax.jit(lambda x, i: x * i)
    xb = jnp.ones((8, 128))
    _pull1(triv(xb, jnp.float32(0)))
    ts = []
    for i in range(1, 6):
        t0 = time.perf_counter()
        _pull1(triv(xb, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def sweep_ms(fn, argsets):
    """Warm on argsets[0], then median ms over the unique-input sweep,
    each call synced by an output pull, minus the RPC round-trip."""
    base = _rpc_baseline()
    for a in argsets:
        _pull1(a)
    _pull1(fn(*argsets[0]))
    ts = []
    for a in argsets:
        t0 = time.perf_counter()
        _pull1(fn(*a))
        ts.append(time.perf_counter() - t0)
    return max(0.0, float(np.median(ts)) - base) * 1e3


def test_me_sad_surfaces_budget(rig):
    import jax
    import jax.numpy as jnp
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops.pallas.me_sad import (make_ref_strips,
                                               sad_cost_surfaces_8x8)
    mk = jax.jit(lambda r: make_ref_strips(r, MC.PAD_MC, MB_W, MB_H, R))
    strips = [mk(r[0]) for r in rig["ref4s"]]
    sad = jax.jit(lambda f, s: sad_cost_surfaces_8x8(
        f.astype(jnp.int32), s, mb_w=MB_W, mb_h=MB_H, R=R))
    ms = sweep_ms(sad, list(zip(rig["fys"], strips)))
    assert ms < 4.0, f"sad_cost_surfaces_8x8 {ms:.2f} ms (budget 4)"


def test_deblock_skew_budget(rig):
    import jax
    import jax.numpy as jnp
    from x264dsp_tpu.ops import deblock as DB
    bs = jnp.full((MB_H, MB_W, 2, 4, 4), 2, jnp.int32)
    imb = jnp.zeros((MB_H, MB_W), jnp.int32)
    feo = jnp.zeros((MB_H, MB_W), jnp.int32)
    fn = jax.jit(lambda y, u, v: DB.deblock_frame_skew_batched.__wrapped__(
        y[None].astype(jnp.int32), u[None].astype(jnp.int32),
        v[None].astype(jnp.int32), bs[None], imb[None], feo[None],
        QP, QPC, 0, 0, mb_w=MB_W, mb_h=MB_H, intra_mode="none"))
    ms = sweep_ms(fn, list(zip(rig["fys"], rig["fus"], rig["fvs"])))
    assert ms < 12.0, f"deblock skew {ms:.2f} ms (budget 12)"


def test_p_residual_budget(rig):
    import jax
    import jax.numpy as jnp
    from x264dsp_tpu.encoder import inter_frame as IF
    from x264dsp_tpu.ops import mcgather as MG
    wins4 = jax.jit(lambda r: MG.luma_windows(r, MB_W, MB_H))(rig["ref4s"][0])
    winsu = jax.jit(lambda u: MG.chroma_windows(u, MB_W, MB_H))(rig["refus"][0])
    winsv = jax.jit(lambda u: MG.chroma_windows(u, MB_W, MB_H))(rig["refvs"][0])
    mv8 = jnp.zeros((MB_H, MB_W, 2, 2, 2), jnp.int32)
    fn = jax.jit(lambda f, u, v: IF.encode_p_residual(
        f, u, v, wins4, winsu, winsv, mv8, QP, QPC, MB_W, MB_H, True))
    ms = sweep_ms(fn, list(zip(rig["fys"], rig["fus"], rig["fvs"])))
    assert ms < 25.0, f"encode_p_residual {ms:.2f} ms (budget 25)"


def test_fused_p_step_budget(rig):
    import jax
    from x264dsp_tpu.encoder.inter_frame import encode_p_frame
    fn = jax.jit(lambda f, u, v, r4, ru, rv: encode_p_frame.__wrapped__(
        f, u, v, r4, ru, rv, QP, QPC, LAM, mb_w=MB_W, mb_h=MB_H,
        me_range=R, mv_range=512, dct_decimate=True, me_parallel=True))
    ms = sweep_ms(fn, [(rig["fys"][i], rig["fus"][i], rig["fvs"][i],
                        rig["ref4s"][i], rig["refus"][i], rig["refvs"][i])
                       for i in range(K)])
    assert ms < 60.0, f"fused P step {ms:.2f} ms (budget 60)"
