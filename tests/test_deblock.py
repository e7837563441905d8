"""Deblocking: wavefront device kernel vs scalar golden twin."""

import numpy as np
import pytest

from x264dsp_tpu.ops import deblock as D
from x264dsp_tpu.ops import golden as G


def _random_case(mb_w, mb_h, seed, qp=32, all_intra=False):
    rng = np.random.default_rng(seed)
    H, W = mb_h * 16, mb_w * 16
    # blocky content so edges actually trigger the filters
    y = rng.integers(0, 256, (mb_h * 4, mb_w * 4))
    y = np.kron(y, np.ones((4, 4), int)) + rng.integers(-6, 7, (H, W))
    y = y.clip(0, 255).astype(np.int32)
    u = rng.integers(0, 256, (mb_h * 2, mb_w * 2))
    u = np.kron(u, np.ones((4, 4), int)).clip(0, 255).astype(np.int32)
    v = 255 - u
    if all_intra:
        intra = np.ones((mb_h, mb_w), np.int32)
    else:
        intra = (rng.random((mb_h, mb_w)) < 0.3).astype(np.int32)
    bs = rng.integers(0, 3, (mb_h, mb_w, 2, 4, 4)).astype(np.int32)
    bs[intra > 0] = 3
    feo = ((rng.random((mb_h, mb_w)) < 0.2) & (intra == 0)).astype(np.int32)
    return y, u, v, bs, intra, feo


@pytest.mark.parametrize("qp,seed,all_intra", [
    (32, 0, True), (32, 1, False), (26, 2, False), (40, 3, False),
    (18, 4, False),
])
def test_deblock_wavefront_matches_golden(qp, seed, all_intra):
    mb_w, mb_h = 4, 3
    y, u, v, bs, intra, feo = _random_case(mb_w, mb_h, seed, qp, all_intra)
    from x264dsp_tpu.ops.tables import CHROMA_QP_TABLE
    qpc = int(CHROMA_QP_TABLE[min(qp, 51)])
    gy, gu, gv = G.deblock_frame_golden(y, u, v, bs, intra, feo, qp, qpc)
    dy, du, dv = D.deblock_frame(y, u, v, bs, intra, feo, qp, qpc, 0, 0,
                                 mb_w=mb_w, mb_h=mb_h)
    np.testing.assert_array_equal(np.asarray(dy), gy)
    np.testing.assert_array_equal(np.asarray(du), gu)
    np.testing.assert_array_equal(np.asarray(dv), gv)


def test_deblock_identity_when_bs_zero():
    mb_w, mb_h = 2, 2
    y, u, v, bs, intra, feo = _random_case(mb_w, mb_h, 7)
    bs[:] = 0
    intra[:] = 0
    dy, du, dv = D.deblock_frame(y, u, v, bs, intra, feo * 0, 30, 30, 0, 0,
                                 mb_w=mb_w, mb_h=mb_h)
    np.testing.assert_array_equal(np.asarray(dy), y)
    np.testing.assert_array_equal(np.asarray(du), u)


def test_deblock_pallas_path_matches_xla():
    """The Pallas region-filter path must be bit-exact with the XLA
    vmapped path (and hence with the golden scalar deblock)."""
    import numpy as np
    import jax.numpy as jnp
    from x264dsp_tpu.ops import deblock as DB

    rng = np.random.default_rng(4)
    mb_w, mb_h = 5, 4
    h, w = mb_h * 16, mb_w * 16
    y = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    u = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2)), jnp.int32)
    v = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2)), jnp.int32)
    bs = jnp.asarray(rng.integers(0, 3, (mb_h, mb_w, 2, 4, 4)), jnp.int32)
    intra = jnp.asarray(rng.integers(0, 2, (mb_h, mb_w)), jnp.int32)
    feo = jnp.zeros((mb_h, mb_w), jnp.int32)
    for qp in (20, 30, 44):
        a = DB.deblock_frame(y, u, v, bs, intra, feo, qp, qp, 0, 0,
                             mb_w=mb_w, mb_h=mb_h, use_pallas=False)
        b = DB.deblock_frame(y, u, v, bs, intra, feo, qp, qp, 0, 0,
                             mb_w=mb_w, mb_h=mb_h, use_pallas=True)
        for pa, pb, name in zip(a, b, "yuv"):
            assert np.array_equal(np.asarray(pa), np.asarray(pb)), \
                (qp, name)


def test_deblock_skew_kernel_matches_golden():
    """Skewed-layout wavefront (ops/pallas/deblock_skew) vs the scalar
    golden model, interpret mode, incl. a batched stream axis and an
    all-intra case."""
    import jax.numpy as jnp
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops.tables import CHROMA_QP_TABLE

    for (mb_w, mb_h, seed, qp, all_intra) in [
            (4, 3, 0, 32, True), (5, 4, 2, 26, False), (2, 2, 3, 40, False)]:
        S = 2
        cases = [_random_case(mb_w, mb_h, seed + 10 * s, qp, all_intra)
                 for s in range(S)]
        qpc = int(CHROMA_QP_TABLE[qp])
        stacked = [jnp.asarray(np.stack([c[i] for c in cases]))
                   for i in range(6)]
        dy, du, dv = DB.deblock_frame_skew_batched(
            *stacked, qp, qpc, 0, 0, mb_w=mb_w, mb_h=mb_h, interpret=True)
        for s in range(S):
            y, u, v, bs, intra, feo = cases[s]
            gy, gu, gv = G.deblock_frame_golden(y, u, v, bs, intra, feo,
                                                qp, qpc)
            np.testing.assert_array_equal(np.asarray(dy)[s], gy)
            np.testing.assert_array_equal(np.asarray(du)[s], gu)
            np.testing.assert_array_equal(np.asarray(dv)[s], gv)


def test_deblock_skew_per_mb_qp():
    """Skew path with a per-MB decoded-QP grid (the AQ/row-VBV case)
    must match the golden model given the same grids."""
    import jax.numpy as jnp
    from x264dsp_tpu.ops.tables import CHROMA_QP_TABLE

    mb_w, mb_h = 4, 3
    y, u, v, bs, intra, feo = _random_case(mb_w, mb_h, 21)
    rng = np.random.default_rng(3)
    qp_mb = rng.integers(22, 40, (mb_h, mb_w)).astype(np.int32)
    qpc_mb = CHROMA_QP_TABLE[qp_mb].astype(np.int32)
    gy, gu, gv = G.deblock_frame_golden(y, u, v, bs, intra, feo,
                                        qp_mb, qpc_mb)
    dy, du, dv = D.deblock_frame_skew_batched(
        jnp.asarray(y)[None], jnp.asarray(u)[None], jnp.asarray(v)[None],
        jnp.asarray(bs)[None], jnp.asarray(intra)[None],
        jnp.asarray(feo)[None], jnp.asarray(qp_mb)[None],
        jnp.asarray(qpc_mb)[None], 0, 0, mb_w=mb_w, mb_h=mb_h,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(dy)[0], gy)
    np.testing.assert_array_equal(np.asarray(du)[0], gu)
    np.testing.assert_array_equal(np.asarray(dv)[0], gv)


def test_deblock_skew_intra_mode_specializations():
    """The static intra_mode specializations ('none' for P frames with
    no intra MBs, 'all' for I frames) must be bit-exact with the golden
    model on frames that satisfy their precondition."""
    import jax.numpy as jnp
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops.tables import CHROMA_QP_TABLE

    qp = 30
    qpc = int(CHROMA_QP_TABLE[qp])
    mb_w, mb_h = 4, 3

    # 'none': P frame, zero intra MBs (the reference fork never codes
    # intra MBs in P frames)
    y, u, v, bs, intra, feo = _random_case(mb_w, mb_h, 31)
    intra[:] = 0
    bs = np.clip(bs, 0, 3)
    # 'all': I frame, every MB intra
    y2, u2, v2, bs2, intra2, feo2 = _random_case(mb_w, mb_h, 32,
                                                 all_intra=True)
    for mode, case in [("none", (y, u, v, bs, intra, feo)),
                       ("all", (y2, u2, v2, bs2, intra2, feo2))]:
        cy, cu, cv, cbs, cintra, cfeo = case
        gy, gu, gv = G.deblock_frame_golden(cy, cu, cv, cbs, cintra, cfeo,
                                            qp, qpc)
        dy, du, dv = DB.deblock_frame_skew_batched(
            jnp.asarray(cy)[None], jnp.asarray(cu)[None],
            jnp.asarray(cv)[None], jnp.asarray(cbs)[None],
            jnp.asarray(cintra)[None], jnp.asarray(cfeo)[None],
            qp, qpc, 0, 0, mb_w=mb_w, mb_h=mb_h, interpret=True,
            intra_mode=mode)
        np.testing.assert_array_equal(np.asarray(dy)[0], gy, err_msg=mode)
        np.testing.assert_array_equal(np.asarray(du)[0], gu, err_msg=mode)
        np.testing.assert_array_equal(np.asarray(dv)[0], gv, err_msg=mode)


def test_deblock_wave_kernel_matches_golden():
    """Single-call Pallas wavefront (ops/pallas/deblock_wave) vs the
    scalar golden model, interpret mode, incl. a batched stream axis."""
    import jax.numpy as jnp
    from x264dsp_tpu.ops import deblock as DB
    from x264dsp_tpu.ops.tables import CHROMA_QP_TABLE

    mb_w, mb_h, S = 4, 3, 2
    cases = [_random_case(mb_w, mb_h, 10 + s) for s in range(S)]
    qp = 32
    qpc = int(CHROMA_QP_TABLE[qp])
    ys = jnp.asarray(np.stack([c[0] for c in cases]))
    us = jnp.asarray(np.stack([c[1] for c in cases]))
    vs = jnp.asarray(np.stack([c[2] for c in cases]))
    bss = jnp.asarray(np.stack([c[3] for c in cases]))
    intras = jnp.asarray(np.stack([c[4] for c in cases]))
    feos = jnp.asarray(np.stack([c[5] for c in cases]))
    dy, du, dv = DB.deblock_frame_wave_batched(
        ys, us, vs, bss, intras, feos, qp, qpc, 0, 0,
        mb_w=mb_w, mb_h=mb_h, interpret=True)
    for s in range(S):
        y, u, v, bs, intra, feo = cases[s]
        gy, gu, gv = G.deblock_frame_golden(y, u, v, bs, intra, feo,
                                            qp, qpc)
        np.testing.assert_array_equal(np.asarray(dy)[s], gy)
        np.testing.assert_array_equal(np.asarray(du)[s], gu)
        np.testing.assert_array_equal(np.asarray(dv)[s], gv)
