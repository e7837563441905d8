"""Motion compensation kernels vs golden twins."""

import numpy as np
import pytest

from x264dsp_tpu.ops import golden as G
from x264dsp_tpu.ops import mc as MC

rng = np.random.default_rng(5)


@pytest.fixture(scope="module")
def ref_planes():
    recon = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    ref4 = np.asarray(MC.make_ref_planes(recon))
    return recon, ref4


def test_hpel_matches_golden(ref_planes):
    recon, ref4 = ref_planes
    p = np.pad(recon.astype(np.int64), MC.PAD_MC, mode="edge")
    gh, gv, gc = G.hpel_filter(p)
    s = slice(8, -8)  # golden leaves 3-px borders unset; compare interior
    np.testing.assert_array_equal(ref4[1][s, s], gh[s, s])
    np.testing.assert_array_equal(ref4[2][s, s], gv[s, s])
    np.testing.assert_array_equal(ref4[3][s, s], gc[s, s])


@pytest.mark.parametrize("mvx,mvy", [
    (0, 0), (4, 8), (2, 0), (0, 2), (2, 2), (1, 0), (0, 1), (3, 3),
    (1, 3), (3, 1), (-5, 7), (-17, -9), (13, -6), (23, 31), (-3, -3),
])
def test_mc_luma_matches_golden(ref_planes, mvx, mvy):
    recon, ref4 = ref_planes
    x0, y0 = 16, 16
    got = np.asarray(MC.mc_luma_block(ref4, x0, y0, mvx, mvy, 16, 16))
    want = G.mc_luma([ref4[i] for i in range(4)],
                     x0 + MC.PAD_MC, y0 + MC.PAD_MC, mvx, mvy, 16, 16)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mvx,mvy", [
    (0, 0), (8, 8), (3, 5), (-11, 9), (17, -13), (1, 1), (7, 7),
])
def test_mc_chroma_matches_golden(mvx, mvy):
    recon = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    refc = np.asarray(MC.pad_chroma(recon))
    x0, y0 = 8, 8
    got = np.asarray(MC.mc_chroma_block(refc, x0, y0, mvx, mvy, 8, 8))
    want = G.mc_chroma(refc, x0 + MC.PAD_MC // 2, y0 + MC.PAD_MC // 2,
                       mvx, mvy, 8, 8)
    np.testing.assert_array_equal(got, want)


def test_lowres_shape_and_filter():
    plane = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    lp = np.asarray(MC.lowres_planes(plane))
    assert lp.shape == (4, 16, 24)
    # spot check dst0[0,0] = FILTER(p00, p10, p01, p11)
    a, b, c, d = (int(plane[0, 0]), int(plane[1, 0]),
                  int(plane[0, 1]), int(plane[1, 1]))
    want = (((a + b + 1) >> 1) + ((c + d + 1) >> 1) + 1) >> 1
    assert lp[0, 0, 0] == want


def test_mc_luma_multi_matches_batched():
    """Batched-candidate MC == per-candidate mc_luma_batched."""
    import numpy as np
    import jax.numpy as jnp
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops import mcgather as MG

    rng = np.random.default_rng(11)
    mb_w, mb_h = 3, 2
    H, W = mb_h * 16, mb_w * 16
    ref = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    wins4 = MG.luma_windows(MC.make_ref_planes(ref), mb_w, mb_h)
    B, C = mb_w * mb_h, 4
    mvx = jnp.asarray(rng.integers(-40, 40, (B, C), np.int32))
    mvy = jnp.asarray(rng.integers(-40, 40, (B, C), np.int32))
    for bh, bw, sy, sx in ((8, 8, 0, 0), (16, 16, 0, 0), (8, 16, 8, 0),
                           (8, 8, np.array([0, 0, 8, 8]),
                            np.array([0, 8, 0, 8]))):
        out = MG.mc_luma_multi(wins4, mvx, mvy, bh, bw, sy, sx)
        for c in range(C):
            syc = int(sy[c]) if np.ndim(sy) else sy
            sxc = int(sx[c]) if np.ndim(sx) else sx
            one = MG.mc_luma_batched(wins4, mvx[:, c], mvy[:, c],
                                     bh, bw, syc, sxc)
            np.testing.assert_array_equal(np.asarray(out[:, c]),
                                          np.asarray(one),
                                          err_msg=f"cand {c} {bh}x{bw}")


def test_pack_syn_sparse_roundtrip():
    import numpy as np
    import jax.numpy as jnp
    from x264dsp_tpu.encoder import inter_frame as IF

    rng = np.random.default_rng(5)
    mb_h, mb_w = 4, 5
    B = mb_h * mb_w
    out = {}
    coded = rng.random((mb_h, mb_w)) < 0.4
    # <= 6 coded 4x4 blocks per MB (the sparse row capacity)
    blk_coded = np.zeros((mb_h, mb_w, 24), bool)
    for my in range(mb_h):
        for mx in range(mb_w):
            if coded[my, mx]:
                picks = rng.choice(24, rng.integers(1, 7), replace=False)
                blk_coded[my, mx, picks] = True
    for k, shape in IF.SYN_PACK_LAYOUT:
        full = (mb_h, mb_w) + shape
        if k == "luma_levels":
            a = rng.integers(-8, 8, full) * blk_coded[:, :, :16, None]
        elif k == "chroma_ac_levels":
            a = (rng.integers(-8, 8, full)
                 * blk_coded[:, :, 16:].reshape(mb_h, mb_w, 2, 4, 1))
        elif k == "chroma_dc_levels":
            a = rng.integers(-100, 101, full) * coded.reshape(
                (mb_h, mb_w) + (1,) * len(shape))
        elif k in ("mv", "mv8"):
            a = rng.integers(-76, 77, full)
        elif k == "cbp_luma":
            a = coded * 15
        elif k == "cbp_chroma":
            a = coded * rng.integers(0, 3, full)
        elif k in ("luma_nnz",):
            a = np.zeros(full)
        else:
            a = rng.integers(0, 4, full)
        out[k] = jnp.asarray(a.astype(np.int32))
    # consistency: nnz fields derived from levels like the device path
    out["luma_nnz"] = jnp.asarray(np.count_nonzero(
        np.asarray(out["luma_levels"]), axis=-1))
    out["chroma_nnz_ac"] = jnp.asarray(np.count_nonzero(
        np.asarray(out["chroma_ac_levels"]), axis=-1))
    out["chroma_nz_dc"] = jnp.asarray(
        (np.asarray(out["chroma_dc_levels"]) != 0).any(-1).astype(np.int32))
    out["mv"] = out["mv8"][:, :, 0, 0]

    dense, payload, count = IF.pack_syn_sparse(out, mb_w, mb_h)
    c = int(count)
    assert c == int(coded.sum())
    syn = IF.unpack_syn_sparse(np.asarray(dense), np.asarray(payload)[:c],
                               mb_w, mb_h)
    assert syn is not None
    for k, _ in IF.SYN_PACK_LAYOUT:
        np.testing.assert_array_equal(syn[k], np.asarray(out[k]), k)
    # escape flag on big level
    out2 = dict(out)
    out2["luma_levels"] = out["luma_levels"].at[0, 0, 0, 0].set(100)
    dense, payload, count = IF.pack_syn_sparse(out2, mb_w, mb_h)
    assert np.asarray(dense)[0] == 1
    # escape flag when an MB exceeds the 6-coded-block row capacity
    out3 = dict(out)
    lv = np.asarray(out3["luma_levels"]).copy()
    lv[1, 1, :, 0] = 1          # 16 coded blocks in one MB
    out3["luma_levels"] = jnp.asarray(lv)
    out3["cbp_luma"] = out3["cbp_luma"].at[1, 1].set(15)
    dense, payload, count = IF.pack_syn_sparse(out3, mb_w, mb_h)
    assert np.asarray(dense)[0] == 1
