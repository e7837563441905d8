"""Pallas ME SAD-surface kernel vs the XLA reference formulation
(interpret mode on CPU; the compiled path runs on TPU in bench/encode)."""

import numpy as np
import jax.numpy as jnp

from x264dsp_tpu.encoder.inter_frame import fullpel_cost_surfaces
from x264dsp_tpu.ops import mc as MC
from x264dsp_tpu.ops.pallas.me_sad import make_ref_strips, sad_cost_surfaces


def test_pallas_sad_surface_matches_xla():
    rng = np.random.default_rng(4)
    mb_w, mb_h, R = 4, 3, 8
    H, W = mb_h * 16, mb_w * 16
    fenc = rng.integers(0, 256, (H, W)).astype(np.int32)
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    ref_pad = jnp.pad(jnp.asarray(ref, jnp.int32),
                      ((MC.PAD_MC, MC.PAD_MC), (MC.PAD_MC, MC.PAD_MC)),
                      mode="edge")

    want = np.asarray(fullpel_cost_surfaces(jnp.asarray(fenc), ref_pad,
                                            mb_w, mb_h, R))
    strips = make_ref_strips(ref_pad, MC.PAD_MC, mb_w, mb_h, R)
    got = np.asarray(sad_cost_surfaces(jnp.asarray(fenc), strips,
                                       mb_w=mb_w, mb_h=mb_h, R=R,
                                       interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_sad_surface16_lanes_matches_xla():
    """The 16x16-summed lane-layout kernel (the DIA/HEX fast path's
    surface) must equal the quadrant surfaces summed + transposed."""
    from x264dsp_tpu.ops.pallas.me_sad import sad_cost_surface16_lanes
    rng = np.random.default_rng(11)
    mb_w, mb_h, R = 4, 3, 8
    H, W = mb_h * 16, mb_w * 16
    fenc = rng.integers(0, 256, (H, W)).astype(np.int32)
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    ref_pad = jnp.pad(jnp.asarray(ref, jnp.int32),
                      ((MC.PAD_MC, MC.PAD_MC), (MC.PAD_MC, MC.PAD_MC)),
                      mode="edge")
    want = np.asarray(fullpel_cost_surfaces(jnp.asarray(fenc), ref_pad,
                                            mb_w, mb_h, R))
    strips = make_ref_strips(ref_pad, MC.PAD_MC, mb_w, mb_h, R)
    got = np.asarray(sad_cost_surface16_lanes(
        jnp.asarray(fenc), strips, mb_w=mb_w, mb_h=mb_h, R=R,
        interpret=True))
    # lanes layout [row, dy, dx, mbx] -> classic [row, mbx, dy, dx]
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)


def test_lane_walk_twins_match_classic():
    """decide_mvs_pattern(surf_lanes=...) must produce the same MV field
    as the classic-layout path for both DIA and HEX (the same walk, two
    surface layouts)."""
    from x264dsp_tpu.encoder import inter_frame as IF
    rng = np.random.default_rng(7)
    mb_w, mb_h, R = 5, 4, 8
    n = 2 * R + 1
    surf = rng.integers(0, 5000, (mb_h, mb_w, n, n)).astype(np.int32)
    lanes = jnp.asarray(surf.transpose(0, 2, 3, 1))
    H, W = mb_h * 16, mb_w * 16
    fenc = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    recon = rng.integers(0, 256, (H, W)).astype(np.uint8)
    from x264dsp_tpu.ops import mc as MC2
    from x264dsp_tpu.ops import mcgather as MG
    ref4 = MC2.make_ref_planes(jnp.asarray(recon))
    wins4 = MG.luma_windows(ref4, mb_w, mb_h)
    for method in (0, 1):
        a = np.asarray(IF.decide_mvs_pattern(
            jnp.asarray(surf), fenc, wins4, 5, mb_w, mb_h, R, 512,
            subme=1, method=method))
        b = np.asarray(IF.decide_mvs_pattern(
            None, fenc, wins4, 5, mb_w, mb_h, R, 512,
            subme=1, method=method, surf_lanes=lanes))
        np.testing.assert_array_equal(a, b, err_msg=f"method {method}")
