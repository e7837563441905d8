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
