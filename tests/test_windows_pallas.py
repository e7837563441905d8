"""Pallas window-relayout kernels vs the XLA twin (interpret mode on
CPU; the compiled path runs on TPU in bench/encode — validated
bit-identical on chip, ops/pallas/windows.py)."""

import numpy as np

from x264dsp_tpu.ops import mc as MC
from x264dsp_tpu.ops import mcgather as MG


def _xla_luma_windows(ref4, mb_w, mb_h):
    """The pure-XLA formulation (mcgather.luma_windows body, TPU branch
    bypassed)."""
    start = MC.PAD_MC - MG.M_LUMA
    w = MG._tile_windows(ref4, mb_h, 16, MG.WIN_L, start, axis=1)
    w = MG._tile_windows(w, mb_w, 16, MG.WIN_L, start, axis=3)
    import jax.numpy as jnp
    w = jnp.moveaxis(w, (1, 3), (0, 1))
    return w.reshape(mb_h * mb_w, 4, MG.WIN_L, MG.WIN_L
                     ).astype(jnp.bfloat16)


def _xla_chroma_windows(refc, mb_w, mb_h):
    start = MC.PAD_MC // 2 - MG.M_CHROMA
    w = MG._tile_windows(refc, mb_h, 8, MG.WIN_C, start, axis=0)
    w = MG._tile_windows(w, mb_w, 8, MG.WIN_C, start, axis=2)
    import jax.numpy as jnp
    return w.transpose(0, 2, 1, 3).reshape(
        mb_h * mb_w, MG.WIN_C, MG.WIN_C).astype(jnp.bfloat16)


def test_luma_windows_pallas_equals_xla():
    from x264dsp_tpu.ops.pallas.windows import luma_windows_pallas
    rng = np.random.default_rng(0)
    mb_w, mb_h = 6, 4
    recon = rng.integers(0, 256, (mb_h * 16, mb_w * 16)
                         ).astype(np.uint8)
    ref4 = np.asarray(MC.make_ref_planes(recon))
    got = np.asarray(luma_windows_pallas(ref4, mb_w, mb_h, MG.M_LUMA,
                                         MC.PAD_MC, interpret=True))
    exp = np.asarray(_xla_luma_windows(ref4, mb_w, mb_h))
    assert np.array_equal(got, exp)


def test_chroma_windows_pallas_equals_xla():
    from x264dsp_tpu.ops.pallas.windows import chroma_windows_pallas
    rng = np.random.default_rng(1)
    mb_w, mb_h = 6, 4
    cplane = rng.integers(0, 256, (mb_h * 8, mb_w * 8)).astype(np.uint8)
    refc = np.asarray(MC.pad_chroma(cplane))
    got = np.asarray(chroma_windows_pallas(refc, mb_w, mb_h,
                                           MG.M_CHROMA, MC.PAD_MC // 2,
                                           interpret=True))
    exp = np.asarray(_xla_chroma_windows(refc, mb_w, mb_h))
    assert np.array_equal(got, exp)
