"""P-SKIP probe semantics (x264_macroblock_probe_pskip,
encoder/macroblock.c:492-604), unit-level.

Regression anchor for the chroma DC check: sub8x8_dct_dc includes the
2x2 DC Hadamard (common/dct.c:186-190), so a UNIFORM small chroma
offset — four per-4x4 DCs that each quantize to zero but whose Hadamard
sum crosses the deadzone — must FAIL the probe (the real encode would
code a chroma DC level)."""

import numpy as np

import jax.numpy as jnp

from x264dsp_tpu.encoder import inter_frame as IF
from x264dsp_tpu.ops import mc as MC
from x264dsp_tpu.ops import mcgather as MG


def _setup(fy, fu, fv, ry, ru, rv):
    mb_h, mb_w = fy.shape[0] // 16, fy.shape[1] // 16
    ref4 = MC.make_ref_planes(jnp.asarray(ry))
    refu = MC.pad_chroma(jnp.asarray(ru))
    refv = MC.pad_chroma(jnp.asarray(rv))
    wins4 = MG.luma_windows(ref4, mb_w, mb_h)
    winsu = MG.chroma_windows(refu, mb_w, mb_h)
    winsv = MG.chroma_windows(refv, mb_w, mb_h)
    pskip = jnp.zeros((mb_h, mb_w, 2), jnp.int32)
    ok, _ = IF.probe_pskip(jnp.asarray(fy.astype(np.int32)),
                           jnp.asarray(fu.astype(np.int32)),
                           jnp.asarray(fv.astype(np.int32)),
                           wins4, winsu, winsv, pskip, 26, 26,
                           mb_w, mb_h, 512)
    return np.asarray(ok)


def test_identical_frame_probes_skip():
    rng = np.random.default_rng(11)
    y = rng.integers(0, 256, (32, 32), np.uint8)
    u = rng.integers(0, 256, (16, 16), np.uint8)
    v = rng.integers(0, 256, (16, 16), np.uint8)
    ok = _setup(y, u, v, y, u, v)
    assert ok.all(), "identical frames must all probe as skippable"


def test_uniform_chroma_offset_fails_probe():
    """Four same-sign per-4x4 chroma DCs below the individual deadzone
    sum past it in the 2x2 Hadamard — the probe must reject."""
    rng = np.random.default_rng(12)
    y = rng.integers(0, 256, (32, 32), np.uint8)
    u = np.full((16, 16), 100, np.uint8)
    v = np.full((16, 16), 100, np.uint8)
    # +3 per pixel: per-4x4 DC = 48 (quantizes to 0 alone at QP26);
    # Hadamard DC00 = 4*48 = 192 -> nonzero quant -> chroma DC coded
    u2 = (u + 3).astype(np.uint8)
    ok = _setup(y, u2, v, y, u, v)
    assert not ok.any(), (
        "uniform chroma offset must fail the probe (Hadamard DC)")


def test_large_luma_residual_fails_probe():
    y = np.full((32, 32), 100, np.uint8)
    u = np.full((16, 16), 128, np.uint8)
    v = u.copy()
    y2 = y.copy()
    y2[4:12, 4:12] = 220   # strong luma change in MB(0,0)
    ok = _setup(y2, u, v, y, u, v)
    assert not ok[0, 0]
    assert ok[1, 1], "untouched MB still skippable"
