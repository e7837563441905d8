"""Closed-form _optimize_chroma_dc vs a NumPy twin of the reference's
unit-step loop (common/quant.c:157-192)."""

import numpy as np
import jax.numpy as jnp

from x264dsp_tpu.encoder.intra_frame import _optimize_chroma_dc
from x264dsp_tpu.ops.transforms import DEQUANT4_MF_J


def _idct_deq(d, dmf):
    d0, d1 = d[0] + d[1], d[2] + d[3]
    d2, d3 = d[0] - d[1], d[2] - d[3]
    out = np.array([d0 + d1, d0 - d1, d2 + d3, d2 - d3], np.int64)
    return ((out * dmf) >> 5) + 32


def _golden(dc, qp):
    """Literal loop twin of optimize_chroma_2x2_dc."""
    dmf = int(np.asarray(DEQUANT4_MF_J)[qp % 6, 0]) << (qp // 6)
    d = np.array(dc, np.int64)
    orig = _idct_deq(d, dmf)
    if not np.any(orig >> 6):
        return np.zeros(4, np.int32), False
    nz = False
    for c in (3, 2, 1, 0):
        level = d[c]
        sign = -1 if level < 0 else 1
        while level:
            d[c] = level - sign
            if np.any((orig ^ _idct_deq(d, dmf)) >> 6):
                nz = True
                d[c] = level
                break
            level -= sign
    return d.astype(np.int32), nz


def test_matches_reference_loop():
    rng = np.random.default_rng(7)
    for trial in range(300):
        qp = int(rng.integers(0, 23))
        scale = int(rng.choice([3, 12, 60, 400]))
        dc = rng.integers(-scale, scale + 1, 4).astype(np.int32)
        g_dc, g_nz = _golden(dc, qp)
        o_dc, o_nz = _optimize_chroma_dc(jnp.asarray(dc), jnp.int32(qp))
        # reference leaves dct untouched on the early-zero exit; ours
        # zeroes it — callers only read dc when nz, so compare under nz
        assert bool(o_nz) == bool(g_nz), (dc, qp, g_dc, np.asarray(o_dc))
        if g_nz:
            assert np.array_equal(np.asarray(o_dc), g_dc), (dc, qp)


def test_batched():
    rng = np.random.default_rng(1)
    dc = rng.integers(-50, 51, (64, 4)).astype(np.int32)
    qp = rng.integers(0, 23, (64,)).astype(np.int32)
    o_dc, o_nz = _optimize_chroma_dc(jnp.asarray(dc), jnp.asarray(qp))
    for i in range(64):
        g_dc, g_nz = _golden(dc[i], int(qp[i]))
        assert bool(o_nz[i]) == bool(g_nz)
        if g_nz:
            assert np.array_equal(np.asarray(o_dc)[i], g_dc)
