"""encode_i_frame_skew must be BIT-IDENTICAL to the gather-based
wavefront — same math, same order, only the storage layout differs."""

import numpy as np
import pytest

import jax.numpy as jnp

from x264dsp_tpu.encoder.intra_frame import (encode_i_frame,
                                             encode_i_frame_skew)


def _clip(w, h, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 60 * np.sin(xx / 7.1) * np.cos(yy / 9.3)
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
    u = (120 + 40 * np.sin(xx[::2, ::2] / 13.0)
         + rng.normal(0, 4, (h // 2, w // 2))).clip(0, 255).astype(np.uint8)
    v = (128 + 40 * np.cos(yy[::2, ::2] / 11.0)
         + rng.normal(0, 4, (h // 2, w // 2))).clip(0, 255).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("w,h,use_satd,i4", [
    (96, 64, True, True),
    (64, 96, False, True),    # tall: mb_w < 2*mb_h exercises short diagonals
    (160, 48, True, False),
])
def test_skew_matches_gather(w, h, use_satd, i4):
    y, u, v = _clip(w, h, seed=w + h)
    mb_w, mb_h = w // 16, h // 16
    a = encode_i_frame(y, u, v, 26, 26, 5, mb_w=mb_w, mb_h=mb_h,
                       use_satd=use_satd, i4x4_enabled=i4)
    b = encode_i_frame_skew(y, u, v, 26, 26, 5, mb_w=mb_w, mb_h=mb_h,
                            use_satd=use_satd, i4x4_enabled=i4)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_skew_matches_gather_aq_grid():
    """Per-MB QP grids (variance AQ) flow through identically."""
    w, h = 96, 96
    y, u, v = _clip(w, h, seed=5)
    mb_w, mb_h = w // 16, h // 16
    rng = np.random.default_rng(9)
    qp = jnp.asarray(rng.integers(22, 32, (mb_h, mb_w)).astype(np.int32))
    qpc = jnp.clip(qp, 0, 51)
    lam = jnp.asarray(rng.integers(3, 8, (mb_h, mb_w)).astype(np.int32))
    a = encode_i_frame(y, u, v, qp, qpc, lam, mb_w=mb_w, mb_h=mb_h,
                       use_satd=True, i4x4_enabled=True)
    b = encode_i_frame_skew(y, u, v, qp, qpc, lam, mb_w=mb_w, mb_h=mb_h,
                            use_satd=True, i4x4_enabled=True)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
