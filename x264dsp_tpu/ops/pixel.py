"""Batched pixel metrics — TPU replacement for pixel-a.sa (SAD/SATD/SSD/
var families, SURVEY §2.5). jnp, int32, arbitrary leading batch dims.

The reference's x3/x4 multi-candidate kernels (pixel-a.sa:485-1198) are
subsumed by batching: candidates are just another leading axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from ._lazyconst import LazyConst

_H = LazyConst(np.array([[1, 1, 1, 1],
                         [1, -1, 1, -1],
                         [1, 1, -1, -1],
                         [1, -1, -1, 1]], dtype=np.int32))


def sad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SAD over the last two dims: (..., H, W) → (...,)."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.abs(d).sum(axis=(-1, -2))


def ssd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return (d * d).sum(axis=(-1, -2))


def _blocks4(d: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) → (..., H//4, W//4, 4, 4)."""
    *lead, H, W = d.shape
    d = d.reshape(*lead, H // 4, 4, W // 4, 4)
    return jnp.moveaxis(d, -3, -2)


def _hadamard_abs(d4: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) diff blocks → (...,) abs hadamard sums."""
    t = jnp.einsum("ij,...jk,lk->...il", _H, d4, _H)
    return jnp.abs(t).sum(axis=(-1, -2))


def satd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SATD over the last two dims with the reference's exact composition:
    W >= 8 → per-8x4 floor-halved sums (x264_pixel_satd_8x4 base,
    common/pixel.c:293-330); W == 4 → per-4x4 floor-halves."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    W = d.shape[-1]
    habs = _hadamard_abs(_blocks4(d))          # (..., H/4, W/4)
    if W >= 8:
        pairs = habs.reshape(habs.shape[:-1] + (W // 8, 2)).sum(-1)
        return (pairs >> 1).sum(axis=(-1, -2))
    return (habs >> 1).sum(axis=(-1, -2))


def satd_4x4(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) → (...,) — pixel_satd_4x4 (common/pixel.c:267-291)."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return _hadamard_abs(d) >> 1


def var2_8x8(fenc: jnp.ndarray, fdec: jnp.ndarray):
    """pixel var2_8x8 (pixel-a.sa:4188): returns (var, ssd) of the diff."""
    d = fenc.astype(jnp.int32) - fdec.astype(jnp.int32)
    s = d.sum(axis=(-1, -2))
    sq = (d * d).sum(axis=(-1, -2))
    return sq - ((s * s) >> 6), sq


def var_blocks(p: jnp.ndarray, shift: int):
    """Per-block energy for AQ (ratecontrol.c:192-235): sum of squares minus
    squared sum >> (2*log2(size)). p: (..., H, W); shift = log2(H*W)."""
    p = p.astype(jnp.int32)
    s = p.sum(axis=(-1, -2))
    sq = (p * p).sum(axis=(-1, -2))
    return sq - ((s * s) >> shift)


def ssim_wxh(pix1: jnp.ndarray, pix2: jnp.ndarray):
    """Structural similarity of two planes — x264_pixel_ssim_wxh
    (common/pixel.c:565-658): per-4x4-block integer sums, aggregated
    over overlapping 8x8 windows (2x2 neighboring 4x4 blocks), with
    x264's integer ssim_end1 constants. Returns (ssim_sum, cnt) with
    cnt = (h//4 - 1) * (w//4 - 1); mean SSIM = ssim_sum / cnt."""
    h4, w4 = pix1.shape[0] // 4, pix1.shape[1] // 4
    a = pix1[:h4 * 4, :w4 * 4].astype(jnp.int32)
    b = pix2[:h4 * 4, :w4 * 4].astype(jnp.int32)
    a = a.reshape(h4, 4, w4, 4)
    b = b.reshape(h4, 4, w4, 4)
    s1 = a.sum(axis=(1, 3))
    s2 = b.sum(axis=(1, 3))
    ss = (a * a).sum(axis=(1, 3)) + (b * b).sum(axis=(1, 3))
    s12 = (a * b).sum(axis=(1, 3))

    def win(x):  # 2x2 block-window sums → (h4-1, w4-1)
        return x[:-1, :-1] + x[:-1, 1:] + x[1:, :-1] + x[1:, 1:]

    fs1, fs2 = win(s1), win(s2)
    fss, fs12 = win(ss), win(s12)
    ssim_c1 = int(.01 * .01 * 255 * 255 * 64 + .5)
    ssim_c2 = int(.03 * .03 * 255 * 255 * 64 * 63 + .5)
    vars_ = fss * 64 - fs1 * fs1 - fs2 * fs2
    covar = fs12 * 64 - fs1 * fs2
    num = ((2 * fs1 * fs2 + ssim_c1).astype(jnp.float32)
           * (2 * covar + ssim_c2).astype(jnp.float32))
    den = ((fs1 * fs1 + fs2 * fs2 + ssim_c1).astype(jnp.float32)
           * (vars_ + ssim_c2).astype(jnp.float32))
    return (num / den).sum(), (h4 - 1) * (w4 - 1)
