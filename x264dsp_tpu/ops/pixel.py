"""Batched pixel metrics — TPU replacement for pixel-a.sa (SAD/SATD/SSD/
var families, SURVEY §2.5). jnp, int32, arbitrary leading batch dims.

The reference's x3/x4 multi-candidate kernels (pixel-a.sa:485-1198) are
subsumed by batching: candidates are just another leading axis.
"""

from __future__ import annotations

import jax.numpy as jnp

_H = jnp.array([[1, 1, 1, 1],
                [1, -1, 1, -1],
                [1, 1, -1, -1],
                [1, -1, -1, 1]], dtype=jnp.int32)


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
