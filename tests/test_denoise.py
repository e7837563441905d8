"""Noise reduction (denoise_dct, common/quant.c:194 + the between-frame
offset update the fork lost; applied on every inter-coded path,
macroblock.c:520-521, 245-248)."""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp

import x264dsp_tpu as xt
from x264dsp_tpu import params as P
from x264dsp_tpu.encoder import inter_frame as IF

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def denoise_golden(dct, sums, offset):
    """Literal x264_denoise_dct twin (common/quant.c:194-206)."""
    out = dct.copy()
    for i in range(dct.size):
        level = int(dct.flat[i])
        sign = -1 if level < 0 else 1
        level = abs(level)
        sums.flat[i % 16] += level
        level -= offset.flat[i % 16]
        out.flat[i] = 0 if level < 0 else level * sign
    return out


def test_denoise_cm_matches_golden():
    rng = np.random.default_rng(0)
    # one 4-block-wide strip: cm planes are (H/4, W/4) per coef
    H = W = 8   # 2x2 blocks
    coefs = rng.integers(-60, 61, (16, H // 4, W // 4)).astype(np.int32)
    off = rng.integers(0, 30, 16).astype(np.int32)
    live = np.ones((H // 4, W // 4), bool)
    cm = [jnp.asarray(coefs[c]) for c in range(16)]
    out, sums = IF._denoise_cm(cm, jnp.asarray(off), jnp.asarray(live))
    out = np.stack([np.asarray(p) for p in out])
    # golden: per block position, natural coef order
    g_sums = np.zeros(16, np.int64)
    g_out = np.zeros_like(coefs)
    for by in range(H // 4):
        for bx in range(W // 4):
            blk = coefs[:, by, bx]
            g_out[:, by, bx] = denoise_golden(blk, g_sums, off)
    np.testing.assert_array_equal(out, g_out)
    np.testing.assert_array_equal(np.asarray(sums), g_sums)


def _noisy_clip(w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (110 + 50 * np.sin(xx / 9.0) * np.cos(yy / 7.0))
    frames = []
    for t in range(n):
        y = np.clip(base + rng.normal(0, 6, (h, w)), 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y, u, v))
    return frames


def _encode(nr, frames, w, h):
    p = xt.param_default()
    p.i_width, p.i_height = w, h
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 24
    p.analyse.i_noise_reduction = nr
    enc = xt.Encoder(p)
    stream = b""
    total = 0
    recons = []
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        stream += b"".join(n.payload for n in nals)
        total += sum(len(n.payload) for n in nals)
        recons.append(po.y)
    enc.close()
    return stream, total, recons


def test_noise_reduction_reduces_coded_energy():
    """nr > 0 must measurably shrink the coded P frames on a noisy clip
    and keep the stream conformant (offsets ramp up after frame 1)."""
    W, H, N = 64, 48, 5
    frames = _noisy_clip(W, H, N)
    s0, size0, _ = _encode(0, frames, W, H)
    s1, size1, recons = _encode(1500, frames, W, H)
    assert s1 != s0
    # the denoised streams spend fewer bits on noise residual
    assert size1 < size0, (size0, size1)
    dec = Decoder().decode(s1)
    assert len(dec) == N
    for t, (fy, _, _) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons[t], err_msg=f"frame {t}")
