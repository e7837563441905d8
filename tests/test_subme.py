"""subme 2-5 subpel refinement recipes (subpel_iterations, me.c:18-33 +
refine_subpel :466-581 + x264_me_refine_qpel :426-435): SATD-switched
qpel diamonds with per-MB early termination. Streams must stay
conformant and higher subme must not hurt quality at fixed QP."""

import sys
from pathlib import Path

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def _pan_clip(w, h, n, seed=41):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h * 2, 0:w * 2]
    base = (120 + 60 * np.sin(xx / 6.1) * np.cos(yy / 8.3)
            + rng.normal(0, 3, (h * 2, w * 2))).clip(0, 255)
    frames = []
    for t in range(n):
        # fractional-ish pan: 5/4 px per frame in x (exercises subpel)
        dx = (5 * t) // 4
        dy = (3 * t) // 4
        y = base[dy:dy + h, dx:dx + w]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y.astype(np.uint8), u, v))
    return frames


def _encode(subme, frames, w, h):
    p = xt.param_default()
    p.i_width, p.i_height = w, h
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 28
    p.analyse.i_subpel_refine = subme
    p.analyse.i_me_method = P.ME_UMH
    enc = xt.Encoder(p)
    stream = b""
    recons = []
    total = 0
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        stream += b"".join(n.payload for n in nals)
        total += sum(len(n.payload) for n in nals)
        recons.append((po.y, po.u, po.v))
    enc.close()
    return stream, recons, total


def test_subme_levels_roundtrip():
    W, H, N = 64, 48, 4
    frames = _pan_clip(W, H, N)
    sizes = {}
    for subme in (1, 2, 3, 5):
        stream, recons, total = _encode(subme, frames, W, H)
        sizes[subme] = total
        dec = Decoder().decode(stream)
        assert len(dec) == N
        for t, (fy, fu, fv) in enumerate(dec):
            np.testing.assert_array_equal(fy, recons[t][0],
                                          err_msg=f"subme {subme} Y {t}")
    # SATD refinement should compress the panning clip at least as well
    assert sizes[5] <= sizes[1] * 1.05, sizes


def _subpel_clip(w, h, n):
    """Continuous texture sampled at true sub-pel offsets: shallow SATD
    valleys around the half-pel optimum make the deeper subme>=6
    hpel/qpel iteration budgets actually change decisions."""
    frames = []
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    for t in range(n):
        dx, dy = 1.3 * t, 0.55 * t
        y = (120 + 55 * np.sin((xx - dx) / 4.2) * np.cos((yy - dy) / 5.1)
             + 35 * np.sin((xx - dx) / 11.0 + (yy - dy) / 8.0)).clip(0, 255)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y.astype(np.uint8), u, v))
    return frames


def test_subme_high_presets():
    """subme 6-11 iteration presets (subpel_iterations[s][2/3],
    me.c:30-33): distinct from the subme-5 recipe and not worse on the
    subpel pan clip."""
    # 64x48 shares the per-resolution kernel compiles with the rest of
    # the suite (single-core rig: compile time IS the suite time)
    W, H, N = 64, 48, 4
    frames = _subpel_clip(W, H, N)
    stream5, _, size5 = _encode(5, frames, W, H)
    stream7, recons7, size7 = _encode(7, frames, W, H)
    stream9, _, size9 = _encode(9, frames, W, H)
    # the deeper search must actually change decisions
    assert stream7 != stream5
    dec = Decoder().decode(stream7)
    assert len(dec) == N
    for t, (fy, _, _) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons7[t][0],
                                      err_msg=f"subme 7 Y {t}")
    # quality monotone-ish: more iterations can't blow up the size
    # (absolute slack: frames here are tens of bytes)
    assert size7 <= size5 * 1.05 + 32, (size5, size7)
    assert size9 <= size7 * 1.05 + 32, (size7, size9)
