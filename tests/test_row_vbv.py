"""Per-row VBV rate control (x264_ratecontrol_mb, ratecontrol.c:599-780):
row predictors, end-of-row QP-step walk, and the whole-frame ramp
re-encode that replaces the reference's mid-slice row re-encode."""

import sys
from pathlib import Path

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P
from x264dsp_tpu.encoder.ratecontrol import RateControl

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def _tight_vbv_param(w, h):
    p = xt.param_default()
    p.i_width, p.i_height = w, h
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_ABR
    p.rc.i_bitrate = 80
    p.rc.i_vbv_max_bitrate = 80
    p.rc.i_vbv_buffer_size = 10     # ~3 frame budgets: very tight
    p.i_keyint_max = 50
    return p


def _bottom_heavy_clip(w, h, n, seed=9):
    """Flat top half, heavy texture bottom half: the frame's bits arrive
    late, which is exactly what row-level VBV exists to catch."""
    rng = np.random.default_rng(seed)
    frames = []
    for t in range(n):
        y = np.full((h, w), 120, np.float64)
        y[h // 2:] += rng.normal(0, 40, (h // 2, w))
        y[h // 2:] += 50 * np.sin(np.arange(w) / 2.3 + t)[None, :]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y.clip(0, 255).astype(np.uint8), u, v))
    return frames


def test_row_vbv_adjust_ramps_up_on_backloaded_frame():
    """Unit: a frame whose measured bits are concentrated in the late
    rows and blow the plan must come back with a higher-QP tail ramp."""
    p = _tight_vbv_param(64, 96)
    p = P.validate_parameters(p)
    rc = RateControl(p, (64 // 16) * (96 // 16))
    rc.start(P.SLICE_TYPE_P, 50000)
    n = 6
    ramp = np.full(n, int(rc.qpm), np.int32)
    # frame plan blown 4x, all in the bottom rows
    plan = max(rc.frame_size_planned, 1.0)
    row_bits = np.array([0.05, 0.05, 0.1, 1.0, 1.5, 1.3]) * plan
    row_satd = np.array([100, 100, 200, 2000, 3000, 2600], np.int64)
    new = rc.row_vbv_adjust(P.SLICE_TYPE_P, ramp, row_bits, row_satd)
    assert new is not None
    assert new[-1] > ramp[-1], (ramp, new)
    assert (np.diff(new) >= 0).all(), new   # monotone ramp up


def test_row_vbv_end_to_end():
    """Tight-VBV encode of a bottom-heavy clip: intra-frame QP ramps
    appear, the CPB never underflows, and the stream decodes exactly."""
    W, H, N = 64, 96, 6
    p = _tight_vbv_param(W, H)
    frames = _bottom_heavy_clip(W, H, N)
    enc = xt.Encoder(p)
    stream = b""
    recons = []
    ramped = False
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        stream += b"".join(n.payload for n in nals)
        recons.append((po.y, po.u, po.v))
        core = enc._core
        row_qp = core._last_qp_mb.mean(axis=1)
        if np.unique(np.round(row_qp)).size > 1:
            ramped = True
        # per-row arrival must fit the CPB: walking the measured row
        # bits from the frame's buffer fill can never go negative
        rc = core.rc
        if core._row_bits is not None:
            fill = rc.buffer_fill
            assert core._row_bits.sum() <= fill + 1e-6, \
                (core._row_bits.sum(), fill)
        # frame-level: the final buffer state never underflows
        assert rc.buffer_fill_final >= 0, rc.buffer_fill_final
    enc.close()
    assert ramped, "tight VBV on a bottom-heavy clip produced no QP ramp"
    dec = Decoder().decode(stream)
    assert len(dec) == N
    for t, (fy, fu, fv) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons[t][0], err_msg=f"Y {t}")
        np.testing.assert_array_equal(fu, recons[t][1], err_msg=f"U {t}")
        np.testing.assert_array_equal(fv, recons[t][2], err_msg=f"V {t}")
