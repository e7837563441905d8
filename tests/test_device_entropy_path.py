"""Device CAVLC entropy stage on the API path (X264_DEVICE_ENTROPY=1).

With the device stage on, the packed slice payload itself crosses the
wire (entropy/cavlc_device.py) instead of the per-MB syntax tensors;
the host only escapes and frames the NAL. Streams, per-row bit
positions (row-VBV feed), and MB-type stats must be byte-identical to
the native/host writers' (X264_DEVICE_ENTROPY=0), and the CAVLC
level-overflow recovery (cavlc.c:56-60) must fall back to the host
writers and still converge."""

import os

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

W, H = 128, 96


def _clip(n=3):
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    out = []
    for t in range(n):
        y = np.clip(90 + 50 * np.sin((xx + 2 * t) / 9.0)
                    + 30 * np.cos(yy / 11.0)
                    + rng.normal(0, 3, (H, W)), 0, 255).astype(np.uint8)
        # flat top-left quadrant: variance AQ must produce a genuinely
        # per-MB QP map so the dqp chains are exercised
        y[:H // 2, :W // 2] = 120
        u = np.clip(120 + 30 * np.sin((xx[::2, ::2] + 2 * t) / 17.0),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 30 * np.cos((yy[::2, ::2] + t) / 13.0),
                    0, 255).astype(np.uint8)
        out.append((y, u, v))
    return out


def _param():
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 3
    p.i_frame_reference = 2          # te() ref coding
    p.analyse.inter = P.ANALYSE_PSUB16x16  # partition mb_types
    p.rc.i_aq_mode = P.AQ_VARIANCE   # per-MB dqp chain
    p.rc.f_aq_strength = 1.0
    return p


def _encode(dev, frames, param=None):
    os.environ["X264_DEVICE_ENTROPY"] = "1" if dev else "0"
    try:
        enc = xt.Encoder(param if param is not None else _param())
        blobs, rows = [], []
        for (y, u, v) in frames:
            nals, _ = enc.encode(xt.Picture.from_planes(y, u, v))
            blobs.append(b"".join(n.payload for n in nals))
            rows.append(None if enc._core._row_bits is None
                        else enc._core._row_bits.copy())
        stats = dict(enc._core.stats.i_mb_count)
        return blobs, rows, stats
    finally:
        del os.environ["X264_DEVICE_ENTROPY"]


def test_device_entropy_matches_host_writers():
    frames = _clip()
    b0, r0, s0 = _encode(False, frames)
    b1, r1, s1 = _encode(True, frames)
    for i, (a, b) in enumerate(zip(b0, b1)):
        assert a == b, f"frame {i}: stream bytes differ"
    for i, (a, b) in enumerate(zip(r0, r1)):
        assert (a is None) == (b is None), f"frame {i}: row_bits presence"
        if a is not None:
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
    assert s0 == s1


def test_device_entropy_overflow_falls_back():
    """Extreme-residual I frame (QP 0, I16-only: hadamard DC levels
    escape the CAVLC range): the device packer's ov flag must route the
    frame through the host analytic-bump loop and produce exactly the
    host path's stream."""
    w = h = 48
    y = np.full((h, w), 255, np.uint8)
    y[:16] = 0
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)

    def param():
        p = xt.param_default()
        p.i_width, p.i_height = w, h
        p.b_cabac = 0
        p.rc.i_rc_method = P.RC_CQP
        p.rc.i_qp_constant = 0
        p.rc.f_ip_factor = 1.0
        p.analyse.intra = 0          # I16x16 only (the overflowing path)
        return p

    b0, _, _ = _encode(False, [(y, u, v)], param=param())
    b1, _, _ = _encode(True, [(y, u, v)], param=param())
    assert b0[0] == b1[0]
