"""Adaptive quantization (per-MB QP) conformance.

Variance AQ (x264_adaptive_quant_frame, encoder/ratecontrol.c:241-300 +
x264_ratecontrol_mb_qp :796-811) produces varying per-MB QPs; the stream
must carry mb_qp_delta in both entropy coders and the decoder must apply
per-MB QP to dequant AND to the deblocker (neighbour-QP averaging,
common/deblock.c:341-430). These tests round-trip encode → own decoder
and require bit-exact reconstruction match.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def _textured_clip(w, h, n, seed=5):
    """Mixed flat + busy areas so variance AQ produces a QP spread."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = np.full((h, w), 128.0)
        # busy left half, flat right half
        y[:, : w // 2] += 70 * np.sin((xx[:, : w // 2] + 2 * t) / 2.3) \
            * np.cos(yy[:, : w // 2] / 3.1)
        y += rng.normal(0, 2, (h, w))
        u = (128 + 25 * np.sin((xx[::2, ::2] + t) / 7.0)).clip(0, 255)
        v = (128 + 25 * np.cos(yy[::2, ::2] / 9.0)).clip(0, 255)
        frames.append((y.clip(0, 255).astype(np.uint8),
                       u.astype(np.uint8), v.astype(np.uint8)))
    return frames


def _roundtrip(cabac: bool):
    W, H, N = 64, 48, 3
    frames = _textured_clip(W, H, N)
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = int(cabac)
    # AQ is forced off under CQP (validate_parameters, as in the
    # reference encoder.c:238-247) → use CRF
    p.rc.i_rc_method = P.RC_CRF
    p.rc.f_rf_constant = 26.0
    p.rc.i_aq_mode = P.AQ_VARIANCE
    p.rc.f_aq_strength = 1.0
    enc = xt.Encoder(p)
    stream = b""
    recons = []
    qp_spread = 0
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        stream += b"".join(n.payload for n in nals)
        recons.append((po.y, po.u, po.v))
        qpmb = enc._core._last_qp_mb
        qp_spread = max(qp_spread, int(qpmb.max() - qpmb.min()))
    enc.close()
    # AQ must actually vary the QP on this content
    assert qp_spread >= 2, qp_spread
    dec = Decoder().decode(stream)
    assert len(dec) == N
    for t, (fy, fu, fv) in enumerate(dec):
        ry, ru, rv = recons[t]
        np.testing.assert_array_equal(fy, ry, err_msg=f"Y frame {t}")
        np.testing.assert_array_equal(fu, ru, err_msg=f"U frame {t}")
        np.testing.assert_array_equal(fv, rv, err_msg=f"V frame {t}")


def test_aq_roundtrip_cavlc():
    _roundtrip(cabac=False)


def test_aq_roundtrip_cabac():
    _roundtrip(cabac=True)


def test_aq_python_native_parity():
    """The Python entropy twins and the C++ writers must produce
    byte-identical AQ streams (qp_delta paths)."""
    from x264dsp_tpu.entropy import native
    if native.get_lib() is None:
        pytest.skip("native entropy unavailable")
    W, H, N = 64, 48, 2
    frames = _textured_clip(W, H, N, seed=9)

    streams = {}
    for use_native in (True, False):
        p = xt.param_default()
        p.i_width, p.i_height = W, H
        p.b_cabac = 1
        p.rc.i_rc_method = P.RC_CRF
        p.rc.f_rf_constant = 24.0
        p.rc.i_aq_mode = P.AQ_VARIANCE
        enc = xt.Encoder(p)
        parts = []
        if not use_native:
            # force the Python fallback
            saved = native._lib, native._tried
            native._lib, native._tried = None, True
        try:
            for (y, u, v) in frames:
                nals, _ = enc.encode(xt.Picture.from_planes(y, u, v))
                parts.append(b"".join(n.payload for n in nals))
        finally:
            if not use_native:
                native._lib, native._tried = saved
        enc.close()
        streams[use_native] = parts
    for a, b in zip(streams[True], streams[False]):
        assert a == b
