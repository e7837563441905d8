"""IPPP end-to-end conformance: encode → own-decoder round-trip with
P frames, motion compensation and in-loop deblocking on both sides."""

import sys
from pathlib import Path

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def _moving_clip(w, h, n, seed=21):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (128 + 60 * np.sin((xx + 3 * t) / 9.0) * np.cos(yy / 7.0)
             + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 30 * np.sin((xx[::2, ::2] + t) / 5.0)).clip(0, 255).astype(np.uint8)
        v = (128 + 30 * np.cos(yy[::2, ::2] / 6.0)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def test_ippp_roundtrip_exact():
    W, H, N = 64, 48, 4
    frames = _moving_clip(W, H, N)
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 50
    enc = xt.Encoder(p)
    stream = b""
    recons = []
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        stream += b"".join(n.payload for n in nals)
        recons.append((po.y, po.u, po.v))
    dec = Decoder().decode(stream)
    assert len(dec) == N
    psnr_last = None
    for t, (fy, fu, fv) in enumerate(dec):
        ry, ru, rv = recons[t]
        np.testing.assert_array_equal(fy, ry, err_msg=f"Y frame {t}")
        np.testing.assert_array_equal(fu, ru, err_msg=f"U frame {t}")
        np.testing.assert_array_equal(fv, rv, err_msg=f"V frame {t}")
        d = fy.astype(int) - frames[t][0].astype(int)
        psnr_last = 10 * np.log10(255 ** 2 / max((d * d).mean(), 1e-9))
    assert psnr_last > 33, psnr_last
    # P frames must actually be used (stream much smaller than all-I)
    st = enc.close()
    assert st["frames"][P.SLICE_TYPE_P] == N - 1
