"""Multi-slice frames (i_slice_count / i_slice_max_mbs): independent
row-band slices, one NAL each, cross-slice deblocking, exact decode."""

import sys
from pathlib import Path

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def _clip(w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (120 + 60 * np.sin((xx + 3 * t) / 9.0) * np.cos(yy / 7.0)
             + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 30 * np.sin((xx[::2, ::2] + t) / 5.0)).clip(0, 255) \
            .astype(np.uint8)
        v = (128 + 30 * np.cos(yy[::2, ::2] / 6.0)).clip(0, 255) \
            .astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _run(p, frames):
    enc = xt.Encoder(p)
    stream = b""
    slice_nals = 0
    recons = []
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        slice_nals += sum(1 for n in nals
                          if n.i_type in (P.NAL_SLICE, P.NAL_SLICE_IDR))
        stream += b"".join(n.payload for n in nals)
        recons.append((po.y, po.u, po.v))
    enc.close()
    dec = Decoder().decode(stream)
    assert len(dec) == len(frames)
    for t, (fy, fu, fv) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons[t][0], err_msg=f"Y {t}")
        np.testing.assert_array_equal(fu, recons[t][1], err_msg=f"U {t}")
        np.testing.assert_array_equal(fv, recons[t][2], err_msg=f"V {t}")
    return slice_nals


def _param(w, h, cabac=0):
    p = xt.param_default()
    p.i_width, p.i_height = w, h
    p.b_cabac = cabac
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 50
    return p


def test_three_slices_cavlc_ippp():
    W, H, N = 64, 96, 4                   # 6 MB rows -> 3 slices of 2
    frames = _clip(W, H, N)
    p = _param(W, H)
    p.i_slice_count = 3
    n = _run(p, frames)
    assert n == 3 * N


def test_three_slices_cabac():
    W, H, N = 64, 96, 3
    frames = _clip(W, H, N)
    p = _param(W, H, cabac=1)
    p.i_slice_count = 3
    n = _run(p, frames)
    assert n == 3 * N


def test_slice_max_mbs():
    W, H, N = 64, 96, 2                   # 4 MBs/row, 6 rows = 24 MBs
    frames = _clip(W, H, N)
    p = _param(W, H)
    p.i_slice_max_mbs = 8                 # 2 rows per slice -> 3 slices
    n = _run(p, frames)
    assert n == 3 * N


def test_slice_count_validation():
    p = _param(64, 96)
    p.i_slice_count = 99
    v = P.validate_parameters(p)
    assert v.i_slice_count == 6           # clipped to MB rows
    p2 = _param(64, 96)
    p2.i_slice_count = 4
    p2.i_slice_max_mbs = 8
    v2 = P.validate_parameters(p2)
    assert v2.i_slice_count == 0          # max_mbs overrides count


def test_slice_max_size():
    """i_slice_max_size (x264.h:660): every slice NAL, including
    startcode/escape overhead, fits the byte budget, and the stream
    stays exactly decodable."""
    W, H, N = 64, 96, 3
    frames = _clip(W, H, N)
    p = _param(W, H)
    p.i_slice_max_size = 400
    enc = xt.Encoder(p)
    stream = b""
    recons = []
    max_nal = 0
    n_slices = 0
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        for n in nals:
            if n.i_type in (P.NAL_SLICE, P.NAL_SLICE_IDR):
                max_nal = max(max_nal, len(n.payload))
                n_slices += 1
        stream += b"".join(n.payload for n in nals)
        recons.append((po.y, po.u, po.v))
    enc.close()
    assert max_nal <= 400, max_nal
    assert n_slices > N                   # the budget actually split
    dec = Decoder().decode(stream)
    assert len(dec) == N
    for t, (fy, fu, fv) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons[t][0], err_msg=f"Y {t}")
        np.testing.assert_array_equal(fu, recons[t][1], err_msg=f"U {t}")
        np.testing.assert_array_equal(fv, recons[t][2], err_msg=f"V {t}")
