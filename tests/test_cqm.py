"""Custom quantization matrices: JVT preset and custom scaling lists
(common/set.c:287-352, encoder/set.c:13-47,429-465)."""

import sys
from pathlib import Path

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P
from x264dsp_tpu.ops import tables as TB

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder, parse_pps, unescape_ebsp  # noqa: E402


def _clip(w, h, n, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (110 + 70 * np.sin((xx + 2 * t) / 8.0) * np.cos(yy / 6.0)
             + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        u = (120 + 35 * np.sin((xx[::2, ::2]) / 7.0)).clip(0, 255) \
            .astype(np.uint8)
        v = (130 + 35 * np.cos((yy[::2, ::2] + t) / 9.0)).clip(0, 255) \
            .astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _encode_roundtrip(p, frames):
    enc = xt.Encoder(p)
    stream = b""
    recons = []
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        stream += b"".join(n.payload for n in nals)
        recons.append((po.y, po.u, po.v))
    enc.close()
    dec = Decoder().decode(stream)
    assert len(dec) == len(frames)
    for t, (fy, fu, fv) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons[t][0], err_msg=f"Y {t}")
        np.testing.assert_array_equal(fu, recons[t][1], err_msg=f"U {t}")
        np.testing.assert_array_equal(fv, recons[t][2], err_msg=f"V {t}")
    return stream


def test_jvt_cqm_roundtrip():
    W, H, N = 64, 48, 3
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 24
    p.i_cqm_preset = P.CQM_JVT
    _encode_roundtrip(p, _clip(W, H, N))


def test_custom_cqm_roundtrip_and_pps():
    W, H, N = 64, 48, 3
    custom = tuple(range(10, 26))               # asymmetric custom list
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 24
    p.i_cqm_preset = P.CQM_CUSTOM
    p.cqm_4iy = custom
    p.cqm_4py = custom
    p.cqm_4ic = custom
    p.cqm_4pc = custom
    stream = _encode_roundtrip(p, _clip(W, H, N))
    # PPS parse returns the custom list for every set
    pos = stream.find(b"\x00\x00\x01\x68")      # PPS NAL
    assert pos >= 0
    end = stream.find(b"\x00\x00\x01", pos + 4)
    rbsp = unescape_ebsp(stream[pos + 4:end])
    pps = parse_pps(rbsp)
    assert pps.scaling_list is not None
    for lst in pps.scaling_list:
        assert tuple(lst) == custom


def test_jvt_changes_stream_vs_flat():
    W, H, N = 64, 48, 2
    frames = _clip(W, H, N)

    def run(preset):
        p = xt.param_default()
        p.i_width, p.i_height = W, H
        p.b_cabac = 0
        p.rc.i_rc_method = P.RC_CQP
        p.rc.i_qp_constant = 24
        p.i_cqm_preset = preset
        enc = xt.Encoder(p)
        s = b""
        for (y, u, v) in frames:
            nals, _ = enc.encode(xt.Picture.from_planes(y, u, v))
            s += b"".join(n.payload for n in nals)
        enc.close()
        return s

    assert run(P.CQM_FLAT) != run(P.CQM_JVT)


def test_cqm_tables_flat_identity():
    q, bi, binter, d = TB.cqm_tables(TB.CQM_FLAT_LISTS)
    assert np.array_equal(q[0], TB.QUANT4_MF)
    assert np.array_equal(bi[0], TB.QUANT4_BIAS_INTRA)
    assert np.array_equal(binter[0], TB.QUANT4_BIAS_INTER)
    assert np.array_equal(d[0], TB.DEQUANT4_MF)
