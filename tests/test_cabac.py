"""CABAC entropy: engine + MB syntax round-trip, default-config parity."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import x264dsp_tpu as xt
from x264dsp_tpu import params as P
from x264dsp_tpu.entropy.cabac import CabacEncoder

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import CabacDecoder, Decoder  # noqa: E402
from test_inter_roundtrip import _moving_clip  # noqa: E402


def test_engine_roundtrip_random():
    rng = np.random.default_rng(7)
    for trial in range(20):
        enc = CabacEncoder(True, 26)
        events = []
        for _ in range(rng.integers(50, 400)):
            kind = rng.integers(0, 3)
            if kind == 0:
                ctx = int(rng.integers(0, 276))
                b = int(rng.integers(0, 2))
                enc.decision(ctx, b)
                events.append(("d", ctx, b))
            elif kind == 1:
                b = int(rng.integers(0, 2))
                enc.bypass(-b)
                events.append(("b", b))
            else:
                v = int(rng.integers(0, 300))
                k = int(rng.integers(0, 4))
                enc.ue_bypass(k, v)
                events.append(("u", k, v))
        data = enc.flush()
        dec = CabacDecoder(data, 0, True, 26)
        for ev in events:
            if ev[0] == "d":
                assert dec.decision(ev[1]) == ev[2], (trial, ev)
            elif ev[0] == "b":
                assert dec.bypass() == ev[1], (trial, ev)
            else:
                assert dec.ue_bypass(ev[1]) == ev[2], (trial, ev)
        assert dec.terminal() == 1


def test_cabac_ippp_roundtrip_and_smaller():
    W, H, N = 64, 48, 3
    frames = _moving_clip(W, H, N, seed=31)
    sizes = {}
    for cabac in (0, 1):
        p = xt.param_default()
        p.i_width, p.i_height = W, H
        p.b_cabac = cabac
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
        for t in range(N):
            np.testing.assert_array_equal(dec[t][0], recons[t][0])
            np.testing.assert_array_equal(dec[t][1], recons[t][1])
            np.testing.assert_array_equal(dec[t][2], recons[t][2])
        sizes[cabac] = len(stream)
    assert sizes[1] < sizes[0], sizes


def test_decoder_parses_reference_cabac_stream(oracle, qcif_yuv, tmp_path):
    """Decode the reference's default (CABAC Main CRF) output."""
    oracle_cli = oracle.parent / "oracle_cli"
    if not oracle_cli.exists():
        pytest.skip("oracle_cli not built")
    out = tmp_path / "ref_cabac.264"
    env = dict(os.environ, ORACLE_QP="26", ORACLE_KEYINT="50",
               ORACLE_CABAC="1")
    subprocess.run([str(oracle_cli), str(qcif_yuv), str(out), "3"],
                   check=True, capture_output=True, env=env)
    frames = Decoder().decode(out.read_bytes())
    assert len(frames) == 3
    from x264dsp_tpu.utils.yuv import YUVReader
    r = YUVReader(str(qcif_yuv))
    for t in range(3):
        y = r.read_frame(t)[0]
        d = frames[t][0].astype(int) - y.astype(int)
        psnr = 10 * np.log10(255 ** 2 / (d * d).mean())
        assert psnr > 30, (t, psnr)
