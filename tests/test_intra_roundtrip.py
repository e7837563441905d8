"""End-to-end all-intra conformance: encode → own-decoder round-trip.

The decoder reconstruction must equal the encoder's reconstruction exactly
(bitstream conformance by construction, SURVEY §4.3). Also decodes a
reference-encoder stream to validate the decoder independently.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402

from conftest import make_clip  # noqa: E402


def _encode_clip(frames, qp=26, cavlc=True, keyint=1):
    h, w = frames[0][0].shape
    p = xt.param_default()
    p.i_width, p.i_height = w, h
    p.b_cabac = 0 if cavlc else 1
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = qp
    p.i_keyint_max = keyint
    enc = xt.Encoder(p)
    stream = b"".join(n.payload for n in enc.headers())
    recons = []
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        stream += b"".join(n.payload for n in nals)
        recons.append((po.y, po.u, po.v))
    return stream, recons, enc


class TestIntraRoundtrip:
    def test_encode_decode_recon_exact(self):
        frames = make_clip(48, 32, 2, seed=11)
        stream, recons, enc = _encode_clip(frames, qp=26)
        decoded = Decoder().decode(stream)
        assert len(decoded) == 2
        for t, (fy, fu, fv) in enumerate(decoded):
            ry, ru, rv = recons[t]
            np.testing.assert_array_equal(fy, ry, err_msg=f"Y frame {t}")
            np.testing.assert_array_equal(fu, ru, err_msg=f"U frame {t}")
            np.testing.assert_array_equal(fv, rv, err_msg=f"V frame {t}")

    def test_psnr_reasonable(self):
        frames = make_clip(48, 32, 1, seed=12)
        stream, recons, enc = _encode_clip(frames, qp=26)
        y = frames[0][0]
        d = recons[0][0].astype(int) - y.astype(int)
        psnr = 10 * np.log10(255 ** 2 / (d * d).mean())
        assert psnr > 33, psnr

    @pytest.mark.parametrize("qp", [18, 35])
    def test_qp_sweep(self, qp):
        frames = make_clip(48, 32, 1, seed=13)
        stream, recons, _ = _encode_clip(frames, qp=qp)
        decoded = Decoder().decode(stream)
        np.testing.assert_array_equal(decoded[0][0], recons[0][0])
        np.testing.assert_array_equal(decoded[0][1], recons[0][1])


def test_decoder_parses_reference_stream(oracle, qcif_yuv, tmp_path):
    """Independent decoder validation: parse the reference encoder's
    all-intra CAVLC stream (built via tools/oracle/oracle_cli.c)."""
    import os
    oracle_cli = oracle.parent / "oracle_cli"
    if not oracle_cli.exists():
        pytest.skip("oracle_cli not built")
    out = tmp_path / "ref_intra.264"
    env = dict(os.environ, ORACLE_QP="26", ORACLE_CABAC="0",
               ORACLE_KEYINT="1")
    subprocess.run([str(oracle_cli), str(qcif_yuv), str(out), "2"],
                   check=True, capture_output=True, env=env)
    frames = Decoder().decode(out.read_bytes())
    assert len(frames) == 2
    assert frames[0][0].shape == (144, 176)
    # sanity: decoded picture is close to the source at QP≈23
    from x264dsp_tpu.utils.yuv import YUVReader
    r = YUVReader(str(qcif_yuv))
    y = r.read_frame(0)[0]
    d = frames[0][0].astype(int) - y.astype(int)
    psnr = 10 * np.log10(255 ** 2 / (d * d).mean())
    assert psnr > 33, psnr
