"""SPS/PPS byte-parity against the compiled reference encoder."""

import subprocess

import pytest

from x264dsp_tpu import param_default, params as P
from x264dsp_tpu.params import validate_parameters
from x264dsp_tpu.encoder.sets import PPS, SPS
from x264dsp_tpu.entropy.bitstream import BitWriter, nal_unit
from x264dsp_tpu.utils.annexb import split_nals


def _cli_params(width, height, **overrides):
    p = param_default()
    p.i_width = width
    p.i_height = height
    for k, v in overrides.items():
        obj = p
        parts = k.split(".")
        for part in parts[:-1]:
            obj = getattr(obj, part)
        setattr(obj, parts[-1], v)
    return validate_parameters(p)


def _our_headers(p):
    sps = SPS.init(p, p.i_sps_id)
    pps = PPS.init(p, sps, p.i_sps_id)
    bw = BitWriter()
    sps.write(bw)
    sps_nal = nal_unit(P.NAL_SPS, P.NAL_PRIORITY_HIGHEST, bw.get_bytes())
    bw = BitWriter()
    pps.write(bw)
    pps_nal = nal_unit(P.NAL_PPS, P.NAL_PRIORITY_HIGHEST, bw.get_bytes())
    return sps_nal, pps_nal


def _oracle_headers(oracle, yuv_path, tmp_path):
    out = tmp_path / "oracle.264"
    subprocess.run([str(oracle), str(yuv_path), str(out)],
                   check=True, capture_output=True)
    nals = split_nals(out.read_bytes())
    by_type = {}
    for n in nals:
        by_type.setdefault(n[0] & 0x1F, []).append(n)
    return by_type


def test_sps_pps_byte_parity_default(oracle, qcif_yuv, tmp_path):
    """Default params (CABAC on → Main profile, CRF): exact byte match."""
    by_type = _oracle_headers(oracle, qcif_yuv, tmp_path)
    p = _cli_params(176, 144)
    sps_nal, pps_nal = _our_headers(p)
    # compare payloads without the 4-byte start code
    assert sps_nal[4:] == bytes(by_type[P.NAL_SPS][0])
    assert pps_nal[4:] == bytes(by_type[P.NAL_PPS][0])


def test_level_inference_matches_oracle(oracle, qcif_yuv, tmp_path):
    by_type = _oracle_headers(oracle, qcif_yuv, tmp_path)
    # NAL header(1) + profile_idc(1) + constraint flags(1) + level_idc(1)
    oracle_level = by_type[P.NAL_SPS][0][3]
    p = _cli_params(176, 144)
    assert p.i_level_idc == oracle_level


def test_baseline_profile_when_cavlc():
    p = _cli_params(176, 144, b_cabac=0)
    sps = SPS.init(p, 0)
    assert sps.i_profile_idc == P.PROFILE_BASELINE
    assert sps.b_constraint_set0 == 1 and sps.b_constraint_set1 == 1


def test_validate_rejects_unsupported():
    with pytest.raises(P.ValidationError):
        _cli_params(177, 144)  # odd width
    with pytest.raises(P.ValidationError):
        _cli_params(176, 144, b_interlaced=1)


def test_param2string_and_log(capsys):
    from x264dsp_tpu import params as P
    p = P.param_default()
    p.i_width, p.i_height = 64, 48
    p = P.validate_parameters(p)
    s = P.param2string(p, True)
    assert "64x48" in s and "cabac=1" in s and "rc=crf" in s
    assert "keyint=50" in s and "me=0" in s

    # leveled logging honors i_log_level and pf_log
    P.x264_log(p, P.LOG_INFO, "hello")
    assert "x264 [info]: hello" in capsys.readouterr().out
    p.i_log_level = P.LOG_ERROR
    P.x264_log(p, P.LOG_INFO, "quiet")
    assert capsys.readouterr().out == ""
    got = []
    p.i_log_level = P.LOG_INFO
    p.pf_log = lambda priv, lvl, msg: got.append((lvl, msg))
    P.x264_log(p, P.LOG_INFO, "cb")
    assert got == [(P.LOG_INFO, "cb")]


def test_sei_carries_options_line():
    import numpy as np
    import x264dsp_tpu as xt
    from x264dsp_tpu import params as P
    p = xt.param_default()
    p.i_width = p.i_height = 32
    p.i_log_level = P.LOG_NONE
    enc = xt.Encoder(p)
    hdrs = enc.headers()
    sei = [n for n in hdrs if n.i_type == P.NAL_SEI]
    assert sei and b"options:" in sei[0].payload
    assert b"cabac=1" in sei[0].payload


def test_close_prints_summary(capsys):
    import numpy as np
    import x264dsp_tpu as xt
    from x264dsp_tpu import params as P
    p = xt.param_default()
    p.i_width = p.i_height = 32
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 30
    enc = xt.Encoder(p)
    rng = np.random.default_rng(0)
    for _ in range(2):
        y = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        u = np.full((16, 16), 128, np.uint8)
        v = u.copy()
        enc.encode(xt.Picture.from_planes(y, u, v))
    capsys.readouterr()
    enc.close()
    outp = capsys.readouterr().out
    assert "frame I:" in outp and "Avg QP:" in outp
    assert "mb " in outp and "kb/s:" in outp
