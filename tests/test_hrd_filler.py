"""NAL HRD signalling + CBR filler (encoder/set.c:359-375, 577-630,
671-683; ratecontrol.c update_vbv :945-952)."""

import sys
from pathlib import Path

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P
from x264dsp_tpu.encoder import sets as S

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def _flat_clip(w, h, n):
    frames = []
    for t in range(n):
        y = np.full((h, w), 120 + (t & 1), np.uint8)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        frames.append((y, u, v))
    return frames


def _cbr_param(w, h):
    p = xt.param_default()
    p.i_width, p.i_height = w, h
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_ABR
    p.rc.i_bitrate = 400
    p.rc.i_vbv_max_bitrate = 400
    p.rc.i_vbv_buffer_size = 400
    p.i_nal_hrd = P.NAL_HRD_CBR
    p.i_keyint_max = 50
    return p


def test_cbr_emits_filler_and_decodes():
    W, H, N = 64, 48, 8
    frames = _flat_clip(W, H, N)
    enc = xt.Encoder(_cbr_param(W, H))
    stream = b""
    nal_types = []
    recons = []
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        nal_types += [n.i_type for n in nals]
        stream += b"".join(n.payload for n in nals)
        recons.append((po.y, po.u, po.v))
    enc.close()
    # flat content at 400 kbps CBR must underflow -> filler NALs
    assert P.NAL_FILLER in nal_types, nal_types
    assert P.NAL_SEI in nal_types
    # SEI/filler must not break the conformance decoder
    dec = Decoder().decode(stream)
    assert len(dec) == N
    for t, (fy, fu, fv) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons[t][0])
        np.testing.assert_array_equal(fu, recons[t][1])
        np.testing.assert_array_equal(fv, recons[t][2])


def test_cbr_downgrades_without_vbv():
    p = xt.param_default()
    p.i_width = p.i_height = 64
    p.i_nal_hrd = P.NAL_HRD_CBR          # no VBV set
    v = P.validate_parameters(p)
    assert v.i_nal_hrd == P.NAL_HRD_NONE

    p2 = _cbr_param(64, 64)
    p2.rc.i_vbv_max_bitrate = 500        # != bitrate -> VBR downgrade
    v2 = P.validate_parameters(p2)
    assert v2.i_nal_hrd == P.NAL_HRD_VBR


def test_hrd_sps_fields_and_sei_bytes():
    p = P.validate_parameters(_cbr_param(64, 48))
    sps = S.SPS.init(p, 0)
    assert sps.vui_nal_hrd_present == 1
    assert sps.hrd_cbr == 1
    # scale identity: value << (6+scale) == reconstructed unscaled rate
    assert (sps.hrd_bit_rate_value << (6 + sps.hrd_bit_rate_scale)
            == sps.hrd_bit_rate_unscaled)
    assert (sps.hrd_cpb_size_value << (4 + sps.hrd_cpb_size_scale)
            == sps.hrd_cpb_size_unscaled)
    assert abs(sps.hrd_bit_rate_unscaled - 400000) <= 1 << (
        6 + sps.hrd_bit_rate_scale)

    # recovery point SEI: ue(0)=1bit '1', flags 1,0, 2 bits 0 -> payload
    # bits '1 1 0 00' + align_10 '1' + pad = 11000100 = 0xC4; type 6 size 1
    rbsp = S.sei_recovery_point_rbsp(0)
    assert rbsp == bytes([6, 1, 0xC4, 0x80])

    # filler: n 0xff + trailing 0x80
    assert S.filler_rbsp(3) == b"\xff\xff\xff\x80"

    # frame packing / dec_ref_pic_marking smoke: well-formed SEI headers
    fp = S.sei_frame_packing_rbsp(3, True)
    assert fp[0] == S.SEI_FRAME_PACKING
    dr = S.sei_dec_ref_pic_marking_rbsp(5, [2])
    assert dr[0] == S.SEI_DEC_REF_PIC_MARKING
