"""User-forced frame types (x264_picture_t.i_type): a forced I inside
keyint_min stays a NON-IDR I slice (closed-GOP promotion only after
keyint_min, slicetype.c:516-529); forced IDR always restarts the GOP.
The non-IDR I must keep frame_num/DPB continuity and decode exactly."""

import sys
from pathlib import Path

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402

from conftest import make_clip


def _nal_types(nals):
    return [n.i_type for n in nals]


def test_forced_i_within_keyint_min_is_non_idr():
    W, H = 96, 80
    frames = make_clip(W, H, 5)
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 50
    p.i_keyint_min = 25
    enc = xt.Encoder(p)
    stream = b"".join(n.payload for n in enc.headers())
    recons = []
    types = []
    for t, (y, u, v) in enumerate(frames):
        pic = xt.Picture.from_planes(y, u, v)
        if t == 2:
            pic.i_type = P.TYPE_I   # forced I at gop=2 < keyint_min
        nals, po = enc.encode(pic)
        stream += b"".join(n.payload for n in nals)
        types.append([n.i_type for n in nals])
        recons.append((po.y, po.u, po.v))
    enc.close()

    # frame 2's slice NAL must be a non-IDR slice (type 1), I coded
    assert P.NAL_SLICE in types[2], types[2]
    assert P.NAL_SLICE_IDR not in types[2], types[2]
    assert po.i_frame_type != 0

    dec = Decoder().decode(stream)
    assert len(dec) == len(frames)
    for t, ((dy, du, dv), (ry, ru, rv)) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(dy, ry, err_msg=f"Y frame {t}")
        np.testing.assert_array_equal(du, ru, err_msg=f"U frame {t}")


def test_forced_i_after_keyint_min_promotes_to_idr():
    W, H = 96, 80
    frames = make_clip(W, H, 5)
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 50
    p.i_keyint_min = 3
    enc = xt.Encoder(p)
    stream = b"".join(n.payload for n in enc.headers())
    types = []
    for t, (y, u, v) in enumerate(frames):
        pic = xt.Picture.from_planes(y, u, v)
        if t == 4:
            pic.i_type = P.TYPE_I   # gop=4 >= keyint_min=3 → IDR
        nals, _ = enc.encode(pic)
        stream += b"".join(n.payload for n in nals)
        types.append([n.i_type for n in nals])
    enc.close()
    assert P.NAL_SLICE_IDR in types[4], types[4]
    assert len(Decoder().decode(stream)) == len(frames)
