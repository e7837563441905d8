"""Native C++ entropy stage vs the pure-Python twin: byte parity."""

import numpy as np
import pytest

import x264dsp_tpu as xt
from x264dsp_tpu import params as P
from x264dsp_tpu.entropy import native
from x264dsp_tpu.entropy.bitstream import nal_escape as py_escape

from test_inter_roundtrip import _moving_clip


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native entropy lib unavailable (no g++?)")
    return lib


def test_nal_escape_parity(lib):
    rng = np.random.default_rng(0)
    for _ in range(100):
        raw = rng.choice([0, 0, 0, 1, 2, 3, 255],
                         size=rng.integers(0, 300)).astype(np.uint8).tobytes()
        assert native.nal_escape(raw) == py_escape(raw)


def _encode_with(frames, use_native):
    import x264dsp_tpu.encoder.core as core_mod
    W = frames[0][0].shape[1]
    H = frames[0][0].shape[0]
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 50
    enc = xt.Encoder(p)
    if not use_native:
        # force the Python fallback
        import x264dsp_tpu.entropy.native as nat
        orig_i, orig_p = nat.write_slice_i, nat.write_slice_p
        nat.write_slice_i = lambda *a, **k: None
        nat.write_slice_p = lambda *a, **k: None
    try:
        stream = b""
        for (y, u, v) in frames:
            nals, _ = enc.encode(xt.Picture.from_planes(y, u, v))
            stream += b"".join(n.payload for n in nals)
    finally:
        if not use_native:
            nat.write_slice_i, nat.write_slice_p = orig_i, orig_p
    return stream


def test_slice_writer_byte_parity(lib):
    frames = _moving_clip(64, 48, 3, seed=41)
    a = _encode_with(frames, use_native=True)
    b = _encode_with(frames, use_native=False)
    assert a == b, (len(a), len(b))


def _encode_cabac_with(frames, use_native):
    p = xt.param_default()
    p.i_width = frames[0][0].shape[1]
    p.i_height = frames[0][0].shape[0]
    p.b_cabac = 1
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 50
    enc = xt.Encoder(p)
    if not use_native:
        import x264dsp_tpu.entropy.native as nat
        orig = nat.write_slice_cabac
        nat.write_slice_cabac = lambda *a, **k: None
    try:
        stream = b""
        for (y, u, v) in frames:
            nals, _ = enc.encode(xt.Picture.from_planes(y, u, v))
            stream += b"".join(n.payload for n in nals)
    finally:
        if not use_native:
            nat.write_slice_cabac = orig
    return stream


def test_cabac_writer_byte_parity(lib):
    frames = _moving_clip(64, 48, 4, seed=17)
    a = _encode_cabac_with(frames, use_native=True)
    b = _encode_cabac_with(frames, use_native=False)
    assert a == b
    assert len(a) > 400
