"""Multi-reference DPB (i_frame_reference up to REF_MAX=4):
per-MB reference selection (x264_mb_analyse_inter_p16x16 ref loop,
encoder/analyse.c:787-862), sliding-window DPB (x264_reference_update,
encoder.c:878-916), ref_idx syntax in both coders (te() cavlc.c:244-301,
ctx-54 unary cabac.c:211-230), ref-aware MV prediction
(common/mvpred.c:22-137) and deblock strength ref comparison."""

import sys
from pathlib import Path

import numpy as np
import pytest

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def _flicker_clip(w, h, n, seed=17):
    """Two alternating scenes: frame t matches frame t-2 exactly, so
    ref 1 wins over ref 0 for nearly every MB once the DPB holds 2."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    scenes = []
    for k in range(2):
        y = (120 + 60 * np.sin(xx / (5 + 3 * k)) * np.cos(yy / (7 - 2 * k))
             + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        u = (110 + 40 * np.sin(xx[::2, ::2] / 9.0 + k)).clip(
            0, 255).astype(np.uint8)
        v = (140 - 40 * np.cos(yy[::2, ::2] / 8.0 + k)).clip(
            0, 255).astype(np.uint8)
        scenes.append((y, u, v))
    return [scenes[t % 2] for t in range(n)]


def _roundtrip(cabac, force_python=False):
    W, H, N = 64, 48, 5
    frames = _flicker_clip(W, H, N)
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = int(cabac)
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_frame_reference = 2
    p.analyse.i_me_method = P.ME_UMH
    enc = xt.Encoder(p)
    from x264dsp_tpu.entropy import native
    saved = None
    if force_python:
        saved = native._lib, native._tried
        native._lib, native._tried = None, True
    try:
        stream = b""
        recons = []
        for (y, u, v) in frames:
            nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
            stream += b"".join(n.payload for n in nals)
            recons.append((po.y, po.u, po.v))
    finally:
        if saved is not None:
            native._lib, native._tried = saved
    enc.close()
    dec = Decoder().decode(stream)
    assert len(dec) == N
    for t, (fy, fu, fv) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons[t][0], err_msg=f"Y {t}")
        np.testing.assert_array_equal(fu, recons[t][1], err_msg=f"U {t}")
        np.testing.assert_array_equal(fv, recons[t][2], err_msg=f"V {t}")
    return stream


def test_multiref_roundtrip_cavlc():
    _roundtrip(cabac=False)


def test_multiref_roundtrip_cabac():
    _roundtrip(cabac=True)


def test_multiref_improves_quality():
    """ref=2 must beat ref=1 on flicker content (alternating scenes):
    the 2-ref stream is much smaller at the same QP."""
    W, H, N = 64, 48, 6
    frames = _flicker_clip(W, H, N, seed=23)
    sizes = {}
    ref1_used = 0
    for nrefs in (1, 2):
        p = xt.param_default()
        p.i_width, p.i_height = W, H
        p.b_cabac = 0
        p.rc.i_rc_method = P.RC_CQP
        p.rc.i_qp_constant = 30
        p.i_frame_reference = nrefs
        p.analyse.i_me_method = P.ME_UMH
        enc = xt.Encoder(p)
        total = 0
        for t, (y, u, v) in enumerate(frames):
            nals, _ = enc.encode(xt.Picture.from_planes(y, u, v))
            total += sum(len(n.payload) for n in nals)
            if nrefs == 2 and t >= 2:
                ref1_used += int((enc._core._last_syn.get("ref") == 1).sum())
        enc.close()
        sizes[nrefs] = total
    assert ref1_used > 0, "ref 1 never chosen on flicker content"
    assert sizes[2] < sizes[1] * 0.8, sizes


def test_multiref_python_native_parity():
    from x264dsp_tpu.entropy import native
    if native.get_lib() is None:
        pytest.skip("native entropy unavailable")
    for cabac in (False, True):
        streams = {}
        for force in (False, True):
            W, H, N = 64, 48, 4
            frames = _flicker_clip(W, H, N, seed=31)
            p = xt.param_default()
            p.i_width, p.i_height = W, H
            p.b_cabac = int(cabac)
            p.rc.i_rc_method = P.RC_CQP
            p.rc.i_qp_constant = 28
            p.i_frame_reference = 3
            p.analyse.i_me_method = P.ME_UMH
            enc = xt.Encoder(p)
            saved = None
            if force:
                saved = native._lib, native._tried
                native._lib, native._tried = None, True
            try:
                parts = []
                for (y, u, v) in frames:
                    nals, _ = enc.encode(xt.Picture.from_planes(y, u, v))
                    parts.append(b"".join(n.payload for n in nals))
            finally:
                if saved is not None:
                    native._lib, native._tried = saved
            enc.close()
            streams[force] = parts
        for i, (a, b) in enumerate(zip(streams[False], streams[True])):
            assert a == b, f"cabac={cabac} frame={i}"


def test_frame_packing5_ref_order():
    """i_frame_packing == 5 (3D, one view per frame): L0 orders by the
    view-pair distance (x264_reference_distance, encoder.c:804-810) so
    the same-view frame ranks before the closer other-view frame, with
    an explicit ref_pic_list_modification since frame_num no longer
    descends. Stream must still decode to the encoder recon."""
    W, H, N = 64, 48, 5
    frames = _flicker_clip(W, H, N)  # t matches t-2: same "view"
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    # ref=2 already shows the reorder (even frame t: dist(t-2)=2 beats
    # dist(t-1)=3) and reuses the n_ref=2 kernel compiles of the other
    # multiref tests
    p.i_frame_reference = 2
    p.i_frame_packing = 5
    enc = xt.Encoder(p)
    stream = b""
    recons = []
    orders = []
    for t, (y, u, v) in enumerate(frames):
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        stream += b"".join(n.payload for n in nals)
        recons.append((po.y, po.u, po.v))
        if t >= 3:
            orders.append(list(enc._core._active_refs))
    enc.close()
    # For an EVEN frame t (first of pair {t, t+1}) the same-view frame
    # t-2 (distance 2) outranks the adjacent other-view frame t-1
    # (distance 3); for an ODD frame the pair-mate t-1 (distance 1) is
    # nearest anyway, giving the default order.
    for t, order in zip(range(3, N), orders):
        want = (t - 2) if t % 2 == 0 else (t - 1)
        assert order[0] == want % 16, (t, order)
    dec = Decoder().decode(stream)
    for t, (fy, fu, fv) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons[t][0], err_msg=f"Y {t}")
