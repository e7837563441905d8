"""P partitions 16x8 / 8x16 / 8x8 (X264_ANALYSE_PSUB16x16):
analysis (encoder/analyse.c:864-1057, compare :1145-1182), per-partition
MC, partition-aware MV prediction (common/mvpred.c:22-100), syntax in
both entropy coders (cavlc.c:238-260, cabac.c:345-415), and the decoder
side. Round-trip must be bit-exact and partitions must actually be used
on content with divergent sub-block motion."""

import sys
from pathlib import Path

import numpy as np
import pytest

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def _split_motion_clip(w, h, n, seed=11):
    """Two halves moving in opposite directions + texture: forces
    sub-MB partitions to win on MBs straddling the boundary."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h * 2, 0:w * 2]
    base = (110 + 70 * np.sin(xx / 7.3) * np.cos(yy / 5.1)
            + rng.normal(0, 4, (h * 2, w * 2))).clip(0, 255)
    frames = []
    for t in range(n):
        y = np.zeros((h, w))
        d = 3 * t
        y[:h // 2] = base[8 + d:8 + d + h // 2, 8:8 + w]        # moves down
        y[h // 2:] = base[8:8 + h - h // 2, 8 + d:8 + d + w]    # moves right
        u = (120 + 30 * np.sin((xx[:h:2, :w:2] + d) / 9.0)).clip(0, 255)
        v = (128 + 30 * np.cos((yy[:h:2, :w:2] + d) / 11.0)).clip(0, 255)
        frames.append((y.astype(np.uint8), u.astype(np.uint8),
                       v.astype(np.uint8)))
    return frames


def _roundtrip(cabac, force_python=False):
    W, H, N = 64, 64, 4
    frames = _split_motion_clip(W, H, N)
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = int(cabac)
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 28
    p.analyse.inter = P.ANALYSE_PSUB16x16
    p.analyse.i_me_method = P.ME_UMH   # parallel ME mode
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
    st = enc.close()
    dec = Decoder().decode(stream)
    assert len(dec) == N
    for t, (fy, fu, fv) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons[t][0], err_msg=f"Y {t}")
        np.testing.assert_array_equal(fu, recons[t][1], err_msg=f"U {t}")
        np.testing.assert_array_equal(fv, recons[t][2], err_msg=f"V {t}")
    return st


def test_partitions_roundtrip_cavlc():
    st = _roundtrip(cabac=False)
    used = sum(st["mb_types"].get(k, 0)
               for k in ("P_16x8", "P_8x16", "P_8x8"))
    assert used > 0, st["mb_types"]


def test_partitions_roundtrip_cabac():
    st = _roundtrip(cabac=True)
    used = sum(st["mb_types"].get(k, 0)
               for k in ("P_16x8", "P_8x16", "P_8x8"))
    assert used > 0, st["mb_types"]


def test_partitions_python_twin_cavlc():
    from x264dsp_tpu.entropy import native
    if native.get_lib() is None:
        pytest.skip("native entropy unavailable")
    _roundtrip(cabac=False, force_python=True)


def test_partitions_python_native_parity():
    """Python twins and C++ writers byte-identical on partition streams."""
    from x264dsp_tpu.entropy import native
    if native.get_lib() is None:
        pytest.skip("native entropy unavailable")
    for cabac in (False, True):
        streams = {}
        for force in (False, True):
            W, H, N = 64, 64, 3
            frames = _split_motion_clip(W, H, N, seed=13)
            p = xt.param_default()
            p.i_width, p.i_height = W, H
            p.b_cabac = int(cabac)
            p.rc.i_rc_method = P.RC_CQP
            p.rc.i_qp_constant = 28
            p.analyse.inter = P.ANALYSE_PSUB16x16
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
        for a, b in zip(streams[False], streams[True]):
            assert a == b, f"cabac={cabac}"


def test_mvpred_grid_matches_16x16():
    """The block-granularity MVP reduces to the old MB-granularity rule
    when every MB is uniform 16x16."""
    from x264dsp_tpu.entropy.mvpred_host import MvGrid
    rng = np.random.default_rng(4)
    mb_w, mb_h = 5, 4
    mvs = rng.integers(-40, 40, (mb_h, mb_w, 2)).astype(np.int64)
    grid = MvGrid(mb_w, mb_h)
    for mby in range(mb_h):
        for mbx in range(mb_w):
            mvp = grid.predict_mv(mbx, mby, 0, 0)

            # old-style reference computation
            def nb(y, x):
                if y < 0 or x < 0 or x >= mb_w:
                    return np.zeros(2, np.int64), False
                return mvs[y, x], True
            a, ok_a = nb(mby, mbx - 1)
            b, ok_b = nb(mby - 1, mbx)
            c, ok_c = nb(mby - 1, mbx + 1)
            if not ok_c:
                c, ok_c = nb(mby - 1, mbx - 1)
            cnt = ok_a + ok_b + ok_c
            if cnt > 1:
                want = np.median(np.stack([a, b, c]), axis=0).astype(int)
            elif cnt == 1:
                want = a if ok_a else b if ok_b else c
            else:
                want = np.zeros(2, np.int64)
            np.testing.assert_array_equal(mvp, want, err_msg=f"{mbx},{mby}")
            grid.set_mb(mbx, mby, 0, [mvs[mby, mbx]])
