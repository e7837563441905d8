"""Lookahead frame queue (encoder/lookahead.c:59-115) and the VBV
lookahead planner (clip_qscale, ratecontrol.c:979-1038).

With rc_lookahead > 0 and VBV on, the encoder buffers i_delay input
frames before the first output ("waiting for filling of buffers",
encoder.c:1775-1781), decides slice types at put time, plans QP from
the queued frames' costs, and drains the queue on encode(None)
(x264.c:284-293, x264_lookahead_is_empty)."""

import sys
from pathlib import Path

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P
from x264dsp_tpu.api import Encoder, Picture
from x264dsp_tpu.encoder.ratecontrol import RateControl

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def _la_param(w, h, lookahead=2):
    p = xt.param_default()
    p.i_width, p.i_height = w, h
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_ABR
    p.rc.i_bitrate = 200
    p.rc.i_vbv_max_bitrate = 200
    p.rc.i_vbv_buffer_size = 100
    p.rc.i_lookahead = lookahead
    p.i_keyint_max = 50
    return p


def _clip(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200, (h, w), dtype=np.uint8)
    frames = []
    for t in range(n):
        y = np.roll(base, t * 2, axis=1)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y, u, v))
    return frames


def test_queue_delays_and_drains():
    """First i_delay encode() calls return no NALs; drain calls return
    the buffered frames; every input frame comes out exactly once and
    the stream decodes to the input frame count."""
    n, la = 6, 2
    enc = Encoder(_la_param(64, 64, lookahead=la))
    hdr = b"".join(x.payload for x in enc.headers())
    out = []
    delayed = 0
    for i, (y, u, v) in enumerate(_clip(64, 64, n)):
        nals, _ = enc.encode(Picture.from_planes(y, u, v, pts=i))
        if not nals:
            delayed += 1
            assert i < la, f"frame {i} delayed beyond i_delay={la}"
        else:
            out.append(b"".join(x.payload for x in nals))
    assert delayed == la
    drains = 0
    while True:
        nals, _ = enc.encode(None)
        if not nals:
            break
        out.append(b"".join(x.payload for x in nals))
        drains += 1
    assert drains == la
    assert len(out) == n
    enc.close()
    dec = Decoder().decode(hdr + b"".join(out))
    assert len(dec) == n


def test_lookahead_zero_unchanged():
    """rc_lookahead=0 (the fork default) must keep the synchronous
    one-in/one-out behavior."""
    enc = Encoder(_la_param(64, 64, lookahead=0))
    enc.headers()
    for i, (y, u, v) in enumerate(_clip(64, 64, 3)):
        nals, _ = enc.encode(Picture.from_planes(y, u, v, pts=i))
        assert nals, f"frame {i} unexpectedly delayed"
    nals, _ = enc.encode(None)
    assert not nals
    enc.close()


def test_planner_raises_q_before_expensive_frames():
    """Unit twin of clip_qscale's lookahead loop (ratecontrol.c:985-1038):
    with a tight buffer and expensive planned frames ahead, the planner
    must return a higher qscale than with an empty plan."""
    p = P.validate_parameters(_la_param(64, 96, lookahead=3))
    nmb = (64 // 16) * (96 // 16)

    def q_with(planned):
        rc = RateControl(p, nmb)
        rc.last_satd = 30000
        rc.buffer_fill = rc.buffer_size * 0.4
        rc.planned = planned
        return rc._clip_qscale(P.SLICE_TYPE_P, 5.0)

    q_empty = q_with([])
    q_heavy = q_with([(P.SLICE_TYPE_P, 500000),
                      (P.SLICE_TYPE_I, 900000),
                      (P.SLICE_TYPE_P, 500000)])
    assert q_heavy > q_empty, (q_heavy, q_empty)
