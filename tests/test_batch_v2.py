"""BatchEncoder v2: per-stream CRF/ABR rate control (VERDICT r4 task 7).

The reference's only path runs RC in the same hot loop (encoder.c:1719 +
ratecontrol.c:518); v1 rejected everything but CQP. v2 runs one host
RateControl per stream with frame SATD from a batched lowres cost pass,
per-stream QP/slice headers, lockstep GOP.
"""

import numpy as np
import pytest

import x264dsp_tpu as xt
from x264dsp_tpu import params as P


def _clip(w, h, n, seed, energy):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for t in range(n):
        y = (110 + 60 * np.sin((xx + 2 * t) / 13.0) * np.cos(yy / 17.0)
             + rng.normal(0, energy, (h, w))).clip(0, 255).astype(np.uint8)
        u = (120 + 30 * np.sin((xx[::2, ::2] + t) / 23.0)).clip(
            0, 255).astype(np.uint8)
        v = (128 + 30 * np.cos((yy[::2, ::2] + t) / 29.0)).clip(
            0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _params(w, h, rc_method, keyint=8):
    p = xt.param_default()
    p.i_width, p.i_height = w, h
    p.b_cabac = 0
    p.rc.i_rc_method = rc_method
    p.i_keyint_max = keyint
    p.i_scenecut_threshold = 0   # lockstep GOP
    p.rc.i_lookahead = 0
    if rc_method == P.RC_CRF:
        p.rc.f_rf_constant = 30.0
    if rc_method == P.RC_ABR:
        p.rc.i_bitrate = 200
    return p


def test_batch_crf_matches_single_stream_encoder():
    """Drained every slot (in-order RC feedback), the per-stream batch
    path must produce byte-identical streams to the single-stream
    Encoder at the same settings."""
    w, h, n, S = 128, 96, 6, 2
    clips = [_clip(w, h, n, 3 + s, energy=2.0 + 4.0 * s)
             for s in range(S)]

    singles = []
    for s in range(S):
        enc = xt.Encoder(_params(w, h, P.RC_CRF))
        stream = b""
        for (y, u, v) in clips[s]:
            nals, _ = enc.encode(xt.Picture.from_planes(y, u, v))
            stream += b"".join(nn.payload for nn in nals)
        enc.close()
        singles.append(stream)

    be = xt.BatchEncoder(_params(w, h, P.RC_CRF), S)
    batched = [b""] * S
    for t in range(n):
        import jax.numpy as jnp
        fy = jnp.stack([jnp.asarray(clips[s][t][0]) for s in range(S)])
        fu = jnp.stack([jnp.asarray(clips[s][t][1]) for s in range(S)])
        fv = jnp.stack([jnp.asarray(clips[s][t][2]) for s in range(S)])
        be.encode_batch((fy, fu, fv))
        out = be.encode_batch(None)     # drain: in-order RC feedback
        for s, nl in enumerate(out):
            batched[s] += b"".join(nn.payload for nn in nl)
    be.close()

    for s in range(S):
        assert batched[s] == singles[s], (
            f"stream {s}: batch {len(batched[s])} B vs single "
            f"{len(singles[s])} B")


def test_batch_abr_adapts_rate():
    """ABR per-stream: the noisy stream must spend a higher QP (not more
    bits without bound) and both streams stay decodable."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "tools"))
    from h264_decode import Decoder
    w, h, n, S = 128, 96, 10, 2
    clips = [_clip(w, h, n, 7 + s, energy=1.0 + 6.0 * s)
             for s in range(S)]
    p = _params(w, h, P.RC_ABR)
    be = xt.BatchEncoder(p, S)
    streams = [b""] * S
    import jax.numpy as jnp
    for t in range(n):
        fy = jnp.stack([jnp.asarray(clips[s][t][0]) for s in range(S)])
        fu = jnp.stack([jnp.asarray(clips[s][t][1]) for s in range(S)])
        fv = jnp.stack([jnp.asarray(clips[s][t][2]) for s in range(S)])
        out = be.encode_batch((fy, fu, fv))
        if out is not None:
            for s, nl in enumerate(out):
                streams[s] += b"".join(nn.payload for nn in nl)
    out = be.encode_batch(None)
    for s, nl in enumerate(out):
        streams[s] += b"".join(nn.payload for nn in nl)
    be.close()
    for s in range(S):
        dec = Decoder().decode(streams[s])
        assert len(dec) == n
    # both streams aim at the same bitrate: byte totals within 2x of
    # each other even though content energy differs 7x
    a, b = len(streams[0]), len(streams[1])
    assert max(a, b) < 2.0 * min(a, b), (a, b)


def test_batch_cqp_path_unchanged():
    """v1 CQP shape still runs through the shared-header path."""
    w, h, S = 64, 48, 2
    p = _params(w, h, P.RC_CQP, keyint=4)
    p.rc.i_qp_constant = 30
    be = xt.BatchEncoder(p, S)
    clips = [_clip(w, h, 3, 11 + s, 2.0) for s in range(S)]
    import jax.numpy as jnp
    for t in range(3):
        fy = jnp.stack([jnp.asarray(clips[s][t][0]) for s in range(S)])
        fu = jnp.stack([jnp.asarray(clips[s][t][1]) for s in range(S)])
        fv = jnp.stack([jnp.asarray(clips[s][t][2]) for s in range(S)])
        be.encode_batch((fy, fu, fv))
    out = be.encode_batch(None)
    assert out is not None and len(out) == S
    be.close()
