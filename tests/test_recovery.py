"""In-band recovery paths (SURVEY §5 "MUST be replicated"):

(a) CAVLC level-code overflow → re-encode flagged MBs at QP+1
    (cavlc.c:56-60, encoder.c:1560-1569)
(b) VBV/MinCR frame overshoot → re-encode at higher QP
    (ratecontrol.c:651-780, encoder.c:1580-1589, frame granularity)
(c) corrupt reference → forced IDR (encoder.c:825-826, 1808-1820)
"""

import sys
from pathlib import Path

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from h264_decode import Decoder  # noqa: E402


def _extreme_frame(w, h):
    """Black top MB row, white rest: I16 MBs in row 1 predict DC=0 from
    the black row, giving a constant 255 residual whose hadamard-
    accumulated luma DC levels (~3263 at QP 0) exceed the CAVLC escape
    range (level_code >= 1<<12, cavlc.c:44-59). Per-4x4 AC levels can
    never overflow at 8-bit with the flat CQM (max ~816)."""
    y = np.full((h, w), 255, np.uint8)
    y[:16] = 0
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    return y, u, v


def test_cavlc_overflow_reencode():
    W, H = 48, 48
    y, u, v = _extreme_frame(W, H)
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 0
    p.rc.f_ip_factor = 1.0     # keep I QP at 0 too
    p.analyse.intra = 0        # I16x16 only (the overflowing path)
    enc = xt.Encoder(p)
    nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
    stream = b"".join(n.payload for n in nals)
    # the overflow path must have bumped at least one MB above QP 0
    qpmb = enc._core._last_qp_mb
    assert qpmb.max() >= 1, "overflow path did not trigger"
    assert qpmb.min() == 0, "bump must be per-MB, not global"
    enc.close()
    # and the stream still decodes to exactly the encoder's recon
    dec = Decoder().decode(stream)
    np.testing.assert_array_equal(dec[0][0], po.y)
    np.testing.assert_array_equal(dec[0][1], po.u)
    np.testing.assert_array_equal(dec[0][2], po.v)


def test_overflow_detector_matches_writer():
    """The detection pre-pass must agree with the writer's own flag."""
    from x264dsp_tpu.entropy import cavlc
    from x264dsp_tpu.entropy.bitstream import BitWriter
    rng = np.random.default_rng(3)
    for _ in range(50):
        lv = np.zeros(16, np.int64)
        n = rng.integers(1, 8)
        pos = rng.choice(16, n, replace=False)
        lv[pos] = rng.integers(-4000, 4000, n)
        bw = BitWriter()
        _, ov = cavlc.write_block_residual(bw, lv, 0)
        bw2 = BitWriter()
        _, ov2 = cavlc.write_block_residual(bw2, lv, 0)
        assert ov == ov2


def test_vbv_frame_reencode():
    """A tiny VBV buffer must clamp the actual frame size via re-encode."""
    W, H, N = 64, 48, 4
    rng = np.random.default_rng(1)
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.b_cabac = 0
    p.rc.i_rc_method = P.RC_ABR
    p.rc.i_bitrate = 40           # kbit/s — very tight at 25 fps
    p.rc.i_vbv_max_bitrate = 40
    p.rc.i_vbv_buffer_size = 10   # kbit
    enc = xt.Encoder(p)
    for t in range(N):
        y = rng.integers(0, 256, (H, W)).astype(np.uint8)
        u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        buffer_before = enc._core.rc.buffer_fill_final
        nals, _ = enc.encode(xt.Picture.from_planes(y, u, v))
        bits = sum(len(n.payload) for n in nals
                   if n.i_type in (P.NAL_SLICE, P.NAL_SLICE_IDR)) * 8
        # the hard re-encode guarantee: never undershoot the buffer
        assert bits <= max(enc._core.rc.frame_size_maximum,
                           buffer_before) + 1e-6, (t, bits, buffer_before)
    enc.close()


def test_corrupt_ref_forces_idr():
    W, H = 64, 48
    rng = np.random.default_rng(2)
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 250
    enc = xt.Encoder(p)
    types = []
    for t in range(5):
        y = rng.integers(0, 256, (H, W)).astype(np.uint8)
        u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        if t == 3:
            enc.mark_reference_corrupt()
        _, po = enc.encode(xt.Picture.from_planes(y, u, v))
        types.append(po.i_frame_type)
    enc.close()
    assert types[0] == P.TYPE_IDR
    assert types[1] == P.TYPE_P and types[2] == P.TYPE_P
    assert types[3] == P.TYPE_IDR, types     # forced by corrupt reference
    assert types[4] == P.TYPE_P              # recovered


def test_corrupt_ref_partial_dpb_keeps_encoding():
    """Per-frame b_corrupt granularity (frame.h:188): with a 2-deep DPB
    and ONE corrupt entry, encoding continues as P off the clean
    reference (encoder.c:825-826) with an explicit
    ref_pic_list_modification, and the stream stays decodable."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from h264_decode import Decoder

    W, H = 64, 48
    rng = np.random.default_rng(3)
    p = xt.param_default()
    p.i_width, p.i_height = W, H
    p.rc.i_rc_method = P.RC_CQP
    p.rc.i_qp_constant = 26
    p.i_keyint_max = 250
    p.i_frame_reference = 2
    enc = xt.Encoder(p)
    types = []
    stream = b""
    recons = []
    for t in range(5):
        y = rng.integers(0, 256, (H, W)).astype(np.uint8)
        u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        if t == 3:
            # mark only the most recent reference (frame 2) corrupt;
            # frame 1 remains a valid reference
            enc.mark_reference_corrupt(frame_idx=2)
        nals, po = enc.encode(xt.Picture.from_planes(y, u, v))
        stream += b"".join(n.payload for n in nals)
        types.append(po.i_frame_type)
        recons.append(po.y)
    enc.close()
    # no IDR inserted: the clean older reference carries the stream
    assert types[3] == P.TYPE_P, types
    assert types[4] == P.TYPE_P, types
    # conformance: the reordered list must decode to our own recon
    dec = Decoder().decode(stream)
    assert len(dec) == 5
    for t, (fy, _, _) in enumerate(dec):
        np.testing.assert_array_equal(fy, recons[t], err_msg=f"frame {t}")
