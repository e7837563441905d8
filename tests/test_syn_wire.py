"""Block-granular syntax wire (inter_frame.pack_syn_blocks).

For host-writer P frames (CABAC, or CAVLC with the device entropy stage
off) the wire carries one 12-byte entry per coded 4x4 block under a
frame-level budget, replacing pack_syn_sparse's per-MB 6-block cap that
real content constantly blew. The unpack must reconstruct the full syn
dict exactly, and the API path with X264_SYN_WIRE=1 must produce
byte-identical streams to the full-pull path."""

import os

import numpy as np

import x264dsp_tpu as xt
from x264dsp_tpu import params as P

W, H = 128, 96


def _random_syn(rng, mb_h, mb_w, blocks_per_mb_hi=24):
    """Synthesize a consistent P-frame syn dict (same recipe as the
    pack_syn_sparse roundtrip test, but without the 6-block cap)."""
    import jax.numpy as jnp
    from x264dsp_tpu.encoder import inter_frame as IF

    out = {}
    coded = rng.random((mb_h, mb_w)) < 0.5
    blk_coded = np.zeros((mb_h, mb_w, 24), bool)
    for my in range(mb_h):
        for mx in range(mb_w):
            if coded[my, mx]:
                n = rng.integers(1, blocks_per_mb_hi + 1)
                picks = rng.choice(24, n, replace=False)
                blk_coded[my, mx, picks] = True
    for k, shape in IF.SYN_PACK_LAYOUT:
        full = (mb_h, mb_w) + shape
        if k == "luma_levels":
            a = rng.integers(-8, 8, full) * blk_coded[:, :, :16, None]
        elif k == "chroma_ac_levels":
            a = (rng.integers(-8, 8, full)
                 * blk_coded[:, :, 16:].reshape(mb_h, mb_w, 2, 4, 1))
        elif k == "chroma_dc_levels":
            a = rng.integers(-100, 101, full) * coded.reshape(
                (mb_h, mb_w) + (1,) * len(shape))
        elif k in ("mv", "mv8"):
            a = rng.integers(-76, 77, full)
        elif k == "cbp_luma":
            a = coded * 15
        elif k == "cbp_chroma":
            a = coded * rng.integers(0, 3, full)
        elif k == "luma_nnz":
            a = np.zeros(full)
        else:
            a = rng.integers(0, 4, full)
        out[k] = jnp.asarray(a.astype(np.int32))
    out["luma_nnz"] = jnp.asarray(np.count_nonzero(
        np.asarray(out["luma_levels"]), axis=-1))
    out["chroma_nnz_ac"] = jnp.asarray(np.count_nonzero(
        np.asarray(out["chroma_ac_levels"]), axis=-1))
    out["chroma_nz_dc"] = jnp.asarray(
        (np.asarray(out["chroma_dc_levels"]) != 0).any(-1).astype(np.int32))
    out["mv"] = out["mv8"][:, :, 0, 0]
    return out, blk_coded


def test_pack_syn_blocks_roundtrip():
    import jax.numpy as jnp
    from x264dsp_tpu.encoder import inter_frame as IF

    rng = np.random.default_rng(11)
    mb_h, mb_w = 4, 6
    # dense coding but under the frame budget (4 blocks/MB average):
    # a few MBs carry up to 24 coded blocks — beyond the old sparse cap
    out, blk_coded = _random_syn(rng, mb_h, mb_w, blocks_per_mb_hi=7)
    lv = np.asarray(out["luma_levels"]).copy()
    lv[0, 0, :, :4] = 1                       # 16 coded blocks in one MB
    out["luma_levels"] = jnp.asarray(lv)
    out["cbp_luma"] = out["cbp_luma"].at[0, 0].set(15)
    out["luma_nnz"] = jnp.asarray(np.count_nonzero(lv, axis=-1))

    dense, entries, count = IF.pack_syn_blocks(out, mb_w, mb_h)
    n_coded = int(np.count_nonzero(
        np.asarray(out["luma_levels"]).reshape(mb_h, mb_w, 16, 16)
        .any(-1)) + np.count_nonzero(
        np.asarray(out["chroma_ac_levels"]).reshape(mb_h, mb_w, 8, 16)
        .any(-1)))
    assert int(count) == n_coded
    assert np.asarray(dense)[0] == 0
    syn = IF.unpack_syn_blocks(np.asarray(dense), np.asarray(entries),
                               mb_w, mb_h)
    assert syn is not None
    for k, _ in IF.SYN_PACK_LAYOUT:
        np.testing.assert_array_equal(syn[k], np.asarray(out[k]), k)
    np.testing.assert_array_equal(syn["mv"], np.asarray(out["mv"]))
    np.testing.assert_array_equal(syn["chroma_nz_dc"],
                                  np.asarray(out["chroma_nz_dc"]))


def test_pack_syn_blocks_i_roundtrip():
    import jax.numpy as jnp
    from x264dsp_tpu.encoder import inter_frame as IF
    from x264dsp_tpu.encoder.intra_frame import SYN_I_LAYOUT

    rng = np.random.default_rng(21)
    mb_h, mb_w = 3, 5
    layout = dict(SYN_I_LAYOUT)
    # ~0.45*24 = 10.8 coded blocks/MB — dense intra content, under the
    # 12-blocks/MB frame budget
    blk_coded = rng.random((mb_h, mb_w, 24)) < 0.45
    out = {}
    for k, sz in IF._I_DENSE:
        shape = layout[k]
        full = (mb_h, mb_w) + shape
        if k in ("luma_dc_levels", "chroma_dc_levels"):
            out[k] = jnp.asarray(rng.integers(-100, 101, full)
                                 .astype(np.int32))
        elif k == "i4_modes":
            out[k] = jnp.asarray(rng.integers(0, 9, full).astype(np.int32))
        else:
            out[k] = jnp.asarray(rng.integers(0, 4, full).astype(np.int32))
    out["luma_levels"] = jnp.asarray(
        (rng.integers(-8, 8, (mb_h, mb_w, 16, 16))
         * blk_coded[:, :, :16, None]).astype(np.int32))
    out["chroma_ac_levels"] = jnp.asarray(
        (rng.integers(-8, 8, (mb_h, mb_w, 2, 4, 16))
         * blk_coded[:, :, 16:].reshape(mb_h, mb_w, 2, 4, 1))
        .astype(np.int32))

    dense, entries, count = IF.pack_syn_blocks_i(out, mb_w, mb_h)
    assert np.asarray(dense)[0] == 0
    syn = IF.unpack_syn_blocks_i(np.asarray(dense), np.asarray(entries),
                                 mb_w, mb_h)
    assert syn is not None
    for k, _ in IF._I_DENSE:
        np.testing.assert_array_equal(syn[k], np.asarray(out[k]), k)
    for k in ("luma_levels", "chroma_ac_levels"):
        np.testing.assert_array_equal(syn[k], np.asarray(out[k]), k)
    np.testing.assert_array_equal(
        syn["luma_nnz"],
        np.count_nonzero(np.asarray(out["luma_levels"]), axis=-1))
    # escape on a big DC level (dense field outside int8)
    out2 = dict(out)
    out2["luma_dc_levels"] = out["luma_dc_levels"].at[0, 0, 0].set(300)
    dense, entries, _ = IF.pack_syn_blocks_i(out2, mb_w, mb_h)
    assert np.asarray(dense)[0] == 1


def test_pack_syn_blocks_escapes():
    import jax.numpy as jnp
    from x264dsp_tpu.encoder import inter_frame as IF

    rng = np.random.default_rng(12)
    mb_h, mb_w = 3, 4
    out, _ = _random_syn(rng, mb_h, mb_w, blocks_per_mb_hi=4)
    # big level
    out2 = dict(out)
    out2["luma_levels"] = out["luma_levels"].at[0, 0, 0, 0].set(100)
    dense, entries, _ = IF.pack_syn_blocks(out2, mb_w, mb_h)
    assert np.asarray(dense)[0] == 1
    assert IF.unpack_syn_blocks(np.asarray(dense), np.asarray(entries),
                                mb_w, mb_h) is None
    # frame budget blown: every 4x4 block coded (24/MB > 4/MB budget)
    out3 = dict(out)
    lv = np.ones((mb_h, mb_w, 16, 16), np.int32)
    ca = np.ones((mb_h, mb_w, 2, 4, 16), np.int32)
    out3["luma_levels"] = jnp.asarray(lv)
    out3["chroma_ac_levels"] = jnp.asarray(ca)
    dense, entries, _ = IF.pack_syn_blocks(out3, mb_w, mb_h)
    assert np.asarray(dense)[0] == 1


def _clip(n=4):
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    out = []
    for t in range(n):
        y = np.clip(90 + 50 * np.sin((xx + 2 * t) / 9.0)
                    + 30 * np.cos(yy / 11.0)
                    + rng.normal(0, 3, (H, W)), 0, 255).astype(np.uint8)
        u = np.clip(120 + 30 * np.sin((xx[::2, ::2] + 2 * t) / 17.0),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 30 * np.cos((yy[::2, ::2] + t) / 13.0),
                    0, 255).astype(np.uint8)
        out.append((y, u, v))
    return out


def _encode(wire, frames, cabac=1):
    os.environ["X264_SYN_WIRE"] = "1" if wire else "0"
    try:
        p = xt.param_default()
        p.i_width, p.i_height = W, H
        p.b_cabac = cabac
        p.rc.i_rc_method = P.RC_CQP
        p.rc.i_qp_constant = 26
        p.i_keyint_max = 4
        p.i_frame_reference = 2
        p.analyse.inter = P.ANALYSE_PSUB16x16
        enc = xt.Encoder(p)
        blobs = []
        for (y, u, v) in frames:
            nals, _ = enc.encode(xt.Picture.from_planes(y, u, v))
            blobs.append(b"".join(n.payload for n in nals))
        return blobs
    finally:
        del os.environ["X264_SYN_WIRE"]


def test_decoded_qp_dev_matches_host():
    """The optimistic reference dispatch computes the decoded per-MB QP
    carry-scan on device; it must equal the host twin bit-for-bit."""
    import jax.numpy as jnp
    from x264dsp_tpu import params as P2
    from x264dsp_tpu.encoder.core import EncoderCore

    p = xt.param_default()
    p.i_width, p.i_height = 64, 48
    p.rc.i_rc_method = P2.RC_CQP
    core = EncoderCore(p)
    rng = np.random.default_rng(3)
    mb_h, mb_w = core.mb_h, core.mb_w
    for st in (P2.SLICE_TYPE_I, P2.SLICE_TYPE_P):
        syn = {
            "cbp_luma": rng.integers(0, 16, (mb_h, mb_w)),
            "cbp_chroma": rng.integers(0, 3, (mb_h, mb_w)),
            "mb_type": rng.integers(0, 2, (mb_h, mb_w)),
            "nz_luma_dc": rng.integers(0, 2, (mb_h, mb_w)),
            "chroma_nz_dc": rng.integers(0, 2, (mb_h, mb_w, 2)),
        }
        qp_mb = rng.integers(20, 32, (mb_h, mb_w)).astype(np.int32)
        host = core._decoded_qp(syn, st, qp_mb, 26)
        dev = np.asarray(core._decoded_qp_dev(
            {k: jnp.asarray(v) for k, v in syn.items()}, st, qp_mb, 26))
        np.testing.assert_array_equal(host, dev, f"slice_type {st}")


def test_syn_wire_api_path_cabac():
    frames = _clip()
    b0 = _encode(False, frames)
    b1 = _encode(True, frames)
    for i, (a, b) in enumerate(zip(b0, b1)):
        assert a == b, f"frame {i}: stream bytes differ over the wire"


def test_syn_wire_api_path_multislice():
    """Multi-slice frames take the per-band wire (band geometry packs)."""
    frames = _clip(3)
    os.environ["X264_SYN_WIRE"] = "0"
    try:
        p = xt.param_default()
        p.i_width, p.i_height = W, H
        p.rc.i_rc_method = P.RC_CQP
        p.rc.i_qp_constant = 26
        p.i_keyint_max = 3
        p.i_slice_count = 3

        def run():
            enc = xt.Encoder(p)
            return [b"".join(n.payload for n in
                             enc.encode(xt.Picture.from_planes(y, u, v))[0])
                    for (y, u, v) in frames]
        b0 = run()
        os.environ["X264_SYN_WIRE"] = "1"
        b1 = run()
        for i, (a, b) in enumerate(zip(b0, b1)):
            assert a == b, f"frame {i}: multi-slice wire bytes differ"
    finally:
        del os.environ["X264_SYN_WIRE"]


def test_syn_wire_api_path_cavlc_host():
    """CAVLC with the device entropy stage off (host writers) is the
    wire's other consumer."""
    os.environ["X264_DEVICE_ENTROPY"] = "0"
    try:
        frames = _clip(3)
        b0 = _encode(False, frames, cabac=0)
        b1 = _encode(True, frames, cabac=0)
        for i, (a, b) in enumerate(zip(b0, b1)):
            assert a == b, f"frame {i}: stream bytes differ over the wire"
    finally:
        del os.environ["X264_DEVICE_ENTROPY"]
