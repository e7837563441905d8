"""Device CAVLC stage vs the native C++ writer, byte-exact.

The device stage (entropy/cavlc_device.py) re-places the reference's
DSP-resident CAVLC writer (encoder/cavlc.c + bitstream-a.sa) on the TPU;
the C++ twin (entropy.cpp x264tpu_write_slice_p) is the oracle here, and
is itself held byte-exact to the Python golden writer elsewhere."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x264dsp_tpu.entropy import cavlc_device as CD
from x264dsp_tpu.entropy import native
from x264dsp_tpu.entropy.bitstream import BitWriter

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native entropy lib unavailable")

MB_W, MB_H = 6, 5
B = MB_W * MB_H


def _rand_syn(rng, density=0.4, partitions=True, n_ref=1, skip_frac=0.3,
              level_scale=3):
    part = (rng.integers(0, 4, (MB_H, MB_W))
            if partitions else np.zeros((MB_H, MB_W), np.int64))
    ref = rng.integers(0, n_ref, (MB_H, MB_W))
    # quadrant MVs consistent with each MB's partition shape
    mv8 = rng.integers(-40, 40, (MB_H, MB_W, 2, 2, 2)).astype(np.int16)
    for y in range(MB_H):
        for x in range(MB_W):
            p = part[y, x]
            if p == 0:
                mv8[y, x, :, :] = mv8[y, x, 0, 0]
            elif p == 1:
                mv8[y, x, 0, 1] = mv8[y, x, 0, 0]
                mv8[y, x, 1, 1] = mv8[y, x, 1, 0]
            elif p == 2:
                mv8[y, x, 1, 0] = mv8[y, x, 0, 0]
                mv8[y, x, 1, 1] = mv8[y, x, 0, 1]
    cl = rng.integers(0, 16, (MB_H, MB_W))
    cch = rng.integers(0, 3, (MB_H, MB_W))

    def levels(shape, n):
        lv = rng.integers(-level_scale, level_scale + 1, shape)
        mask = rng.random(shape) < density
        lv = (lv * mask).astype(np.int16)
        return lv

    luma = levels((MB_H, MB_W, 16, 16), 16)
    cdc = levels((MB_H, MB_W, 2, 4), 4)
    cac = levels((MB_H, MB_W, 2, 4, 16), 16)
    cac[..., 0] = 0
    # force some skip candidates: zero everything on a fraction of MBs
    skip = rng.random((MB_H, MB_W)) < skip_frac
    for a in (luma, cdc, cac):
        a[skip] = 0
    cl[skip] = 0
    cch[skip] = 0
    part[skip] = 0
    ref[skip] = 0
    # their MVs must equal the pskip predictor to actually skip; zero-mv
    # is the common case the writer detects (borders force 0 anyway)
    mv8[skip] = 0
    return dict(partition=part.astype(np.int16),
                ref=ref.astype(np.int16),
                cbp_luma=cl.astype(np.int16),
                cbp_chroma=cch.astype(np.int16),
                mv8=mv8,
                mv=mv8[:, :, 0, 0],
                luma_levels=luma,
                chroma_dc_levels=cdc,
                chroma_ac_levels=cac)


def _headers():
    hw = BitWriter()
    hw.write_ue(0)
    hw.write_ue(5)
    hw.write_ue(0)
    hw.write(4, 1)
    hw.write1(0)
    hw.write1(0)
    hw.write1(0)
    hw.write_se(0)
    hw.write_ue(0)
    hw.write_se(0)
    hw.write_se(0)
    data, nbits = hw.get_unaligned()
    return data, nbits


def _run_device(syn, qp_mb, qp, n_ref, header):
    data, nbits = header
    hv, hl = CD.header_elements(data, nbits)
    fn = jax.jit(lambda s, q, hv, hl: CD.cavlc_p_payload(
        s, q, qp, n_ref, MB_H, MB_W, hv, hl, cap_bytes=1 << 16))
    syn_j = {k: jnp.asarray(v) for k, v in syn.items()
             if k in ("partition", "ref", "cbp_luma", "cbp_chroma",
                      "mv8", "luma_levels", "chroma_dc_levels",
                      "chroma_ac_levels")}
    payload, bits, n_skip, ov = fn(syn_j, jnp.asarray(qp_mb), hv, hl)
    nbytes = (int(bits) + 7) // 8
    return np.asarray(payload)[:nbytes].tobytes(), int(n_skip), bool(ov)


def _run_native(syn, qp_mb, qp, n_ref, header):
    data, nbits = header
    res = native.write_slice_p((data, nbits), MB_W, MB_H, qp, syn,
                               qp_mb=qp_mb, n_ref=n_ref)
    payload, n_skip = res
    return payload, n_skip


@pytest.mark.parametrize("seed,density,parts,n_ref,scale", [
    (0, 0.3, False, 1, 3),
    (1, 0.5, True, 1, 3),
    (2, 0.15, True, 2, 2),
    (3, 0.7, True, 1, 40),      # large levels: suffix chain + escapes
    (4, 0.02, False, 1, 1),     # nearly-empty: skip runs / empty blocks
])
def test_device_matches_native(seed, density, parts, n_ref, scale):
    rng = np.random.default_rng(seed)
    syn = _rand_syn(rng, density=density, partitions=parts, n_ref=n_ref,
                    level_scale=scale)
    qp = 26
    qp_mb = rng.integers(22, 30, (MB_H, MB_W)).astype(np.int16)
    header = _headers()
    want, want_skip = _run_native(syn, qp_mb, qp, n_ref, header)
    got, got_skip, ov = _run_device(syn, qp_mb, qp, n_ref, header)
    assert not ov
    assert got_skip == want_skip
    assert got == want


def test_batched_payload_matches_per_stream():
    """cavlc_p_payload_batched packs S byte-aligned streams back to
    back; each must equal the native writer's payload."""
    header = _headers()
    hv, hl = CD.header_elements(*header)
    S = 3
    syns = [_rand_syn(np.random.default_rng(20 + s), density=0.35,
                      partitions=True) for s in range(S)]
    qp_mb = np.full((MB_H, MB_W), 26, np.int16)
    stacked = {k: jnp.asarray(np.stack([s[k].astype(np.int32)
                                        for s in syns]))
               for k in ("partition", "ref", "cbp_luma", "cbp_chroma",
                         "mv8", "luma_levels", "chroma_dc_levels",
                         "chroma_ac_levels")}
    qps = jnp.asarray(np.stack([qp_mb.astype(np.int32)] * S))
    payload, off, n_skip, ov = jax.jit(
        lambda s, q, hv, hl: CD.cavlc_p_payload_batched(
            s, q, 26, 1, MB_H, MB_W, hv, hl, cap_bytes=1 << 16)
    )(stacked, qps, jnp.asarray(hv), jnp.asarray(hl))
    payload = np.asarray(payload)
    off = np.asarray(off)
    assert not np.asarray(ov).any()
    for s in range(S):
        want, _ = _run_native(syns[s], qp_mb, 26, 1, header)
        got = payload[off[s]:off[s + 1]].tobytes()
        assert got == want, f"stream {s} differs"


def _rand_syn_i(rng, density=0.3, level_scale=3):
    mb_type = rng.integers(0, 2, (MB_H, MB_W)).astype(np.int16)  # 1=I4x4
    i4 = mb_type == 1
    i16_mode = rng.integers(0, 4, (MB_H, MB_W)).astype(np.int16)
    i4_modes = rng.integers(0, 9, (MB_H, MB_W, 16)).astype(np.int16)
    chroma_mode = rng.integers(0, 4, (MB_H, MB_W)).astype(np.int16)
    cbp_chroma = rng.integers(0, 3, (MB_H, MB_W)).astype(np.int16)
    cbp_luma = rng.integers(0, 16, (MB_H, MB_W)).astype(np.int16)
    # I_16x16 luma cbp is all-or-nothing
    cbp_luma[~i4] = np.where(rng.random((MB_H, MB_W)) < 0.5, 15, 0)[~i4]

    def levels(shape):
        lv = rng.integers(-level_scale, level_scale + 1, shape)
        return (lv * (rng.random(shape) < density)).astype(np.int16)

    luma = levels((MB_H, MB_W, 16, 16))
    luma[~i4, :, 0] = 0          # I16 AC blocks carry coefs 1..15 only
    dc = levels((MB_H, MB_W, 16))
    dc[i4] = 0
    nz_dc = (dc != 0).any(-1).astype(np.int16)
    cdc = levels((MB_H, MB_W, 2, 4))
    cac = levels((MB_H, MB_W, 2, 4, 16))
    cac[..., 0] = 0
    return dict(mb_type=mb_type, i16_mode=i16_mode, i4_modes=i4_modes,
                chroma_mode=chroma_mode, cbp_luma=cbp_luma,
                cbp_chroma=cbp_chroma, nz_luma_dc=nz_dc,
                luma_levels=luma, luma_dc_levels=dc,
                chroma_dc_levels=cdc, chroma_ac_levels=cac)


def _headers_i():
    hw = BitWriter()
    hw.write_ue(0)
    hw.write_ue(7)
    hw.write_ue(0)
    hw.write(4, 0)
    hw.write_ue(0)
    hw.write1(0)
    hw.write1(0)
    hw.write_se(0)
    hw.write_ue(0)
    hw.write_se(0)
    hw.write_se(0)
    return hw.get_unaligned()


@pytest.mark.parametrize("seed,density,scale", [
    (0, 0.3, 3), (1, 0.6, 25), (2, 0.05, 1),
])
def test_device_i_matches_native(seed, density, scale):
    rng = np.random.default_rng(seed)
    syn = _rand_syn_i(rng, density=density, level_scale=scale)
    qp_mb = rng.integers(22, 30, (MB_H, MB_W)).astype(np.int16)
    header = _headers_i()
    want = native.write_slice_i(header, MB_W, MB_H, 26, syn, qp_mb=qp_mb)
    hv, hl = CD.header_elements(*header)
    syn_j = {k: jnp.asarray(v.astype(np.int32)) for k, v in syn.items()}
    payload, bits, ov = jax.jit(
        lambda s, q, hv, hl: CD.cavlc_i_payload(
            s, q, 26, MB_H, MB_W, hv, hl, cap_bytes=1 << 16)
    )(syn_j, jnp.asarray(qp_mb.astype(np.int32)), jnp.asarray(hv),
      jnp.asarray(hl))
    assert not bool(ov)
    got = np.asarray(payload)[:(int(bits) + 7) // 8].tobytes()
    assert got == want


def test_all_skip_frame():
    syn = _rand_syn(np.random.default_rng(9), density=0.0, skip_frac=1.0,
                    partitions=False)
    for k in ("cbp_luma", "cbp_chroma", "partition", "ref"):
        syn[k][:] = 0
    syn["mv8"][:] = 0
    qp_mb = np.full((MB_H, MB_W), 26, np.int16)
    header = _headers()
    want, want_skip = _run_native(syn, qp_mb, 26, 1, header)
    got, got_skip, _ = _run_device(syn, qp_mb, 26, 1, header)
    assert (got_skip, got) == (want_skip, want)
    assert want_skip == B
