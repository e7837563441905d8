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
