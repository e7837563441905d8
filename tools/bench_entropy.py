"""Host C++ entropy throughput at 1080p (no TPU needed).

Builds realistic P-frame syntax (coefficient density controlled by a
simulated QP via quantizing real DCTs of synthetic residuals) and times
entropy/native write_slice_p (CAVLC) and write_slice_cabac.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from x264dsp_tpu.entropy import native
from x264dsp_tpu.ops import golden as G

W, H = 1920, 1088
MB_W, MB_H = W // 16, H // 16
B = MB_W * MB_H


def build_syn(qp=26, seed=0, motion=True):
    rng = np.random.default_rng(seed)
    # synthetic residual with spatial correlation -> realistic levels
    res = rng.normal(0, 6, (B, 16, 4, 4))
    res[:, :, 1:, :] *= 0.5
    res[:, :, :, 1:] *= 0.7
    res = res.round().astype(np.int32)
    lv = np.zeros((B, 16, 16), np.int16)
    nnz = np.zeros((B, 16), np.int16)
    for c in range(16):  # vectorized over blocks per coeff position
        pass
    # quantize via golden per-block (vectorized-ish)
    mf = G.QUANT4_MF[qp].reshape(4, 4)
    bias = G.QUANT4_BIAS_INTER[qp].reshape(4, 4)
    q = np.sign(res) * (((np.abs(res) << 4) * mf + (bias << 16)) >> 20)
    q = q.astype(np.int32)
    for i in range(16):
        lv[:, i] = q[:, i].reshape(B, 16)[:, G.ZIGZAG_4x4].astype(np.int16)
    nnz = (np.abs(q).reshape(B, 16, 16).sum(-1) > 0).astype(np.int16)
    # ~60% of MBs skip (easy content)
    skip = rng.random(B) < 0.6
    lv[skip] = 0
    nnz[skip] = 0
    cbp_luma = ((nnz.reshape(B, 4, 4) > 0).any(-1)
                * (1 << np.arange(4))).sum(-1).astype(np.int16)
    mv = np.zeros((B, 2), np.int16)
    if motion:
        mv[:, 0] = rng.integers(-12, 13, B) * 4
        mv[:, 1] = rng.integers(-8, 9, B) * 4
        mv[skip] = 0
    syn = {
        "luma_levels": lv.reshape(MB_H, MB_W, 16, 16),
        "luma_nnz": nnz.reshape(MB_H, MB_W, 16),
        "cbp_luma": np.where(skip, 0, cbp_luma).reshape(MB_H, MB_W),
        "cbp_chroma": np.zeros((MB_H, MB_W), np.int16),
        "chroma_dc_levels": np.zeros((MB_H, MB_W, 2, 4), np.int16),
        "chroma_ac_levels": np.zeros((MB_H, MB_W, 2, 4, 16), np.int16),
        "chroma_nnz_ac": np.zeros((MB_H, MB_W, 2, 4), np.int16),
        "chroma_nz_dc": np.zeros((MB_H, MB_W, 2), np.int16),
        "mv": mv.reshape(MB_H, MB_W, 2),
        "partition": np.zeros((MB_H, MB_W), np.int16),
        "mv8": np.broadcast_to(mv.reshape(MB_H, MB_W, 1, 1, 2),
                               (MB_H, MB_W, 2, 2, 2)).copy(),
        "ref": np.zeros((MB_H, MB_W), np.int16),
    }
    nz_frac = float((nnz > 0).mean())
    print(f"syn: {100 * nz_frac:.1f}% blocks coded, "
          f"{100 * skip.mean():.1f}% skip", file=sys.stderr)
    return syn


def main():
    qp = 26
    syn = build_syn(qp)
    hdr_bits = (b"\x00", 0)  # one open byte, 0 bits used
    header = bytes([0x40])

    t0 = time.perf_counter()
    n = 8
    size = 0
    for i in range(n):
        res = native.write_slice_p(hdr_bits, MB_W, MB_H, qp, syn)
        assert res is not None
        size = len(res[0])
    cavlc_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"CAVLC P 1080p: {cavlc_ms:7.2f} ms/frame  ({size} B)")

    t0 = time.perf_counter()
    for i in range(n):
        res = native.write_slice_cabac(header, MB_W, MB_H, qp, 1, True, syn)
        assert res is not None
        size = len(res[0])
    cabac_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"CABAC P 1080p: {cabac_ms:7.2f} ms/frame  ({size} B)")

    # device front-half: host consumes pre-binarized residual op streams
    # (entropy/cabac_device.py); in deployment the op tensor rides the
    # fused frame dispatch, so only the consume loop is host work
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from x264dsp_tpu.entropy import cabac_device as CDV
    ops, off, ov = CDV.residual_ops_frame(
        jnp.asarray(syn["luma_levels"].astype(np.int32)),
        jnp.asarray(np.zeros((MB_H, MB_W, 16), np.int32)),
        jnp.asarray(syn["chroma_dc_levels"].astype(np.int32)),
        jnp.asarray(syn["chroma_ac_levels"].astype(np.int32)),
        jnp.asarray(np.zeros((MB_H, MB_W), np.int32)), MB_H, MB_W,
        1 << 22)
    assert not bool(ov)
    ops_np, off_np = np.asarray(ops), np.asarray(off)
    ref = native.write_slice_cabac(header, MB_W, MB_H, qp, 1, True, syn)
    got = native.write_slice_cabac(header, MB_W, MB_H, qp, 1, True, syn,
                                   res_ops=ops_np, res_off=off_np)
    assert got[0] == ref[0], "consume path not byte-identical"
    t0 = time.perf_counter()
    for i in range(n):
        res = native.write_slice_cabac(header, MB_W, MB_H, qp, 1, True,
                                       syn, res_ops=ops_np,
                                       res_off=off_np)
        size = len(res[0])
    consume_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"CABAC P 1080p (device front-half, host consume): "
          f"{consume_ms:7.2f} ms/frame  ({size} B, "
          f"{int(off_np[-1])} residual bins, "
          f"{cabac_ms / consume_ms:.2f}x)")


if __name__ == "__main__":
    main()
