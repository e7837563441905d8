"""Bisect the NEW plane-resident encode_p_residual internals on TPU."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/x264tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tputime import sync_time_ms, baseline

W, H = 1920, 1088
MB_W, MB_H = W // 16, H // 16
B = MB_W * MB_H
QP, QPC = 26, 26
NVAR = 4


def timeit(name, fn, argsets, n=5):
    dt = sync_time_ms(jax.jit(fn), argsets, n=n)
    print(f"{name:46s} {dt:8.2f} ms")
    return dt


def main():
    from x264dsp_tpu.encoder import inter_frame as IF
    from x264dsp_tpu.encoder.intra_frame import _optimize_chroma_dc
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops import mcgather as MG
    from x264dsp_tpu.ops import residual_plane as RP
    from x264dsp_tpu.ops import transforms as T

    rng = np.random.default_rng(0)
    print(f"roundtrip {baseline()*1e3:.1f} ms", file=sys.stderr)

    fys = [jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
           for _ in range(NVAR)]
    fus = [jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.uint8))
           for _ in range(NVAR)]
    preds = [jnp.asarray(rng.integers(0, 256, (H, W), np.int32))
             for _ in range(NVAR)]
    predcs = [jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.int32))
              for _ in range(NVAR)]
    ry = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    ref4 = jax.jit(MC.make_ref_planes)(ry)
    refu = jax.jit(MC.pad_chroma)(fus[0])
    wins4 = jax.jit(lambda r: MG.luma_windows(r, MB_W, MB_H))(ref4)
    winsu = jax.jit(lambda u: MG.chroma_windows(u, MB_W, MB_H))(refu)
    mv8 = jnp.zeros((MB_H, MB_W, 2, 2, 2), jnp.int32)
    mv8f = mv8.reshape(B, 2, 2, 2)
    qp_mb = jnp.full((MB_H, MB_W), QP, jnp.int32)
    jax.block_until_ready((wins4, winsu))

    epr = jax.jit(lambda *a: IF.encode_p_residual(
        *a, QP, QPC, MB_W, MB_H, True))
    timeit("encode_p_residual (full, NEW)", epr,
           [(fys[i], fus[i], fus[i], wins4, winsu, winsu, mv8)
            for i in range(NVAR)])

    def mc_untile(fy, wins4):
        return IF.untile_mb(IF._mc_luma_mv8(wins4, mv8f), MB_W, MB_H, 16)
    timeit("  mc + untile (luma)", mc_untile,
           [(fys[i], wins4) for i in range(NVAR)])

    def dct_q(fy, pred):
        cm = RP.sub_dct_cm(fy.astype(jnp.int32), pred)
        q = RP.quant_cm(cm, qp_mb, False, 4)
        return [x.sum() for x in q]
    timeit("  sub_dct_cm + quant_cm", dct_q,
           [(fys[i], preds[i]) for i in range(NVAR)])

    def full_luma(fy, pred):
        cm = RP.sub_dct_cm(fy.astype(jnp.int32), pred)
        q_cm = RP.quant_cm(cm, qp_mb, False, 4)
        z_cm = RP.zigzag_order(q_cm)
        nnz_bg = RP.nnz_cm(z_cm)
        sc_bg = jnp.where(nnz_bg > 0, RP.decimate_score_cm(z_cm), 0)
        sc_mb = RP.luma_nnz_coding(sc_bg, MB_H, MB_W)
        gsum = IF._decimate_group(sc_mb.reshape(MB_H, MB_W, 4, 4))
        keep = (gsum >= 4) & (gsum.sum(-1) >= 6)[..., None]
        keep_bg = jnp.repeat(jnp.repeat(
            RP.mb_to_blockgrid(keep.reshape(MB_H, MB_W, 2, 2),
                               MB_H, MB_W, 2), 2, 0), 2, 1)
        nnz_bg = nnz_bg * keep_bg
        z_cm = RP.mask_cm(z_cm, keep_bg)
        dq = RP.mask_cm(RP.dequant_cm(q_cm, qp_mb, 4), nnz_bg)
        rec = RP.idct_add_plane(pred, dq)
        return rec, nnz_bg, [z.sum() for z in z_cm]
    timeit("  luma all but levels_coding", full_luma,
           [(fys[i], preds[i]) for i in range(NVAR)])

    def levels(fy, pred):
        cm = RP.sub_dct_cm(fy.astype(jnp.int32), pred)
        q_cm = RP.quant_cm(cm, qp_mb, False, 4)
        z_cm = RP.zigzag_order(q_cm)
        return RP.luma_levels_coding(z_cm, MB_H, MB_W)
    timeit("  dct+q+luma_levels_coding", levels,
           [(fys[i], preds[i]) for i in range(NVAR)])

    def chroma(fu, predc):
        return IF._encode_chroma_plane(fu, predc, qp_mb, True,
                                       jnp.zeros((MB_H, MB_W), bool),
                                       MB_H, MB_W)
    timeit("  chroma channel (plane)", chroma,
           [(fus[i], predcs[i]) for i in range(NVAR)])

    dcs = [jnp.asarray(rng.integers(-40, 40, (MB_H, MB_W, 4), np.int32))
           for _ in range(NVAR)]
    timeit("  _optimize_chroma_dc (batched direct)",
           lambda d: _optimize_chroma_dc(d, qp_mb),
           [(d,) for d in dcs])


if __name__ == "__main__":
    main()
