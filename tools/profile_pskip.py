"""Break down probe_pskip's 20 ms at 1080p into its sub-stages."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/x264tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

W, H = 1920, 1088
MB_W, MB_H = W // 16, H // 16
QP, QPC = 26, 26
NVAR = 4

from tputime import sync_time_ms, baseline


def timeit(name, fn, argsets, n=5):
    dt = sync_time_ms(fn, argsets, n=n)
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    from x264dsp_tpu.ops import mc as MC
    from x264dsp_tpu.ops import mcgather as MG
    from x264dsp_tpu.ops import residual_plane as RP
    from x264dsp_tpu.ops import transforms as T
    from x264dsp_tpu.encoder import inter_frame as IF

    rng = np.random.default_rng(0)
    B = MB_W * MB_H

    fys = [jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
           for _ in range(NVAR)]
    fus = [jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8))
           for _ in range(NVAR)]
    ry = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    ref4 = jax.jit(MC.make_ref_planes)(ry)
    refu = jax.jit(MC.pad_chroma)(fus[0])
    wins4 = jax.jit(lambda r: MG.luma_windows(r, MB_W, MB_H))(ref4)
    winsu = jax.jit(lambda r: MG.chroma_windows(r, MB_W, MB_H))(refu)
    jax.block_until_ready((wins4, winsu))
    mvx = jnp.zeros((B,), jnp.int32)
    mvy = jnp.zeros((B,), jnp.int32)
    print(f"roundtrip {baseline()*1e3:.1f} ms", file=sys.stderr)

    # 1. luma MC at pskip MV
    mcl = jax.jit(lambda w, x, y: MG.mc_luma_batched(w, x, y, 16, 16))
    timeit("mc_luma_batched 16x16", mcl,
           [(wins4, mvx + i, mvy) for i in range(NVAR)])

    pred_y = IF.untile_mb(mcl(wins4, mvx, mvy), MB_W, MB_H, 16)
    jax.block_until_ready(pred_y)

    # 2. luma dct+quant+zigzag+nnz+decimate chain
    def luma_chain(fy, pred):
        qp_g = jnp.full((MB_H, MB_W), QP)
        z_cm = RP.zigzag_order(RP.quant_cm(
            RP.sub_dct_cm(fy.astype(jnp.int32), pred), qp_g, False, 4,
            None, 1))
        nnz_bg = RP.nnz_cm(z_cm)
        sc_bg = jnp.where(nnz_bg > 0, RP.decimate_score_cm(z_cm), 0)
        return sc_bg.reshape(MB_H, 4, MB_W, 4).sum((1, 3))
    lc = jax.jit(luma_chain)
    timeit("luma dct/quant/decimate chain", lc,
           [(f, pred_y) for f in fys])

    # 3. chroma MC
    mcc = jax.jit(lambda w, x, y: MG.mc_chroma_batched(w, x, y, 8, 8))
    timeit("mc_chroma_batched 8x8", mcc,
           [(winsu, mvx + i, mvy) for i in range(NVAR)])
    predc = IF.untile_mb(mcc(winsu, mvx, mvy), MB_W, MB_H, 8)
    jax.block_until_ready(predc)

    # 4. chroma chain
    def chroma_chain(fc, pred):
        qpc_g = jnp.full((MB_H, MB_W), QPC)
        d = fc.astype(jnp.int32) - pred
        ssd = (d * d).reshape(MB_H, 8, MB_W, 8).sum((1, 3))
        cm = RP.sub_dct_cm(fc.astype(jnp.int32), pred)
        dc_bg = cm[0]
        q_dc = T.quant_dc(
            RP.blockgrid_to_mb(dc_bg, MB_H, MB_W, 2).reshape(
                MB_H, MB_W, 4), qpc_g, False, None, 3)
        dc_nz = jnp.any(q_dc != 0, axis=-1)
        cm_ac = [jnp.zeros_like(cm[0])] + cm[1:]
        zc = RP.zigzag_order(RP.quant_cm(cm_ac, qpc_g, False, 2, None, 3))
        ac_bg = RP.nnz_cm(zc)
        acs_bg = jnp.where(ac_bg > 0, RP.decimate_score_cm(zc[1:]), 0)
        return ssd, dc_nz, acs_bg.reshape(MB_H, 2, MB_W, 2).sum((1, 3))
    cc = jax.jit(chroma_chain)
    timeit("chroma chain (one channel)", cc,
           [(f, predc) for f in fus])

    # full probe for reference
    pp = jax.jit(lambda *a: IF.probe_pskip(*a, QP, QPC, MB_W, MB_H, 512))
    psk = jnp.zeros((MB_H, MB_W, 2), jnp.int32)
    timeit("probe_pskip full", pp,
           [(fys[i], fus[i], fus[i], wins4, winsu, winsu, psk)
            for i in range(NVAR)])


if __name__ == "__main__":
    main()
