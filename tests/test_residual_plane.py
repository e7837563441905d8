"""Plane-resident residual pipeline vs the tile formulation (which is
itself golden-tested against ops/golden.py)."""

import numpy as np
import jax.numpy as jnp

from x264dsp_tpu.ops import mcgather as MG
from x264dsp_tpu.ops import residual_plane as RP
from x264dsp_tpu.ops import transforms as T

MB_H, MB_W = 6, 9
H, W = MB_H * 16, MB_W * 16


def _tiles(plane, mbsize):
    mh, mw = plane.shape[0] // mbsize, plane.shape[1] // mbsize
    return plane.reshape(mh, mbsize, mw, mbsize).transpose(
        0, 2, 1, 3).reshape(mh * mw, mbsize, mbsize)


def test_luma_roundtrip_matches_tiles():
    rng = np.random.default_rng(3)
    fenc = jnp.asarray(rng.integers(0, 256, (H, W), np.int32))
    pred = jnp.asarray(rng.integers(0, 256, (H, W), np.int32))
    qp_mb = jnp.asarray(rng.integers(8, 45, (MB_H, MB_W), np.int32))
    B = MB_H * MB_W

    # tile path
    blk_f = MG.mb_to_blocks4(_tiles(fenc, 16))         # (B, 16, 4, 4)
    blk_p = MG.mb_to_blocks4(_tiles(pred, 16))
    dct_t = T.sub_dct4x4(blk_f, blk_p)
    qp_b = qp_mb.reshape(B, 1)
    q_t = T.quant4x4(dct_t, qp_b, False)
    lv_t = T.zigzag4x4(q_t)                            # (B, 16, 16)
    nnz_t = jnp.any(q_t.reshape(B, 16, 16) != 0, -1).astype(jnp.int32)
    sc_t = jnp.where(nnz_t > 0, T.decimate_score(lv_t), 0)
    dq_t = T.dequant4x4(q_t, qp_b)
    rec_t = jnp.where((nnz_t > 0)[..., None, None],
                      T.idct4x4_add(blk_p, dq_t), blk_p)
    rec_t_plane = RP.mb_to_blockgrid(
        MG.blocks4_to_mb(rec_t).reshape(MB_H, MB_W, 16, 16), MB_H, MB_W, 16)

    # plane path
    cm = RP.sub_dct_cm(fenc, pred)
    q_cm = RP.quant_cm(cm, qp_mb, False, 4)
    z_cm = RP.zigzag_order(q_cm)
    nnz_bg = RP.nnz_cm(z_cm)                           # (4mbh, 4mbw)
    sc_bg = jnp.where(nnz_bg > 0, RP.decimate_score_cm(z_cm), 0)
    dq_cm = RP.dequant_cm(q_cm, qp_mb, 4)
    dq_cm = RP.mask_cm(dq_cm, nnz_bg)
    rec_p = RP.idct_add_plane(pred, dq_cm)

    # compare levels in coding order
    lv_p = RP.luma_levels_coding(z_cm, MB_H, MB_W).reshape(B, 16, 16)
    # tile path block order is already coding order (mb_to_blocks4)
    assert np.array_equal(np.asarray(lv_p), np.asarray(lv_t))
    nnz_p = RP.luma_nnz_coding(nnz_bg, MB_H, MB_W).reshape(B, 16)
    assert np.array_equal(np.asarray(nnz_p), np.asarray(nnz_t))
    sc_p = RP.luma_nnz_coding(sc_bg, MB_H, MB_W).reshape(B, 16)
    assert np.array_equal(np.asarray(sc_p), np.asarray(sc_t))
    assert np.array_equal(np.asarray(rec_p), np.asarray(rec_t_plane))


def test_chroma_grouping():
    rng = np.random.default_rng(4)
    Hc, Wc = MB_H * 8, MB_W * 8
    fenc = jnp.asarray(rng.integers(0, 256, (Hc, Wc), np.int32))
    pred = jnp.asarray(rng.integers(0, 256, (Hc, Wc), np.int32))
    qp_mb = jnp.asarray(rng.integers(8, 40, (MB_H, MB_W), np.int32))
    cm = RP.sub_dct_cm(fenc, pred)
    q_cm = RP.quant_cm(cm, qp_mb, False, 2)
    z_cm = RP.zigzag_order(q_cm)
    lv = RP.chroma_levels_coding(z_cm, MB_H, MB_W)     # (mbh,mbw,4,16)

    # direct check of one MB / one quadrant
    for (my, mx, q) in ((2, 3, 0), (1, 7, 3), (5, 0, 2)):
        qy, qx = q >> 1, q & 1
        y0, x0 = my * 8 + qy * 4, mx * 8 + qx * 4
        blk_f = fenc[y0:y0 + 4, x0:x0 + 4]
        blk_p = pred[y0:y0 + 4, x0:x0 + 4]
        d = T.sub_dct4x4(blk_f, blk_p)
        qq = T.quant4x4(d, qp_mb[my, mx], False)
        z = T.zigzag4x4(qq)
        assert np.array_equal(np.asarray(lv[my, mx, q]), np.asarray(z))


def test_extreme_residuals_exact():
    """The hi/lo byte-split dots in sub_dct_cm / idct_add_plane must be
    exact at the range extremes (random pixel data never reaches them):
    max-magnitude residuals (+-255 checkerboard) through the lowest and
    highest QPs, where dequantized coefficients grow toward +-2^13."""
    rng = np.random.default_rng(7)
    for qp in (0, 51):
        # worst-case residual: alternating 0/255 against its inverse
        base = ((np.indices((H, W)).sum(axis=0) & 1) * 255).astype(np.int32)
        fenc = jnp.asarray(base)
        pred = jnp.asarray(255 - base)
        qp_mb = jnp.full((MB_H, MB_W), qp, jnp.int32)

        blk_f = MG.mb_to_blocks4(_tiles(np.asarray(fenc), 16))
        blk_p = MG.mb_to_blocks4(_tiles(np.asarray(pred), 16))
        dct_t = T.sub_dct4x4(blk_f, blk_p)
        q_t = T.quant4x4(dct_t, qp, False)
        dq_t = T.dequant4x4(q_t, qp)
        rec_t = T.idct4x4_add(blk_p, dq_t)
        rec_t_plane = RP.mb_to_blockgrid(
            MG.blocks4_to_mb(rec_t).reshape(MB_H, MB_W, 16, 16),
            MB_H, MB_W, 16)

        cm = RP.sub_dct_cm(fenc, pred)
        q_cm = RP.quant_cm(cm, qp_mb, False, 4)
        dq_cm = RP.dequant_cm(q_cm, qp_mb, 4)
        rec_p = RP.idct_add_plane(pred, dq_cm)
        assert np.array_equal(np.asarray(rec_p), np.asarray(rec_t_plane)), qp
