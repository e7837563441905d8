"""Kernel-layer tests: batched JAX ops vs golden scalar NumPy twins.

Mirrors the reference's dual-implementation oracle scheme (SURVEY §4.1):
golden.py plays the portable-C role, transforms/intra/pixel.py the
linear-assembly role.
"""

import numpy as np
import pytest

from x264dsp_tpu.ops import golden as G
from x264dsp_tpu.ops import intra as I
from x264dsp_tpu.ops import pixel as PX
from x264dsp_tpu.ops import transforms as T

rng = np.random.default_rng(1234)


def rand_pix(*shape):
    return rng.integers(0, 256, shape).astype(np.uint8)


def rand_res(*shape, lo=-255, hi=256):
    return rng.integers(lo, hi, shape).astype(np.int32)


class TestTransforms:
    def test_dct_matches_golden(self):
        p1, p2 = rand_pix(64, 4, 4), rand_pix(64, 4, 4)
        ours = np.asarray(T.sub_dct4x4(p1, p2))
        for i in range(64):
            np.testing.assert_array_equal(ours[i], G.sub4x4_dct(p1[i], p2[i]))

    def test_idct_matches_golden(self):
        pred = rand_pix(32, 4, 4)
        # realistic coeff range after dequant
        dct = rand_res(32, 4, 4, lo=-2000, hi=2000)
        ours = np.asarray(T.idct4x4_add(pred, dct))
        for i in range(32):
            np.testing.assert_array_equal(ours[i], G.add4x4_idct(pred[i], dct[i]))

    def test_dct_quant_roundtrip_lossless_qp0(self):
        """At QP 0 the transform chain must reconstruct tiny residuals well;
        and dct→idct without quant must be exact (scaled by 64 with rounding)."""
        p1, p2 = rand_pix(16, 4, 4), rand_pix(16, 4, 4)
        dct = np.asarray(T.sub_dct4x4(p1, p2))
        # full-precision inverse of the exact forward: C^-1 path via idct
        # on dequant(quant(qp=0)) — distortion at qp0 must be <= 1 per pixel
        q = np.asarray(T.quant4x4(dct, 0, True))
        dq = np.asarray(T.dequant4x4(q, 0))
        rec = np.asarray(T.idct4x4_add(p2, dq))
        assert np.max(np.abs(rec.astype(int) - p1.astype(int))) <= 1

    def test_hadamard_roundtrip(self):
        d = rand_res(8, 4, 4, lo=-512, hi=512)
        fwd = np.asarray(T.hadamard4x4(d, forward=True))
        for i in range(8):
            np.testing.assert_array_equal(fwd[i], G.dct4x4dc(d[i]))
        inv = np.asarray(T.hadamard4x4(fwd, forward=False))
        for i in range(8):
            np.testing.assert_array_equal(inv[i], G.idct4x4dc(fwd[i]))

    @pytest.mark.parametrize("qp", [0, 6, 11, 23, 26, 35, 51, 69])
    @pytest.mark.parametrize("intra", [True, False])
    def test_quant_dequant_match_golden(self, qp, intra):
        dct = rand_res(48, 4, 4, lo=-8000, hi=8000)
        q_j = np.asarray(T.quant4x4(dct, qp, intra))
        for i in range(48):
            q_g, _ = G.quant_4x4(dct[i], qp, intra)
            np.testing.assert_array_equal(q_j[i], q_g)
        dq_j = np.asarray(T.dequant4x4(q_j, qp))
        for i in range(48):
            np.testing.assert_array_equal(dq_j[i], G.dequant_4x4(q_j[i], qp))

    @pytest.mark.parametrize("qp", [0, 12, 24, 36, 40, 51])
    def test_dc_quant_dequant(self, qp):
        dc = rand_res(20, 16, lo=-15000, hi=15000)
        q_j = np.asarray(T.quant_dc(dc, qp, True))
        for i in range(20):
            q_g, _ = G.quant_dc(dc[i], qp, True)
            np.testing.assert_array_equal(q_j[i], q_g)
        dq_j = np.asarray(T.dequant_dc4x4(q_j.reshape(20, 4, 4), qp))
        for i in range(20):
            np.testing.assert_array_equal(
                dq_j[i], G.dequant_4x4_dc(q_j[i].reshape(4, 4), qp))

    def test_chroma_dc_chain(self):
        dc = rand_res(16, 4, lo=-10000, hi=10000)
        h_j = np.asarray(T.hadamard2x2(dc))
        for i in range(16):
            np.testing.assert_array_equal(h_j[i], G.dct2x2dc(dc[i]))
        for qp in (0, 17, 29, 38):
            inv_j = np.asarray(T.idct_dequant_2x2_dc(h_j, qp))
            for i in range(16):
                np.testing.assert_array_equal(inv_j[i],
                                              G.idct_dequant_2x2_dc(h_j[i], qp))

    def test_zigzag(self):
        blocks = rand_res(10, 4, 4)
        z = np.asarray(T.zigzag4x4(blocks))
        for i in range(10):
            np.testing.assert_array_equal(z[i], G.zigzag_scan_4x4(blocks[i]))
        # DC first, then (0,1), (1,0)
        assert z[0][0] == blocks[0][0, 0]
        assert z[0][1] == blocks[0][0, 1]
        assert z[0][2] == blocks[0][1, 0]

    def test_decimate_score(self):
        # sparse small levels — the regime decimation targets
        for _ in range(200):
            lv = np.zeros(16, np.int32)
            n = rng.integers(0, 6)
            pos = rng.choice(16, n, replace=False)
            lv[pos] = rng.choice([-2, -1, 1, 2], n)
            got = int(np.asarray(T.decimate_score(lv)))
            want = G.decimate_score(lv)
            assert got == want, (lv, got, want)
        # batched
        lv = np.zeros((4, 15), np.int32)
        lv[1, 0] = 1
        lv[2, 14] = -1
        lv[3, (2, 7)] = 1
        got = np.asarray(T.decimate_score(lv))
        want = [G.decimate_score(x) for x in lv]
        np.testing.assert_array_equal(got, want)

    def test_coeff_last(self):
        lv = np.zeros((3, 16), np.int32)
        lv[1, 5] = 3
        lv[2, 15] = -1
        np.testing.assert_array_equal(np.asarray(T.coeff_last(lv)), [-1, 5, 15])


class TestIntra:
    def test_predict_4x4_all_modes(self):
        for _ in range(20):
            left, top, tr = rand_pix(4), rand_pix(4), rand_pix(4)
            tl = rand_pix(1)[0]
            ours = np.asarray(I.predict_4x4_all(left[None], top[None],
                                                np.array([tl]), tr[None]))[0]
            for mode in range(12):
                want = G.predict_4x4(mode, left, top, tl, tr)
                np.testing.assert_array_equal(ours[mode], want,
                                              err_msg=f"4x4 mode {mode}")

    def test_predict_16x16_all_modes(self):
        for _ in range(10):
            left, top = rand_pix(16), rand_pix(16)
            tl = int(rand_pix(1)[0])
            ours = np.asarray(I.predict_16x16_all(left[None], top[None],
                                                  np.array([tl])))[0]
            for mode in range(7):
                want = G.predict_16x16(mode, left, top, tl)
                np.testing.assert_array_equal(ours[mode], want,
                                              err_msg=f"16x16 mode {mode}")

    def test_predict_8x8c_all_modes(self):
        for _ in range(10):
            left, top = rand_pix(8), rand_pix(8)
            tl = int(rand_pix(1)[0])
            ours = np.asarray(I.predict_8x8c_all(left[None], top[None],
                                                 np.array([tl])))[0]
            for mode in range(7):
                want = G.predict_8x8c(mode, left, top, tl)
                np.testing.assert_array_equal(ours[mode], want,
                                              err_msg=f"8x8c mode {mode}")


class TestPixel:
    def test_sad_ssd(self):
        a, b = rand_pix(5, 16, 16), rand_pix(5, 16, 16)
        np.testing.assert_array_equal(
            np.asarray(PX.sad(a, b)), [G.sad(a[i], b[i]) for i in range(5)])
        np.testing.assert_array_equal(
            np.asarray(PX.ssd(a, b)), [G.ssd(a[i], b[i]) for i in range(5)])

    @pytest.mark.parametrize("shape", [(16, 16), (16, 8), (8, 16), (8, 8), (4, 4)])
    def test_satd_matches_golden(self, shape):
        a, b = rand_pix(7, *shape), rand_pix(7, *shape)
        got = np.asarray(PX.satd(a, b))
        want = [G.satd(a[i], b[i]) for i in range(7)]
        np.testing.assert_array_equal(got, want)

    def test_var2(self):
        a, b = rand_pix(3, 8, 8), rand_pix(3, 8, 8)
        v, s = PX.var2_8x8(a, b)
        for i in range(3):
            vg, sg = G.var2_8x8(a[i], b[i])
            assert int(v[i]) == vg and int(s[i]) == sg


def test_ssim_wxh_matches_scalar_reference():
    """ssim_wxh vs a direct scalar transcription of pixel.c:565-658."""
    import numpy as np
    from x264dsp_tpu.ops.pixel import ssim_wxh

    rng = np.random.default_rng(11)
    h, w = 36, 52
    a = rng.integers(0, 256, (h, w)).astype(np.uint8)
    b = np.clip(a.astype(np.int32)
                + rng.integers(-12, 13, (h, w)), 0, 255).astype(np.uint8)

    def scalar(p1, p2):
        c1 = int(.01 * .01 * 255 * 255 * 64 + .5)
        c2 = int(.03 * .03 * 255 * 255 * 64 * 63 + .5)
        h4, w4 = h // 4, w // 4
        sums = np.zeros((h4, w4, 4), np.int64)
        for by in range(h4):
            for bx in range(w4):
                x = p1[by*4:by*4+4, bx*4:bx*4+4].astype(np.int64)
                y = p2[by*4:by*4+4, bx*4:bx*4+4].astype(np.int64)
                sums[by, bx] = [x.sum(), y.sum(),
                                (x*x).sum() + (y*y).sum(), (x*y).sum()]
        total = 0.0
        for by in range(h4 - 1):
            for bx in range(w4 - 1):
                s1, s2, ss, s12 = (sums[by, bx] + sums[by, bx+1]
                                   + sums[by+1, bx] + sums[by+1, bx+1])
                v = ss*64 - s1*s1 - s2*s2
                cv = s12*64 - s1*s2
                total += (float(2*s1*s2 + c1) * float(2*cv + c2)
                          / (float(s1*s1 + s2*s2 + c1) * float(v + c2)))
        return total, (h4-1)*(w4-1)

    got, cnt = ssim_wxh(a, b)
    want, wcnt = scalar(a, b)
    assert cnt == wcnt
    assert abs(float(got) - want) < 1e-3 * wcnt
    # identical planes → ssim 1.0 per window
    same, cnt2 = ssim_wxh(a, a)
    assert abs(float(same) / cnt2 - 1.0) < 1e-6
