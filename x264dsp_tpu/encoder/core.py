"""Encoder core: lifecycle + per-frame pipeline.

The TPU-native reshaping of encoder/encoder.c:
- x264_encoder_open (:462) → EncoderCore.__init__ (validate, SPS/PPS,
  derived state; the DSP dispatch tables become the jitted device kernels)
- x264_encoder_headers (:736) → headers()
- x264_encoder_encode (:1719) → encode(): frame-type decision, device
  frame kernel (whole-frame wavefront replaces the per-MB serial loop of
  x264_slice_write :1433), then the host entropy stage.
- x264_encoder_close (:2174) → close() with the stats summary block.
"""

from __future__ import annotations

import math

import numpy as np

from .. import params as P
from ..api import NAL, Picture
from ..entropy import cavlc
from ..entropy.bitstream import BitWriter, nal_unit
from ..ops.golden import BLOCK_IDX_X, BLOCK_IDX_Y
from ..ops.tables import CHROMA_QP_TABLE
from .sets import PPS, SPS
from . import intra_frame

# x264_mb_pred_mode4x4_fix (common/predict.h:60-68)
_FIX4 = np.array([-1, 0, 1, 2, 3, 4, 5, 6, 7, 8, 2, 2, 2], np.int32)
_FIX16 = np.array([0, 1, 2, 3, 2, 2, 2], np.int32)
_FIXC = np.array([0, 1, 2, 3, 0, 0, 0], np.int32)

# lambda table (encoder/analyse.c:98-110): lambda = pow(2, qp/6 - 2)
LAMBDA_TAB = np.array([
    1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 3, 3, 3, 4,
    4, 4, 5, 6, 6, 7, 8, 9,
    10, 11, 13, 14, 16, 18, 20, 23,
    25, 29, 32, 36, 40, 45, 51, 57,
    64, 72, 81, 91, 102, 114, 128, 144,
    161, 181, 203, 228, 256, 287, 323, 362,
    406, 456, 512, 575, 645, 724, 813, 912,
    1024, 1149, 1290, 1448, 1625, 1825, 2048, 2299,
    2048, 2299], np.int32)


def pad_mod16(plane: np.ndarray, mb: int) -> np.ndarray:
    """x264_frame_expand_border_mod16 (common/frame.c:423): replicate edge
    pixels to the MB-aligned size."""
    h, w = plane.shape
    H, W = ((h + mb - 1) // mb) * mb, ((w + mb - 1) // mb) * mb
    if (H, W) == (h, w):
        return plane
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


class Stats:
    def __init__(self):
        self.i_frame_count = {P.SLICE_TYPE_I: 0, P.SLICE_TYPE_P: 0}
        self.i_frame_size = {P.SLICE_TYPE_I: 0, P.SLICE_TYPE_P: 0}
        self.f_frame_qp = {P.SLICE_TYPE_I: 0.0, P.SLICE_TYPE_P: 0.0}
        self.i_mb_count = {}       # mb type histogram
        self.ssd = np.zeros(3, np.int64)
        self.pixels = np.zeros(3, np.int64)

    def summary(self) -> dict:
        out = {"frames": dict(self.i_frame_count),
               "bytes": dict(self.i_frame_size),
               "mb_types": dict(self.i_mb_count)}
        with np.errstate(divide="ignore"):
            psnr = [float(10 * np.log10(255.0 ** 2 * p / s)) if s else float("inf")
                    for s, p in zip(self.ssd, self.pixels)]
        out["psnr_yuv"] = psnr
        return out


class EncoderCore:
    def __init__(self, param: P.Param):
        self.param = P.validate_parameters(param)
        p = self.param
        self.sps = SPS.init(p, p.i_sps_id)
        self.pps = PPS.init(p, self.sps, p.i_sps_id)
        self.mb_w = self.sps.i_mb_width
        self.mb_h = self.sps.i_mb_height

        # rate control (CQP path; ratecontrol.c:427-433)
        rc = p.rc
        ip_offset = 6.0 * math.log2(rc.f_ip_factor)
        self.qp_constant = {
            P.SLICE_TYPE_P: rc.i_qp_constant,
            P.SLICE_TYPE_I: int(np.clip(rc.i_qp_constant - ip_offset + 0.5,
                                        0, P.QP_MAX)),
        }

        # mbcmp selection (encoder.c:412: satd unless subme <= 1)
        self.use_satd = p.analyse.i_subpel_refine > 1
        self.i4x4_enabled = bool(p.analyse.intra & P.ANALYSE_I4x4)

        self.i_frame = 0          # input frame counter
        self.frame_num = 0        # frame_num syntax element
        self.idr_pic_id = 0
        self.stats = Stats()
        self.last_recon = None    # (y, u, v) np arrays, unfiltered

    # ------------------------------------------------------------------
    def headers(self) -> list[NAL]:
        nals = []
        bw = BitWriter()
        self.sps.write(bw)
        nals.append(NAL(P.NAL_SPS, P.NAL_PRIORITY_HIGHEST,
                        nal_unit(P.NAL_SPS, P.NAL_PRIORITY_HIGHEST,
                                 bw.get_bytes())))
        bw = BitWriter()
        self.pps.write(bw)
        nals.append(NAL(P.NAL_PPS, P.NAL_PRIORITY_HIGHEST,
                        nal_unit(P.NAL_PPS, P.NAL_PRIORITY_HIGHEST,
                                 bw.get_bytes())))
        nals.append(self._sei_version())
        return nals

    def _sei_version(self) -> NAL:
        bw = BitWriter()
        payload = bytes(16) + (
            "x264dsp_tpu 0.1 - TPU-native H.264 encoder").encode() + b"\x00"
        # sei payload type 5 = user_data_unregistered (set.c:52-70)
        t, size = 5, len(payload)
        bw.write(8, t)
        n = size
        while n >= 255:
            bw.write(8, 255)
            n -= 255
        bw.write(8, n)
        for b in payload:
            bw.write(8, b)
        bw.rbsp_trailing()
        return NAL(P.NAL_SEI, P.NAL_PRIORITY_DISPOSABLE,
                   nal_unit(P.NAL_SEI, P.NAL_PRIORITY_DISPOSABLE,
                            bw.get_bytes()))

    # ------------------------------------------------------------------
    def encode(self, pic: Picture | None):
        if pic is None:
            return [], None  # no lookahead delay in the intra/CQP path yet
        p = self.param

        is_keyframe = (self.i_frame % p.i_keyint_max == 0
                       or pic.i_type in (P.TYPE_IDR, P.TYPE_I)
                       or pic.b_keyframe)
        # round-1: I slices only (P pipeline lands with the inter module);
        # all frames are coded as I, keyframes as IDR.
        is_idr = is_keyframe
        slice_type = P.SLICE_TYPE_I

        qp = self.qp_constant[slice_type]
        qp = int(np.clip(qp, p.rc.i_qp_min, p.rc.i_qp_max))
        # out-of-spec QPs (52-69) are an emergency-denoise mode in the
        # reference (analyse.c:338-346); clamp to the spec range for now
        qp = min(qp, P.QP_MAX_SPEC)
        qpc = int(CHROMA_QP_TABLE[np.clip(qp + p.analyse.i_chroma_qp_offset,
                                          0, 51)])
        lam = int(LAMBDA_TAB[qp])

        fy = pad_mod16(np.asarray(pic.y, np.uint8), 16)
        fu = pad_mod16(np.asarray(pic.u, np.uint8), 8)
        fv = pad_mod16(np.asarray(pic.v, np.uint8), 8)

        dev = intra_frame.encode_i_frame(
            fy, fu, fv, qp, qpc, lam,
            mb_w=self.mb_w, mb_h=self.mb_h,
            use_satd=self.use_satd, i4x4_enabled=self.i4x4_enabled)
        syn = {k: np.asarray(v) for k, v in dev.items()}

        nals = []
        if is_idr and p.b_repeat_headers:
            # SPS/PPS precede every keyframe (encoder.c:1916-1944)
            nals.extend(self.headers()[:2])
        if is_idr:
            self.frame_num = 0

        slice_payload = self._write_slice_cavlc(
            syn, slice_type, qp,
            idr_pic_id=self.idr_pic_id if is_idr else -1)
        nal_type = P.NAL_SLICE_IDR if is_idr else P.NAL_SLICE
        nals.append(NAL(nal_type, P.NAL_PRIORITY_HIGHEST,
                        nal_unit(nal_type, P.NAL_PRIORITY_HIGHEST,
                                 slice_payload)))

        if is_idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        self.frame_num = (self.frame_num + 1) % (
            1 << self.sps.i_log2_max_frame_num)
        self.i_frame += 1

        self.last_recon = (syn["recon_y"].astype(np.uint8),
                           syn["recon_u"].astype(np.uint8),
                           syn["recon_v"].astype(np.uint8))

        # stats (h->stat twin, encoder.c:2077-2156)
        st = self.stats
        st.i_frame_count[slice_type] += 1
        total = sum(len(n.payload) for n in nals)
        st.i_frame_size[slice_type] += total
        st.f_frame_qp[slice_type] += qp
        h, w = pic.y.shape
        for plane, (rec, src) in enumerate(
                zip(self.last_recon, (pic.y, pic.u, pic.v))):
            ph, pw = src.shape
            d = rec[:ph, :pw].astype(np.int64) - src.astype(np.int64)
            st.ssd[plane] += int((d * d).sum())
            st.pixels[plane] += ph * pw

        pic_out = Picture(y=self.last_recon[0], u=self.last_recon[1],
                          v=self.last_recon[2],
                          i_frame_qp=qp, i_frame_type=P.TYPE_IDR if is_idr
                          else P.TYPE_I, i_pts=pic.i_pts)
        return nals, pic_out

    # ------------------------------------------------------------------
    def _write_slice_cavlc(self, syn, slice_type, qp, idr_pic_id) -> bytes:
        """Slice header (x264_slice_header_write, encoder.c:1047-1196) +
        I-slice MB loop of x264_slice_write (:1503-1664), CAVLC."""
        p = self.param
        bw = BitWriter()
        # -- slice header --
        bw.write_ue(0)                       # first_mb_in_slice
        bw.write_ue(slice_type + 5)          # slice_type (+5 = "all slices")
        bw.write_ue(self.pps.i_id)
        bw.write(self.sps.i_log2_max_frame_num,
                 self.frame_num & ((1 << self.sps.i_log2_max_frame_num) - 1))
        if idr_pic_id >= 0:
            bw.write_ue(idr_pic_id)
        # poc_type == 2 → nothing
        if idr_pic_id >= 0:
            bw.write1(0)                     # no_output_of_prior_pics
            bw.write1(0)                     # long_term_reference_flag
        else:
            bw.write1(0)                     # adaptive_ref_pic_marking
        bw.write_se(qp - self.pps.i_pic_init_qp)   # slice_qp_delta
        # deblocking control (slice_header_init, encoder.c:1040-1046)
        deblock_thresh = qp + 2 * min(p.i_deblocking_filter_alphac0,
                                      p.i_deblocking_filter_beta)
        disable_deblock = 0 if (p.b_deblocking_filter
                                and deblock_thresh > 15) else 1
        bw.write_ue(disable_deblock)
        if disable_deblock != 1:
            bw.write_se(p.i_deblocking_filter_alphac0)
            bw.write_se(p.i_deblocking_filter_beta)

        # -- MB loop --
        mb_w, mb_h = self.mb_w, self.mb_h
        luma_cnt = np.zeros((mb_h * 4, mb_w * 4), np.int32)
        chroma_cnt = np.zeros((2, mb_h * 2, mb_w * 2), np.int32)
        last_qp = qp

        for mby in range(mb_h):
            for mbx in range(mb_w):
                last_qp = self._write_mb_i_cavlc(
                    bw, syn, mbx, mby, qp, last_qp, luma_cnt, chroma_cnt)

        bw.rbsp_trailing()
        return bw.get_bytes()

    def _nc(self, cnt: np.ndarray, by: int, bx: int) -> int:
        """nC context (x264_mb_predict_non_zero_code semantics): average of
        available left/top block coefficient counts."""
        na = cnt[by, bx - 1] if bx > 0 else -1
        nb = cnt[by - 1, bx] if by > 0 else -1
        if na >= 0 and nb >= 0:
            return (na + nb + 1) >> 1
        if na >= 0:
            return na
        if nb >= 0:
            return nb
        return 0

    def _write_mb_i_cavlc(self, bw, syn, mbx, mby, qp, last_qp,
                          luma_cnt, chroma_cnt) -> int:
        """x264_cavlc_mb_header_i + residuals (encoder/cavlc.c:206-365)."""
        is_i4 = syn["mb_type"][mby, mbx] == 1
        cbp_luma = int(syn["cbp_luma"][mby, mbx])
        cbp_chroma = int(syn["cbp_chroma"][mby, mbx])
        nz_dc = int(syn["nz_luma_dc"][mby, mbx])
        self.stats.i_mb_count["I_4x4" if is_i4 else "I_16x16"] = \
            self.stats.i_mb_count.get("I_4x4" if is_i4 else "I_16x16", 0) + 1

        if not is_i4:
            mode_fix = int(_FIX16[syn["i16_mode"][mby, mbx]])
            bw.write_ue(1 + mode_fix + cbp_chroma * 4
                        + (0 if cbp_luma == 0 else 12))
        else:
            bw.write_ue(0)
            modes = syn["i4_modes"][mby, mbx]
            for i in range(16):
                bx = mbx * 4 + int(BLOCK_IDX_X[i])
                by = mby * 4 + int(BLOCK_IDX_Y[i])
                i_pred = self._host_mpm(syn, by, bx)
                i_mode = int(_FIX4[modes[i] + 1])
                if i_pred == i_mode:
                    bw.write1(1)
                else:
                    bw.write(4, i_mode - (1 if i_mode > i_pred else 0))
        bw.write_ue(int(_FIXC[syn["chroma_mode"][mby, mbx]]))

        if is_i4:
            bw.write_ue(cavlc.CBP_TO_GOLOMB_INTRA[(cbp_chroma << 4) | cbp_luma])

        overflow = False
        if not is_i4:
            # qp_delta with the empty-I16 suppression (cavlc.c:156-181)
            if not (cbp_luma | cbp_chroma) and not nz_dc \
                    and not (int(syn["chroma_nz_dc"][mby, mbx, 0])
                             | int(syn["chroma_nz_dc"][mby, mbx, 1])):
                dqp = 0
                mb_qp = last_qp
            else:
                dqp = qp - last_qp
                mb_qp = qp
            bw.write_se(dqp)
            last_qp = mb_qp
            # luma DC (context from block 0 position)
            nc = self._nc(luma_cnt, mby * 4, mbx * 4)
            cavlc.write_block_residual(bw, syn["luma_dc_levels"][mby, mbx], nc)
            # luma AC
            if cbp_luma:
                for i in range(16):
                    bx = mbx * 4 + int(BLOCK_IDX_X[i])
                    by = mby * 4 + int(BLOCK_IDX_Y[i])
                    nc = self._nc(luma_cnt, by, bx)
                    total, ov = cavlc.write_block_residual(
                        bw, syn["luma_levels"][mby, mbx, i, 1:], nc)
                    overflow |= ov
                    luma_cnt[by, bx] = total
            else:
                luma_cnt[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
        else:
            if cbp_luma | cbp_chroma:
                bw.write_se(qp - last_qp)
                last_qp = qp
            for i in range(16):
                bx = mbx * 4 + int(BLOCK_IDX_X[i])
                by = mby * 4 + int(BLOCK_IDX_Y[i])
                if cbp_luma & (1 << (i >> 2)):
                    nc = self._nc(luma_cnt, by, bx)
                    total, ov = cavlc.write_block_residual(
                        bw, syn["luma_levels"][mby, mbx, i], nc)
                    overflow |= ov
                    luma_cnt[by, bx] = total
                else:
                    luma_cnt[by, bx] = 0

        if cbp_chroma:
            for ch in range(2):
                cavlc.write_block_residual(
                    bw, syn["chroma_dc_levels"][mby, mbx, ch], 0,
                    chroma_dc=True)
            if cbp_chroma == 2:
                for ch in range(2):
                    for i in range(4):
                        bx = mbx * 2 + (i & 1)
                        by = mby * 2 + (i >> 1)
                        nc = self._nc(chroma_cnt[ch], by, bx)
                        total, _ = cavlc.write_block_residual(
                            bw, syn["chroma_ac_levels"][mby, mbx, ch, i, 1:],
                            nc)
                        chroma_cnt[ch, by, bx] = total
            else:
                chroma_cnt[:, mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
        else:
            chroma_cnt[:, mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
        return last_qp

    def _host_mpm(self, syn, by, bx) -> int:
        """Most-probable 4x4 mode, identical to the device logic."""
        def eff(byy, bxx):
            if bxx < 0 or byy < 0:
                return -1
            mby, mbx = byy // 4, bxx // 4
            if syn["mb_type"][mby, mbx] != 1:
                return 2
            ly, lx = byy % 4, bxx % 4
            idx = int(np.flatnonzero((BLOCK_IDX_X == lx)
                                     & (BLOCK_IDX_Y == ly))[0])
            return int(_FIX4[syn["i4_modes"][mby, mbx, idx] + 1])

        m = min(eff(by, bx - 1), eff(by - 1, bx))
        return 2 if m < 0 else m

    # ------------------------------------------------------------------
    def close(self) -> dict:
        return self.stats.summary()
