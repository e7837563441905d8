"""Conformance decoder for the subset of H.264 this framework emits.

Used as the round-trip test oracle (SURVEY §4: "bitstream conformance by
construction + external decode" — no ffmpeg in this image, so we carry our
own decoder). Supports: Baseline/Main progressive 4:2:0 8-bit, I/P slices,
CAVLC, one slice per picture. Reconstruction must match the encoder's own
recon exactly (both unfiltered and, once in-loop deblocking lands, both
filtered).

Entropy parsing here is written independently of the encoder (a real
bit-reader and VLC decode), sharing only the standard tables and the
golden pixel ops.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from x264dsp_tpu.entropy.cavlc_tables import (COEFF0_TOKEN, COEFF_TOKEN,  # noqa: E402
                                              TOTAL_ZEROS, TOTAL_ZEROS_2x2_DC)
from x264dsp_tpu.entropy.cavlc import (_RUN_BEFORE, _CT_INDEX,  # noqa: E402
                                       CBP_TO_GOLOMB_INTRA)
from x264dsp_tpu.ops import golden as G  # noqa: E402
from x264dsp_tpu.ops.tables import CHROMA_QP_TABLE, ZIGZAG_4x4  # noqa: E402
from x264dsp_tpu.utils.annexb import split_nals, unescape_ebsp  # noqa: E402


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bit(self) -> int:
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def ue(self) -> int:
        zeros = 0
        while self.bit() == 0:
            zeros += 1
            assert zeros < 32
        return ((1 << zeros) | self.bits(zeros)) - 1

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def more_rbsp_data(self) -> bool:
        # true unless only the rbsp stop bit + alignment zeros remain
        total = len(self.data) * 8
        if self.pos >= total:
            return False
        # find last set bit in the stream
        last = total - 1
        while last >= 0:
            if (self.data[last >> 3] >> (7 - (last & 7))) & 1:
                break
            last -= 1
        return self.pos < last


def _build_vlc_decoder(table):
    """(bits, size) table → dict {(size, bits): index}."""
    return {(size, bits): i for i, (bits, size) in enumerate(table) if size}


class VLCDec:
    def __init__(self, entries):
        # entries: list of ((bits, size), value)
        self.by_len = {}
        for (bits, size), val in entries:
            self.by_len.setdefault(size, {})[bits] = val
        self.max_len = max(self.by_len) if self.by_len else 0

    def read(self, br: BitReader):
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.bit()
            lut = self.by_len.get(length)
            if lut is not None and code in lut:
                return lut[code]
        raise ValueError("invalid VLC code")


def _coeff_token_decoders():
    decs = []
    for table in range(5):
        entries = []
        if table < 4:
            src = COEFF_TOKEN[table]
            entries.append(((COEFF0_TOKEN[table][0], COEFF0_TOKEN[table][1]),
                            (0, 0)))
            for t in range(16):
                for tr in range(4):
                    bits, size = src[t][tr]
                    if size:
                        entries.append((((bits, size)), (t + 1, tr)))
        else:
            src = COEFF_TOKEN[4]
            entries.append(((COEFF0_TOKEN[4][0], COEFF0_TOKEN[4][1]), (0, 0)))
            for t in range(4):
                for tr in range(4):
                    bits, size = src[t][tr]
                    if size:
                        entries.append(((bits, size), (t + 1, tr)))
        decs.append(VLCDec([((b, s), v) for (b, s), v in entries]))
    return decs


_COEFF_TOKEN_DEC = _coeff_token_decoders()
_TZ_DEC = [VLCDec([((b, s), i) for i, (b, s) in enumerate(row) if s])
           for row in TOTAL_ZEROS]
_TZ2_DEC = [VLCDec([((b, s), i) for i, (b, s) in enumerate(row) if s])
            for row in TOTAL_ZEROS_2x2_DC]
_RB_DEC = [VLCDec([((b, s), i) for i, (b, s) in enumerate(row) if s])
           for row in _RUN_BEFORE]


def read_level(br: BitReader, suffix_len: int) -> int:
    prefix = 0
    while br.bit() == 0:
        prefix += 1
        assert prefix < 32
    if suffix_len == 0:
        if prefix < 14:
            code = prefix
        elif prefix == 14:
            code = 14 + br.bits(4)
        else:
            code = 30 + br.bits(12)
    else:
        if prefix < 15:
            code = (prefix << suffix_len) + br.bits(suffix_len)
        else:
            code = (15 << suffix_len) + br.bits(12)
    return (code // 2 + 1) if code % 2 == 0 else -((code + 1) // 2)


def read_block_residual(br: BitReader, nC: int, max_coeffs: int,
                        chroma_dc: bool = False) -> np.ndarray:
    """Returns zigzag-ordered levels array of length max_coeffs."""
    dec = _COEFF_TOKEN_DEC[4 if chroma_dc else _CT_INDEX[min(nC, 16)]]
    if not chroma_dc and nC >= 8:
        # FLC: 6 bits = (total-1)<<2 | trailing, except 000011 = total 0
        v = br.bits(6)
        if v == 3:
            total, trailing = 0, 0
        else:
            total, trailing = (v >> 2) + 1, v & 3
    else:
        total, trailing = dec.read(br)
    out = np.zeros(max_coeffs, np.int32)
    if total == 0:
        return out
    levels = []
    for _ in range(trailing):
        levels.append(-1 if br.bit() else 1)
    suffix_len = 1 if (total > 10 and trailing < 3) else 0
    for k in range(trailing, total):
        lv = read_level(br, suffix_len)
        if k == trailing and trailing < 3:
            lv += 1 if lv > 0 else -1
        if suffix_len == 0:
            suffix_len = 1
        if abs(lv) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
        levels.append(lv)
    if total < max_coeffs:
        if chroma_dc:
            total_zeros = _TZ2_DEC[total - 1].read(br)
        else:
            total_zeros = _TZ_DEC[total - 1].read(br)
    else:
        total_zeros = 0
    runs = []
    zeros_left = total_zeros
    for k in range(total - 1):
        if zeros_left > 0:
            run = _RB_DEC[min(zeros_left, 7) - 1].read(br)
        else:
            run = 0
        runs.append(run)
        zeros_left -= run
    runs.append(zeros_left)
    pos = total + total_zeros - 1
    for k in range(total):
        out[pos] = levels[k]
        pos -= 1 + (runs[k] if k < len(runs) else 0)
    return out


class SPSInfo:
    pass


def parse_sps(rbsp: bytes) -> SPSInfo:
    br = BitReader(rbsp)
    s = SPSInfo()
    s.profile = br.bits(8)
    br.bits(8)  # constraints + reserved
    s.level = br.bits(8)
    s.id = br.ue()
    if s.profile >= 100:
        s.chroma_format = br.ue()
        br.ue(), br.ue()
        br.bit()
        assert br.bit() == 0, "scaling matrices unsupported"
    s.log2_max_frame_num = br.ue() + 4
    s.poc_type = br.ue()
    if s.poc_type == 0:
        s.log2_max_poc_lsb = br.ue() + 4
    elif s.poc_type == 1:
        raise NotImplementedError
    s.num_ref_frames = br.ue()
    br.bit()
    s.mb_w = br.ue() + 1
    s.mb_h = br.ue() + 1
    s.frame_mbs_only = br.bit()
    assert s.frame_mbs_only == 1
    br.bit()  # direct8x8
    s.crop = (0, 0, 0, 0)
    if br.bit():
        s.crop = (br.ue() * 2, br.ue() * 2, br.ue() * 2, br.ue() * 2)
    return s


class PPSInfo:
    pass


def parse_pps(rbsp: bytes) -> PPSInfo:
    br = BitReader(rbsp)
    p = PPSInfo()
    p.id = br.ue()
    p.sps_id = br.ue()
    p.cabac = br.bit()
    assert p.cabac == 0, "CABAC decode not yet supported"
    p.pic_order_present = br.bit()
    assert br.ue() == 0  # slice groups
    p.num_ref_l0 = br.ue() + 1
    p.num_ref_l1 = br.ue() + 1
    p.weighted_pred = br.bit()
    p.weighted_bipred = br.bits(2)
    p.pic_init_qp = br.se() + 26
    br.se()
    p.chroma_qp_offset = br.se()
    p.deblock_control = br.bit()
    p.constrained_intra = br.bit()
    p.redundant = br.bit()
    return p


# mb geometry (block coding order)
BIX = G.BLOCK_IDX_X
BIY = G.BLOCK_IDX_Y


class Decoder:
    def __init__(self):
        self.sps = None
        self.pps = None
        self.frames = []
        self.recon = None  # (y, u, v) current planes

    def decode(self, stream: bytes):
        for nal in split_nals(stream):
            nal_type = nal[0] & 0x1F
            rbsp = unescape_ebsp(bytes(nal[1:]))
            if nal_type == 7:
                self.sps = parse_sps(rbsp)
            elif nal_type == 8:
                self.pps = parse_pps(rbsp)
            elif nal_type in (1, 5):
                self._decode_slice(rbsp, idr=(nal_type == 5))
            # SEI (6) and others ignored
        return self.frames

    # ------------------------------------------------------------------
    def _decode_slice(self, rbsp: bytes, idr: bool):
        sps, pps = self.sps, self.pps
        br = BitReader(rbsp)
        first_mb = br.ue()
        assert first_mb == 0, "one slice per frame only"
        slice_type = br.ue() % 5
        assert slice_type in (0, 2), "only I/P slices"
        pps_id = br.ue()
        frame_num = br.bits(sps.log2_max_frame_num)
        if idr:
            idr_pic_id = br.ue()
        if sps.poc_type == 0:
            br.bits(sps.log2_max_poc_lsb)
        if slice_type == 0:  # P
            if br.bit():     # num_ref_idx_override
                br.ue()
            if br.bit():     # ref_pic_list_reordering
                raise NotImplementedError
        if idr:
            br.bit(), br.bit()
        else:
            # nal_ref_idc != 0 for all our slices → dec_ref_pic_marking
            if br.bit():
                raise NotImplementedError("MMCO")
        qp = pps.pic_init_qp + br.se()
        if pps.deblock_control:
            disable_deblock = br.ue()
            if disable_deblock != 1:
                br.se(), br.se()

        H, W = sps.mb_h * 16, sps.mb_w * 16
        y = np.zeros((H, W), np.uint8)
        u = np.zeros((H // 2, W // 2), np.uint8)
        v = np.zeros((H // 2, W // 2), np.uint8)
        mb_w, mb_h = sps.mb_w, sps.mb_h

        luma_cnt = -np.ones((mb_h * 4, mb_w * 4), np.int32)
        chroma_cnt = -np.ones((2, mb_h * 2, mb_w * 2), np.int32)
        i4_modes = -np.ones((mb_h * 4, mb_w * 4), np.int32)  # fix()ed modes
        mb_is_i4 = np.zeros((mb_h, mb_w), bool)
        last_qp = qp

        for mby in range(mb_h):
            for mbx in range(mb_w):
                last_qp = self._decode_mb_i(
                    br, slice_type, mbx, mby, y, u, v, last_qp,
                    luma_cnt, chroma_cnt, i4_modes, mb_is_i4)
        self.recon = (y, u, v)
        cl, cr, ct, cb = sps.crop
        self.frames.append((y[ct:H - cb, cl:W - cr],
                            u[ct // 2:(H - cb) // 2, cl // 2:(W - cr) // 2],
                            v[ct // 2:(H - cb) // 2, cl // 2:(W - cr) // 2]))

    # ------------------------------------------------------------------
    def _nc(self, cnt, by, bx):
        na = cnt[by, bx - 1] if bx > 0 else -1
        nb = cnt[by - 1, bx] if by > 0 else -1
        if na >= 0 and nb >= 0:
            return (na + nb + 1) >> 1
        if na >= 0:
            return na
        if nb >= 0:
            return nb
        return 0

    def _decode_mb_i(self, br, slice_type, mbx, mby, y, u, v, last_qp,
                     luma_cnt, chroma_cnt, i4_modes, mb_is_i4):
        pps = self.pps
        mb_type = br.ue()
        assert slice_type == 2, "P decode comes with the inter milestone"
        return self._decode_intra_mb(br, mb_type, mbx, mby, y, u, v, last_qp,
                                     luma_cnt, chroma_cnt, i4_modes, mb_is_i4)

    def _decode_intra_mb(self, br, mb_type, mbx, mby, y, u, v, last_qp,
                         luma_cnt, chroma_cnt, i4_modes, mb_is_i4):
        pps = self.pps
        sps = self.sps
        mb_w, mb_h = sps.mb_w, sps.mb_h
        avail_l, avail_t = mbx > 0, mby > 0
        avail_tl = avail_l and avail_t

        if mb_type == 0:
            is_i4 = True
            mb_is_i4[mby, mbx] = True
            modes = np.zeros(16, np.int32)
            for i in range(16):
                bx, by = mbx * 4 + int(BIX[i]), mby * 4 + int(BIY[i])
                ma = i4_modes[by, bx - 1] if bx > 0 else -1
                mb_ = i4_modes[by - 1, bx] if by > 0 else -1
                pred = min(ma, mb_)
                pred = 2 if pred < 0 else pred
                if br.bit():
                    mode = pred
                else:
                    rem = br.bits(3)
                    mode = rem + (1 if rem >= pred else 0)
                modes[i] = mode
                i4_modes[by, bx] = mode
            chroma_mode = br.ue()
            cbp_code = br.ue()
            cbp = CBP_TO_GOLOMB_INTRA.index(cbp_code)
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
            i16_mode = None
        else:
            is_i4 = False
            t = mb_type - 1
            assert t < 24, "I_PCM unsupported"
            i16_mode = t % 4
            cbp_chroma = (t // 4) % 3
            cbp_luma = 15 if t >= 12 else 0
            chroma_mode = br.ue()
            # neighbors' 4x4 mode context: non-I4x4 intra MB counts as DC
            i4_modes[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 2

        qp = last_qp
        luma_dc = np.zeros(16, np.int32)
        has_residual = bool(cbp_luma or cbp_chroma)
        if not is_i4:
            # I16: qp_delta always present
            dqp = br.se()
            qp = last_qp + dqp
            nc = self._nc(luma_cnt, mby * 4, mbx * 4)
            luma_dc = read_block_residual(br, nc, 16)
        elif has_residual:
            dqp = br.se()
            qp = last_qp + dqp

        luma_levels = np.zeros((16, 16), np.int32)
        for i in range(16):
            bx, by = mbx * 4 + int(BIX[i]), mby * 4 + int(BIY[i])
            coded = (cbp_luma >> (i >> 2)) & 1
            if not coded:
                luma_cnt[by, bx] = 0
                continue
            nc = self._nc(luma_cnt, by, bx)
            if is_i4:
                lv = read_block_residual(br, nc, 16)
                luma_levels[i] = lv
                luma_cnt[by, bx] = int(np.count_nonzero(lv))
            else:
                lv = read_block_residual(br, nc, 15)
                luma_levels[i, 1:] = lv
                luma_cnt[by, bx] = int(np.count_nonzero(lv))

        chroma_dc = np.zeros((2, 4), np.int32)
        chroma_ac = np.zeros((2, 4, 16), np.int32)
        if cbp_chroma:
            for ch in range(2):
                chroma_dc[ch] = read_block_residual(br, 0, 4, chroma_dc=True)
            if cbp_chroma == 2:
                for ch in range(2):
                    for i in range(4):
                        bx = mbx * 2 + (i & 1)
                        by = mby * 2 + (i >> 1)
                        nc = self._nc(chroma_cnt[ch], by, bx)
                        lv = read_block_residual(br, nc, 15)
                        chroma_ac[ch, i, 1:] = lv
                        chroma_cnt[ch, by, bx] = int(np.count_nonzero(lv))
            else:
                chroma_cnt[:, mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
        else:
            chroma_cnt[:, mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0

        # ------------- reconstruction -------------
        x0, y0 = mbx * 16, mby * 16
        if is_i4:
            self._recon_i4(y, x0, y0, modes, luma_levels, qp,
                           avail_l, avail_t, mbx, mby)
        else:
            self._recon_i16(y, x0, y0, i16_mode, luma_dc, luma_levels,
                            cbp_luma, qp, avail_l, avail_t, avail_tl)
        qpc = int(CHROMA_QP_TABLE[np.clip(qp + pps.chroma_qp_offset, 0, 51)])
        for ch, plane in ((0, u), (1, v)):
            self._recon_chroma(plane, mbx * 8, mby * 8, chroma_mode,
                               chroma_dc[ch], chroma_ac[ch], cbp_chroma, qpc,
                               avail_l, avail_t, avail_tl)
        return qp

    # -- intra reconstruction helpers (golden ops) --
    def _neigh(self, plane, x0, y0, n, avail_l, avail_t):
        H, W = plane.shape
        left = plane[y0:y0 + n, x0 - 1].astype(np.int32) if avail_l \
            else np.zeros(n, np.int32)
        top = plane[y0 - 1, x0:x0 + n].astype(np.int32) if avail_t \
            else np.zeros(n, np.int32)
        tl = int(plane[y0 - 1, x0 - 1]) if (avail_l and avail_t) else 0
        return left, top, tl

    def _recon_i16(self, y, x0, y0, mode, dc_levels, ac_levels, cbp_luma, qp,
                   avail_l, avail_t, avail_tl):
        left, top, tl = self._neigh(y, x0, y0, 16, avail_l, avail_t)
        # map coded mode 0..3 to the physical predictor given availability
        phys = self._i16_phys_mode(mode, avail_l, avail_t)
        pred = G.predict_16x16(phys, left, top, tl)
        # DC transform chain
        dcq = np.zeros(16, np.int32)
        dcq[ZIGZAG_4x4] = dc_levels
        dct_dc = G.idct4x4dc(dcq.reshape(4, 4))
        dct_dc = G.dequant_4x4_dc(dct_dc, qp)
        out = np.zeros((16, 16), np.int32)
        for i in range(16):
            bx, by = int(BIX[i]) * 4, int(BIY[i]) * 4
            blk = np.zeros(16, np.int32)
            blk[ZIGZAG_4x4] = ac_levels[i]
            q = blk.reshape(4, 4)
            dq = G.dequant_4x4(q, qp)
            dq[0, 0] = dct_dc[int(BIY[i]), int(BIX[i])]
            if cbp_luma:
                out[by:by + 4, bx:bx + 4] = G.add4x4_idct(
                    pred[by:by + 4, bx:bx + 4].astype(np.uint8), dq)
            else:
                dc = (dq[0, 0] + 32) >> 6
                out[by:by + 4, bx:bx + 4] = np.clip(
                    pred[by:by + 4, bx:bx + 4] + dc, 0, 255)
        y[y0:y0 + 16, x0:x0 + 16] = out.astype(np.uint8)

    @staticmethod
    def _i16_phys_mode(mode, avail_l, avail_t):
        if mode != 2:
            return mode
        if avail_l and avail_t:
            return 2
        if avail_l:
            return 4
        if avail_t:
            return 5
        return 6

    @staticmethod
    def _chroma_phys_mode(mode, avail_l, avail_t):
        if mode != 0:
            return mode
        if avail_l and avail_t:
            return 0
        if avail_l:
            return 4
        if avail_t:
            return 5
        return 6

    @staticmethod
    def _i4_phys_mode(mode, b_l, b_t):
        if mode == 2:
            if b_l and b_t:
                return 2
            if b_l:
                return 9
            if b_t:
                return 10
            return 11
        return mode

    def _recon_i4(self, y, x0, y0, modes, levels, qp, avail_l, avail_t,
                  mbx, mby):
        for i in range(16):
            bx, by = int(BIX[i]) * 4, int(BIY[i]) * 4
            gx, gy = x0 + bx, y0 + by
            b_l = avail_l if bx == 0 else True
            b_t = avail_t if by == 0 else True
            left, top, tl = self._neigh(y, gx, gy, 4, b_l, b_t)
            b_tr = self._tr_avail(bx // 4, by // 4, avail_t,
                                  mbx < (y.shape[1] // 16) - 1)
            if b_tr:
                tr = y[gy - 1, gx + 4:gx + 8].astype(np.int32)
            elif b_t:
                tr = np.full(4, int(y[gy - 1, gx + 3]), np.int32)
            else:
                tr = np.zeros(4, np.int32)
            mode = self._i4_phys_mode(int(modes[i]), b_l, b_t)
            pred = G.predict_4x4(mode, left, top, tl, tr)
            blk = np.zeros(16, np.int32)
            blk[ZIGZAG_4x4] = levels[i]
            if np.any(blk):
                dq = G.dequant_4x4(blk.reshape(4, 4), qp)
                rec = G.add4x4_idct(pred.astype(np.uint8), dq)
            else:
                rec = pred.astype(np.uint8)
            y[gy:gy + 4, gx:gx + 4] = rec

    @staticmethod
    def _tr_avail(bxi, byi, mb_top_avail, mb_topright_exists):
        if byi == 0:
            if bxi < 3:
                return mb_top_avail
            return mb_top_avail and mb_topright_exists
        if bxi == 3:
            return False
        # coded-order rule: block at (bxi+1, byi-1) decoded before current?
        idx_cur = int(np.flatnonzero((BIX == bxi) & (BIY == byi))[0])
        idx_tr = int(np.flatnonzero((BIX == bxi + 1) & (BIY == byi - 1))[0])
        return idx_tr < idx_cur

    def _recon_chroma(self, plane, x0, y0, mode, dc_levels, ac_levels,
                      cbp_chroma, qpc, avail_l, avail_t, avail_tl):
        left, top, tl = self._neigh(plane, x0, y0, 8, avail_l, avail_t)
        phys = self._chroma_phys_mode(mode, avail_l, avail_t)
        pred = G.predict_8x8c(phys, left, top, tl)
        out = pred.copy()
        # DC chain
        dc = np.zeros(4, np.int32)
        dc[G.ZIGZAG_2x2_DC] = dc_levels
        dq_dc = G.idct_dequant_2x2_dc(dc, qpc)
        for i in range(4):
            bx, by = (i & 1) * 4, (i >> 1) * 4
            blk = np.zeros(16, np.int32)
            blk[ZIGZAG_4x4] = ac_levels[i]
            q = blk.reshape(4, 4)
            if cbp_chroma == 2:
                dq = G.dequant_4x4(q, qpc)
                dq[0, 0] = dq_dc[i]
                out[by:by + 4, bx:bx + 4] = G.add4x4_idct(
                    pred[by:by + 4, bx:bx + 4].astype(np.uint8), dq)
            elif cbp_chroma == 1:
                d = (dq_dc[i] + 32) >> 6
                out[by:by + 4, bx:bx + 4] = np.clip(
                    pred[by:by + 4, bx:bx + 4] + d, 0, 255)
        plane[y0:y0 + 8, x0:x0 + 8] = out.astype(np.uint8)


def decode_file(path: str):
    dec = Decoder()
    return dec.decode(Path(path).read_bytes())


if __name__ == "__main__":
    frames = decode_file(sys.argv[1])
    print(f"decoded {len(frames)} frames "
          f"{frames[0][0].shape[1]}x{frames[0][0].shape[0]}")
    if len(sys.argv) > 2:
        with open(sys.argv[2], "wb") as f:
            for fy, fu, fv in frames:
                f.write(fy.tobytes())
                f.write(fu.tobytes())
                f.write(fv.tobytes())
