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

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from x264dsp_tpu.entropy.cavlc_tables import (COEFF0_TOKEN, COEFF_TOKEN,  # noqa: E402
                                              TOTAL_ZEROS, TOTAL_ZEROS_2x2_DC)
from x264dsp_tpu.entropy.cavlc import (_RUN_BEFORE, _CT_INDEX,  # noqa: E402
                                       CBP_TO_GOLOMB_INTRA,
                                       CBP_TO_GOLOMB_INTER)
from x264dsp_tpu.entropy.mvpred_host import PART_GEOM, MvGrid  # noqa: E402
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


class CabacDecoder:
    """Arithmetic decoding engine (H.264 9.3.3.2); mirrors the encoder in
    x264dsp_tpu/entropy/cabac.py."""

    def __init__(self, data: bytes, bitpos: int, slice_is_i: bool, qp: int):
        from x264dsp_tpu.entropy.cabac_tables import (CONTEXTS, RANGE_LPS,
                                                      TRANSITION)
        self._lps = RANGE_LPS
        self._trans = TRANSITION
        self.state = list(CONTEXTS[0 if slice_is_i else 1][
            int(np.clip(qp, 0, 51))])
        self.data = data
        self.pos = bitpos
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self._bit()

    def _bit(self) -> int:
        if self.pos >= len(self.data) * 8:
            return 0
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def decision(self, ctx: int) -> int:
        s = self.state[ctx]
        lps = self._lps[s >> 1][(self.range >> 6) - 4]
        self.range -= lps
        if self.offset >= self.range:
            self.offset -= self.range
            self.range = lps
            b = (s & 1) ^ 1
        else:
            b = s & 1
        self.state[ctx] = self._trans[s][b]
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return b

    def bypass(self) -> int:
        self.offset = (self.offset << 1) | self._bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def terminal(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return 0

    def ue_bypass(self, exp_bits: int) -> int:
        k = exp_bits
        val = 0
        while self.bypass():
            val += 1 << k
            k += 1
        suffix = 0
        for _ in range(k):
            suffix = (suffix << 1) | self.bypass()
        return val + suffix


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
    p.scaling_list = None            # 4 raster 16-lists (4IY/4PY/4IC/4PC)
    if br.more_rbsp_data():
        # high-profile trailer (encoder/set.c:491-524)
        assert br.bit() == 0, "8x8 transform unsupported"
        if br.bit():                 # pic_scaling_matrix_present
            jvt = (G.CQM_JVT4I, G.CQM_JVT4P)

            def read_list(fallback, default):
                """scaling_list() (spec 7.3.2.1.1.1): delta-decoded in
                zigzag order; absent -> fallback list, j==0 nextScale==0
                -> the default (JVT) list."""
                if not br.bit():     # scaling_list_present_flag
                    return list(fallback)
                last, nxt = 8, 8
                zz = [0] * 16
                use_default = False
                for j in range(16):
                    if nxt != 0:
                        nxt = (last + br.se() + 256) % 256
                        if j == 0 and nxt == 0:
                            use_default = True
                    zz[j] = last if nxt == 0 else nxt
                    last = zz[j]
                if use_default:
                    return list(default)
                ras = [0] * 16
                for j in range(16):
                    ras[int(ZIGZAG_4x4[j])] = zz[j]
                return ras

            l4iy = read_list(jvt[0], jvt[0])
            l4ic = read_list(l4iy, jvt[0])
            br.bit()                 # Cr = Cb flag
            l4py = read_list(jvt[1], jvt[1])
            l4pc = read_list(l4py, jvt[1])
            br.bit()                 # Cr = Cb flag
            p.scaling_list = (l4iy, l4py, l4ic, l4pc)
        p.second_chroma_qp_offset = br.se()
    return p


# mb geometry (block coding order)
BIX = G.BLOCK_IDX_X
BIY = G.BLOCK_IDX_Y


def _compute_bs(nnz4, mv4, ref4, intra_mb):
    """deblock_strength_c (common/deblock.c:297-323) + intra bs=3, numpy."""
    mb_h, mb_w = intra_mb.shape
    bs = np.zeros((mb_h, mb_w, 2, 4, 4), np.int32)

    def strength(cy, cx, ny, nx):
        if nnz4[cy, cx] or nnz4[ny, nx]:
            return 2
        if ref4[cy, cx] != ref4[ny, nx]:
            return 1
        if (abs(mv4[cy, cx, 0] - mv4[ny, nx, 0]) >= 4
                or abs(mv4[cy, cx, 1] - mv4[ny, nx, 1]) >= 4):
            return 1
        return 0

    for mby in range(mb_h):
        for mbx in range(mb_w):
            if intra_mb[mby, mbx]:
                bs[mby, mbx] = 3
                continue
            for edge in range(4):
                for i in range(4):
                    cy, cx = mby * 4 + i, mbx * 4 + edge
                    if cx > 0:
                        bs[mby, mbx, 0, edge, i] = strength(cy, cx, cy, cx - 1)
                    cy, cx = mby * 4 + edge, mbx * 4 + i
                    if cy > 0:
                        bs[mby, mbx, 1, edge, i] = strength(cy, cx, cy - 1, cx)
    return bs


class _FrameState:
    """Per-frame decode state shared by all its slices (multi-slice:
    each slice writes a band of rows)."""

    def __init__(self, mb_w, mb_h):
        H, W = mb_h * 16, mb_w * 16
        self.y = np.zeros((H, W), np.uint8)
        self.u = np.zeros((H // 2, W // 2), np.uint8)
        self.v = np.zeros((H // 2, W // 2), np.uint8)
        self.luma_cnt = -np.ones((mb_h * 4, mb_w * 4), np.int32)
        self.chroma_cnt = -np.ones((2, mb_h * 2, mb_w * 2), np.int32)
        self.i4_modes = -np.ones((mb_h * 4, mb_w * 4), np.int32)
        self.mb_is_i4 = np.zeros((mb_h, mb_w), bool)
        self.intra_mb = np.zeros((mb_h, mb_w), bool)
        self.cbp_all = np.zeros((mb_h, mb_w), np.int32)
        self.qp_grid = np.zeros((mb_h, mb_w), np.int32)
        self.mv4 = np.zeros((mb_h * 4, mb_w * 4, 2), np.int64)
        self.ref4 = np.zeros((mb_h * 4, mb_w * 4), np.int32)
        self.deblock = (1, 0, 0)
        self.idr = False


class Decoder:
    def __init__(self):
        self.sps = None
        self.pps = None
        self.dmf = (None,) * 4
        self.frames = []
        self.recon = None    # (y, u, v) current planes (pre-deblock)
        self.ref = None      # previous deblocked (y, u, v) + hpel planes
        self.ref_list = []   # DPB: (frame_num, y, u, v), nearest first
        self.active_list = []  # per-slice list after modification
        self._pending = []   # buffered slice NALs of the open frame

    def decode(self, stream: bytes):
        for nal in split_nals(stream):
            nal_type = nal[0] & 0x1F
            rbsp = unescape_ebsp(bytes(nal[1:]))
            if nal_type == 7:
                self.sps = parse_sps(rbsp)
            elif nal_type == 8:
                self.pps = parse_pps(rbsp)
                if self.pps.scaling_list is not None:
                    self.dmf = tuple(
                        np.array([[int(G.DEQUANT4_SCALE[rem][
                            (i & 1) + ((i >> 2) & 1)]) * int(lst[i])
                            for i in range(16)] for rem in range(6)],
                            np.int32)
                        for lst in self.pps.scaling_list)
                else:
                    self.dmf = (None,) * 4
            elif nal_type in (1, 5):
                first_mb = BitReader(rbsp).ue()
                if first_mb == 0 and self._pending:
                    self._decode_frame(self._pending)
                    self._pending = []
                self._pending.append((rbsp, nal_type == 5, first_mb))
            # SEI (6) and others ignored
        if self._pending:
            self._decode_frame(self._pending)
            self._pending = []
        return self.frames

    def _decode_frame(self, slices):
        """Decode one frame's slice NALs (row-aligned multi-slice,
        i_slice_count: each slice covers consecutive MB rows)."""
        sps = self.sps
        mb_w, mb_h = sps.mb_w, sps.mb_h
        H, W = mb_h * 16, mb_w * 16
        st = _FrameState(mb_w, mb_h)
        bounds = [s[2] // mb_w for s in slices] + [mb_h]
        for (rbsp, idr, first_mb), y0, y1 in zip(slices, bounds, bounds[1:]):
            assert first_mb == y0 * mb_w, "slices must be row-aligned"
            self._decode_slice(rbsp, idr, y0, y1, st)
        self._finish_frame(st)

    # ------------------------------------------------------------------
    def _decode_slice(self, rbsp: bytes, idr: bool, y0: int, y1: int,
                      st: "_FrameState"):
        sps, pps = self.sps, self.pps
        br = BitReader(rbsp)
        first_mb = br.ue()
        slice_type = br.ue() % 5
        assert slice_type in (0, 2), "only I/P slices"
        pps_id = br.ue()
        frame_num = br.bits(sps.log2_max_frame_num)
        if idr:
            idr_pic_id = br.ue()
        if sps.poc_type == 0:
            br.bits(sps.log2_max_poc_lsb)
        n_ref = pps.num_ref_l0
        self.active_list = list(self.ref_list)
        if slice_type == 0:  # P
            if br.bit():     # num_ref_idx_override
                n_ref = br.ue() + 1
            if br.bit():     # ref_pic_list_modification (spec 8.2.4.3.1)
                wrap = 1 << sps.log2_max_frame_num
                pred = frame_num
                modified, rest = [], list(self.active_list)
                while True:
                    idc = br.ue()
                    if idc == 3:
                        break
                    arg = br.ue()
                    if idc == 0:
                        pred = (pred - (arg + 1)) % wrap
                    elif idc == 1:
                        pred = (pred + (arg + 1)) % wrap
                    else:
                        raise NotImplementedError("long-term reorder")
                    e = next(x for x in rest if x[0] == pred)
                    modified.append(e)
                    rest.remove(e)
                self.active_list = modified + rest
        if idr:
            br.bit(), br.bit()
        else:
            # nal_ref_idc != 0 for all our slices → dec_ref_pic_marking
            if br.bit():
                raise NotImplementedError("MMCO")
        if pps.cabac and slice_type != 2:
            cabac_init_idc = br.ue()
            assert cabac_init_idc == 0, "only cabac_init_idc 0 supported"
        qp = pps.pic_init_qp + br.se()
        disable_deblock = 1
        a_off = b_off = 0
        if pps.deblock_control:
            disable_deblock = br.ue()
            if disable_deblock != 1:
                a_off, b_off = br.se(), br.se()

        mb_w = sps.mb_w
        mb_h = y1 - y0                 # band rows; first band row is the
        # slice start, so the loops' row-0 unavailability IS the slice
        # boundary rule — views put every write into the frame arrays
        y = st.y[y0 * 16:y1 * 16]
        u = st.u[y0 * 8:y1 * 8]
        v = st.v[y0 * 8:y1 * 8]
        luma_cnt = st.luma_cnt[y0 * 4:y1 * 4]
        chroma_cnt = st.chroma_cnt[:, y0 * 2:y1 * 2]
        i4_modes = st.i4_modes[y0 * 4:y1 * 4]
        mb_is_i4 = st.mb_is_i4[y0:y1]
        intra_mb = st.intra_mb[y0:y1]
        grid = MvGrid(mb_w, mb_h)      # fresh per slice (cross-slice MV
        cbp_all = st.cbp_all[y0:y1]    # prediction is unavailable)
        qp_grid = st.qp_grid[y0:y1]
        qp_grid[:] = qp
        last_qp = qp
        st.idr = idr
        st.frame_num = frame_num
        st.band_rows = (y0, y1)

        if self.pps.cabac:
            # cabac_alignment_one_bit
            while br.pos & 7:
                assert br.bit() == 1
            last_qp = self._decode_mbs_cabac(
                br, slice_type, qp, y, u, v, luma_cnt, chroma_cnt,
                i4_modes, grid, cbp_all, intra_mb, qp_grid, n_ref,
                band=(y0, y1))
        elif slice_type == 2:
            intra_mb[:] = True
            for mby in range(mb_h):
                for mbx in range(mb_w):
                    last_qp = self._decode_mb_i(
                        br, slice_type, mbx, mby, y, u, v, last_qp,
                        luma_cnt, chroma_cnt, i4_modes, mb_is_i4)
                    qp_grid[mby, mbx] = last_qp
        else:
            last_qp = self._decode_p_mbs(
                br, y, u, v, last_qp, luma_cnt, chroma_cnt, grid,
                cbp_all, intra_mb, i4_modes, qp_grid, n_ref,
                band=(y0, y1))

        # accumulate the band's MV/ref state for frame-level deblock
        st.mv4[y0 * 4:y1 * 4] = grid.mv4
        st.ref4[y0 * 4:y1 * 4] = grid.ref4
        st.deblock = (disable_deblock, a_off, b_off)

    def _finish_frame(self, st: "_FrameState"):
        """Deblock + append once every slice of the frame decoded.
        disable_deblocking_filter_idc 0 filters across slice boundaries
        (the only idc our encoder emits when deblock is on), so one
        frame-level pass over the assembled state is exact."""
        sps = self.sps
        H, W = sps.mb_h * 16, sps.mb_w * 16
        y, u, v = st.y, st.u, st.v
        disable_deblock, a_off, b_off = st.deblock
        if disable_deblock != 1:
            qpc_grid = CHROMA_QP_TABLE[np.clip(
                st.qp_grid + self.pps.chroma_qp_offset,
                0, 51)].astype(np.int32)
            nnz4 = (st.luma_cnt > 0).astype(np.int32)
            bs = _compute_bs(nnz4, st.mv4.astype(np.int32),
                             st.ref4.astype(np.int32), st.intra_mb)
            feo = ((st.cbp_all == 0) & ~st.intra_mb).astype(np.int32)
            yd, ud, vd = G.deblock_frame_golden(
                y, u, v, bs, st.intra_mb.astype(np.int32), feo, st.qp_grid,
                qpc_grid, a_off * 2, b_off * 2)
            y2, u2, v2 = (yd.astype(np.uint8), ud.astype(np.uint8),
                          vd.astype(np.uint8))
        else:
            y2, u2, v2 = y, u, v

        self.recon = (y, u, v)  # pre-deblock (intra prediction source)
        self.ref = (y2, u2, v2)
        # sliding-window DPB, nearest first; IDR resets it. Entries are
        # (frame_num, y, u, v) so ref_pic_list_modification can address
        # pictures by PicNum.
        if st.idr:
            self.ref_list = []
        self.ref_list.insert(0, (st.frame_num, y2, u2, v2))
        del self.ref_list[max(self.sps.num_ref_frames, 1):]
        cl, cr, ct, cb = sps.crop
        self.frames.append((y2[ct:H - cb, cl:W - cr],
                            u2[ct // 2:(H - cb) // 2, cl // 2:(W - cr) // 2],
                            v2[ct // 2:(H - cb) // 2, cl // 2:(W - cr) // 2]))

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
        mb_type = br.ue()
        return self._decode_intra_mb(br, mb_type, mbx, mby, y, u, v, last_qp,
                                     luma_cnt, chroma_cnt, i4_modes, mb_is_i4)

    # ------------------------------------------------------------------
    # P slices (P_L0 partitions + P_SKIP; MV prediction on the shared
    # block-granularity grid, entropy/mvpred_host.py)
    # ------------------------------------------------------------------
    @staticmethod
    def _part_quads(part, mvs):
        """Partition MVs (coding order) -> (2, 2, 2) per-quadrant MVs."""
        q = np.zeros((2, 2, 2), np.int64)
        for (rbx, rby, w4, h4), mv in zip(PART_GEOM[part], mvs):
            q[rby // 2:(rby + h4 + 1) // 2,
              rbx // 2:(rbx + w4 + 1) // 2] = mv
        return q

    def _ref_planes(self, n_ref, band=None):
        """hpel/padded plane sets for the active reference list; band
        crops rows so band-relative MB coordinates index correctly
        (PAD_MC rows of margin on each side, like the encoder's
        per-slice device bands)."""
        from x264dsp_tpu.ops import mc as MCJ
        refs = []
        for (_fn, ry, ru, rv) in self.active_list[:max(n_ref, 1)]:
            r4 = np.asarray(MCJ.make_ref_planes(ry))
            ru_p = np.asarray(MCJ.pad_chroma(ru))
            rv_p = np.asarray(MCJ.pad_chroma(rv))
            if band is not None:
                y0, y1 = band
                r4 = r4[:, y0 * 16:y1 * 16 + 2 * MCJ.PAD_MC]
                ru_p = ru_p[y0 * 8:y1 * 8 + MCJ.PAD_MC]
                rv_p = rv_p[y0 * 8:y1 * 8 + MCJ.PAD_MC]
            refs.append((r4, ru_p, rv_p))
        return refs

    def _decode_p_mbs(self, br, y, u, v, last_qp, luma_cnt, chroma_cnt,
                      grid, cbp_all, intra_mb, i4_modes, qp_grid=None,
                      n_ref=1, band=None):
        sps, pps = self.sps, self.pps
        mb_w = sps.mb_w
        y0, y1 = band if band is not None else (0, sps.mb_h)
        mb_h = y1 - y0
        refs = self._ref_planes(n_ref, band=(y0, y1))

        n_mbs = mb_w * mb_h
        idx = 0
        skip_run = br.ue()
        while idx < n_mbs:
            mby, mbx = divmod(idx, mb_w)
            if skip_run > 0:
                mv = grid.pskip_mv(mbx, mby)
                self._mc_recon(y, u, v, *refs[0], mbx, mby, mv,
                               None, 0, last_qp)
                grid.set_mb(mbx, mby, 0, [mv], ref=0)
                luma_cnt[mby*4:mby*4+4, mbx*4:mbx*4+4] = 0
                chroma_cnt[:, mby*2:mby*2+2, mbx*2:mbx*2+2] = 0
                i4_modes[mby*4:mby*4+4, mbx*4:mbx*4+4] = 2
                if qp_grid is not None:
                    qp_grid[mby, mbx] = last_qp
                skip_run -= 1
                idx += 1
                continue
            mb_type = br.ue()
            # intra-in-P is compiled out of the reference
            # (encoder/analyse.c:1214-1219); 0..3 = P partition shapes,
            # 4 = P_8x8ref0 (all sub refs 0)
            assert mb_type <= 4, f"P mb_type {mb_type} unsupported"
            sub_ref0 = mb_type == 4
            part = 3 if sub_ref0 else mb_type
            i4_modes[mby*4:mby*4+4, mbx*4:mbx*4+4] = 2
            if part == 3:
                for _ in range(4):
                    sub = br.ue()
                    assert sub == 0, f"sub_mb_type {sub} unsupported"
            mb_ref = 0
            if n_ref > 1 and not sub_ref0:
                prefs = []
                for _ in range(len(PART_GEOM[part])):   # te() ref idx
                    if n_ref == 2:
                        prefs.append(1 - br.bit())
                    else:
                        prefs.append(br.ue())
                assert len(set(prefs)) == 1, \
                    "per-partition mixed refs unsupported"
                mb_ref = prefs[0]
            mvs = []
            for pi in range(len(PART_GEOM[part])):
                mvp = grid.predict_mv(mbx, mby, part, pi, ref=mb_ref)
                mv = mvp + np.array([br.se(), br.se()], np.int64)
                mvs.append(mv)
                grid.set_mb_part(mbx, mby, part, pi, mv, ref=mb_ref)
            mv = self._part_quads(part, mvs)
            ref4, refu, refv = refs[mb_ref]
            cbp_code = br.ue()
            cbp = CBP_TO_GOLOMB_INTER.index(cbp_code)
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
            cbp_all[mby, mbx] = cbp
            qp = last_qp
            if cbp_luma or cbp_chroma:
                qp = last_qp + br.se()
            luma_levels = np.zeros((16, 16), np.int32)
            for i in range(16):
                bx, by = mbx * 4 + int(BIX[i]), mby * 4 + int(BIY[i])
                if (cbp_luma >> (i >> 2)) & 1:
                    nc = self._nc(luma_cnt, by, bx)
                    lv = read_block_residual(br, nc, 16)
                    luma_levels[i] = lv
                    luma_cnt[by, bx] = int(np.count_nonzero(lv))
                else:
                    luma_cnt[by, bx] = 0
            chroma_dc = np.zeros((2, 4), np.int32)
            chroma_ac = np.zeros((2, 4, 16), np.int32)
            if cbp_chroma:
                for ch in range(2):
                    chroma_dc[ch] = read_block_residual(br, 0, 4,
                                                        chroma_dc=True)
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
                    chroma_cnt[:, mby*2:mby*2+2, mbx*2:mbx*2+2] = 0
            else:
                chroma_cnt[:, mby*2:mby*2+2, mbx*2:mbx*2+2] = 0
            self._mc_recon(y, u, v, ref4, refu, refv, mbx, mby, mv,
                           (luma_levels, cbp_luma, chroma_dc, chroma_ac,
                            cbp_chroma), cbp, qp)
            last_qp = qp
            if qp_grid is not None:
                qp_grid[mby, mbx] = qp
            idx += 1
            if idx < n_mbs:
                skip_run = br.ue()
        return last_qp

    # ------------------------------------------------------------------
    # CABAC slice data (mirrors x264dsp_tpu/encoder/core.py CABAC writer
    # and encoder/cabac.c)
    # ------------------------------------------------------------------
    def _decode_mbs_cabac(self, br, slice_type, slice_qp, y, u, v,
                          luma_cnt, chroma_cnt, i4_modes, grid,
                          cbp_all, intra_mb, qp_grid=None, n_ref=1,
                          band=None):
        from x264dsp_tpu.entropy.cabac import (CAT_CHROMA_AC, CAT_CHROMA_DC,
                                               CAT_LUMA_4x4, CAT_LUMA_AC,
                                               CAT_LUMA_DC, CBF_BASE,
                                               COUNT_M1, LAST_OFFSET,
                                               LEVEL_OFFSET, SIG_OFFSET,
                                               _LEVEL1_CTX, _LEVELGT1_CTX,
                                               _LEVEL_TRANS)
        sps, pps = self.sps, self.pps
        mb_w = sps.mb_w
        by0, by1 = band if band is not None else (0, sps.mb_h)
        mb_h = by1 - by0
        is_p = slice_type == 0
        cd = CabacDecoder(br.data, br.pos, slice_type == 2, slice_qp)
        qp = slice_qp
        last_dqp = 0   # x264 h->mb.i_last_dqp, reset at slice start
        prev_ext = 0   # extended cbp of previous MB in raster order

        if is_p:
            refs = self._ref_planes(n_ref, band=(by0, by1))

        nnz = np.zeros((mb_h * 4, mb_w * 4), np.int32)
        cnnz = np.zeros((2, mb_h * 2, mb_w * 2), np.int32)
        cbp_ext = np.full((mb_h, mb_w), -1, np.int32)
        mb_types = np.full((mb_h, mb_w), -1, np.int32)
        chroma_modes = np.zeros((mb_h, mb_w), np.int32)
        # per-4x4-block capped |mvd| cache (h->mb.cache.mvd twin)
        mvd4 = np.zeros((mb_h * 4, mb_w * 4, 2), np.int32)

        def read_residual(cat):
            count_m1 = COUNT_M1[cat]
            n = count_m1 + 1
            out = np.zeros(n, np.int32)
            sig = []
            i = 0
            while True:
                if cd.decision(SIG_OFFSET[cat] + i):
                    sig.append(i)
                    if cd.decision(LAST_OFFSET[cat] + i):
                        break
                i += 1
                if i == count_m1:
                    sig.append(i)
                    break
            node_ctx = 0
            for idx in reversed(sig):
                ctx = _LEVEL1_CTX[node_ctx] + LEVEL_OFFSET[cat]
                if cd.decision(ctx):
                    ctx = _LEVELGT1_CTX[node_ctx] + LEVEL_OFFSET[cat]
                    k = 0
                    while k < 13 and cd.decision(ctx):
                        k += 1
                    abs_c = (15 + cd.ue_bypass(0)) if k == 13 else k + 2
                    node_ctx = _LEVEL_TRANS[1][node_ctx]
                else:
                    abs_c = 1
                    node_ctx = _LEVEL_TRANS[0][node_ctx]
                out[idx] = -abs_c if cd.bypass() else abs_c
            return out

        def cbf_dc(cat, mby, mbx, bit, b_intra):
            la = cbp_ext[mby, mbx - 1] if mbx > 0 else -1
            ta = cbp_ext[mby - 1, mbx] if mby > 0 else -1
            nza = (la >> bit) & 1 if la != -1 else b_intra
            nzb = (ta >> bit) & 1 if ta != -1 else b_intra
            return CBF_BASE[cat] + (nzb << 1) + nza

        def cbf_ac(cat, grid, by, bx, b_intra):
            nza = grid[by, bx - 1] if bx > 0 else b_intra
            nzb = grid[by - 1, bx] if by > 0 else b_intra
            return CBF_BASE[cat] + ((1 if nzb else 0) << 1) + (1 if nza else 0)

        for idx_mb in range(mb_w * mb_h):
            mby, mbx = divmod(idx_mb, mb_w)
            if idx_mb > 0:
                assert cd.terminal() == 0, "premature end_of_slice"

            if is_p:
                nsk = 0
                if mbx > 0 and mb_types[mby, mbx - 1] != 3:
                    nsk += 1
                if mby > 0 and mb_types[mby - 1, mbx] != 3:
                    nsk += 1
                if cd.decision(11 + nsk):
                    mv = grid.pskip_mv(mbx, mby)
                    self._mc_recon(y, u, v, *refs[0], mbx, mby, mv,
                                   None, 0, qp)
                    grid.set_mb(mbx, mby, 0, [mv], ref=0)
                    mb_types[mby, mbx] = 3
                    cbp_ext[mby, mbx] = 0
                    i4_modes[mby*4:mby*4+4, mbx*4:mbx*4+4] = 2
                    mvd4[mby*4:mby*4+4, mbx*4:mbx*4+4] = 0
                    last_dqp = 0
                    prev_ext = 0
                    if qp_grid is not None:
                        qp_grid[mby, mbx] = qp
                    continue

            if is_p:
                assert cd.decision(14) == 0, "intra/other in P unsupported"
                # mb_type bin tree (x264_cabac_mb_header_p, cabac.c:345-415)
                if cd.decision(15):
                    part = 1 if cd.decision(17) else 2
                elif cd.decision(16):
                    part = 3
                    for _ in range(4):
                        assert cd.decision(21) == 1, \
                            "sub_mb_type != L0_8x8 unsupported"
                else:
                    part = 0

                def read_mvd_cpn(axis, ctx):
                    ctxbase = 47 if axis else 40
                    ctxes = [3, 4, 5, 6, 6, 6, 6, 6]
                    if not cd.decision(ctxbase + ctx):
                        return 0
                    k = 1
                    while k < 9 and cd.decision(ctxbase + ctxes[k - 1]):
                        k += 1
                    i_abs = k if k < 9 else 9 + cd.ue_bypass(3)
                    return -i_abs if cd.bypass() else i_abs

                mb_ref = 0
                if n_ref > 1:
                    # ref idx (x264_cabac_ref_p, cabac.c:211-230)
                    prefs = []
                    for pi, (rbx, rby, w4, h4) in enumerate(
                            PART_GEOM[part]):
                        bx0, by0 = mbx * 4 + rbx, mby * 4 + rby
                        ra = (int(grid.ref4[by0, bx0 - 1])
                              if bx0 > 0 else 0)
                        rb = (int(grid.ref4[by0 - 1, bx0])
                              if by0 > 0 else 0)
                        ctx = (1 if ra > 0 else 0) + (2 if rb > 0 else 0)
                        r = 0
                        while cd.decision(54 + ctx):
                            ctx = (ctx >> 2) + 4
                            r += 1
                        prefs.append(r)
                        grid.ref4[by0:by0 + h4, bx0:bx0 + w4] = r
                    assert len(set(prefs)) == 1, \
                        "per-partition mixed refs unsupported"
                    mb_ref = prefs[0]
                mvs = []
                for pi, (rbx, rby, w4, h4) in enumerate(PART_GEOM[part]):
                    bx0, by0 = mbx * 4 + rbx, mby * 4 + rby
                    mvp = grid.predict_mv(mbx, mby, part, pi, ref=mb_ref)
                    la = mvd4[by0, bx0 - 1] if bx0 > 0 else (0, 0)
                    ta = mvd4[by0 - 1, bx0] if by0 > 0 else (0, 0)
                    mvd = []
                    for axis in range(2):
                        amvd = int(la[axis]) + int(ta[axis])
                        ctx = ((1 if amvd > 2 else 0)
                               + (1 if amvd > 32 else 0))
                        mvd.append(read_mvd_cpn(axis, ctx))
                    pmv = mvp + np.asarray(mvd, np.int64)
                    mvs.append(pmv)
                    grid.set_mb_part(mbx, mby, part, pi, pmv, ref=mb_ref)
                    mvd4[by0:by0 + h4, bx0:bx0 + w4] = (
                        min(abs(mvd[0]), 66), min(abs(mvd[1]), 66))
                mv = self._part_quads(part, mvs)
                ref4, refu, refv = refs[mb_ref]
                mb_types[mby, mbx] = 2
                b_intra = 0
                is_i16 = False
                is_i4 = False
                i4_modes[mby*4:mby*4+4, mbx*4:mbx*4+4] = 2
            else:
                intra_mb[mby, mbx] = True
                b_intra = 1
                ctx = 0
                if mbx > 0 and mb_types[mby, mbx - 1] != 1:
                    ctx += 1
                if mby > 0 and mb_types[mby - 1, mbx] != 1:
                    ctx += 1
                if cd.decision(3 + ctx) == 0:
                    is_i4, is_i16 = True, False
                    mb_types[mby, mbx] = 1
                else:
                    is_i4, is_i16 = False, True
                    mb_types[mby, mbx] = 0
                    assert cd.terminal() == 0, "I_PCM unsupported"
                    i4_modes[mby*4:mby*4+4, mbx*4:mbx*4+4] = 2
                modes = np.zeros(16, np.int32)
                i16_mode = 0
                cbp_luma = cbp_chroma = 0
                if is_i16:
                    cbp_luma = 15 if cd.decision(6) else 0
                    if cd.decision(7):
                        cbp_chroma = 2 if cd.decision(8) else 1
                    i16_mode = (cd.decision(9) << 1) | cd.decision(10)
                else:
                    for i in range(16):
                        bx = mbx * 4 + int(BIX[i])
                        by = mby * 4 + int(BIY[i])
                        ma = i4_modes[by, bx - 1] if bx > 0 else -1
                        mb_ = i4_modes[by - 1, bx] if by > 0 else -1
                        pred = min(ma, mb_)
                        pred = 2 if pred < 0 else pred
                        if cd.decision(68):
                            mode = pred
                        else:
                            rem = (cd.decision(69) | (cd.decision(69) << 1)
                                   | (cd.decision(69) << 2))
                            mode = rem + (1 if rem >= pred else 0)
                        modes[i] = mode
                        i4_modes[by, bx] = mode
                # chroma pred mode
                ctx = 0
                if mbx > 0 and chroma_modes[mby, mbx - 1] != 0:
                    ctx += 1
                if mby > 0 and chroma_modes[mby - 1, mbx] != 0:
                    ctx += 1
                cm = 0
                if cd.decision(64 + ctx):
                    cm = 1
                    if cd.decision(64 + 3):
                        cm = 2
                        if cd.decision(64 + 3):
                            cm = 3
                chroma_modes[mby, mbx] = cm

            if not is_i16:
                cl = cbp_ext[mby, mbx - 1] if mbx > 0 else -1
                ct = cbp_ext[mby - 1, mbx] if mby > 0 else -1
                cbp = 0
                cbp |= cd.decision(76 - ((cl >> 1) & 1) - ((ct >> 1) & 2))
                cbp |= cd.decision(76 - ((cbp >> 0) & 1)
                                   - ((ct >> 2) & 2)) << 1
                cbp |= cd.decision(76 - ((cl >> 3) & 1)
                                   - ((cbp << 1) & 2)) << 2
                cbp |= cd.decision(76 - ((cbp >> 2) & 1)
                                   - ((cbp >> 0) & 2)) << 3
                cbp_luma = cbp
                ctx = 0
                if (cl & 0x30) and cl != -1:
                    ctx += 1
                if (ct & 0x30) and ct != -1:
                    ctx += 2
                cbp_chroma = 0
                if cd.decision(77 + ctx):
                    ctx = 4
                    if (cl & 0x30) == 0x20:
                        ctx += 1
                    if (ct & 0x30) == 0x20:
                        ctx += 2
                    cbp_chroma = 2 if cd.decision(77 + ctx) else 1

            cbp_all[mby, mbx] = (cbp_chroma << 4) | cbp_luma
            nz_dc = 0
            cnz_dc = [0, 0]
            luma_dc = np.zeros(16, np.int32)
            luma_levels = np.zeros((16, 16), np.int32)
            chroma_dc = np.zeros((2, 4), np.int32)
            chroma_ac = np.zeros((2, 4, 16), np.int32)

            if cbp_luma or cbp_chroma or is_i16:
                # qp_delta (x264_cabac_qp_delta, encoder/cabac.c:165-201)
                ctxq = 1 if (last_dqp != 0 and prev_ext != 0) else 0
                dq = 0
                if cd.decision(60 + ctxq):
                    ctxq = 2 + (ctxq >> 1)
                    val = 1
                    while cd.decision(60 + ctxq):
                        ctxq = 2 + (ctxq >> 1)
                        val += 1
                    dq = (val + 1) // 2 if val % 2 else -(val // 2)
                qp = qp + dq
                last_dqp = dq
                if is_i16:
                    ctx = cbf_dc(CAT_LUMA_DC, mby, mbx, 8, b_intra)
                    if cd.decision(ctx):
                        nz_dc = 1
                        luma_dc = read_residual(CAT_LUMA_DC)
                    if cbp_luma:
                        for i in range(16):
                            bx = mbx * 4 + int(BIX[i])
                            by = mby * 4 + int(BIY[i])
                            ctx = cbf_ac(CAT_LUMA_AC, nnz, by, bx, b_intra)
                            if cd.decision(ctx):
                                luma_levels[i, 1:] = read_residual(
                                    CAT_LUMA_AC)
                                nnz[by, bx] = 1
                elif cbp_luma:
                    for i in range(16):
                        if not (cbp_luma & (1 << (i >> 2))):
                            continue
                        bx = mbx * 4 + int(BIX[i])
                        by = mby * 4 + int(BIY[i])
                        ctx = cbf_ac(CAT_LUMA_4x4, nnz, by, bx, b_intra)
                        if cd.decision(ctx):
                            luma_levels[i] = read_residual(CAT_LUMA_4x4)
                            nnz[by, bx] = 1
                if cbp_chroma:
                    for ch in range(2):
                        ctx = cbf_dc(CAT_CHROMA_DC, mby, mbx, 9 + ch,
                                     b_intra)
                        if cd.decision(ctx):
                            cnz_dc[ch] = 1
                            chroma_dc[ch] = read_residual(CAT_CHROMA_DC)
                    if cbp_chroma == 2:
                        for ch in range(2):
                            for i in range(4):
                                bx = mbx * 2 + (i & 1)
                                by = mby * 2 + (i >> 1)
                                ctx = cbf_ac(CAT_CHROMA_AC, cnnz[ch],
                                             by, bx, b_intra)
                                if cd.decision(ctx):
                                    chroma_ac[ch, i, 1:] = read_residual(
                                        CAT_CHROMA_AC)
                                    cnnz[ch, by, bx] = 1

            if not (cbp_luma or cbp_chroma or is_i16):
                last_dqp = 0   # uncoded MB: qp inherited, last_dqp reset
            cbp_ext[mby, mbx] = ((cbp_chroma << 4) | cbp_luma | (nz_dc << 8)
                                 | (cnz_dc[0] << 9) | (cnz_dc[1] << 10))
            prev_ext = cbp_ext[mby, mbx]
            if qp_grid is not None:
                qp_grid[mby, mbx] = qp
            # nnz context state for luma/chroma counts used by deblock
            for i in range(16):
                bx = mbx * 4 + int(BIX[i])
                by = mby * 4 + int(BIY[i])
                luma_cnt[by, bx] = int(np.count_nonzero(luma_levels[i]))

            # ---- reconstruction ----
            if is_p:
                self._mc_recon(y, u, v, ref4, refu, refv, mbx, mby, mv,
                               (luma_levels, cbp_luma, chroma_dc, chroma_ac,
                                cbp_chroma), cbp_all[mby, mbx], qp)
            else:
                x0, y0 = mbx * 16, mby * 16
                avail_l, avail_t = mbx > 0, mby > 0
                if is_i4:
                    self._recon_i4(y, x0, y0, modes, luma_levels, qp,
                                   avail_l, avail_t, mbx, mby)
                else:
                    # reconstruct zigzagged DC into _recon_i16's format
                    self._recon_i16(y, x0, y0, i16_mode, luma_dc,
                                    luma_levels, cbp_luma, qp,
                                    avail_l, avail_t, avail_l and avail_t)
                qpc = int(CHROMA_QP_TABLE[np.clip(
                    qp + pps.chroma_qp_offset, 0, 51)])
                for ch, plane in ((0, u), (1, v)):
                    self._recon_chroma(plane, mbx * 8, mby * 8, cm,
                                       chroma_dc[ch], chroma_ac[ch],
                                       cbp_chroma, qpc, avail_l, avail_t,
                                       avail_l and avail_t)
        assert cd.terminal() == 1, "missing end_of_slice"
        return qp

    def _mc_recon(self, y, u, v, ref4, refu, refv, mbx, mby, mv,
                  residual, cbp, qp):
        """mv: (2,) uniform MB MV or (2, 2, 2) per-quadrant MVs (P
        partitions); quadrant-wise MC is exact for every shape since the
        hpel-plane interpolation is pointwise."""
        x0, y0 = mbx * 16, mby * 16
        mvq = np.asarray(mv)
        if mvq.ndim == 1:
            mvq = np.broadcast_to(mvq, (2, 2, 2))
        pred = np.zeros((16, 16), np.int32)
        predu = np.zeros((8, 8), np.int32)
        predv = np.zeros((8, 8), np.int32)
        for qy in range(2):
            for qx in range(2):
                mvx, mvy = int(mvq[qy, qx, 0]), int(mvq[qy, qx, 1])
                pred[qy*8:qy*8+8, qx*8:qx*8+8] = G.mc_luma(
                    [ref4[i] for i in range(4)],
                    x0 + 32 + qx * 8, y0 + 32 + qy * 8, mvx, mvy, 8, 8)
                predu[qy*4:qy*4+4, qx*4:qx*4+4] = G.mc_chroma(
                    refu, mbx * 8 + 16 + qx * 4, mby * 8 + 16 + qy * 4,
                    mvx, mvy, 4, 4)
                predv[qy*4:qy*4+4, qx*4:qx*4+4] = G.mc_chroma(
                    refv, mbx * 8 + 16 + qx * 4, mby * 8 + 16 + qy * 4,
                    mvx, mvy, 4, 4)
        if residual is None:
            y[y0:y0+16, x0:x0+16] = pred.astype(np.uint8)
            u[mby*8:mby*8+8, mbx*8:mbx*8+8] = predu.astype(np.uint8)
            v[mby*8:mby*8+8, mbx*8:mbx*8+8] = predv.astype(np.uint8)
            return
        luma_levels, cbp_luma, chroma_dc, chroma_ac, cbp_chroma = residual
        out = pred.astype(np.int32).copy()
        for i in range(16):
            bx, by = int(BIX[i]) * 4, int(BIY[i]) * 4
            if (cbp_luma >> (i >> 2)) & 1 and np.any(luma_levels[i]):
                blk = np.zeros(16, np.int32)
                blk[ZIGZAG_4x4] = luma_levels[i]
                dq = G.dequant_4x4(blk.reshape(4, 4), qp, self.dmf[1])
                out[by:by+4, bx:bx+4] = G.add4x4_idct(
                    pred[by:by+4, bx:bx+4].astype(np.uint8), dq)
        y[y0:y0+16, x0:x0+16] = out.astype(np.uint8)
        qpc = int(CHROMA_QP_TABLE[np.clip(qp + self.pps.chroma_qp_offset,
                                          0, 51)])
        for ch, (plane, predc) in enumerate(((u, predu), (v, predv))):
            outc = predc.astype(np.int32).copy()
            dc = np.zeros(4, np.int32)
            dc[G.ZIGZAG_2x2_DC] = chroma_dc[ch]
            dq_dc = G.idct_dequant_2x2_dc(dc, qpc, self.dmf[3])
            for i in range(4):
                bx, by = (i & 1) * 4, (i >> 1) * 4
                if cbp_chroma == 2:
                    blk = np.zeros(16, np.int32)
                    blk[ZIGZAG_4x4] = chroma_ac[ch, i]
                    dq = G.dequant_4x4(blk.reshape(4, 4), qpc, self.dmf[3])
                    dq[0, 0] = dq_dc[i]
                    outc[by:by+4, bx:bx+4] = G.add4x4_idct(
                        predc[by:by+4, bx:bx+4].astype(np.uint8), dq)
                elif cbp_chroma == 1:
                    d = (dq_dc[i] + 32) >> 6
                    outc[by:by+4, bx:bx+4] = np.clip(
                        predc[by:by+4, bx:bx+4] + d, 0, 255)
            plane[mby*8:mby*8+8, mbx*8:mbx*8+8] = outc.astype(np.uint8)

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
        dct_dc = G.dequant_4x4_dc(dct_dc, qp, self.dmf[0])
        out = np.zeros((16, 16), np.int32)
        for i in range(16):
            bx, by = int(BIX[i]) * 4, int(BIY[i]) * 4
            blk = np.zeros(16, np.int32)
            blk[ZIGZAG_4x4] = ac_levels[i]
            q = blk.reshape(4, 4)
            dq = G.dequant_4x4(q, qp, self.dmf[0])
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
                dq = G.dequant_4x4(blk.reshape(4, 4), qp, self.dmf[0])
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
        dq_dc = G.idct_dequant_2x2_dc(dc, qpc, self.dmf[2])
        for i in range(4):
            bx, by = (i & 1) * 4, (i >> 1) * 4
            blk = np.zeros(16, np.int32)
            blk[ZIGZAG_4x4] = ac_levels[i]
            q = blk.reshape(4, 4)
            if cbp_chroma == 2:
                dq = G.dequant_4x4(q, qpc, self.dmf[2])
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
    # honor JAX_PLATFORMS through jax.config: this image's axon site
    # hook overrides the env var, which would block the first jax op
    # on accelerator init even for a pure host-side decode
    _plat = os.environ.get("JAX_PLATFORMS")
    if _plat:
        import jax
        jax.config.update("jax_platforms", _plat.split(",")[0])
    frames = decode_file(sys.argv[1])
    print(f"decoded {len(frames)} frames "
          f"{frames[0][0].shape[1]}x{frames[0][0].shape[0]}")
    if len(sys.argv) > 2:
        with open(sys.argv[2], "wb") as f:
            for fy, fu, fv in frames:
                f.write(fy.tobytes())
                f.write(fu.tobytes())
                f.write(fv.tobytes())
