"""Host CABAC entropy stage — twin of common/cabac.c + encoder/cabac.c.

Engine: byte-wise range coder with carry propagation via outstanding-0xff
bookkeeping (x264_cabac_putbyte, common/cabac.c:517-548), renorm by LUT
(:551-557), decision/bypass/terminal (:561-613) and the flush sequence
(:614-631, including the frame-indexed padding bit).

MB syntax binarization follows encoder/cabac.c exactly: I/P mb_type
(:38-114, :343-415), intra pred modes (:65-110), cbp (:111-164), qp_delta
(:165-201), skip (:203-209), mvd UEG3 (:243-301), cbf contexts (:416-450),
residual significance/last/level coding (:489-556).
"""

from __future__ import annotations

import numpy as np

from .cabac_tables import CONTEXTS, RANGE_LPS, RENORM_SHIFT, TRANSITION


class CabacEncoder:
    def __init__(self, slice_type_is_i: bool, qp: int, frame_idx: int = 0):
        self.state = list(CONTEXTS[0 if slice_type_is_i else 1][
            int(np.clip(qp, 0, 51))])
        self.low = 0
        self.range = 0x01FE
        self.queue = -9   # first bit shifted away, never written
        self.outstanding = 0
        self.buf = bytearray()
        self.frame_idx = frame_idx

    # -- engine (common/cabac.c:517-631) --
    def _putbyte(self):
        if self.queue >= 0:
            out = self.low >> (self.queue + 10)
            self.low &= (0x400 << self.queue) - 1
            self.queue -= 8
            if (out & 0xFF) == 0xFF:
                self.outstanding += 1
            else:
                carry = out >> 8
                if carry:
                    # propagate into the last written byte
                    self.buf[-1] = (self.buf[-1] + carry) & 0xFF
                while self.outstanding > 0:
                    self.buf.append((carry - 1) & 0xFF)
                    self.outstanding -= 1
                self.buf.append(out & 0xFF)

    def _renorm(self):
        shift = RENORM_SHIFT[self.range >> 3]
        self.range <<= shift
        self.low <<= shift
        self.queue += shift
        self._putbyte()

    def decision(self, ctx: int, b: int):
        s = self.state[ctx]
        lps = RANGE_LPS[s >> 1][(self.range >> 6) - 4]
        self.range -= lps
        if b != (s & 1):
            self.low += self.range
            self.range = lps
        self.state[ctx] = TRANSITION[s][b]
        self._renorm()

    def bypass(self, b: int):
        """b must be 0 or all-ones (-1) — matches the reference's negated
        convention (cabac.c:576-582)."""
        self.low <<= 1
        self.low += b & self.range
        self.queue += 1
        self._putbyte()

    def ue_bypass(self, exp_bits: int, val: int):
        """UEGk suffix (x264_cabac_encode_ue_bypass, cabac.c:590-606)."""
        k = exp_bits
        while val >= (1 << k):
            self.bypass(-1)
            val -= 1 << k
            k += 1
        self.bypass(0)
        while k > 0:
            k -= 1
            self.bypass(-((val >> k) & 1))

    def terminal(self):
        self.range -= 2
        self._renorm()

    def flush(self) -> bytes:
        self.low += self.range - 2
        self.low |= 1
        self.low <<= 9
        self.queue += 9
        self._putbyte()
        self._putbyte()
        self.low <<= -self.queue
        self.low |= ((0x35A4E4F5 >> (self.frame_idx & 31)) & 1) << 10
        self.queue = 0
        self._putbyte()
        while self.outstanding > 0:
            self.buf.append(0xFF)
            self.outstanding -= 1
        return bytes(self.buf)


# -- residual tables (encoder/cabac.c:458-487) --
SIG_OFFSET = {0: 105, 1: 105 + 15, 2: 105 + 29, 3: 105 + 44, 4: 105 + 47}
LAST_OFFSET = {0: 166, 1: 166 + 15, 2: 166 + 29, 3: 166 + 44, 4: 166 + 47}
LEVEL_OFFSET = {0: 227, 1: 227 + 10, 2: 227 + 20, 3: 227 + 30, 4: 227 + 39}
COUNT_M1 = {0: 15, 1: 14, 2: 15, 3: 3, 4: 14}
CBF_BASE = {0: 85, 1: 89, 2: 93, 3: 97, 4: 101}
_LEVEL1_CTX = [1, 2, 3, 4, 0, 0, 0, 0]
_LEVELGT1_CTX = [5, 5, 5, 5, 6, 7, 8, 9]
_LEVEL_TRANS = [[1, 2, 3, 3, 4, 5, 6, 7], [4, 4, 4, 4, 5, 6, 7, 7]]

# block categories (common/macroblock.h cabac_ctx_block_cat_e)
CAT_LUMA_DC = 0
CAT_LUMA_AC = 1
CAT_LUMA_4x4 = 2
CAT_CHROMA_DC = 3
CAT_CHROMA_AC = 4


def write_block_residual(cb: CabacEncoder, cat: int, levels):
    """x264_cabac_block_residual (encoder/cabac.c:489-556). levels:
    zigzag-ordered, at least one nonzero."""
    levels = np.asarray(levels)
    ctx_sig = SIG_OFFSET[cat]
    ctx_last = LAST_OFFSET[cat]
    ctx_level = LEVEL_OFFSET[cat]
    count_m1 = COUNT_M1[cat]
    last = int(np.flatnonzero(levels)[-1])

    coeffs = []
    i = 0
    while True:
        if levels[i]:
            coeffs.append(int(levels[i]))
            cb.decision(ctx_sig + i, 1)
            if i == last:
                cb.decision(ctx_last + i, 1)
                break
            cb.decision(ctx_last + i, 0)
        else:
            cb.decision(ctx_sig + i, 0)
        i += 1
        if i == count_m1:
            coeffs.append(int(levels[i]))
            break

    node_ctx = 0
    for coeff in reversed(coeffs):
        abs_coeff = abs(coeff)
        ctx = _LEVEL1_CTX[node_ctx] + ctx_level
        if abs_coeff > 1:
            cb.decision(ctx, 1)
            ctx = _LEVELGT1_CTX[node_ctx] + ctx_level
            for _ in range(min(abs_coeff, 15) - 2):
                cb.decision(ctx, 1)
            if abs_coeff < 15:
                cb.decision(ctx, 0)
            else:
                cb.ue_bypass(0, abs_coeff - 15)
            node_ctx = _LEVEL_TRANS[1][node_ctx]
        else:
            cb.decision(ctx, 0)
            node_ctx = _LEVEL_TRANS[0][node_ctx]
        cb.bypass(-1 if coeff < 0 else 0)


def write_mvd_component(cb: CabacEncoder, axis: int, mvd: int, ctx: int) -> int:
    """x264_cabac_mvd_cpn (encoder/cabac.c:243-276). Returns capped |mvd|."""
    ctxbase = 47 if axis else 40
    ctxes = [3, 4, 5, 6, 6, 6, 6, 6]
    if mvd == 0:
        cb.decision(ctxbase + ctx, 0)
        return 0
    i_abs = abs(mvd)
    cb.decision(ctxbase + ctx, 1)
    if i_abs < 9:
        for i in range(1, i_abs):
            cb.decision(ctxbase + ctxes[i - 1], 1)
        cb.decision(ctxbase + ctxes[i_abs - 1], 0)
    else:
        for i in range(1, 9):
            cb.decision(ctxbase + ctxes[i - 1], 1)
        cb.ue_bypass(3, i_abs - 9)
    cb.bypass(-1 if mvd < 0 else 0)
    return min(i_abs, 66)


def write_qp_delta(cb: CabacEncoder, dqp: int, last_dqp_nonzero: bool):
    """x264_cabac_qp_delta core (encoder/cabac.c:183-201); the empty-I16
    suppression is the caller's job."""
    ctx = 1 if last_dqp_nonzero else 0
    if dqp != 0:
        val = 2 * dqp - 1 if dqp > 0 else -2 * dqp
        if val >= 51 and val != 52:
            val = 103 - val  # dqp interpreted modulo QP_MAX_SPEC+1
        while val:
            cb.decision(60 + ctx, 1)
            ctx = 2 + (ctx >> 1)
            val -= 1
    cb.decision(60 + ctx, 0)


def write_intra4x4_pred_mode(cb: CabacEncoder, pred: int, mode: int):
    if pred == mode:
        cb.decision(68, 1)
    else:
        cb.decision(68, 0)
        if mode > pred:
            mode -= 1
        cb.decision(69, mode & 1)
        cb.decision(69, (mode >> 1) & 1)
        cb.decision(69, mode >> 2)


def write_mb_type_intra(cb: CabacEncoder, is_i4: bool, i16_mode_fix: int,
                        cbp_luma: int, cbp_chroma: int,
                        ctx0, ctx1, ctx2, ctx3, ctx4, ctx5):
    """x264_cabac_mb_type_intra (encoder/cabac.c:38-64)."""
    if is_i4:
        cb.decision(ctx0, 0)
        return
    cb.decision(ctx0, 1)
    cb.terminal()
    cb.decision(ctx1, 1 if cbp_luma else 0)
    if cbp_chroma == 0:
        cb.decision(ctx2, 0)
    else:
        cb.decision(ctx2, 1)
        cb.decision(ctx3, cbp_chroma >> 1)
    cb.decision(ctx4, i16_mode_fix >> 1)
    cb.decision(ctx5, i16_mode_fix & 1)
