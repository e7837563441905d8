"""Block-granularity MV prediction on the frame 4x4-MV grid.

Twin of common/mvpred.c (x264_mb_predict_mv :22-100, _16x16 :103-137,
_pskip :143-160) reformulated on frame coordinates instead of the scan8
cache: the cache's -2 (outside/not yet decoded) becomes an explicit
decoded-order test. Specialized to the fork's P slices (no intra-in-P,
analyse.c:1214-1219) but fully ref-aware for the multi-reference DPB:
"candidate matches" == "block decoded AND same ref idx"; the median at
count != 1 uses the neighbours' actual MVs regardless of ref.

Used by the Python entropy twins and the conformance decoder (the C++
writer mirrors it in entropy/native/entropy.cpp).
"""

from __future__ import annotations

import numpy as np

# partition enum (x264 D_* subset): 0=16x16, 1=16x8, 2=8x16, 3=8x8
D_16x16, D_16x8, D_8x16, D_8x8 = 0, 1, 2, 3

# partition geometry: PART_GEOM[partition] = list of (rel_bx, rel_by,
# w4, h4) per partition index, in coding order
PART_GEOM = {
    D_16x16: [(0, 0, 4, 4)],
    D_16x8: [(0, 0, 4, 2), (0, 2, 4, 2)],
    D_8x16: [(0, 0, 2, 4), (2, 0, 2, 4)],
    D_8x8: [(0, 0, 2, 2), (2, 0, 2, 2), (0, 2, 2, 2), (2, 2, 2, 2)],
}

# rank of each rel 4x4 block within the MB for each partition shape
_RANK = {}
for _p, _geom in PART_GEOM.items():
    r = np.zeros((4, 4), np.int32)
    for _i, (_bx, _by, _w, _h) in enumerate(_geom):
        r[_by:_by + _h, _bx:_bx + _w] = _i
    _RANK[_p] = r


def _median3(a, b, c):
    return np.array([int(a[k]) + int(b[k]) + int(c[k])
                     - min(a[k], b[k], c[k]) - max(a[k], b[k], c[k])
                     for k in range(2)], np.int64)


class MvGrid:
    """Frame-level 4x4 MV+ref grid with decode-order availability."""

    def __init__(self, mb_w: int, mb_h: int):
        self.mb_w = mb_w
        self.mb_h = mb_h
        self.mv4 = np.zeros((mb_h * 4, mb_w * 4, 2), np.int64)
        self.ref4 = np.zeros((mb_h * 4, mb_w * 4), np.int32)

    def set_mb(self, mbx: int, mby: int, partition: int, part_mvs,
               ref: int = 0):
        """Store a decided MB's partition MVs (list in coding order)."""
        for i, mv in enumerate(part_mvs):
            self.set_mb_part(mbx, mby, partition, i, mv, ref)

    def set_mb_part(self, mbx: int, mby: int, partition: int, idx: int,
                    mv, ref: int = 0):
        """Store one partition's MV (decoder-side incremental fill)."""
        rbx, rby, w4, h4 = PART_GEOM[partition][idx]
        self.mv4[mby * 4 + rby: mby * 4 + rby + h4,
                 mbx * 4 + rbx: mbx * 4 + rbx + w4] = mv
        self.ref4[mby * 4 + rby: mby * 4 + rby + h4,
                  mbx * 4 + rbx: mbx * 4 + rbx + w4] = ref

    def _decoded(self, x, y, mbx, mby, partition, rank):
        """Is block (x, y) decoded before partition `rank` of MB
        (mbx, mby)? (the scan8 cache's -2 semantics)"""
        if x < 0 or y < 0 or x >= self.mb_w * 4 or y >= self.mb_h * 4:
            return False
        bx_mb, by_mb = x >> 2, y >> 2
        if by_mb != mby:
            return by_mb < mby
        if bx_mb != mbx:
            return bx_mb < mbx
        return int(_RANK[partition][y & 3, x & 3]) < rank

    def _nb(self, x, y, ok, cur_ref):
        """Returns (mv, exists, ref_matches)."""
        if not ok:
            return np.zeros(2, np.int64), False, False
        return self.mv4[y, x], True, int(self.ref4[y, x]) == cur_ref

    def predict_mv(self, mbx: int, mby: int, partition: int, idx: int,
                   ref: int = 0):
        """x264_mb_predict_mv (mvpred.c:22-100) for partition `idx` of
        shape `partition` with reference `ref`. Returns mvp (2,)."""
        rbx, rby, w4, h4 = PART_GEOM[partition][idx]
        bx0, by0 = mbx * 4 + rbx, mby * 4 + rby

        def nb(x, y):
            return self._nb(x, y,
                            self._decoded(x, y, mbx, mby, partition, idx),
                            ref)

        mv_a, ex_a, m_a = nb(bx0 - 1, by0)
        mv_b, ex_b, m_b = nb(bx0, by0 - 1)
        mv_c, ex_c, m_c = nb(bx0 + w4, by0 - 1)
        if not ex_c:
            mv_c, ex_c, m_c = nb(bx0 - 1, by0 - 1)  # top-left fallback

        # spec shortcuts (8.4.1.3.1 / mvpred.c:41-77)
        if partition == D_16x8:
            if idx == 0 and m_b:
                return mv_b.copy()
            if idx == 1 and m_a:
                return mv_a.copy()
        elif partition == D_8x16:
            if idx == 0 and m_a:
                return mv_a.copy()
            if idx == 1 and m_c:
                return mv_c.copy()

        count = int(m_a) + int(m_b) + int(m_c)
        if count > 1:
            return _median3(mv_a, mv_b, mv_c)
        if count == 1:
            return (mv_a if m_a else mv_b if m_b else mv_c).copy()
        if not ex_b and not ex_c and ex_a:
            return mv_a.copy()
        return _median3(mv_a, mv_b, mv_c)

    def pskip_mv(self, mbx: int, mby: int):
        """x264_mb_predict_mv_pskip (mvpred.c:143-160): zero when A or B
        is missing or is a zero-MV ref-0 block, else the ref-0 16x16
        prediction."""
        bx0, by0 = mbx * 4, mby * 4
        mv_a, ex_a, m0_a = self._nb(
            bx0 - 1, by0, self._decoded(bx0 - 1, by0, mbx, mby, 0, 0), 0)
        mv_b, ex_b, m0_b = self._nb(
            bx0, by0 - 1, self._decoded(bx0, by0 - 1, mbx, mby, 0, 0), 0)
        if (not ex_a or not ex_b
                or (m0_a and not mv_a.any())
                or (m0_b and not mv_b.any())):
            return np.zeros(2, np.int64)
        return self.predict_mv(mbx, mby, D_16x16, 0, ref=0)
