"""Batched multi-stream encoder: frame-level parallelism, TPU-style.

The reference keeps x264's frame-threading plumbing but hard-forces
i_threads = 1 (encoder/encoder.c:57, pthread stubs osdep.h:102-120).
On TPU the same axis of parallelism is a leading STREAM dimension on
every tensor of the fused frame step (SURVEY §2.6: "frame-level
threading -> multi-stream batching"): N independent video streams
encode in lockstep, one batched device dispatch per frame slot, each
stream producing its own conformant Annex-B stream. The batch axis is
also the data-parallel axis for multi-chip sharding (parallel/mesh.py,
__graft_entry__.dryrun_multichip).

Host work per batch-frame: one exact-size payload pull, per-stream NAL
escape + framing (C++ nal_escape in a thread pool), and the RC scalar
update. Device work: ONE jit (encode + deblock strengths + device
CAVLC + in-loop deblock + hpel reference pyramid) with the reference
planes donated in place.

Like x264's threaded encoder (x264.h:919 "delayed frames" contract),
output is pipelined one batch behind input: encode_batch(pics) returns
the PREVIOUS slot's NALs (None on the first call); encode_batch(None)
drains the pipeline. The one-slot delay is what lets the host finish
slot N's entropy/framing while the device computes slot N+1.

V1 scope (ValidationError otherwise): CAVLC, CQP, single slice per
frame, 1 reference, AQ/VBV/NR off, fixed-GOP keyint with lockstep IDRs
— the BASELINE.json config-5 shape. Per-stream rate control, scenecut
and the recovery paths remain the single-stream Encoder's domain.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .. import params as P
from ..api import NAL, Picture
from ..entropy.bitstream import BitWriter, nal_unit
from .sets import PPS, SPS
from .ratecontrol import RateControl
from . import core as C


class BatchEncoder:
    def __init__(self, param: P.Param, n_streams: int):
        self.param = p = P.validate_parameters(param)
        if p.b_cabac:
            raise P.ValidationError("BatchEncoder v1 is CAVLC-only "
                                    "(use Encoder for CABAC streams)")
        if p.rc.i_rc_method != P.RC_CQP:
            raise P.ValidationError("BatchEncoder v1 is CQP-only")
        if p.rc.i_vbv_buffer_size:
            raise P.ValidationError("BatchEncoder v1 has no VBV")
        if p.rc.i_aq_mode != P.AQ_NONE and p.rc.f_aq_strength > 0:
            raise P.ValidationError("BatchEncoder v1 has no AQ")
        if max(1, p.i_slice_count) != 1 or p.i_slice_max_mbs \
                or p.i_slice_max_size:
            raise P.ValidationError("BatchEncoder v1 is single-slice")
        if p.i_frame_reference != 1:
            raise P.ValidationError("BatchEncoder v1 uses 1 reference")
        if p.analyse.i_noise_reduction:
            raise P.ValidationError("BatchEncoder v1 has no NR")
        self.S = int(n_streams)
        self.sps = SPS.init(p, p.i_sps_id)
        self.pps = PPS.init(p, self.sps, p.i_sps_id)
        self.mb_w = self.sps.i_mb_width
        self.mb_h = self.sps.i_mb_height
        self.rc = RateControl(p, self.mb_w * self.mb_h)
        self.use_satd = p.analyse.i_subpel_refine > 0
        self.i4x4_enabled = bool(p.analyse.intra & P.ANALYSE_I4x4)
        self.cqm = None
        if p.i_cqm_preset != P.CQM_FLAT:
            raise P.ValidationError("BatchEncoder v1 is flat-CQM")
        self.i_frame = 0
        self.frame_num = 0
        self.idr_pic_id = 0
        self.refs = None
        self._pending = None
        self._pool = ThreadPoolExecutor(max_workers=min(max(self.S, 2), 8))
        self.frames = {P.SLICE_TYPE_I: 0, P.SLICE_TYPE_P: 0}
        self.bytes = {P.SLICE_TYPE_I: 0, P.SLICE_TYPE_P: 0}
        self.mb_hist = {}
        cap = C._DEV_PAYLOAD_BYTES_PER_MB * self.mb_w * self.mb_h + 4096
        self._cap = -(-cap // 4) * 4

    # ------------------------------------------------------------------
    def headers(self) -> list[NAL]:
        nals = []
        for cls, t in ((self.sps, P.NAL_SPS), (self.pps, P.NAL_PPS)):
            bw = BitWriter()
            cls.write(bw)
            nals.append(NAL(t, P.NAL_PRIORITY_HIGHEST,
                            nal_unit(t, P.NAL_PRIORITY_HIGHEST,
                                     bw.get_bytes())))
        return nals

    # ------------------------------------------------------------------
    _deblock_enabled = C.EncoderCore._deblock_enabled

    def _fn(self, is_p: bool, qp: int):
        p = self.param
        deblock_on = self._deblock_enabled(qp)
        return C._fused_frame_fn(
            is_p, self.mb_h, self.mb_w, 1, self.cqm,
            p.analyse.i_me_range, p.analyse.i_mv_range,
            bool(p.analyse.b_dct_decimate),
            min(max(p.analyse.i_me_method, 0), 3),
            bool(p.analyse.b_fast_pskip),
            bool(p.analyse.inter & P.ANALYSE_PSUB16x16),
            min(max(p.analyse.i_subpel_refine, 0), 11),
            self.use_satd, self.i4x4_enabled, deblock_on,
            p.i_deblocking_filter_alphac0 * 2,
            p.i_deblocking_filter_beta * 2,
            p.analyse.i_chroma_qp_offset, self._cap,
            False, False, os.environ.get("X264_DONATE", "1") == "1",
            batched=True)

    def _finish_pending(self):
        """Pull the previous slot's payload and frame its NALs."""
        if self._pending is None:
            return None
        rec = self._pending
        self._pending = None
        out, slice_type, is_idr, first = (rec["out"], rec["slice_type"],
                                          rec["is_idr"], rec["first"])
        bits = np.asarray(out["bits"])
        if np.asarray(out["ov"]).any() or (bits > self._cap * 8).any():
            raise RuntimeError(
                "device CAVLC overflow in BatchEncoder (pathological "
                "content for the payload cap); use Encoder for this "
                "stream")
        nbytes = (bits.astype(np.int64) + 7) >> 3
        bucket = min(1 << max(12, int(nbytes.max() - 1).bit_length()),
                     self._cap)
        raw = np.asarray(out["payload"][:, :bucket])
        from ..entropy import native
        nal_type = P.NAL_SLICE_IDR if is_idr else P.NAL_SLICE

        def one(s):
            body = raw[s, :nbytes[s]].tobytes()
            nals = []
            if first and self.param.b_repeat_headers:
                nals.extend(self.headers())
            nals.append(NAL(nal_type, P.NAL_PRIORITY_HIGHEST,
                            nal_unit(nal_type, P.NAL_PRIORITY_HIGHEST,
                                     body)))
            return nals
        out_nals = list(self._pool.map(one, range(self.S)))
        # stats (on-device histogram vector, summed over streams)
        vec = np.asarray(out["stats"]).sum(axis=0)
        self.frames[slice_type] += self.S
        self.bytes[slice_type] += sum(
            len(n.payload) for nl in out_nals for n in nl)
        B = self.mb_w * self.mb_h
        h = self.mb_hist
        if slice_type == P.SLICE_TYPE_P:
            n_skip = int(vec[0])
            part = vec[1:5].copy()
            part[0] -= n_skip
            h["P_SKIP"] = h.get("P_SKIP", 0) + n_skip
            for name, n in zip(C._PART_NAMES, part):
                if n:
                    h[name] = h.get(name, 0) + int(n)
        else:
            n_i4 = int(vec[0])
            h["I_4x4"] = h.get("I_4x4", 0) + n_i4
            h["I_16x16"] = h.get("I_16x16", 0) + self.S * B - n_i4
        return out_nals

    # ------------------------------------------------------------------
    def encode_batch(self, pics):
        """pics: list of S Pictures (device or host planes), a
        pre-stacked ((S,H,W) y, (S,H/2,W/2) u, v) device triple (the
        zero-copy ingest path for frames already in HBM), or None to
        drain. Returns the PREVIOUS slot's per-stream NAL lists (None
        while the one-slot pipeline fills)."""
        import jax.numpy as jnp
        if pics is None:
            return self._finish_pending()
        p = self.param
        if isinstance(pics, tuple) and len(pics) == 3:
            fy, fu, fv = (jnp.asarray(a) for a in pics)
            if fy.shape[0] != self.S:
                raise ValueError(f"expected {self.S} stacked streams")
        else:
            if len(pics) != self.S:
                raise ValueError(f"expected {self.S} pictures")

            def stackp(planes, mb):
                padded = []
                for a in planes:
                    if not type(a).__module__.startswith("jax"):
                        a = C.pad_mod16(np.asarray(a, np.uint8), mb)
                    padded.append(jnp.asarray(a))
                return jnp.stack(padded)
            fy = stackp([q.y for q in pics], 16)
            fu = stackp([q.u for q in pics], 8)
            fv = stackp([q.v for q in pics], 8)

        gop = self.i_frame % max(self.param.i_keyint_max, 1)
        is_idr = gop == 0
        slice_type = P.SLICE_TYPE_I if is_idr else P.SLICE_TYPE_P
        qp = int(np.clip(self.rc.start(slice_type, 0),
                         p.rc.i_qp_min, min(p.rc.i_qp_max,
                                            P.QP_MAX_SPEC)))
        if is_idr:
            self.frame_num = 0
        # the slice header is shared by all streams (lockstep GOP) and
        # written by the SAME code path as the single-stream Encoder
        # (duck-typed unbound call: x264_slice_header_write twin)
        bw = BitWriter()
        C.EncoderCore._write_slice_header_common(
            self, bw, slice_type, qp,
            self.idr_pic_id if is_idr else -1, n_ref=1, first_mb=0)
        from ..entropy import cavlc_device as CD
        hb, hn = bw.get_unaligned()
        hv, hl = CD.header_elements(hb, hn, max_slots=32)
        hv_j, hl_j = jnp.asarray(hv), jnp.asarray(hl)

        fn = self._fn(slice_type == P.SLICE_TYPE_P, qp)
        qp_mb = jnp.full((self.S, self.mb_h, self.mb_w), qp, jnp.int32)
        lam = jnp.asarray(
            np.broadcast_to(C.LAMBDA_TAB[qp].astype(np.int32),
                            (self.S, self.mb_h, self.mb_w)))
        zero = jnp.zeros((), jnp.int32)
        if slice_type == P.SLICE_TYPE_P:
            ref4, refu, refv = self.refs
        else:
            # unused by the I branch; (S,) so the vmapped fn can map it
            ref4 = refu = refv = jnp.zeros((self.S,), jnp.int32)
        out = fn(fy, fu, fv, ref4, refu, refv, qp_mb, lam, qp,
                 hv_j, hl_j, zero, zero)
        for t in (out["bits"], out["ov"], out["stats"]):
            try:
                t.copy_to_host_async()
            except AttributeError:
                pass
        self.refs = out["planes"]
        self.last_recon = out["recon"]
        prev = self._finish_pending()
        self._pending = {"out": out, "slice_type": slice_type,
                         "is_idr": is_idr, "first": self.i_frame == 0}
        if is_idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        self.frame_num = (self.frame_num + 1) % (
            1 << self.sps.i_log2_max_frame_num)
        self.i_frame += 1
        return prev

    # ------------------------------------------------------------------
    def close(self) -> dict:
        tail = self._finish_pending()
        summary = {"frames": dict(self.frames),
                   "bytes": dict(self.bytes),
                   "mb_types": dict(self.mb_hist)}
        if tail is not None:
            summary["drained"] = True
        P.x264_log(self.param, P.LOG_INFO, f"batch summary {summary}")
        return summary
