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
            raise P.ValidationError("BatchEncoder is CAVLC-only "
                                    "(use Encoder for CABAC streams)")
        if p.rc.i_rc_method not in (P.RC_CQP, P.RC_CRF, P.RC_ABR):
            raise P.ValidationError("unknown rc method")
        if p.rc.i_vbv_buffer_size:
            raise P.ValidationError("BatchEncoder has no VBV")
        if p.rc.i_aq_mode != P.AQ_NONE and p.rc.f_aq_strength > 0:
            raise P.ValidationError("BatchEncoder has no AQ")
        if max(1, p.i_slice_count) != 1 or p.i_slice_max_mbs \
                or p.i_slice_max_size:
            raise P.ValidationError("BatchEncoder is single-slice")
        if p.i_frame_reference != 1:
            raise P.ValidationError("BatchEncoder uses 1 reference")
        if p.analyse.i_noise_reduction:
            raise P.ValidationError("BatchEncoder has no NR")
        self.S = int(n_streams)
        self.sps = SPS.init(p, p.i_sps_id)
        self.pps = PPS.init(p, self.sps, p.i_sps_id)
        self.mb_w = self.sps.i_mb_width
        self.mb_h = self.sps.i_mb_height
        # v2: per-stream rate control (CRF/ABR) — RC scalars are host
        # floats, one RateControl per stream, frame SATD estimated by a
        # batched lowres cost pass (the slicetype machinery, lockstep
        # GOP so only the cost is needed). RC end-update runs one slot
        # late (when the slot's payload is pulled) to preserve the
        # device/host pipeline overlap — the same delayed-feedback shape
        # as x264's frame threading (ratecontrol.c thread_frames).
        self.per_stream_rc = p.rc.i_rc_method != P.RC_CQP
        self.rcs = [RateControl(p, self.mb_w * self.mb_h)
                    for _ in range(self.S if self.per_stream_rc else 0)]
        self.prev_low4 = None
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

    def _fn(self, is_p: bool, qp: int, per_stream: bool = False):
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
            batched=True, per_stream_qp=per_stream)

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
        if self.per_stream_rc:
            # delayed RC feedback (one slot late, see __init__ comment)
            for s, nl in enumerate(out_nals):
                sbits = sum(len(n.payload) for n in nl) * 8
                self.rcs[s].end(slice_type, sbits)
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
        from ..entropy import cavlc_device as CD
        qmin = p.rc.i_qp_min
        qmax = min(p.rc.i_qp_max, P.QP_MAX_SPEC)
        if is_idr:
            self.frame_num = 0
        if self.per_stream_rc:
            # v2 CRF/ABR: per-stream frame SATD from one batched lowres
            # cost pass (x264_rc_analyse_slice twin, slicetype.c:605),
            # per-stream QP + slice header; GOP stays lockstep
            import jax
            from ..ops import mc as MC
            from .slicetype import _summary_fn
            low4_b = jax.vmap(MC.lowres_planes)(fy)
            do_edges = bool(p.rc.b_mb_tree or p.rc.i_vbv_buffer_size
                            or self.mb_w <= 2 or self.mb_h <= 2)
            sf = _summary_fn(self.mb_w, self.mb_h, do_edges)
            prev = (self.prev_low4 if (not is_idr
                                       and self.prev_low4 is not None)
                    else low4_b)
            vec = np.asarray(jax.vmap(sf)(low4_b[:, 0], prev))
            self.prev_low4 = low4_b
            satd = vec[:, 0] if is_idr else vec[:, 1]
            qps = np.array([
                int(np.clip(rc.start(slice_type, int(satd[s])),
                            qmin, qmax))
                for s, rc in enumerate(self.rcs)], np.int32)
            hvs, hls = [], []
            for s in range(self.S):
                bw = BitWriter()
                C.EncoderCore._write_slice_header_common(
                    self, bw, slice_type, int(qps[s]),
                    self.idr_pic_id if is_idr else -1, n_ref=1,
                    first_mb=0)
                hb, hn = bw.get_unaligned()
                hv, hl = CD.header_elements(hb, hn, max_slots=32)
                hvs.append(hv)
                hls.append(hl)
            hv_j = jnp.asarray(np.stack(hvs))
            hl_j = jnp.asarray(np.stack(hls))
            qp_np = np.broadcast_to(qps[:, None, None],
                                    (self.S, self.mb_h, self.mb_w))
            qp_mb = jnp.asarray(np.ascontiguousarray(qp_np))
            lam = jnp.asarray(np.ascontiguousarray(
                C.LAMBDA_TAB[qp_np].astype(np.int32)))
            qp_arg = jnp.asarray(qps)
            # the deblock no-op threshold (alpha/beta tables are zero
            # below qp+2*min(a0,b0) <= 15) is per-stream via eff QP; the
            # program-level gate uses the max so low-QP streams no-op
            fn = self._fn(slice_type == P.SLICE_TYPE_P, int(qps.max()),
                          per_stream=True)
        else:
            qp = int(np.clip(self.rc.start(slice_type, 0), qmin, qmax))
            # the slice header is shared by all streams (lockstep GOP)
            # and written by the SAME code path as the single-stream
            # Encoder (duck-typed unbound call)
            bw = BitWriter()
            C.EncoderCore._write_slice_header_common(
                self, bw, slice_type, qp,
                self.idr_pic_id if is_idr else -1, n_ref=1, first_mb=0)
            hb, hn = bw.get_unaligned()
            hv, hl = CD.header_elements(hb, hn, max_slots=32)
            hv_j, hl_j = jnp.asarray(hv), jnp.asarray(hl)
            qp_mb = jnp.full((self.S, self.mb_h, self.mb_w), qp,
                             jnp.int32)
            lam = jnp.asarray(
                np.broadcast_to(C.LAMBDA_TAB[qp].astype(np.int32),
                                (self.S, self.mb_h, self.mb_w)))
            qp_arg = qp
            fn = self._fn(slice_type == P.SLICE_TYPE_P, qp)
        zero = jnp.zeros((), jnp.int32)
        if slice_type == P.SLICE_TYPE_P:
            ref4, refu, refv = self.refs
        else:
            # unused by the I branch; (S,) so the vmapped fn can map it
            ref4 = refu = refv = jnp.zeros((self.S,), jnp.int32)
        out = fn(fy, fu, fv, ref4, refu, refv, qp_mb, lam, qp_arg,
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
