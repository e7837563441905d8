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

import functools
import math
import os

import numpy as np

from .. import params as P
from ..api import NAL, Picture
from ..entropy import cavlc
from ..entropy.bitstream import BitWriter, nal_unit
from ..ops.golden import BLOCK_IDX_X, BLOCK_IDX_Y
from ..ops.tables import CHROMA_QP_TABLE
from ..ops import deblock as DB
from ..ops import mc as MC
from .sets import (PPS, SPS, filler_rbsp, sei_buffering_period_rbsp,
                   sei_pic_timing_rbsp)
from .ratecontrol import RateControl
from .slicetype import SlicetypeDecider
from . import intra_frame, inter_frame

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


# device CAVLC payload cap: H.264's worst-case CAVLC MB is ~3200 bits
# (all-escape levels); 512 B/MB is generous headroom. Overshoot is
# detected (total_bits > cap) and falls back to the host writers.
_DEV_PAYLOAD_BYTES_PER_MB = 512


@functools.lru_cache(maxsize=None)
def _device_payload_fn(is_p: bool, mb_h: int, mb_w: int, n_ref: int,
                       cap_bytes: int):
    """Jitted device CAVLC slice-payload packer (entropy/cavlc_device):
    the API-path twin of the bench pipeline's device entropy stage. One
    compile per (slice kind, geometry, ref count); the slice QP and the
    header bits are traced so RC/AQ steps don't recompile."""
    import jax
    from ..entropy import cavlc_device as CD

    if is_p:
        def f(syn, qp_mb, slice_qp, hv, hl):
            return CD.cavlc_p_payload(syn, qp_mb, slice_qp, n_ref,
                                      mb_h, mb_w, hv, hl, cap_bytes,
                                      with_rows=True)
    else:
        def f(syn, qp_mb, slice_qp, hv, hl):
            return CD.cavlc_i_payload(syn, qp_mb, slice_qp, mb_h, mb_w,
                                      hv, hl, cap_bytes, with_rows=True)
    return jax.jit(f)


# syn keys the device payload packers consume (entropy/cavlc_device.py)
_DEV_SYN_P = ("partition", "ref", "cbp_luma", "cbp_chroma", "mv8",
              "luma_levels", "chroma_dc_levels", "chroma_ac_levels")
_DEV_SYN_I = ("mb_type", "i16_mode", "i4_modes", "chroma_mode",
              "cbp_luma", "cbp_chroma", "nz_luma_dc", "luma_levels",
              "luma_dc_levels", "chroma_dc_levels", "chroma_ac_levels")

# big per-frame tensors that stay device-resident on the device-entropy
# path (the payload consumes them on device; recon feeds the reference
# update on device; none is read host-side unless a fallback fires)
_DEV_KEEP = frozenset({"recon_y", "recon_u", "recon_v", "luma_levels",
                       "chroma_ac_levels", "chroma_dc_levels",
                       "luma_dc_levels", "bs"})

# block-granular syntax wire (inter_frame.pack_syn_blocks[_i]) for
# frames whose entropy runs in the HOST writers (CABAC; or CAVLC with
# device entropy disabled): one small dense buffer + one 12-byte entry
# per coded 4x4 block replace the multi-MB level tensors on the wire.
# Everything the wire reconstructs stays device-resident.
_WIRE_SYN = ("mv8", "partition", "ref", "cbp_luma", "cbp_chroma",
             "chroma_dc_levels", "luma_levels", "chroma_ac_levels")
_WIRE_KEEP = frozenset(_WIRE_SYN) | frozenset(
    {"recon_y", "recon_u", "recon_v", "bs", "mv", "luma_nnz",
     "chroma_nnz_ac", "chroma_nz_dc"})
_WIRE_SYN_I = ("mb_type", "i16_mode", "i4_modes", "chroma_mode",
               "cbp_luma", "cbp_chroma", "nz_luma_dc", "luma_dc_levels",
               "chroma_dc_levels", "luma_levels", "chroma_ac_levels")
_WIRE_KEEP_I = frozenset(_WIRE_SYN_I) | frozenset(
    {"recon_y", "recon_u", "recon_v", "luma_nnz", "chroma_nnz_ac",
     "chroma_nz_dc"})


@functools.lru_cache(maxsize=None)
def _syn_wire_fn(mb_h: int, mb_w: int, is_p: bool = True):
    """Jitted block-granular syntax pack (one compile per geometry)."""
    import jax
    from . import inter_frame

    def f(syn):
        pack = (inter_frame.pack_syn_blocks if is_p
                else inter_frame.pack_syn_blocks_i)
        return pack(syn, mb_w, mb_h)
    return jax.jit(f)


# P_SKIP is partition 0; names index the partition stats histogram
_PART_NAMES = ("P_L0", "P_16x8", "P_8x16", "P_8x8")


@functools.lru_cache(maxsize=None)
def _fused_frame_fn(is_p: bool, mb_h: int, mb_w: int, n_ref: int, cqm,
                    me_range: int, mv_range: int, dct_decimate: bool,
                    me_method: int, fast_pskip: bool, partitions: bool,
                    subme: int, use_satd: bool, i4x4: bool,
                    deblock_on: bool, dbl_a2: int, dbl_b2: int,
                    cqpo: int, cap_bytes: int, use_nr: bool,
                    need_recon: bool, donate: bool, batched: bool = False,
                    per_stream_qp: bool = False):
    """ONE jitted dispatch for a whole API-path frame: encode + deblock
    strengths + device CAVLC slice payload + in-loop deblock + hpel
    reference pyramid + on-device stats histograms. This is the
    collapse of the former 3-dispatch / ~20-pull flow onto the bench
    pipeline's shape (x264's only path is its fast path, x264.c:145):
    the host pulls just the payload (exact size), four scalars/rows
    vectors and one small stats vector per frame; the reference planes
    never leave the device.

    Returns a dict: payload/bits/ov (+n_skip, rows), ref planes
    (ref4, refu, refv), stats (int32 vector), and the deblocked recon
    (uint8) only when need_recon (PSNR/SSIM accounting is on)."""
    import jax
    import jax.numpy as jnp
    from ..entropy import cavlc_device as CD
    from ..ops import deblock as DBo
    from ..ops import mc as MCo
    from . import intra_frame as IFRA

    cqp_tab = CHROMA_QP_TABLE

    def eff_qp_scan(syn, qp_mb, slice_qp, is_i):
        cbp_any = (syn["cbp_luma"] | syn["cbp_chroma"]) != 0
        if is_i:
            is_i16 = syn["mb_type"] == 0
            ext = ((syn["nz_luma_dc"] != 0)
                   | (syn["chroma_nz_dc"] != 0).any(-1))
            coded = jnp.where(is_i16, cbp_any | ext, cbp_any)
        else:
            coded = cbp_any
        flat = qp_mb.ravel()
        m = coded.ravel()
        idx = jnp.where(m, jnp.arange(m.shape[0]), -1)
        run = jax.lax.cummax(idx)
        eff = jnp.where(run >= 0, flat[jnp.maximum(run, 0)], slice_qp)
        return eff.reshape(qp_mb.shape).astype(jnp.int32)

    def hist(x, n):
        return (x.reshape(-1)[:, None]
                == jnp.arange(n)[None, :]).sum(0).astype(jnp.int32)

    def f(fy, fu, fv, ref4, refu, refv, qp_mb, lam_mb, slice_qp, hv, hl,
          nr_y, nr_c):
        qpc_mb = jnp.asarray(cqp_tab)[jnp.clip(qp_mb + cqpo, 0, 51)] \
            .astype(jnp.int32)
        if is_p:
            syn = inter_frame.encode_p_frame.__wrapped__(
                fy, fu, fv, ref4, refu, refv, qp_mb, qpc_mb, lam_mb,
                mb_w=mb_w, mb_h=mb_h, me_range=me_range,
                mv_range=mv_range, dct_decimate=dct_decimate,
                me_method=me_method, fast_pskip=fast_pskip,
                partitions=partitions, n_ref=n_ref, subme=subme,
                cqm=cqm, nr_offset=(nr_y, nr_c) if use_nr else None)
            sub = {k: syn[k] for k in _DEV_SYN_P}
            payload, bits, n_skip, ov, rows = CD.cavlc_p_payload(
                sub, qp_mb, slice_qp, n_ref, mb_h, mb_w, hv, hl,
                cap_bytes, with_rows=True)
            stats = jnp.concatenate([
                n_skip[None].astype(jnp.int32),
                hist(syn["partition"], 4),
                hist(syn["ref"], P.REF_MAX)])
        else:
            syn = IFRA.encode_i_frame_best(
                fy, fu, fv, qp_mb, qpc_mb, lam_mb, mb_w=mb_w, mb_h=mb_h,
                use_satd=use_satd, i4x4_enabled=i4x4, cqm=cqm)
            sub = {k: syn[k] for k in _DEV_SYN_I}
            payload, bits, ov, rows = CD.cavlc_i_payload(
                sub, qp_mb, slice_qp, mb_h, mb_w, hv, hl, cap_bytes,
                with_rows=True)
            n_skip = jnp.zeros((), jnp.int32)
            is_i4 = syn["mb_type"] == 1
            stats = jnp.concatenate([
                is_i4.sum()[None].astype(jnp.int32),
                hist(jnp.where(is_i4, 7, syn["i16_mode"]), 7),
                hist(jnp.where(is_i4[..., None], syn["i4_modes"],
                               12).reshape(-1), 12),
                hist(syn["chroma_mode"], 7),
                jnp.stack([(syn["cbp_luma"] != 0).sum(),
                           (syn["cbp_chroma"] >= 1).sum(),
                           (syn["cbp_chroma"] == 2).sum()]
                          ).astype(jnp.int32)])
        # in-loop deblock + hpel pyramid (x264_fdec_filter_row +
        # x264_frame_filter, full-frame)
        if deblock_on:
            if is_p:
                bs, feo = syn["bs"], syn["feo"]
                intra_mb = jnp.zeros((mb_h, mb_w), jnp.int32)
                mode = "none"
            else:
                bs = jnp.full((mb_h, mb_w, 2, 4, 4), 3, jnp.int32)
                feo = jnp.zeros((mb_h, mb_w), jnp.int32)
                intra_mb = jnp.ones((mb_h, mb_w), jnp.int32)
                mode = "all"
            eff = eff_qp_scan(syn, qp_mb, slice_qp, not is_p)
            eff_c = jnp.asarray(cqp_tab)[jnp.clip(eff + cqpo, 0, 51)] \
                .astype(jnp.int32)
            dy, du, dv = DBo.deblock_frame(
                syn["recon_y"], syn["recon_u"], syn["recon_v"], bs,
                intra_mb, feo, eff, eff_c, dbl_a2, dbl_b2,
                mb_w=mb_w, mb_h=mb_h, intra_mode=mode)
        else:
            dy, du, dv = syn["recon_y"], syn["recon_u"], syn["recon_v"]
        out = dict(payload=payload, bits=bits, ov=ov, n_skip=n_skip,
                   rows=rows, stats=stats,
                   recon=(dy.astype(jnp.uint8), du.astype(jnp.uint8),
                          dv.astype(jnp.uint8)))
        if split_refs:
            out["_dbl"] = (dy, du, dv)
        else:
            out["planes"] = (MCo.make_ref_planes(dy),
                             MCo.pad_chroma(du), MCo.pad_chroma(dv))
        return out

    def refs_fn(dy, du, dv):
        return (MCo.make_ref_planes(dy), MCo.pad_chroma(du),
                MCo.pad_chroma(dv))

    # On the TPU backend the 4-stage fusion (encode + deblock + device
    # CAVLC + hpel reference pyramid) compiles but FAULTS the TPU worker
    # at execution (r5: reproduced 3x at 1080p; every 3-stage subset
    # runs clean). Until the Mosaic/XLA interaction is isolated, the
    # hpel pyramid runs as a second jit fed the deblocked planes —
    # dispatch overhead only, the planes never visit the host. CPU
    # (tests, dryrun_multichip) keeps the single fused program.
    split_refs = jax.default_backend() not in ("cpu",)

    # donating the old ref pyramid only pays in the fused program (the
    # new planes are written in place); in split mode jit_f has no
    # matching outputs and the donation would just warn
    donate_args = (3, 4, 5) if (is_p and donate and not split_refs) else ()
    if batched:
        # stream-batched variant (BatchEncoder): frames/refs/QP grids
        # carry a leading stream axis; the slice QP, header bits and NR
        # offsets are shared (lockstep GOP => identical headers). With
        # per_stream_qp (BatchEncoder v2 CRF/ABR) the slice QP and the
        # pre-packed header elements are per-stream too.
        qax = 0 if per_stream_qp else None
        f = jax.vmap(f, in_axes=(0, 0, 0, 0, 0, 0, 0, 0,
                                 qax, qax, qax, None, None))
        refs_fn = jax.vmap(refs_fn)
    jit_f = jax.jit(f, donate_argnums=donate_args)
    if not split_refs:
        return jit_f
    # no donation: the deblocked planes can't alias the padded/pyramid
    # outputs (different shapes), donating would only warn
    jit_refs = jax.jit(refs_fn)

    def two_dispatch(*args):
        out = jit_f(*args)
        out = dict(out)
        out["planes"] = jit_refs(*out.pop("_dbl"))
        return out
    return two_dispatch


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
        # per-type PSNR accumulators (h->stat.f_psnr_mean_*, encoder.c
        # :2198-2209) and ref/pred-mode histograms (:2262-2367)
        self.ssd_type = {P.SLICE_TYPE_I: np.zeros(3, np.int64),
                         P.SLICE_TYPE_P: np.zeros(3, np.int64)}
        self.pixels_type = {P.SLICE_TYPE_I: np.zeros(3, np.int64),
                            P.SLICE_TYPE_P: np.zeros(3, np.int64)}
        self.i_mb_count_ref = np.zeros(P.REF_MAX, np.int64)
        self.i16_modes = np.zeros(7, np.int64)
        self.i4_modes = np.zeros(12, np.int64)
        self.chroma_modes = np.zeros(7, np.int64)
        self.cbp_coded = np.zeros(3, np.int64)  # y, uvDC, uvAC (intra)
        self.cbp_mbs = 0
        self.f_ssim = 0.0
        self.i_ssim_cnt = 0

    def summary(self) -> dict:
        out = {"frames": dict(self.i_frame_count),
               "bytes": dict(self.i_frame_size),
               "mb_types": dict(self.i_mb_count)}
        with np.errstate(divide="ignore"):
            psnr = [float(10 * np.log10(255.0 ** 2 * p / s)) if s else float("inf")
                    for s, p in zip(self.ssd, self.pixels)]
        if self.pixels[0]:
            out["psnr_yuv"] = psnr
        if self.i_mb_count_ref.sum():
            out["ref_histogram"] = self.i_mb_count_ref.tolist()
        out["psnr_yuv_by_type"] = {
            t: [float(10 * np.log10(255.0 ** 2 * px / s)) if s else
                float("inf")
                for s, px in zip(self.ssd_type[t], self.pixels_type[t])]
            for t in self.ssd_type if self.pixels_type[t][0]}
        if self.i_ssim_cnt:
            out["ssim_y"] = self.f_ssim / self.i_ssim_cnt
        return out


class EncoderCore:
    def __init__(self, param: P.Param):
        self.param = P.validate_parameters(param)
        p = self.param
        self.sps = SPS.init(p, p.i_sps_id)
        self.pps = PPS.init(p, self.sps, p.i_sps_id)
        self.mb_w = self.sps.i_mb_width
        self.mb_h = self.sps.i_mb_height

        # rate control + lookahead slice-type decision
        self.rc = RateControl(p, self.mb_w * self.mb_h)
        self.slicetype = SlicetypeDecider(p)

        # lookahead frame queue (x264_lookahead_t next list,
        # lookahead.c:59-115): frames are buffered for i_delay inputs
        # when VBV lookahead planning is on (frames.i_delay =
        # max(i_bframe, rc_lookahead) gated on mb_tree/vbv,
        # encoder.c:505-517; the fork has no B-frames)
        self.la_next: list[dict] = []
        self.frames_input = 0
        self.frames_delay = (p.rc.i_lookahead
                             if p.rc.i_vbv_buffer_size > 0 else 0)

        # mbcmp selection (encoder.c:412: satd unless subme <= 1)
        # SATD for intra mbcmp except subme 0 (mbcmp_init, encoder.c:412-423)
        self.use_satd = p.analyse.i_subpel_refine > 0
        self.i4x4_enabled = bool(p.analyse.intra & P.ANALYSE_I4x4)

        self.i_frame = 0          # input frame counter
        self.frame_num = 0        # frame_num syntax element
        self.idr_pic_id = 0
        self._cpb_delay = 0       # pic-timing SEI ticks since IDR

        # CQM key for the device pipelines: None = flat (table globals),
        # else a hashable tuple of 4 scaling lists (jit static arg)
        from ..ops import tables as TB
        if p.i_cqm_preset == P.CQM_JVT:
            self.cqm = TB.CQM_JVT_LISTS
        elif p.i_cqm_preset == P.CQM_CUSTOM:
            self.cqm = tuple(tuple(int(v) for v in l)
                             for l in (p.cqm_4iy, p.cqm_4py,
                                       p.cqm_4ic, p.cqm_4pc))
        else:
            self.cqm = None

        # open-time logging (encoder.c:624-631 profile/level line)
        profile = "Main" if p.b_cabac else "Constrained Baseline"
        P.x264_log(p, P.LOG_INFO,
                   f"profile {profile}, level "
                   f"{p.i_level_idc // 10}.{p.i_level_idc % 10}")
        P.x264_log(p, P.LOG_DEBUG, "options: " + P.param2string(p, True))
        self.stats = Stats()
        self.last_recon = None    # (y, u, v) np arrays (deblocked output)
        # DPB (x264_reference_build order: nearest first, encoder.c:813):
        # list of dicts {planes: (ref4_y, ref_u_pad, ref_v_pad),
        # frame_idx, corrupt}. in-band recovery (c): per-frame b_corrupt
        # (common/frame.h:188) — corrupt entries are skipped when the
        # active reference list is built (encoder.c:825-826) and an IDR
        # is forced only when no valid reference remains
        # (encoder.c:1808-1820).
        self.dpb: list = []

        # slice-level deblock decision (x264_slice_header_init,
        # encoder.c:1040-1046)
        self.deblock_a = p.i_deblocking_filter_alphac0
        self.deblock_b = p.i_deblocking_filter_beta

        # noise reduction (denoise_dct, common/quant.c:194): per-coef
        # |level| accumulators [cat 0 luma / cat 2→1 chroma] and the
        # derived offsets. The fork zero-inits nr_offset_denoise and
        # dropped the updater, so its denoise_dct subtracts 0; we
        # restore upstream x264's between-frame offset update so
        # i_noise_reduction > 0 actually denoises.
        self.nr = None
        if p.analyse.i_noise_reduction:
            self.nr = {"sum": np.zeros((2, 16), np.int64),
                       "count": np.zeros(2, np.int64),
                       "offset": np.zeros((2, 16), np.int32)}

        # per-row bits of the last single-slice native entropy pass
        # (i_row_bits twin; feeds the row-VBV walk)
        self._row_bits = None

        # device CAVLC entropy stage on the API path (the bench
        # pipeline's wire, entropy/cavlc_device.py): the slice payload
        # itself crosses the wire instead of the per-MB syntax tensors.
        # Default ON on TPU (where the syntax pull dominates), OFF on
        # CPU (the native C++ writers are instant and per-geometry jit
        # compiles would dominate CI); X264_DEVICE_ENTROPY=1/0 forces.
        env = os.environ.get("X264_DEVICE_ENTROPY")
        self._dev_entropy = None if env is None else env == "1"
        self._dev_wire = None
        # block-granular syntax wire for host-writer P frames (CABAC):
        # same default rule as the device entropy stage
        env = os.environ.get("X264_SYN_WIRE")
        self._syn_wire = None if env is None else env == "1"
        # optimistic reference update dispatched before host entropy
        self._pending_ref = None
        # device-resident memo for per-frame constant uploads
        # (SINGLESTREAM_r05.json: ~76 h2d RPCs/frame at ~24 ms each on
        # the tunneled rig are the single-stream fps floor; the QP /
        # chroma-QP / lambda MB grids and the slice-QP scalars are flat
        # per frame under CQP/CRF-without-AQ, so their device buffers
        # are reusable across frames and re-encode attempts)
        self._dev_memo: dict = {}

    def _dev_const(self, arr):
        """Upload a small host array or scalar, memoized when it is
        constant-valued. Values are QP-like (<= 52 distinct per shape);
        the memo is cleared if it ever exceeds 512 entries. Non-flat
        arrays (AQ maps, row-VBV ramps) upload fresh — correctness
        never depends on a hit. The constructor is jnp.asarray either
        way, so dtype/weak-type semantics match the uncached path."""
        import jax.numpy as jnp
        if isinstance(arr, (int, np.integer)):
            key = ("pyint", int(arr))
            hit = self._dev_memo.get(key)
            if hit is None:
                if len(self._dev_memo) > 512:
                    self._dev_memo.clear()
                hit = self._dev_memo[key] = jnp.asarray(int(arr))
            return hit
        a = np.asarray(arr)
        if a.size and (a == a.flat[0]).all():
            key = (a.shape, a.dtype.str, a.flat[0].item())
            hit = self._dev_memo.get(key)
            if hit is None:
                if len(self._dev_memo) > 512:
                    self._dev_memo.clear()
                hit = self._dev_memo[key] = jnp.asarray(a)
            return hit
        return jnp.asarray(a)

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
        opts = P.param2string(self.param)
        payload = bytes(16) + (
            "x264dsp_tpu 0.1 - TPU-native H.264 encoder - options: "
            + opts).encode() + b"\x00"
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
    def _band_syn(self, syn, qp_mb, band):
        """Row-slice the syntax dict for one slice band. Returns
        (syn_band, qp_mb_band, mb_h_band, first_mb)."""
        if band is None:
            return syn, qp_mb, self.mb_h, 0
        y0, y1 = band
        out = {k: v[y0:y1] for k, v in syn.items()
               if hasattr(v, "shape") and len(v.shape) >= 2
               and v.shape[0] == self.mb_h and v.shape[1] == self.mb_w}
        qpb = None if qp_mb is None else qp_mb[y0:y1]
        return out, qpb, y1 - y0, y0 * self.mb_w

    def _slice_ranges(self):
        """Row-aligned slice bands from i_slice_count / i_slice_max_mbs
        (x264 distributes slices evenly; ours are MB-row granular — the
        device bands make row 0 of each band the slice boundary)."""
        p = self.param
        n = max(1, p.i_slice_count)
        if p.i_slice_max_mbs:
            rows = max(1, p.i_slice_max_mbs // self.mb_w)
            n = max(n, -(-self.mb_h // rows))
        n = min(n, self.mb_h)
        bounds = [round(i * self.mb_h / n) for i in range(n + 1)]
        return [(bounds[i], bounds[i + 1]) for i in range(n)
                if bounds[i + 1] > bounds[i]]

    def _deblock_enabled(self, qp: int) -> bool:
        p = self.param
        thresh = qp + 2 * min(p.i_deblocking_filter_alphac0,
                              p.i_deblocking_filter_beta)
        return bool(p.b_deblocking_filter and thresh > 15)

    def _detect_cavlc_overflow(self, syn, slice_type) -> np.ndarray:
        """Per-MB CAVLC level-code overflow detection (cavlc.c:56-60:
        escape level_code >= 1<<12 below High profile). Cheap magnitude
        screen, then the exact writer state machine on suspect MBs only.
        Returns a (mb_h, mb_w) bool grid."""
        mb_h, mb_w = self.mb_h, self.mb_w
        flagged = np.zeros((mb_h, mb_w), bool)
        # minimum |level| that can escape with level_code >= 1<<12 is
        # > 2^11; screen generously at 256
        suspects = np.abs(syn["luma_levels"]).max(axis=(-1, -2)) >= 256
        suspects |= np.abs(syn["chroma_dc_levels"]).max(axis=(-1, -2)) >= 256
        suspects |= np.abs(syn["chroma_ac_levels"]).max(
            axis=(-1, -2, -3)) >= 256
        if "luma_dc_levels" in syn:
            suspects |= np.abs(syn["luma_dc_levels"]).max(axis=-1) >= 256
        if not suspects.any():
            return flagged

        def block_ov(levels, chroma_dc=False):
            bw = BitWriter()
            _, ov = cavlc.write_block_residual(bw, levels, 0,
                                               chroma_dc=chroma_dc)
            return ov

        is_i = slice_type == P.SLICE_TYPE_I
        for mby, mbx in zip(*np.nonzero(suspects)):
            ov = False
            cbp_luma = int(syn["cbp_luma"][mby, mbx])
            is_i16 = is_i and syn["mb_type"][mby, mbx] == 0
            for i in range(16):
                lv = syn["luma_levels"][mby, mbx, i]
                if is_i16:
                    if cbp_luma:
                        ov |= block_ov(lv[1:])
                elif cbp_luma & (1 << (i >> 2)):
                    ov |= block_ov(lv)
            if is_i16:
                ov |= block_ov(syn["luma_dc_levels"][mby, mbx])
            cbp_chroma = int(syn["cbp_chroma"][mby, mbx])
            if cbp_chroma:
                for ch in range(2):
                    ov |= block_ov(syn["chroma_dc_levels"][mby, mbx, ch],
                                   chroma_dc=True)
                if cbp_chroma == 2:
                    for ch in range(2):
                        for i in range(4):
                            ov |= block_ov(
                                syn["chroma_ac_levels"][mby, mbx, ch, i, 1:])
            flagged[mby, mbx] = ov
        return flagged

    def _decoded_qp(self, syn, slice_type, qp_mb, slice_qp):
        """Per-MB QP as the decoder reconstructs it: MBs that emit no
        qp_delta inherit the running QP (x264_macroblock_cache_save,
        common/macroblock.c:747-751). Host raster carry-scan."""
        cbp_any = (syn["cbp_luma"] | syn["cbp_chroma"]) != 0
        if slice_type == P.SLICE_TYPE_I:
            is_i16 = syn["mb_type"] == 0
            ext = (syn["nz_luma_dc"] != 0) | (syn["chroma_nz_dc"] != 0).any(-1)
            coded = np.where(is_i16, cbp_any | ext, cbp_any)
        else:
            coded = cbp_any
        flat = np.broadcast_to(qp_mb, coded.shape).ravel()
        m = coded.ravel()
        idx = np.where(m, np.arange(flat.size), -1)
        run = np.maximum.accumulate(idx)
        eff = np.where(run >= 0, flat[np.maximum(run, 0)], slice_qp)
        return eff.reshape(coded.shape).astype(np.int32)

    def _nr_update(self, syn):
        """Between-frame noise-reduction offset update (upstream x264's
        x264_noise_reduction_update; the fork kept denoise_dct +
        nr_residual_sum accumulation, quant.c:194 / macroblock.c:183,393,
        but lost the updater). offset = (nr·count + sum/2) / (sum+1),
        with the sliding-window halving at 2^18 samples."""
        nr = self.nr
        nr["sum"][0] += syn["nr_sum_y"]
        nr["sum"][1] += syn["nr_sum_c"]
        nr["count"] += syn["nr_count"]
        strength = self.param.analyse.i_noise_reduction
        for cat in range(2):
            if nr["count"][cat] > (1 << 18):
                nr["sum"][cat] >>= 1
                nr["count"][cat] >>= 1
            nr["offset"][cat] = ((strength * nr["count"][cat]
                                  + nr["sum"][cat] // 2)
                                 // (nr["sum"][cat] + 1)).astype(np.int32)
        # the DC position is never denoised in the reference layout
        # (offset[0] applies to coef 0 pre-extraction; x264 zeroes it)
        nr["offset"][:, 0] = 0

    def _decoded_qp_dev(self, syn, slice_type, qp_mb, slice_qp):
        """Device twin of _decoded_qp: same raster carry-scan over the
        not-yet-pulled syntax tensors (cummax of coded indices)."""
        import jax
        import jax.numpy as jnp
        cbp_any = (jnp.asarray(syn["cbp_luma"])
                   | jnp.asarray(syn["cbp_chroma"])) != 0
        if slice_type == P.SLICE_TYPE_I:
            is_i16 = jnp.asarray(syn["mb_type"]) == 0
            ext = ((jnp.asarray(syn["nz_luma_dc"]) != 0)
                   | (jnp.asarray(syn["chroma_nz_dc"]) != 0).any(-1))
            coded = jnp.where(is_i16, cbp_any | ext, cbp_any)
        else:
            coded = cbp_any
        flat = jnp.broadcast_to(jnp.asarray(qp_mb), cbp_any.shape).ravel()
        m = coded.ravel()
        idx = jnp.where(m, jnp.arange(m.shape[0]), -1)
        run = jax.lax.cummax(idx)
        eff = jnp.where(run >= 0, flat[jnp.maximum(run, 0)], slice_qp)
        return eff.reshape(cbp_any.shape).astype(jnp.int32)

    def _compute_reference(self, recon_y, recon_u, recon_v, syn,
                           slice_type, qp, qp_mb, on_device=False):
        """Pure compute half of the reference update: deblock + hpel
        pyramid. No DPB mutation. With on_device=True the decoded-QP
        carry-scan runs on device from the un-pulled syntax tensors so
        the whole chain can be dispatched before any host sync."""
        import jax.numpy as jnp
        p = self.param
        mb_w, mb_h = self.mb_w, self.mb_h
        if self._deblock_enabled(qp):
            if slice_type == P.SLICE_TYPE_I:
                intra = np.ones((mb_h, mb_w), np.int32)
                bs = np.full((mb_h, mb_w, 2, 4, 4), 3, np.int32)
                feo = np.zeros((mb_h, mb_w), np.int32)
            else:
                # strengths computed ON DEVICE inside encode_p_frame
                # (inter_frame.compute_strengths_p)
                intra = np.zeros((mb_h, mb_w), np.int32)
                bs = syn["bs"]
                feo = syn["feo"]
            # the deblocker sees the DECODED per-MB QP
            if on_device:
                eff_qp = self._decoded_qp_dev(syn, slice_type, qp_mb, qp)
                eff_qpc = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(
                    eff_qp + p.analyse.i_chroma_qp_offset, 0, 51)] \
                    .astype(jnp.int32)
            else:
                eff_qp = self._decoded_qp(syn, slice_type, qp_mb, qp)
                eff_qpc = CHROMA_QP_TABLE[np.clip(
                    eff_qp + p.analyse.i_chroma_qp_offset,
                    0, 51)].astype(np.int32)
            # filter offsets are 2x the signalled div2 values
            # (slice_header_init, encoder.c:1044-1046)
            # this fork codes no intra MBs in P frames, so the skew
            # kernel's static MB-boundary specialization always applies
            mode = "all" if slice_type == P.SLICE_TYPE_I else "none"
            dy, du, dv = DB.deblock_frame(
                recon_y, recon_u, recon_v, jnp.asarray(bs),
                jnp.asarray(intra), jnp.asarray(feo), jnp.asarray(eff_qp),
                jnp.asarray(eff_qpc),
                self.deblock_a * 2, self.deblock_b * 2, mb_w=mb_w,
                mb_h=mb_h, intra_mode=mode)
        else:
            dy, du, dv = (jnp.asarray(recon_y), jnp.asarray(recon_u),
                          jnp.asarray(recon_v))
        planes = (MC.make_ref_planes(dy), MC.pad_chroma(du),
                  MC.pad_chroma(dv))
        return dy, du, dv, planes

    def _dispatch_pending_ref(self, syn, slice_type, qp, qp_mb) -> None:
        """Optimistically dispatch the reference update for a just-
        encoded single-slice frame BEFORE the host pulls its syntax and
        runs entropy: the device computes deblock + hpel while the host
        writes the slice, instead of idling. If the attempt is rejected
        (VBV / CAVLC-overflow re-encode), the pending result is simply
        dropped (keyed by syn identity)."""
        try:
            res = self._compute_reference(
                syn["recon_y"], syn["recon_u"], syn["recon_v"], syn,
                slice_type, qp, qp_mb, on_device=True)
        except Exception:
            self._pending_ref = None
            return
        self._pending_ref = (id(syn), res)

    def _update_reference(self, recon_y, recon_u, recon_v, syn, slice_type,
                          qp, qp_mb, is_idr=None):
        """Deblock the reconstruction (x264_fdec_filter_row reborn as one
        full-frame wavefront), build the hpel reference pyramid
        (x264_frame_filter, common/mc.c:506), and commit it to the DPB."""
        pending = self._pending_ref
        self._pending_ref = None
        if pending is not None and pending[0] == id(syn):
            dy, du, dv, planes = pending[1]
        else:
            dy, du, dv, planes = self._compute_reference(
                recon_y, recon_u, recon_v, syn, slice_type, qp, qp_mb)
        # hpel pyramid into the DPB (x264_reference_update,
        # encoder.c:878-907; only IDR resets the list, :909-916 — a
        # non-IDR I frame is an ordinary reference frame)
        if is_idr or (is_idr is None and slice_type == P.SLICE_TYPE_I):
            self.dpb = []
        self.dpb.insert(0, {"planes": planes,
                            "frame_idx": self.i_frame - 1,
                            "frame_num": (self.frame_num - 1)
                            % (1 << self.sps.i_log2_max_frame_num),
                            "corrupt": False})
        del self.dpb[max(self.param.i_frame_reference, 1):]
        # cast to uint8 ON DEVICE before the pull: the int32 recon is
        # 4x the bytes on the wire (12 MB vs 3 MB per 1080p frame)
        out = []
        for v in (dy, du, dv):
            if not isinstance(v, np.ndarray):
                v = v.astype("uint8")
            out.append(v)
        for v in out:
            try:
                v.copy_to_host_async()
            except AttributeError:
                pass
        return tuple(np.asarray(v).astype(np.uint8) for v in out)

    def encode(self, pic: Picture | None):
        """x264_encoder_encode (encoder.c:1719): push the input frame
        through the lookahead queue, return the oldest decided frame's
        NALs — or ([], None) while the queue fills (encoder.c:1775-1781
        "waiting for filling of buffers") and on drained encode(None)."""
        if pic is not None:
            if type(pic.y).__module__.startswith("jax"):
                # device-resident ingest: no host round-trip; mod16 pad
                # on device (edge replicate, frame.c:423)
                import jax.numpy as jnp

                def padj(plane, mb):
                    h, w = plane.shape
                    H = ((h + mb - 1) // mb) * mb
                    W = ((w + mb - 1) // mb) * mb
                    if (H, W) == (h, w):
                        return plane
                    return jnp.pad(plane, ((0, H - h), (0, W - w)),
                                   mode="edge")
                fy = padj(pic.y, 16)
                fu = padj(pic.u, 8)
                fv = padj(pic.v, 8)
            else:
                fy = pad_mod16(np.asarray(pic.y, np.uint8), 16)
                fu = pad_mod16(np.asarray(pic.u, np.uint8), 8)
                fv = pad_mod16(np.asarray(pic.v, np.uint8), 8)
            # slice-type decision at put time (x264_lookahead_put_frame +
            # slicetype_analyse over the next list, lookahead.c:59,102):
            # types/costs of queued frames are known before the head
            # encodes, feeding the VBV lookahead planner
            slice_type, is_keyframe, frame_cost = self.slicetype.decide(fy)
            self.la_next.append(
                {"pic": pic, "fy": fy, "fu": fu, "fv": fv,
                 "slice_type": slice_type, "is_keyframe": is_keyframe,
                 "frame_cost": frame_cost,
                 # put-time snapshots consumed at pop time: the decider
                 # state has advanced past this frame by then
                 "row_costs": getattr(self.slicetype, "row_costs", None),
                 "st_idx": self.slicetype.frame_idx - 1})
            self.frames_input += 1
            if self.frames_input <= self.frames_delay:
                return [], None  # buffering (encoder.c:1775-1781)
        if not self.la_next:
            return [], None  # drained (x264_lookahead_is_empty)
        rec = self.la_next.pop(0)
        planned = [(r["slice_type"], r["frame_cost"])
                   for r in self.la_next]
        return self._encode_frame(rec, planned)

    def _encode_frame(self, rec: dict, planned: list[tuple[int, int]]):
        pic, fy, fu, fv = rec["pic"], rec["fy"], rec["fu"], rec["fv"]
        slice_type, is_keyframe = rec["slice_type"], rec["is_keyframe"]
        frame_cost = rec["frame_cost"]
        p = self.param
        # active reference list skips corrupt DPB entries
        # (x264_reference_build, encoder.c:825-826)
        valid_dpb = [e for e in self.dpb if not e["corrupt"]]
        if p.i_frame_packing == 5 and len(valid_dpb) > 1:
            # 3D one-view-per-frame: L0 orders by the view-pair distance
            # (x264_reference_distance, encoder.c:804-810; sort at
            # :833-853) so the same-view frame of each pair ranks first.
            # Stable sort = the reference's bubble sort over a
            # nearest-first array.
            cur = rec["st_idx"]
            valid_dpb.sort(key=lambda e: abs((cur & ~1)
                                             - (e["frame_idx"] & ~1))
                           + ((cur & 1) != (e["frame_idx"] & 1)))
        is_idr = is_keyframe
        if not is_keyframe and (pic.i_type == P.TYPE_IDR
                                or pic.b_keyframe
                                or not valid_dpb):
            # user-forced IDR, or no valid reference frames left → IDR
            # (encoder.c:1808-1820)
            slice_type, is_keyframe, is_idr = P.SLICE_TYPE_I, True, True
            self.slicetype.last_keyframe = rec["st_idx"]
        elif not is_keyframe and pic.i_type == P.TYPE_I:
            # user-forced I: promoted to IDR once keyint_min has elapsed
            # (closed GOP, slicetype.c:521-529); inside keyint_min it
            # stays a NON-IDR I slice — frame_num/DPB/GOP all continue
            gop = rec["st_idx"] - self.slicetype.last_keyframe
            if gop >= max(p.i_keyint_min, 1):
                slice_type, is_keyframe, is_idr = P.SLICE_TYPE_I, True, True
                self.slicetype.last_keyframe = rec["st_idx"]
            else:
                slice_type = P.SLICE_TYPE_I

        qp = self.rc.start(slice_type, frame_cost, planned=planned)
        if pic.i_qpplus1:
            qp = pic.i_qpplus1 - 1  # i_force_qp (ratecontrol.c:579-580)
        qp = int(np.clip(qp, p.rc.i_qp_min, p.rc.i_qp_max))
        # out-of-spec QPs (52-69) are an emergency-denoise mode in the
        # reference (analyse.c:338-346); clamp to the spec range for now
        qp = min(qp, P.QP_MAX_SPEC)

        # per-MB QP: variance AQ (x264_adaptive_quant_frame +
        # x264_ratecontrol_mb_qp, ratecontrol.c:241-300, 796-811)
        import jax.numpy as jnp
        if p.rc.i_aq_mode != P.AQ_NONE and p.rc.f_aq_strength > 0:
            from .ratecontrol import aq_offsets
            off = np.asarray(aq_offsets(
                jnp.asarray(fy), jnp.asarray(fu), jnp.asarray(fv),
                p.rc.f_aq_strength, self.mb_w, self.mb_h))
            qp_mb = np.clip(np.floor(qp + off + 0.5), p.rc.i_qp_min,
                            min(p.rc.i_qp_max, P.QP_MAX_SPEC)).astype(np.int32)
        else:
            qp_mb = np.full((self.mb_h, self.mb_w), qp, np.int32)

        n_ref_active = (min(len(valid_dpb), p.i_frame_reference)
                        if slice_type == P.SLICE_TYPE_P else 1)
        # when a corrupt entry was skipped, the encoder's list diverges
        # from the decoder's default order → signal an explicit
        # ref_pic_list_modification (x264_reference_check_reorder,
        # encoder.c:777-788; order built at :1013-1027)
        active = valid_dpb[:n_ref_active]
        self._ref_reorder = (slice_type == P.SLICE_TYPE_P
                             and (any(e["corrupt"] for e in self.dpb)
                                  # non-default order (frame_num must
                                  # descend for a P list,
                                  # x264_reference_check_reorder,
                                  # encoder.c:789-799)
                                  or any(active[i + 1]["frame_idx"]
                                         > active[i]["frame_idx"]
                                         for i in range(len(active) - 1))))
        self._active_refs = [e["frame_num"] for e in active]

        slices = self._slice_ranges()

        # device-entropy eligibility: CAVLC + whole-frame slice (CABAC
        # and multi-band slices keep the host writers). The slice header
        # is fixed for the frame and rides into the device packer as
        # (vals, lens) bit elements.
        dev_ent = self._dev_entropy
        if dev_ent is None:
            import jax
            dev_ent = jax.default_backend() == "tpu"
        use_wire = self._syn_wire
        if use_wire is None:
            import jax
            use_wire = jax.default_backend() == "tpu"
        dev_ent = dev_ent and not p.b_cabac
        # IDR resets frame_num BEFORE any slice header is built — the
        # device-entropy header is baked here, not at write_slice time
        # (a mid-stream IDR previously embedded the stale frame_num in
        # the device path's header)
        if is_idr:
            self.frame_num = 0
        dev_hdr = None
        if dev_ent:
            from ..entropy import cavlc_device as CD
            hbw = BitWriter()
            self._write_slice_header_common(
                hbw, slice_type, qp, self.idr_pic_id if is_idr else -1,
                n_ref=n_ref_active, first_mb=0)
            hb, hn = hbw.get_unaligned()
            hv, hl = CD.header_elements(hb, hn, max_slots=32)
            dev_hdr = (jnp.asarray(hv), jnp.asarray(hl),
                       (len(hb) - 1) * 8 + hn)

        # ---- fused fast path: one device dispatch for the whole frame
        # (encode + entropy + deblock + hpel refs), the bench pipeline's
        # shape as the PRODUCT path. Falls back to the multi-dispatch
        # flow below on entropy overflow (rare) or ineligible configs.
        if (dev_ent and len(slices) == 1 and p.i_slice_max_size == 0
                and os.environ.get("X264_FUSED", "1") != "0"):
            out = self._frame_fused(rec, slice_type, is_idr, qp, qp_mb,
                                    n_ref_active, valid_dpb, dev_hdr)
            if out is not None:
                return out

        def encode_band(qp_mb_cur, y0, y1, keep_device=frozenset()):
            """Encode MB rows [y0, y1) as an independent band (a slice:
            row 0 of the band is the slice top, so the device pipelines'
            row-0 unavailability IS the slice-boundary rule)."""
            qpb = qp_mb_cur[y0:y1]
            qpc_cur = CHROMA_QP_TABLE[np.clip(
                qpb + p.analyse.i_chroma_qp_offset,
                0, 51)].astype(np.int32)
            lam_cur = LAMBDA_TAB[qpb].astype(np.int32)
            mb_hb = y1 - y0
            qpb_d = self._dev_const(qpb)
            qpc_d = self._dev_const(qpc_cur)
            lam_d = self._dev_const(lam_cur)
            if slice_type == P.SLICE_TYPE_I:
                dev = intra_frame.encode_i_frame_best(
                    fy[y0 * 16:y1 * 16], fu[y0 * 8:y1 * 8],
                    fv[y0 * 8:y1 * 8], qpb_d, qpc_d, lam_d,
                    mb_w=self.mb_w, mb_h=mb_hb,
                    use_satd=self.use_satd, i4x4_enabled=self.i4x4_enabled,
                    cqm=self.cqm)
            else:
                n_ref = n_ref_active
                PAD = MC.PAD_MC

                def crop(r):
                    r4, ru, rv = r
                    if len(slices) == 1:
                        return r4, ru, rv
                    return (r4[:, y0 * 16:y1 * 16 + 2 * PAD],
                            ru[y0 * 8:y1 * 8 + PAD],
                            rv[y0 * 8:y1 * 8 + PAD])
                if n_ref == 1:
                    ref4, refu, refv = crop(valid_dpb[0]["planes"])
                else:
                    cropped = [crop(r["planes"])
                               for r in valid_dpb[:n_ref]]
                    ref4 = jnp.stack([r[0] for r in cropped])
                    refu = jnp.stack([r[1] for r in cropped])
                    refv = jnp.stack([r[2] for r in cropped])
                dev = inter_frame.encode_p_frame(
                    fy[y0 * 16:y1 * 16], fu[y0 * 8:y1 * 8],
                    fv[y0 * 8:y1 * 8], ref4, refu, refv, qpb_d, qpc_d,
                    lam_d,
                    mb_w=self.mb_w, mb_h=mb_hb,
                    me_range=p.analyse.i_me_range,
                    mv_range=p.analyse.i_mv_range,
                    dct_decimate=bool(p.analyse.b_dct_decimate),
                    # DIA/HEX = the reference's pattern walks (batched,
                    # decoupled MVP); UMH = exhaustive parallel argmin;
                    # ESA = exhaustive + exact-MVP wavefront
                    me_method=min(max(p.analyse.i_me_method, 0), 3),
                    fast_pskip=bool(p.analyse.b_fast_pskip),
                    partitions=bool(p.analyse.inter
                                    & P.ANALYSE_PSUB16x16),
                    n_ref=n_ref,
                    subme=min(max(p.analyse.i_subpel_refine, 0), 11),
                    cqm=self.cqm,
                    nr_offset=None if self.nr is None else
                    (jnp.asarray(self.nr["offset"][0]),
                     jnp.asarray(self.nr["offset"][1])))
            # overlap the per-tensor pulls: start every host copy
            # before blocking on the first (each np.asarray alone is a
            # serialized round-trip; on a high-latency link that's ~20
            # RPCs end to end). keep_device tensors never cross: the
            # device entropy stage consumes them in place.
            for k, v in dev.items():
                if k in keep_device:
                    continue
                try:
                    v.copy_to_host_async()
                except AttributeError:
                    pass
            return {k: (v if k in keep_device else np.asarray(v))
                    for k, v in dev.items()}

        def device_encode(qp_mb_cur):
            fast = dev_ent and len(slices) == 1
            wire = use_wire and not fast and len(slices) == 1
            wire_p = slice_type == P.SLICE_TYPE_P
            self._dev_wire = None
            self._pending_ref = None
            if len(slices) == 1:
                keep = (_DEV_KEEP if fast
                        else (_WIRE_KEEP if wire_p else _WIRE_KEEP_I)
                        if wire else frozenset())
                syn = encode_band(qp_mb_cur, 0, self.mb_h,
                                  keep_device=keep)
                if fast or wire:
                    # overlap: deblock + hpel run on device while the
                    # host pulls the wire and writes the slice
                    self._dispatch_pending_ref(syn, slice_type, qp,
                                               qp_mb_cur)
                if wire:
                    self._pull_syn_wire(syn, is_p=wire_p)
                if fast:
                    is_p = slice_type == P.SLICE_TYPE_P
                    keys = _DEV_SYN_P if is_p else _DEV_SYN_I
                    sub = {k: syn[k] for k in keys if k in syn}
                    cap = (_DEV_PAYLOAD_BYTES_PER_MB * self.mb_w
                           * self.mb_h + 4096)
                    cap = -(-cap // 4) * 4
                    fn = _device_payload_fn(is_p, self.mb_h, self.mb_w,
                                            n_ref_active, cap)
                    hv, hl, hbits = dev_hdr
                    out = fn(sub, self._dev_const(qp_mb_cur),
                             self._dev_const(qp), hv, hl)
                    if is_p:
                        payload, bits, n_skip, ov, rows = out
                    else:
                        payload, bits, ov, rows = out
                        n_skip = None
                    # overlap the scalar/meta pulls with whatever the
                    # host does next (the payload is pulled exact-size
                    # in _pull_device_slice once bits is known)
                    for t in (bits, ov, rows) + (
                            () if n_skip is None else (n_skip,)):
                        try:
                            t.copy_to_host_async()
                        except AttributeError:
                            pass
                    self._dev_wire = {
                        "payload": payload, "bits": bits, "ov": ov,
                        "rows": rows, "n_skip": n_skip, "hbits": hbits,
                        "cap": cap}
                return syn
            wire_keep = ((_WIRE_KEEP if wire_p else _WIRE_KEEP_I)
                         if use_wire else frozenset())
            bands = []
            for y0, y1 in slices:
                b = encode_band(qp_mb_cur, y0, y1, keep_device=wire_keep)
                if use_wire:
                    # per-band block-granular wire (same pack, band
                    # geometry); recon/strengths stay device until the
                    # overlapped conversion below
                    self._pull_syn_wire(b, is_p=wire_p, mb_h=y1 - y0)
                bands.append(b)
            if use_wire:
                for b in bands:
                    for v in b.values():
                        try:
                            v.copy_to_host_async()
                        except AttributeError:
                            pass
                bands = [{k: np.asarray(v) for k, v in b.items()}
                         for b in bands]
            # nr accumulators are frame totals: sum over bands
            syn = {k: (np.sum([b[k] for b in bands], axis=0)
                       if k.startswith("nr_") else
                       np.concatenate([b[k] for b in bands], axis=0))
                   for k in bands[0]}
            if slice_type == P.SLICE_TYPE_P:
                # band strengths miss cross-slice top edges; recompute
                # from the assembled syntax (deblocking crosses slice
                # boundaries at idc 0, common/deblock.c:341)
                bs, feo = inter_frame.compute_strengths_p(
                    jnp.asarray(syn["luma_nnz"]),
                    jnp.asarray(syn["cbp_luma"]),
                    jnp.asarray(syn["cbp_chroma"]),
                    jnp.asarray(syn["mv8"]), self.mb_w, self.mb_h,
                    ref_mb=jnp.asarray(syn["ref"]))
                syn["bs"] = np.asarray(bs)
                syn["feo"] = np.asarray(feo)
            return syn

        syn = device_encode(qp_mb)

        # -- in-band recovery (a): CAVLC level-code overflow →
        # re-encode the flagged MBs at raised QP (cavlc.c:56-60,
        # encoder.c:1560-1569; whole-frame kernel re-run, SURVEY §7.1).
        # The reference bumps one MB inline by +1 per retry; a whole-
        # frame re-run per +1 step would make adversarial content
        # (many MBs overflowing at staggered QPs) O(51) re-encodes, so
        # we step each flagged MB by the analytic estimate instead:
        # levels scale ~2^(-dqp/6), so dqp = ceil(6*log2(maxlev/1024))
        # brings the max |level| under the escape bound, then the exact
        # detector re-checks. Bounded: 8 estimated steps, then QP_MAX.
        if not p.b_cabac:
            for it in range(9):
                if self._dev_wire is not None:
                    # device packer: exact overflow flag + payload-cap
                    # check. Clean → keep the device wire; dirty →
                    # materialize the levels and fall back to the host
                    # analytic-bump loop + host writers for this frame.
                    w = self._dev_wire
                    if (not bool(np.asarray(w["ov"]))
                            and int(np.asarray(w["bits"])) <= w["cap"] * 8):
                        break
                    syn = {k: np.asarray(v) for k, v in syn.items()}
                    self._dev_wire = None
                flagged = self._detect_cavlc_overflow(syn, slice_type)
                if not flagged.any():
                    break
                if it == 8:
                    bump = np.where(flagged, P.QP_MAX_SPEC, 0)
                else:
                    maxlev = np.abs(syn["luma_levels"]).max(axis=(-1, -2))
                    maxlev = np.maximum(
                        maxlev,
                        np.abs(syn["chroma_dc_levels"]).max(axis=(-1, -2)))
                    maxlev = np.maximum(
                        maxlev,
                        np.abs(syn["chroma_ac_levels"]).max(axis=(-1, -2, -3)))
                    if "luma_dc_levels" in syn:
                        maxlev = np.maximum(
                            maxlev,
                            np.abs(syn["luma_dc_levels"]).max(axis=-1))
                    est = np.ceil(6.0 * np.log2(
                        np.maximum(maxlev, 1) / 1024.0)).astype(np.int64)
                    bump = np.where(flagged, np.maximum(est, 1), 0)
                qp_mb = np.minimum(qp_mb + bump, P.QP_MAX_SPEC)
                syn = device_encode(qp_mb)
        self._last_qp_mb = qp_mb
        self._last_syn = syn

        nals = []
        if p.b_repeat_headers and self.i_frame == 0:
            # in-band SPS/PPS on the FIRST frame only — the fork writes
            # them for i_frame == 0, not per keyframe, and its in-band
            # version-SEI write is compiled out (encoder.c:1916-1944;
            # the explicit x264_encoder_headers flow keeps the SEI)
            nals.extend(self.headers()[:2])
        if self.sps.vui_nal_hrd_present and is_idr:
            # buffering-period SEI on every IDR (set.c:577-597)
            delay, offset = self.rc.hrd_fullness(self.sps)
            nals.append(NAL(P.NAL_SEI, P.NAL_PRIORITY_DISPOSABLE,
                            nal_unit(P.NAL_SEI, P.NAL_PRIORITY_DISPOSABLE,
                                     sei_buffering_period_rbsp(
                                         self.sps, delay, offset))))
            # don't reset cpb delay for keyframes under intra refresh
            # (slicetype.c:383-386, encoder.c:1947)
            if not self.param.b_intra_refresh:
                self._cpb_delay = 0
        if (self.sps.vui_nal_hrd_present
                or self.sps.vui_pic_struct_present):
            # pic-timing SEI per frame (set.c:599-630)
            nals.append(NAL(P.NAL_SEI, P.NAL_PRIORITY_DISPOSABLE,
                            nal_unit(P.NAL_SEI, P.NAL_PRIORITY_DISPOSABLE,
                                     sei_pic_timing_rbsp(
                                         self.sps, self._cpb_delay, 0))))
            self._cpb_delay += 2

        def write_slice(syn_cur, qp_mb_cur):
            """One payload per slice band (first_mb_in_slice = band
            start, independent entropy state per slice)."""
            if self._dev_wire is not None:
                pl = self._pull_device_slice(slice_type, syn_cur)
                if pl is not None:
                    return [pl]
                # late overflow (a recovery step lowered QP): host path
                for k in list(syn_cur):
                    syn_cur[k] = np.asarray(syn_cur[k])
            payloads = []
            for (y0, y1) in slices:
                band = None if len(slices) == 1 else (y0, y1)
                if p.b_cabac:
                    pl = self._write_slice_cabac(
                        syn_cur, slice_type, qp,
                        idr_pic_id=self.idr_pic_id if is_idr else -1,
                        qp_mb=qp_mb_cur, n_ref=n_ref_active, band=band)
                elif slice_type == P.SLICE_TYPE_I:
                    pl = self._write_slice_cavlc(
                        syn_cur, slice_type, qp,
                        idr_pic_id=self.idr_pic_id if is_idr else -1,
                        qp_mb=qp_mb_cur, band=band)
                else:
                    pl = self._write_slice_p_cavlc(
                        syn_cur, qp, qp_mb=qp_mb_cur, n_ref=n_ref_active,
                        band=band)
                payloads.append(pl)
            return payloads

        _skips_before = self.stats.i_mb_count.get("P_SKIP", 0)
        self._row_bits = None   # filled by the native single-slice writers
        slice_payloads = write_slice(syn, qp_mb)

        # -- per-row VBV (x264_ratecontrol_mb, ratecontrol.c:599-780):
        # the reference steps QP at each row end and re-encodes
        # overshooting rows mid-slice; with whole-frame device encodes
        # we run the same end-of-row QP-step walk over the MEASURED
        # per-row bits, re-encode the frame with the adjusted ramp, and
        # iterate to a fixed point (bounded).
        row_satd = rec["row_costs"]
        if (self.rc.b_vbv and len(slices) == 1 and row_satd is not None
                and len(row_satd) == self.mb_h):
            ramp = np.full(self.mb_h, qp, np.int32)
            for _ in range(3):
                if self._row_bits is None:
                    break   # Python-writer fallback has no row feedback
                new_ramp = self.rc.row_vbv_adjust(
                    slice_type, ramp, self._row_bits, row_satd)
                if new_ramp is None:
                    break
                qp_mb = np.clip(
                    qp_mb + (new_ramp - ramp)[:, None], p.rc.i_qp_min,
                    min(p.rc.i_qp_max, P.QP_MAX_SPEC)).astype(np.int32)
                ramp = new_ramp
                syn = device_encode(qp_mb)
                slice_payloads = write_slice(syn, qp_mb)
            self._last_qp_mb = qp_mb

        # i_slice_max_size (x264.h:660, validation encoder.c:150-162):
        # byte-budgeted slices. Bands whose NAL (startcode + header +
        # escape overhead) exceeds the budget are split proportionally
        # and the frame re-emitted; MB-row granularity (a single row
        # over budget is emitted as-is, like the reference's 1-MB floor).
        if p.i_slice_max_size > 0:
            nal_type_ = P.NAL_SLICE_IDR if is_idr else P.NAL_SLICE
            limit = p.i_slice_max_size
            for _ in range(16):
                sizes = [len(nal_unit(nal_type_, P.NAL_PRIORITY_HIGHEST,
                                      pl)) for pl in slice_payloads]
                new_slices = []
                split = False
                for (y0, y1), sz in zip(slices, sizes):
                    rows = y1 - y0
                    if sz <= limit or rows == 1:
                        new_slices.append((y0, y1))
                        continue
                    parts = min(rows, -(-sz // limit) + 1)
                    bounds = [y0 + (rows * i) // parts
                              for i in range(parts)] + [y1]
                    new_slices.extend((a, b) for a, b in
                                      zip(bounds, bounds[1:]) if a < b)
                    split = True
                if not split:
                    break
                slices[:] = new_slices
                syn = device_encode(qp_mb)
                slice_payloads = write_slice(syn, qp_mb)

        # -- in-band recovery (b): VBV/MinCR hard overshoot → re-encode
        # the frame at higher QP (ratecontrol.c:651-780 + the bitstream
        # restore of encoder.c:1580-1589, at frame granularity: the row
        # predictors' job is done by measuring the actual slice size)
        if self.rc.b_vbv:
            for _ in range(8):
                bits = sum(len(s) for s in slice_payloads) * 8
                limit = self.rc.frame_size_limit()
                if bits <= limit or qp_mb.min() >= P.QP_MAX_SPEC:
                    break
                step = max(1, int(round(6 * math.log2(bits / limit))))
                qp_mb = np.minimum(qp_mb + step, P.QP_MAX_SPEC)
                syn = device_encode(qp_mb)
                slice_payloads = write_slice(syn, qp_mb)
            self._last_qp_mb = qp_mb
            # row predictors learn from the FINAL encode (:675-681)
            if (self._row_bits is not None and row_satd is not None
                    and len(row_satd) == self.mb_h
                    and len(self._row_bits) == self.mb_h):
                self.rc.row_vbv_commit(slice_type, qp_mb.mean(axis=1),
                                       self._row_bits, row_satd)

        nal_type = P.NAL_SLICE_IDR if is_idr else P.NAL_SLICE
        for pl in slice_payloads:
            nals.append(NAL(nal_type, P.NAL_PRIORITY_HIGHEST,
                            nal_unit(nal_type, P.NAL_PRIORITY_HIGHEST,
                                     pl)))

        if is_idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        self.frame_num = (self.frame_num + 1) % (
            1 << self.sps.i_log2_max_frame_num)
        self.i_frame += 1

        self.last_recon = self._update_reference(
            syn["recon_y"], syn["recon_u"], syn["recon_v"], syn,
            slice_type, qp, qp_mb, is_idr=is_idr)
        if self.nr is not None and slice_type == P.SLICE_TYPE_P:
            self._nr_update(syn)

        # stats (h->stat twin, encoder.c:2077-2156)
        st = self.stats
        st.i_frame_count[slice_type] += 1
        total = sum(len(n.payload) for n in nals)
        st.i_frame_size[slice_type] += total
        filler = self.rc.end(slice_type, total * 8)
        if filler > 0:
            # CBR-HRD filler NAL (update_vbv :945-952, x264_filler_write)
            nals.append(NAL(P.NAL_FILLER, P.NAL_PRIORITY_DISPOSABLE,
                            nal_unit(P.NAL_FILLER,
                                     P.NAL_PRIORITY_DISPOSABLE,
                                     filler_rbsp(filler))))
            st.i_frame_size[slice_type] += len(nals[-1].payload)
        st.f_frame_qp[slice_type] += float(qp_mb.mean())
        h, w = pic.y.shape
        if p.analyse.b_psnr:
            # SSD accumulation is gated on b_psnr like the reference
            # (encoder.c:1398; debug-only by default, common.c:127-131)
            for plane, (rec, src) in enumerate(
                    zip(self.last_recon, (pic.y, pic.u, pic.v))):
                ph, pw = src.shape
                d = rec[:ph, :pw].astype(np.int64) - src.astype(np.int64)
                ssd_p = int((d * d).sum())
                st.ssd[plane] += ssd_p
                st.pixels[plane] += ph * pw
                st.ssd_type[slice_type][plane] += ssd_p
                st.pixels_type[slice_type][plane] += ph * pw
        if slice_type == P.SLICE_TYPE_P:
            # ref-usage histogram (encoder.c:1612, :2348-2367); P_SKIP MBs
            # always reference frame 0 and are excluded like the reference
            rh = np.bincount(np.asarray(syn["ref"]).ravel(),
                             minlength=P.REF_MAX)[:P.REF_MAX]
            rh[0] -= st.i_mb_count.get("P_SKIP", 0) - _skips_before
            st.i_mb_count_ref += np.maximum(rh, 0)
        else:
            # intra pred-mode histograms (encoder.c:2262-2341)
            is_i4 = np.asarray(syn["mb_type"]) == 1
            st.i16_modes += np.bincount(
                np.asarray(syn["i16_mode"])[~is_i4].ravel(), minlength=7)[:7]
            st.i4_modes += np.bincount(
                np.asarray(syn["i4_modes"])[is_i4].ravel(), minlength=12)[:12]
            st.chroma_modes += np.bincount(
                np.asarray(syn["chroma_mode"]).ravel(), minlength=7)[:7]
            st.cbp_coded += [int((np.asarray(syn["cbp_luma"]) != 0).sum()),
                             int((np.asarray(syn["cbp_chroma"]) >= 1).sum()),
                             int((np.asarray(syn["cbp_chroma"]) == 2).sum())]
            st.cbp_mbs += self.mb_w * self.mb_h
        if self.param.analyse.b_ssim:
            # offset (2,2) so ssim blocks don't align with dct blocks
            # (encoder.c:1416-1427)
            from ..ops.pixel import ssim_wxh
            s, cnt = ssim_wxh(np.asarray(self.last_recon[0])[2:h, 2:w],
                              pic.y[2:, 2:])
            st.f_ssim += float(s)
            st.i_ssim_cnt += cnt

        ftype = (P.TYPE_IDR if is_idr
                 else P.TYPE_I if slice_type == P.SLICE_TYPE_I
                 else P.TYPE_P)
        # crop the mod16-padded recon to the visible frame (the decoder
        # applies the SPS crop window, sps.i_crop_*; pic_out must match)
        ch, cw = pic.u.shape
        pic_out = Picture(y=self.last_recon[0][:h, :w],
                          u=self.last_recon[1][:ch, :cw],
                          v=self.last_recon[2][:ch, :cw],
                          i_frame_qp=qp, i_frame_type=ftype, i_pts=pic.i_pts)
        return nals, pic_out

    # ------------------------------------------------------------------
    def _frame_fused(self, rec, slice_type, is_idr, qp, qp_mb,
                     n_ref, valid_dpb, dev_hdr):
        """Fast-path frame encode through _fused_frame_fn: ONE device
        dispatch per attempt; the host's per-frame work is the payload
        pull + NAL framing + RC scalars. Returns (nals, pic_out), or
        None to fall back to the multi-dispatch path (entropy
        overflow / noise-reduction accounting)."""
        import jax.numpy as jnp
        p = self.param
        if self.nr is not None:
            return None     # NR accumulators live on the slow path
        is_p = slice_type == P.SLICE_TYPE_P
        need_recon = bool(p.analyse.b_psnr or p.analyse.b_ssim)
        cap = _DEV_PAYLOAD_BYTES_PER_MB * self.mb_w * self.mb_h + 4096
        cap = -(-cap // 4) * 4
        fn = _fused_frame_fn(
            is_p, self.mb_h, self.mb_w, n_ref, self.cqm,
            p.analyse.i_me_range, p.analyse.i_mv_range,
            bool(p.analyse.b_dct_decimate),
            min(max(p.analyse.i_me_method, 0), 3),
            bool(p.analyse.b_fast_pskip),
            bool(p.analyse.inter & P.ANALYSE_PSUB16x16),
            min(max(p.analyse.i_subpel_refine, 0), 11),
            self.use_satd, self.i4x4_enabled,
            self._deblock_enabled(qp), self.deblock_a * 2,
            self.deblock_b * 2, p.analyse.i_chroma_qp_offset, cap,
            False, need_recon, False)
        fy, fu, fv = rec["fy"], rec["fu"], rec["fv"]
        if is_p:
            if n_ref == 1:
                ref4, refu, refv = valid_dpb[0]["planes"]
            else:
                cropped = [r["planes"] for r in valid_dpb[:n_ref]]
                ref4 = jnp.stack([r[0] for r in cropped])
                refu = jnp.stack([r[1] for r in cropped])
                refv = jnp.stack([r[2] for r in cropped])
        else:
            z = jnp.zeros((), jnp.int32)   # unused by the I branch
            ref4 = refu = refv = z
        hv, hl, hbits = dev_hdr
        zero = self._dev_const(np.zeros((), np.int32))

        def attempt(qp_mb_cur):
            lam = LAMBDA_TAB[qp_mb_cur].astype(np.int32)
            out = fn(fy, fu, fv, ref4, refu, refv,
                     self._dev_const(qp_mb_cur), self._dev_const(lam),
                     self._dev_const(qp), hv, hl, zero, zero)
            for t in (out["bits"], out["ov"], out["rows"],
                      out["stats"]):
                try:
                    t.copy_to_host_async()
                except AttributeError:
                    pass
            return out

        def pull_payload(out):
            bits = int(np.asarray(out["bits"]))
            if bool(np.asarray(out["ov"])) or bits > cap * 8:
                return None
            nbytes = (bits + 7) >> 3
            bucket = min(1 << max(12, (max(nbytes, 1) - 1).bit_length()),
                         cap)
            pl = np.asarray(out["payload"][:bucket])[:nbytes].tobytes()
            self._row_bits = np.diff(
                np.asarray(out["rows"]).astype(np.int64), prepend=hbits)
            return pl

        out = attempt(qp_mb)
        payload = pull_payload(out)
        if payload is None:
            return None     # entropy overflow: multi-dispatch fallback

        # per-row VBV walk + frame-size cap (ratecontrol.c:599-780 +
        # the MinCR frame cap), re-encoding through the SAME fused fn
        row_satd = rec["row_costs"]
        if (self.rc.b_vbv and row_satd is not None
                and len(row_satd) == self.mb_h):
            ramp = np.full(self.mb_h, qp, np.int32)
            for _ in range(3):
                new_ramp = self.rc.row_vbv_adjust(
                    slice_type, ramp, self._row_bits, row_satd)
                if new_ramp is None:
                    break
                qp_mb = np.clip(
                    qp_mb + (new_ramp - ramp)[:, None], p.rc.i_qp_min,
                    min(p.rc.i_qp_max, P.QP_MAX_SPEC)).astype(np.int32)
                ramp = new_ramp
                out = attempt(qp_mb)
                pl = pull_payload(out)
                if pl is None:
                    return None
                payload = pl
        if self.rc.b_vbv:
            for _ in range(8):
                bits = len(payload) * 8
                limit = self.rc.frame_size_limit()
                if bits <= limit or qp_mb.min() >= P.QP_MAX_SPEC:
                    break
                step = max(1, int(round(6 * math.log2(bits / limit))))
                qp_mb = np.minimum(qp_mb + step, P.QP_MAX_SPEC)
                out = attempt(qp_mb)
                pl = pull_payload(out)
                if pl is None:
                    return None
                payload = pl
            if (row_satd is not None and len(row_satd) == self.mb_h
                    and self._row_bits is not None):
                self.rc.row_vbv_commit(slice_type, qp_mb.mean(axis=1),
                                       self._row_bits, row_satd)
        self._last_qp_mb = qp_mb
        self._last_syn = None
        self._dev_wire = None
        self._pending_ref = None

        # ---- NAL assembly (same order as the multi-dispatch path)
        nals = []
        if p.b_repeat_headers and self.i_frame == 0:
            nals.extend(self.headers()[:2])
        if self.sps.vui_nal_hrd_present and is_idr:
            delay, offset = self.rc.hrd_fullness(self.sps)
            nals.append(NAL(P.NAL_SEI, P.NAL_PRIORITY_DISPOSABLE,
                            nal_unit(P.NAL_SEI, P.NAL_PRIORITY_DISPOSABLE,
                                     sei_buffering_period_rbsp(
                                         self.sps, delay, offset))))
            # don't reset cpb delay for keyframes under intra refresh
            # (slicetype.c:383-386, encoder.c:1947)
            if not self.param.b_intra_refresh:
                self._cpb_delay = 0
        if (self.sps.vui_nal_hrd_present
                or self.sps.vui_pic_struct_present):
            nals.append(NAL(P.NAL_SEI, P.NAL_PRIORITY_DISPOSABLE,
                            nal_unit(P.NAL_SEI, P.NAL_PRIORITY_DISPOSABLE,
                                     sei_pic_timing_rbsp(
                                         self.sps, self._cpb_delay, 0))))
            self._cpb_delay += 2
        nal_type = P.NAL_SLICE_IDR if is_idr else P.NAL_SLICE
        nals.append(NAL(nal_type, P.NAL_PRIORITY_HIGHEST,
                        nal_unit(nal_type, P.NAL_PRIORITY_HIGHEST,
                                 payload)))
        if is_idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        self.frame_num = (self.frame_num + 1) % (
            1 << self.sps.i_log2_max_frame_num)
        self.i_frame += 1

        # ---- DPB commit (planes computed inside the fused step)
        if is_idr or slice_type == P.SLICE_TYPE_I:
            self.dpb = []
        self.dpb.insert(0, {"planes": out["planes"],
                            "frame_idx": self.i_frame - 1,
                            "frame_num": (self.frame_num - 1)
                            % (1 << self.sps.i_log2_max_frame_num),
                            "corrupt": False})
        del self.dpb[max(p.i_frame_reference, 1):]
        if need_recon:
            for v in out["recon"]:
                try:
                    v.copy_to_host_async()
                except AttributeError:
                    pass
            self.last_recon = tuple(
                np.asarray(v).astype(np.uint8) for v in out["recon"])
        else:
            # recon stays device-resident; pic_out carries device-backed
            # planes (np.asarray pulls lazily if a consumer wants pixels)
            self.last_recon = out["recon"]

        # ---- stats (the on-device histogram vector)
        st = self.stats
        vec = np.asarray(out["stats"])
        pic = rec["pic"]
        st.i_frame_count[slice_type] += 1
        total = sum(len(n.payload) for n in nals)
        st.i_frame_size[slice_type] += total
        filler = self.rc.end(slice_type, total * 8)
        if filler > 0:
            nals.append(NAL(P.NAL_FILLER, P.NAL_PRIORITY_DISPOSABLE,
                            nal_unit(P.NAL_FILLER,
                                     P.NAL_PRIORITY_DISPOSABLE,
                                     filler_rbsp(filler))))
            st.i_frame_size[slice_type] += len(nals[-1].payload)
        st.f_frame_qp[slice_type] += float(qp_mb.mean())
        if is_p:
            n_skip = int(vec[0])
            part_hist = vec[1:5].copy()
            ref_hist = vec[5:5 + P.REF_MAX].copy()
            st.i_mb_count["P_SKIP"] = \
                st.i_mb_count.get("P_SKIP", 0) + n_skip
            part_hist[0] -= n_skip
            for name, n in zip(_PART_NAMES, part_hist):
                if n:
                    st.i_mb_count[name] = \
                        st.i_mb_count.get(name, 0) + int(n)
            ref_hist[0] -= n_skip
            st.i_mb_count_ref += np.maximum(ref_hist, 0)
        else:
            n_i4 = int(vec[0])
            st.i_mb_count["I_4x4"] = st.i_mb_count.get("I_4x4", 0) + n_i4
            st.i_mb_count["I_16x16"] = (st.i_mb_count.get("I_16x16", 0)
                                        + self.mb_w * self.mb_h - n_i4)
            st.i16_modes += vec[1:8]
            st.i4_modes += vec[8:20]
            st.chroma_modes += vec[20:27]
            st.cbp_coded += vec[27:30]
            st.cbp_mbs += self.mb_w * self.mb_h
        h, w = pic.y.shape
        if p.analyse.b_psnr and self.last_recon is not None:
            for plane, (recn, src) in enumerate(
                    zip(self.last_recon, (pic.y, pic.u, pic.v))):
                ph, pw = src.shape
                d = recn[:ph, :pw].astype(np.int64) - src.astype(np.int64)
                ssd_p = int((d * d).sum())
                st.ssd[plane] += ssd_p
                st.pixels[plane] += ph * pw
                st.ssd_type[slice_type][plane] += ssd_p
                st.pixels_type[slice_type][plane] += ph * pw
        if p.analyse.b_ssim and self.last_recon is not None:
            from ..ops.pixel import ssim_wxh
            s, cnt = ssim_wxh(np.asarray(self.last_recon[0])[2:h, 2:w],
                              pic.y[2:, 2:])
            st.f_ssim += float(s)
            st.i_ssim_cnt += cnt

        ftype = (P.TYPE_IDR if is_idr
                 else P.TYPE_I if slice_type == P.SLICE_TYPE_I
                 else P.TYPE_P)
        ch, cw = pic.u.shape
        ry, ru, rv = self.last_recon
        pic_out = Picture(y=ry[:h, :w], u=ru[:ch, :cw], v=rv[:ch, :cw],
                          i_frame_qp=qp, i_frame_type=ftype,
                          i_pts=pic.i_pts)
        return nals, pic_out

    # ------------------------------------------------------------------
    def _pull_syn_wire(self, syn, is_p: bool = True,
                       mb_h: int | None = None) -> None:
        """Pull a host-writer frame's syntax over the block-granular
        wire (inter_frame.pack_syn_blocks / pack_syn_blocks_i): dense
        per-MB fields + one 12-byte entry per coded 4x4 block cross
        instead of the full level tensors (~50x smaller on typical P
        content). Reconstructed np arrays replace the device entries in
        `syn` in place; recon and deblock strengths stay device-resident
        for the reference update. Falls back to full pulls when the
        frame trips the wire's has-big limits (|level| > 8, dense field
        > int8, coded blocks over budget)."""
        from . import inter_frame
        if mb_h is None:
            mb_h = self.mb_h
        keys = _WIRE_SYN if is_p else _WIRE_SYN_I
        keep = _WIRE_KEEP if is_p else _WIRE_KEEP_I
        sub = {k: syn[k] for k in keys}
        dense, entries, _ = _syn_wire_fn(mb_h, self.mb_w, is_p)(sub)
        # speculative prefix (2 coded blocks/MB for P, 8 for the denser
        # intra frames covers typical content): the dense buffer and the
        # prefix cross in parallel RPCs; only an unusually dense frame
        # pays a second pull
        prefix = entries[:(2 if is_p else 8) * mb_h * self.mb_w]
        for t in (dense, prefix):
            try:
                t.copy_to_host_async()
            except AttributeError:
                pass
        dense_np = np.asarray(dense)
        up = None
        if not dense_np[0]:
            count = inter_frame.sparse_count(dense_np)
            entries_np = (np.asarray(prefix) if count <= prefix.shape[0]
                          else np.asarray(entries))
            unpack = (inter_frame.unpack_syn_blocks if is_p
                      else inter_frame.unpack_syn_blocks_i)
            up = unpack(dense_np, entries_np, self.mb_w, mb_h)
        if up is None:
            # has-big: the tensors are still in syn, device-resident
            for k in keep - {"recon_y", "recon_u", "recon_v", "bs"}:
                if k in syn:
                    syn[k] = np.asarray(syn[k])
            return
        syn.update(up)

    # ------------------------------------------------------------------
    def _pull_device_slice(self, slice_type, syn) -> bytes | None:
        """Finish a device-entropy slice: pull the exact-size packed
        payload (the device CAVLC wire) and the per-row bit positions,
        and tally the MB-type stats the host writers would have.
        Returns None when the wire is dirty (level-code overflow or
        payload-cap overshoot) — the caller falls back to the host
        writers. Payload pulls use power-of-two buckets so the eager
        device slice compiles O(log size) variants, not one per frame."""
        w = self._dev_wire
        bits = int(np.asarray(w["bits"]))
        if bool(np.asarray(w["ov"])) or bits > w["cap"] * 8:
            self._dev_wire = None
            return None
        nbytes = (bits + 7) >> 3
        cap = w["payload"].shape[0]
        bucket = min(1 << max(12, (max(nbytes, 1) - 1).bit_length()), cap)
        payload = np.asarray(w["payload"][:bucket])[:nbytes].tobytes()
        self._row_bits = np.diff(np.asarray(w["rows"]).astype(np.int64),
                                 prepend=w["hbits"])
        st = self.stats
        if slice_type == P.SLICE_TYPE_P:
            n_skip = int(np.asarray(w["n_skip"]))
            st.i_mb_count["P_SKIP"] = \
                st.i_mb_count.get("P_SKIP", 0) + n_skip
            part = (np.asarray(syn["partition"]) if "partition" in syn
                    else np.zeros((self.mb_h, self.mb_w), np.int32))
            hist = np.bincount(part.ravel(), minlength=4)
            hist[0] -= n_skip   # skips are partition-0 MBs
            for name, n in zip(("P_L0", "P_16x8", "P_8x16", "P_8x8"),
                               hist):
                if n:
                    st.i_mb_count[name] = \
                        st.i_mb_count.get(name, 0) + int(n)
        else:
            n_i4 = int((np.asarray(syn["mb_type"]) == 1).sum())
            st.i_mb_count["I_4x4"] = st.i_mb_count.get("I_4x4", 0) + n_i4
            st.i_mb_count["I_16x16"] = \
                st.i_mb_count.get("I_16x16", 0) \
                + self.mb_w * self.mb_h - n_i4
        return payload

    # ------------------------------------------------------------------
    def _write_slice_cavlc(self, syn, slice_type, qp, idr_pic_id,
                           qp_mb=None, band=None) -> bytes:
        """Slice header (x264_slice_header_write, encoder.c:1047-1196) +
        I-slice MB loop of x264_slice_write (:1503-1664), CAVLC.

        The MB loop runs in the native C++ entropy stage when available
        (entropy/native/entropy.cpp); this Python path is its behavioral
        twin and fallback."""
        p = self.param
        syn, qp_mb, mb_h_b, first_mb = self._band_syn(syn, qp_mb, band)
        bw = BitWriter()
        self._write_slice_header_common(bw, slice_type, qp, idr_pic_id,
                                        first_mb=first_mb)

        from ..entropy import native
        rb = np.zeros(mb_h_b, np.int64) if band is None else None
        payload = native.write_slice_i(bw.get_unaligned(), self.mb_w,
                                       mb_h_b, qp, syn, qp_mb=qp_mb,
                                       row_bits=rb)
        if payload is not None:
            # per-row bits for row-VBV: first row excludes the header
            hb, hn = bw.get_unaligned()
            self._row_bits = (None if rb is None else np.diff(
                rb, prepend=(len(hb) - 1) * 8 + hn))
            n_i4 = int((syn["mb_type"] == 1).sum())
            self.stats.i_mb_count["I_4x4"] = \
                self.stats.i_mb_count.get("I_4x4", 0) + n_i4
            self.stats.i_mb_count["I_16x16"] = \
                self.stats.i_mb_count.get("I_16x16", 0) \
                + self.mb_w * mb_h_b - n_i4
            return payload

        # -- MB loop (Python fallback) --
        mb_w, mb_h = self.mb_w, mb_h_b
        luma_cnt = np.zeros((mb_h * 4, mb_w * 4), np.int32)
        chroma_cnt = np.zeros((2, mb_h * 2, mb_w * 2), np.int32)
        last_qp = qp

        for mby in range(mb_h):
            for mbx in range(mb_w):
                mqp = int(qp_mb[mby, mbx]) if qp_mb is not None else qp
                last_qp = self._write_mb_i_cavlc(
                    bw, syn, mbx, mby, mqp, last_qp, luma_cnt, chroma_cnt)

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

    # ------------------------------------------------------------------
    # CABAC slice entropy (host) — encoder/cabac.c + slice framing
    # (encoder.c:1470-1480, 1532-1546, 1668-1672)
    # ------------------------------------------------------------------
    def _write_slice_header_common(self, bw, slice_type, qp, idr_pic_id,
                                   n_ref=1, first_mb=0):
        p = self.param
        bw.write_ue(first_mb)
        bw.write_ue(slice_type + 5)
        bw.write_ue(self.pps.i_id)
        bw.write(self.sps.i_log2_max_frame_num,
                 self.frame_num & ((1 << self.sps.i_log2_max_frame_num) - 1))
        if idr_pic_id >= 0:
            bw.write_ue(idr_pic_id)
        if slice_type == P.SLICE_TYPE_P:
            # num_ref_idx_override (slice_header_write, encoder.c:1127):
            # the DPB holds fewer frames than the PPS default early on
            if n_ref != self.pps.i_num_ref_idx_l0_default_active:
                bw.write1(1)
                bw.write_ue(n_ref - 1)
            else:
                bw.write1(0)
            # ref_pic_list_modification: explicit order when corrupt DPB
            # entries were skipped (slice_header_init :1013-1027 +
            # slice_header_write :1098-1111)
            if getattr(self, "_ref_reorder", False):
                bw.write1(1)
                pred = self.frame_num
                wrap = 1 << self.sps.i_log2_max_frame_num
                for fn in self._active_refs[:n_ref]:
                    diff = fn - pred
                    bw.write_ue(1 if diff > 0 else 0)
                    bw.write_ue((abs(diff) - 1) % wrap)
                    pred = fn
                bw.write_ue(3)
            else:
                bw.write1(0)
        if idr_pic_id >= 0:
            bw.write1(0)
            bw.write1(0)
        else:
            bw.write1(0)                     # adaptive_ref_pic_marking
        if p.b_cabac and slice_type != P.SLICE_TYPE_I:
            bw.write_ue(p.i_cabac_init_idc)
        bw.write_se(qp - self.pps.i_pic_init_qp)
        deblock_on = self._deblock_enabled(qp)
        bw.write_ue(0 if deblock_on else 1)
        if deblock_on:
            bw.write_se(p.i_deblocking_filter_alphac0)
            bw.write_se(p.i_deblocking_filter_beta)

    def _write_slice_cabac(self, syn, slice_type, qp, idr_pic_id,
                           qp_mb=None, n_ref=1, band=None) -> bytes:
        from ..entropy import cabac as CB
        p = self.param
        syn, qp_mb, mb_h_b, first_mb = self._band_syn(syn, qp_mb, band)
        mb_w, mb_h = self.mb_w, mb_h_b
        bw = BitWriter()
        self._write_slice_header_common(bw, slice_type, qp, idr_pic_id,
                                        n_ref=n_ref, first_mb=first_mb)
        bw.align_1()
        header = bw.get_bytes()
        is_p = slice_type == P.SLICE_TYPE_P

        # native C++ fast path (entropy/native/entropy.cpp); the Python
        # writer below is the behavioral twin (byte-identical, tested)
        from ..entropy import native
        rb = np.zeros(mb_h, np.int64) if band is None else None
        res = native.write_slice_cabac(header, mb_w, mb_h, qp,
                                       self.i_frame, is_p, syn, qp_mb=qp_mb,
                                       n_ref=n_ref, row_bits=rb)
        if res is not None:
            payload, counts = res
            # x264_cabac_pos starts at 1 bit (queue=-9 + 10)
            self._row_bits = (None if rb is None
                              else np.diff(rb, prepend=1))
            for name, n in zip(("I_16x16", "I_4x4", "P_L0", "P_SKIP",
                                "P_16x8", "P_8x16", "P_8x8"), counts):
                if n:
                    self.stats.i_mb_count[name] = \
                        self.stats.i_mb_count.get(name, 0) + int(n)
            return payload

        cb = CB.CabacEncoder(slice_type == P.SLICE_TYPE_I,
                             qp, frame_idx=self.i_frame)
        last_qp = qp    # running decoded QP (h->mb.i_last_qp)
        last_dqp = 0    # slice start (encoder.c:1482)
        prev_ext = 0    # extended cbp of previous MB in raster order

        # frame-level context state
        from ..entropy.mvpred_host import PART_GEOM, MvGrid
        nnz = np.zeros((mb_h * 4, mb_w * 4), np.int32)      # luma nnz flags
        cnnz = np.zeros((2, mb_h * 2, mb_w * 2), np.int32)  # chroma AC flags
        cbp_ext = np.full((mb_h, mb_w), -1, np.int32)
        mb_types = np.full((mb_h, mb_w), -1, np.int32)      # 0 i16,1 i4,2 pl0,3 skip
        chroma_modes = np.zeros((mb_h, mb_w), np.int32)
        # per-4x4-block capped |mvd| cache (h->mb.cache.mvd twin)
        mvd4 = np.zeros((mb_h * 4, mb_w * 4, 2), np.int32)
        grid = MvGrid(mb_w, mb_h)
        mv = syn.get("mv")
        mv8 = syn.get("mv8")
        ref_mb = syn.get("ref")
        partition = (syn["partition"] if "partition" in syn and is_p
                     else np.zeros((mb_h, mb_w), np.int32))
        _PART_NAMES = ("P_L0", "P_16x8", "P_8x16", "P_8x8")

        def part_mvs(mbx, mby, part):
            if mv8 is None:
                return [np.asarray(mv[mby, mbx], np.int64)]
            q = mv8[mby, mbx].astype(np.int64)
            if part == 0:
                return [q[0, 0]]
            if part == 1:
                return [q[0, 0], q[1, 0]]
            if part == 2:
                return [q[0, 0], q[0, 1]]
            return [q[0, 0], q[0, 1], q[1, 0], q[1, 1]]

        def write_residual_cbf(cat, mby, mbx, nz, levels, ctxidx):
            cb.decision(ctxidx, 1 if nz else 0)
            if nz:
                CB.write_block_residual(cb, cat, levels)

        def cbf_ctx_dc(cat, mby, mbx, bit, b_intra):
            la = cbp_ext[mby, mbx - 1] if mbx > 0 else -1
            ta = cbp_ext[mby - 1, mbx] if mby > 0 else -1
            nza = (la >> bit) & 1 if la != -1 else b_intra
            nzb = (ta >> bit) & 1 if ta != -1 else b_intra
            return CB.CBF_BASE[cat] + (nzb << 1) + nza

        def cbf_ctx_ac(cat, grid, by, bx, b_intra):
            # unavailable neighbor: intra → 1, inter → 0 (cabac.c:437-449)
            nza = grid[by, bx - 1] if bx > 0 else b_intra
            nzb = grid[by - 1, bx] if by > 0 else b_intra
            return CB.CBF_BASE[cat] + ((1 if nzb else 0) << 1) + (1 if nza else 0)

        for mby in range(mb_h):
            for mbx in range(mb_w):
                first = mby == 0 and mbx == 0
                if not first:
                    cb.terminal()
                cbp_luma = int(syn["cbp_luma"][mby, mbx])
                cbp_chroma = int(syn["cbp_chroma"][mby, mbx])

                if is_p:
                    part = int(partition[mby, mbx])
                    mb_ref = (int(ref_mb[mby, mbx])
                              if ref_mb is not None else 0)
                    mvs = part_mvs(mbx, mby, part)
                    pskip_mv = grid.pskip_mv(mbx, mby)
                    is_skip = (part == 0 and mb_ref == 0 and cbp_luma == 0
                               and cbp_chroma == 0
                               and np.array_equal(mvs[0], pskip_mv))
                    # skip flag (x264_cabac_mb_skip, cabac.c:203-209)
                    nsk = 0
                    if mbx > 0 and mb_types[mby, mbx - 1] != 3:
                        nsk += 1
                    if mby > 0 and mb_types[mby - 1, mbx] != 3:
                        nsk += 1
                    cb.decision(11 + nsk, 1 if is_skip else 0)
                    if is_skip:
                        grid.set_mb(mbx, mby, 0, mvs)
                        mb_types[mby, mbx] = 3
                        cbp_ext[mby, mbx] = 0
                        nnz[mby*4:mby*4+4, mbx*4:mbx*4+4] = 0
                        cnnz[:, mby*2:mby*2+2, mbx*2:mbx*2+2] = 0
                        mvd4[mby*4:mby*4+4, mbx*4:mbx*4+4] = 0
                        last_dqp = 0   # cache_save: qp reverts
                        prev_ext = 0
                        self.stats.i_mb_count["P_SKIP"] = \
                            self.stats.i_mb_count.get("P_SKIP", 0) + 1
                        continue

                if is_p:
                    # mb_type bins (x264_cabac_mb_header_p, cabac.c:345-415)
                    if part == 0:
                        cb.decision(14, 0)
                        cb.decision(15, 0)
                        cb.decision(16, 0)
                    elif part == 1:          # 16x8: 0,1 then ctx17:1
                        cb.decision(14, 0)
                        cb.decision(15, 1)
                        cb.decision(17, 1)
                    elif part == 2:          # 8x16: 0,1 then ctx17:0
                        cb.decision(14, 0)
                        cb.decision(15, 1)
                        cb.decision(17, 0)
                    else:                    # P_8x8: 0,0,1 + sub types
                        cb.decision(14, 0)
                        cb.decision(15, 0)
                        cb.decision(16, 1)
                        for _ in range(4):   # sub_mb_type D_L0_8x8
                            cb.decision(21, 1)
                    if n_ref > 1:
                        # ref idx (x264_cabac_ref_p, cabac.c:211-230);
                        # ctx from the OLD grid state, refs stored
                        # incrementally per partition
                        for pi in range(len(PART_GEOM[part])):
                            rbx, rby, w4, h4 = PART_GEOM[part][pi]
                            bx0, by0 = mbx * 4 + rbx, mby * 4 + rby
                            ra = (int(grid.ref4[by0, bx0 - 1])
                                  if bx0 > 0 else 0)
                            rb = (int(grid.ref4[by0 - 1, bx0])
                                  if by0 > 0 else 0)
                            ctx = (1 if ra > 0 else 0) + \
                                  (2 if rb > 0 else 0)
                            r = mb_ref
                            while r > 0:
                                cb.decision(54 + ctx, 1)
                                ctx = (ctx >> 2) + 4
                                r -= 1
                            cb.decision(54 + ctx, 0)
                            grid.ref4[by0:by0 + h4,
                                      bx0:bx0 + w4] = mb_ref
                    grid.set_mb(mbx, mby, part, mvs, ref=mb_ref)
                    for pi, pmv in enumerate(mvs):
                        mvp = grid.predict_mv(mbx, mby, part, pi,
                                              ref=mb_ref)
                        rbx, rby, w4, h4 = PART_GEOM[part][pi]
                        bx0, by0 = mbx * 4 + rbx, mby * 4 + rby
                        la = (mvd4[by0, bx0 - 1] if bx0 > 0 else (0, 0))
                        ta = (mvd4[by0 - 1, bx0] if by0 > 0 else (0, 0))
                        c0 = ((1 if la[0] + ta[0] > 2 else 0)
                              + (1 if la[0] + ta[0] > 32 else 0))
                        c1 = ((1 if la[1] + ta[1] > 2 else 0)
                              + (1 if la[1] + ta[1] > 32 else 0))
                        mdx = int(pmv[0]) - int(mvp[0])
                        mdy = int(pmv[1]) - int(mvp[1])
                        a0 = CB.write_mvd_component(cb, 0, mdx, c0)
                        a1 = CB.write_mvd_component(cb, 1, mdy, c1)
                        mvd4[by0:by0 + h4, bx0:bx0 + w4] = (a0, a1)
                    mb_types[mby, mbx] = 2
                    b_intra = 0
                    self.stats.i_mb_count[_PART_NAMES[part]] = \
                        self.stats.i_mb_count.get(_PART_NAMES[part], 0) + 1
                else:
                    is_i4 = syn["mb_type"][mby, mbx] == 1
                    b_intra = 1
                    # mb_type ctx (cabac.c:305-311): neighbor != I_4x4
                    ctx = 0
                    if mbx > 0 and mb_types[mby, mbx - 1] != 1:
                        ctx += 1
                    if mby > 0 and mb_types[mby - 1, mbx] != 1:
                        ctx += 1
                    mode_fix = int(_FIX16[syn["i16_mode"][mby, mbx]])
                    CB.write_mb_type_intra(cb, is_i4, mode_fix, cbp_luma,
                                           cbp_chroma, 3 + ctx, 6, 7, 8, 9, 10)
                    if is_i4:
                        modes = syn["i4_modes"][mby, mbx]
                        for i in range(16):
                            bx = mbx * 4 + int(BLOCK_IDX_X[i])
                            by = mby * 4 + int(BLOCK_IDX_Y[i])
                            pred = self._host_mpm(syn, by, bx)
                            CB.write_intra4x4_pred_mode(
                                cb, pred, int(_FIX4[modes[i] + 1]))
                    # chroma pred mode (cabac.c:84-103)
                    cm = int(_FIXC[syn["chroma_mode"][mby, mbx]])
                    ctx = 0
                    if mbx > 0 and chroma_modes[mby, mbx - 1] != 0:
                        ctx += 1
                    if mby > 0 and chroma_modes[mby - 1, mbx] != 0:
                        ctx += 1
                    cb.decision(64 + ctx, 1 if cm > 0 else 0)
                    if cm > 0:
                        cb.decision(64 + 3, 1 if cm > 1 else 0)
                        if cm > 1:
                            cb.decision(64 + 3, 1 if cm > 2 else 0)
                    chroma_modes[mby, mbx] = cm
                    mb_types[mby, mbx] = 1 if is_i4 else 0
                    self.stats.i_mb_count["I_4x4" if is_i4 else "I_16x16"] = \
                        self.stats.i_mb_count.get(
                            "I_4x4" if is_i4 else "I_16x16", 0) + 1

                is_i16 = (not is_p) and syn["mb_type"][mby, mbx] == 0
                nz_dc = int(syn["nz_luma_dc"][mby, mbx]) if is_i16 else 0
                cnz_dc = syn["chroma_nz_dc"][mby, mbx] if "chroma_nz_dc" in syn \
                    else np.zeros(2, np.int32)
                this_cbp_ext = ((cbp_chroma << 4) | cbp_luma | (nz_dc << 8)
                                | (int(cnz_dc[0]) << 9)
                                | (int(cnz_dc[1]) << 10))

                if not is_i16:
                    # cbp (cabac.c:111-164)
                    cl = cbp_ext[mby, mbx - 1] if mbx > 0 else -1
                    ct = cbp_ext[mby - 1, mbx] if mby > 0 else -1
                    cbp = cbp_luma
                    cb.decision(76 - ((cl >> 1) & 1) - ((ct >> 1) & 2),
                                (cbp >> 0) & 1)
                    cb.decision(76 - ((cbp >> 0) & 1) - ((ct >> 2) & 2),
                                (cbp >> 1) & 1)
                    cb.decision(76 - ((cl >> 3) & 1) - ((cbp << 1) & 2),
                                (cbp >> 2) & 1)
                    cb.decision(76 - ((cbp >> 2) & 1) - ((cbp >> 0) & 2),
                                (cbp >> 3) & 1)
                    ctx = 0
                    if (cl & 0x30) and cl != -1:
                        ctx += 1
                    if (ct & 0x30) and ct != -1:
                        ctx += 2
                    if cbp_chroma == 0:
                        cb.decision(77 + ctx, 0)
                    else:
                        cb.decision(77 + ctx, 1)
                        ctx = 4
                        if (cl & 0x30) == 0x20:
                            ctx += 1
                        if (ct & 0x30) == 0x20:
                            ctx += 2
                        cb.decision(77 + ctx, cbp_chroma >> 1)

                cbp_ext[mby, mbx] = this_cbp_ext

                if cbp_luma or cbp_chroma or is_i16:
                    # x264_cabac_qp_delta (encoder/cabac.c:165-201)
                    mqp = int(qp_mb[mby, mbx]) if qp_mb is not None else qp
                    if is_i16 and not this_cbp_ext:
                        mqp = last_qp   # empty-I16 suppression
                    CB.write_qp_delta(cb, mqp - last_qp,
                                      last_dqp != 0 and prev_ext != 0)
                    last_dqp = mqp - last_qp
                    last_qp = mqp
                    if is_i16:
                        ctx = cbf_ctx_dc(CB.CAT_LUMA_DC, mby, mbx, 8, b_intra)
                        write_residual_cbf(
                            CB.CAT_LUMA_DC, mby, mbx, nz_dc,
                            syn["luma_dc_levels"][mby, mbx], ctx)
                        if cbp_luma:
                            for i in range(16):
                                bx = mbx * 4 + int(BLOCK_IDX_X[i])
                                by = mby * 4 + int(BLOCK_IDX_Y[i])
                                nzf = int(syn["luma_nnz"][mby, mbx, i])
                                ctx = cbf_ctx_ac(CB.CAT_LUMA_AC, nnz, by, bx,
                                                 b_intra)
                                write_residual_cbf(
                                    CB.CAT_LUMA_AC, mby, mbx, nzf,
                                    syn["luma_levels"][mby, mbx, i, 1:], ctx)
                                nnz[by, bx] = nzf
                    else:
                        for i in range(16):
                            if not (cbp_luma & (1 << (i >> 2))):
                                continue
                            bx = mbx * 4 + int(BLOCK_IDX_X[i])
                            by = mby * 4 + int(BLOCK_IDX_Y[i])
                            nzf = int(syn["luma_nnz"][mby, mbx, i])
                            ctx = cbf_ctx_ac(CB.CAT_LUMA_4x4, nnz, by, bx,
                                             b_intra)
                            write_residual_cbf(
                                CB.CAT_LUMA_4x4, mby, mbx, nzf,
                                syn["luma_levels"][mby, mbx, i], ctx)
                            nnz[by, bx] = nzf
                    if cbp_chroma:
                        for ch in range(2):
                            ctx = cbf_ctx_dc(CB.CAT_CHROMA_DC, mby, mbx,
                                             9 + ch, b_intra)
                            write_residual_cbf(
                                CB.CAT_CHROMA_DC, mby, mbx, int(cnz_dc[ch]),
                                syn["chroma_dc_levels"][mby, mbx, ch], ctx)
                        if cbp_chroma == 2:
                            for ch in range(2):
                                for i in range(4):
                                    bx = mbx * 2 + (i & 1)
                                    by = mby * 2 + (i >> 1)
                                    nzf = int(syn["chroma_nnz_ac"][mby, mbx,
                                                                   ch, i])
                                    ctx = cbf_ctx_ac(CB.CAT_CHROMA_AC,
                                                     cnnz[ch], by, bx,
                                                     b_intra)
                                    write_residual_cbf(
                                        CB.CAT_CHROMA_AC, mby, mbx, nzf,
                                        syn["chroma_ac_levels"][mby, mbx,
                                                                ch, i, 1:],
                                        ctx)
                                    cnnz[ch, by, bx] = nzf

                if not (cbp_luma or cbp_chroma or is_i16):
                    last_dqp = 0   # uncoded: cache_save reverts qp
                prev_ext = this_cbp_ext

                # zero nnz state for uncoded blocks
                if not (cbp_luma or is_i16):
                    nnz[mby*4:mby*4+4, mbx*4:mbx*4+4] = 0
                elif not is_i16:
                    for i in range(16):
                        if not (cbp_luma & (1 << (i >> 2))):
                            bx = mbx * 4 + int(BLOCK_IDX_X[i])
                            by = mby * 4 + int(BLOCK_IDX_Y[i])
                            nnz[by, bx] = 0
                if cbp_chroma != 2:
                    cnnz[:, mby*2:mby*2+2, mbx*2:mbx*2+2] = 0

        self._last_mb_types = mb_types   # debug handle (tools/mbdiff.py)
        return header + cb.flush()

    def _write_slice_p_cavlc(self, syn, qp, qp_mb=None, n_ref=1,
                             band=None) -> bytes:
        """P slice: header + skip runs + P_L0 partition MBs
        (encoder/cavlc.c mb_header_p :233-305, slice loop
        encoder.c:1547-1570). Native C++ fast path with this Python twin
        as fallback; MV prediction on the shared block-granularity grid
        (entropy/mvpred_host.py)."""
        syn, qp_mb, mb_h_b, first_mb = self._band_syn(syn, qp_mb, band)
        bw = BitWriter()
        self._write_slice_header_common(bw, P.SLICE_TYPE_P, qp, -1,
                                        n_ref=n_ref, first_mb=first_mb)

        from ..entropy import native
        rb = np.zeros(mb_h_b, np.int64) if band is None else None
        res = native.write_slice_p(bw.get_unaligned(), self.mb_w, mb_h_b,
                                   qp, syn, qp_mb=qp_mb, n_ref=n_ref,
                                   row_bits=rb)
        if res is not None:
            payload, n_skip = res
            hb, hn = bw.get_unaligned()
            self._row_bits = (None if rb is None else np.diff(
                rb, prepend=(len(hb) - 1) * 8 + hn))
            self.stats.i_mb_count["P_SKIP"] = \
                self.stats.i_mb_count.get("P_SKIP", 0) + n_skip
            part = (syn["partition"] if "partition" in syn
                    else np.zeros((mb_h_b, self.mb_w), np.int32))
            hist = np.bincount(part.ravel(), minlength=4)
            hist[0] -= n_skip   # skips are partition-0 MBs
            for name, n in zip(("P_L0", "P_16x8", "P_8x16", "P_8x8"), hist):
                if n:
                    self.stats.i_mb_count[name] = \
                        self.stats.i_mb_count.get(name, 0) + int(n)
            return payload

        from ..entropy.mvpred_host import PART_GEOM, MvGrid
        mb_w, mb_h = self.mb_w, mb_h_b
        luma_cnt = np.zeros((mb_h * 4, mb_w * 4), np.int32)
        chroma_cnt = np.zeros((2, mb_h * 2, mb_w * 2), np.int32)
        grid = MvGrid(mb_w, mb_h)
        mv8 = syn["mv8"] if "mv8" in syn else None
        partition = (syn["partition"] if "partition" in syn
                     else np.zeros((mb_h, mb_w), np.int32))
        mv = syn["mv"]
        ref_mb = syn.get("ref")
        last_qp = qp
        skip_run = 0
        n_skip = 0
        _PART_NAMES = ("P_L0", "P_16x8", "P_8x16", "P_8x8")

        def part_mvs(mbx, mby, part):
            if mv8 is None:
                return [np.asarray(mv[mby, mbx], np.int64)]
            q = mv8[mby, mbx].astype(np.int64)   # (qy, qx, 2)
            if part == 0:
                return [q[0, 0]]
            if part == 1:
                return [q[0, 0], q[1, 0]]
            if part == 2:
                return [q[0, 0], q[0, 1]]
            return [q[0, 0], q[0, 1], q[1, 0], q[1, 1]]

        for mby in range(mb_h):
            for mbx in range(mb_w):
                cbp_luma = int(syn["cbp_luma"][mby, mbx])
                cbp_chroma = int(syn["cbp_chroma"][mby, mbx])
                part = int(partition[mby, mbx])
                mb_ref = int(ref_mb[mby, mbx]) if ref_mb is not None else 0
                mvs = part_mvs(mbx, mby, part)
                pskip_mv = grid.pskip_mv(mbx, mby)
                # P_SKIP demotion (encoder/macroblock.c:477-485)
                is_skip = (part == 0 and mb_ref == 0 and cbp_luma == 0
                           and cbp_chroma == 0
                           and np.array_equal(mvs[0], pskip_mv))
                if is_skip:
                    skip_run += 1
                    n_skip += 1
                    grid.set_mb(mbx, mby, 0, mvs, ref=0)
                    luma_cnt[mby*4:mby*4+4, mbx*4:mbx*4+4] = 0
                    chroma_cnt[:, mby*2:mby*2+2, mbx*2:mbx*2+2] = 0
                    self.stats.i_mb_count["P_SKIP"] = \
                        self.stats.i_mb_count.get("P_SKIP", 0) + 1
                    continue
                bw.write_ue(skip_run)
                skip_run = 0
                self.stats.i_mb_count[_PART_NAMES[part]] = \
                    self.stats.i_mb_count.get(_PART_NAMES[part], 0) + 1
                # mb_type (cavlc.c:235-305); P_8x8ref0 (ue 4) when refs
                # are active and all sub refs are 0
                sub_ref0 = part == 3 and n_ref > 1 and mb_ref == 0
                bw.write_ue(4 if sub_ref0 else part)
                if part == 3:
                    for _ in range(4):
                        bw.write_ue(0)       # sub_mb_type = L0_8x8
                grid.set_mb(mbx, mby, part, mvs, ref=mb_ref)
                from ..entropy.mvpred_host import PART_GEOM as _PG
                if n_ref > 1 and not sub_ref0:
                    for _ in range(len(_PG[part])):   # te() ref idx
                        if n_ref == 2:
                            bw.write1(1 ^ mb_ref)
                        else:
                            bw.write_ue(mb_ref)
                for pi, pmv in enumerate(mvs):
                    mvp = grid.predict_mv(mbx, mby, part, pi, ref=mb_ref)
                    bw.write_se(int(pmv[0]) - int(mvp[0]))
                    bw.write_se(int(pmv[1]) - int(mvp[1]))
                # cbp (inter table)
                bw.write_ue(cavlc.CBP_TO_GOLOMB_INTER[
                    (cbp_chroma << 4) | cbp_luma])
                if cbp_luma | cbp_chroma:
                    mqp = int(qp_mb[mby, mbx]) if qp_mb is not None else qp
                    bw.write_se(mqp - last_qp)
                    last_qp = mqp
                for i in range(16):
                    bx = mbx * 4 + int(BLOCK_IDX_X[i])
                    by = mby * 4 + int(BLOCK_IDX_Y[i])
                    if cbp_luma & (1 << (i >> 2)):
                        nc = self._nc(luma_cnt, by, bx)
                        total, _ = cavlc.write_block_residual(
                            bw, syn["luma_levels"][mby, mbx, i], nc)
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
                                    bw,
                                    syn["chroma_ac_levels"][mby, mbx, ch,
                                                            i, 1:], nc)
                                chroma_cnt[ch, by, bx] = total
                    else:
                        chroma_cnt[:, mby*2:mby*2+2, mbx*2:mbx*2+2] = 0
                else:
                    chroma_cnt[:, mby*2:mby*2+2, mbx*2:mbx*2+2] = 0
        if skip_run > 0:
            bw.write_ue(skip_run)  # trailing skips (encoder.c:1668-1680)
        bw.rbsp_trailing()
        return bw.get_bytes()

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
        """x264_encoder_close stats summary (encoder.c:2189-2388):
        per-type frame lines, MB histogram, bitrate — via x264_log."""
        p = self.param
        st = self.stats
        out = st.summary()
        fps = (p.i_fps_num / p.i_fps_den
               if p.i_fps_num > 0 and p.i_fps_den > 0 else 25.0)
        total_frames = sum(st.i_frame_count.values())
        for stype, ch in ((P.SLICE_TYPE_I, "I"), (P.SLICE_TYPE_P, "P")):
            n = st.i_frame_count.get(stype, 0)
            if not n:
                continue
            P.x264_log(p, P.LOG_INFO,
                       f"frame {ch}:{n:<5d} Avg QP:"
                       f"{st.f_frame_qp[stype] / n:5.2f}  size:"
                       f"{st.i_frame_size[stype] / n:6.0f}")
        mbs = st.i_mb_count
        tot_mb = max(sum(mbs.values()), 1)
        if mbs:
            P.x264_log(p, P.LOG_INFO, "mb " + "  ".join(
                f"{k}:{100.0 * v / tot_mb:.1f}%"
                for k, v in sorted(mbs.items())))
        if st.cbp_mbs:
            cy, cdc, cac = (100.0 * st.cbp_coded / st.cbp_mbs)
            P.x264_log(p, P.LOG_INFO,
                       f"coded y,uvDC,uvAC intra: {cy:.1f}% {cdc:.1f}% "
                       f"{cac:.1f}%")
            tot16 = max(int(st.i16_modes.sum()), 1)
            v, h_, dc, pl = (100.0 * st.i16_modes[[0, 1, 2, 3]] / tot16)
            P.x264_log(p, P.LOG_INFO,
                       f"i16 v,h,dc,p: {v:2.0f}% {h_:2.0f}% {dc:2.0f}% "
                       f"{pl:2.0f}%")
            if st.i4_modes.sum():
                m = 100.0 * st.i4_modes[:9] / st.i4_modes.sum()
                P.x264_log(p, P.LOG_INFO,
                           "i4 v,h,dc,ddl,ddr,vr,hd,vl,hu: "
                           + " ".join(f"{x:2.0f}%" for x in m))
            totc = max(int(st.chroma_modes.sum()), 1)
            dc, h_, v, pl = (100.0 * st.chroma_modes[[0, 1, 2, 3]] / totc)
            P.x264_log(p, P.LOG_INFO,
                       f"i8c dc,h,v,p: {dc:2.0f}% {h_:2.0f}% {v:2.0f}% "
                       f"{pl:2.0f}%")
        if st.i_mb_count_ref.sum():
            den = st.i_mb_count_ref.sum()
            P.x264_log(p, P.LOG_INFO, "ref P L0:" + "".join(
                f" {100.0 * n / den:4.1f}%"
                for n in st.i_mb_count_ref if n))
        if p.analyse.b_psnr and st.pixels[0]:
            psnr = out["psnr_yuv"]
            for stype, ch in ((P.SLICE_TYPE_I, "I"), (P.SLICE_TYPE_P, "P")):
                if st.pixels_type[stype][0]:
                    py = out["psnr_yuv_by_type"][stype]
                    P.x264_log(p, P.LOG_INFO,
                               f"frame {ch} PSNR Mean Y:{py[0]:.3f} "
                               f"U:{py[1]:.3f} V:{py[2]:.3f}")
            P.x264_log(p, P.LOG_INFO,
                       f"PSNR Mean Y:{psnr[0]:.3f} U:{psnr[1]:.3f} "
                       f"V:{psnr[2]:.3f}")
        if p.analyse.b_ssim and st.i_ssim_cnt:
            P.x264_log(p, P.LOG_INFO,
                       f"SSIM Mean Y:{out['ssim_y']:.7f}")
        if total_frames:
            total_bytes = sum(st.i_frame_size.values())
            P.x264_log(p, P.LOG_INFO,
                       f"kb/s:{total_bytes * 8 * fps / total_frames / 1000:.2f}")
        return out
