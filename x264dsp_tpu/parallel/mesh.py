"""Multi-stream batching over a device mesh.

The reference's frame-threading slot (i_threads, forced to 1 —
encoder/encoder.c:57, SURVEY §2.6) becomes the TPU-native parallel axis:
N independent video streams are encoded as one batched tensor program,
sharded over a 1-D ``jax.sharding.Mesh`` ("stream" = data parallel). No
collectives are needed for the parity target — streams are independent —
so scaling is embarrassingly linear over ICI-connected chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..encoder import inter_frame, intra_frame
from ..ops import deblock as DB
from ..ops import mc as MC


def make_stream_mesh(devices=None, name: str = "stream") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.array(devices), (name,))


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "use_satd",
                                             "i4x4_enabled"))
def encode_i_frames_batched(fy, fu, fv, qp, qpc, lam,
                            mb_w: int, mb_h: int,
                            use_satd: bool, i4x4_enabled: bool):
    """Batched I-frame encode: planes carry a leading stream axis.
    fy: (S, H, W), fu/fv: (S, H/2, W/2); qp/qpc/lam scalars (per-batch QP
    support comes with rate control)."""
    base = (intra_frame.encode_i_frame_skew
            if jax.default_backend() == "tpu"
            else intra_frame.encode_i_frame)
    fn = functools.partial(base.__wrapped__,
                           mb_w=mb_w, mb_h=mb_h, use_satd=use_satd,
                           i4x4_enabled=i4x4_enabled)
    return jax.vmap(lambda y, u, v: fn(y, u, v, qp, qpc, lam))(fy, fu, fv)


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "me_range",
                                             "mv_range", "dct_decimate",
                                             "me_parallel"))
def encode_p_frames_batched(fy, fu, fv, ref4, refu, refv, qp, qpc, lam,
                            mb_w: int, mb_h: int, me_range: int,
                            mv_range: int, dct_decimate: bool,
                            me_parallel: bool = False):
    """Batched P-frame encode over a leading stream axis. The wavefront
    steps are shared across streams, so per-step work scales with S while
    the sequential depth stays constant — the main throughput lever for
    the latency-bound decision wavefronts (BASELINE config 5)."""
    fn = functools.partial(inter_frame.encode_p_frame.__wrapped__,
                           mb_w=mb_w, mb_h=mb_h, me_range=me_range,
                           mv_range=mv_range, dct_decimate=dct_decimate,
                           me_parallel=me_parallel)
    return jax.vmap(lambda a, b, c, r4, ru, rv: fn(a, b, c, r4, ru, rv,
                                                   qp, qpc, lam))(
        fy, fu, fv, ref4, refu, refv)


def shard_streams(mesh: Mesh, *arrays):
    """Place stream-batched arrays with the stream axis sharded over the
    mesh."""
    out = []
    for a in arrays:
        spec = PSpec("stream", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "me_range",
                                             "mv_range", "dct_decimate",
                                             "me_parallel"))
def encode_p_pipeline_batched(fy, fu, fv, ref4, refu, refv, qp, qpc, lam,
                              mb_w: int, mb_h: int, me_range: int,
                              mv_range: int, dct_decimate: bool,
                              me_parallel: bool = False):
    """Full steady-state P step over a stream batch: encode + in-loop
    deblock + hpel reference update. The sequential wavefront depth is
    shared across streams (per-step work scales with S, step count does
    not) — this is how the latency-bound wavefronts reach throughput
    (BASELINE config 5: multi-stream 1080p)."""

    fn = functools.partial(inter_frame.encode_p_frame.__wrapped__,
                           mb_w=mb_w, mb_h=mb_h, me_range=me_range,
                           mv_range=mv_range, dct_decimate=dct_decimate,
                           me_parallel=me_parallel)
    out = jax.vmap(lambda a, b, c, r4, ru, rv: fn(a, b, c, r4, ru, rv,
                                                  qp, qpc, lam))(
        fy, fu, fv, ref4, refu, refv)

    zero = jnp.zeros((mb_h, mb_w), jnp.int32)

    def post(y, u, v, bs, feo):
        dy, du, dv = DB.deblock_frame.__wrapped__(
            y, u, v, bs, zero, feo, qp, qpc, 0, 0,
            mb_w=mb_w, mb_h=mb_h, use_pallas=None)
        return MC.make_ref_planes(dy), MC.pad_chroma(du), MC.pad_chroma(dv)

    ref4n, refun, refvn = jax.vmap(post)(
        out["recon_y"], out["recon_u"], out["recon_v"],
        out["bs"], out["feo"])
    return out, (ref4n, refun, refvn)
