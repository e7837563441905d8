"""x264dsp_tpu — a TPU-native H.264/AVC baseline encoder framework.

A from-scratch rebuild of the capabilities of colin121/x264-dsp (an x264
fork for the TI TMS320C6000 DSP) designed for TPU hardware:

- the DSP kernel layer (pixel/dct/quant/predict/mc/deblock linear assembly)
  becomes batched JAX/Pallas kernels over the macroblock grid,
- mode decision and motion estimation become data-parallel candidate
  scoring with wavefront scheduling for causal dependencies,
- the serial entropy stage (CAVLC/CABAC/NAL) runs on host,
- multi-stream batching and ``jax.sharding`` meshes replace the
  reference's (disabled) thread plumbing.

Public API mirrors common/x264.h: :func:`param_default`,
:class:`Encoder` (open/headers/encode/close), :class:`Picture`.
"""

from .params import (  # noqa: F401
    Param, param_default, validate_parameters,
    RC_CQP, RC_CRF, RC_ABR,
    ME_DIA, ME_HEX, ME_UMH, ME_ESA,
    SLICE_TYPE_I, SLICE_TYPE_P, SLICE_TYPE_B,
    TYPE_AUTO, TYPE_IDR, TYPE_I, TYPE_P,
)
from .api import (  # noqa: F401
    BIT_DEPTH, CHROMA_FORMAT, Encoder, NAL, Picture, nal_encode,
    picture_alloc, picture_clean, picture_init,
)


def __getattr__(name):
    # lazy: BatchEncoder pulls in the jitted core on first use
    if name == "BatchEncoder":
        from .encoder.batch import BatchEncoder
        return BatchEncoder
    raise AttributeError(name)

__version__ = "0.1.0"
