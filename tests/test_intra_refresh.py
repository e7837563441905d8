"""b_intra_refresh plumbing parity (VERDICT r3 item 8).

The fork's intra-in-P analysis is compiled out
(/root/reference/encoder/analyse.c:1214-1219), so no periodic refresh
wave can be emitted; the parameter's OBSERVABLE effects are:

- keyint_max == 1 forces it off (encoder.c:67-71)
- ref > 1 / dpb > 1 are clamped to 1 with a warning (encoder.c:193-198)
- SPS log2_max_frame_num is sized so time-to-recovery fits
  (set.c:138-143)
- the keyint_max IDR rule applies only to frame 0 (slicetype.c:516)
- cpb delay is NOT reset on keyframes (slicetype.c:383-386)
"""

import numpy as np

from x264dsp_tpu import param_default
from x264dsp_tpu.params import validate_parameters
from x264dsp_tpu.encoder.sets import SPS
from x264dsp_tpu.encoder.slicetype import SlicetypeDecider
from x264dsp_tpu import params as P


def _p(**kw):
    p = param_default()
    p.i_width, p.i_height = 128, 96
    for k, v in kw.items():
        obj = p
        parts = k.split(".")
        for part in parts[:-1]:
            obj = getattr(obj, part)
        setattr(obj, parts[-1], v)
    return validate_parameters(p)


def test_keyint1_forces_off():
    p = _p(b_intra_refresh=1, i_keyint_max=1)
    assert p.b_intra_refresh == 0


def test_ref_clamped_to_1():
    p = _p(b_intra_refresh=1, i_frame_reference=3)
    assert p.i_frame_reference == 1
    assert p.i_dpb_size == 1


def test_sps_frame_num_sizing():
    # 1920 wide -> mb_width 120; keyint 250 -> time_to_recovery =
    # min(119, 250) - 1 = 118 -> max_frame_num >= 119 -> log2 >= 7
    p = _p(i_width=1920, i_height=1088, b_intra_refresh=1,
           i_keyint_max=250)
    sps = SPS.init(p, 0)
    assert (1 << sps.i_log2_max_frame_num) > 118
    p0 = _p(i_width=1920, i_height=1088, i_keyint_max=250)
    sps0 = SPS.init(p0, 0)
    assert sps0.i_log2_max_frame_num < sps.i_log2_max_frame_num


def test_keyint_applies_only_to_frame0():
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 256, (96, 128)).astype(np.uint8)
    p = _p(b_intra_refresh=1, i_keyint_max=4, i_scenecut_threshold=0)
    dec = SlicetypeDecider(p)
    types = [dec.decide(frame + (i % 2))[0] for i in range(10)]
    assert types[0] == P.SLICE_TYPE_I
    assert all(t == P.SLICE_TYPE_P for t in types[1:])
    # control: without intra refresh keyint 4 forces an I every 4
    p2 = _p(i_keyint_max=4, i_scenecut_threshold=0)
    dec2 = SlicetypeDecider(p2)
    types2 = [dec2.decide(frame + (i % 2))[0] for i in range(10)]
    assert types2[4] == P.SLICE_TYPE_I


def test_param2string_mentions_it():
    p = _p(b_intra_refresh=1)
    assert "intra_refresh=1" in P.param2string(p)
