"""Device CABAC front-half: op streams must reproduce the host residual
binarization bin-for-bin (encoder/cabac.c:489-556), and the native
consume path must be byte-identical to full host binarization."""

import numpy as np
import pytest

from x264dsp_tpu.entropy import cabac as C
from x264dsp_tpu.entropy import cabac_device as CDV


class RecordingCabac:
    """Captures the (ctx, bin)/(bypass bit) sequence in the device op
    encoding instead of arithmetic-coding it."""

    def __init__(self):
        self.ops = []

    def decision(self, ctx, b):
        self.ops.append(ctx * 2 + (1 if b else 0))

    def bypass(self, b):
        self.ops.append(1024 + (b & 1))

    def ue_bypass(self, exp_bits, val):
        k = exp_bits
        while val >= (1 << k):
            self.bypass(-1)
            val -= 1 << k
            k += 1
        self.bypass(0)
        while k > 0:
            k -= 1
            self.bypass(-((val >> k) & 1))


def expected_ops(levels, cat):
    rc = RecordingCabac()
    n = C.COUNT_M1[cat] + 1
    C.write_block_residual(rc, cat, np.asarray(levels[:n]))
    return rc.ops


def random_block(rng, cat, density, big):
    n = {0: 16, 1: 15, 2: 16, 3: 4, 4: 15}[cat]
    lv = np.zeros(16, np.int32)
    k = max(1, int(density * n))
    pos = rng.choice(n, size=k, replace=False)
    mag = rng.integers(1, 2500 if big else 12, size=k)
    sgn = rng.choice([-1, 1], size=k)
    lv[pos] = mag * sgn
    return lv


@pytest.mark.parametrize("cat", [0, 1, 2, 3, 4])
def test_block_ops_match_host_binarization(cat):
    rng = np.random.default_rng(7 + cat)
    blocks, cats, want = [], [], []
    for density in (0.1, 0.4, 0.9):
        for big in (False, True):
            for _ in range(6):
                lv = random_block(rng, cat, density, big)
                blocks.append(lv)
                cats.append(cat)
                want.append(expected_ops(lv, cat))
    # single-coefficient edges: first pos, last valid pos, escape at 15
    n = {0: 16, 1: 15, 2: 16, 3: 4, 4: 15}[cat]
    for pos, val in [(0, 1), (n - 1, -1), (0, 15), (n - 1, 2000),
                     (0, -14)]:
        lv = np.zeros(16, np.int32)
        lv[pos] = val
        blocks.append(lv)
        cats.append(cat)
        want.append(expected_ops(lv, cat))
    import jax.numpy as jnp
    ops, cnt = CDV._block_ops_batched(jnp.asarray(np.stack(blocks)),
                                      jnp.asarray(np.array(cats)))
    ops, cnt = np.asarray(ops), np.asarray(cnt)
    for b, exp in enumerate(want):
        # the analytic count is exact even past PAD (the frame packer
        # flags >= PAD as overflow and the host falls back to full
        # binarization); generated ops are a PAD-truncated prefix
        assert cnt[b] == len(exp), (f"cat{cat} block {b} count "
                                    f"{cnt[b]} != {len(exp)}")
        upto = min(len(exp), CDV.PAD)
        got = ops[b, :upto].tolist()
        assert got == exp[:upto], (
            f"cat{cat} block {b}: {blocks[b].tolist()}\n"
            f"want {exp[:upto]}\ngot  {got}")


def test_block_ops_empty_block():
    import jax.numpy as jnp
    lv = np.zeros((1, 16), np.int32)
    ops, cnt = CDV._block_ops_batched(jnp.asarray(lv),
                                      jnp.asarray([2], np.int32))
    assert int(cnt[0]) == 0


def test_frame_stream_layout_and_slots():
    """residual_ops_frame must place each block's ops at its slot's
    offsets, luma slots switching cat by is_i16 and AC slots dropping
    coefficient 0."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    mb_h = mb_w = 2
    nmb = 4
    ll = rng.integers(-9, 9, (nmb, 16, 16)).astype(np.int32)
    ldc = rng.integers(-9, 9, (nmb, 16)).astype(np.int32)
    cdc = rng.integers(-9, 9, (nmb, 2, 4)).astype(np.int32)
    cac = rng.integers(-9, 9, (nmb, 2, 4, 16)).astype(np.int32)
    i16 = np.array([1, 0, 0, 1], np.int32)
    cap = 1 << 14
    ops, off, ov = CDV.residual_ops_frame(
        jnp.asarray(ll), jnp.asarray(ldc), jnp.asarray(cdc),
        jnp.asarray(cac), jnp.asarray(i16), mb_h, mb_w, cap)
    ops, off = np.asarray(ops), np.asarray(off)
    assert not bool(ov)
    for mb in range(nmb):
        base = mb * CDV.SLOTS
        # slot 0: luma DC cat0
        got = ops[off[base]:off[base + 1]].tolist()
        assert got == expected_ops(ldc[mb], 0)
        # luma slots
        for i in range(16):
            got = ops[off[base + 1 + i]:off[base + 2 + i]].tolist()
            if i16[mb]:
                assert got == expected_ops(ll[mb, i, 1:], 1)
            else:
                assert got == expected_ops(ll[mb, i], 2)
        for ch in range(2):
            got = ops[off[base + 17 + ch]:off[base + 18 + ch]].tolist()
            assert got == expected_ops(cdc[mb, ch], 3)
        for ch in range(2):
            for i in range(4):
                s = base + 19 + ch * 4 + i
                got = ops[off[s]:off[s + 1]].tolist()
                assert got == expected_ops(cac[mb, ch, i, 1:], 4)


def test_frame_stream_overflow_flag():
    """A block whose escape chains exceed PAD ops must raise the
    overflow flag (host falls back to full binarization)."""
    import jax.numpy as jnp
    nmb = 1
    ll = np.zeros((nmb, 16, 16), np.int32)
    ll[0, 0, :] = 2000        # 16 escape coeffs: 16*(16+2*11) ops > PAD
    ldc = np.zeros((nmb, 16), np.int32)
    cdc = np.zeros((nmb, 2, 4), np.int32)
    cac = np.zeros((nmb, 2, 4, 16), np.int32)
    ops, off, ov = CDV.residual_ops_frame(
        jnp.asarray(ll), jnp.asarray(ldc), jnp.asarray(cdc),
        jnp.asarray(cac), jnp.asarray(np.zeros(nmb, np.int32)), 1, 1,
        1 << 14)
    assert bool(ov)
