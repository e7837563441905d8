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


def _syn_frame(rng, mb_h, mb_w, is_p):
    """Random but self-consistent slice syntax: nnz/cbp derived from the
    generated levels so host binarization and device ops agree on which
    blocks are coded."""
    nmb = mb_h * mb_w

    def sparse(shape, ncoeff, p_escape=0.04):
        lv = np.zeros(shape + (16,), np.int16)
        flat = lv.reshape(-1, 16)
        for b in range(flat.shape[0]):
            k = rng.integers(0, ncoeff + 1)
            if k == 0:
                continue
            pos = rng.choice(ncoeff, size=k, replace=False)
            mag = np.where(rng.random(k) < p_escape,
                           rng.integers(15, 600, k),
                           rng.integers(1, 9, k))
            flat[b, pos] = (mag * rng.choice([-1, 1], size=k)).astype(
                np.int16)
        return lv

    mb_type = (rng.random(nmb) < 0.5).astype(np.int16) if not is_p \
        else np.full(nmb, 2, np.int16)           # I: mix i16/i4
    is_i16 = (mb_type == 0) & (not is_p)
    luma_levels = sparse((nmb, 16), 16)
    # i16 MBs code only AC 1..15; zero the DC slot for clarity
    luma_levels[is_i16, :, 0] = 0
    coded_view = luma_levels.copy()
    luma_nnz = (np.abs(coded_view) > 0).sum(-1).astype(np.int16)
    cbp_luma = ((luma_nnz.reshape(nmb, 4, 4) > 0).any(-1)
                * (1 << np.arange(4))).sum(-1).astype(np.int16)
    luma_dc_levels = sparse((nmb,), 16, 0.02).astype(np.int16)
    luma_dc_levels[~is_i16] = 0
    nz_luma_dc = (np.abs(luma_dc_levels) > 0).any(-1).astype(np.int16)
    cdc = sparse((nmb, 2), 4, 0.02)[..., :4].astype(np.int16)
    cac = sparse((nmb, 2, 4), 15)
    cac = np.concatenate([np.zeros(cac.shape[:-1] + (1,), np.int16),
                          cac[..., :15]], axis=-1)
    chroma_nz_dc = (np.abs(cdc) > 0).any(-1).astype(np.int16)
    chroma_nnz_ac = (np.abs(cac) > 0).any(-1).astype(np.int16)
    cbp_chroma = np.where(
        chroma_nnz_ac.any((-2, -1)), 2,
        np.where(chroma_nz_dc.any(-1), 1, 0)).astype(np.int16)
    # keep chroma AC consistent with cbp: when cbp < 2 the writer skips
    # AC blocks entirely, which is fine either way
    mv = np.zeros((nmb, 2), np.int16)
    if is_p:
        mv[:, 0] = rng.integers(-32, 33, nmb) * 2
        mv[:, 1] = rng.integers(-16, 17, nmb) * 2
    syn = {
        "mb_type": mb_type.reshape(mb_h, mb_w),
        "i16_mode": rng.integers(0, 4, nmb).astype(np.int16).reshape(
            mb_h, mb_w),
        "i4_modes": rng.integers(0, 9, nmb * 16).astype(np.int16).reshape(
            mb_h, mb_w, 16),
        "chroma_mode": rng.integers(0, 4, nmb).astype(np.int16).reshape(
            mb_h, mb_w),
        "cbp_luma": cbp_luma.reshape(mb_h, mb_w),
        "cbp_chroma": cbp_chroma.reshape(mb_h, mb_w),
        "nz_luma_dc": nz_luma_dc.reshape(mb_h, mb_w),
        "chroma_nz_dc": chroma_nz_dc.reshape(mb_h, mb_w, 2),
        "luma_nnz": luma_nnz.reshape(mb_h, mb_w, 16),
        "chroma_nnz_ac": chroma_nnz_ac.reshape(mb_h, mb_w, 2, 4),
        "luma_levels": luma_levels.reshape(mb_h, mb_w, 16, 16),
        "luma_dc_levels": luma_dc_levels.reshape(mb_h, mb_w, 16),
        "chroma_dc_levels": cdc.reshape(mb_h, mb_w, 2, 4),
        "chroma_ac_levels": cac.reshape(mb_h, mb_w, 2, 4, 16),
        "mv": mv.reshape(mb_h, mb_w, 2),
        "partition": rng.integers(0, 4, nmb).astype(np.int16).reshape(
            mb_h, mb_w),
        "mv8": np.broadcast_to(mv.reshape(mb_h, mb_w, 1, 1, 2),
                               (mb_h, mb_w, 2, 2, 2)).copy(),
        "ref": np.zeros((mb_h, mb_w), np.int16),
    }
    return syn, is_i16


@pytest.mark.parametrize("is_p", [False, True])
def test_native_consume_byte_identity(is_p):
    """write_slice_cabac fed the device op stream must produce the exact
    bytes of full host binarization (encoder/cabac.c:571 parity through
    the split front-half)."""
    import jax.numpy as jnp
    from x264dsp_tpu.entropy import native
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11 + is_p)
    mb_h, mb_w = 4, 6
    syn, is_i16 = _syn_frame(rng, mb_h, mb_w, is_p)
    header = bytes([0x40])
    ref, _ = native.write_slice_cabac(header, mb_w, mb_h, 26, 1, is_p, syn)
    ops, off, ov = CDV.residual_ops_frame(
        jnp.asarray(syn["luma_levels"].astype(np.int32)),
        jnp.asarray(syn["luma_dc_levels"].astype(np.int32)),
        jnp.asarray(syn["chroma_dc_levels"].astype(np.int32)),
        jnp.asarray(syn["chroma_ac_levels"].astype(np.int32)),
        jnp.asarray(is_i16.astype(np.int32)), mb_h, mb_w, 1 << 18)
    assert not bool(ov)
    got, _ = native.write_slice_cabac(header, mb_w, mb_h, 26, 1, is_p, syn,
                                      res_ops=np.asarray(ops),
                                      res_off=np.asarray(off))
    assert got == ref


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
