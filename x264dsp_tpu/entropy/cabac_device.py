"""Device CABAC front-half: residual binarization + context-index streams.

The reference runs the whole CABAC writer on its one accelerator core
(/root/reference/encoder/cabac.c:571, engine common/cabac.c:517-613). On
TPU the bin-serial arithmetic loop stays on the host, but everything it
consumes can be computed on device: this module emits, for every 4x4/2x2
residual block of a frame, the exact (context, bin) decision/bypass
sequence that x264_cabac_block_residual (encoder/cabac.c:489-556) would
produce — significance map, last flags, level prefix chains with the
node_ctx automaton, UEG0 escapes and sign bypasses. The host C++ writer
(entropy/native/entropy.cpp x264tpu_write_slice_cabac, ops variant) then
replaces its per-block binarization with a branch-light consume loop over
the packed op stream — the residual bins are ~80-90% of a slice's bins,
so the host stage collapses toward the pure arithmetic floor
(ENTROPY_r04's ceiling analysis).

Op encoding (int16):
    0..551   -> decision(ctx = op >> 1, bin = op & 1)   [ctx < 276]
    1024/1025-> bypass(bit = op & 1)

Block slots per MB (matching the C++ writer's emission order; the host
walks MBs in raster order and consumes slot streams only for the blocks
it actually codes, so inclusion logic stays host-side):
    0        luma DC      (cat0, 16 coeffs; i16 MBs only)
    1..16    luma 4x4 i   (cat1 15 coeffs if i16 else cat2 16 coeffs)
    17..18   chroma DC ch (cat3, 4 coeffs)
    19..26   chroma AC    (cat4, 15 coeffs, ch*4 + i)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# residual tables (encoder/cabac.c:458-487)
_SIG_OFF = jnp.array([105, 120, 134, 149, 152], jnp.int32)
_LAST_OFF = jnp.array([166, 181, 195, 210, 213], jnp.int32)
_LEVEL_OFF = jnp.array([227, 237, 247, 257, 266], jnp.int32)
_COUNT_M1 = jnp.array([15, 14, 15, 3, 14], jnp.int32)
_LEVEL1_CTX = jnp.array([1, 2, 3, 4, 0, 0, 0, 0], jnp.int32)
_LEVELGT1_CTX = jnp.array([5, 5, 5, 5, 6, 7, 8, 9], jnp.int32)
_LEVEL_TRANS = jnp.array([[1, 2, 3, 3, 4, 5, 6, 7],
                          [4, 4, 4, 4, 5, 6, 7, 7]], jnp.int32)

_BYPASS = 1024
SLOTS = 27          # residual block slots per MB (module docstring)
PAD = 320           # per-block op capacity; > 31 + 16*15 = 271 (worst
                    # escape-free block), escapes overflow -> host fallback


def _ilog2(x):
    """floor(log2(x)) for int32 x >= 1, exact (float log2 can misround
    at powers of two). x <= 2^15 here (dctcoef escape values)."""
    m = jnp.zeros_like(x)
    for k in range(1, 16):
        m += (x >= (1 << k)).astype(jnp.int32)
    return m


def _block_ops(levels, cat):
    """Op stream for ONE residual block. levels: (16,) int32 zigzag
    (positions >= n zeroed by the caller); cat: () int32. Returns
    (ops (PAD,) int16, count () int32). Empty blocks (no nonzero) return
    count 0 — the host only consumes blocks it codes (cbf=1)."""
    idx = jnp.arange(16, dtype=jnp.int32)
    nz = (levels != 0)
    any_nz = nz.any()
    last = jnp.max(jnp.where(nz, idx, -1))
    count_m1 = _COUNT_M1[cat]
    sig_off, last_off = _SIG_OFF[cat], _LAST_OFF[cat]
    level_off = _LEVEL_OFF[cat]

    # -- phase A: significance + last flags (cabac.c:519-538) --
    # loop visits i = 0..min(last, count_m1-1); every visit emits a sig
    # decision; visits with levels[i] != 0 also emit a last decision
    # (bin 1 iff i == last; when last == count_m1 the loop never reaches
    # it and coeff[count_m1] is appended without any sig/last bins).
    last_eff = jnp.minimum(last, count_m1 - 1)
    present = idx <= last_eff
    has_last = present & nz
    a_cnt_i = present.astype(jnp.int32) + has_last.astype(jnp.int32)
    a_pref = jnp.cumsum(a_cnt_i) - a_cnt_i          # ops before slot i
    count_a = a_pref[-1] + a_cnt_i[-1]

    # -- phase B: levels, reversed scan order (cabac.c:540-556) --
    # reversed nonzero levels: stable-sort the reversed block by
    # "is zero" so nonzeros come first, order preserved
    rev = levels[::-1]
    order = jnp.argsort(rev == 0, stable=True)
    coeffs = rev[order]                              # nonzeros first
    nco = nz.sum()
    k_valid = idx < nco
    absv = jnp.abs(coeffs)
    gt1 = (absv > 1) & k_valid
    # per-coeff bin count f(abs): abs==1 -> 2 (gt1 bin + sign);
    # 2<=abs<15 -> abs+1; abs>=15 -> 16 + 2*floor(log2(abs-14))
    esc = absv >= 15
    v = jnp.maximum(absv - 15, 0)
    m = jnp.where(esc, _ilog2(v + 1), 0)
    b_cnt_k = jnp.where(
        absv <= 1, 2, jnp.where(esc, 16 + 2 * m, absv + 1)
    ).astype(jnp.int32) * k_valid
    b_pref = jnp.cumsum(b_cnt_k) - b_cnt_k
    count_b = b_pref[-1] + b_cnt_k[-1]

    # node_ctx automaton over the reversed coeffs (16-step unroll)
    nodes = [jnp.int32(0)]
    for k in range(15):
        nodes.append(_LEVEL_TRANS[gt1[k].astype(jnp.int32), nodes[-1]])
    node_k = jnp.stack(nodes)                        # (16,)

    count = jnp.where(any_nz, count_a + count_b, 0)

    # -- positional op generation over the PAD slots --
    pos = jnp.arange(PAD, dtype=jnp.int32)
    in_a = pos < count_a

    # phase A: which i does position p fall in?
    ia = jnp.searchsorted(a_pref + a_cnt_i, pos, side="right")
    ia = jnp.clip(ia, 0, 15)
    sub_a = pos - a_pref[ia]                         # 0 = sig, 1 = last
    sig_bin = nz[ia].astype(jnp.int32)
    last_bin = (ia == last).astype(jnp.int32)
    op_a = jnp.where(sub_a == 0,
                     (sig_off + ia) * 2 + sig_bin,
                     (last_off + ia) * 2 + last_bin)

    # phase B: which reversed coeff k, which sub-op j?
    pb = pos - count_a
    kb = jnp.searchsorted(b_pref + b_cnt_k, pb, side="right")
    kb = jnp.clip(kb, 0, 15)
    j = pb - b_pref[kb]
    a_k = absv[kb]
    sgn_k = (coeffs[kb] < 0).astype(jnp.int32)
    node = node_k[kb]
    esc_k = a_k >= 15
    v_k = jnp.maximum(a_k - 15, 0)
    m_k = jnp.where(esc_k, _ilog2(v_k + 1), 0)
    reps = jnp.maximum(jnp.minimum(a_k, 15) - 2, 0)
    ctx1 = level_off + _LEVEL1_CTX[node]
    ctxg = level_off + _LEVELGT1_CTX[node]
    gt1_bin = (a_k > 1).astype(jnp.int32)
    nb_k = b_cnt_k[kb]

    # j == 0: gt1 decision. abs==1: j==1 sign bypass.
    # 1 < abs < 15: j in [1,reps] -> GT1 ctx bin 1; j==reps+1 -> GT1
    #   bin 0; j==reps+2 -> sign.
    # abs>=15: j in [1,13] -> GT1 bin 1; j in [14, 13+m] -> bypass 1;
    #   j==14+m -> bypass 0; j in [15+m, 14+2m] -> bypass suffix bit;
    #   j==nb-1 -> sign. suffix value = v+1-2^m over m bits, MSB first.
    suffix = v_k + 1 - (jnp.int32(1) << m_k)
    bit_ix = m_k - 1 - (j - (15 + m_k))              # suffix bit index
    suffix_bit = (suffix >> jnp.clip(bit_ix, 0, 30)) & 1
    op_b = jnp.where(
        j == 0, ctx1 * 2 + gt1_bin,
        jnp.where(
            j == nb_k - 1, _BYPASS + sgn_k,
            jnp.where(
                ~esc_k,
                jnp.where(j <= reps, ctxg * 2 + 1, ctxg * 2),
                jnp.where(
                    j <= 13, ctxg * 2 + 1,
                    jnp.where(j <= 13 + m_k, _BYPASS + 1,
                              jnp.where(j == 14 + m_k, _BYPASS,
                                        _BYPASS + suffix_bit))))))

    ops = jnp.where(pos < count, jnp.where(in_a, op_a, op_b), 0)
    return ops.astype(jnp.int16), count


_block_ops_batched = jax.vmap(_block_ops)


@functools.partial(jax.jit, static_argnames=("mb_h", "mb_w", "cap_ops"))
def residual_ops_frame(luma_levels, luma_dc_levels, chroma_dc_levels,
                       chroma_ac_levels, is_i16, mb_h: int, mb_w: int,
                       cap_ops: int):
    """Per-frame residual op streams for the CABAC host consume loop.

    luma_levels (MB,16,16), luma_dc_levels (MB,16), chroma_dc_levels
    (MB,2,4), chroma_ac_levels (MB,2,4,16) int zigzag; is_i16 (MB,) bool
    (selects cat1 15-coeff AC vs cat2 16-coeff for luma slots).

    Returns (ops_flat (cap_ops,) int16, block_off (MB*SLOTS+1,) int32,
    overflow () bool). Slot order per MB as in the module docstring;
    block_off[b]..block_off[b+1] delimit block b's ops in ops_flat.
    overflow is set when any block exceeds PAD ops (a >=15 escape chain
    beyond the bound) or the frame exceeds cap_ops — the host then falls
    back to full binarization for the slice (byte-identical, slower)."""
    nmb = mb_h * mb_w
    i16 = is_i16.reshape(nmb).astype(jnp.int32)

    def pad16(x, n):
        z = jnp.zeros(x.shape[:-1] + (16 - n,), x.dtype)
        return jnp.concatenate([x[..., :n], z], axis=-1)

    # luma slots: i16 MBs code AC coeffs 1..15 as cat1; others 0..15 cat2
    ll = luma_levels.reshape(nmb, 16, 16).astype(jnp.int32)
    lev_luma = jnp.where(i16[:, None, None] == 1,
                         pad16(jnp.roll(ll, -1, axis=-1), 15), ll)
    cat_luma = jnp.where(i16 == 1, 1, 2)[:, None].repeat(16, 1)

    lev_dc = pad16(luma_dc_levels.reshape(nmb, 1, 16).astype(jnp.int32), 16)
    cat_dc = jnp.zeros((nmb, 1), jnp.int32)

    lev_cdc = pad16(chroma_dc_levels.reshape(nmb, 2, 4).astype(jnp.int32), 4)
    cat_cdc = jnp.full((nmb, 2), 3, jnp.int32)

    cac = chroma_ac_levels.reshape(nmb, 8, 16).astype(jnp.int32)
    lev_cac = pad16(jnp.roll(cac, -1, axis=-1), 15)
    cat_cac = jnp.full((nmb, 8), 4, jnp.int32)

    levels = jnp.concatenate([lev_dc, lev_luma, lev_cdc, lev_cac], axis=1)
    cats = jnp.concatenate([cat_dc, cat_luma, cat_cdc, cat_cac], axis=1)
    B = nmb * SLOTS
    ops_pad, counts = _block_ops_batched(levels.reshape(B, 16),
                                         cats.reshape(B))

    overflow = (counts >= PAD).any()
    off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(counts, dtype=jnp.int32)])
    total = off[-1]
    overflow |= total > cap_ops

    # flat compaction: ops_flat[p] = ops_pad[block(p), p - off[block(p)]]
    p = jnp.arange(cap_ops, dtype=jnp.int32)
    blk = jnp.clip(jnp.searchsorted(off[1:], p, side="right"), 0, B - 1)
    l = p - off[blk]
    flat = ops_pad.reshape(-1)[blk * PAD + jnp.clip(l, 0, PAD - 1)]
    ops_flat = jnp.where(p < total, flat, 0).astype(jnp.int16)
    return ops_flat, off, overflow
