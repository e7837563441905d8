"""Skewed-layout wavefront deblock: the whole frame in ONE Pallas call
with NO per-slot gathers.

The deblock dependency graph (left, top, topright — common/deblock.c
raster MB order) admits the 2:1 wavefront x + 2y = d. Instead of
gathering each diagonal's MB regions out of a flat plane (the
ops/pallas/deblock_wave formulation: K one-hot matmul gathers + K
scatters per step, ~160 us/step), the planes are pre-SKEWED so diagonal
d is a contiguous tile column:

    SKY[d, j, 4 + 16*y + r] = Y[16*y + r, 16*(d - 2*y) + j]

i.e. tile column d stacks the MBs of diagonal d by their MB row y, with
pixel COLUMNS on sublanes (j) and pixel ROWS on lanes. Vertical-edge
filtering is then arithmetic between single sublanes over all lanes
(full VPU lane utilization, every slot of the diagonal at once), and
horizontal-edge filtering is lane-shifted arithmetic on the full
(16, L) tile column — pltpu.roll, no gathers, no matmuls.

Cross-column halos ride a 3-deep VMEM ring of the last columns'
results: processing column d reads its left halo from ring[d-1]
(sublanes 12..15 = the left MB's right columns) and its top halo from
ring[d-2] (same sublanes, lanes 16y-4..16y-1 = the top MB's bottom
rows), and writes the v-edge-0 p-pixels back into ring[d-1] and the
h-edge-0 p-pixels into ring[d-2] — exactly the reference's cross-MB
writes (deblock_edge p-side, common/deblock.c:80-295). Column d-2 is
final after step d and is emitted through a lagged output BlockSpec.

Filter math is shared with ops/deblock.py (bit-exact, test-enforced
against the scalar golden model). Per-step cost is ~10 us vs ~160 us
for the gather formulation: 41 ms -> ~4 ms at 1080p.

Parameter streams (built by ops/deblock._skew_param_lanes): per-lane
alpha/beta/tc0/enable/use-intra vectors per diagonal. Internal edges
share one a/b/en/ui set (same QP); tc0 is per-edge (bs differs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..deblock import (_filter_intra_chroma, _filter_intra_luma,
                       _filter_normal_chroma, _filter_normal_luma)


def _roll(a, k: int):
    """Lane-axis roll by k (may be negative): out[.., l] = a[.., l - k]."""
    L = a.shape[-1]
    return pltpu.roll(a, k % L, axis=a.ndim - 1)


def _edge_luma(p3, p2, p1, p0, q0, q1, q2, q3, a, b, tc0, en, ui,
               intra_mode: str):
    """One luma edge with the static intra specialization applied:
    'none' = normal filter only (P frames — intra-in-P is compiled out
    of the reference fork, encoder/analyse.c:1214-1219), 'all' = intra
    filter only (I frames: every MB-boundary edge has bs 4), 'mixed' =
    both + per-lane ui select. Internal edges always pass 'none' (the
    param builder zeroes ui for them — same-MB edges never use the
    intra filter, common/deblock.c:341-430)."""
    if intra_mode == "none":
        p1n, p0n, q0n, q1n = _filter_normal_luma(
            p3, p2, p1, p0, q0, q1, q2, q3, a, b, tc0)
        return (p2, jnp.where(en, p1n, p1), jnp.where(en, p0n, p0),
                jnp.where(en, q0n, q0), jnp.where(en, q1n, q1), q2)
    if intra_mode == "all":
        p2i, p1i, p0i, q0i, q1i, q2i = _filter_intra_luma(
            p3, p2, p1, p0, q0, q1, q2, q3, a, b)
        return (jnp.where(en, p2i, p2), jnp.where(en, p1i, p1),
                jnp.where(en, p0i, p0), jnp.where(en, q0i, q0),
                jnp.where(en, q1i, q1), jnp.where(en, q2i, q2))
    p1n, p0n, q0n, q1n = _filter_normal_luma(
        p3, p2, p1, p0, q0, q1, q2, q3, a, b, tc0)
    p2i, p1i, p0i, q0i, q1i, q2i = _filter_intra_luma(
        p3, p2, p1, p0, q0, q1, q2, q3, a, b)
    return (jnp.where(en & ui, p2i, p2),
            jnp.where(en, jnp.where(ui, p1i, p1n), p1),
            jnp.where(en, jnp.where(ui, p0i, p0n), p0),
            jnp.where(en, jnp.where(ui, q0i, q0n), q0),
            jnp.where(en, jnp.where(ui, q1i, q1n), q1),
            jnp.where(en & ui, q2i, q2))


def _edge_chroma(p1, p0, q0, q1, a, b, tc, en, ui, intra_mode: str):
    """Chroma twin of _edge_luma."""
    if intra_mode == "none":
        p0n, q0n = _filter_normal_chroma(p1, p0, q0, q1, a, b, tc)
        return jnp.where(en, p0n, p0), jnp.where(en, q0n, q0)
    if intra_mode == "all":
        p0i, q0i = _filter_intra_chroma(p1, p0, q0, q1, a, b)
        return jnp.where(en, p0i, p0), jnp.where(en, q0i, q0)
    p0n, q0n = _filter_normal_chroma(p1, p0, q0, q1, a, b, tc)
    p0i, q0i = _filter_intra_chroma(p1, p0, q0, q1, a, b)
    return (jnp.where(en, jnp.where(ui, p0i, p0n), p0),
            jnp.where(en, jnp.where(ui, q0i, q0n), q0))


def _kernel(n_diag: int, L: int, Lc: int, intra_mode: str,
            yin, cin, pla, pca, yout, cout, ry, rc):
    """pla (1, 1, 36, L): packed luma params — k 0..7 = v-edge a/b/en/ui
    for slots (edge0, internal); k 8..11 = v tc0 per edge; k 12..19 =
    h-edge a/b/en/ui slots; k 20..35 = h tc0 per (edge, column group).
    pca (1, 1, 26, Lc): chroma twin — k 0..7 pvc, 8..9 tvc, 10..17 phc,
    18..25 thc."""
    d = pl.program_id(1)
    cur = jax.lax.rem(d, 3)
    prv = jax.lax.rem(d + 2, 3)    # (d - 1) % 3
    prv2 = jax.lax.rem(d + 1, 3)   # (d - 2) % 3

    @pl.when(d < n_diag)
    def _compute():
        ry[cur] = yin[0, 0]
        rc[cur] = cin[0, 0]

        # ---------------- luma vertical edges (4 sequential phases) ----
        for e in range(4):
            s = 0 if e == 0 else 1
            mode = intra_mode if e == 0 else "none"
            a = pla[0, 0, 4 * s + 0:4 * s + 1]
            b = pla[0, 0, 4 * s + 1:4 * s + 2]
            en = pla[0, 0, 4 * s + 2:4 * s + 3] != 0
            ui = pla[0, 0, 4 * s + 3:4 * s + 4] != 0
            tc0 = pla[0, 0, 8 + e:9 + e]
            c = 4 * e
            if e == 0:
                p3 = ry[prv, 12:13]
                p2 = ry[prv, 13:14]
                p1 = ry[prv, 14:15]
                p0 = ry[prv, 15:16]
            else:
                p3 = ry[cur, c - 4:c - 3]
                p2 = ry[cur, c - 3:c - 2]
                p1 = ry[cur, c - 2:c - 1]
                p0 = ry[cur, c - 1:c]
            q0 = ry[cur, c:c + 1]
            q1 = ry[cur, c + 1:c + 2]
            q2 = ry[cur, c + 2:c + 3]
            q3 = ry[cur, c + 3:c + 4]
            wp2, wp1, wp0, wq0, wq1, wq2 = _edge_luma(
                p3, p2, p1, p0, q0, q1, q2, q3, a, b, tc0, en, ui, mode)
            if e == 0:
                ry[prv, 13:14] = wp2
                ry[prv, 14:15] = wp1
                ry[prv, 15:16] = wp0
            else:
                ry[cur, c - 3:c - 2] = wp2
                ry[cur, c - 2:c - 1] = wp1
                ry[cur, c - 1:c] = wp0
            ry[cur, c:c + 1] = wq0
            ry[cur, c + 1:c + 2] = wq1
            ry[cur, c + 2:c + 3] = wq2

        # ---------------- luma horizontal edges (4 phases, lane rolls) -
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        for e in range(4):
            s = 0 if e == 0 else 1
            mode = intra_mode if e == 0 else "none"
            a = pla[0, 0, 12 + 4 * s + 0:12 + 4 * s + 1]
            b = pla[0, 0, 12 + 4 * s + 1:12 + 4 * s + 2]
            en_slot = pla[0, 0, 12 + 4 * s + 2:12 + 4 * s + 3] != 0
            ui = pla[0, 0, 12 + 4 * s + 3:12 + 4 * s + 4] != 0
            # edge lanes: l = 4 + 16y + 4e (lax.rem is C-style; negative
            # remainders at the l<4 halo never equal 4e)
            en = en_slot & (jax.lax.rem(lane_i - 4, 16) == 4 * e)
            tg = pla[0, 0, 20 + 4 * e:24 + 4 * e]           # (4, L)
            tc0 = jnp.broadcast_to(tg[:, None, :], (4, 4, L)).reshape(16, L)
            X = ry[cur]
            T = ry[prv2] if e == 0 else X
            P0 = _roll(T, 1)
            P1 = _roll(T, 2)
            P2 = _roll(T, 3)
            P3 = _roll(T, 4)
            Q0 = X
            Q1 = _roll(X, -1)
            Q2 = _roll(X, -2)
            Q3 = _roll(X, -3)
            wp2, wp1, wp0, wq0, wq1, wq2 = _edge_luma(
                P3, P2, P1, P0, Q0, Q1, Q2, Q3, a, b, tc0, en, ui, mode)
            qadd = (wq0 - Q0) + _roll(wq1 - Q1, 1)
            padd = _roll(wp0 - P0, -1) + _roll(wp1 - P1, -2)
            if mode != "none":
                qadd = qadd + _roll(wq2 - Q2, 2)
                padd = padd + _roll(wp2 - P2, -3)
            if e == 0:
                ry[cur] = X + qadd
                ry[prv2] = ry[prv2] + padd
            else:
                ry[cur] = X + qadd + padd

        # ---------------- chroma vertical edges (2 phases x 2 chans) ---
        for e in range(2):
            mode = intra_mode if e == 0 else "none"
            a = pca[0, 0, 4 * e + 0:4 * e + 1]
            b = pca[0, 0, 4 * e + 1:4 * e + 2]
            en = pca[0, 0, 4 * e + 2:4 * e + 3] != 0
            ui = pca[0, 0, 4 * e + 3:4 * e + 4] != 0
            tc = pca[0, 0, 8 + e:9 + e]
            c = 4 * e
            for ch in range(2):
                base = 8 * ch
                if e == 0:
                    p1 = rc[prv, base + 6:base + 7]
                    p0 = rc[prv, base + 7:base + 8]
                else:
                    p1 = rc[cur, base + 2:base + 3]
                    p0 = rc[cur, base + 3:base + 4]
                q0 = rc[cur, base + c:base + c + 1]
                q1 = rc[cur, base + c + 1:base + c + 2]
                wp0, wq0 = _edge_chroma(p1, p0, q0, q1, a, b, tc, en, ui,
                                        mode)
                if e == 0:
                    rc[prv, base + 7:base + 8] = wp0
                else:
                    rc[cur, base + 3:base + 4] = wp0
                rc[cur, base + c:base + c + 1] = wq0

        # ---------------- chroma horizontal edges (2 phases) -----------
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, Lc), 1)
        for e in range(2):
            mode = intra_mode if e == 0 else "none"
            a = pca[0, 0, 10 + 4 * e + 0:10 + 4 * e + 1]
            b = pca[0, 0, 10 + 4 * e + 1:10 + 4 * e + 2]
            en_slot = pca[0, 0, 10 + 4 * e + 2:10 + 4 * e + 3] != 0
            ui = pca[0, 0, 10 + 4 * e + 3:10 + 4 * e + 4] != 0
            en = en_slot & (jax.lax.rem(lane_c - 4, 8) == 4 * e)
            tg = pca[0, 0, 18 + 4 * e:22 + 4 * e]           # (4, Lc)
            tc8 = jnp.broadcast_to(tg[:, None, :], (4, 2, Lc)).reshape(8, Lc)
            tc = jnp.concatenate([tc8, tc8], axis=0)        # (16, Lc)
            X = rc[cur]
            T = rc[prv2] if e == 0 else X
            P0 = _roll(T, 1)
            P1 = _roll(T, 2)
            Q0 = X
            Q1 = _roll(X, -1)
            wp0, wq0 = _edge_chroma(P1, P0, Q0, Q1, a, b, tc, en, ui, mode)
            dp0 = wp0 - P0
            dq0 = wq0 - Q0
            if e == 0:
                rc[cur] = X + dq0
                rc[prv2] = rc[prv2] + _roll(dp0, -1)
            else:
                rc[cur] = X + dq0 + _roll(dp0, -1)

    # column d-2 is final after this step's h-edge-0 p-writes
    @pl.when(d >= 2)
    def _emit():
        yout[0, 0] = ry[prv2]
        cout[0, 0] = rc[prv2]


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "interpret",
                                             "intra_mode"))
def deblock_skew_call(sky, skc, pla, pca,
                      mb_w: int, mb_h: int, interpret: bool = False,
                      intra_mode: str = "mixed"):
    """Run the skewed wavefront. sky: (S, n_diag, 16, L) int32 skewed
    luma; skc: (S, n_diag, 16, Lc) skewed chroma (u = sublanes 0..7,
    v = 8..15). pla (S, n_diag, 36, L) / pca (S, n_diag, 26, Lc):
    packed per-lane filter params (_kernel docstring has the channel
    map). intra_mode statically specializes MB-boundary edges
    ('none' = P frame, no intra MBs; 'all' = I frame; 'mixed' =
    per-lane select) — internal edges always compile the normal filter
    only. Returns filtered (sky, skc)."""
    S, n_diag, _, L = sky.shape
    Lc = skc.shape[-1]
    kernel = functools.partial(_kernel, n_diag, L, Lc, intra_mode)

    def blk(shp):
        nd = len(shp) - 2
        return pl.BlockSpec(
            (1, 1) + shp[2:],
            lambda si, d, nd=nd: (si, jnp.minimum(d, n_diag - 1))
            + (0,) * nd,
            memory_space=pltpu.VMEM)

    out_blk = lambda shp: pl.BlockSpec(
        (1, 1) + shp[2:],
        lambda si, d: (si, jnp.maximum(d - 2, 0)) + (0,) * (len(shp) - 2),
        memory_space=pltpu.VMEM)

    yout, cout = pl.pallas_call(
        kernel,
        grid=(S, n_diag + 2),
        in_specs=[blk(sky.shape), blk(skc.shape), blk(pla.shape),
                  blk(pca.shape)],
        out_specs=(out_blk(sky.shape), out_blk(skc.shape)),
        out_shape=(jax.ShapeDtypeStruct(sky.shape, jnp.int32),
                   jax.ShapeDtypeStruct(skc.shape, jnp.int32)),
        scratch_shapes=[pltpu.VMEM((3, 16, L), jnp.int32),
                        pltpu.VMEM((3, 16, Lc), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(sky, skc, pla, pca)
    return yout, cout


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def skew_plane(plane, mb_w: int, mb_h: int, tile: int):
    """(S, H, W) -> (S, n_diag, tile, L) skewed-transposed tile columns:
    out[s, d, j, 4 + tile*y + r] = plane[s, tile*y + r, tile*(d-2y) + j].

    Implemented with the pad-and-refold stride trick: padding each MB
    row of tiles to width n_diag + 2 and re-viewing the flattened
    (row, col) axes with a row stride 2 smaller shifts row y right by
    exactly 2y — the whole diagonal skew is one free major-axis reshape
    plus a single transposition, no per-diagonal scatters."""
    S = plane.shape[0]
    n_diag = mb_w + 2 * mb_h - 2
    L = _round_up(tile * mb_h + 8, 128)
    W2 = n_diag + 2
    t = plane.astype(jnp.int32).reshape(S, mb_h, tile, mb_w, tile)
    t = jnp.swapaxes(t, 2, 3)                       # (S, y, x, r, j)
    t = jnp.pad(t, ((0, 0), (0, 0), (0, W2 - mb_w), (0, 0), (0, 0)))
    t = t.reshape(S, mb_h * W2, tile, tile)[:, :mb_h * (W2 - 2)]
    sk = t.reshape(S, mb_h, n_diag, tile, tile)     # sk[y, d] = t[y, d-2y]
    sk = jnp.transpose(sk, (0, 2, 4, 1, 3))         # (S, d, j, y, r)
    sk = sk.reshape(S, n_diag, tile, mb_h * tile)
    return jnp.pad(sk, ((0, 0), (0, 0), (0, 0), (4, L - 4 - tile * mb_h)))


def deskew_plane(sk, mb_w: int, mb_h: int, tile: int):
    """Inverse of skew_plane: (S, n_diag, tile, L) -> (S, H, W)."""
    S = sk.shape[0]
    n_diag = mb_w + 2 * mb_h - 2
    W2 = n_diag + 2
    t = sk[:, :, :, 4:4 + tile * mb_h]
    t = t.reshape(S, n_diag, tile, mb_h, tile)
    t = jnp.transpose(t, (0, 3, 1, 4, 2))           # (S, y, d, r, j)
    t = t.reshape(S, mb_h * n_diag, tile, tile)
    t = jnp.pad(t, ((0, 0), (0, 2 * mb_h), (0, 0), (0, 0)))
    t = t.reshape(S, mb_h, W2, tile, tile)[:, :, :mb_w]
    t = jnp.swapaxes(t, 2, 3)                       # (S, y, r, x, j)
    return t.reshape(S, mb_h * tile, mb_w * tile)


def skew_chroma(u, v, mb_w: int, mb_h: int):
    """(S, H/2, W/2) x2 -> (S, n_diag, 16, Lc) with u on sublanes 0..7
    and v on 8..15, sharing ONE stride-trick pass (16-sublane blocks
    relayout better than two 8-sublane passes)."""
    S = u.shape[0]
    n_diag = mb_w + 2 * mb_h - 2
    Lc = _round_up(8 * mb_h + 8, 128)
    W2 = n_diag + 2
    t = jnp.stack([u, v], axis=1).astype(jnp.int32)  # (S, c, H/2, W/2)
    t = t.reshape(S, 2, mb_h, 8, mb_w, 8)
    t = jnp.transpose(t, (0, 2, 4, 1, 3, 5))         # (S, y, x, c, r, j)
    t = jnp.pad(t, ((0, 0), (0, 0), (0, W2 - mb_w), (0, 0), (0, 0),
                    (0, 0)))
    t = t.reshape(S, mb_h * W2, 2, 8, 8)[:, :mb_h * (W2 - 2)]
    sk = t.reshape(S, mb_h, n_diag, 2, 8, 8)         # (S, y, d, c, r, j)
    sk = jnp.transpose(sk, (0, 2, 3, 5, 1, 4))       # (S, d, c, j, y, r)
    sk = sk.reshape(S, n_diag, 16, mb_h * 8)
    return jnp.pad(sk, ((0, 0), (0, 0), (0, 0), (4, Lc - 4 - 8 * mb_h)))


def deskew_chroma(skc, mb_w: int, mb_h: int):
    """Inverse of skew_chroma: (S, n_diag, 16, Lc) -> (u, v)."""
    S = skc.shape[0]
    n_diag = mb_w + 2 * mb_h - 2
    W2 = n_diag + 2
    t = skc[:, :, :, 4:4 + 8 * mb_h]
    t = t.reshape(S, n_diag, 2, 8, mb_h, 8)          # (S, d, c, j, y, r)
    t = jnp.transpose(t, (0, 4, 1, 2, 5, 3))         # (S, y, d, c, r, j)
    t = t.reshape(S, mb_h * n_diag, 2, 8, 8)
    t = jnp.pad(t, ((0, 0), (0, 2 * mb_h), (0, 0), (0, 0), (0, 0)))
    t = t.reshape(S, mb_h, W2, 2, 8, 8)[:, :, :mb_w]
    t = jnp.transpose(t, (0, 3, 1, 4, 2, 5))         # (S, c, y, r, x, j)
    t = t.reshape(S, 2, mb_h * 8, mb_w * 8)
    return t[:, 0], t[:, 1]
