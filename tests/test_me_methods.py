"""me_method behavioral tests (VERDICT r4 task 4): the DIA/HEX pattern
walks must carry me.c's search semantics (me.c:237-274 DIA, :276-387
HEX) — cheap local walks that can get stuck where the exhaustive tiers
cannot — and the batched lockstep walk must match a serial per-MB
transcription of those semantics exactly."""

import numpy as np
import jax.numpy as jnp

from x264dsp_tpu.encoder import inter_frame as IF
from x264dsp_tpu.ops import mcgather as MG

R = 8
N = 2 * R + 1


def _serial_walk(surface, method, me_range, seed=(0, 0)):
    """Per-MB serial oracle of the pattern walk on one (n, n) biased
    surface: strict-less candidate chains (COPY1_IF_LT, me.c), DIA =
    unit diamond until no move, HEX = radius-2 hexagon for range/2
    iters + 8-point square refine. Candidates out of [-R, R] cost BIG."""
    BIG = 1 << 28

    def at(x, y):
        if abs(x) > R or abs(y) > R:
            return BIG
        return int(surface[y + R, x + R])

    bx, by = seed
    bcost = at(bx, by)

    def try_pts(bx, by, bcost, pts):
        ox, oy = bx, by
        for dx, dy in pts:
            c = at(ox + dx, oy + dy)
            if c < bcost:
                bcost, bx, by = c, ox + dx, oy + dy
        return bx, by, bcost, (bx, by) != (ox, oy)

    if method == 0:
        for _ in range(me_range):
            bx, by, bcost, moved = try_pts(bx, by, bcost, IF._DIA_PTS)
            if not moved:
                break
    else:
        for _ in range(max(me_range >> 1, 1)):
            bx, by, bcost, moved = try_pts(bx, by, bcost, IF._HEX_PTS)
            if not moved:
                break
        bx, by, bcost, _ = try_pts(bx, by, bcost, IF._SQUARE_PTS)
    return bx, by, bcost


def test_pattern_walk_matches_serial_oracle():
    """Batched lockstep walk == independent serial per-MB walks when
    seeded identically (zero MVP, no extra candidates): same visited
    pattern, same strict-less acceptance, same stop rule."""
    rng = np.random.default_rng(42)
    mb_h, mb_w = 4, 6
    surf = rng.integers(0, 10000, (mb_h, mb_w, N, N)).astype(np.int32)
    zero = jnp.zeros((mb_h, mb_w), jnp.int32)
    mvp = jnp.zeros((mb_h, mb_w, 2), jnp.int32)
    cs = jnp.asarray(surf)
    for method in (0, 1):
        bx, by, bcost = IF._pattern_walk(cs, cs, mvp, None, method, R,
                                         mb_w, mb_h)
        bx, by, bcost = (np.asarray(bx), np.asarray(by),
                         np.asarray(bcost))
        for j in range(mb_h):
            for i in range(mb_w):
                ex, ey, ec = _serial_walk(surf[j, i], method, R)
                assert (bx[j, i], by[j, i], bcost[j, i]) == (ex, ey, ec), (
                    f"method {method} MB ({j},{i}): got "
                    f"({bx[j, i]},{by[j, i]},{bcost[j, i]}), "
                    f"serial ({ex},{ey},{ec})")


def _crafted_surface(mb_h, mb_w):
    """Global min at (+6,+3) only an exhaustive search finds; a local
    min at (+2,0) only HEX's radius-2 jump reaches (a cost ridge at
    radius 1 stops DIA at the origin)."""
    surf = np.full((mb_h, mb_w, N, N), 1000, np.int32)
    surf[:, :, R, R] = 100                       # origin
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        surf[:, :, R + dy, R + dx] = 2000        # ridge blocks DIA
    surf[:, :, R, R + 2] = 10                    # HEX's hexagon point
    surf[:, :, R + 3, R + 6] = 5                 # ESA-only global min
    return surf


def test_me_methods_distinct_decisions():
    """DIA stops at the ridge, HEX jumps it, the exhaustive tier finds
    the global minimum: three distinct, method-faithful answers on the
    same surface (me.c:237-387 vs the ESA full scan)."""
    mb_h, mb_w = 3, 3
    surf = _crafted_surface(mb_h, mb_w)
    fenc = jnp.zeros((mb_h * 16, mb_w * 16), jnp.uint8)
    wins4 = jnp.zeros((mb_h * mb_w, 4, MG.WIN_L, MG.WIN_L), jnp.bfloat16)
    got = {}
    for method in (0, 1):
        mv = IF.decide_mvs_pattern(jnp.asarray(surf), fenc, wins4, 0,
                                   mb_w, mb_h, R, 512, subme=0,
                                   method=method)
        got[method] = np.asarray(mv)[1, 1] // 4   # centre MB, fullpel
    mv3 = IF.decide_mvs(jnp.asarray(surf), fenc, wins4, 0, mb_w, mb_h,
                        R, 512, subme=0)
    got[3] = np.asarray(mv3)[1, 1] // 4
    assert tuple(got[0]) == (0, 0), got     # DIA: ridge-locked
    assert tuple(got[1]) == (2, 0), got     # HEX: radius-2 escape
    assert tuple(got[3]) == (6, 3), got     # ESA: global minimum
