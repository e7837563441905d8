/* GCC compatibility shims for TI C6000 intrinsics used by the reference
 * (oracle build only; lives outside the repo). */
#ifndef TI_COMPAT_H
#define TI_COMPAT_H
#include <stdint.h>

#define _mem8(p) (*(uint64_t *)(void *)(p))
#define _mem4(p) (*(uint32_t *)(void *)(p))
#define _mem2(p) (*(uint16_t *)(void *)(p))

static inline uint32_t _pack2(uint32_t a, uint32_t b)
{ return ((a & 0xffff) << 16) | (b & 0xffff); }

static inline uint32_t _packl4(uint32_t a, uint32_t b)
{
    return (((a >> 16) & 0xff) << 24) | ((a & 0xff) << 16) |
           (((b >> 16) & 0xff) << 8)  |  (b & 0xff);
}

static inline uint64_t _itoll(uint32_t hi, uint32_t lo)
{ return ((uint64_t)hi << 32) | lo; }

static inline uint32_t _min2(uint32_t a, uint32_t b)
{
    int16_t ah = (int16_t)(a >> 16), al = (int16_t)a;
    int16_t bh = (int16_t)(b >> 16), bl = (int16_t)b;
    uint16_t rh = (uint16_t)(ah < bh ? ah : bh);
    uint16_t rl = (uint16_t)(al < bl ? al : bl);
    return ((uint32_t)rh << 16) | rl;
}

static inline uint32_t _max2(uint32_t a, uint32_t b)
{
    int16_t ah = (int16_t)(a >> 16), al = (int16_t)a;
    int16_t bh = (int16_t)(b >> 16), bl = (int16_t)b;
    uint16_t rh = (uint16_t)(ah > bh ? ah : bh);
    uint16_t rl = (uint16_t)(al > bl ? al : bl);
    return ((uint32_t)rh << 16) | rl;
}

static inline int16_t ti_sat16_(int32_t v)
{ return v > 32767 ? 32767 : (v < -32768 ? -32768 : (int16_t)v); }

static inline uint32_t _spack2(int32_t a, int32_t b)
{ return ((uint32_t)(uint16_t)ti_sat16_(a) << 16) | (uint16_t)ti_sat16_(b); }

static inline uint32_t _shr2(uint32_t a, uint32_t s)
{
    int16_t ah = (int16_t)(a >> 16), al = (int16_t)a;
    return ((uint32_t)(uint16_t)(ah >> s) << 16) | (uint16_t)(al >> s);
}

static inline uint32_t _add2(uint32_t a, uint32_t b)
{
    uint16_t rh = (uint16_t)((a >> 16) + (b >> 16));
    uint16_t rl = (uint16_t)(a + b);
    return ((uint32_t)rh << 16) | rl;
}

#endif
