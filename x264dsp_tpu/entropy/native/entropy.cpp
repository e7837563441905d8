// Native host entropy stage — C++ implementation of the bit-serial layer
// (the role common/bitstream.c + encoder/cavlc.c play in the reference,
// rebuilt against this framework's device syntax tensors).
//
// Exposed via a C ABI consumed with ctypes (x264dsp_tpu/entropy/native.py).
// The Python writers in entropy/cavlc.py + encoder/core.py are the
// behavioral twins; tests require byte-identical output.
//
// VLC code tables (H.264 Tables 9-5/9-7/9-8) are injected once from
// Python (set_cavlc_tables) so there is a single source of truth.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>

namespace {

struct BitWriter {
    uint8_t *buf;
    size_t cap;
    size_t len = 0;
    uint64_t cur = 0;
    int nbits = 0;

    void write(int n, uint32_t value) {
        if (n == 0) return;
        cur = (cur << n) | (value & ((1ull << n) - 1));
        nbits += n;
        while (nbits >= 8) {
            nbits -= 8;
            if (len < cap) buf[len++] = (cur >> nbits) & 0xFF;
        }
        cur &= (1ull << nbits) - 1;
    }
    void write_ue(uint32_t v) {
        uint32_t x = v + 1;
        int size = 32 - __builtin_clz(x);
        write(2 * size - 1, x);
    }
    void write_se(int32_t v) { write_ue(v > 0 ? 2 * v - 1 : -2 * v); }
    void rbsp_trailing() {
        write(1, 1);
        if (nbits) write(8 - nbits, 0);
    }
};

// CAVLC tables, injected from Python: (bits, size) pairs
static uint16_t g_coeff_token[5][17][4][2]; // [class][total(0=empty)][t1]
static uint16_t g_total_zeros[15][16][2];
static uint16_t g_total_zeros_dc[3][4][2];
static const uint8_t RUN_BEFORE[7][15][2] = {
    {{1,1},{0,1}},
    {{1,1},{1,2},{0,2}},
    {{3,2},{2,2},{1,2},{0,2}},
    {{3,2},{2,2},{1,2},{1,3},{0,3}},
    {{3,2},{2,2},{3,3},{2,3},{1,3},{0,3}},
    {{3,2},{0,3},{1,3},{3,3},{2,3},{5,3},{4,3}},
    {{7,3},{6,3},{5,3},{4,3},{3,3},{2,3},{1,3},
     {1,4},{1,5},{1,6},{1,7},{1,8},{1,9},{1,10},{1,11}},
};
static const int CT_INDEX[17] = {0,0,1,1,2,2,2,2,3,3,3,3,3,3,3,3,3};
static const uint8_t CBP_GOLOMB_INTRA[48] = {
    3,29,30,17,31,18,37,8,32,38,19,9,20,10,11,2,
    16,33,34,21,35,22,39,4,36,40,23,5,24,6,7,1,
    41,42,43,25,44,26,46,12,45,47,27,13,28,14,15,0};
static const uint8_t CBP_GOLOMB_INTER[48] = {
    0,2,3,7,4,8,17,13,5,18,9,14,10,15,16,11,
    1,32,33,36,34,37,44,40,35,45,38,41,39,42,43,19,
    6,24,25,20,26,21,46,28,27,47,22,29,23,30,31,12};
// block idx → 4x4 block coords, coding order
static const int BIX[16] = {0,1,0,1,2,3,2,3,0,1,0,1,2,3,2,3};
static const int BIY[16] = {0,0,1,1,0,0,1,1,2,2,3,3,2,2,3,3};
static const int8_t FIX4[13] = {-1,0,1,2,3,4,5,6,7,8,2,2,2};
static const int8_t FIX16[7] = {0,1,2,3,2,2,2};
static const int8_t FIXC[7] = {0,1,2,3,0,0,0};

static int update_suffix(int suffix_len, int abs_level) {
    if (suffix_len == 0) suffix_len = 1;
    if (abs_level > (3 << (suffix_len - 1)) && suffix_len < 6) suffix_len++;
    return suffix_len;
}

static bool write_coeff_level(BitWriter &bw, int level, int suffix_len) {
    int abs_level = level < 0 ? -level : level;
    int code = 2 * abs_level - 2 + (level < 0 ? 1 : 0);
    bool overflow = false;
    if (suffix_len == 0) {
        if (code < 14) {
            bw.write(code + 1, 1);
        } else if (code < 30) {
            bw.write(15, 1);
            bw.write(4, code - 14);
        } else {
            int lc = code - 30;
            if (lc >= (1 << 12)) { overflow = true; lc &= (1 << 12) - 1; }
            bw.write(16, 1);
            bw.write(12, lc);
        }
    } else {
        if ((code >> suffix_len) < 15) {
            bw.write((code >> suffix_len) + 1 + suffix_len,
                     (1u << suffix_len) + (code & ((1 << suffix_len) - 1)));
        } else {
            int lc = code - (15 << suffix_len);
            if (lc >= (1 << 12)) { overflow = true; lc &= (1 << 12) - 1; }
            bw.write(16, 1);
            bw.write(12, lc);
        }
    }
    return overflow;
}

// returns total_coeff
static int write_block_residual(BitWriter &bw, const int32_t *levels, int n,
                                int nC, bool chroma_dc) {
    int nz[16], nnz = 0;
    for (int i = 0; i < n; i++)
        if (levels[i]) nz[nnz++] = i;
    int table = chroma_dc ? 4 : CT_INDEX[nC > 16 ? 16 : nC];
    if (nnz == 0) {
        const uint16_t *t = g_coeff_token[table][0][0];
        bw.write(t[1], t[0]);
        return 0;
    }
    int last = nz[nnz - 1];
    int total = nnz;
    int total_zeros = last + 1 - total;

    int lev[16], runs[16];
    for (int k = 0; k < total; k++) lev[k] = levels[nz[total - 1 - k]];
    for (int k = 0; k + 1 < total; k++)
        runs[k] = nz[total - 1 - k] - nz[total - 2 - k] - 1;

    int trailing = 0;
    while (trailing < (total < 3 ? total : 3) &&
           (lev[trailing] == 1 || lev[trailing] == -1))
        trailing++;
    uint32_t sign_bits = 0;
    for (int k = 0; k < trailing; k++)
        sign_bits = (sign_bits << 1) | (lev[k] < 0 ? 1 : 0);

    const uint16_t *tok = g_coeff_token[table][total][trailing];
    bw.write(tok[1], tok[0]);
    bw.write(trailing, sign_bits);

    int suffix_len = (total > 10 && trailing < 3) ? 1 : 0;
    for (int k = trailing; k < total; k++) {
        int val = lev[k];
        if (k == trailing && trailing < 3) val -= val > 0 ? 1 : -1;
        write_coeff_level(bw, val, suffix_len);
        suffix_len = update_suffix(suffix_len, lev[k] < 0 ? -lev[k] : lev[k]);
    }

    if (chroma_dc) {
        if (total < 4) {
            const uint16_t *t = g_total_zeros_dc[total - 1][total_zeros];
            bw.write(t[1], t[0]);
        }
    } else if (total < n) {
        const uint16_t *t = g_total_zeros[total - 1][total_zeros];
        bw.write(t[1], t[0]);
    }
    int zeros_left = total_zeros;
    for (int k = 0; k + 1 < total && zeros_left > 0; k++) {
        int zl = zeros_left < 7 ? zeros_left : 7;
        const uint8_t *t = RUN_BEFORE[zl - 1][runs[k]];
        bw.write(t[1], t[0]);
        zeros_left -= runs[k];
    }
    return total;
}

struct SynI {
    // per-MB syntax arrays, all int32, row-major (mb_h, mb_w, ...)
    const int32_t *mb_type, *i16_mode, *i4_modes, *chroma_mode;
    const int32_t *cbp_luma, *cbp_chroma, *nz_luma_dc;
    const int32_t *luma_levels;       // (mb, 16, 16)
    const int32_t *luma_dc_levels;    // (mb, 16)
    const int32_t *chroma_dc_levels;  // (mb, 2, 4)
    const int32_t *chroma_ac_levels;  // (mb, 2, 4, 16)
    const int32_t *mv;                // (mb, 2) — P only
};

struct Ctx {
    int mb_w, mb_h;
    int *luma_cnt;    // (4h, 4w)
    int *chroma_cnt;  // (2, 2h, 2w)
    const SynI *s;
};

static int nc_ctx(const int *cnt, int w4, int by, int bx) {
    int na = bx > 0 ? cnt[by * w4 + bx - 1] : -1;
    int nb = by > 0 ? cnt[(by - 1) * w4 + bx] : -1;
    if (na >= 0 && nb >= 0) return (na + nb + 1) >> 1;
    if (na >= 0) return na;
    if (nb >= 0) return nb;
    return 0;
}

static int host_mpm(const Ctx &c, int by, int bx) {
    auto eff = [&](int yy, int xx) -> int {
        if (xx < 0 || yy < 0) return -1;
        int mby = yy / 4, mbx = xx / 4;
        if (c.s->mb_type[mby * c.mb_w + mbx] != 1) return 2;
        int ly = yy % 4, lx = xx % 4;
        int idx = -1;
        for (int i = 0; i < 16; i++)
            if (BIX[i] == lx && BIY[i] == ly) { idx = i; break; }
        return FIX4[c.s->i4_modes[(mby * c.mb_w + mbx) * 16 + idx] + 1];
    };
    int m = eff(by, bx - 1);
    int t = eff(by - 1, bx);
    int r = m < t ? m : t;
    return r < 0 ? 2 : r;
}

static void write_chroma_residual(BitWriter &bw, Ctx &c, int mb, int mbx,
                                  int mby, int cbp_chroma) {
    int w2 = c.mb_w * 2;
    if (cbp_chroma) {
        for (int ch = 0; ch < 2; ch++)
            write_block_residual(bw, c.s->chroma_dc_levels + (mb * 2 + ch) * 4,
                                 4, 0, true);
        if (cbp_chroma == 2) {
            for (int ch = 0; ch < 2; ch++)
                for (int i = 0; i < 4; i++) {
                    int bx = mbx * 2 + (i & 1);
                    int by = mby * 2 + (i >> 1);
                    int *cnt = c.chroma_cnt + ch * 2 * c.mb_h * w2;
                    int nC = nc_ctx(cnt, w2, by, bx);
                    int tot = write_block_residual(
                        bw, c.s->chroma_ac_levels
                            + ((mb * 2 + ch) * 4 + i) * 16 + 1, 15, nC, false);
                    cnt[by * w2 + bx] = tot;
                }
            return;
        }
    }
    for (int ch = 0; ch < 2; ch++) {
        int *cnt = c.chroma_cnt + ch * 2 * c.mb_h * w2;
        for (int dy = 0; dy < 2; dy++)
            for (int dx = 0; dx < 2; dx++)
                cnt[(mby * 2 + dy) * w2 + mbx * 2 + dx] = 0;
    }
}

static void write_mb_i(BitWriter &bw, Ctx &c, int mbx, int mby, int qp,
                       int &last_qp, int i_offset) {
    int mb = mby * c.mb_w + mbx;
    int w4 = c.mb_w * 4;
    const SynI *s = c.s;
    bool is_i4 = s->mb_type[mb] == 1;
    int cbp_luma = s->cbp_luma[mb];
    int cbp_chroma = s->cbp_chroma[mb];
    int nz_dc = s->nz_luma_dc[mb];

    if (!is_i4) {
        bw.write_ue(i_offset + 1 + FIX16[s->i16_mode[mb]] + cbp_chroma * 4
                    + (cbp_luma ? 12 : 0));
    } else {
        bw.write_ue(i_offset + 0);
        for (int i = 0; i < 16; i++) {
            int bx = mbx * 4 + BIX[i];
            int by = mby * 4 + BIY[i];
            int pred = host_mpm(c, by, bx);
            int mode = FIX4[s->i4_modes[mb * 16 + i] + 1];
            if (pred == mode) bw.write(1, 1);
            else bw.write(4, mode - (mode > pred ? 1 : 0));
        }
    }
    bw.write_ue(FIXC[s->chroma_mode[mb]]);
    if (is_i4)
        bw.write_ue(CBP_GOLOMB_INTRA[(cbp_chroma << 4) | cbp_luma]);

    if (!is_i4) {
        // empty-I16 dqp suppression (cavlc.c:156-181): chroma DC nz is
        // subsumed by cbp_chroma > 0
        bool any = cbp_luma || cbp_chroma || nz_dc;
        int dqp = any ? qp - last_qp : 0;
        if (any) last_qp = qp;
        bw.write_se(dqp);
        int nC = nc_ctx(c.luma_cnt, w4, mby * 4, mbx * 4);
        write_block_residual(bw, s->luma_dc_levels + mb * 16, 16, nC, false);
        if (cbp_luma) {
            for (int i = 0; i < 16; i++) {
                int bx = mbx * 4 + BIX[i];
                int by = mby * 4 + BIY[i];
                int nc = nc_ctx(c.luma_cnt, w4, by, bx);
                int tot = write_block_residual(
                    bw, s->luma_levels + (mb * 16 + i) * 16 + 1, 15, nc,
                    false);
                c.luma_cnt[by * w4 + bx] = tot;
            }
        } else {
            for (int i = 0; i < 16; i++)
                c.luma_cnt[(mby * 4 + BIY[i]) * w4 + mbx * 4 + BIX[i]] = 0;
        }
    } else {
        if (cbp_luma | cbp_chroma) {
            bw.write_se(qp - last_qp);
            last_qp = qp;
        }
        for (int i = 0; i < 16; i++) {
            int bx = mbx * 4 + BIX[i];
            int by = mby * 4 + BIY[i];
            if (cbp_luma & (1 << (i >> 2))) {
                int nc = nc_ctx(c.luma_cnt, w4, by, bx);
                int tot = write_block_residual(
                    bw, s->luma_levels + (mb * 16 + i) * 16, 16, nc, false);
                c.luma_cnt[by * w4 + bx] = tot;
            } else {
                c.luma_cnt[by * w4 + bx] = 0;
            }
        }
    }
    write_chroma_residual(bw, c, mb, mbx, mby, cbp_chroma);
}

static void median_mvp(const int32_t *mv, const uint8_t *avail, int mb_w,
                       int mbx, int mby, int64_t out[2]) {
    auto get = [&](int yy, int xx, int64_t m[2]) -> bool {
        if (yy < 0 || xx < 0 || xx >= mb_w) { m[0] = m[1] = 0; return false; }
        m[0] = mv[(yy * mb_w + xx) * 2];
        m[1] = mv[(yy * mb_w + xx) * 2 + 1];
        return avail[yy * mb_w + xx];
    };
    int64_t a[2], b[2], cc[2], d[2];
    bool ok_a = get(mby, mbx - 1, a);
    bool ok_b = get(mby - 1, mbx, b);
    bool ok_c = get(mby - 1, mbx + 1, cc);
    if (!ok_c) { ok_c = get(mby - 1, mbx - 1, d); cc[0] = d[0]; cc[1] = d[1]; }
    int count = ok_a + ok_b + ok_c;
    if (count == 1) {
        const int64_t *m = ok_a ? a : ok_b ? b : cc;
        out[0] = m[0]; out[1] = m[1];
        return;
    }
    if (count == 0 && ok_a && !ok_b && !ok_c) {  // mvpred.c:114-115
        out[0] = a[0]; out[1] = a[1];
        return;
    }
    for (int k = 0; k < 2; k++) {
        int64_t x = a[k], y = b[k], z = cc[k];
        int64_t mn = x < y ? x : y; mn = mn < z ? mn : z;
        int64_t mx = x > y ? x : y; mx = mx > z ? mx : z;
        out[k] = x + y + z - mn - mx;
    }
}

static void pskip_mv(const int32_t *mv, const uint8_t *avail, int mb_w,
                     int mbx, int mby, int64_t out[2]) {
    bool ok_a = mbx > 0 && avail[mby * mb_w + mbx - 1];
    bool ok_b = mby > 0 && avail[(mby - 1) * mb_w + mbx];
    bool a_zero = ok_a && mv[(mby * mb_w + mbx - 1) * 2] == 0 &&
                  mv[(mby * mb_w + mbx - 1) * 2 + 1] == 0;
    bool b_zero = ok_b && mv[((mby - 1) * mb_w + mbx) * 2] == 0 &&
                  mv[((mby - 1) * mb_w + mbx) * 2 + 1] == 0;
    if (!ok_a || !ok_b || a_zero || b_zero) { out[0] = out[1] = 0; return; }
    median_mvp(mv, avail, mb_w, mbx, mby, out);
}

} // namespace

extern "C" {

void x264tpu_set_cavlc_tables(const uint16_t *coeff0,      // (6,2)
                              const uint16_t *coeff_token, // (6,16,4,2)
                              const uint16_t *total_zeros, // (15,16,2)
                              const uint16_t *tz_dc) {     // (3,4,2)
    for (int t = 0; t < 5; t++) {
        int src = t < 4 ? t : 4;
        g_coeff_token[t][0][0][0] = coeff0[src * 2];
        g_coeff_token[t][0][0][1] = coeff0[src * 2 + 1];
        for (int total = 1; total <= 16; total++)
            for (int t1 = 0; t1 < 4; t1++) {
                const uint16_t *p =
                    coeff_token + ((src * 16 + total - 1) * 4 + t1) * 2;
                g_coeff_token[t][total][t1][0] = p[0];
                g_coeff_token[t][total][t1][1] = p[1];
            }
    }
    memcpy(g_total_zeros, total_zeros, sizeof(g_total_zeros));
    memcpy(g_total_zeros_dc, tz_dc, sizeof(g_total_zeros_dc));
}

// Returns payload length. out must be large enough (est 1MB+, caller's job).
int64_t x264tpu_write_slice_i(
    uint8_t *out, int64_t cap, const uint8_t *header, int64_t header_bytes,
    int header_bits_used, int mb_w, int mb_h, int qp,
    const int32_t *mb_type, const int32_t *i16_mode, const int32_t *i4_modes,
    const int32_t *chroma_mode, const int32_t *cbp_luma,
    const int32_t *cbp_chroma, const int32_t *nz_luma_dc,
    const int32_t *luma_levels, const int32_t *luma_dc_levels,
    const int32_t *chroma_dc_levels, const int32_t *chroma_ac_levels) {
    BitWriter bw{out, (size_t)cap};
    // preload the already-written header bits
    for (int64_t i = 0; i < header_bytes; i++) bw.write(8, header[i]);
    if (header_bits_used) bw.write(header_bits_used,
                                   header[header_bytes] >> (8 - header_bits_used));

    SynI s{mb_type, i16_mode, i4_modes, chroma_mode, cbp_luma, cbp_chroma,
           nz_luma_dc, luma_levels, luma_dc_levels, chroma_dc_levels,
           chroma_ac_levels, nullptr};
    int *lc = (int *)calloc((size_t)mb_w * mb_h * 16, sizeof(int));
    int *cc = (int *)calloc((size_t)mb_w * mb_h * 8, sizeof(int));
    Ctx c{mb_w, mb_h, lc, cc, &s};
    int last_qp = qp;
    for (int mby = 0; mby < mb_h; mby++)
        for (int mbx = 0; mbx < mb_w; mbx++)
            write_mb_i(bw, c, mbx, mby, qp, last_qp, 0);
    bw.rbsp_trailing();
    free(lc); free(cc);
    return (int64_t)bw.len;
}

int64_t x264tpu_write_slice_p(
    uint8_t *out, int64_t cap, const uint8_t *header, int64_t header_bytes,
    int header_bits_used, int mb_w, int mb_h, int qp,
    const int32_t *mv, const int32_t *cbp_luma, const int32_t *cbp_chroma,
    const int32_t *luma_levels, const int32_t *chroma_dc_levels,
    const int32_t *chroma_ac_levels, int32_t *skip_count_out) {
    BitWriter bw{out, (size_t)cap};
    for (int64_t i = 0; i < header_bytes; i++) bw.write(8, header[i]);
    if (header_bits_used) bw.write(header_bits_used,
                                   header[header_bytes] >> (8 - header_bits_used));

    SynI s{nullptr, nullptr, nullptr, nullptr, cbp_luma, cbp_chroma,
           nullptr, luma_levels, nullptr, chroma_dc_levels,
           chroma_ac_levels, mv};
    int *lc = (int *)calloc((size_t)mb_w * mb_h * 16, sizeof(int));
    int *cc = (int *)calloc((size_t)mb_w * mb_h * 8, sizeof(int));
    uint8_t *avail = (uint8_t *)malloc((size_t)mb_w * mb_h);
    memset(avail, 1, (size_t)mb_w * mb_h);
    Ctx c{mb_w, mb_h, lc, cc, &s};
    int w4 = mb_w * 4;
    int last_qp = qp;
    int skip_run = 0;
    int n_skip = 0;
    for (int mby = 0; mby < mb_h; mby++)
        for (int mbx = 0; mbx < mb_w; mbx++) {
            int mb = mby * mb_w + mbx;
            int cl = cbp_luma[mb], cch = cbp_chroma[mb];
            int64_t psk[2];
            pskip_mv(mv, avail, mb_w, mbx, mby, psk);
            bool is_skip = cl == 0 && cch == 0 && mv[mb * 2] == psk[0] &&
                           mv[mb * 2 + 1] == psk[1];
            if (is_skip) {
                skip_run++;
                n_skip++;
                for (int i = 0; i < 16; i++)
                    lc[(mby * 4 + BIY[i]) * w4 + mbx * 4 + BIX[i]] = 0;
                write_chroma_residual(bw, c, mb, mbx, mby, 0);
                continue;
            }
            bw.write_ue(skip_run);
            skip_run = 0;
            bw.write(1, 1); // mb_type P_L0 16x16
            int64_t mvp[2];
            median_mvp(mv, avail, mb_w, mbx, mby, mvp);
            bw.write_se((int32_t)(mv[mb * 2] - mvp[0]));
            bw.write_se((int32_t)(mv[mb * 2 + 1] - mvp[1]));
            bw.write_ue(CBP_GOLOMB_INTER[(cch << 4) | cl]);
            if (cl | cch) {
                bw.write_se(qp - last_qp);
                last_qp = qp;
            }
            for (int i = 0; i < 16; i++) {
                int bx = mbx * 4 + BIX[i];
                int by = mby * 4 + BIY[i];
                if (cl & (1 << (i >> 2))) {
                    int nc = nc_ctx(lc, w4, by, bx);
                    int tot = write_block_residual(
                        bw, luma_levels + (mb * 16 + i) * 16, 16, nc, false);
                    lc[by * w4 + bx] = tot;
                } else lc[by * w4 + bx] = 0;
            }
            write_chroma_residual(bw, c, mb, mbx, mby, cch);
        }
    if (skip_run > 0) bw.write_ue(skip_run);
    bw.rbsp_trailing();
    if (skip_count_out) *skip_count_out = n_skip;
    free(lc); free(cc); free(avail);
    return (int64_t)bw.len;
}

// emulation-prevention escape: returns escaped length
int64_t x264tpu_nal_escape(uint8_t *dst, const uint8_t *src, int64_t n) {
    int64_t o = 0;
    int zeros = 0;
    for (int64_t i = 0; i < n; i++) {
        uint8_t b = src[i];
        if (zeros >= 2 && b <= 3) {
            dst[o++] = 3;
            zeros = 0;
        }
        dst[o++] = b;
        zeros = b == 0 ? zeros + 1 : 0;
    }
    return o;
}

} // extern "C"
