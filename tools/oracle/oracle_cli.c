/* Configurable oracle CLI: drives the reference encoder library with
 * parameters from environment variables so tests can produce reference
 * bitstreams for arbitrary configs (the reference's own CLI parses no
 * flags). This file is OURS; it only links against the reference objects.
 *
 * Env: ORACLE_QP (CQP mode), ORACLE_CRF, ORACLE_BITRATE (kbps ABR),
 *      ORACLE_CABAC (0/1), ORACLE_KEYINT, ORACLE_SUBME, ORACLE_ME,
 *      ORACLE_REF, ORACLE_DEBLOCK (0/1), ORACLE_I4X4 (0/1),
 *      ORACLE_PSUB16 (0/1), ORACLE_FPS_NUM/DEN
 *
 * Usage: oracle_cli WxH.yuv out.264 [max_frames]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include "common/common.h"   /* full x264_t: per-MB decision tables for
                                the ORACLE_DUMP per-MB diff harness */

static int env_int(const char *name, int def)
{
    const char *v = getenv(name);
    return v ? atoi(v) : def;
}

/* ORACLE_DUMP=<path>: after each frame, append one line per MB with the
 * reference's decisions — read from the per-frame tables the encoder
 * leaves in h->mb / h->fdec (common/common.h:777-793; mv/ref live on
 * the 4x4/8x8 block grids, macroblock.c cache_save). */
static void dump_mb_decisions(FILE *df, x264_t *h, int frame, int w,
                              int frame_type, int frame_bytes)
{
    int mb_w = (w + 15) >> 4;
    int mb_count = h->mb.i_mb_count;
    int b4_stride = h->mb.i_b4_stride;
    int b8_stride = h->mb.i_b8_stride;
    fprintf(df, "frame %d type %d bytes %d satd %d qprc %.4f\n", frame,
            frame_type, frame_bytes, h->fdec->i_satd,
            h->fdec->f_qp_avg_rc);
    if (getenv("ORACLE_DUMP_DEBUG"))
        fprintf(df, "ptr type=%p part=%p qp=%p cbp=%p ref=%p mv=%p "
                "cpm=%p i4=%p mbc=%d b4s=%d b8s=%d\n",
                (void *)h->mb.type, (void *)h->mb.partition,
                (void *)h->mb.qp, (void *)h->mb.cbp,
                (void *)h->mb.ref[0], (void *)h->mb.mv[0],
                (void *)h->mb.chroma_pred_mode,
                (void *)h->mb.intra4x4_pred_mode, mb_count,
                b4_stride, b8_stride);
    for (int i = 0; i < mb_count; i++) {
        int x = i % mb_w, y = i / mb_w;
        int b4 = (4 * y) * b4_stride + 4 * x;
        int b8 = (2 * y) * b8_stride + 2 * x;
        fprintf(df, "%d %d t %d part %d qp %d cbp %d ref %d mv %d %d "
                "cpm %d i4",
                x, y, h->mb.type[i], h->mb.partition[i], h->mb.qp[i],
                h->mb.cbp[i], h->mb.ref[0][b8], h->mb.mv[0][b4][0],
                h->mb.mv[0][b4][1],
                /* only allocated under CABAC (macroblock.c cache_allocate) */
                h->mb.chroma_pred_mode ? h->mb.chroma_pred_mode[i] : -1);
        for (int k = 0; k < 7; k++)
            fprintf(df, " %d", h->mb.intra4x4_pred_mode
                    ? h->mb.intra4x4_pred_mode[i][k] : -1);
        fprintf(df, "\n");
    }
    /* lookahead lowres ME results of this frame (fenc->lowres_mvs /
     * lowres_mv_costs, frame.h:140-147; written by slicetype_mb_cost) */
    if (h->fenc->lowres_mvs[0][0] && h->fenc->lowres_mv_costs[0][0]) {
        for (int i = 0; i < mb_count; i++)
            fprintf(df, "low %d %d mv %d %d cost %d\n",
                    i % mb_w, i / mb_w,
                    h->fenc->lowres_mvs[0][0][i][0],
                    h->fenc->lowres_mvs[0][0][i][1],
                    h->fenc->lowres_mv_costs[0][0][i]);
        /* per-8x8-block pixel sums of the lowres[0] plane, to diff the
         * downsample itself against ours */
        for (int by = 0; by * 8 < h->mb.i_mb_height * 8; by++)
            for (int bx = 0; bx * 8 < h->mb.i_mb_width * 8; bx++) {
                int s = 0;
                for (int yy = 0; yy < 8; yy++)
                    for (int xx = 0; xx < 8; xx++)
                        s += h->fenc->lowres[0][
                            (by * 8 + yy) * h->fenc->i_stride_lowres
                            + bx * 8 + xx];
                fprintf(df, "lowsum %d %d %d\n", bx, by, s);
            }
    }
}

int main(int argc, char **argv)
{
    if (argc < 3) {
        fprintf(stderr, "usage: %s in_WxH.yuv out.264 [max_frames]\n", argv[0]);
        return 1;
    }
    int width = 0, height = 0;
    const char *base = strrchr(argv[1], '/');
    base = base ? base + 1 : argv[1];
    for (const char *p = base; *p; p++) {
        if (sscanf(p, "%dx%d", &width, &height) == 2 && width > 0 && height > 0)
            break;
    }
    if (width <= 0 || height <= 0) {
        fprintf(stderr, "cannot parse WxH from %s\n", argv[1]);
        return 1;
    }

    x264_param_t param;
    x264_param_default(&param);
    param.i_width = width;
    param.i_height = height;
    param.i_fps_num = env_int("ORACLE_FPS_NUM", 25);
    param.i_fps_den = env_int("ORACLE_FPS_DEN", 1);
    param.b_cabac = env_int("ORACLE_CABAC", 1);
    param.i_keyint_max = env_int("ORACLE_KEYINT", 50);
    param.i_frame_reference = env_int("ORACLE_REF", 1);
    param.b_deblocking_filter = env_int("ORACLE_DEBLOCK", 1);
    param.analyse.i_subpel_refine = env_int("ORACLE_SUBME", 1);
    param.analyse.i_me_method = env_int("ORACLE_ME", 0);
    if (!env_int("ORACLE_I4X4", 1))
        param.analyse.intra &= ~X264_ANALYSE_I4x4;
    if (env_int("ORACLE_PSUB16", 0))
        param.analyse.inter |= X264_ANALYSE_PSUB16x16;
    if (getenv("ORACLE_QP")) {
        param.rc.i_rc_method = X264_RC_CQP;
        param.rc.i_qp_constant = atoi(getenv("ORACLE_QP"));
    } else if (getenv("ORACLE_BITRATE")) {
        param.rc.i_rc_method = X264_RC_ABR;
        param.rc.i_bitrate = atoi(getenv("ORACLE_BITRATE"));
    } else if (getenv("ORACLE_CRF")) {
        param.rc.i_rc_method = X264_RC_CRF;
        param.rc.f_rf_constant = atof(getenv("ORACLE_CRF"));
    }

    FILE *fin = fopen(argv[1], "rb");
    FILE *fout = fopen(argv[2], "wb");
    if (!fin || !fout) { perror("open"); return 1; }

    x264_t *h = x264_encoder_open(&param);
    if (!h) { fprintf(stderr, "encoder_open failed\n"); return 1; }

    x264_picture_t pic, pic_out;
    x264_picture_alloc(&pic, param.i_csp, width, height);

    size_t luma = (size_t)width * height;
    int max_frames = argc > 3 ? atoi(argv[3]) : 1 << 30;
    int64_t pts = 0;
    FILE *df = NULL;
    if (getenv("ORACLE_DUMP")) {
        df = fopen(getenv("ORACLE_DUMP"), "w");
        if (df) setvbuf(df, NULL, _IONBF, 0);   /* survive a crash */
    }
    for (int f = 0; f < max_frames; f++) {
        if (fread(pic.img.plane[0], 1, luma, fin) != luma) break;
        if (fread(pic.img.plane[1], 1, luma / 4, fin) != luma / 4) break;
        if (fread(pic.img.plane[2], 1, luma / 4, fin) != luma / 4) break;
        pic.i_pts = pts++;
        x264_nal_t *nal;
        int i_nal;
        int sz = x264_encoder_encode(h, &nal, &i_nal, &pic, &pic_out);
        if (sz < 0) { fprintf(stderr, "encode failed\n"); return 1; }
        if (sz) fwrite(nal[0].p_payload, 1, sz, fout);
        if (df)
            dump_mb_decisions(df, h, f, width, pic_out.i_type, sz);
    }
    if (df) fclose(df);
    x264_encoder_close(h);
    fclose(fin);
    fclose(fout);
    return 0;
}
