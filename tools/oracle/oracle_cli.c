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
#include "common/x264.h"

static int env_int(const char *name, int def)
{
    const char *v = getenv(name);
    return v ? atoi(v) : def;
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
    }
    x264_encoder_close(h);
    fclose(fin);
    fclose(fout);
    return 0;
}
