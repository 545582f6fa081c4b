/* ctypes shim exposing the reference DSP kernels (hevcdsp_template.c
 * instantiations) for per-kernel golden tests (tests/oracle.py).
 * Built into .oracle/dsp_oracle.so by tools/build_oracle.sh. */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

#include "libavcodec/hevcdsp.h"
#include "libavcodec/hevcpred.h"

static const uint8_t pel_idx[65] = {
    [2] = 0, [4] = 1, [6] = 2, [8] = 3, [12] = 4, [16] = 5,
    [24] = 6, [32] = 7, [48] = 8, [64] = 9 };

static HEVCDSPContext *ctx(int bd)
{
    static HEVCDSPContext c[3];
    static int init[3];
    int i = bd == 8 ? 0 : (bd == 10 ? 1 : 2);
    if (!init[i]) {
        ff_hevc_dsp_init(&c[i], bd);
        init[i] = 1;
    }
    return &c[i];
}

void shim_idct(int bd, int16_t *coeffs, int log2, int col_limit)
{
    ctx(bd)->idct[log2 - 2](coeffs, col_limit);
}

void shim_idct_dc(int bd, int16_t *coeffs, int log2)
{
    ctx(bd)->idct_dc[log2 - 2](coeffs);
}

void shim_idct_4x4_luma(int bd, int16_t *coeffs)
{
    ctx(bd)->idct_4x4_luma(coeffs);
}

void shim_transform_skip(int bd, int16_t *coeffs, int log2)
{
    ctx(bd)->transform_skip(coeffs, log2);
}

void shim_transform_rdpcm(int bd, int16_t *coeffs, int log2, int mode)
{
    ctx(bd)->transform_rdpcm(coeffs, log2, mode);
}

void shim_transform_add(int bd, uint8_t *dst, int16_t *coeffs, int log2,
                        ptrdiff_t stride)
{
    ctx(bd)->transform_add[log2 - 2](dst, coeffs, stride);
}

void shim_qpel(int bd, int16_t *dst, uint8_t *src, ptrdiff_t srcstride,
               int h, int mx, int my, int w)
{
    ctx(bd)->put_hevc_qpel[pel_idx[w]][!!my][!!mx](
        dst, MAX_PB_SIZE, src, srcstride, h, mx, my, w);
}

void shim_qpel_uni(int bd, uint8_t *dst, ptrdiff_t dststride, uint8_t *src,
                   ptrdiff_t srcstride, int h, int mx, int my, int w)
{
    ctx(bd)->put_hevc_qpel_uni[pel_idx[w]][!!my][!!mx](
        dst, dststride, src, srcstride, h, mx, my, w);
}

void shim_qpel_bi(int bd, uint8_t *dst, ptrdiff_t dststride, uint8_t *src,
                  ptrdiff_t srcstride, int16_t *src2, int h, int mx, int my,
                  int w)
{
    ctx(bd)->put_hevc_qpel_bi[pel_idx[w]][!!my][!!mx](
        dst, dststride, src, srcstride, src2, MAX_PB_SIZE, h, mx, my, w);
}

void shim_epel(int bd, int16_t *dst, uint8_t *src, ptrdiff_t srcstride,
               int h, int mx, int my, int w)
{
    ctx(bd)->put_hevc_epel[pel_idx[w]][!!my][!!mx](
        dst, MAX_PB_SIZE, src, srcstride, h, mx, my, w);
}

void shim_epel_uni(int bd, uint8_t *dst, ptrdiff_t dststride, uint8_t *src,
                   ptrdiff_t srcstride, int h, int mx, int my, int w)
{
    ctx(bd)->put_hevc_epel_uni[pel_idx[w]][!!my][!!mx](
        dst, dststride, src, srcstride, h, mx, my, w);
}

void shim_epel_bi(int bd, uint8_t *dst, ptrdiff_t dststride, uint8_t *src,
                  ptrdiff_t srcstride, int16_t *src2, int h, int mx, int my,
                  int w)
{
    ctx(bd)->put_hevc_epel_bi[pel_idx[w]][!!my][!!mx](
        dst, dststride, src, srcstride, src2, MAX_PB_SIZE, h, mx, my, w);
}

/* ---- in-loop filters ---- */

struct SAOParams;

void shim_lf_luma(int bd, int horiz, uint8_t *pix, ptrdiff_t stride,
                  int beta, int *tc, uint8_t *no_p, uint8_t *no_q)
{
    if (horiz)
        ctx(bd)->hevc_h_loop_filter_luma(pix, stride, beta, tc, no_p, no_q);
    else
        ctx(bd)->hevc_v_loop_filter_luma(pix, stride, beta, tc, no_p, no_q);
}

void shim_lf_chroma(int bd, int horiz, uint8_t *pix, ptrdiff_t stride,
                    int *tc, uint8_t *no_p, uint8_t *no_q)
{
    if (horiz)
        ctx(bd)->hevc_h_loop_filter_chroma(pix, stride, tc, no_p, no_q);
    else
        ctx(bd)->hevc_v_loop_filter_chroma(pix, stride, tc, no_p, no_q);
}

void shim_sao_band(int bd, uint8_t *dst, uint8_t *src, ptrdiff_t stride_dst,
                   ptrdiff_t stride_src, struct SAOParams *sao, int *borders,
                   int width, int height, int c_idx)
{
    ctx(bd)->sao_band_filter(dst, src, stride_dst, stride_src, sao, borders,
                             width, height, c_idx);
}

void shim_sao_edge(int bd, int variant, uint8_t *dst, uint8_t *src,
                   ptrdiff_t stride_dst, ptrdiff_t stride_src,
                   struct SAOParams *sao, int *borders, int width, int height,
                   int c_idx, uint8_t *vert_edge, uint8_t *horiz_edge,
                   uint8_t *diag_edge)
{
    ctx(bd)->sao_edge_filter[variant](dst, src, stride_dst, stride_src, sao,
                                      borders, width, height, c_idx,
                                      vert_edge, horiz_edge, diag_edge);
}

/* ---- SHVC upsampling (for round-2 SHVC kernel tests) ---- */

void shim_upsample_filter_block_luma_h(int bd, int ratio_idx, int16_t *dst,
                                       ptrdiff_t dststride, uint8_t *src,
                                       ptrdiff_t srcstride, int x_EL, int x_BL,
                                       int block_w, int block_h, int widthEL,
                                       const struct HEVCWindow *win,
                                       struct UpsamplInf *up)
{
    ctx(bd)->upsample_filter_block_luma_h[ratio_idx](
        dst, dststride, src, srcstride, x_EL, x_BL, block_w, block_h,
        widthEL, win, up);
}

void shim_upsample_filter_block_luma_v(int bd, int ratio_idx, uint8_t *dst,
                                       ptrdiff_t dststride, int16_t *src,
                                       ptrdiff_t srcstride, int y_BL, int x_EL,
                                       int y_EL, int block_w, int block_h,
                                       int widthEL, int heightEL,
                                       const struct HEVCWindow *win,
                                       struct UpsamplInf *up)
{
    ctx(bd)->upsample_filter_block_luma_v[ratio_idx](
        dst, dststride, src, srcstride, y_BL, x_EL, y_EL, block_w, block_h,
        widthEL, heightEL, win, up);
}

void shim_upsample_filter_block_cr_h(int bd, int ratio_idx, int16_t *dst,
                                     ptrdiff_t dststride, uint8_t *src,
                                     ptrdiff_t srcstride, int x_EL, int x_BL,
                                     int block_w, int block_h, int widthEL,
                                     const struct HEVCWindow *win,
                                     struct UpsamplInf *up)
{
    ctx(bd)->upsample_filter_block_cr_h[ratio_idx](
        dst, dststride, src, srcstride, x_EL, x_BL, block_w, block_h,
        widthEL, win, up);
}

void shim_upsample_filter_block_cr_v(int bd, int ratio_idx, uint8_t *dst,
                                     ptrdiff_t dststride, int16_t *src,
                                     ptrdiff_t srcstride, int y_BL, int x_EL,
                                     int y_EL, int block_w, int block_h,
                                     int widthEL, int heightEL,
                                     const struct HEVCWindow *win,
                                     struct UpsamplInf *up)
{
    ctx(bd)->upsample_filter_block_cr_v[ratio_idx](
        dst, dststride, src, srcstride, y_BL, x_EL, y_EL, block_w, block_h,
        widthEL, heightEL, win, up);
}
