"""NumPy scalar model of SHVC inter-layer upsampling.

Semantics match the reference's upsample_base_layer_frame and the per-block
upsample_filter_block_* family (hevcdsp_template.c:1834-2440) bit-exactly:
separable polyphase FIR — 8-tap luma / 4-tap chroma — with 16-phase
coefficient tables (hevcdsp.c:948-1005), fixed-point 12-bit reference
positions derived from the layer scale factors (hevc.c:446-502), and
edge-replicate source clamping.

The scaled-reference-layer window is assumed zero (the common SHM setup);
phase_align_flag defaults to 0.
"""

import numpy as np

N_SHIFT = 12                    # hevcdsp.h:41 (20-8, bit-depth independent)
I_OFFSET = 1 << (N_SHIFT - 1)

# hevcdsp.c:968 up_sample_filter_luma[16][8]
UP_FILTER_LUMA = np.array([
    [0,  0,   0, 64,  0,   0,  0,  0],
    [0,  1,  -3, 63,  4,  -2,  1,  0],
    [-1, 2,  -5, 62,  8,  -3,  1,  0],
    [-1, 3,  -8, 60, 13,  -4,  1,  0],
    [-1, 4, -10, 58, 17,  -5,  1,  0],
    [-1, 4, -11, 52, 26,  -8,  3, -1],
    [-1, 3,  -9, 47, 31, -10,  4, -1],
    [-1, 4, -11, 45, 34, -10,  4, -1],
    [-1, 4, -11, 40, 40, -11,  4, -1],
    [-1, 4, -10, 34, 45, -11,  4, -1],
    [-1, 4, -10, 31, 47,  -9,  3, -1],
    [-1, 3,  -8, 26, 52, -11,  4, -1],
    [0,  1,  -5, 17, 58, -10,  4, -1],
    [0,  1,  -4, 13, 60,  -8,  3, -1],
    [0,  1,  -3,  8, 62,  -5,  2, -1],
    [0,  1,  -2,  4, 63,  -3,  1,  0],
], np.int32)

# hevcdsp.c:948 up_sample_filter_chroma[16][4]
UP_FILTER_CHROMA = np.array([
    [0,  64,  0,  0],
    [-2, 62,  4,  0],
    [-2, 58, 10, -2],
    [-4, 56, 14, -2],
    [-4, 54, 16, -2],
    [-6, 52, 20, -2],
    [-6, 46, 28, -4],
    [-4, 42, 30, -4],
    [-4, 36, 36, -4],
    [-4, 30, 42, -4],
    [-4, 28, 46, -6],
    [-2, 20, 52, -6],
    [-2, 16, 54, -4],
    [-2, 14, 56, -4],
    [-2, 10, 58, -2],
    [0,   4, 62, -2],
], np.int32)


class UpsampleInfo:
    """Layer scale/phase parameters (reference UpsamplInf, hevc.c:446-502)."""

    def __init__(self, width_bl, height_bl, width_el, height_el,
                 phase_align_flag=0):
        self.width_bl, self.height_bl = width_bl, height_bl
        self.width_el, self.height_el = width_el, height_el
        phase_x = phase_align_flag << 1
        phase_y = phase_align_flag << 1
        phase_xc = 0
        phase_yc = 1
        self.scale_x = ((width_bl << 16) + (width_el >> 1)) // width_el
        self.scale_y = ((height_bl << 16) + (height_el >> 1)) // height_el
        self.add_x = ((phase_x * self.scale_x + 2) >> 2) + (1 << 11)
        self.add_y = ((phase_y * self.scale_y + 2) >> 2) + (1 << 11)
        self.add_xc = (((phase_xc + phase_align_flag) * self.scale_x + 2)
                       >> 2) + (1 << 11)
        self.add_yc = (((phase_yc + phase_align_flag) * self.scale_y + 2)
                       >> 2) + (1 << 11)

    @property
    def is_snr(self):
        return self.scale_x == 65536 and self.scale_y == 65536


def _phase_positions(n_el, scale, add, ntaps, v_chroma=False):
    """-> (refpos (n_el,), phase (n_el,)) for one direction."""
    x = np.arange(n_el, dtype=np.int64)
    refpos16 = (x * scale + add) >> 12
    if v_chroma:
        refpos16 -= 4           # 4:2:0 chroma vertical siting (template:2363)
    phase = refpos16 & 15
    refpos = (refpos16 >> 4) - (ntaps // 2 - 1)
    return refpos.astype(np.int64), phase.astype(np.int64)


def _fir_1d(src, refpos, phase, table, axis):
    """Separable FIR along `axis` with edge-replicate clamping; int32."""
    ntaps = table.shape[1]
    n_src = src.shape[axis]
    coef = table[phase]                          # (n_el, ntaps)
    out = None
    for k in range(ntaps):
        idx = np.clip(refpos + k, 0, n_src - 1)
        taken = np.take(src, idx, axis=axis)
        term = taken * (coef[:, k] if axis == 1 else coef[:, k][:, None])
        out = term if out is None else out + term
    return out


def upsample_plane(src, width_el, height_el, info: UpsampleInfo, c_idx,
                   bit_depth=8):
    """BL plane (int array) -> EL-size plane, bit-exact vs the reference."""
    src = np.asarray(src, np.int32)
    if c_idx == 0:
        table = UP_FILTER_LUMA
        scale_x, add_x = info.scale_x, info.add_x
        scale_y, add_y = info.scale_y, info.add_y
        v_chroma = False
    else:
        table = UP_FILTER_CHROMA
        scale_x, add_x = info.scale_x, info.add_xc
        scale_y, add_y = info.scale_y, info.add_yc
        v_chroma = True
    ntaps = table.shape[1]
    # horizontal stage; the reference stores the intermediate in int16_t,
    # which WRAPS for >8-bit inputs — reproduce the wraparound exactly
    rp_x, ph_x = _phase_positions(width_el, scale_x, add_x, ntaps)
    tmp = _fir_1d(src, rp_x, ph_x, table, axis=1) \
        .astype(np.int16).astype(np.int32)
    # vertical: EL rows
    rp_y, ph_y = _phase_positions(height_el, scale_y, add_y, ntaps,
                                  v_chroma=v_chroma)
    acc = _fir_1d(tmp, rp_y, ph_y, table, axis=0)
    return np.clip((acc + I_OFFSET) >> N_SHIFT, 0, (1 << bit_depth) - 1) \
        .astype(np.int32)


def upsample_frame(bl_planes, width_el, height_el, bit_depth=8,
                   chroma_format_idc=1, phase_align_flag=0):
    """[Y, U, V] BL planes -> EL-size planes (reference
    upsample_base_layer_frame, hevcdsp_template.c:2164)."""
    hb, wb = np.asarray(bl_planes[0]).shape
    info = UpsampleInfo(wb, hb, width_el, height_el, phase_align_flag)
    if info.is_snr:
        return [np.asarray(p, np.int32).copy() for p in bl_planes]
    hs = 1 if chroma_format_idc in (1, 2) else 0
    vs = 1 if chroma_format_idc == 1 else 0
    out = [upsample_plane(bl_planes[0], width_el, height_el, info, 0,
                          bit_depth)]
    for c in (1, 2):
        out.append(upsample_plane(bl_planes[c], width_el >> hs,
                                  height_el >> vs, info, c, bit_depth))
    return out


def scaling_factors(info: UpsampleInfo):
    """8-bit fixed EL/BL scale (hevc.c:473-474)."""
    sf_x = min(max(((info.width_el << 8) + (info.width_bl >> 1))
                   // info.width_bl, -4096), 4095)
    sf_y = min(max(((info.height_el << 8) + (info.height_bl >> 1))
                   // info.height_bl, -4096), 4095)
    return sf_x, sf_y


def _scale_mv(v, sf):
    v = int(v)
    return min(max((sf * v + 127 + (1 if sf * v < 0 else 0)) >> 8, -32768),
               32767)


def upscale_mv_field(bl_mv, bl_ref_idx, bl_poc, bl_pred, width_el, height_el,
                     info: UpsampleInfo, nb_list=2):
    """Upscale the BL motion field to the EL for TMVP through the
    inter-layer reference (ff_upscale_mv_block, hevc_filter.c:1311-1366).

    bl_* are 4x4-granularity fields.  Only the 16-aligned 4x4 cell of each
    EL 16x16 region is written (TMVP reads exactly those cells); the MV is
    taken from the BL cell at the 16-rounded collocated center and scaled
    by the 8-bit ScalingFactor.
    """
    h4, w4 = height_el >> 2, width_el >> 2
    mv = np.zeros((h4, w4, 2, 2), np.int32)
    ref_idx = np.zeros((h4, w4, 2), np.int8)
    poc = np.zeros((h4, w4, 2), np.int32)
    pred = np.zeros((h4, w4), np.uint8)
    sf_x, sf_y = scaling_factors(info)
    snr = info.is_snr
    bh4, bw4 = bl_pred.shape
    for y16 in range(0, height_el, 16):
        for x16 in range(0, width_el, 16):
            xbl = (((min(max(x16 + 8, 0), width_el - 1)) * info.scale_x +
                    (1 << 15)) >> 16) + 4
            ybl = (((min(max(y16 + 8, 0), height_el - 1)) * info.scale_y +
                    (1 << 15)) >> 16) + 4
            y0, x0 = y16 >> 2, x16 >> 2
            if not (xbl < info.width_bl and ybl < info.height_bl):
                continue
            bx, by = (xbl >> 4) << 2, (ybl >> 4) << 2
            bx, by = min(bx, bw4 - 1), min(by, bh4 - 1)
            if not bl_pred[by, bx]:
                continue
            if snr:
                mv[y0, x0] = bl_mv[by, bx]
                ref_idx[y0, x0] = bl_ref_idx[by, bx]
                poc[y0, x0] = bl_poc[by, bx]
                pred[y0, x0] = bl_pred[by, bx]
                continue
            for lx in range(nb_list):
                mv[y0, x0, lx, 0] = _scale_mv(bl_mv[by, bx, lx, 0], sf_x)
                mv[y0, x0, lx, 1] = _scale_mv(bl_mv[by, bx, lx, 1], sf_y)
                ref_idx[y0, x0, lx] = bl_ref_idx[by, bx, lx]
                poc[y0, x0, lx] = bl_poc[by, bx, lx]
                pred[y0, x0] = bl_pred[by, bx]
    return mv, ref_idx, poc, pred
