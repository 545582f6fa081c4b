"""Per-slice in-loop filter parameter maps + boundary masking.

Multi-slice pictures can signal different deblock offsets / SAO enables per
slice (s->deblock[ctb] fill, hevc.c:2677-2680) and disable filtering across
slice boundaries (slice_loop_filter_across_slices_enabled_flag).  The
boundary-strength side of the masking happens at derivation time in both
front-ends; this module builds the remaining whole-frame artifacts:

- per-CTB beta/tc offset maps (deblocking_filter_CTB reads the containing
  CTB's params per edge, hevc_filter.c:359-369/481-486)
- the SAO boundary-restore masks replicating sao_filter_CTB's
  vert/horiz/diag edge restrictions + sao_edge_filter_1's restore loops
  (hevc_filter.c:197-260, hevcdsp_template.c sao_edge_filter_1)
"""

import numpy as np

from ..model import filters as flt


def build_filter_param_maps(segments, sps, pps):
    """segments: [(ts0, sh)] in decode order covering the picture.
    -> dict(beta_map, tc_map, lfase_map, slice_addr_map, any_deblock,
            any_sao_luma, any_sao_chroma, uniform)"""
    cw, ch = sps.ctb_width, sps.ctb_height
    n = sps.pic_size_in_ctbs
    beta = np.zeros((ch, cw), np.int32)
    tc = np.zeros((ch, cw), np.int32)
    lfase = np.ones((ch, cw), np.uint8)
    saddr = np.zeros((ch, cw), np.int32)
    any_deblock = False
    any_sao_l = False
    any_sao_c = False
    ts_starts = [t for t, _ in segments] + [n]
    ts_to_rs = pps.ctb_addr_ts_to_rs
    for i, (ts0, sh) in enumerate(segments):
        rs = np.asarray(ts_to_rs[ts0:ts_starts[i + 1]], np.int64)
        ys, xs = rs // cw, rs % cw
        beta[ys, xs] = sh.beta_offset
        tc[ys, xs] = sh.tc_offset
        lfase[ys, xs] = 1 if sh.loop_filter_across_slices else 0
        saddr[ys, xs] = sh.slice_addr
        any_deblock |= not sh.deblocking_filter_disabled
        any_sao_l |= bool(sh.sao_luma)
        any_sao_c |= bool(sh.sao_chroma)
    # a deblock-DISABLED slice's offsets are never consulted (its CTBs'
    # BS is zeroed at derivation), so the uniform check must ignore them:
    # the encoder's header clones carry stale offsets there while a parser
    # leaves the PPS defaults — comparing those desynchronizes the two
    # sides for identical bitstreams
    en = [sh for _, sh in segments if not sh.deblocking_filter_disabled]
    ref = en[0] if en else segments[0][1]
    uniform = all(sh.beta_offset == ref.beta_offset and
                  sh.tc_offset == ref.tc_offset for sh in en)
    return dict(beta_map=beta, tc_map=tc, lfase_map=lfase,
                slice_addr_map=saddr, any_deblock=any_deblock,
                any_sao_luma=any_sao_l, any_sao_chroma=any_sao_c,
                uniform=uniform, beta0=ref.beta_offset, tc0=ref.tc_offset)


def _tile_id_grid(sps, pps):
    if not pps.tiles_enabled or pps.tile_id is None:
        return None
    cw = sps.ctb_width
    rs = np.arange(sps.pic_size_in_ctbs)
    ts = np.asarray(pps.ctb_addr_rs_to_ts)[rs]
    return np.asarray(pps.tile_id)[ts].reshape(-1, cw)


def build_sao_boundary_restore(plan, sps, pps, lfase_map, slice_addr_map):
    """-> per-plane bool masks of SAO-restored pixels at slice/tile
    boundaries with cross-filtering disabled, or None if nothing applies."""
    no_tile_filter = bool(pps.tiles_enabled and
                          not pps.loop_filter_across_tiles_enabled)
    if plan.sao is None or (lfase_map.all() and not no_tile_filter):
        return None
    # single-slice picture: no slice boundaries exist, so lfase==0 restores
    # nothing (the reference's edge flags only fire across a slice_addr
    # change, hevc_filter.c sao edge flags) — skip the per-CTB scan
    if not no_tile_filter and \
            (slice_addr_map == slice_addr_map.flat[0]).all():
        return None
    ctb = 1 << plan.log2_ctb_size
    cfmt = plan.chroma_format_idc
    hs = 1 if cfmt in (1, 2) else 0
    vs = 1 if cfmt == 1 else 0
    ch, cw = lfase_map.shape
    tiles = _tile_id_grid(sps, pps)
    masks = [np.zeros((plan.height >> (vs if c else 0),
                       plan.width >> (hs if c else 0)), bool)
             for c in range(3)]
    SAO_EO_HORIZ, SAO_EO_VERT, SAO_EO_135D, SAO_EO_45D = 0, 1, 2, 3

    def slice_diff(y, x, yy, xx):
        return slice_addr_map[y, x] != slice_addr_map[yy, xx]

    def tile_diff(y, x, yy, xx):
        return tiles is not None and tiles[y, x] != tiles[yy, xx]

    for (rx, ry), sao in plan.sao.items():
        lf = bool(lfase_map[ry, rx])
        restore = no_tile_filter or not lf
        if not restore:
            continue
        borders = [rx == 0, ry == 0, rx == cw - 1, ry == ch - 1]
        lte = (not borders[0]) and no_tile_filter and tile_diff(ry, rx, ry, rx - 1)
        rte = (not borders[2]) and no_tile_filter and tile_diff(ry, rx, ry, rx + 1)
        ute = (not borders[1]) and no_tile_filter and tile_diff(ry, rx, ry - 1, rx)
        bte = (not borders[3]) and no_tile_filter and tile_diff(ry, rx, ry + 1, rx)
        vert = [0, 0]
        horiz = [0, 0]
        diag = [0, 0, 0, 0]
        if not borders[0]:
            vert[0] = (not lf and slice_diff(ry, rx, ry, rx - 1)) or lte
        if not borders[2]:
            vert[1] = (not lf and slice_diff(ry, rx, ry, rx + 1)) or rte
        if not borders[1]:
            horiz[0] = (not lf and slice_diff(ry, rx, ry - 1, rx)) or ute
        if not borders[3]:
            horiz[1] = (not lf and slice_diff(ry, rx, ry + 1, rx)) or bte
        if not borders[0] and not borders[1]:
            diag[0] = (not lf and slice_diff(ry, rx, ry - 1, rx - 1)) or lte or ute
        if not borders[1] and not borders[2]:
            diag[1] = (not lf and slice_diff(ry, rx, ry - 1, rx + 1)) or rte or ute
        if not borders[2] and not borders[3]:
            diag[2] = (not lf and slice_diff(ry, rx, ry + 1, rx + 1)) or rte or bte
        if not borders[0] and not borders[3]:
            diag[3] = (not lf and slice_diff(ry, rx, ry + 1, rx - 1)) or lte or bte
        if not any(vert) and not any(horiz) and not any(diag):
            continue
        for c in range(3):
            if int(sao.sao_type[c]) != 2:       # restores are edge-SAO only
                continue
            eo = int(sao.sao_eo_class[c])
            m = masks[c]
            ph, pw = m.shape
            cs = ctb >> ((hs if c else 0))
            csv = ctb >> ((vs if c else 0))
            x0, y0 = rx * cs, ry * csv
            width = min(cs, pw - x0)
            height = min(csv, ph - y0)
            init_x = init_y = 0
            # picture-border width/height adjustment (sao_edge_filter_1)
            if eo != SAO_EO_VERT:
                if borders[0]:
                    init_x = 1
                if borders[2]:
                    width -= 1
            if eo != SAO_EO_HORIZ:
                if borders[3]:
                    height -= 1
            save_ul = (not diag[0] and eo == SAO_EO_135D and
                       not borders[0] and not borders[1])
            save_ur = (not diag[1] and eo == SAO_EO_45D and
                       not borders[1] and not borders[2])
            save_lr = (not diag[2] and eo == SAO_EO_135D and
                       not borders[2] and not borders[3])
            save_ll = (not diag[3] and eo == SAO_EO_45D and
                       not borders[0] and not borders[3])
            if vert[0] and eo != SAO_EO_VERT:
                m[y0 + init_y + save_ul:y0 + height - save_ll, x0] = True
            if vert[1] and eo != SAO_EO_VERT:
                m[y0 + init_y + save_ur:y0 + height - save_lr,
                  x0 + width - 1] = True
            if horiz[0] and eo != SAO_EO_HORIZ:
                m[y0, x0 + init_x + save_ul:x0 + width - save_ur] = True
            if horiz[1] and eo != SAO_EO_HORIZ:
                m[y0 + height - 1,
                  x0 + init_x + save_ll:x0 + width - save_lr] = True
            if diag[0] and eo == SAO_EO_135D:
                m[y0, x0] = True
            if diag[1] and eo == SAO_EO_45D:
                m[y0, x0 + width - 1] = True
            if diag[2] and eo == SAO_EO_135D:
                m[y0 + height - 1, x0 + width - 1] = True
            if diag[3] and eo == SAO_EO_45D:
                m[y0 + height - 1, x0] = True
    if not any(m.any() for m in masks):
        return None
    return masks
