"""NumPy plan executor: the exact-integer reference back-end.

Executes a FramePlan against frame planes, then runs the in-loop filters.
This is the semantic contract the TPU back-end must reproduce bit-exactly;
it is also the encoder's reconstruction path.
"""

import numpy as np

from ..model import transforms as tr
from ..model import intra as ipred
from ..model import filters as flt
from .plan import FramePlan, IntraOp, ResidualOp, PcmOp


def alloc_frame(plan: FramePlan):
    w, h = plan.width, plan.height
    cf = plan.chroma_format_idc
    cw = w >> (1 if cf in (1, 2) else 0)
    ch = h >> (1 if cf == 1 else 0)
    return [np.zeros((h, w), np.int32),
            np.zeros((ch, cw), np.int32),
            np.zeros((ch, cw), np.int32)]


def execute_plan(plan: FramePlan, planes=None, dpb=None):
    """Run prediction + residual ops in order. Returns pre-filter planes."""
    if planes is None:
        planes = alloc_frame(plan)
    bd = plan.bit_depth
    cc_state = getattr(plan, "cc_state", {})
    for op in plan.ops:
        if isinstance(op, IntraOp):
            pl = planes[op.c_idx]
            top, left = ipred.build_reference_samples(
                pl, op.x, op.y, op.size, op.cand_bottom_left, op.cand_left,
                op.cand_up_left, op.cand_up, op.cand_up_right,
                op.bottom_left_size, op.top_right_size, bd)
            if not plan.intra_smoothing_disabled:
                top, left = ipred.filter_reference_samples(
                    top, left, op.mode, op.size, op.c_idx, bd,
                    strong_intra_smoothing=plan.strong_intra_smoothing,
                    chroma_444=(plan.chroma_format_idc == 3))
            pl[op.y:op.y + op.size, op.x:op.x + op.size] = \
                ipred.predict(op.mode, top, left, op.size, op.c_idx, bd)
        elif isinstance(op, ResidualOp):
            n = 1 << op.log2_size
            pl = planes[op.c_idx]
            if op.transquant_bypass:
                res = op.levels
                if op.rdpcm_dir >= 0:
                    res = tr.transform_rdpcm(res, op.rdpcm_dir == 1)
            else:
                sm = None
                if plan.scaling is not None and op.matrix_id >= 0:
                    sm = plan.scaling[(op.log2_size, op.matrix_id)]
                deq = tr.dequant(op.levels, op.qp, op.log2_size, bd,
                                 scale_matrix=sm,
                                 dc_scale=int(sm[0, 0]) if sm is not None
                                 else 16)
                if op.transform_skip:
                    if op.rot:
                        # RExt 4x4 transform-skip rotation: full coefficient
                        # reversal before scaling (hevc_cabac.c:1876-1882)
                        deq = deq[::-1, ::-1]
                    res = tr.transform_skip(deq, op.log2_size, bd)
                elif op.use_dst:
                    res = tr.idst4x4(deq, bd)
                else:
                    nz = np.nonzero(op.levels)
                    if len(nz[0]) == 1 and nz[0][0] == 0 and nz[1][0] == 0:
                        res = tr.idct_dc(int(deq[0, 0]), n, bd)
                    else:
                        res = tr.idct2d(deq, bd)
                if op.rdpcm_dir >= 0:
                    res = tr.transform_rdpcm(res, op.rdpcm_dir == 1)
            if op.c_idx == 0:
                cc_state["luma"] = (op.x, op.y, op.log2_size, res)
            elif op.cc_alpha:
                # cross-component prediction: add the scaled collocated luma
                # residual with int16 wraparound (hevc_cabac.c:1942-1947)
                lx, ly_, ll, lres = cc_state["luma"]
                assert (lx, ly_, ll) == (op.x, op.y, op.log2_size)
                res = (res + ((op.cc_alpha * lres) >> 3)) \
                    .astype(np.int16).astype(np.int32)
            blk = pl[op.y:op.y + n, op.x:op.x + n]
            pl[op.y:op.y + n, op.x:op.x + n] = tr.transform_add(blk, res, bd)
        elif isinstance(op, PcmOp):
            pl = planes[op.c_idx]
            pl[op.y:op.y + op.size, op.x:op.x + op.size] = op.samples
        else:
            from .inter_np import execute_inter_op
            execute_inter_op(plan, planes, dpb, op)
    return planes


def deblock_frame(plan: FramePlan, planes):
    """Whole-frame deblocking: all vertical edges, then all horizontal."""
    if plan.deblock_disable:
        return planes
    bd = plan.bit_depth
    luma = planes[0]
    h, w = luma.shape
    qp_map = plan.qp_map          # (h/8-ish, w/8) per min-cb... stored 8x8
    vbs, hbs = plan.vertical_bs, plan.horizontal_bs
    nfm = plan.no_filter_map

    def edge_qp(xp, yp, xq, yq):
        return (int(qp_map[yp >> 3, xp >> 3]) + int(qp_map[yq >> 3, xq >> 3]) + 1) >> 1

    # per-edge deblock offsets: the containing CTB's slice params
    # (deblocking_filter_CTB reads s->deblock[ctb], hevc_filter.c:359)
    l2 = plan.log2_ctb_size
    bmap, tmap = plan.deblock_beta_map, plan.deblock_tc_map

    def edge_offs(x, y):
        if bmap is None:
            return plan.beta_offset, plan.tc_offset
        return int(bmap[y >> l2, x >> l2]), int(tmap[y >> l2, x >> l2])

    def tc_off_h(x, y, step=8):
        """Horizontal-pass tc offset: the reference's TC_CALC always reads
        the CURRENT CTB's tc_offset even for the left-CTB columns
        (hevc_filter.c: tc_offset is never reset to left in the horizontal
        luma loop; chroma half 1 uses cur_tc_offset explicitly).  step is
        the half spacing (8 luma, 4*hsub chroma)."""
        if tmap is None:
            return plan.tc_offset
        cw_ = tmap.shape[1]
        return int(tmap[y >> l2, min((x + step) >> l2, cw_ - 1)])

    # vertical edges: x multiple of 8, segments of 8 rows (2x4)
    if vbs is not None:
        for x in range(8, w, 8):
            for y in range(0, h, 8):
                bs = [int(vbs[(y >> 2) + j, x >> 3]) for j in range(2)
                      if (y >> 2) + j < vbs.shape[0]]
                if len(bs) < 2:
                    bs = bs + [0]
                if not any(bs):
                    continue
                qp = edge_qp(x - 1, y, x, y)
                b_off, t_off = edge_offs(x, y)
                beta = int(flt.BETA_TABLE[np.clip(qp + b_off, 0, 51)])
                tc = [int(flt.TC_TABLE[np.clip(qp + 2 * (b - 1) + t_off, 0, 53)])
                      if b else 0 for b in bs]
                rows = min(8, h - y)
                patch = np.zeros((8, 8), np.int32)
                patch[:rows] = luma[y:y + rows, x - 4:x + 4]
                no_p = [0, 0] if nfm is None else \
                    [int(nfm[(y + 4 * j) >> 2, (x - 1) >> 2]) for j in range(2)]
                no_q = [0, 0] if nfm is None else \
                    [int(nfm[(y + 4 * j) >> 2, x >> 2]) for j in range(2)]
                out = flt.deblock_luma(patch, beta, tc, no_p, no_q, bd)
                luma[y:y + rows, x - 4:x + 4] = out[:rows]
    # horizontal edges
    for y in range(8, h, 8):
        for x in range(0, w, 8):
            bs = [int(hbs[y >> 3, (x >> 2) + j]) for j in range(2)
                  if (x >> 2) + j < hbs.shape[1]]
            if len(bs) < 2:
                bs = bs + [0]
            if not any(bs):
                continue
            cols = min(8, w - x)
            qp = edge_qp(x, y - 1, x, y)
            b_off, _ = edge_offs(x, y)
            t_off = tc_off_h(x, y)
            beta = int(flt.BETA_TABLE[np.clip(qp + b_off, 0, 51)])
            tc = [int(flt.TC_TABLE[np.clip(qp + 2 * (b - 1) + t_off, 0, 53)])
                  if b else 0 for b in bs]
            patch = np.zeros((8, 8), np.int32)
            patch[:, :cols] = luma[y - 4:y + 4, x:x + cols]
            no_p = [0, 0] if nfm is None else \
                [int(nfm[(y - 1) >> 2, (x + 4 * j) >> 2]) for j in range(2)]
            no_q = [0, 0] if nfm is None else \
                [int(nfm[y >> 2, (x + 4 * j) >> 2]) for j in range(2)]
            out = flt.deblock_luma(patch.T, beta, tc, no_p, no_q, bd).T
            luma[y - 4:y + 4, x:x + cols] = out[:, :cols]

    # chroma: edges on the chroma 8-grid (luma 8*hsub / 8*vsub grid),
    # bs == 2 only (deblocking_filter_CTB chroma loops, hevc_filter.c:424)
    if plan.chroma_format_idc in (1, 2, 3):
        hsub = 2 if plan.chroma_format_idc in (1, 2) else 1
        vsub = 2 if plan.chroma_format_idc == 1 else 1
        for c_idx in (1, 2):
            pl = planes[c_idx]
            ch, cw = pl.shape
            qp_off = plan.cb_qp_offset if c_idx == 1 else plan.cr_qp_offset
            if vbs is not None:
                for x in range(8 * hsub, w, 8 * hsub):
                    for y in range(0, h, 8 * vsub):
                        bs = []
                        for j in range(2):
                            yy = (y + 4 * vsub * j) >> 2
                            bs.append(int(vbs[yy, x >> 3])
                                      if yy < vbs.shape[0] else 0)
                        if not any(b == 2 for b in bs):
                            continue
                        xc, yc = x // hsub, y // vsub
                        rows = min(8, ch - yc)
                        tc = []
                        _, t_off = edge_offs(x, y)
                        for j, b in enumerate(bs):
                            if b == 2:
                                yl = min(y + 4 * vsub * j, h - 1)
                                qp = _chroma_edge_qp(plan, x - 1, yl, x, yl,
                                                     qp_off)
                                tc.append(int(flt.TC_TABLE[
                                    np.clip(qp + 2 + t_off, 0, 53)]))
                            else:
                                tc.append(0)
                        patch = np.zeros((8, 4), np.int32)
                        patch[:rows] = pl[yc:yc + rows, xc - 2:xc + 2]
                        no_p = [0, 0] if nfm is None else \
                            [int(nfm[min(y + 4 * vsub * j, h - 4) >> 2,
                                     (x - 1) >> 2]) for j in range(2)]
                        no_q = [0, 0] if nfm is None else \
                            [int(nfm[min(y + 4 * vsub * j, h - 4) >> 2,
                                     x >> 2]) for j in range(2)]
                        out = flt.deblock_chroma(patch, tc, no_p, no_q, bd)
                        pl[yc:yc + rows, xc - 2:xc + 2] = out[:rows]
                for y in range(8 * vsub, h, 8 * vsub):
                    for x in range(0, w, 8 * hsub):
                        bs = []
                        for j in range(2):
                            xx = (x + 4 * hsub * j) >> 2
                            bs.append(int(hbs[y >> 3, xx])
                                      if xx < hbs.shape[1] else 0)
                        if not any(b == 2 for b in bs):
                            continue
                        xc, yc = x // hsub, y // vsub
                        cols = min(8, cw - xc)
                        tc = []
                        for j, b in enumerate(bs):
                            if b == 2:
                                t_off = tc_off_h(x + 4 * hsub * j, y,
                                                 step=4 * hsub)
                                xl = min(x + 4 * hsub * j, w - 1)
                                qp = _chroma_edge_qp(plan, xl, y - 1, xl, y,
                                                     qp_off)
                                tc.append(int(flt.TC_TABLE[
                                    np.clip(qp + 2 + t_off, 0, 53)]))
                            else:
                                tc.append(0)
                        seg = pl[yc - 2:yc + 2, xc:xc + cols]
                        patch2 = np.zeros((8, 4), np.int32)
                        patch2[:cols, :] = seg.T
                        no_p = [0, 0] if nfm is None else \
                            [int(nfm[(y - 1) >> 2,
                                     min(x + 4 * hsub * j, w - 4) >> 2])
                             for j in range(2)]
                        no_q = [0, 0] if nfm is None else \
                            [int(nfm[y >> 2,
                                     min(x + 4 * hsub * j, w - 4) >> 2])
                             for j in range(2)]
                        out = flt.deblock_chroma(patch2, tc, no_p, no_q, bd)
                        pl[yc - 2:yc + 2, xc:xc + cols] = out[:cols, :].T
    return planes


def _chroma_edge_qp(plan, xp, yp, xq, yq, qp_off):
    qp_map = plan.qp_map
    qp = (int(qp_map[yp >> 3, xp >> 3]) + int(qp_map[yq >> 3, xq >> 3]) + 1) >> 1
    # chroma qp mapping: 4:2:0 table, min(qp,51) otherwise (chroma_tc,
    # hevc_filter.c:62-85)
    from ..syntax.ctu import _QP_C
    qp_i = max(0, min(57, qp + qp_off))
    if plan.chroma_format_idc != 1:
        return min(qp_i, 51)
    if qp_i < 30:
        return qp_i
    if qp_i > 43:
        return qp_i - 6
    return _QP_C[qp_i - 30]


def sao_frame(plan: FramePlan, planes, ctb_size: int):
    """Whole-frame SAO using the per-CTB parameters."""
    if plan.sao is None or not (plan.sao_luma or plan.sao_chroma):
        return planes
    bd = plan.bit_depth
    out = [p.copy() for p in planes]
    w, h = plan.width, plan.height
    ctbs_w = (w + ctb_size - 1) // ctb_size
    for (rx, ry), sao in plan.sao.items():
        for c_idx in range(3):
            t = int(sao.sao_type[c_idx])
            if t == 0:
                continue
            pl = planes[c_idx]
            ph, pw = pl.shape
            hs_ = 1 if (c_idx and plan.chroma_format_idc in (1, 2)) else 0
            vs_ = 1 if (c_idx and plan.chroma_format_idc == 1) else 0
            csx = ctb_size >> hs_
            csy = ctb_size >> vs_
            x0, y0 = rx * csx, ry * csy
            x1, y1 = min(x0 + csx, pw), min(y0 + csy, ph)
            if t == 1:      # band
                out[c_idx][y0:y1, x0:x1] = flt.sao_band(
                    pl[y0:y1, x0:x1], sao.sao_offsets[c_idx][1:5],
                    int(sao.sao_band_position[c_idx]), bd)
            else:           # edge
                eo = int(sao.sao_eo_class[c_idx])
                # window with 1-px halo clamped to picture
                ax0, ay0 = max(x0 - 1, 0), max(y0 - 1, 0)
                ax1, ay1 = min(x1 + 1, pw), min(y1 + 1, ph)
                win = pl[ay0:ay1, ax0:ax1]
                pad = np.pad(win, ((1 - (y0 - ay0), 1 - (ay1 - y1)),
                                   (1 - (x0 - ax0), 1 - (ax1 - x1))), mode="edge")
                filt = flt.sao_edge(pad, sao.sao_offsets[c_idx], eo, bd)
                blk = filt.copy()
                # picture-border pixels copy (reference borders[] handling)
                if eo != flt.SAO_EO_VERT:
                    if x0 == 0:
                        blk[:, 0] = pl[y0:y1, 0]
                    if x1 == pw:
                        blk[:, -1] = pl[y0:y1, -1]
                if eo != flt.SAO_EO_HORIZ:
                    if y0 == 0:
                        blk[0, :] = pl[0, x0:x1]
                    if y1 == ph:
                        blk[-1, :] = pl[-1, x0:x1]
                out[c_idx][y0:y1, x0:x1] = blk
    # slice/tile-boundary SAO restores (sao_edge_filter_1, cross-filtering
    # disabled)
    if plan.sao_restore is not None:
        for c_idx in range(3):
            m = plan.sao_restore[c_idx]
            out[c_idx][m] = planes[c_idx][m]
    # restore transquant-bypass / pcm pixels (restore_tqb_pixels)
    if plan.no_filter_map is not None and plan.no_filter_map.any():
        for c_idx in range(3):
            # per-axis chroma shifts (4:2:2 halves x only), matching
            # restore_tqb_pixels' x >> hshift / y >> vshift indexing
            hsc = 1 if (c_idx and plan.chroma_format_idc in (1, 2)) else 0
            vsc = 1 if (c_idx and plan.chroma_format_idc == 1) else 0
            pl, o = planes[c_idx], out[c_idx]
            ys, xs = np.nonzero(plan.no_filter_map)
            for yy, xx in zip(ys, xs):
                y0, x0 = (yy * 4) >> vsc, (xx * 4) >> hsc
                o[y0:y0 + (4 >> vsc), x0:x0 + (4 >> hsc)] = \
                    pl[y0:y0 + (4 >> vsc), x0:x0 + (4 >> hsc)]
    return out
