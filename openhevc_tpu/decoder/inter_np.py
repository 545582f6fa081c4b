"""NumPy inter prediction (motion compensation) for the plan executor.

Mirrors luma_mc_uni/bi + chroma_mc_uni/bi (hevc.c:1641-1965): quarter-pel
luma 8-tap, eighth-pel chroma 4-tap, replicate edge emulation, bi-pred
averaging with 14-bit intermediates.
"""

import numpy as np

from ..model import mc


def _gather_window(plane, x0, y0, w, h, before, after):
    """Replicate-padded window (h+before+after, w+before+after) starting at
    (x0-before, y0-before) — the emulated_edge_mc equivalent."""
    ph, pw = plane.shape
    ys = np.clip(np.arange(y0 - before, y0 + h + after), 0, ph - 1)
    xs = np.clip(np.arange(x0 - before, x0 + w + after), 0, pw - 1)
    return plane[np.ix_(ys, xs)]


def _mc_luma(ref_plane, x0, y0, w, h, mv, bd):
    mx, my = mv[0] & 3, mv[1] & 3
    xoff = x0 + (mv[0] >> 2)
    yoff = y0 + (mv[1] >> 2)
    win = _gather_window(ref_plane, xoff, yoff, w, h,
                         mc.QPEL_EXTRA_BEFORE, mc.QPEL_EXTRA_AFTER)
    return mc.qpel(win, mx, my, w, h, bd)


def _mc_chroma(ref_plane, x0c, y0c, wc, hc, mv, bd, hs=1, vs=1):
    # chroma MV precision follows the subsampling (chroma_mc_uni,
    # hevc.c:1834): 1/8-pel for subsampled axes, 1/4-pel (even 8th phases)
    # otherwise
    mx = (mv[0] & ((1 << (2 + hs)) - 1)) << (1 - hs)
    my = (mv[1] & ((1 << (2 + vs)) - 1)) << (1 - vs)
    xoff = x0c + (mv[0] >> (2 + hs))
    yoff = y0c + (mv[1] >> (2 + vs))
    win = _gather_window(ref_plane, xoff, yoff, wc, hc,
                         mc.EPEL_EXTRA_BEFORE, mc.EPEL_EXTRA_AFTER)
    return mc.epel(win, mx, my, wc, hc, bd)


def execute_inter_op(plan, planes, dpb, op):
    """op: InterOp with luma coords; writes all three planes."""
    bd = plan.bit_depth
    assert dpb is not None, "inter op requires a DPB"
    hs = 1 if plan.chroma_format_idc in (1, 2) else 0
    vs = 1 if plan.chroma_format_idc == 1 else 0
    x0c, y0c = op.x >> hs, op.y >> vs
    wc, hc = op.w >> hs, op.h >> vs

    vals = {0: [], 1: [], 2: []}
    for d in (op.l0, op.l1):
        if d is None:
            continue
        poc, mvx, mvy = d
        from .refs import get_or_synth
        ref = get_or_synth(dpb, poc, plan.width, plan.height, bd,
                           plan.chroma_format_idc)
        vals[0].append(_mc_luma(ref.planes[0], op.x, op.y, op.w, op.h,
                                (mvx, mvy), bd))
        vals[1].append(_mc_chroma(ref.planes[1], x0c, y0c, wc, hc,
                                  (mvx, mvy), bd, hs, vs))
        vals[2].append(_mc_chroma(ref.planes[2], x0c, y0c, wc, hc,
                                  (mvx, mvy), bd, hs, vs))

    for c in range(3):
        if not vals[c]:
            continue
        if op.weights is not None:
            dy, dc, w0, w1 = op.weights
            denom = dy if c == 0 else dc
            wx0, ox0 = w0[2 * c], w0[2 * c + 1]
            wx1, ox1 = w1[2 * c], w1[2 * c + 1]
            if len(vals[c]) == 2:
                out = mc.mc_bi_w(vals[c][0], vals[c][1], denom, wx0, wx1,
                                 ox0, ox1, bd)
            else:
                wx, ox = (wx0, ox0) if op.l0 is not None else (wx1, ox1)
                out = mc.mc_uni_w(vals[c][0], denom, wx, ox, bd)
        elif len(vals[c]) == 2:
            out = mc.mc_bi(vals[c][0], vals[c][1], bd)
        else:
            out = mc.mc_uni(vals[c][0], bd)
        if c == 0:
            planes[0][op.y:op.y + op.h, op.x:op.x + op.w] = out
        else:
            planes[c][y0c:y0c + hc, x0c:x0c + wc] = out
