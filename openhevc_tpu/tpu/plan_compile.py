"""Host-side plan compiler: FramePlan -> wave-scheduled tensor batches.

Dependency analysis turns the sequential op list into parallel waves:
  - wave 0: all motion compensation (reads only DPB frames)
  - wave k: intra predictions whose reference samples were finalized in
    waves < k (tracked on a 4x4 write-wave grid per plane)
  - each wave's residuals execute after its predictions

This is the TPU-native replacement for the reference's per-CTB sequential
reconstruction: intra dependencies become explicit wave batches instead of
a serial walk (SURVEY.md §7 'wavefront scheduling').
"""

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from ..decoder.plan import FramePlan, IntraOp, ResidualOp, InterOp
from .residual import KIND_DCT, KIND_DST, KIND_DC, KIND_SKIP, KIND_BYPASS


@dataclass
class CompiledPlan:
    nwaves: int
    # inter: {(w, h): dict of arrays}
    inter: dict = field(default_factory=dict)
    # intra: {(wave, c_idx, size): dict of arrays}
    intra: dict = field(default_factory=dict)
    # residual: {(wave, c_idx, size): dict of arrays}
    residual: dict = field(default_factory=dict)
    ref_pocs: list = field(default_factory=list)


def compile_plan(plan: FramePlan):
    """Schedule ops into waves and build batched host arrays."""
    hs = 1 if plan.chroma_format_idc in (1, 2) else 0
    vs = 1 if plan.chroma_format_idc == 1 else 0
    shapes = [(plan.height, plan.width),
              (plan.height >> vs, plan.width >> hs),
              (plan.height >> vs, plan.width >> hs)]
    # final-write wave per 4x4 cell, per plane
    W = [np.zeros(((h + 3) // 4, (w + 3) // 4), np.int32) for h, w in shapes]

    ref_pocs = []
    inter_rows = defaultdict(list)
    intra_rows = defaultdict(list)
    resid_rows = defaultdict(list)
    nwaves = 1

    def poc_slot(poc):
        if poc not in ref_pocs:
            ref_pocs.append(poc)
        return ref_pocs.index(poc)

    for op in plan.ops:
        if isinstance(op, InterOp):
            pf = (1 if op.l0 else 0) + (2 if op.l1 else 0)
            s0 = poc_slot(op.l0[0]) if op.l0 else 0
            s1 = poc_slot(op.l1[0]) if op.l1 else 0
            mv0 = (op.l0[1], op.l0[2]) if op.l0 else (0, 0)
            mv1 = (op.l1[1], op.l1[2]) if op.l1 else (0, 0)
            if op.weights is not None:
                dy, dc, w0, w1 = op.weights
                wrow = (dy, dc) + w0 + w1
            else:
                wrow = (0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0)
            # decompose the PU into fixed tile sizes (MC is per-pixel
            # independent, so tiles share the PU's motion/weights)
            for (tx, ty, tw, th) in _tile_pu(op.x, op.y, op.w, op.h):
                inter_rows[(tw, th)].append(
                    (tx, ty, pf, s0, mv0[0], mv0[1], s1, mv1[0], mv1[1])
                    + wrow)
            # inter writes land in wave 0; the W grids start at 0 already
        elif isinstance(op, IntraOp):
            g = W[op.c_idx]
            gh, gw = g.shape
            n = op.size
            x4, y4 = op.x >> 2, op.y >> 2
            n4 = max(1, n >> 2)
            # read region: top strip (row y-1, x-1 .. x+2n-1) and left strip
            rmax = 0
            if op.y > 0:
                r0 = max(0, (op.x - 1) >> 2)
                r1 = min(gw, ((op.x + 2 * n - 1) >> 2) + 1)
                rmax = max(rmax, int(g[(op.y - 1) >> 2, r0:r1].max(initial=0)))
            if op.x > 0:
                c0 = max(0, (op.y - 1) >> 2)
                c1 = min(gh, ((op.y + 2 * n - 1) >> 2) + 1)
                rmax = max(rmax, int(g[c0:c1, (op.x - 1) >> 2].max(initial=0)))
            wave = rmax + 1
            nwaves = max(nwaves, wave + 1)
            g[y4:y4 + n4, x4:x4 + n4] = wave
            flags = (int(op.cand_bottom_left), int(op.cand_left),
                     int(op.cand_up_left), int(op.cand_up),
                     int(op.cand_up_right))
            intra_rows[(wave, op.c_idx, n)].append(
                (op.x, op.y, op.mode) + flags)
        elif isinstance(op, ResidualOp):
            g = W[op.c_idx]
            n = 1 << op.log2_size
            x4, y4 = op.x >> 2, op.y >> 2
            n4 = max(1, n >> 2)
            wave = int(g[y4:y4 + n4, x4:x4 + n4].max())
            if op.transquant_bypass:
                kind = KIND_BYPASS
            elif op.transform_skip:
                kind = KIND_SKIP
            elif op.use_dst:
                kind = KIND_DST
            else:
                kind = KIND_DCT
            resid_rows[(wave, op.c_idx, n)].append(
                (op.x, op.y, op.qp, kind, op.levels))
        elif type(op).__name__ == "PcmOp":
            pass        # PCM samples go into the base canvas (tpu/backend.py)
        else:
            raise NotImplementedError(f"op {type(op)}")

    cp = CompiledPlan(nwaves=nwaves, ref_pocs=ref_pocs)
    for (w, h), rows in inter_rows.items():
        a = np.asarray([r for r in rows], np.int32)
        cp.inter[(w, h)] = dict(
            xs=a[:, 0], ys=a[:, 1], pf=a[:, 2],
            s0=a[:, 3], mvx0=a[:, 4], mvy0=a[:, 5],
            s1=a[:, 6], mvx1=a[:, 7], mvy1=a[:, 8],
            wden=a[:, 9:11], w0=a[:, 11:17], w1=a[:, 17:23])
    for key, rows in intra_rows.items():
        a = np.asarray(rows, np.int32)
        cp.intra[key] = dict(xs=a[:, 0], ys=a[:, 1], modes=a[:, 2],
                             flags=a[:, 3:8])
    for key, rows in resid_rows.items():
        n = key[2]
        xs = np.asarray([r[0] for r in rows], np.int32)
        ys = np.asarray([r[1] for r in rows], np.int32)
        qp = np.asarray([r[2] for r in rows], np.int32)
        kind = np.asarray([r[3] for r in rows], np.int32)
        levels = np.stack([r[4] for r in rows]).astype(np.int32)
        cp.residual[key] = dict(xs=xs, ys=ys, qp=qp, kind=kind, levels=levels)
    return cp


TILE_SIZES = ((64, 64), (32, 32), (16, 16), (16, 4), (4, 16), (4, 4))


def _tile_pu(x, y, w, h):
    """Cover a (w, h) PU (dims multiples of 4) with fixed tile sizes.

    Greedy largest-first: 64/32 square tiles cover the aligned interior
    (a 64x64 skip PU is ONE DMA window in the Pallas MC kernel instead of
    sixteen 16x16 ones — per-window DMA latency dominates small tiles),
    16x16 covers the remainder, 4-strips the edges."""
    out = []
    y64, x64 = h - h % 64, w - w % 64
    y32, x32 = h - h % 32, w - w % 32
    y16, x16 = h - h % 16, w - w % 16
    for ty in range(0, y64, 64):
        for tx in range(0, x64, 64):
            out.append((x + tx, y + ty, 64, 64))
    for ty in range(0, y32, 32):
        for tx in range(0, x32, 32):
            if tx < x64 and ty < y64:
                continue                    # covered by a 64 tile
            out.append((x + tx, y + ty, 32, 32))
    for ty in range(0, y16, 16):
        for tx in range(0, x16, 16):
            if tx < x32 and ty < y32:
                continue                    # covered by a 64/32 tile
            out.append((x + tx, y + ty, 16, 16))
    for ty in range(0, y16, 16):
        for tx in range(x16, w, 4):
            out.append((x + tx, y + ty, 4, 16))
    for ty in range(y16, h, 4):
        for tx in range(0, x16, 16):
            out.append((x + tx, y + ty, 16, 4))
        for tx in range(x16, w, 4):
            out.append((x + tx, y + ty, 4, 4))
    return out


def pad_batch(arrs: dict, pad_to_pow2=True):
    """Pad batch arrays to the next power of two (jit cache stability).

    Returns (padded dict, valid mask).
    """
    n = len(next(iter(arrs.values())))
    target = 1
    while target < n:
        target *= 2
    target = max(target, 8)
    valid = np.zeros(target, bool)
    valid[:n] = True
    out = {}
    for k, v in arrs.items():
        pad = target - n
        if pad:
            v = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        out[k] = v
    return out, valid
