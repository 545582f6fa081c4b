"""Fused wavefront executor: the whole intra/residual schedule as one
jit-compiled lax.scan over dependency slots.

The naive path dispatches one kernel per (wave, plane, size); on a remote
TPU the dispatch latency dominates for intra-heavy frames.  Here the host
packs blocks into T slots of fixed per-(plane,size) capacity (dependencies
only ever push a block to a *later* slot, which is always legal), stacks
everything into (T, C, ...) tensors, and a single scan executes all slots
on-device.  Compile cache keys on the capacity profile only.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..decoder.plan import IntraOp, ResidualOp, InterOp
from .intra import intra_batch
from .residual import residual_batch, scatter_add_residual, \
    KIND_DST, KIND_SKIP, KIND_BYPASS, KIND_DCT

SIZES = (4, 8, 16, 32)


def _pow2(x):
    p = 8
    while p < x:
        p *= 2
    return p


def canonical_keys(chroma_format_idc):
    """Stable intra slot-key set so the fused program compiles once per
    profile.  Residuals are NOT slot-scheduled: dequant+IDCT depends only on
    the coefficients, never on reconstructed pixels, so the whole frame's
    residuals batch into one dispatch per size (see canonical_resid_keys)
    and the scan carries intra prediction only."""
    keys = []
    for c in (0, 1, 2):
        sizes = (4, 8, 16, 32) if (c == 0 or chroma_format_idc == 3) \
            else (4, 8, 16)
        for n in sizes:
            keys.append(("intra", c, n))
    return tuple(sorted(keys))


def canonical_resid_keys(chroma_format_idc):
    keys = []
    for c in (0, 1, 2):
        sizes = (4, 8, 16, 32) if (c == 0 or chroma_format_idc == 3) \
            else (4, 8, 16)
        for n in sizes:
            keys.append((c, n))
    return tuple(sorted(keys))


def schedule_slots(plan, min_caps=None, intra=True):
    """Pack intra ops into balanced dependency slots; batch residuals flat.

    Returns (T, caps, data, resid):
      data[("intra", c, n)]: flat slot-ordered numpy arrays (xs, ys, modes,
        flags, offs, counts); the device scan dynamic-slices a fixed
        C=caps[key] rows per slot, masked by the slot's true count.
      resid[(c, n)]: the WHOLE frame's residual blocks of that size in one
        flat batch (xs, ys, qp, kind, mid, levels) — dequant+IDCT has no
        dependency on reconstruction, so it never enters the scan.
    T is padded to a power of two.  min_caps: sticky per-key capacity floor
    (stabilizes the jit profile across frames).
    """
    hs = 1 if plan.chroma_format_idc in (1, 2) else 0
    vs = 1 if plan.chroma_format_idc == 1 else 0
    shapes = [(plan.height, plan.width),
              (plan.height >> vs, plan.width >> hs),
              (plan.height >> vs, plan.width >> hs)]
    W = [np.zeros(((h + 3) // 4, (w + 3) // 4), np.int32) for h, w in shapes]

    # residuals: full-frame flat batches per (plane, size)
    from ..decoder.plan import PcmOp
    resid_rows = {}
    intra_ops = []
    for op in plan.ops:
        if isinstance(op, IntraOp):
            if intra:
                intra_ops.append(op)
        elif isinstance(op, ResidualOp):
            resid_rows.setdefault((op.c_idx, 1 << op.log2_size),
                                  []).append(op)

    resid = {}
    for key in canonical_resid_keys(plan.chroma_format_idc):
        c, n = key
        items = resid_rows.get(key, [])
        N = len(items)
        xs = np.zeros(N, np.int32)
        ys = np.zeros(N, np.int32)
        qp = np.zeros(N, np.int32)
        kind = np.zeros(N, np.int32)
        mid = np.full(N, -1, np.int32)
        xtra = np.zeros(N, np.int32)
        levels = np.zeros((N, n, n), np.int32)
        for i, op in enumerate(items):
            xs[i] = op.x
            ys[i] = op.y
            qp[i] = op.qp
            mid[i] = op.matrix_id
            if op.transquant_bypass:
                kind[i] = KIND_BYPASS
            elif op.transform_skip:
                kind[i] = KIND_SKIP
            elif op.use_dst:
                kind[i] = KIND_DST
            else:
                kind[i] = KIND_DCT
            xtra[i] = (op.rdpcm_dir + 1) | ((4 if op.rot else 0))
            levels[i] = op.levels
        np.clip(levels, -32768, 32767, out=levels)   # int16 wire format
        resid[key] = dict(xs=xs, ys=ys, qp=qp, kind=kind, mid=mid,
                          xtra=xtra, levels=levels)

    # first pass: natural wave assignment to size the capacities
    natural = []
    counts = {}
    nat_waves = 1
    for op in intra_ops:
        g = W[op.c_idx]
        gh, gw = g.shape
        n = op.size
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
        n4 = max(1, n >> 2)
        g[op.y >> 2:(op.y >> 2) + n4, op.x >> 2:(op.x >> 2) + n4] = wave
        key = ("intra", op.c_idx, n)
        natural.append((op, key, wave))
        counts[key] = counts.get(key, 0) + 1
        nat_waves = max(nat_waves, wave + 1)

    caps = {k: _pow2(max(8, -(-v // nat_waves) * 2)) for k, v in counts.items()}
    if min_caps:
        for k, v in min_caps.items():
            caps[k] = max(caps.get(k, 8), v)

    # second pass: greedy slot packing with capacity limits
    for g in W:
        g[:] = 0
    slot_fill = {}
    rows = {k: [] for k in counts}
    T = 1
    for op, key, _ in natural:
        g = W[op.c_idx]
        gh, gw = g.shape
        n = op.size
        rmax = 0
        if op.y > 0:
            r0 = max(0, (op.x - 1) >> 2)
            r1 = min(gw, ((op.x + 2 * n - 1) >> 2) + 1)
            rmax = max(rmax, int(g[(op.y - 1) >> 2, r0:r1].max(initial=0)))
        if op.x > 0:
            c0 = max(0, (op.y - 1) >> 2)
            c1 = min(gh, ((op.y + 2 * n - 1) >> 2) + 1)
            rmax = max(rmax, int(g[c0:c1, (op.x - 1) >> 2].max(initial=0)))
        slot = rmax + 1
        while slot_fill.get((key, slot), 0) >= caps[key]:
            slot += 1
        slot_fill[(key, slot)] = slot_fill.get((key, slot), 0) + 1
        n4 = max(1, n >> 2)
        g[op.y >> 2:(op.y >> 2) + n4, op.x >> 2:(op.x >> 2) + n4] = slot
        rows[key].append((slot, op))
        T = max(T, slot + 1)

    # pad T to a power of two (empty trailing slots) for profile stability
    T = _pow2(T) if T > 1 else 1

    # flat slot-ordered layout: rows for slot t live at offs[t]..offs[t]+
    # counts[t]; the device scan dynamic-slices a fixed C=caps[key] rows per
    # slot (over-reads into the next slot are masked by the count).  This
    # ships ~fill-factor less data than dense (T, C, ...) tensors, which
    # dominates host->device time on a remote TPU.
    data = {}
    if not intra:
        return 1, {}, data, resid
    for key in canonical_keys(plan.chroma_format_idc):
        items = rows.get(key, [])
        caps.setdefault(key, 8)
        phase, c, n = key
        C = caps[key]
        items.sort(key=lambda so: so[0])
        N = len(items) + C                     # C tail rows keep slices in-bounds
        offs = np.zeros(T, np.int32)
        cnts = np.zeros(T, np.int32)
        pos = 0
        by_slot = {}
        for slot, op in items:
            by_slot.setdefault(slot, []).append(op)
        order = []
        for t in range(T):
            offs[t] = pos
            ops_t = by_slot.get(t, ())
            cnts[t] = len(ops_t)
            order.extend(ops_t)
            pos += len(ops_t)
        xs = np.zeros(N, np.int32)
        ys = np.zeros(N, np.int32)
        modes = np.zeros(N, np.int32)
        flags = np.zeros((N, 5), np.int32)
        for i, op in enumerate(order):
            xs[i] = op.x
            ys[i] = op.y
            modes[i] = op.mode
            flags[i] = (op.cand_bottom_left, op.cand_left,
                        op.cand_up_left, op.cand_up, op.cand_up_right)
        data[key] = dict(xs=xs, ys=ys, modes=modes, flags=flags,
                         offs=offs, counts=cnts)
    return T, caps, data, resid
