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
    """Stable slot-key set so the fused program compiles once per profile."""
    keys = []
    for phase in ("intra", "resid"):
        for c in (0, 1, 2):
            sizes = (4, 8, 16, 32) if (c == 0 or chroma_format_idc == 3) \
                else (4, 8, 16)
            for n in sizes:
                keys.append((phase, c, n))
    return tuple(sorted(keys))


def schedule_slots(plan, min_caps=None):
    """Pack intra/residual ops into balanced dependency slots.

    Returns (T, caps, data) where data[(phase, c, n)] is a dict of numpy
    arrays with leading dims (T, C) over the canonical key set (empty keys
    get capacity-8 all-invalid batches).  T is padded to a power of two.
    min_caps: sticky per-key capacity floor (stabilizes the jit profile
    across frames).  Inter ops are not included (wave 0 elsewhere).
    """
    hs = 1 if plan.chroma_format_idc in (1, 2) else 0
    vs = 1 if plan.chroma_format_idc == 1 else 0
    shapes = [(plan.height, plan.width),
              (plan.height >> vs, plan.width >> hs),
              (plan.height >> vs, plan.width >> hs)]
    W = [np.zeros(((h + 3) // 4, (w + 3) // 4), np.int32) for h, w in shapes]

    # first pass: natural wave assignment to size the capacities
    # (PcmOps are wave -1: their pixels land in the base canvas up front)
    from ..decoder.plan import PcmOp
    ops = [op for op in plan.ops if not isinstance(op, (InterOp, PcmOp))]
    natural = []
    counts = {}
    nat_waves = 1
    for op in ops:
        if isinstance(op, IntraOp):
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
        else:
            g = W[op.c_idx]
            n = 1 << op.log2_size
            n4 = max(1, n >> 2)
            wave = int(g[op.y >> 2:(op.y >> 2) + n4,
                         op.x >> 2:(op.x >> 2) + n4].max())
            key = ("resid", op.c_idx, n)
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
        if key[0] == "intra":
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
        else:
            g = W[op.c_idx]
            n = 1 << op.log2_size
            n4 = max(1, n >> 2)
            slot = int(g[op.y >> 2:(op.y >> 2) + n4,
                         op.x >> 2:(op.x >> 2) + n4].max())
            while slot_fill.get((key, slot), 0) >= caps[key]:
                slot += 1
                # residual must not outrun later readers; bumping is safe only
                # if nothing reads this block before `slot` — guaranteed: any
                # reader already waits for W >= its own slot; update W below
            slot_fill[(key, slot)] = slot_fill.get((key, slot), 0) + 1
            g[op.y >> 2:(op.y >> 2) + n4, op.x >> 2:(op.x >> 2) + n4] = \
                np.maximum(g[op.y >> 2:(op.y >> 2) + n4,
                             op.x >> 2:(op.x >> 2) + n4], slot)
            rows[key].append((slot, op))
        T = max(T, slot + 1)

    # pad T to a power of two (empty trailing slots) for profile stability
    T = _pow2(T) if T > 1 else 1

    # stack into (T, C, ...) tensors over the canonical key set
    data = {}
    for key in canonical_keys(plan.chroma_format_idc):
        items = rows.get(key, [])
        caps.setdefault(key, 8)
        phase, c, n = key
        C = caps[key]
        xs = np.zeros((T, C), np.int32)
        ys = np.zeros((T, C), np.int32)
        valid = np.zeros((T, C), bool)
        fill = {}
        if phase == "intra":
            modes = np.zeros((T, C), np.int32)
            flags = np.zeros((T, C, 5), np.int32)
            for slot, op in items:
                i = fill.get(slot, 0)
                fill[slot] = i + 1
                xs[slot, i] = op.x
                ys[slot, i] = op.y
                modes[slot, i] = op.mode
                flags[slot, i] = (op.cand_bottom_left, op.cand_left,
                                  op.cand_up_left, op.cand_up, op.cand_up_right)
                valid[slot, i] = True
            data[key] = dict(xs=xs, ys=ys, modes=modes, flags=flags, valid=valid)
        else:
            qp = np.zeros((T, C), np.int32)
            kind = np.zeros((T, C), np.int32)
            mid = np.full((T, C), -1, np.int32)
            levels = np.zeros((T, C, n, n), np.int32)
            for slot, op in items:
                i = fill.get(slot, 0)
                fill[slot] = i + 1
                xs[slot, i] = op.x
                ys[slot, i] = op.y
                qp[slot, i] = op.qp
                mid[slot, i] = op.matrix_id
                if op.transquant_bypass:
                    kind[slot, i] = KIND_BYPASS
                elif op.transform_skip:
                    kind[slot, i] = KIND_SKIP
                elif op.use_dst:
                    kind[slot, i] = KIND_DST
                else:
                    kind[slot, i] = KIND_DCT
                levels[slot, i] = op.levels
                valid[slot, i] = True
            data[key] = dict(xs=xs, ys=ys, qp=qp, kind=kind, mid=mid,
                             levels=levels, valid=valid)
    return T, caps, data


def _scatter_set(plane, xs, ys, vals, valid):
    n = vals.shape[1]
    h, w = plane.shape
    gy = ys[:, None, None] + jnp.arange(n)[None, :, None]
    gx = xs[:, None, None] + jnp.arange(n)[None, None, :]
    flat_idx = (gy * w + gx).reshape(-1)
    flat = plane.reshape(-1)
    cur = flat[flat_idx]
    vmask = jnp.repeat(valid, n * n)
    delta = jnp.where(vmask, vals.reshape(-1) - cur, 0)
    return flat.at[flat_idx].add(delta).reshape(h, w)


@partial(jax.jit, static_argnames=("keys", "bit_depth", "strong"))
def run_slots(planes, data, keys, bit_depth=8, strong=False):
    """Execute all slots in one scan. keys: sorted tuple of (phase, c, n)."""

    def body(planes, xs):
        planes = list(planes)
        for key in keys:
            phase, c, n = key
            d = xs[key]
            if phase == "intra":
                preds = intra_batch(planes[c], d["xs"], d["ys"], d["modes"],
                                    d["flags"], n, min(c, 1), bit_depth, strong)
                planes[c] = _scatter_set(planes[c], d["xs"], d["ys"], preds,
                                         d["valid"])
        for key in keys:
            phase, c, n = key
            d = xs[key]
            if phase == "resid":
                res = residual_batch(d["levels"], d["qp"], d["kind"], n,
                                     bit_depth)
                planes[c] = scatter_add_residual(planes[c], d["xs"], d["ys"],
                                                 res, d["valid"], bit_depth)
        return tuple(planes), None

    planes, _ = jax.lax.scan(body, tuple(planes), data)
    return planes
