"""Sequential on-chip intra reconstruction: the whole frame in ONE kernel.

The lax.scan wavefront executor costs ~0.5 ms per dependency slot on real
TPU (hundreds of tiny XLA kernels per step); an intra-heavy 1080p frame has
several hundred slots, so the scan dominates I-frame latency.  This kernel
removes the per-step overhead entirely: the padded reconstruction plane and
the residual canvas live in VMEM for the whole kernel, block metadata
streams into SMEM chunk by chunk via the grid pipeline, and a fori_loop
walks the blocks IN DECODE ORDER — on a single TPU core the grid executes
sequentially, so plain z-order (the bitstream order, which by construction
has every reference sample decoded before use) replaces the host wavefront
schedule.

Semantics mirror intra.py::intra_batch (reference hevcpred_template.c)
bit-exactly: substitution cascade, [1 2 1]/strong smoothing, planar / DC /
angular prediction with luma edge corrections, fused residual add.  The
batched path emulates the reference's EXTEND edge replication with clipped
gathers; here the plane carries a 64-sample right/bottom apron that is
edge-replicated on entry and re-replicated whenever an intra block touches
the picture edge, so plain contiguous loads read the same values.

Mosaic constraints shape the memory access pattern: dynamic sublane
offsets must be provably 8-aligned and dynamic lane offsets 128-aligned.
Every access therefore loads an aligned 256-lane band and rotates it into
place with pltpu.roll (dynamic lane rotate); sublane misalignment is only
ever 0/4/8 (block origins are 4-aligned, row reads sit at y-1), handled by
static-slice selects.  Stores are read-modify-write on the aligned band.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.intra import INTRA_PRED_ANGLE, INV_ANGLE

CHUNK = 128        # blocks per grid step (SMEM metadata block: CHUNK*8*4 B)
NF = 8             # meta fields: x, y, log2n, mode, angle, inv, flags, valid
PAD = 64           # right/bottom apron (>= 2*n_max - n_min)
BAND = 256         # lane width of aligned working loads


def _pad_shape(H, W):
    Hp = -(-(H + PAD + 8) // 8) * 8
    Wp = -(-W // 128) * 128 + BAND
    return Hp, Wp


def build_meta(ops, c_idx, chroma_444, smoothing_off=False):
    """Pack one plane's IntraOps (in decode order) into (n_chunks, CHUNK, NF)
    int32 metadata, n_chunks padded to a power of two for profile stability.
    Returns None when the plane has no intra blocks."""
    rows = []
    for op in ops:
        if op.c_idx != c_idx:
            continue
        n = op.size
        mode = op.mode
        angle = INTRA_PRED_ANGLE[mode - 2] if mode >= 2 else 0
        inv = INV_ANGLE[mode - 11] if 11 <= mode <= 25 else 0
        flags = ((1 if op.cand_bottom_left else 0)
                 | (2 if op.cand_left else 0)
                 | (4 if op.cand_up_left else 0)
                 | (8 if op.cand_up else 0)
                 | (16 if op.cand_up_right else 0))
        if (c_idx == 0 or chroma_444) and not smoothing_off:
            thresh = {8: 7, 16: 1, 32: 0}.get(n, -1)
            if (mode != 1 and n != 4
                    and min(abs(mode - 26), abs(mode - 10)) > thresh):
                flags |= 32
        log2n = n.bit_length() - 1
        rows.append((op.x, op.y, log2n, mode, angle, inv, flags, 1))
    if not rows:
        return None
    n_chunks = 1
    while n_chunks * CHUNK < len(rows):
        n_chunks *= 2
    meta = np.zeros((n_chunks * CHUNK, NF), np.int32)
    meta[:len(rows)] = rows
    return meta.reshape(n_chunks, CHUNK, NF)


def _b2(v, shape):
    """(1,1) -> shape via two single-axis expansions.  Mosaic can't lower a
    dual-axis vector.broadcast (and algebraic identities like mul-by-ones
    get folded away), so use the TPU-native repeat primitive per axis."""
    row = pltpu.repeat(v, shape[1], 1)
    return pltpu.repeat(row, shape[0], 0)


def _align8(v):
    return pl.multiple_of((v >> 3) << 3, 8)


def _lane_base(x):
    return pl.multiple_of((x >> 7) << 7, 128)


def _roll_left(v, off):
    """Rotate lanes left by dynamic `off`: out[:, i] = v[:, (i+off) % BAND]."""
    return pltpu.roll(v, (BAND - off) & (BAND - 1), axis=1)


def _lane(v, k):
    """Extract lane k of a (1, L) row as an offset-0 (1, 1) scalar.

    A plain v[:, k:k+1] slice carries a lane-offset layout that several
    Mosaic ops (repeat, some selects) mishandle; a masked reduction always
    produces a canonical layout.  k may be dynamic."""
    li = lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.sum(jnp.where(li == k, v, 0), axis=1, keepdims=True)


def _row_read(plane, yt, x, L):
    """plane[yt, x:x+L] as (1, L) int32."""
    y8 = _align8(yt)
    xb = _lane_base(x)
    blk = plane[pl.ds(y8, 8), pl.ds(xb, BAND)].astype(jnp.int32)
    ri = lax.broadcasted_iota(jnp.int32, (8, BAND), 0)
    row = jnp.sum(jnp.where(ri == (yt - y8), blk, 0), axis=0, keepdims=True)
    return _roll_left(row, x - xb)[:, :L]


def _left_row(plane, y, x, n):
    """(corner, lrow): corner = plane[max(y-1,0), xl] as (1,1); lrow (1,128)
    with lane j = plane[y+j, xl] for j < 2n; xl = max(x-1, 0)."""
    xl = jnp.maximum(x - 1, 0)
    yt = jnp.maximum(y - 1, 0)
    base = _align8(yt)
    d = y - base                       # 0, 4 or 8
    R = 2 * n + 16
    xb = _lane_base(xl)
    blk = plane[pl.ds(base, R), pl.ds(xb, BAND)].astype(jnp.int32)
    col = _roll_left(blk, xl - xb)[:, :1]              # (R, 1)
    colrow = jnp.pad(jnp.transpose(col), ((0, 0), (0, 128 - R)))
    lrow = pltpu.roll(colrow, (128 - d) & 127, axis=1)  # lane j = row y+j
    corner = _lane(colrow, jnp.maximum(d - 1, 0))
    return corner, lrow


def _resid_read(resid, y, x, n):
    xb = _lane_base(x)
    if n >= 8:
        blk = resid[pl.ds(pl.multiple_of(y, 8), n), pl.ds(xb, BAND)] \
            .astype(jnp.int32)
        return _roll_left(blk, x - xb)[:, :n]
    y8 = _align8(y)
    blk = resid[pl.ds(y8, 8), pl.ds(xb, BAND)].astype(jnp.int32)
    blk = _roll_left(blk, x - xb)[:, :4]
    return jnp.where(y - y8 == 0, blk[:4, :], blk[4:, :])


def _store_block(plane, y, x, val, n):
    """plane[y:y+n, x:x+n] = val ((n, n) int32) via RMW on the band."""
    xb = _lane_base(x)
    off = x - xb
    li = lax.broadcasted_iota(jnp.int32, (n if n >= 8 else 8, BAND), 1)
    valb = jnp.pad(val, ((0, 0), (0, BAND - n)))
    valr = pltpu.roll(valb, off, axis=1)
    lmask = (li >= off) & (li < off + n)
    if n >= 8:
        ya = pl.multiple_of(y, 8)
        sub = plane[pl.ds(ya, n), pl.ds(xb, BAND)]
        plane[pl.ds(ya, n), pl.ds(xb, BAND)] = \
            jnp.where(lmask, valr, sub.astype(jnp.int32)).astype(plane.dtype)
    else:
        y8 = _align8(y)
        d = y - y8
        sub = plane[pl.ds(y8, 8), pl.ds(xb, BAND)]
        z = jnp.zeros_like(valr)
        v8 = jnp.where(d == 0, jnp.concatenate([valr, z], axis=0),
                       jnp.concatenate([z, valr], axis=0))
        ri = lax.broadcasted_iota(jnp.int32, (8, BAND), 0)
        mask = lmask & (ri >= d) & (ri < d + 4)
        plane[pl.ds(y8, 8), pl.ds(xb, BAND)] = \
            jnp.where(mask, v8, sub.astype(jnp.int32)).astype(plane.dtype)


def _predict_block(plane, x, y, mode, angle, inv, flags, n, c_idx,
                   bd, strong, c444):
    """Predict one n x n block from `plane` state (mirrors intra_batch).

    The reference arrays live as (1, 128) int32 rows with lane j == ref[j]
    (j <= 2n); composition uses masks + static lane rotates only — Mosaic
    rejects lane-concats of mismatched layouts and non-int32 dynamic rolls.
    """
    mid = jnp.int32(1 << (bd - 1))
    maxv = (1 << bd) - 1
    cbl = (flags & 1) != 0
    cl = (flags & 2) != 0
    cul = (flags & 4) != 0
    cu = (flags & 8) != 0
    cur = (flags & 16) != 0

    yt = jnp.maximum(y - 1, 0)
    # the apron replicates the picture edge, so contiguous loads match the
    # batched path's clipped gathers
    raw = _row_read(plane, yt, x, 128)                 # lane i = P[yt, x+i]
    corner_raw, lrow = _left_row(plane, y, x, n)       # lane j = P[y+j, xl]
    li = lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    # ---- substitution cascade (hevcpred_template.c:251-287), on rows ----
    raw_sh = pltpu.roll(raw, 1, axis=1)                # lane j = raw[j-1]
    lrow_sh = pltpu.roll(lrow, 1, axis=1)
    raw0 = _lane(raw, 0)
    raw_nm1 = _lane(raw, n - 1)
    rawn = _lane(raw, n)
    ll0 = _lane(lrow, 0)
    ll_nm1 = _lane(lrow, n - 1)
    ll_n = _lane(lrow, n)

    fill_bl = jnp.where(cl, ll_nm1,
               jnp.where(cul, corner_raw,
                jnp.where(cu, raw0,
                 jnp.where(cur, rawn, mid))))
    fill_l = jnp.where(cul, corner_raw,
              jnp.where(cu, raw0,
               jnp.where(cur, rawn, mid)))
    lh0 = jnp.where(cbl, ll_n, fill_bl)                # resolved left[n]
    ll0_res = jnp.where(cl, ll0, jnp.where(cbl, lh0, fill_l))
    corner = jnp.where(cul, corner_raw,
              jnp.where(cl | cbl, ll0_res,
               jnp.where(cu, raw0,
                jnp.where(cur, rawn, mid))))
    topn_res = jnp.where(cu, raw_nm1, corner)          # resolved top[n-1+1]

    top_lo_v = jnp.where(cu, raw_sh, corner)           # lanes 1..n
    top_hi_v = jnp.where(cur, raw_sh, topn_res)        # lanes n+1..2n
    left_lo_v = jnp.where(cl, lrow_sh,
                 jnp.where(cbl, lh0, fill_l))
    left_hi_v = jnp.where(cbl, lrow_sh, fill_bl)

    top = jnp.where(li == 0, corner,
           jnp.where(li <= n, top_lo_v,
            jnp.where(li <= 2 * n, top_hi_v, 0)))      # lane j = top[j]
    left = jnp.where(li == 0, corner,
            jnp.where(li <= n, left_lo_v,
             jnp.where(li <= 2 * n, left_hi_v, 0)))

    # ---- reference smoothing (spec 8.4.4.2.3) ----
    if (c_idx == 0 or c444) and n != 4:
        do_filter = (flags & 32) != 0
        fcorner = (_lane(left, 1) + 2 * corner + _lane(top, 1) + 2) >> 2

        def f121(row):
            rm1 = pltpu.roll(row, 1, axis=1)
            rp1 = pltpu.roll(row, 127, axis=1)
            f = (rp1 + 2 * row + rm1 + 2) >> 2
            return jnp.where(li == 0, fcorner,
                             jnp.where(li <= 2 * n - 1, f, row))

        ftop = f121(top)
        fleft = f121(left)
        if strong and n == 32 and c_idx == 0:
            th = 1 << (bd - 5)
            bi = ((jnp.abs(_lane(top, 0) + _lane(top, 64)
                           - 2 * _lane(top, 32)) < th) &
                  (jnp.abs(_lane(left, 0) + _lane(left, 64)
                           - 2 * _lane(left, 32)) < th))

            def lerp(row):
                s = ((64 - li) * _lane(row, 0) + li * _lane(row, 64)
                     + 32) >> 6
                return jnp.where((li >= 1) & (li <= 63), s, row)

            ftop = jnp.where(bi, lerp(top), ftop)
            fleft = jnp.where(bi, lerp(left), fleft)
        top = jnp.where(do_filter, ftop, top)
        left = jnp.where(do_filter, fleft, left)

    log2 = n.bit_length() - 1
    xrow = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ycol = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    t_sh = pltpu.roll(top, 127, axis=1)[:, :n]         # lane x = top[x+1]
    l_sh = pltpu.roll(left, 127, axis=1)               # lane y = left[y+1]
    l_col = jnp.transpose(l_sh[:, :n])                 # (n, 1)

    def pred_planar():
        tr = pltpu.repeat(_lane(top, n + 1), n, 1)
        bl = pltpu.repeat(_lane(left, n + 1), n, 1)
        acc = ((n - 1 - xrow) * l_col + (xrow + 1) * tr +
               (n - 1 - ycol) * t_sh + (ycol + 1) * bl + n)
        return acc >> (log2 + 1)

    def pred_dc():
        seg = (li >= 1) & (li <= n)
        dc = (jnp.sum(jnp.where(seg, top, 0), axis=1, keepdims=True) +
              jnp.sum(jnp.where(seg, left, 0), axis=1, keepdims=True)
              + n) >> (log2 + 1)                       # (1, 1)
        out = _b2(dc, (n, n))
        if c_idx == 0 and n < 32:
            rowv = (t_sh + 3 * dc + 2) >> 2            # (1, n)
            colv = (l_col + 3 * _b2(dc, (n, 1)) + 2) >> 2
            c00 = pltpu.repeat(
                (_lane(left, 1) + 2 * dc + _lane(top, 1) + 2) >> 2, n, 1)
            out = jnp.where((ycol == 0) & (xrow > 0), rowv, out)
            out = jnp.where((xrow == 0) & (ycol > 0), colv, out)
            out = jnp.where((xrow == 0) & (ycol == 0), c00, out)
        return out

    def pred_angular():
        is_ver = mode >= 18
        main = jnp.where(is_ver, top, left)
        side = jnp.where(is_ver, left, top)
        # negative extension via the inverse-angle projection of `side`
        # (only read when angle < 0; one-hot masked reduction = lane gather)
        kk = lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        xneg = lax.broadcasted_iota(jnp.int32, (n, 1), 0) - n    # -n..-1
        sidx = jnp.clip((xneg * inv + 128) >> 8, 0, 2 * n)
        neg = jnp.sum(jnp.where(kk == sidx, side, 0), axis=1, keepdims=True)
        negr = jnp.pad(jnp.transpose(neg), ((0, 0), (0, 128 - n)))
        # refv: lane j == ref[j - n] (3n+1 <= 97 lanes used)
        refv = jnp.where(li < n, negr, pltpu.roll(main, n, axis=1))
        rows = []
        for yy in range(n):
            g = (((yy + 1) * angle) >> 5) + n + 1
            seg = pltpu.roll(refv, (128 - g) & 127, axis=1)
            fact = ((yy + 1) * angle) & 31
            rows.append(jnp.where(fact != 0,
                                  ((32 - fact) * seg[:, :n] +
                                   fact * seg[:, 1:n + 1] + 16) >> 5,
                                  seg[:, :n]))
        pv = jnp.concatenate(rows, axis=0)              # (n, n)
        if c_idx == 0 and n < 32:
            side_sh = pltpu.roll(side, 127, axis=1)[:, :n]   # lane y=side[y+1]
            corr = jnp.clip(jnp.transpose(_lane(main, 1)) +
                            ((jnp.transpose(side_sh) -
                              _lane(side, 0)) >> 1), 0, maxv)    # (n, 1)
            fix = (mode == 26) | (mode == 10)
            pv = jnp.where(fix & (xrow == 0), corr, pv)
        return jnp.where(is_ver, pv, jnp.transpose(pv))

    return lax.switch(jnp.clip(mode, 0, 2), [pred_planar, pred_dc,
                                             pred_angular])


def _kernel(meta, plane_in, resid, plane, sem, *, sizes, c_idx, bd, strong,
            c444, H, W, bottom_on=True):
    # The output VMEM window starts UNINITIALIZED on hardware (aliasing only
    # reuses the HBM buffer), so the first grid step DMAs the padded input
    # plane into it; later steps keep the window resident (constant index
    # map) and all reads/writes go through `plane` so stores persist.
    @pl.when(pl.program_id(0) == 0)
    def _():
        cp = pltpu.make_async_copy(plane_in, plane, sem)
        cp.start()
        cp.wait()
    maxv = (1 << bd) - 1
    H8 = (H // 8) * 8          # static
    dh = H - H8                # static 0 or 4
    Wb = (W // 128) * 128      # static 128-aligned base of the right apron

    def body(j, _):
        x = meta[0, j, 0]
        y = meta[0, j, 1]
        log2n = meta[0, j, 2]
        mode = meta[0, j, 3]
        angle = meta[0, j, 4]
        inv = meta[0, j, 5]
        flags = meta[0, j, 6]
        valid = meta[0, j, 7]

        @pl.when(valid != 0)
        def _():
            def do_size(n):
                def run():
                    pred = _predict_block(plane, x, y, mode, angle,
                                          inv, flags, n, c_idx, bd, strong,
                                          c444)
                    res = _resid_read(resid, y, x, n)
                    val = jnp.clip(pred + res, 0, maxv)
                    _store_block(plane, y, x, val, n)

                    # keep the apron edge-replicated as recon overwrites
                    # picture-edge pixels
                    @pl.when(x + n == W)
                    def _():
                        # static lanes W..W+PAD live inside [Wb, Wb+BAND);
                        # roll the edge column to offset 0 first (Mosaic
                        # rejects pads/broadcasts of offset slices)
                        vlast = pltpu.roll(val, 1, axis=1)[:, 0:1]
                        repl = pltpu.repeat(vlast, BAND, 1)
                        li = lax.broadcasted_iota(
                            jnp.int32, (n if n >= 8 else 8, BAND), 1)
                        amask = (li >= W - Wb) & (li < W - Wb + PAD)
                        if n >= 8:
                            ya = pl.multiple_of(y, 8)
                            sub = plane[pl.ds(ya, n), Wb:Wb + BAND]
                            plane[pl.ds(ya, n), Wb:Wb + BAND] = jnp.where(
                                amask, repl.astype(jnp.int32),
                                sub.astype(jnp.int32)).astype(plane.dtype)
                        else:
                            y8 = _align8(y)
                            d = y - y8
                            sub = plane[pl.ds(y8, 8), Wb:Wb + BAND]
                            ri = lax.broadcasted_iota(
                                jnp.int32, (8, BAND), 0)
                            m = amask & (ri >= d) & (ri < d + 4)
                            # rows of a 4x4 right-edge block: select row by
                            # (ri - d) via 4-way static select
                            lc = pltpu.roll(val, 1, axis=1)[:, 0:1]
                            v0 = _b2(lc[0:1, :], (8, BAND))
                            v1 = _b2(pltpu.roll(lc, 3, axis=0)[0:1, :],
                                     (8, BAND))
                            v2 = _b2(pltpu.roll(lc, 2, axis=0)[0:1, :],
                                     (8, BAND))
                            v3 = _b2(pltpu.roll(lc, 1, axis=0)[0:1, :],
                                     (8, BAND))
                            rr = ri - d
                            vsel = jnp.where(rr == 0, v0,
                                    jnp.where(rr == 1, v1,
                                     jnp.where(rr == 2, v2, v3)))
                            plane[pl.ds(y8, 8), Wb:Wb + BAND] = jnp.where(
                                m, vsel, sub.astype(jnp.int32)) \
                                .astype(plane.dtype)

                    if not bottom_on:
                        return

                    @pl.when(y + n == H)
                    def _():
                        xb = _lane_base(x)
                        off = x - xb
                        valb = jnp.pad(val, ((0, 0), (0, BAND - n)))
                        brow = pltpu.roll(valb, 1, axis=0)[0:1, :]
                        browr = pltpu.roll(brow, off, axis=1)
                        R = PAD + 8
                        li = lax.broadcasted_iota(jnp.int32, (R, BAND), 1)
                        ri = lax.broadcasted_iota(jnp.int32, (R, BAND), 0)
                        m = (li >= off) & (li < off + n) & (ri >= dh)
                        sub = plane[H8:H8 + R, pl.ds(xb, BAND)]
                        plane[H8:H8 + R, pl.ds(xb, BAND)] = jnp.where(
                            m, jnp.broadcast_to(browr, (R, BAND)),
                            sub.astype(jnp.int32)).astype(plane.dtype)
                return run

            branches = [do_size(n) for n in sizes]
            lax.switch(jnp.clip(log2n - 2, 0, len(branches) - 1), branches)
        return 0

    lax.fori_loop(0, CHUNK, body, 0)


def intra_seq(plane, resid, meta, H, W, c_idx, bd, strong, c444,
              interpret=False):
    """Reconstruct all intra blocks of one plane in decode order (single
    VMEM-resident band; see intra_seq_banded for planes over budget)."""
    if not fits_vmem(H, W):
        raise ValueError("plane exceeds the whole-plane VMEM budget; "
                         "use intra_seq_banded")
    return _intra_seq_raw(plane, resid, meta, H, H, W, c_idx, bd, strong,
                          c444, interpret)


def fits_vmem(H, W):
    """Whole-plane-resident budget: padded plane + residual in int16."""
    Hp, Wp = _pad_shape(H, W)
    return (Hp + H + 16) * Wp * 2 <= 11 * 2 ** 20


def band_plan(H, W, ctb, budget=11 * 2 ** 20):
    """Split picture rows into CTB-row-aligned bands whose working set
    (band plane + residual, int16) fits the VMEM budget.  Returns a list of
    (start, end) row ranges; a single (0, H) band means no banding."""
    Hp, Wp = _pad_shape(H, W)
    if (Hp + H + 16) * Wp * 2 <= budget:
        return [(0, H)]
    per_row_bytes = 2 * Wp * 2
    overhead = (PAD + 16 + 24) * Wp * 2 * 2
    rows = max(ctb, ((budget - overhead) // per_row_bytes) // ctb * ctb)
    bands = []
    s = 0
    while s < H:
        e = min(H, s + rows)
        if H - e < ctb and e < H:      # avoid a tiny tail band
            e = H
        bands.append((s, e))
        s = e
    return bands


def split_meta_bands(ops, c_idx, chroma_444, bands, smoothing_off=False):
    """build_meta per band: block (x, y) with y in [s, e) goes to that
    band, y rebased to the band buffer (origin s - 8 rows of context,
    except band 0 which starts at row 0)."""
    out = []
    for (s, e) in bands:
        base = 0 if s == 0 else s - 8
        sel = [op for op in ops
               if op.c_idx == c_idx and s <= op.y < e]

        class _R:      # rebased view
            pass

        rops = []
        for op in sel:
            r = _R()
            r.c_idx = op.c_idx
            r.x = op.x
            r.y = op.y - base
            r.size = op.size
            r.mode = op.mode
            r.cand_bottom_left = op.cand_bottom_left
            r.cand_left = op.cand_left
            r.cand_up_left = op.cand_up_left
            r.cand_up = op.cand_up
            r.cand_up_right = op.cand_up_right
            rops.append(r)
        out.append(build_meta(rops, c_idx, chroma_444, smoothing_off))
    return out


def intra_seq_banded(plane, resid, metas, bands, H, W, c_idx, bd, strong,
                     c444, interpret=False):
    """Banded variant for planes over the VMEM budget (4K).

    Bands are CTB-row aligned, so bottom-left references never cross a
    band boundary with cand_bottom_left set (the below-left CTB row is
    later in decode order); reads below the band edge hit masked junk.
    Each band buffer carries 8 context rows above (the previous band's
    final pixels) and PAD apron rows below.
    """
    out = plane
    for (s, e), meta in zip(bands, metas):
        if meta is None:
            continue
        base = 0 if s == 0 else s - 8
        hb = e - base
        band = lax.dynamic_slice_in_dim(out, base, hb, 0)
        rband = lax.dynamic_slice_in_dim(resid, base, hb, 0)
        # middle bands never trigger the bottom apron (no block reaches
        # the buffer's H'), the last band replicates the picture edge
        hprime = hb if e == H else hb + PAD
        got = _intra_seq_raw(band, rband, meta, hprime, hb, W, c_idx, bd,
                             strong, c444, interpret)
        out = lax.dynamic_update_slice_in_dim(out, got, base, 0)
    return out


def _intra_seq_raw(plane, resid, meta, H_edge, hb, W, c_idx, bd, strong,
                   c444, interpret):
    """One band kernel launch: `plane` is the (hb, W) band buffer,
    H_edge the row count that triggers bottom-apron replication."""
    sizes = (4, 8, 16, 32) if (c_idx == 0 or c444) else (4, 8, 16)
    Hp, Wp = _pad_shape(hb, W)
    pp = jnp.pad(plane, ((0, Hp - hb), (0, Wp - W)), mode="edge") \
        .astype(jnp.int16)
    rp = jnp.pad(jnp.clip(resid, -32768, 32767).astype(jnp.int16),
                 ((0, 16), (0, Wp - W)))
    n_chunks = meta.shape[0]
    kern = partial(_kernel, sizes=sizes, c_idx=c_idx, bd=bd,
                   strong=bool(strong), c444=c444, H=H_edge, W=W,
                   bottom_on=(H_edge == hb))
    got = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, CHUNK, NF), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),      # plane_in (HBM)
            pl.BlockSpec((hb + 16, Wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Hp, Wp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int16),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(meta, pp, rp)
    return got[:hb, :W].astype(jnp.int32)
