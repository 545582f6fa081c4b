"""Pallas MC kernel: per-tile DMA of reference windows + separable FIR.

Replaces the XLA per-element gather in mc.mc_batch (which lowers to a slow
generic gather on TPU): each grid step DMAs its reference window from the
HBM reference stack into VMEM, applies the fractional-phase 8/4-tap filters
on the VPU, and writes the 14-bit intermediate block.

Mosaic requires DMA slice shapes aligned to the (8, 128) tiling, so the
window start is aligned down on both axes on the host (clamp_starts) and the
kernel rotates the loaded window by the sub-tile offsets with pltpu.roll
before the static-slice FIR taps.

Edge handling: the caller passes a replicate-padded reference stack
(pad_refs); window starts are pre-clamped so every DMA is in-bounds and
bit-exact with per-pixel clamping.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.mc import QPEL_FILTERS, EPEL_FILTERS

_QPEL = np.vstack([[0, 0, 0, 64, 0, 0, 0, 0], QPEL_FILTERS]).astype(np.int32)
_EPEL = np.vstack([[0, 64, 0, 0], EPEL_FILTERS]).astype(np.int32)

# extra replicate padding past the border so aligned windows stay in-bounds
TAIL_R = 48
TAIL_C = 288


def _round_up(v, m):
    return (v + m - 1) // m * m


_MC_LOOKAHEAD = 8


def _mc_kernel(sel_ref, sy_ref, sx_ref, ro_ref, co_ref, fx_ref, fy_ref,
               refs_ref, filt_ref, out_ref, win_ref, sem,
               *, w, h, taps, bit_depth, WH, WW, n):
    i = pl.program_id(0)
    K = _MC_LOOKAHEAD
    slot = jax.lax.rem(i, K)

    # starts arrive pre-divided so Mosaic can prove tile alignment
    def copy_for(j, s):
        return pltpu.make_async_copy(
            refs_ref.at[sel_ref[j], pl.ds(sy_ref[j] * 8, WH),
                        pl.ds(sx_ref[j] * 128, WW)],
            win_ref.at[s], sem.at[s])

    # K-deep DMA pipeline: per-step compute is far below the per-DMA
    # latency, so a 2-deep double buffer left the grid latency-bound
    # (each step stalled on the copy issued one step earlier); K windows
    # in flight amortize the latency down to the issue/bandwidth floor
    @pl.when(i == 0)
    def _():
        for j in range(min(K - 1, n)):
            copy_for(j, j).start()

    @pl.when(i + K - 1 < n)
    def _():
        copy_for(i + K - 1, jax.lax.rem(i + K - 1, K)).start()

    copy_for(i, slot).wait()
    win = win_ref[slot]
    # rotate the sub-tile offsets out (shift = size - off == -off mod size)
    win = pltpu.roll(win, WW - co_ref[i], 1)
    win = pltpu.roll(win, WH - ro_ref[i], 0)
    hf = filt_ref[fx_ref[i]]
    vf = filt_ref[fy_ref[i]]
    tmp = jnp.zeros((WH, w), jnp.int32)
    for t in range(taps):
        tmp = tmp + hf[t] * win[:, t:t + w]
    tmp = tmp >> (bit_depth - 8)
    acc = jnp.zeros((h, w), jnp.int32)
    for t in range(taps):
        acc = acc + vf[t] * tmp[t:t + h, :]
    out_ref[0, ...] = acc >> 6


@partial(jax.jit,
         static_argnames=("w", "h", "is_luma", "bit_depth", "interpret"))
def mc_batch_pallas(refs_padded, sel, sy, sx, ro, co, fx, fy, w, h, is_luma,
                    bit_depth=8, interpret=False):
    """refs_padded (R, Hp, Wp) int32 replicate-padded reference stack.

    sel/sy/sx: per-block ref slot + tile-aligned window start divided by
    the (8, 128) tile (padded coords); ro/co: sub-tile offsets; fx/fy:
    fractional phases.
    Returns (N, h, w) int32 14-bit intermediates.
    """
    n = sel.shape[0]
    if n > _MC_CAPN:
        # scalar-prefetch SMEM cap: 7 arrays x 4B = 28B per block; 4K PU
        # buckets exceed the ~1MB SMEM in one call
        return jnp.concatenate(
            [mc_batch_pallas(refs_padded, sel[i:i + _MC_CAPN],
                             sy[i:i + _MC_CAPN], sx[i:i + _MC_CAPN],
                             ro[i:i + _MC_CAPN], co[i:i + _MC_CAPN],
                             fx[i:i + _MC_CAPN], fy[i:i + _MC_CAPN],
                             w, h, is_luma, bit_depth, interpret)
             for i in range(0, n, _MC_CAPN)])
    taps = 8 if is_luma else 4
    table = jnp.asarray(_QPEL if is_luma else _EPEL)
    wh, ww = h + taps - 1, w + taps - 1
    WH = _round_up(wh + 8, 8)
    WW = _round_up(ww + 128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),        # refs (HBM)
                  pl.BlockSpec(memory_space=pltpu.VMEM)],      # filter table
        out_specs=pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_MC_LOOKAHEAD, WH, WW), jnp.int32),
                        pltpu.SemaphoreType.DMA((_MC_LOOKAHEAD,))],
    )
    kernel = partial(_mc_kernel, w=w, h=h, taps=taps, bit_depth=bit_depth,
                     WH=WH, WW=WW, n=n)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        interpret=interpret,
    )(sel, sy, sx, ro, co, fx, fy, refs_padded, table)
    return out


def pad_refs(refs, border):
    """Replicate-pad a stacked (R, H, W) reference tensor (+aligned tail)."""
    return jnp.pad(refs, ((0, 0), (border, border + TAIL_R),
                          (border, border + TAIL_C)), mode="edge")


def clamp_starts(xs, ys, mvx, mvy, w, h, W, H, is_luma, border,
                 hs=1, vs=1):
    """Per-block clamped, tile-aligned window starts in padded coords.

    hs/vs: chroma subsampling shifts (see tpu/mc.py mc_batch).
    -> (sy_aligned, sx_aligned, row_off, col_off, frac_x, frac_y)
    """
    before = 3 if is_luma else 1
    taps = 8 if is_luma else 4
    if is_luma:
        fx = mvx & 3
        fy = mvy & 3
        bx = xs + (mvx >> 2) - before
        by = ys + (mvy >> 2) - before
    else:
        fx = (mvx & ((1 << (2 + hs)) - 1)) << (1 - hs)
        fy = (mvy & ((1 << (2 + vs)) - 1)) << (1 - vs)
        bx = xs + (mvx >> (2 + hs)) - before
        by = ys + (mvy >> (2 + vs)) - before
    sx = jnp.clip(bx, -border, W + border - (w + taps - 1)) + border
    sy = jnp.clip(by, -border, H + border - (h + taps - 1)) + border
    ro = sy & 7
    co = sx & 127
    return ((sy >> 3).astype(jnp.int32), (sx >> 7).astype(jnp.int32),
            ro.astype(jnp.int32), co.astype(jnp.int32),
            fx.astype(jnp.int32), fy.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Banded tile paint: write disjoint (h, w) tiles into a plane.
#
# The plane is partitioned into a static grid of (BH, SBAND) bands; each
# tile contributes one entry per band it intersects (<= 4: tiles are at
# most 64x64, bands 64x256).  Entries are sorted by band id so each band's
# VMEM window is visited as one contiguous run of grid steps: the FIRST
# entry of a run copies the input band into the output window explicitly
# (the output window is NOT initialized on hardware — `input_output_aliases`
# only reuses the HBM buffer, it never pre-fills VMEM; relying on it was
# the round-2 1080p P-frame corruption), subsequent entries RMW-merge their
# tile.  A zero-work dummy entry per band guarantees every output block is
# written.  Replaces both the 4x4 cell paint and the per-tile RMW scatter.
# ---------------------------------------------------------------------------

BH = 64
SBAND = 256


def band_pad_shape(H, W):
    return -(-H // BH) * BH, -(-W // SBAND) * SBAND


def _band_entries(xs, ys, valid, h, w, RB, LB):
    """Per-tile band-intersection entries, sorted by band id.

    Returns int32 arrays (tidx, rb, lb, first, ok), each of length
    4*N + RB*LB (static).  jnp ops only — callable under jit.
    """
    nb = RB * LB
    rb0 = ys >> 6
    lb0 = xs >> 8
    rb1 = (ys + h - 1) >> 6
    lb1 = (xs + w - 1) >> 8
    v = valid.astype(bool)
    tidx, band, ok = [], [], []
    for dr in (0, 1):
        for dl in (0, 1):
            rb = rb0 + dr
            lb = lb0 + dl
            o = v & (rb <= rb1) & (lb <= lb1)
            tidx.append(jnp.arange(xs.shape[0], dtype=jnp.int32))
            band.append(jnp.clip(rb * LB + lb, 0, nb - 1))
            ok.append(o)
    # one dummy entry per band so every output block gets its copy step
    tidx.append(jnp.zeros(nb, jnp.int32))
    band.append(jnp.arange(nb, dtype=jnp.int32))
    ok.append(jnp.zeros(nb, bool))
    tidx = jnp.concatenate(tidx)
    band = jnp.concatenate(band).astype(jnp.int32)
    ok = jnp.concatenate(ok)
    order = jnp.argsort(band)
    band_s = band[order]
    first = jnp.concatenate([jnp.ones(1, jnp.int32),
                             (band_s[1:] != band_s[:-1]).astype(jnp.int32)])
    return (tidx[order], (band_s // LB).astype(jnp.int32),
            (band_s % LB).astype(jnp.int32), first,
            ok[order].astype(jnp.int32))


def _band_paint_kernel(tidx, rb, lb, first, ok, xs, ys, tiles_ref, plane_in,
                       out_ref, *, h, w):
    k = pl.program_id(0)

    @pl.when(first[k] != 0)
    def _():
        out_ref[...] = plane_in[...]

    @pl.when(ok[k] != 0)
    def _():
        t = tidx[k]
        dy = ys[t] - rb[k] * BH          # may be negative (row straddle)
        ox = xs[t] - lb[k] * SBAND
        tile = tiles_ref[0].astype(jnp.int32)
        tb = jnp.pad(tile, ((0, BH - h), (0, SBAND - w)))
        tb = pltpu.roll(tb, ox & (SBAND - 1), axis=1)
        tb = pltpu.roll(tb, dy & (BH - 1), axis=0)
        ri = jax.lax.broadcasted_iota(jnp.int32, (BH, SBAND), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (BH, SBAND), 1)
        mask = (ri >= dy) & (ri < dy + h) & (li >= ox) & (li < ox + w)
        out_ref[...] = jnp.where(mask, tb, out_ref[...].astype(jnp.int32)) \
            .astype(out_ref.dtype)


# scalar-prefetch SMEM budget: each tile costs 5 entry arrays x 4 band
# intersections x 4B + xs/ys = 88B of the ~1MB SMEM; 4K residual batches
# (32k+ tiles) must split into chained calls (each chunk's per-band dummy
# entries re-copy the evolving plane, so chaining is exact)
_PAINT_CAPN = 6144
_MC_CAPN = 16384


@partial(jax.jit, static_argnames=("h", "w", "interpret"))
def band_paint(plane, tiles, xs, ys, valid, h, w, interpret=False):
    """Paint (N, h, w) tiles into the band-padded (Hp, Wp) plane at
    (ys, xs); rows with valid==0 are skipped.  Returns the updated plane.
    Tiles must be spatially disjoint (h <= 64, w <= 256)."""
    if tiles.shape[0] > _PAINT_CAPN:
        for i in range(0, tiles.shape[0], _PAINT_CAPN):
            plane = band_paint(plane, tiles[i:i + _PAINT_CAPN],
                               xs[i:i + _PAINT_CAPN], ys[i:i + _PAINT_CAPN],
                               valid[i:i + _PAINT_CAPN], h, w, interpret)
        return plane
    Hp, Wp = plane.shape
    RB, LB = Hp // BH, Wp // SBAND
    tidx, rb, lb, first, ok = _band_entries(
        xs.astype(jnp.int32), ys.astype(jnp.int32), valid, h, w, RB, LB)
    E = tidx.shape[0]

    def _tile_map(k, tidx, rb, lb, first, ok, xs, ys):
        return (tidx[k], 0, 0)

    def _band_map(k, tidx, rb, lb, first, ok, xs, ys):
        return (rb[k], lb[k])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(E,),
        in_specs=[pl.BlockSpec((1, h, w), _tile_map),
                  pl.BlockSpec((BH, SBAND), _band_map)],
        out_specs=pl.BlockSpec((BH, SBAND), _band_map),
    )
    return pl.pallas_call(
        partial(_band_paint_kernel, h=h, w=w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), plane.dtype),
        interpret=interpret,
    )(tidx, rb, lb, first, ok, xs.astype(jnp.int32), ys.astype(jnp.int32),
      tiles, plane)
