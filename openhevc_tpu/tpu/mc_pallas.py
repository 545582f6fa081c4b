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


def _mc_kernel(sel_ref, sy_ref, sx_ref, ro_ref, co_ref, fx_ref, fy_ref,
               refs_ref, filt_ref, out_ref, win_ref, sem,
               *, w, h, taps, bit_depth, WH, WW):
    i = pl.program_id(0)
    # starts arrive pre-divided so Mosaic can prove tile alignment
    dma = pltpu.make_async_copy(
        refs_ref.at[sel_ref[i], pl.ds(sy_ref[i] * 8, WH),
                    pl.ds(sx_ref[i] * 128, WW)],
        win_ref, sem)
    dma.start()
    dma.wait()
    win = win_ref[...]
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
        scratch_shapes=[pltpu.VMEM((WH, WW), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )
    kernel = partial(_mc_kernel, w=w, h=h, taps=taps, bit_depth=bit_depth,
                     WH=WH, WW=WW)
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
# cell paint: scatter MC tiles into the plane without a generic XLA scatter
# ---------------------------------------------------------------------------

def _paint_kernel(dst_ref, cells_ref, canvas_ref, out_ref):
    del dst_ref, canvas_ref
    out_ref[...] = cells_ref[...]


@partial(jax.jit, static_argnames=("ch", "cw", "interpret"))
def paint_cells(canvas_cells, cells, dst, ch=4, cw=4, interpret=False):
    """Write (ch, cw) cells into a cell-major canvas copy.

    canvas_cells (S, ch, cw); cells (M, ch, cw); dst (M,) target cell index
    (invalid cells point at the reserved slot S-1).  The output aliases the
    canvas, so untouched cells keep their contents; the sequential grid
    makes duplicate dsts last-write-wins (valid cells are disjoint).
    """
    S = canvas_cells.shape[0]
    M = cells.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M,),
        in_specs=[pl.BlockSpec((1, ch, cw), lambda i, dst: (i, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.ANY)],       # canvas alias
        out_specs=pl.BlockSpec((1, ch, cw), lambda i, dst: (dst[i], 0, 0)),
    )
    return pl.pallas_call(
        _paint_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, ch, cw), canvas_cells.dtype),
        input_output_aliases={2: 0},   # canvas (after the prefetch arg)
        interpret=interpret,
    )(dst, cells, canvas_cells)


def plane_to_cells(plane, ch=4, cw=4):
    """(H, W) -> (H/ch*W/cw + 1, ch, cw) cell-major (+1 reserved slot)."""
    H, W = plane.shape
    c = plane.reshape(H // ch, ch, W // cw, cw).transpose(0, 2, 1, 3)
    c = c.reshape(-1, ch, cw)
    return jnp.concatenate([c, jnp.zeros((1, ch, cw), plane.dtype)])


def cells_to_plane(cells, H, W, ch=4, cw=4):
    c = cells[:-1].reshape(H // ch, W // cw, ch, cw).transpose(0, 2, 1, 3)
    return c.reshape(H, W)


# ---------------------------------------------------------------------------
# Tile scatter: write combined MC tiles straight into the padded plane.
#
# Replaces the 4x4 cell paint (grid step per cell + full-plane cell-major
# reshapes, ~100 ms/frame at 1080p) with one RMW band store per PU tile:
# the aligned 256-lane band containing the tile is loaded, the tile rotated
# into lane position (dynamic roll) and shifted into sublane position
# (0/2/4/6 static-concat select), and the masked merge stored back.  Tiles
# are spatially disjoint, so the sequential grid needs no ordering.
# ---------------------------------------------------------------------------

SBAND = 256


def _tile_index_map(i, xs, ys, v):
    return (i, 0, 0)


def _scatter_kernel(xs_ref, ys_ref, valid_ref, tiles_ref, plane_in, plane,
                    *, h, w):
    del plane_in                       # aliased with the output ref
    i = pl.program_id(0)

    @pl.when(valid_ref[i] != 0)
    def _():
        x = xs_ref[i]
        y = ys_ref[i]
        xb = pl.multiple_of((x >> 7) << 7, 128)
        off = x - xb
        y8 = pl.multiple_of((y >> 3) << 3, 8)
        d = y - y8                     # 0/2/4/6 (tile origins are 2-aligned)
        tile = tiles_ref[0].astype(jnp.int32)
        tb = jnp.pad(tile, ((0, 0), (0, SBAND - w)))
        tr = pltpu.roll(tb, off, axis=1)
        R = h + 8
        z = jnp.zeros((8, SBAND), jnp.int32)
        cats = [jnp.concatenate([tr, z], axis=0)] + [
            jnp.concatenate([z[:dd, :], tr, z[:8 - dd, :]], axis=0)
            for dd in (2, 4, 6)]
        vd = jnp.where(d == 0, cats[0],
              jnp.where(d == 2, cats[1],
               jnp.where(d == 4, cats[2], cats[3])))
        ri = jax.lax.broadcasted_iota(jnp.int32, (R, SBAND), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (R, SBAND), 1)
        mask = ((ri >= d) & (ri < d + h) &
                (li >= off) & (li < off + w))
        sub = plane[pl.ds(y8, R), pl.ds(xb, SBAND)]
        plane[pl.ds(y8, R), pl.ds(xb, SBAND)] = \
            jnp.where(mask, vd, sub.astype(jnp.int32)).astype(plane.dtype)


def scatter_tiles(plane, tiles, xs, ys, valid, h, w, interpret=False):
    """RMW-store (N, h, w) tiles into the padded (Hp, Wp) int16 plane at
    (ys, xs); rows of `valid`==0 are skipped.  Returns the updated plane."""
    N = tiles.shape[0]
    Hp, Wp = plane.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, h, w), _tile_index_map),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_scatter_kernel, h=h, w=w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), plane.dtype),
        input_output_aliases={4: 0},   # plane (after 3 prefetch + tiles)
        interpret=interpret,
    )(xs, ys, valid, tiles, plane)


def scatter_pad_shape(H, W):
    Hp = -(-(H + 8) // 8) * 8
    Wp = -(-W // 128) * 128 + SBAND
    return Hp, Wp
