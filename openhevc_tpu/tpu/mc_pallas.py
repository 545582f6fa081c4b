"""Pallas MC kernel: per-tile DMA of reference windows + separable FIR.

Replaces the XLA per-element gather in mc.mc_batch: each grid step DMAs its
(h+taps-1, w+taps-1) window from the HBM reference stack into VMEM (double
buffering across grid steps comes free from the pipeline), applies the
fractional-phase 8/4-tap filters on the VPU, and writes the 14-bit
intermediate block.

Edge handling: the caller passes a replicate-padded reference stack with
border B (tpu/mc.py semantics); window start coordinates are pre-clamped on
the host so every DMA is in-bounds and bit-exact with per-pixel clamping.
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


def _mc_kernel(sel_ref, sy_ref, sx_ref, fx_ref, fy_ref,   # scalar prefetch
               refs_ref, filt_ref, out_ref, win_ref, sem,
               *, w, h, taps, bit_depth):
    i = pl.program_id(0)
    ww = w + taps - 1
    wh = h + taps - 1
    dma = pltpu.make_async_copy(
        refs_ref.at[sel_ref[i], pl.ds(sy_ref[i], wh), pl.ds(sx_ref[i], ww)],
        win_ref, sem)
    dma.start()
    dma.wait()
    win = win_ref[...]
    hf = filt_ref[fx_ref[i]]
    vf = filt_ref[fy_ref[i]]
    tmp = jnp.zeros((wh, w), jnp.int32)
    for t in range(taps):
        tmp = tmp + hf[t] * win[:, t:t + w]
    tmp = tmp >> (bit_depth - 8)
    acc = jnp.zeros((h, w), jnp.int32)
    for t in range(taps):
        acc = acc + vf[t] * tmp[t:t + h, :]
    out_ref[0, ...] = acc >> 6


@partial(jax.jit,
         static_argnames=("w", "h", "is_luma", "bit_depth", "interpret"))
def mc_batch_pallas(refs_padded, sel, sy, sx, fx, fy, w, h, is_luma,
                    bit_depth=8, interpret=False):
    """refs_padded (R, Hp, Wp) int32 replicate-padded reference stack.

    sel/sy/sx: per-block ref slot + clamped window start (padded coords).
    fx/fy: fractional phases. Returns (N, h, w) int32 14-bit intermediates.
    """
    n = sel.shape[0]
    taps = 8 if is_luma else 4
    table = jnp.asarray(_QPEL if is_luma else _EPEL)
    wh, ww = h + taps - 1, w + taps - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),        # refs (HBM)
                  pl.BlockSpec(memory_space=pltpu.VMEM)],      # filter table
        out_specs=pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((wh, ww), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )
    kernel = partial(_mc_kernel, w=w, h=h, taps=taps, bit_depth=bit_depth)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        interpret=interpret,
    )(sel, sy, sx, fx, fy, refs_padded, table)
    return out


def pad_refs(refs, border):
    """Replicate-pad a stacked (R, H, W) reference tensor."""
    return jnp.pad(refs, ((0, 0), (border, border), (border, border)),
                   mode="edge")


def clamp_starts(xs, ys, mvx, mvy, w, h, W, H, is_luma, border):
    """Host/device helper: per-block clamped window starts in padded coords."""
    before = 3 if is_luma else 1
    fbits = 2 if is_luma else 3
    taps = 8 if is_luma else 4
    bx = xs + (mvx >> fbits) - before
    by = ys + (mvy >> fbits) - before
    sx = jnp.clip(bx, -border, W + border - (w + taps - 1)) + border
    sy = jnp.clip(by, -border, H + border - (h + taps - 1)) + border
    return sy.astype(jnp.int32), sx.astype(jnp.int32), \
        (mvx & ((1 << fbits) - 1)).astype(jnp.int32), \
        (mvy & ((1 << fbits) - 1)).astype(jnp.int32)
