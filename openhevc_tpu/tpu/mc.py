"""Batched motion compensation on TPU (exact int32, jit-compiled).

One call handles a batch of same-size PUs: gather replicate-padded windows
from a stacked reference tensor, apply separable 8-tap (luma) / 4-tap
(chroma) filters.  Fractional phase 0 uses an identity tap row, which is
bit-exact with the reference's copy/h-only/v-only paths (the 64x scale and
shifts cancel exactly).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..model.mc import QPEL_FILTERS, EPEL_FILTERS

_QPEL = jnp.asarray(np.vstack([[0, 0, 0, 64, 0, 0, 0, 0], QPEL_FILTERS]),
                    jnp.int32)                     # (4, 8), row = frac
_EPEL = jnp.asarray(np.vstack([[0, 64, 0, 0], EPEL_FILTERS]), jnp.int32)  # (8, 4)


@partial(jax.jit, static_argnames=("w", "h", "is_luma", "bit_depth"))
def mc_batch(refs, ref_sel, xs, ys, mvx, mvy, w, h, is_luma, bit_depth=8):
    """refs (R, H, W) int32 stacked reference planes; per-PU ref_sel/xs/ys/mv.

    Returns (N, h, w) int32 14-bit intermediates (the reference's
    put_hevc_qpel/epel output).
    """
    _, H, W = refs.shape
    if is_luma:
        before, taps, fbits = 3, 8, 2
        table = _QPEL
    else:
        before, taps, fbits = 1, 4, 3
        table = _EPEL
    frac_mask = (1 << fbits) - 1
    fx = mvx & frac_mask
    fy = mvy & frac_mask
    bx = xs + (mvx >> fbits)
    by = ys + (mvy >> fbits)

    rows = jnp.clip(by[:, None] - before + jnp.arange(h + taps - 1), 0, H - 1)
    cols = jnp.clip(bx[:, None] - before + jnp.arange(w + taps - 1), 0, W - 1)
    win = refs[ref_sel[:, None, None], rows[:, :, None], cols[:, None, :]]

    hf = table[fx]                                  # (N, taps)
    tmp = jnp.zeros((xs.shape[0], h + taps - 1, w), jnp.int32)
    for i in range(taps):
        tmp = tmp + hf[:, i][:, None, None] * win[:, :, i:i + w]
    tmp = tmp >> (bit_depth - 8)

    vf = table[fy]
    out = jnp.zeros((xs.shape[0], h, w), jnp.int32)
    for i in range(taps):
        out = out + vf[:, i][:, None, None] * tmp[:, i:i + h, :]
    return out >> 6


@partial(jax.jit, static_argnames=("w", "h", "bit_depth"))
def mc_combine_scatter(plane, xs, ys, val0, val1, pred_flag, valid, w, h,
                       bit_depth=8):
    """Combine uni/bi predictions and scatter into the plane.

    pred_flag (N,): 1=L0, 2=L1, 3=BI. val0/val1 (N, h, w) 14-bit.
    """
    maxv = (1 << bit_depth) - 1
    shift_u = 14 - bit_depth
    shift_b = 15 - bit_depth
    uni_src = jnp.where((pred_flag == 1)[:, None, None], val0, val1)
    uni = jnp.clip((uni_src + (1 << (shift_u - 1))) >> shift_u, 0, maxv)
    bi = jnp.clip((val0 + val1 + (1 << (shift_b - 1))) >> shift_b, 0, maxv)
    vals = jnp.where((pred_flag == 3)[:, None, None], bi, uni)

    ph, pw = plane.shape
    gy = ys[:, None, None] + jnp.arange(h)[None, :, None]
    gx = xs[:, None, None] + jnp.arange(w)[None, None, :]
    flat_idx = (gy * pw + gx).reshape(-1)
    flat = plane.reshape(-1)
    cur = flat[flat_idx]
    delta = jnp.where(valid[:, None, None], vals, 0).reshape(-1) - \
        jnp.where(jnp.repeat(valid, h * w), cur, 0)
    # valid blocks are disjoint; invalid ones add zero (duplicate-safe)
    return flat.at[flat_idx].add(delta).reshape(ph, pw)