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


@partial(jax.jit, static_argnames=("w", "h", "is_luma", "bit_depth",
                                   "hs", "vs"))
def mc_batch(refs, ref_sel, xs, ys, mvx, mvy, w, h, is_luma, bit_depth=8,
             hs=1, vs=1):
    """refs (R, H, W) int32 stacked reference planes; per-PU ref_sel/xs/ys/mv.

    hs/vs: chroma subsampling shifts — chroma MV precision is 1/8-pel per
    subsampled axis, 1/4-pel (even 8th phases) otherwise (chroma_mc_uni,
    hevc.c:1834).  Returns (N, h, w) int32 14-bit intermediates (the
    reference's put_hevc_qpel/epel output).
    """
    _, H, W = refs.shape
    if is_luma:
        before, taps = 3, 8
        table = _QPEL
        fx = mvx & 3
        fy = mvy & 3
        bx = xs + (mvx >> 2)
        by = ys + (mvy >> 2)
    else:
        before, taps = 1, 4
        table = _EPEL
        fx = (mvx & ((1 << (2 + hs)) - 1)) << (1 - hs)
        fy = (mvy & ((1 << (2 + vs)) - 1)) << (1 - vs)
        bx = xs + (mvx >> (2 + hs))
        by = ys + (mvy >> (2 + vs))

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
    # reference pins offsets to 0 at BIT_DEPTH 14 (hevcdsp_template.c)
    off_u = (1 << (shift_u - 1)) if bit_depth < 14 else 0
    off_b = (1 << (shift_b - 1)) if bit_depth < 14 else 0
    uni = jnp.clip((uni_src + off_u) >> shift_u, 0, maxv)
    bi = jnp.clip((val0 + val1 + off_b) >> shift_b, 0, maxv)
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