"""Wavefront-batched intra prediction (exact int32, jit-compiled).

Each call predicts a batch of same-size blocks of one plane whose reference
samples are already final (the host wave scheduler guarantees this).
Semantics match model/intra.py (reference hevcpred_template.c) bit-exactly:
reference-sample gather + substitution cascade, [1 2 1]/strong smoothing,
planar/DC/angular prediction with luma edge corrections.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..model.intra import INTRA_PRED_ANGLE, INV_ANGLE

_ANGLE = jnp.asarray(np.asarray(INTRA_PRED_ANGLE), jnp.int32)      # mode-2
_INV_ANGLE = jnp.asarray(np.asarray(INV_ANGLE), jnp.int32)         # mode-11


@partial(jax.jit, static_argnames=("n", "c_idx", "bit_depth", "strong",
                                   "chroma_444", "smoothing_off"))
def intra_batch(plane, xs, ys, modes, flags, n, c_idx, bit_depth=8,
                strong=False, chroma_444=False, smoothing_off=False):
    """Predict a batch of n x n blocks.

    plane (H, W) int32; xs/ys (N,) int32 block origins; modes (N,) int32;
    flags (N, 5) int32: [bottom_left, left, up_left, up, up_right]
    (already z-order resolved by the front-end).
    Returns (N, n, n) predictions.
    """
    h, w = plane.shape
    nb = xs.shape[0]
    mid = 1 << (bit_depth - 1)

    cbl = flags[:, 0].astype(bool)
    cl = flags[:, 1].astype(bool)
    cul = flags[:, 2].astype(bool)
    cu = flags[:, 3].astype(bool)
    cur = flags[:, 4].astype(bool)

    # ---- gather raw reference arrays (clip-gather == replicate padding) ----
    k = jnp.arange(2 * n)
    top_x = jnp.clip(xs[:, None] + k[None, :], 0, w - 1)
    top_y = jnp.clip(ys - 1, 0, h - 1)
    top_raw = plane[top_y[:, None], top_x]                  # (N, 2n)
    left_y = jnp.clip(ys[:, None] + k[None, :], 0, h - 1)
    left_x = jnp.clip(xs - 1, 0, w - 1)
    left_raw = plane[left_y, left_x[:, None]]               # (N, 2n)
    corner_raw = plane[top_y, left_x]                       # (N,)

    # ---- substitution cascade (hevcpred_template.c:251-287) ----
    # segment masks
    top_lo = jnp.where(cu[:, None], top_raw[:, :n], 0)
    top_hi = jnp.where(cur[:, None], top_raw[:, n:], 0)
    left_lo = jnp.where(cl[:, None], left_raw[:, :n], 0)
    left_hi = jnp.where(cbl[:, None], left_raw[:, n:], 0)
    corner = jnp.where(cul, corner_raw, 0)

    # if !cbl: chain of fallbacks
    fb_left = left_lo[:, n - 1]                 # cl case: replicate left[n-1]
    fb_cul = corner                             # cul case
    fb_cu = top_lo[:, 0]                        # cu case
    fb_cur = top_hi[:, 0]                       # cur case: top[n]
    none_avail = ~(cbl | cl | cul | cu | cur)

    # value that fills left_hi when !cbl (priority: cl, cul, cu, cur, mid)
    fill_bl = jnp.where(cl, fb_left,
               jnp.where(cul, fb_cul,
                jnp.where(cu, fb_cu,
                 jnp.where(cur, fb_cur, mid))))
    left_hi = jnp.where(cbl[:, None], left_hi, fill_bl[:, None])
    # when neither cl nor cbl originally: left_lo filled from same fallback
    fill_l = jnp.where(cul, fb_cul, jnp.where(cu, fb_cu,
              jnp.where(cur, fb_cur, mid)))
    left_lo = jnp.where(cl[:, None], left_lo,
               jnp.where(cbl[:, None], left_hi[:, :1],  # !cl: left[0..n-1]=left[n]
                         fill_l[:, None]))
    # corner
    corner = jnp.where(cul, corner,
              jnp.where(cl | cbl, left_lo[:, 0],
               jnp.where(cu, top_lo[:, 0],
                jnp.where(cur, fb_cur, mid))))
    # top: when unavailable, fill with the (already-resolved) corner; the
    # cur-only fallback case sets corner = top[n] so this covers it too
    top_lo = jnp.where(cu[:, None], top_lo, corner[:, None])
    top_hi = jnp.where(cur[:, None], top_hi, top_lo[:, n - 1][:, None])

    top = jnp.concatenate([corner[:, None], top_lo, top_hi], axis=1)    # (N, 2n+1)
    left = jnp.concatenate([corner[:, None], left_lo, left_hi], axis=1)

    # ---- reference smoothing (spec 8.4.4.2.3): luma, or 4:4:4 chroma;
    # skipped entirely under the RExt intra_smoothing_disabled flag ----
    if (c_idx == 0 or chroma_444) and not smoothing_off:
        thresh = {8: 7, 16: 1, 32: 0}.get(n, -1)
        min_dist = jnp.minimum(jnp.abs(modes - 26), jnp.abs(modes - 10))
        do_filter = (modes != 1) & (n != 4) & (min_dist > thresh)
        ftop = _filter_121(top, n)
        fleft = _filter_121(left, n)
        fcorner = (left[:, 1] + 2 * corner + top[:, 1] + 2) >> 2
        ftop = ftop.at[:, 0].set(fcorner)
        fleft = fleft.at[:, 0].set(fcorner)
        if strong and n == 32 and c_idx == 0:
            th = 1 << (bit_depth - 5)
            bi = ((jnp.abs(top[:, 0] + top[:, 64] - 2 * top[:, 32]) < th) &
                  (jnp.abs(left[:, 0] + left[:, 64] - 2 * left[:, 32]) < th))
            i = jnp.arange(63)
            stop = top.at[:, 1:64].set(
                ((64 - (i + 1))[None, :] * top[:, 0:1] +
                 (i + 1)[None, :] * top[:, 64:65] + 32) >> 6)
            sleft = left.at[:, 1:64].set(
                ((64 - (i + 1))[None, :] * left[:, 0:1] +
                 (i + 1)[None, :] * left[:, 64:65] + 32) >> 6)
            ftop = jnp.where(bi[:, None], stop, ftop)
            fleft = jnp.where(bi[:, None], sleft, fleft)
        top = jnp.where(do_filter[:, None], ftop, top)
        left = jnp.where(do_filter[:, None], fleft, left)

    # ---- prediction ----
    pred_planar = _pred_planar(top, left, n)
    pred_dc = _pred_dc(top, left, n, c_idx)
    pred_ang = _pred_angular(top, left, modes, n, c_idx, bit_depth)

    out = jnp.where((modes == 0)[:, None, None], pred_planar,
           jnp.where((modes == 1)[:, None, None], pred_dc, pred_ang))
    return out


def _filter_121(arr, n):
    """[1 2 1] smoothing of positions 1..2n-1 (corner handled by caller)."""
    f = arr.copy()
    mid = (arr[:, 2:2 * n + 1] + 2 * arr[:, 1:2 * n] + arr[:, 0:2 * n - 1] + 2) >> 2
    return f.at[:, 1:2 * n].set(mid)


def _pred_planar(top, left, n):
    log2 = n.bit_length() - 1
    x = jnp.arange(n)
    t = top[:, 1:1 + n]
    l = left[:, 1:1 + n]
    tr = top[:, 1 + n][:, None, None]
    bl = left[:, 1 + n][:, None, None]
    acc = ((n - 1 - x)[None, None, :] * l[:, :, None] +
           (x + 1)[None, None, :] * tr +
           (n - 1 - x)[None, :, None] * t[:, None, :] +          # (n-1-y) term
           (x + 1)[None, :, None] * bl + n)
    return acc >> (log2 + 1)


def _pred_dc(top, left, n, c_idx):
    log2 = n.bit_length() - 1
    dc = (top[:, 1:1 + n].sum(1) + left[:, 1:1 + n].sum(1) + n) >> (log2 + 1)
    out = jnp.broadcast_to(dc[:, None, None], (dc.shape[0], n, n))
    if c_idx == 0 and n < 32:
        row0 = (top[:, 2:1 + n] + 3 * dc[:, None] + 2) >> 2
        col0 = (left[:, 2:1 + n] + 3 * dc[:, None] + 2) >> 2
        c00 = (left[:, 1] + 2 * dc + top[:, 1] + 2) >> 2
        out = out.at[:, 0, 1:].set(row0)
        out = out.at[:, 1:, 0].set(col0)
        out = out.at[:, 0, 0].set(c00)
    return out


def _pred_angular(top, left, modes, n, c_idx, bit_depth):
    """Angular modes 2..34 for the whole batch (vertical-style core; the
    horizontal half swaps main/side and transposes)."""
    nb = modes.shape[0]
    maxv = (1 << bit_depth) - 1
    is_ver = modes >= 18
    main = jnp.where(is_ver[:, None], top, left)
    side = jnp.where(is_ver[:, None], left, top)
    angle = _ANGLE[jnp.clip(modes - 2, 0, 32)]

    # extended reference: refa[j] == ref[x] with j = x + n, x in [-n, 2n]
    inv = _INV_ANGLE[jnp.clip(modes - 11, 0, 14)]
    xneg = jnp.arange(-n, 0)
    side_idx = jnp.clip((xneg[None, :] * inv[:, None] + 128) >> 8, 0, 2 * n)
    neg_part = jnp.take_along_axis(side, side_idx, axis=1)     # (N, n)
    refa = jnp.concatenate([neg_part, main], axis=1)           # (N, 3n+1)

    yy = jnp.arange(n)
    idx = ((yy[None, :] + 1) * angle[:, None]) >> 5            # (N, n)
    fact = ((yy[None, :] + 1) * angle[:, None]) & 31
    xx = jnp.arange(n)
    base = idx[:, :, None] + n + 1 + xx[None, None, :]         # (N, n, n)
    base = jnp.clip(base, 0, 3 * n)
    refb = jnp.broadcast_to(refa[:, None, :], (nb, n, 3 * n + 1))
    r0 = jnp.take_along_axis(refb, base, axis=2)
    base1 = jnp.clip(base + 1, 0, 3 * n)
    r1 = jnp.take_along_axis(refb, base1, axis=2)
    interp = ((32 - fact)[:, :, None] * r0 + fact[:, :, None] * r1 + 16) >> 5
    pred_v = jnp.where((fact != 0)[:, :, None], interp, r0)

    # vertical-mode edge correction (mode 26, luma, n < 32)
    if c_idx == 0 and n < 32:
        corr = jnp.clip(main[:, 1][:, None] +
                        ((side[:, 1:1 + n] - side[:, 0][:, None]) >> 1),
                        0, maxv)
        fix = (modes == 26) | (modes == 10)
        pred_v = jnp.where(fix[:, None, None],
                           pred_v.at[:, :, 0].set(corr), pred_v)

    # horizontal modes: transpose
    out = jnp.where(is_ver[:, None, None], pred_v,
                    jnp.swapaxes(pred_v, 1, 2))
    return out
