"""Batched dequant + inverse transform (exact int32, jit-compiled).

One kernel per transform size; a batch mixes DCT / DST / DC-only / skip /
bypass blocks, selected per block with masks (no data-dependent control
flow). Semantics match model/transforms.py exactly.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..model.transforms import dct_matrix, TDST4, LEVEL_SCALE

# transform kind codes in the residual batch
KIND_DCT = 0
KIND_DST = 1
KIND_DC = 2          # handled inside the DCT path (same math)
KIND_SKIP = 3
KIND_BYPASS = 4

_T = {n: jnp.asarray(dct_matrix(n), jnp.int32) for n in (4, 8, 16, 32)}
_TDST = jnp.asarray(TDST4, jnp.int32)
_LEVEL_SCALE = jnp.asarray(np.asarray(LEVEL_SCALE), jnp.int32)


def _clip16(x):
    return jnp.clip(x, -32768, 32767)


def _inv_stage(mat, coeffs, shift):
    """clip16((mat^T @ coeffs + add) >> shift) over a batch (N, n, n).

    MXU formulation: an int32 einsum runs on the VPU's multi-pass integer
    multiplier; instead split the int16 coefficients into hi/lo bytes and
    run two bf16 matmuls with fp32 accumulation on the MXU.  Every step is
    exact: transform entries (|m| <= 90, hevcdsp_template.c:280-338 DCT/DST
    matrices) and both byte halves (|hi| <= 128, lo <= 255) are integers
    below 2^8 so bf16 (8-bit significand) holds them exactly; each product
    (<= 90*255) is exact in fp32; every partial sum is an integer bounded
    by 32*90*255 < 2^24, inside fp32's integer-exact range.  Recombining
    acc_hi*256 + acc_lo in int32 reproduces the int32 einsum bit-exactly.
    """
    add = 1 << (shift - 1)
    matb = mat.astype(jnp.bfloat16)
    hi = (coeffs >> 8).astype(jnp.bfloat16)
    lo = (coeffs & 255).astype(jnp.bfloat16)
    acc_hi = jnp.einsum("kn,bkm->bnm", matb, hi,
                        preferred_element_type=jnp.float32)
    acc_lo = jnp.einsum("kn,bkm->bnm", matb, lo,
                        preferred_element_type=jnp.float32)
    acc = acc_hi.astype(jnp.int32) * 256 + acc_lo.astype(jnp.int32)
    return _clip16((acc + add) >> shift)


@partial(jax.jit, static_argnames=("n", "bit_depth"))
def residual_batch(levels, qp, kind, n, bit_depth=8, mids=None, smats=None,
                   xtra=None):
    """levels (N, n, n) int32, qp (N,) int32, kind (N,) int32 -> residuals.

    dequant: clip16((lv * m * levelScale[qp%6] << (qp/6) + add) >> shift)
    with m = 16 (flat) or the scaling-list factor; then per-kind inverse
    transform.  mids (N,) selects into smats (6, n, n); mid -1 = flat.
    xtra (N,) packs the RExt per-block transforms: bits 0-1 rdpcm
    (0 none / 1 horizontal / 2 vertical), bit 2 transform-skip rotation.
    """
    shift = bit_depth + (n.bit_length() - 1) - 5
    scale = (_LEVEL_SCALE[qp % 6] << (qp // 6))[:, None, None]
    if smats is not None:
        # two-stage int32-exact: a = lv*m (< 2^31), then clamp a so a*scale
        # stays < 2^30 — clamped values saturate to +/-32767 identically
        m = jnp.where((mids >= 0)[:, None, None],
                      smats[jnp.clip(mids, 0, 5)], 16)
        a = jnp.clip(levels, -(1 << 17), 1 << 17) * m
        lim = (1 << 30) // scale
        a = jnp.clip(a, -lim, lim)
        deq = _clip16((a * scale + (1 << (shift - 1))) >> shift).astype(jnp.int32)
    else:
        # dequant in pure int32: fold the x16 into the shift
        # (lv*scale*16 + 1<<(shift-1)) >> shift
        #     == (lv*scale + 1<<(shift-5)) >> (shift-4)
        # clamp lv so lv*scale stays < 2^30; clamps saturate identically
        scale16 = scale
        lim = (1 << 30) // scale16
        lv = jnp.clip(levels, -lim, lim)
        deq = _clip16((lv * scale16 + (1 << (shift - 5)))
                      >> (shift - 4)).astype(jnp.int32)

    mat = _T[n]
    # stage 1 on columns, stage 2 on rows (transposed application)
    tmp = _inv_stage(mat, deq, 7)
    dct = jnp.swapaxes(_inv_stage(mat, jnp.swapaxes(tmp, 1, 2), 20 - bit_depth), 1, 2)

    out = dct
    if n == 4:
        tmp_d = _inv_stage(_TDST, deq, 7)
        dst = jnp.swapaxes(_inv_stage(_TDST, jnp.swapaxes(tmp_d, 1, 2),
                                      20 - bit_depth), 1, 2)
        out = jnp.where((kind == KIND_DST)[:, None, None], dst, out)

    # transform skip (RExt rotation: reverse dequantized 4x4 coeffs first)
    deq_s = deq
    if xtra is not None and n == 4:
        rot = ((xtra >> 2) & 1)[:, None, None]
        deq_s = jnp.where(rot == 1, jnp.flip(jnp.flip(deq, 1), 2), deq)
    ts_shift = 15 - bit_depth - (n.bit_length() - 1)
    if ts_shift > 0:
        skip = (deq_s + (1 << (ts_shift - 1))) >> ts_shift
    else:
        skip = deq_s << -ts_shift
    out = jnp.where((kind == KIND_SKIP)[:, None, None], skip, out)
    # transquant bypass: raw levels
    out = jnp.where((kind == KIND_BYPASS)[:, None, None], levels, out)
    if xtra is not None:
        # RDPCM: int16-wraparound cumulative sums (transform_rdpcm)
        rd = (xtra & 3)[:, None, None]
        wrap = lambda v: ((v + 0x8000) & 0xFFFF) - 0x8000
        out = jnp.where(rd == 1, wrap(jnp.cumsum(out, axis=2)),
               jnp.where(rd == 2, wrap(jnp.cumsum(out, axis=1)), out))
    return out


def scatter_add_residual(plane, xs, ys, res, valid, bit_depth=8):
    """plane (H, W) int32; res (N, n, n); adds clip16(res) then clip_pixel.

    Blocks are disjoint, so a scatter-add over flat indices is exact.
    """
    n = res.shape[1]
    maxv = (1 << bit_depth) - 1
    h, w = plane.shape
    gy = ys[:, None, None] + jnp.arange(n)[None, :, None]
    gx = xs[:, None, None] + jnp.arange(n)[None, None, :]
    flat_idx = (gy * w + gx).reshape(-1)
    # invalid (padding) blocks contribute zero; duplicates then sum safely
    vals = jnp.where(valid[:, None, None], _clip16(res), 0).reshape(-1)
    out = plane.reshape(-1).at[flat_idx].add(vals).reshape(h, w)
    # valid blocks are disjoint -> exactly one add per pixel; clipping the
    # whole plane is a no-op for untouched (already in-range) pixels
    return jnp.clip(out, 0, maxv)
