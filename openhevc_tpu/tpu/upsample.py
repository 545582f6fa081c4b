"""TPU inter-layer upsampling: separable polyphase FIR as one jit program.

Bit-exact with model/upsample.py (reference upsample_base_layer_frame,
hevcdsp_template.c:2164-2440).  The per-output-position tap indices and
coefficients depend only on the layer geometry, so they are precomputed on
host once per (BL, EL) size pair.

Two device formulations:

- gather ("gather"): two dense gather+multiply stages (VPU int32 math).
  Default on CPU, where XLA lowers the gathers well.
- MXU ("mxu", default on TPU): the polyphase FIR along each axis is a
  banded linear map, so each stage is a dense matmul against a
  host-built band matrix (<= ntaps nonzeros per output column).  int32
  matmuls don't ride the MXU, so the *data* is split into hi/lo bytes
  and each stage runs as two bf16 matmuls with fp32 accumulation — the
  same exactness argument as tpu/residual.py _inv_stage: both byte
  halves and the filter taps (|c| <= 64, hevcdsp.h up_sample_filter_*)
  are integers below 2^8, held exactly in bf16; every partial sum is
  bounded by sum|c| * 255 < 2^24, inside fp32's integer-exact range;
  recombining acc_hi*256 + acc_lo in int32 reproduces the int32 FIR
  bit-exactly, including the reference's int16 intermediate wraparound.
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..model.upsample import (UpsampleInfo, UP_FILTER_LUMA, UP_FILTER_CHROMA,
                              N_SHIFT, I_OFFSET, _phase_positions)


def plan_axis(n_el, n_src, scale, add, ntaps, v_chroma=False):
    """-> (idx (n_el, ntaps) clamped source indices, coef (n_el, ntaps))."""
    table = UP_FILTER_LUMA if ntaps == 8 else UP_FILTER_CHROMA
    refpos, phase = _phase_positions(n_el, scale, add, ntaps,
                                     v_chroma=v_chroma)
    k = np.arange(ntaps)
    idx = np.clip(refpos[:, None] + k[None, :], 0, n_src - 1)
    coef = table[phase]
    return idx.astype(np.int32), coef.astype(np.int32)


def band_matrix(idx, coef, n_src):
    """(n_el, T) tap plan -> dense (n_src, n_el) band matrix.

    Border-clamped taps hit duplicate source indices; accumulating them
    reproduces the clamp exactly (sum_k c[j,k]*src[clip(idx)] regrouped
    by unique source row)."""
    n_el, ntaps = idx.shape
    m = np.zeros((n_src, n_el), np.int32)
    cols = np.repeat(np.arange(n_el), ntaps)
    np.add.at(m, (idx.ravel(), cols), coef.ravel())
    return m


@partial(jax.jit, static_argnames=("bit_depth",))
def upsample_plane_mxu(src, mx, my, bit_depth=8):
    """src (H_BL, W_BL) int32, mx (W_BL, W_EL) bf16, my (H_EL, H_BL) bf16
    -> (H_EL, W_EL) int32.  Bit-exact with upsample_plane_jit."""
    lo = (src & 255).astype(jnp.bfloat16)
    tl = jnp.dot(lo, mx, preferred_element_type=jnp.float32)
    if bit_depth > 8:
        hi = (src >> 8).astype(jnp.bfloat16)
        th = jnp.dot(hi, mx, preferred_element_type=jnp.float32)
        t32 = th.astype(jnp.int32) * 256 + tl.astype(jnp.int32)
    else:
        t32 = tl.astype(jnp.int32)
    # the reference's int16_t intermediate wraps for >8-bit inputs
    tmp = t32.astype(jnp.int16).astype(jnp.int32)
    thi = (tmp >> 8).astype(jnp.bfloat16)          # floor: [-128, 127]
    tlo = (tmp & 255).astype(jnp.bfloat16)
    ah = jnp.dot(my, thi, preferred_element_type=jnp.float32)
    al = jnp.dot(my, tlo, preferred_element_type=jnp.float32)
    acc = ah.astype(jnp.int32) * 256 + al.astype(jnp.int32)
    return jnp.clip((acc + I_OFFSET) >> N_SHIFT, 0, (1 << bit_depth) - 1)


@partial(jax.jit, static_argnames=("bit_depth",))
def upsample_plane_jit(src, idx_x, coef_x, idx_y, coef_y, bit_depth=8):
    """src (H_BL, W_BL) int32 -> (H_EL, W_EL) int32."""
    # horizontal: gather columns, weighted sum; int16 wraparound like the
    # reference's int16_t intermediate
    g = src[:, idx_x]                                   # (H_BL, W_EL, T)
    tmp = jnp.sum(g * coef_x[None], axis=-1)
    tmp = tmp.astype(jnp.int16).astype(jnp.int32)
    # vertical: gather rows of the intermediate
    gv = tmp[idx_y]                                     # (H_EL, T, W_EL)
    acc = jnp.sum(gv * coef_y[:, :, None], axis=1)
    return jnp.clip((acc + I_OFFSET) >> N_SHIFT, 0, (1 << bit_depth) - 1)


class TpuUpsampler:
    """Caches per-geometry tap plans and staged device constants."""

    def __init__(self, path=None):
        self._plans = {}
        if path is None:
            path = os.environ.get("OPENHEVC_UPSAMPLE", "")
        if path not in ("mxu", "gather"):
            path = "mxu" if jax.default_backend() != "cpu" else "gather"
        self.path = path

    def _axis_plans(self, shape_bl, w_el, h_el, c_idx, info):
        h_bl, w_bl = shape_bl
        ntaps = 8 if c_idx == 0 else 4
        sx = info.scale_x
        ax = info.add_x if c_idx == 0 else info.add_xc
        sy = info.scale_y
        ay = info.add_y if c_idx == 0 else info.add_yc
        idx_x, coef_x = plan_axis(w_el, w_bl, sx, ax, ntaps)
        idx_y, coef_y = plan_axis(h_el, h_bl, sy, ay, ntaps,
                                  v_chroma=c_idx > 0)
        return idx_x, coef_x, idx_y, coef_y

    def _plan(self, shape_bl, w_el, h_el, c_idx, info):
        key = (shape_bl, w_el, h_el, c_idx, self.path)
        if key not in self._plans:
            idx_x, coef_x, idx_y, coef_y = self._axis_plans(
                shape_bl, w_el, h_el, c_idx, info)
            if self.path == "mxu":
                mx = band_matrix(idx_x, coef_x, shape_bl[1])
                my = np.ascontiguousarray(
                    band_matrix(idx_y, coef_y, shape_bl[0]).T)
                self._plans[key] = (jnp.asarray(mx, jnp.bfloat16),
                                    jnp.asarray(my, jnp.bfloat16))
            else:
                self._plans[key] = tuple(jnp.asarray(a) for a in
                                         (idx_x, coef_x, idx_y, coef_y))
        return self._plans[key]

    def upsample_frame(self, bl_planes, width_el, height_el, bit_depth=8,
                       chroma_format_idc=1, phase_align_flag=0):
        h_bl, w_bl = bl_planes[0].shape     # no host fetch: shape only
        info = UpsampleInfo(w_bl, h_bl, width_el, height_el, phase_align_flag)
        if info.is_snr:
            return [jnp.asarray(p, jnp.int32) for p in bl_planes]
        hs = 1 if chroma_format_idc in (1, 2) else 0
        vs = 1 if chroma_format_idc == 1 else 0
        out = []
        for c in range(3):
            p = jnp.asarray(bl_planes[c], jnp.int32)
            w = width_el >> (hs if c else 0)
            h = height_el >> (vs if c else 0)
            plan = self._plan(tuple(p.shape), w, h, min(c, 1), info)
            if self.path == "mxu":
                out.append(upsample_plane_mxu(p, *plan, bit_depth=bit_depth))
            else:
                out.append(upsample_plane_jit(p, *plan, bit_depth=bit_depth))
        return out
