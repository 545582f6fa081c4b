"""TPU inter-layer upsampling: separable polyphase FIR as one jit program.

Bit-exact with model/upsample.py (reference upsample_base_layer_frame,
hevcdsp_template.c:2164-2440).  The per-output-position tap indices and
coefficients depend only on the layer geometry, so they are precomputed on
host once per (BL, EL) size pair; the device does two dense gather+multiply
stages (VPU int32 math, no data-dependent control flow).
"""

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

    def __init__(self):
        self._plans = {}

    def _plan(self, shape_bl, w_el, h_el, c_idx, info):
        key = (shape_bl, w_el, h_el, c_idx)
        if key not in self._plans:
            h_bl, w_bl = shape_bl
            ntaps = 8 if c_idx == 0 else 4
            sx = info.scale_x
            ax = info.add_x if c_idx == 0 else info.add_xc
            sy = info.scale_y
            ay = info.add_y if c_idx == 0 else info.add_yc
            idx_x, coef_x = plan_axis(w_el, w_bl, sx, ax, ntaps)
            idx_y, coef_y = plan_axis(h_el, h_bl, sy, ay, ntaps,
                                      v_chroma=c_idx > 0)
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
            out.append(upsample_plane_jit(p, *plan, bit_depth=bit_depth))
        return out
