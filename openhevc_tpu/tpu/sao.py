"""Whole-frame SAO on TPU (exact int32, jit-compiled).

Per-CTB parameters are broadcast to per-pixel maps on the host; the kernel
then applies band/edge offsets in one vectorized pass per plane.
Picture-border pixels copy through (reference sao_edge_filter_0 borders[]).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_EDGE_IDX = jnp.asarray([1, 2, 0, 3, 4], jnp.int32)
# eo class -> (dx0, dy0) (the second neighbor is the negation)
_EO_D = ((-1, 0), (0, -1), (-1, -1), (1, -1))


@partial(jax.jit, static_argnames=("bit_depth",))
def sao_plane(src, type_map, band_pos_map, eo_map, offset_map, bit_depth=8):
    """src (H, W) int32.

    type_map (H, W) int32: 0 off / 1 band / 2 edge (per pixel, from CTB grid)
    band_pos_map (H, W), eo_map (H, W), offset_map (H, W, 5): SaoOffsetVal.
    """
    h, w = src.shape
    maxv = (1 << bit_depth) - 1
    shift = bit_depth - 5

    # band: offset index = (src >> shift) - band_pos mod 32, in [0, 4) else 0
    band_idx = ((src >> shift) - band_pos_map) & 31
    band_off = jnp.zeros_like(src)
    for k in range(4):
        band_off = band_off + jnp.where(band_idx == k,
                                        offset_map[..., k + 1], 0)
    band_out = jnp.clip(src + band_off, 0, maxv)

    # edge: compare with the two neighbors per class (static slices of the
    # padded plane; lax.dynamic_slice with constant starts lowered ~2x
    # slower on TPU)
    pad = jnp.pad(src, 1, mode="edge")

    def neigh(dx, dy):
        return pad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    edge_out = src
    border_x = (jnp.arange(w) == 0) | (jnp.arange(w) == w - 1)
    border_y = (jnp.arange(h) == 0) | (jnp.arange(h) == h - 1)
    for cls, (dx, dy) in enumerate(_EO_D):
        n0 = neigh(dx, dy)
        n1 = neigh(-dx, -dy)
        diff0 = jnp.sign(src - n0)
        diff1 = jnp.sign(src - n1)
        idx = _EDGE_IDX[diff0 + diff1 + 2]
        off = jnp.zeros_like(src)
        for k in range(1, 5):
            off = off + jnp.where(idx == k, offset_map[..., k], 0)
        filt = jnp.clip(src + off, 0, maxv)
        # picture borders copy (spec: offset 0 outside; reference borders[])
        if cls != 1:        # not vertical: left/right borders copy
            filt = jnp.where(border_x[None, :], src, filt)
        if cls != 0:        # not horizontal: top/bottom borders copy
            filt = jnp.where(border_y[:, None], src, filt)
        edge_out = jnp.where(eo_map == cls, filt, edge_out)

    out = jnp.where(type_map == 1, band_out,
                    jnp.where(type_map == 2, edge_out, src))
    return out


def build_sao_grids(plan, c_idx, grid_shape):
    """Host-side: per-CTB params -> per-CTB grids (rows, cols).

    The per-pixel expansion happens on device (frame_step repeats each grid
    cell over its CTB footprint): shipping ~500 CTB entries instead of
    ~100 MB of per-pixel maps per 1080p frame.
    """
    rows, cols = grid_shape
    raw = getattr(plan, "sao_raw", None)
    if raw is not None and raw.shape[0] == rows * cols:
        # native-walk fast path: one reshape instead of a per-CTB loop
        r = np.asarray(raw).reshape(rows, cols, 24)
        return (np.ascontiguousarray(r[:, :, 0 + c_idx]),
                np.ascontiguousarray(r[:, :, 3 + c_idx]),
                np.ascontiguousarray(r[:, :, 6 + c_idx]),
                np.ascontiguousarray(r[:, :, 9:24].reshape(
                    rows, cols, 3, 5)[:, :, c_idx]))
    type_g = np.zeros((rows, cols), np.int32)
    band_g = np.zeros((rows, cols), np.int32)
    eo_g = np.zeros((rows, cols), np.int32)
    off_g = np.zeros((rows, cols, 5), np.int32)
    if plan.sao is None:
        return type_g, band_g, eo_g, off_g
    for (rx, ry), sao in plan.sao.items():
        if rx >= cols or ry >= rows:
            continue
        type_g[ry, rx] = int(sao.sao_type[c_idx])
        band_g[ry, rx] = int(sao.sao_band_position[c_idx])
        eo_g[ry, rx] = int(sao.sao_eo_class[c_idx])
        off_g[ry, rx, :] = np.asarray(sao.sao_offsets[c_idx], np.int32)
    return type_g, band_g, eo_g, off_g


def build_sao_maps(plan, c_idx, ctb_size, plane_shape):
    """Host-side: per-CTB params -> per-pixel maps (NumPy).  ctb_size may
    be (csx, csy) for non-square chroma CTBs (4:2:2)."""
    h, w = plane_shape
    csx, csy = ctb_size if isinstance(ctb_size, tuple) else (ctb_size,
                                                            ctb_size)
    type_map = np.zeros((h, w), np.int32)
    band_map = np.zeros((h, w), np.int32)
    eo_map = np.zeros((h, w), np.int32)
    off_map = np.zeros((h, w, 5), np.int32)
    if plan.sao is None:
        return type_map, band_map, eo_map, off_map
    for (rx, ry), sao in plan.sao.items():
        x0, y0 = rx * csx, ry * csy
        if x0 >= w or y0 >= h:
            continue
        x1, y1 = min(x0 + csx, w), min(y0 + csy, h)
        type_map[y0:y1, x0:x1] = int(sao.sao_type[c_idx])
        band_map[y0:y1, x0:x1] = int(sao.sao_band_position[c_idx])
        eo_map[y0:y1, x0:x1] = int(sao.sao_eo_class[c_idx])
        off_map[y0:y1, x0:x1, :] = np.asarray(sao.sao_offsets[c_idx], np.int32)
    return type_map, band_map, eo_map, off_map
