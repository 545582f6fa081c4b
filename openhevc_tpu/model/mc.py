"""Exact-integer scalar model of HEVC motion-compensation interpolation.

Matches reference templates put_hevc_{qpel,epel}* (hevcdsp_template.c:610+):
  - plain ("put"): 14-bit intermediate int16, shift (BIT_DEPTH - 8), hv second
    stage shift 6
  - uni: clip_pixel((val + (1 << (13 - BD))) >> (14 - BD))
  - bi:  clip_pixel((val0 + val1 + (1 << (14 - BD))) >> (15 - BD))
  - uni_w / bi_w: explicit weighted prediction

All functions take a source window with the filter halo already included:
qpel needs 3 rows/cols before and 4 after; epel 1 before, 2 after.
"""

import numpy as np

QPEL_FILTERS = np.array([
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], np.int32)

EPEL_FILTERS = np.array([
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], np.int32)

QPEL_EXTRA_BEFORE = 3
QPEL_EXTRA_AFTER = 4
EPEL_EXTRA_BEFORE = 1
EPEL_EXTRA_AFTER = 2


def _filt_h(src, filt):
    """Horizontal FIR: src (h, w + taps - 1) int64 -> (h, w)."""
    taps = len(filt)
    w = src.shape[1] - taps + 1
    out = np.zeros((src.shape[0], w), np.int64)
    for i, f in enumerate(filt):
        out += int(f) * src[:, i:i + w]
    return out


def _filt_v(src, filt):
    taps = len(filt)
    h = src.shape[0] - taps + 1
    out = np.zeros((h, src.shape[1]), np.int64)
    for i, f in enumerate(filt):
        out += int(f) * src[i:i + h, :]
    return out


def _interp(src, mx, my, w, h, bit_depth, filters, before, after):
    """14-bit intermediate MC. src includes halo: shape (h+before+after, w+before+after)
    with the block origin at [before][before]."""
    s = src.astype(np.int64)
    if mx == 0 and my == 0:
        return (s[before:before + h, before:before + w] << (14 - bit_depth))
    if my == 0:
        rows = s[before:before + h, :before + w + after]
        return _filt_h(rows, filters[mx - 1])[:, :w] >> (bit_depth - 8)
    if mx == 0:
        cols = s[:before + h + after, before:before + w]
        return _filt_v(cols, filters[my - 1])[:h, :] >> (bit_depth - 8)
    tmp = _filt_h(s[:, :before + w + after], filters[mx - 1])[:, :w] >> (bit_depth - 8)
    return _filt_v(tmp, filters[my - 1])[:h, :] >> 6


def qpel(src, mx, my, w, h, bit_depth=8):
    out = _interp(src, mx, my, w, h, bit_depth, QPEL_FILTERS,
                  QPEL_EXTRA_BEFORE, QPEL_EXTRA_AFTER)
    return out.astype(np.int32)


def epel(src, mx, my, w, h, bit_depth=8):
    out = _interp(src, mx, my, w, h, bit_depth, EPEL_FILTERS,
                  EPEL_EXTRA_BEFORE, EPEL_EXTRA_AFTER)
    return out.astype(np.int32)


def _clip_pixel(x, bit_depth):
    return np.clip(x, 0, (1 << bit_depth) - 1)


def mc_uni(val, bit_depth=8):
    # the reference's BIT_DEPTH 14 instantiation pins offset to 0
    # (hevcdsp_template.c "#if BIT_DEPTH < 14 ... offset" pattern)
    shift = 14 - bit_depth
    offset = (1 << (shift - 1)) if bit_depth < 14 else 0
    return _clip_pixel((val.astype(np.int64) + offset) >> shift, bit_depth).astype(np.int32)


def mc_bi(val0, val1, bit_depth=8):
    shift = 15 - bit_depth
    offset = (1 << (shift - 1)) if bit_depth < 14 else 0
    acc = val0.astype(np.int64) + val1.astype(np.int64) + offset
    return _clip_pixel(acc >> shift, bit_depth).astype(np.int32)


def mc_uni_w(val, denom, wx, ox, bit_depth=8):
    shift = denom + 14 - bit_depth
    offset = (1 << (shift - 1)) if bit_depth < 14 else 0
    ox = ox * (1 << (bit_depth - 8))
    out = ((val.astype(np.int64) * wx + offset) >> shift) + ox
    return _clip_pixel(out, bit_depth).astype(np.int32)


def mc_bi_w(val0, val1, denom, wx0, wx1, ox0, ox1, bit_depth=8):
    shift = 15 - bit_depth
    log2wd = denom + shift - 1
    ox0 = ox0 * (1 << (bit_depth - 8))
    ox1 = ox1 * (1 << (bit_depth - 8))
    acc = (val1.astype(np.int64) * wx1 + val0.astype(np.int64) * wx0 +
           ((ox0 + ox1 + 1) << log2wd))
    return _clip_pixel(acc >> (log2wd + 1), bit_depth).astype(np.int32)
