"""SHVC inter-layer upsampling vs the reference DSP oracle.

Pins model/upsample.py to the reference's upsample_filter_block_* family
(hevcdsp_template.c:1834-2440) via the ctypes shims, for x2, x1.5 and
arbitrary ratios, luma and chroma, 8- and 10-bit.
"""

import ctypes

import numpy as np
import pytest

from openhevc_tpu.model.upsample import (
    UpsampleInfo, upsample_plane, upsample_frame, UP_FILTER_LUMA,
    UP_FILTER_CHROMA, N_SHIFT, I_OFFSET)
from tests.oracle import load, ptr


class HEVCWindow(ctypes.Structure):
    _fields_ = [("left_offset", ctypes.c_int), ("right_offset", ctypes.c_int),
                ("top_offset", ctypes.c_int), ("bottom_offset", ctypes.c_int)]


class UpsamplInf(ctypes.Structure):
    _fields_ = [("addXLum", ctypes.c_int), ("addYLum", ctypes.c_int),
                ("scaleXLum", ctypes.c_int), ("scaleYLum", ctypes.c_int),
                ("addXCr", ctypes.c_int), ("addYCr", ctypes.c_int),
                ("scaleXCr", ctypes.c_int), ("scaleYCr", ctypes.c_int),
                ("idx", ctypes.c_int)]


@pytest.fixture(scope="module")
def lib():
    return load()


def _mk_up(info):
    up = UpsamplInf()
    up.addXLum, up.addYLum = info.add_x, info.add_y
    up.scaleXLum, up.scaleYLum = info.scale_x, info.scale_y
    up.addXCr, up.addYCr = info.add_xc, info.add_yc
    up.scaleXCr, up.scaleYCr = info.scale_x, info.scale_y
    up.idx = 0
    return up


def _oracle_upsample_plane(lib, src, w_el, h_el, info, c_idx, bd):
    """Whole plane through the reference *block* kernels (ratio_idx 0 =
    generic). Horizontal stage needs an 8-pixel halo; replicate-pad the
    source like upsample_base_layer_frame's edge handling."""
    win = HEVCWindow(0, 0, 0, 0)
    up = _mk_up(info)
    h_bl, w_bl = src.shape
    ntaps = 8 if c_idx == 0 else 4
    halo = ntaps  # generous
    padded = np.pad(np.asarray(src), ((0, 0), (halo, halo)), mode="edge")
    esz = 1 if bd == 8 else 2
    if bd == 8:
        srcb = np.ascontiguousarray(padded, np.uint8)
    else:
        srcb = np.ascontiguousarray(padded, np.uint16)
    tmp = np.zeros((h_bl, w_el), np.int16)
    base = ctypes.c_void_p(srcb.ctypes.data + halo * esz)
    shim_h = lib.shim_upsample_filter_block_luma_h if c_idx == 0 else \
        lib.shim_upsample_filter_block_cr_h
    shim_h(bd, 0, ptr(tmp), ctypes.c_ssize_t(w_el), base,
           ctypes.c_ssize_t(srcb.shape[1]), 0, 0, w_el, h_bl, w_el,
           ctypes.byref(win), ctypes.byref(up))
    # vertical stage: pad the intermediate rows (replicate) for the halo
    vpad = ntaps
    tmpp = np.pad(tmp, ((vpad, vpad), (0, 0)), mode="edge")
    tmpp = np.ascontiguousarray(tmpp, np.int16)
    if bd == 8:
        dst = np.zeros((h_el, w_el), np.uint8)
    else:
        dst = np.zeros((h_el, w_el), np.uint16)
    vbase = ctypes.c_void_p(tmpp.ctypes.data + vpad * w_el * 2)
    shim_v = lib.shim_upsample_filter_block_luma_v if c_idx == 0 else \
        lib.shim_upsample_filter_block_cr_v
    shim_v(bd, 0, ptr(dst), ctypes.c_ssize_t(w_el), vbase,
           ctypes.c_ssize_t(w_el), 0, 0, 0, w_el, h_el, w_el, h_el,
           ctypes.byref(win), ctypes.byref(up))
    return dst.astype(np.int32)


RATIOS = [((32, 24), (64, 48)),      # x2
          ((32, 24), (48, 36)),      # x1.5
          ((40, 32), (56, 44)),      # arbitrary
          ((24, 16), (72, 48))]      # x3


@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("c_idx", [0, 1])
@pytest.mark.parametrize("dims", RATIOS)
def test_upsample_plane_vs_oracle(lib, bd, c_idx, dims):
    (w_bl, h_bl), (w_el, h_el) = dims
    rng = np.random.default_rng(bd + c_idx + w_el)
    info = UpsampleInfo(w_bl, h_bl, w_el, h_el)
    # chroma planes are half-size but share the luma-derived scales
    sub = 1 if c_idx else 0
    src = rng.integers(0, 1 << bd, (h_bl >> sub, w_bl >> sub)).astype(np.int32)
    got = upsample_plane(src, w_el >> sub, h_el >> sub, info, c_idx, bd)
    want = _oracle_upsample_plane(lib, src, w_el >> sub, h_el >> sub, info,
                                  c_idx, bd)
    np.testing.assert_array_equal(got, want)


def test_snr_passthrough():
    rng = np.random.default_rng(3)
    bl = [rng.integers(0, 256, (48, 64)).astype(np.int32),
          rng.integers(0, 256, (24, 32)).astype(np.int32),
          rng.integers(0, 256, (24, 32)).astype(np.int32)]
    out = upsample_frame(bl, 64, 48)
    for a, b in zip(out, bl):
        np.testing.assert_array_equal(a, b)


def test_tpu_upsampler_matches_model():
    from openhevc_tpu.tpu.upsample import TpuUpsampler
    rng = np.random.default_rng(9)
    for (w_bl, h_bl), (w_el, h_el) in RATIOS:
        bl = [rng.integers(0, 256, (h_bl, w_bl)).astype(np.int32),
              rng.integers(0, 256, (h_bl // 2, w_bl // 2)).astype(np.int32),
              rng.integers(0, 256, (h_bl // 2, w_bl // 2)).astype(np.int32)]
        want = upsample_frame(bl, w_el, h_el)
        got = TpuUpsampler().upsample_frame(bl, w_el, h_el)
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(got[c]), want[c])


@pytest.mark.parametrize("bd", [8, 10])
def test_tpu_upsampler_mxu_matches_model(bd):
    """The MXU band-matmul formulation (hi/lo bf16 split) must reproduce
    the scalar model bit-exactly, including the int16 intermediate wrap
    that 10-bit inputs trigger."""
    from openhevc_tpu.tpu.upsample import TpuUpsampler
    rng = np.random.default_rng(11)
    for (w_bl, h_bl), (w_el, h_el) in RATIOS:
        bl = [rng.integers(0, 1 << bd, (h_bl, w_bl)).astype(np.int32),
              rng.integers(0, 1 << bd,
                           (h_bl // 2, w_bl // 2)).astype(np.int32),
              rng.integers(0, 1 << bd,
                           (h_bl // 2, w_bl // 2)).astype(np.int32)]
        want = upsample_frame(bl, w_el, h_el, bit_depth=bd)
        got = TpuUpsampler(path="mxu").upsample_frame(bl, w_el, h_el,
                                                      bit_depth=bd)
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(got[c]), want[c])
