"""ctypes bindings for the reference-DSP golden oracle (.oracle/dsp_oracle.so).

Tests that need bit-exact per-kernel ground truth load this; they skip when
the oracle build is absent (e.g. on machines without the reference checkout).
"""

import ctypes
import os

import numpy as np
import pytest

_SO = os.path.join(os.path.dirname(__file__), "..", ".oracle", "dsp_oracle.so")

MAX_PB_SIZE = 64


def load():
    if not os.path.exists(_SO):
        pytest.skip("reference DSP oracle not built", allow_module_level=False)
    return ctypes.CDLL(_SO)


def ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


class Oracle:
    def __init__(self):
        self.lib = load()

    def idct(self, coeffs, bit_depth=8, col_limit=None):
        c = np.ascontiguousarray(coeffs, np.int16).copy()
        n = c.shape[0]
        log2 = n.bit_length() - 1
        self.lib.shim_idct(bit_depth, ptr(c), log2, col_limit or n)
        return c.astype(np.int32)

    def idct_dc(self, dc, n, bit_depth=8):
        c = np.zeros((n, n), np.int16)
        c[0, 0] = dc
        self.lib.shim_idct_dc(bit_depth, ptr(c), n.bit_length() - 1)
        return c.astype(np.int32)

    def idst4(self, coeffs, bit_depth=8):
        c = np.ascontiguousarray(coeffs, np.int16).copy()
        self.lib.shim_idct_4x4_luma(bit_depth, ptr(c))
        return c.astype(np.int32)

    def transform_skip(self, coeffs, bit_depth=8):
        c = np.ascontiguousarray(coeffs, np.int16).copy()
        log2 = c.shape[0].bit_length() - 1
        self.lib.shim_transform_skip(bit_depth, ptr(c), log2)
        return c.astype(np.int32)

    def transform_rdpcm(self, coeffs, vertical, bit_depth=8):
        c = np.ascontiguousarray(coeffs, np.int16).copy()
        log2 = c.shape[0].bit_length() - 1
        self.lib.shim_transform_rdpcm(bit_depth, ptr(c), log2, 1 if vertical else 0)
        return c.astype(np.int32)

    def transform_add(self, dst, res, bit_depth=8):
        n = res.shape[0]
        log2 = n.bit_length() - 1
        if bit_depth == 8:
            d = np.ascontiguousarray(dst, np.uint8).copy()
            stride = d.shape[1]
        else:
            d = np.ascontiguousarray(dst, np.uint16).copy()
            stride = d.shape[1] * 2
        c = np.ascontiguousarray(res, np.int16).copy()
        self.lib.shim_transform_add(bit_depth, ptr(d), ptr(c), log2, stride)
        return d.astype(np.int32)

    def qpel(self, src, mx, my, w, h, bit_depth=8):
        """src: padded source, region of interest starts at [3][3] (qpel needs
        3 left/top halo); returns int16 (w,h) intermediate."""
        dst = np.zeros((h, MAX_PB_SIZE), np.int16)
        if bit_depth == 8:
            s = np.ascontiguousarray(src, np.uint8)
            stride = s.shape[1]
        else:
            s = np.ascontiguousarray(src, np.uint16)
            stride = s.shape[1] * 2
        off = 3 * s.shape[1] + 3
        base = s.ctypes.data + off * (1 if bit_depth == 8 else 2)
        self.lib.shim_qpel(bit_depth, ptr(dst), ctypes.c_void_p(base),
                           ctypes.c_ssize_t(stride), h, mx, my, w)
        return dst[:, :w].astype(np.int32)

    def qpel_uni(self, src, mx, my, w, h, bit_depth=8):
        if bit_depth == 8:
            s = np.ascontiguousarray(src, np.uint8)
            dst = np.zeros((h, w), np.uint8)
            esz = 1
        else:
            s = np.ascontiguousarray(src, np.uint16)
            dst = np.zeros((h, w), np.uint16)
            esz = 2
        stride = s.shape[1] * esz
        base = s.ctypes.data + (3 * s.shape[1] + 3) * esz
        self.lib.shim_qpel_uni(bit_depth, ptr(dst), ctypes.c_ssize_t(w * esz),
                               ctypes.c_void_p(base), ctypes.c_ssize_t(stride),
                               h, mx, my, w)
        return dst.astype(np.int32)

    def qpel_bi(self, src, src2, mx, my, w, h, bit_depth=8):
        if bit_depth == 8:
            s = np.ascontiguousarray(src, np.uint8)
            dst = np.zeros((h, w), np.uint8)
            esz = 1
        else:
            s = np.ascontiguousarray(src, np.uint16)
            dst = np.zeros((h, w), np.uint16)
            esz = 2
        s2 = np.zeros((h, MAX_PB_SIZE), np.int16)
        s2[:, :w] = src2
        stride = s.shape[1] * esz
        base = s.ctypes.data + (3 * s.shape[1] + 3) * esz
        self.lib.shim_qpel_bi(bit_depth, ptr(dst), ctypes.c_ssize_t(w * esz),
                              ctypes.c_void_p(base), ctypes.c_ssize_t(stride),
                              ptr(s2), h, mx, my, w)
        return dst.astype(np.int32)

    def epel(self, src, mx, my, w, h, bit_depth=8):
        """epel halo = 1 left/top."""
        dst = np.zeros((h, MAX_PB_SIZE), np.int16)
        if bit_depth == 8:
            s = np.ascontiguousarray(src, np.uint8)
            esz = 1
        else:
            s = np.ascontiguousarray(src, np.uint16)
            esz = 2
        stride = s.shape[1] * esz
        base = s.ctypes.data + (1 * s.shape[1] + 1) * esz
        self.lib.shim_epel(bit_depth, ptr(dst), ctypes.c_void_p(base),
                           ctypes.c_ssize_t(stride), h, mx, my, w)
        return dst[:, :w].astype(np.int32)

    def epel_uni(self, src, mx, my, w, h, bit_depth=8):
        if bit_depth == 8:
            s = np.ascontiguousarray(src, np.uint8)
            dst = np.zeros((h, w), np.uint8)
            esz = 1
        else:
            s = np.ascontiguousarray(src, np.uint16)
            dst = np.zeros((h, w), np.uint16)
            esz = 2
        stride = s.shape[1] * esz
        base = s.ctypes.data + (1 * s.shape[1] + 1) * esz
        self.lib.shim_epel_uni(bit_depth, ptr(dst), ctypes.c_ssize_t(w * esz),
                               ctypes.c_void_p(base), ctypes.c_ssize_t(stride),
                               h, mx, my, w)
        return dst.astype(np.int32)

    def epel_bi(self, src, src2, mx, my, w, h, bit_depth=8):
        if bit_depth == 8:
            s = np.ascontiguousarray(src, np.uint8)
            dst = np.zeros((h, w), np.uint8)
            esz = 1
        else:
            s = np.ascontiguousarray(src, np.uint16)
            dst = np.zeros((h, w), np.uint16)
            esz = 2
        s2 = np.zeros((h, MAX_PB_SIZE), np.int16)
        s2[:, :w] = src2
        stride = s.shape[1] * esz
        base = s.ctypes.data + (1 * s.shape[1] + 1) * esz
        self.lib.shim_epel_bi(bit_depth, ptr(dst), ctypes.c_ssize_t(w * esz),
                              ctypes.c_void_p(base), ctypes.c_ssize_t(stride),
                              ptr(s2), h, mx, my, w)
        return dst.astype(np.int32)
