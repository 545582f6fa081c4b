import ctypes

import numpy as np
import pytest

from openhevc_tpu.model import filters as flt
from tests.oracle import load, ptr


class SAOParams(ctypes.Structure):
    _fields_ = [("offset_abs", ctypes.c_uint8 * 4 * 3),
                ("offset_sign", ctypes.c_uint8 * 4 * 3),
                ("band_position", ctypes.c_uint8 * 3),
                ("offset_val", ctypes.c_int16 * 5 * 3),
                ("eo_class", ctypes.c_uint8 * 3),
                ("type_idx", ctypes.c_uint8 * 3)]


@pytest.fixture(scope="module")
def lib():
    return load()


def _lf_luma_oracle(lib, patch, beta, tc, no_p, no_q, bd, horiz):
    if bd == 8:
        buf = np.ascontiguousarray(patch, np.uint8).copy()
        esz = 1
    else:
        buf = np.ascontiguousarray(patch, np.uint16).copy()
        esz = 2
    if horiz:
        buf = np.ascontiguousarray(buf.T)   # rows become columns
        off = 4 * buf.shape[1] * esz        # pix points at first Q row
    else:
        off = 4 * esz                       # pix points at Q0 column
    stride = buf.shape[1] * esz
    tc_arr = (ctypes.c_int * 2)(*tc)
    np_arr = (ctypes.c_uint8 * 2)(*no_p)
    nq_arr = (ctypes.c_uint8 * 2)(*no_q)
    base = ctypes.c_void_p(buf.ctypes.data + off)
    lib.shim_lf_luma(bd, 1 if horiz else 0, base, ctypes.c_ssize_t(stride),
                     beta, tc_arr, np_arr, nq_arr)
    return (buf.T if horiz else buf).astype(np.int32)


@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("horiz", [False, True])
def test_deblock_luma_vs_oracle(lib, bd, horiz):
    rng = np.random.default_rng(10 + bd + horiz)
    for trial in range(200):
        base = rng.integers(0, 1 << bd)
        noise = rng.integers(0, max(2, trial % 64), (8, 8))
        patch = np.clip(base + noise, 0, (1 << bd) - 1)
        beta = int(flt.BETA_TABLE[rng.integers(16, 52)])
        tc = [int(flt.TC_TABLE[rng.integers(18, 54)]) for _ in range(2)]
        no_p = [int(rng.integers(0, 2)) for _ in range(2)]
        no_q = [int(rng.integers(0, 2)) for _ in range(2)]
        got = flt.deblock_luma(patch, beta, tc, no_p, no_q, bd)
        ref = _lf_luma_oracle(lib, patch, beta, tc, no_p, no_q, bd, horiz)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("bd", [8, 10])
def test_deblock_chroma_vs_oracle(lib, bd):
    rng = np.random.default_rng(20 + bd)
    for trial in range(200):
        patch = rng.integers(0, 1 << bd, (8, 4))
        tc = [int(flt.TC_TABLE[rng.integers(18, 54)]) for _ in range(2)]
        no_p = [int(rng.integers(0, 2)) for _ in range(2)]
        no_q = [int(rng.integers(0, 2)) for _ in range(2)]
        got = flt.deblock_chroma(patch, tc, no_p, no_q, bd)
        if bd == 8:
            buf = np.ascontiguousarray(patch, np.uint8).copy()
            esz = 1
        else:
            buf = np.ascontiguousarray(patch, np.uint16).copy()
            esz = 2
        tc_arr = (ctypes.c_int * 2)(*tc)
        np_arr = (ctypes.c_uint8 * 2)(*no_p)
        nq_arr = (ctypes.c_uint8 * 2)(*no_q)
        base = ctypes.c_void_p(buf.ctypes.data + 2 * esz)
        lib.shim_lf_chroma(bd, 0, base, ctypes.c_ssize_t(4 * esz),
                           tc_arr, np_arr, nq_arr)
        np.testing.assert_array_equal(got, buf.astype(np.int32))


@pytest.mark.parametrize("bd", [8, 10])
def test_sao_band_vs_oracle(lib, bd):
    rng = np.random.default_rng(30 + bd)
    for _ in range(50):
        w, h = 16, 16
        src = rng.integers(0, 1 << bd, (h, w))
        offsets = [int(rng.integers(-7, 8)) for _ in range(4)]
        band_pos = int(rng.integers(0, 32))
        got = flt.sao_band(src, offsets, band_pos, bd)

        sao = SAOParams()
        sao.band_position[0] = band_pos
        for k in range(4):
            sao.offset_val[0][k + 1] = offsets[k] << (bd - 8)
        esz = 1 if bd == 8 else 2
        srcb = np.ascontiguousarray(src, np.uint8 if bd == 8 else np.uint16)
        dstb = np.zeros_like(srcb)
        borders = (ctypes.c_int * 4)(0, 0, 0, 0)
        lib.shim_sao_band(bd, ptr(dstb), ptr(srcb),
                          ctypes.c_ssize_t(w * esz), ctypes.c_ssize_t(w * esz),
                          ctypes.byref(sao), borders, w, h, 0)
        # reference applies offsets shifted by (bd-8) externally
        ref = dstb.astype(np.int32)
        shifted = flt.sao_band(src, [o << (bd - 8) for o in offsets], band_pos, bd)
        np.testing.assert_array_equal(shifted, ref)


@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("eo", [0, 1, 2, 3])
def test_sao_edge_core_vs_oracle(lib, bd, eo):
    rng = np.random.default_rng(40 + bd + eo)
    w, h = 16, 16
    for _ in range(30):
        src = rng.integers(0, 1 << bd, (h + 2, w + 2))
        offsets = [0] + [int(rng.integers(-7, 8)) << (bd - 8) for _ in range(4)]
        got = flt.sao_edge(src, offsets, eo, bd)

        sao = SAOParams()
        sao.eo_class[0] = eo
        for k in range(5):
            sao.offset_val[0][k] = offsets[k]
        esz = 1 if bd == 8 else 2
        full = np.ascontiguousarray(src, np.uint8 if bd == 8 else np.uint16)
        dstb = np.zeros((h, w), np.uint8 if bd == 8 else np.uint16)
        borders = (ctypes.c_int * 4)(0, 0, 0, 0)
        edges = (ctypes.c_uint8 * 2)(0, 0)
        diag = (ctypes.c_uint8 * 4)(0, 0, 0, 0)
        base = ctypes.c_void_p(full.ctypes.data + (full.shape[1] + 1) * esz)
        lib.shim_sao_edge(bd, 0, ptr(dstb), base,
                          ctypes.c_ssize_t(w * esz),
                          ctypes.c_ssize_t(full.shape[1] * esz),
                          ctypes.byref(sao), borders, w, h, 0,
                          edges, edges, diag)
        np.testing.assert_array_equal(got, dstb.astype(np.int32))
