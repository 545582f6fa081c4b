import numpy as np
import pytest

from openhevc_tpu.model import mc
from tests.oracle import Oracle


@pytest.fixture(scope="module")
def oracle():
    return Oracle()


SIZES = [(4, 8), (8, 4), (8, 8), (16, 16), (12, 16), (32, 24), (64, 64)]


@pytest.mark.parametrize("bd", [8, 10])
def test_qpel_vs_oracle(oracle, bd):
    rng = np.random.default_rng(bd)
    for w, h in SIZES:
        src = rng.integers(0, 1 << bd, (h + 7 + 8, w + 7 + 8))
        win = src[:h + 7, :w + 7]
        for mx in range(4):
            for my in range(4):
                got = mc.qpel(win, mx, my, w, h, bd)
                ref = oracle.qpel(win, mx, my, w, h, bd)
                np.testing.assert_array_equal(got, ref, err_msg=f"{w}x{h} mx={mx} my={my}")


@pytest.mark.parametrize("bd", [8, 10])
def test_qpel_uni_bi_vs_oracle(oracle, bd):
    rng = np.random.default_rng(bd + 100)
    for w, h in SIZES[:5]:
        src = rng.integers(0, 1 << bd, (h + 7, w + 7))
        src2 = rng.integers(-20000, 20000, (h, w))
        for mx, my in [(0, 0), (1, 0), (0, 2), (3, 3)]:
            val = mc.qpel(src, mx, my, w, h, bd)
            np.testing.assert_array_equal(mc.mc_uni(val, bd),
                                          oracle.qpel_uni(src, mx, my, w, h, bd))
            np.testing.assert_array_equal(mc.mc_bi(val, src2, bd),
                                          oracle.qpel_bi(src, src2, mx, my, w, h, bd))


@pytest.mark.parametrize("bd", [8, 10])
def test_epel_vs_oracle(oracle, bd):
    rng = np.random.default_rng(bd + 7)
    for w, h in [(2, 4), (4, 4), (8, 8), (16, 12), (32, 32)]:
        src = rng.integers(0, 1 << bd, (h + 3, w + 3))
        for mx in range(8):
            for my in range(8):
                got = mc.epel(src, mx, my, w, h, bd)
                ref = oracle.epel(src, mx, my, w, h, bd)
                np.testing.assert_array_equal(got, ref, err_msg=f"{w}x{h} mx={mx} my={my}")


@pytest.mark.parametrize("bd", [8, 10])
def test_epel_uni_bi_vs_oracle(oracle, bd):
    rng = np.random.default_rng(bd + 13)
    for w, h in [(4, 4), (8, 8), (16, 16)]:
        src = rng.integers(0, 1 << bd, (h + 3, w + 3))
        src2 = rng.integers(-20000, 20000, (h, w))
        for mx, my in [(0, 0), (4, 0), (0, 7), (3, 5)]:
            val = mc.epel(src, mx, my, w, h, bd)
            np.testing.assert_array_equal(mc.mc_uni(val, bd),
                                          oracle.epel_uni(src, mx, my, w, h, bd))
            np.testing.assert_array_equal(mc.mc_bi(val, src2, bd),
                                          oracle.epel_bi(src, src2, mx, my, w, h, bd))
