import numpy as np
import pytest

from openhevc_tpu.model import transforms as tr
from tests.oracle import Oracle


@pytest.fixture(scope="module")
def oracle():
    return Oracle()


def test_dct_matrix_structure():
    for n in (4, 8, 16, 32):
        m = tr.dct_matrix(n)
        assert (m[0] == 64).all()
        # even rows symmetric, odd rows antisymmetric
        assert (m[2::2, :] == m[2::2, ::-1]).all()
        assert (m[1::2, :] == -m[1::2, ::-1]).all()
    assert (tr.T4 == np.array([[64, 64, 64, 64], [83, 36, -36, -83],
                               [64, -64, -64, 64], [36, -83, 83, -36]])).all()


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("bd", [8, 10])
def test_idct_vs_oracle(oracle, n, bd):
    rng = np.random.default_rng(n * bd)
    for _ in range(20):
        coeffs = rng.integers(-32768, 32768, (n, n)).astype(np.int16)
        got = tr.idct2d(coeffs, bd)
        ref = oracle.idct(coeffs, bd)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("bd", [8, 10])
def test_idct_sparse_collimit_vs_oracle(oracle, bd):
    # sparse coefficients (only low-freq corner) exercising col_limit path
    rng = np.random.default_rng(7)
    for n in (8, 16, 32):
        for last in (0, 1, 3, 7):
            coeffs = np.zeros((n, n), np.int16)
            coeffs[:last + 1, :last + 1] = rng.integers(-255, 256, (last + 1, last + 1))
            col_limit = min(n, 2 * last + 4)
            got = tr.idct2d(coeffs, bd)
            ref = oracle.idct(coeffs, bd, col_limit=col_limit)
            np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("bd", [8, 10])
def test_idst4_vs_oracle(oracle, bd):
    rng = np.random.default_rng(3)
    for _ in range(50):
        coeffs = rng.integers(-32768, 32768, (4, 4)).astype(np.int16)
        np.testing.assert_array_equal(tr.idst4x4(coeffs, bd), oracle.idst4(coeffs, bd))


def test_idct_dc_vs_oracle(oracle):
    for n in (4, 8, 16, 32):
        for dc in (-32768, -255, -1, 0, 1, 64, 255, 32767):
            for bd in (8, 10):
                np.testing.assert_array_equal(tr.idct_dc(dc, n, bd),
                                              oracle.idct_dc(dc, n, bd))


@pytest.mark.parametrize("bd", [8, 10])
def test_transform_skip_vs_oracle(oracle, bd):
    rng = np.random.default_rng(5)
    for n in (4, 8, 16, 32):
        coeffs = rng.integers(-32768, 32768, (n, n)).astype(np.int16)
        log2 = n.bit_length() - 1
        np.testing.assert_array_equal(tr.transform_skip(coeffs, log2, bd),
                                      oracle.transform_skip(coeffs, bd))


def test_transform_rdpcm_vs_oracle(oracle):
    rng = np.random.default_rng(6)
    for n in (4, 8):
        coeffs = rng.integers(-3000, 3000, (n, n)).astype(np.int16)
        for vert in (False, True):
            np.testing.assert_array_equal(tr.transform_rdpcm(coeffs, vert),
                                          oracle.transform_rdpcm(coeffs, vert))


@pytest.mark.parametrize("bd", [8, 10])
def test_transform_add_vs_oracle(oracle, bd):
    rng = np.random.default_rng(8)
    for n in (4, 8, 16, 32):
        dst = rng.integers(0, 1 << bd, (n, n))
        res = rng.integers(-32768, 32768, (n, n)).astype(np.int16)
        np.testing.assert_array_equal(tr.transform_add(dst, res, bd),
                                      oracle.transform_add(dst, res, bd))


def test_forward_inverse_consistency():
    # fdct followed by dequant(quantize) + idct at low QP reconstructs closely
    rng = np.random.default_rng(9)
    for n in (4, 8, 16, 32):
        block = rng.integers(-100, 100, (n, n)).astype(np.int32)
        log2 = n.bit_length() - 1
        coefs = tr.fdct2d(block)
        lv = tr.quantize(coefs, 4, log2)
        deq = tr.dequant(lv, 4, log2)
        rec = tr.idct2d(deq)
        assert np.abs(rec - block).max() <= 4
