"""Exact-integer scalar model of the HEVC transform path (NumPy).

This is the semantic contract for the TPU kernels and the reconstruction
model used by the test-stream encoder.  Behavior matches the reference
templates (libavcodec/hevcdsp_template.c:114-338) and spec 8.6:

  inverse:  tmp = clip16((T^t @ C  + 64) >> 7)          per column
            res = clip16((tmp @ T + add) >> (20 - BD))  per row
  dequant:  clip16((level * scale * m + add) >> (BD + log2_size - 5))
"""

import numpy as np

# basis value table c[u] ~ 64*sqrt(2)*cos(u*pi/64), hand-tuned per spec 8.6.4
_C = (64, 90, 90, 90, 89, 88, 87, 85, 83, 82, 80, 78, 75, 73, 70, 67,
      64, 61, 57, 54, 50, 46, 43, 38, 36, 31, 25, 22, 18, 13, 9, 4)


def _basis(u: int) -> int:
    u %= 128
    if u < 32:
        return _C[u]
    if u < 64:
        return -_C[64 - u]
    if u < 96:
        return -_C[u - 64]
    return _C[128 - u]


def dct_matrix(n: int) -> np.ndarray:
    """HEVC integer DCT matrix T_n (row k = basis k), n in {4,8,16,32}."""
    step = 32 // n
    return np.array([[_basis(k * (2 * j + 1) * step) for j in range(n)]
                     for k in range(n)], np.int32)


T4, T8, T16, T32 = dct_matrix(4), dct_matrix(8), dct_matrix(16), dct_matrix(32)
T = {4: T4, 8: T8, 16: T16, 32: T32}

# DST-VII for 4x4 intra luma (spec 8.6.4.1)
TDST4 = np.array([[29, 55, 74, 84],
                  [74, 74, 0, -74],
                  [84, -29, -74, 55],
                  [55, -84, 74, -29]], np.int32)

LEVEL_SCALE = np.array([40, 45, 51, 57, 64, 72], np.int32)


def clip16(x):
    return np.clip(x, -32768, 32767)


def clip_pixel(x, bit_depth: int):
    return np.clip(x, 0, (1 << bit_depth) - 1)


def _inv_1d(mat: np.ndarray, coeffs: np.ndarray, shift: int) -> np.ndarray:
    """One inverse stage: out = clip16((mat^T @ coeffs + add) >> shift)."""
    add = 1 << (shift - 1)
    acc = mat.T.astype(np.int64) @ coeffs.astype(np.int64)
    return clip16((acc + add) >> shift)


def idct2d(coeffs: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    """Full 2-D inverse DCT, any square size 4..32. coeffs[y_freq][x_freq]."""
    n = coeffs.shape[0]
    mat = T[n]
    tmp = _inv_1d(mat, coeffs, 7)                       # columns (vertical)
    res = _inv_1d(mat, tmp.T, 20 - bit_depth).T         # rows (horizontal)
    return res.astype(np.int32)


def idst4x4(coeffs: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    tmp = _inv_1d(TDST4, coeffs, 7)
    return _inv_1d(TDST4, tmp.T, 20 - bit_depth).T.astype(np.int32)


def idct_dc(dc: int, n: int, bit_depth: int = 8) -> np.ndarray:
    # at bit_depth 14 shift is 0: add must drop out (the reference's
    # "1 << -1" is UB whose int16-truncated result equals add = 0, and the
    # full-IDCT path it shortcuts gives the same (dc + 1) >> 1)
    shift = 14 - bit_depth
    add = (1 << (shift - 1)) if shift > 0 else 0
    coeff = (((int(dc) + 1) >> 1) + add) >> shift
    return np.full((n, n), coeff, np.int32)


def transform_skip(coeffs: np.ndarray, log2_size: int, bit_depth: int = 8) -> np.ndarray:
    shift = 15 - bit_depth - log2_size
    c = coeffs.astype(np.int32)
    if shift > 0:
        return (c + (1 << (shift - 1))) >> shift
    return c << -shift


def transform_rdpcm(coeffs: np.ndarray, vertical: bool) -> np.ndarray:
    """Cumulative-sum residual DPCM (int16 wraparound like the reference)."""
    c = coeffs.astype(np.int16)
    axis = 0 if vertical else 1
    return np.cumsum(c, axis=axis, dtype=np.int64).astype(np.int16).astype(np.int32)


def dequant(levels: np.ndarray, qp: int, log2_size: int, bit_depth: int = 8,
            scale_matrix=None, dc_scale: int = 16) -> np.ndarray:
    """Scaling process (spec 8.6.3; reference hevc_cabac.c:1416-1501,1868)."""
    shift = bit_depth + log2_size - 5
    add = 1 << (shift - 1)
    scale = int(LEVEL_SCALE[qp % 6]) << (qp // 6)
    lv = levels.astype(np.int64)
    if scale_matrix is None:
        out = (lv * scale * 16 + add) >> shift
    else:
        m = scale_matrix.astype(np.int64)
        out = (lv * scale * m + add) >> shift
        if log2_size >= 4:
            out[0, 0] = (lv[0, 0] * scale * dc_scale + add) >> shift
    return clip16(out).astype(np.int32)


def transform_add(dst: np.ndarray, res: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    return clip_pixel(dst.astype(np.int32) + clip16(res), bit_depth)


# ---------------------------------------------------------------------------
# forward path (test-stream encoder only; HM-style shifts)
# ---------------------------------------------------------------------------

def fdct2d(block: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    """Forward transform: C = (T @ block @ T^t) with HM two-stage shifts."""
    n = block.shape[0]
    log2n = n.bit_length() - 1
    mat = T[n].astype(np.int64)
    shift1 = log2n + bit_depth - 9
    shift2 = log2n + 6
    tmp = (mat @ block.astype(np.int64) + (1 << (shift1 - 1))) >> shift1
    out = (tmp @ mat.T + (1 << (shift2 - 1))) >> shift2
    return out.astype(np.int32)


def fdst4x4(block: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    mat = TDST4.astype(np.int64)
    shift1 = 2 + bit_depth - 9
    shift2 = 8
    tmp = (mat @ block.astype(np.int64) + (1 << (shift1 - 1)) if shift1 > 0
           else mat @ block.astype(np.int64))
    tmp = tmp >> shift1 if shift1 > 0 else tmp << -shift1
    out = (tmp @ mat.T + (1 << (shift2 - 1))) >> shift2
    return out.astype(np.int32)


QUANT_SCALE = np.array([26214, 23302, 20560, 18396, 16384, 14564], np.int64)


def quantize(coefs: np.ndarray, qp: int, log2_size: int, bit_depth: int = 8) -> np.ndarray:
    """Plain dead-zone quantizer (HM-style shifts, no RDOQ).

    Levels are clipped to the entropy-coding range [-32768, 32767].
    """
    q_bits = 29 + qp // 6 - bit_depth - log2_size
    offset = 171 << (q_bits - 9)            # ~1/3 deadzone (intra default)
    c = coefs.astype(np.int64)
    level = (np.abs(c) * QUANT_SCALE[qp % 6] + offset) >> q_bits
    return clip16(np.sign(c) * level).astype(np.int32)
