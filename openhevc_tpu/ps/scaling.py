"""Scaling lists: parse/write + ScalingFactor construction.

spec 7.3.4 scaling_list_data / 7.4.5 semantics / 8.6.3 dequant use;
reference hevc_ps.c:1389 (set_default_scaling_list_data) and
hevc_ps.c scaling_list_data().  Lists are stored raster-order per
(sizeId, matrixId); the bitstream codes them in up-right diagonal order.
"""

import numpy as np

# spec table 7-5 (sizeId 0) is flat 16; tables 7-6: default 8x8 lists
DEFAULT_INTRA_8 = np.array([
    16, 16, 16, 16, 17, 18, 21, 24,
    16, 16, 16, 16, 17, 19, 22, 25,
    16, 16, 17, 18, 20, 22, 25, 29,
    16, 16, 18, 21, 24, 27, 31, 36,
    17, 17, 20, 24, 30, 35, 41, 47,
    18, 19, 22, 27, 35, 44, 54, 65,
    21, 22, 25, 31, 41, 54, 70, 88,
    24, 25, 29, 36, 47, 65, 88, 115], np.int32)

DEFAULT_INTER_8 = np.array([
    16, 16, 16, 16, 17, 18, 20, 24,
    16, 16, 16, 17, 18, 20, 24, 25,
    16, 16, 17, 18, 20, 24, 25, 28,
    16, 17, 18, 20, 24, 25, 28, 33,
    17, 18, 20, 24, 25, 28, 33, 41,
    18, 20, 24, 25, 28, 33, 41, 54,
    20, 24, 25, 28, 33, 41, 54, 71,
    24, 25, 28, 33, 41, 54, 71, 91], np.int32)


def _diag_order(n):
    """Up-right diagonal scan positions (spec 6.5.3) as raster indices."""
    out = []
    i, x, y = 0, 0, 0
    while i < n * n:
        while y >= 0:
            if x < n and y < n:
                out.append(y * n + x)
                i += 1
            y -= 1
            x += 1
        y = x
        x = 0
    return out

_DIAG4 = _diag_order(4)
_DIAG8 = _diag_order(8)


class ScalingList:
    """sl[sizeId][matrixId] raster lists (16 or 64 entries) + 16/32 DC."""

    def __init__(self):
        self.sl = [np.zeros((6, 16), np.int32)] + \
            [np.zeros((6, 64), np.int32) for _ in range(3)]
        self.sl_dc = np.full((2, 6), 16, np.int32)
        self.set_defaults()

    def set_defaults(self):
        self.sl[0][:] = 16
        for size_id in (1, 2, 3):
            for m in range(6):
                self.sl[size_id][m] = (DEFAULT_INTRA_8 if m < 3
                                       else DEFAULT_INTER_8)
        self.sl_dc[:] = 16

    def is_default(self, size_id, matrix_id):
        want = (np.full(16, 16, np.int32) if size_id == 0 else
                (DEFAULT_INTRA_8 if matrix_id < 3 else DEFAULT_INTER_8))
        if not np.array_equal(self.sl[size_id][matrix_id], want):
            return False
        if size_id > 1 and self.sl_dc[size_id - 2][matrix_id] != 16:
            return False
        return True


def parse_scaling_list(r, chroma_format_idc=1) -> ScalingList:
    """scaling_list_data() (reference hevc_ps.c; defaults pre-filled)."""
    sl = ScalingList()
    for size_id in range(4):
        for matrix_id in range(0, 6, 3 if size_id == 3 else 1):
            if not r.u1():                       # scaling_list_pred_mode_flag
                delta = r.ue()
                if delta:
                    if matrix_id < delta:
                        raise ValueError("invalid scaling list delta")
                    sl.sl[size_id][matrix_id] = \
                        sl.sl[size_id][matrix_id - delta].copy()
                    if size_id > 1:
                        sl.sl_dc[size_id - 2][matrix_id] = \
                            sl.sl_dc[size_id - 2][matrix_id - delta]
                # delta == 0: keep default (already filled)
            else:
                next_coef = 8
                coef_num = min(64, 1 << (4 + (size_id << 1)))
                if size_id > 1:
                    next_coef = r.se() + 8
                    sl.sl_dc[size_id - 2][matrix_id] = next_coef
                order = _DIAG4 if size_id == 0 else _DIAG8
                for i in range(coef_num):
                    next_coef = (next_coef + r.se() + 256) % 256
                    sl.sl[size_id][matrix_id][order[i]] = next_coef
    if chroma_format_idc == 3:
        for m in (1, 2, 4, 5):
            sl.sl[3][m] = sl.sl[2][m].copy()
            sl.sl_dc[1][m] = sl.sl_dc[0][m]
    return sl


def write_scaling_list(w, sl: ScalingList):
    """Inverse of parse_scaling_list (explicit coding unless default)."""
    for size_id in range(4):
        for matrix_id in range(0, 6, 3 if size_id == 3 else 1):
            if sl.is_default(size_id, matrix_id):
                w.u1(0)                          # pred from default
                w.ue(0)
                continue
            w.u1(1)
            coef_num = min(64, 1 << (4 + (size_id << 1)))
            next_coef = 8
            if size_id > 1:
                dc = int(sl.sl_dc[size_id - 2][matrix_id])
                w.se(dc - 8)
                next_coef = dc
            order = _DIAG4 if size_id == 0 else _DIAG8
            for i in range(coef_num):
                cur = int(sl.sl[size_id][matrix_id][order[i]])
                delta = ((cur - next_coef + 128) % 256) - 128
                w.se(delta)
                next_coef = cur


def build_scaling_factors(sl: ScalingList):
    """-> {(log2n, matrix_id): (n, n) int32} full-size factor matrices.

    16x16/32x32 upsample the stored 8x8 by pixel repetition with the DC
    coefficient injected at (0,0) (reference hevc_cabac.c:1820 pos mapping).
    """
    out = {}
    for m in range(6):
        out[(2, m)] = sl.sl[0][m].reshape(4, 4).copy()
        out[(3, m)] = sl.sl[1][m].reshape(8, 8).copy()
        for size_id, log2n in ((2, 4), (3, 5)):
            rep = 1 << (log2n - 3)
            f = np.repeat(np.repeat(sl.sl[size_id][m].reshape(8, 8),
                                    rep, 0), rep, 1)
            f[0, 0] = sl.sl_dc[size_id - 2][m]
            out[(log2n, m)] = f
    return out
