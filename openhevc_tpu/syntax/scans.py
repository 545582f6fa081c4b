"""Coefficient scan orders (spec 6.5.3/6.5.4).

All scans are coefficient-group structured: the block is covered by 4x4
sub-blocks (CGs) visited in cg_scan order, and coefficients inside each CG
follow coeff_scan.  Forward order: index 0 = DC.  Residual coding processes
subsets/coefficients in reverse.  Matches the reference tables
(hevc_cabac.c:410-533).
"""

import numpy as np

SCAN_DIAG = 0
SCAN_HORIZ = 1
SCAN_VERT = 2


def diag_scan(n: int):
    """Up-right diagonal scan order for an n x n block -> [(x, y), ...]."""
    out = []
    x = y = 0
    while len(out) < n * n:
        while y >= 0:
            if x < n and y < n:
                out.append((x, y))
            y -= 1
            x += 1
        y = x
        x = 0
    return out


def horiz_scan(n: int):
    return [(x, y) for y in range(n) for x in range(n)]


def vert_scan(n: int):
    return [(x, y) for x in range(n) for y in range(n)]


_SCAN_FN = {SCAN_DIAG: diag_scan, SCAN_HORIZ: horiz_scan, SCAN_VERT: vert_scan}

_cache = {}


def select_scans(scan_idx: int, log2_size: int):
    """-> (coeff_scan[16], cg_scan[ncg*ncg], full_inv[size][size]).

    full_inv[y][x] = forward scan index of coefficient (x, y) in the
    cg-structured scan (== reference's num_coeff derivation).
    """
    key = (scan_idx, log2_size)
    if key in _cache:
        return _cache[key]
    size = 1 << log2_size
    ncg = max(1, size >> 2)
    coeff = _SCAN_FN[scan_idx](4)
    cg = _SCAN_FN[scan_idx](ncg) if ncg > 1 else [(0, 0)]
    inv = np.zeros((size, size), np.int32)
    i = 0
    for cx, cy in cg:
        for x, y in coeff:
            inv[(cy << 2) + y, (cx << 2) + x] = i
            i += 1
    _cache[key] = (coeff, cg, inv)
    return _cache[key]


def scan_index_for_intra(mode: int, log2_size: int, c_idx: int,
                         chroma_format_idc: int = 1) -> int:
    """Mode-dependent scan selection (spec 7.4.9.11)."""
    if log2_size == 2 or (log2_size == 3 and (c_idx == 0 or chroma_format_idc == 3)):
        if 6 <= mode <= 14:
            return SCAN_VERT
        if 22 <= mode <= 30:
            return SCAN_HORIZ
    return SCAN_DIAG
