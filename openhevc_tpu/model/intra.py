"""Exact-integer scalar model of HEVC intra prediction.

Mirrors spec 8.4.4.2 and the reference template intra_pred / pred_planar /
pred_dc / pred_angular (libavcodec/hevcpred_template.c:30-537).

Reference arrays are held as length 2N+1 vectors with a +1 offset:
arr[0] == p[-1] (corner), arr[1 + i] == p[i], i in [0, 2N).
Constrained-intra-pred substitution is not modeled yet (CIP off).
"""

import numpy as np

INTRA_PLANAR = 0
INTRA_DC = 1
INTRA_ANGULAR_HOR = 10
INTRA_ANGULAR_VER = 26

INTRA_PRED_ANGLE = (32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21,
                    -26, -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13,
                    17, 21, 26, 32)
INV_ANGLE = (-4096, -1638, -910, -630, -482, -390, -315, -256, -315, -390,
             -482, -630, -910, -1638, -4096)


def build_reference_samples(plane: np.ndarray, x: int, y: int, size: int,
                            cand_bottom_left: bool, cand_left: bool,
                            cand_up_left: bool, cand_up: bool,
                            cand_up_right: bool, bottom_left_size: int,
                            top_right_size: int, bit_depth: int = 8):
    """Gather + substitute reference samples from a reconstructed plane.

    Returns (top, left), each length 2N+1 with the +1 offset layout.
    bottom_left_size/top_right_size bound in-picture sample counts (may be
    less than size at frame edges); remaining samples replicate.
    """
    n = size
    top = np.zeros(2 * n + 1, np.int32)
    left = np.zeros(2 * n + 1, np.int32)

    if cand_up_left:
        left[0] = top[0] = plane[y - 1, x - 1]
    if cand_up:
        top[1:1 + n] = plane[y - 1, x:x + n]
    if cand_up_right:
        trs = top_right_size
        top[1 + n:1 + n + trs] = plane[y - 1, x + n:x + n + trs]
        top[1 + n + trs:1 + 2 * n] = plane[y - 1, x + n + trs - 1]
    if cand_left:
        left[1:1 + n] = plane[y:y + n, x - 1]
    if cand_bottom_left:
        bls = bottom_left_size
        left[1 + n:1 + n + bls] = plane[y + n:y + n + bls, x - 1]
        left[1 + n + bls:1 + 2 * n] = plane[y + n + bls - 1, x - 1]

    # substitution for unavailable segments (hevcpred_template.c:251-287)
    if not cand_bottom_left:
        if cand_left:
            left[1 + n:] = left[n]
        elif cand_up_left:
            left[1:] = left[0]
            cand_left = True
        elif cand_up:
            left[0] = top[1]
            left[1:] = left[0]
            cand_up_left = True
            cand_left = True
        elif cand_up_right:
            top[1:1 + n] = top[1 + n]
            left[0] = top[1 + n]
            left[1:] = left[0]
            cand_up = True
            cand_up_left = True
            cand_left = True
        else:
            mid = 1 << (bit_depth - 1)
            left[:] = mid
            top[:] = mid
            return top, left

    if not cand_left:
        left[1:1 + n] = left[1 + n]
    if not cand_up_left:
        left[0] = left[1]
    if not cand_up:
        top[1:1 + n] = left[0]
    if not cand_up_right:
        top[1 + n:] = top[n]
    top[0] = left[0]
    return top, left


def filter_reference_samples(top: np.ndarray, left: np.ndarray, mode: int,
                             size: int, c_idx: int, bit_depth: int = 8,
                             strong_intra_smoothing: bool = False,
                             chroma_444: bool = False):
    """[1 2 1] / strong smoothing of reference samples (spec 8.4.4.2.3)."""
    if c_idx != 0 and not chroma_444:
        return top, left
    if mode == INTRA_DC or size == 4:
        return top, left
    thresh = (7, 1, 0)[size.bit_length() - 1 - 3]
    min_dist = min(abs(mode - 26), abs(mode - 10))
    if min_dist <= thresh:
        return top, left
    n = size
    if (strong_intra_smoothing and c_idx == 0 and n == 32 and
            abs(int(top[0]) + int(top[64]) - 2 * int(top[32])) < (1 << (bit_depth - 5)) and
            abs(int(left[0]) + int(left[64]) - 2 * int(left[32])) < (1 << (bit_depth - 5))):
        ftop = top.copy()
        fleft = left.copy()
        i = np.arange(63)
        ftop[1:64] = ((64 - (i + 1)) * int(top[0]) + (i + 1) * int(top[64]) + 32) >> 6
        fleft[1:64] = ((64 - (i + 1)) * int(left[0]) + (i + 1) * int(left[64]) + 32) >> 6
        return ftop, fleft
    ftop = top.copy()
    fleft = left.copy()
    # arr index k in [1, 2n-1] smoothed with neighbors; arr[2n] kept;
    # corner from (left[1], corner, top[1])
    ftop[1:2 * n] = (top[2:2 * n + 1] + 2 * top[1:2 * n] + top[0:2 * n - 1] + 2) >> 2
    fleft[1:2 * n] = (left[2:2 * n + 1] + 2 * left[1:2 * n] + left[0:2 * n - 1] + 2) >> 2
    corner = (int(left[1]) + 2 * int(left[0]) + int(top[1]) + 2) >> 2
    ftop[0] = corner
    fleft[0] = corner
    return ftop, fleft


def pred_planar(top: np.ndarray, left: np.ndarray, size: int) -> np.ndarray:
    n = size
    log2 = n.bit_length() - 1
    xs = np.arange(n)
    ys = np.arange(n)
    t = top[1:1 + n].astype(np.int32)
    l = left[1:1 + n].astype(np.int32)
    tr = int(top[1 + n])      # top[size]
    bl = int(left[1 + n])     # left[size]
    out = ((n - 1 - xs)[None, :] * l[:, None] + (xs + 1)[None, :] * tr +
           (n - 1 - ys)[:, None] * t[None, :] + (ys + 1)[:, None] * bl + n)
    return (out >> (log2 + 1)).astype(np.int32)


def pred_dc(top: np.ndarray, left: np.ndarray, size: int, c_idx: int) -> np.ndarray:
    n = size
    log2 = n.bit_length() - 1
    dc = (int(top[1:1 + n].sum()) + int(left[1:1 + n].sum()) + n) >> (log2 + 1)
    out = np.full((n, n), dc, np.int32)
    if c_idx == 0 and n < 32:
        out[0, 0] = (int(left[1]) + 2 * dc + int(top[1]) + 2) >> 2
        out[0, 1:] = (top[2:1 + n].astype(np.int32) + 3 * dc + 2) >> 2
        out[1:, 0] = (left[2:1 + n].astype(np.int32) + 3 * dc + 2) >> 2
    return out


def pred_angular(top: np.ndarray, left: np.ndarray, size: int, c_idx: int,
                 mode: int, bit_depth: int = 8) -> np.ndarray:
    n = size
    angle = INTRA_PRED_ANGLE[mode - 2]
    out = np.zeros((n, n), np.int32)
    maxval = (1 << bit_depth) - 1

    if mode >= 18:
        main, side = top, left
    else:
        main, side = left, top

    # build extended reference: ref[k] for k in [-n .. 2n-1], ref[k]=main[k-1+1]
    # stored with offset n+1: refa[n+1+k] == ref[k] where ref[x] = main_ptr[x],
    # main_ptr = main - 1 => ref[x] = main[x] in +1 layout shifted.
    refa = np.zeros(3 * n + 2, np.int32)
    OFF = n + 1
    # ref = main - 1: ref[x] == (main-1)[x] == main array element [x] in +1 layout
    refa[OFF:OFF + 2 * n + 1] = main[0:2 * n + 1]
    last = (n * angle) >> 5
    if angle < 0 and last < -1:
        inv = INV_ANGLE[mode - 11]
        for x in range(last, 0):
            refa[OFF + x] = side[(-1 + ((x * inv + 128) >> 8)) + 1]

    if mode >= 18:
        for yy in range(n):
            idx = ((yy + 1) * angle) >> 5
            fact = ((yy + 1) * angle) & 31
            seg = refa[OFF + idx + 1: OFF + idx + 1 + n + 1]
            if fact:
                out[yy, :] = ((32 - fact) * seg[:n] + fact * seg[1:n + 1] + 16) >> 5
            else:
                out[yy, :] = seg[:n]
        if mode == 26 and c_idx == 0 and n < 32:
            corr = int(top[1]) + ((left[1:1 + n].astype(np.int32) - int(left[0])) >> 1)
            out[:, 0] = np.clip(corr, 0, maxval)
    else:
        for xx in range(n):
            idx = ((xx + 1) * angle) >> 5
            fact = ((xx + 1) * angle) & 31
            seg = refa[OFF + idx + 1: OFF + idx + 1 + n + 1]
            if fact:
                out[:, xx] = ((32 - fact) * seg[:n] + fact * seg[1:n + 1] + 16) >> 5
            else:
                out[:, xx] = seg[:n]
        if mode == 10 and c_idx == 0 and n < 32:
            corr = int(left[1]) + ((top[1:1 + n].astype(np.int32) - int(top[0])) >> 1)
            out[0, :] = np.clip(corr, 0, maxval)
    return out


def predict(mode: int, top: np.ndarray, left: np.ndarray, size: int,
            c_idx: int, bit_depth: int = 8) -> np.ndarray:
    if mode == INTRA_PLANAR:
        return pred_planar(top, left, size)
    if mode == INTRA_DC:
        return pred_dc(top, left, size, c_idx)
    return pred_angular(top, left, size, c_idx, mode, bit_depth)
