"""Exact-integer scalar model of HEVC in-loop filters (deblock + SAO).

Matches reference templates hevc_loop_filter_{luma,chroma} and
sao_{band,edge}_filter (libavcodec/hevcdsp_template.c:340-600,1629-1790)
and spec 8.7.

Deblock edge segment layout: `patch` is an (8, 8) window centered on the
edge; for a vertical edge, columns 0..3 are P3..P0 and 4..7 are Q0..Q3 with
8 filtered rows (two 4-row half-segments). Horizontal edges pass the
transposed window.
"""

import numpy as np

BETA_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 11, 12,
    13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34, 36, 38, 40, 42,
    44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64], np.int32)

TC_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11,
    13, 14, 16, 18, 20, 22, 24], np.int32)


def _clip(x, lo, hi):
    return max(lo, min(hi, x))


def deblock_luma(patch: np.ndarray, beta: int, tc: list, no_p: list,
                 no_q: list, bit_depth: int = 8) -> np.ndarray:
    """Filter one 8-line luma edge segment. patch (8,8) int; returns filtered."""
    pix = patch.astype(np.int64).copy()
    maxval = (1 << bit_depth) - 1
    beta <<= bit_depth - 8

    for j in range(2):
        r = 4 * j                      # first row of half-segment
        P = lambda row, i: int(pix[r + row, 3 - i])
        Q = lambda row, i: int(pix[r + row, 4 + i])
        dp0 = abs(P(0, 2) - 2 * P(0, 1) + P(0, 0))
        dq0 = abs(Q(0, 2) - 2 * Q(0, 1) + Q(0, 0))
        dp3 = abs(P(3, 2) - 2 * P(3, 1) + P(3, 0))
        dq3 = abs(Q(3, 2) - 2 * Q(3, 1) + Q(3, 0))
        d0, d3 = dp0 + dq0, dp3 + dq3
        tcj = tc[j] << (bit_depth - 8)
        if d0 + d3 >= beta:
            continue
        beta_3, beta_2 = beta >> 3, beta >> 2
        tc25 = (tcj * 5 + 1) >> 1
        strong = (abs(P(0, 3) - P(0, 0)) + abs(Q(0, 3) - Q(0, 0)) < beta_3 and
                  abs(P(0, 0) - Q(0, 0)) < tc25 and
                  abs(P(3, 3) - P(3, 0)) + abs(Q(3, 3) - Q(3, 0)) < beta_3 and
                  abs(P(3, 0) - Q(3, 0)) < tc25 and
                  (d0 << 1) < beta_2 and (d3 << 1) < beta_2)
        if strong:
            tc2 = tcj << 1
            for d in range(4):
                p3, p2, p1, p0 = (P(d, 3), P(d, 2), P(d, 1), P(d, 0))
                q0, q1, q2, q3 = (Q(d, 0), Q(d, 1), Q(d, 2), Q(d, 3))
                if not no_p[j]:
                    pix[r + d, 3] = p0 + _clip(((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3) - p0, -tc2, tc2)
                    pix[r + d, 2] = p1 + _clip(((p2 + p1 + p0 + q0 + 2) >> 2) - p1, -tc2, tc2)
                    pix[r + d, 1] = p2 + _clip(((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3) - p2, -tc2, tc2)
                if not no_q[j]:
                    pix[r + d, 4] = q0 + _clip(((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3) - q0, -tc2, tc2)
                    pix[r + d, 5] = q1 + _clip(((p0 + q0 + q1 + q2 + 2) >> 2) - q1, -tc2, tc2)
                    pix[r + d, 6] = q2 + _clip(((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3) - q2, -tc2, tc2)
        else:
            nd_p = 2 if dp0 + dp3 < ((beta + (beta >> 1)) >> 3) else 1
            nd_q = 2 if dq0 + dq3 < ((beta + (beta >> 1)) >> 3) else 1
            tc_2 = tcj >> 1
            for d in range(4):
                p2, p1, p0 = P(d, 2), P(d, 1), P(d, 0)
                q0, q1, q2 = Q(d, 0), Q(d, 1), Q(d, 2)
                delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
                if abs(delta0) < 10 * tcj:
                    delta0 = _clip(delta0, -tcj, tcj)
                    if not no_p[j]:
                        pix[r + d, 3] = _clip(p0 + delta0, 0, maxval)
                    if not no_q[j]:
                        pix[r + d, 4] = _clip(q0 - delta0, 0, maxval)
                    if not no_p[j] and nd_p > 1:
                        dp1 = _clip((((p2 + p0 + 1) >> 1) - p1 + delta0) >> 1, -tc_2, tc_2)
                        pix[r + d, 2] = _clip(p1 + dp1, 0, maxval)
                    if not no_q[j] and nd_q > 1:
                        dq1 = _clip((((q2 + q0 + 1) >> 1) - q1 - delta0) >> 1, -tc_2, tc_2)
                        pix[r + d, 5] = _clip(q1 + dq1, 0, maxval)
    return pix.astype(np.int32)


def deblock_chroma(patch: np.ndarray, tc: list, no_p: list, no_q: list,
                   bit_depth: int = 8) -> np.ndarray:
    """Chroma edge: patch (8, 4): cols 0,1 = P1,P0; 2,3 = Q0,Q1."""
    pix = patch.astype(np.int64).copy()
    maxval = (1 << bit_depth) - 1
    for j in range(2):
        tcj = tc[j] << (bit_depth - 8)
        for d in range(4):
            r = 4 * j + d
            p1, p0, q0, q1 = (int(pix[r, 0]), int(pix[r, 1]),
                              int(pix[r, 2]), int(pix[r, 3]))
            delta = _clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tcj, tcj)
            if not no_p[j]:
                pix[r, 1] = _clip(p0 + delta, 0, maxval)
            if not no_q[j]:
                pix[r, 2] = _clip(q0 - delta, 0, maxval)
    return pix.astype(np.int32)


# ---------------------------------------------------------------------------
# SAO
# ---------------------------------------------------------------------------

SAO_EO_HORIZ = 0
SAO_EO_VERT = 1
SAO_EO_135D = 2
SAO_EO_45D = 3

_EDGE_IDX = np.array([1, 2, 0, 3, 4], np.int32)
_EO_POS = (((-1, 0), (1, 0)),    # horizontal
           ((0, -1), (0, 1)),    # vertical
           ((-1, -1), (1, 1)),   # 45 (down-right diag)
           ((1, -1), (-1, 1)))   # 135


def sao_band(src: np.ndarray, offsets, band_position: int,
             bit_depth: int = 8) -> np.ndarray:
    """offsets: 4 values (offset_val[1..4] in reference layout)."""
    shift = bit_depth - 5
    table = np.zeros(32, np.int32)
    for k in range(4):
        table[(k + band_position) & 31] = offsets[k]
    s = src.astype(np.int32)
    out = s + table[s >> shift]
    return np.clip(out, 0, (1 << bit_depth) - 1)


def sao_edge(src: np.ndarray, offsets5, eo_class: int,
             bit_depth: int = 8) -> np.ndarray:
    """Core edge-offset over the interior (caller handles borders/restores).

    src: (h+2, w+2) window with 1-pixel halo; returns (h, w) filtered.
    offsets5: offset_val[0..4] (index 0 unused by the core = 0 category).
    """
    s = src.astype(np.int32)
    h, w = s.shape[0] - 2, s.shape[1] - 2
    (dx0, dy0), (dx1, dy1) = _EO_POS[eo_class]
    cur = s[1:1 + h, 1:1 + w]
    n0 = s[1 + dy0:1 + dy0 + h, 1 + dx0:1 + dx0 + w]
    n1 = s[1 + dy1:1 + dy1 + h, 1 + dx1:1 + dx1 + w]
    diff0 = np.sign(cur - n0).astype(np.int32)
    diff1 = np.sign(cur - n1).astype(np.int32)
    idx = _EDGE_IDX[2 + diff0 + diff1]
    off = np.asarray(offsets5, np.int32)[idx]
    return np.clip(cur + off, 0, (1 << bit_depth) - 1)
