"""Inter prediction units: syntax + motion vector derivation.

Mirrors hls_prediction_unit (hevc.c:1968), ff_hevc_luma_mv_merge_mode /
ff_hevc_luma_mv_mvp_mode (hevc_mvs.c:511/623) and mvd coding
(hevc_cabac.c:1952).  MvFields carry reference POCs (TEST_MV_POC layout).

The direction-agnostic CabacIO walker is shared by decoder and encoder; the
encoder supplies the coded decisions (merge_idx / ref_idx / mvd / mvp flag)
and the actual motion vectors are derived during the walk.
"""

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..cabac.contexts import CTX_OFFSET
from ..decoder.plan import InterOp
from .io import CabacIO

PF_INTRA = 0
PF_L0 = 1
PF_L1 = 2
PF_BI = 3

PRED_L0 = 0
PRED_L1 = 1
PRED_BI = 2

_MERGE_FLAG = CTX_OFFSET["merge_flag"]
_MERGE_IDX = CTX_OFFSET["merge_idx"]
_INTER_PRED_IDC = CTX_OFFSET["inter_pred_idc"]
_REF_IDX = CTX_OFFSET["ref_idx_l0"]
_MVP_FLAG = CTX_OFFSET["mvp_lx_flag"]
_MVD_GT0 = CTX_OFFSET["abs_mvd_greater0_flag"]
_MVD_GT1 = CTX_OFFSET["abs_mvd_greater1_flag"]

# combined bi-pred candidate order (spec table 8-8; hevc.c l0_l1_cand_idx)
L0_L1_CAND_IDX = ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1),
                  (0, 3), (3, 0), (1, 3), (3, 1), (2, 3), (3, 2))


@dataclass
class PUData:
    """Coded decisions for one PU (encoder fills; decoder reconstructs)."""
    merge_flag: int = 1
    merge_idx: int = 0
    inter_pred_idc: int = PRED_L0
    ref_idx: List[int] = field(default_factory=lambda: [0, 0])
    mvp_flag: List[int] = field(default_factory=lambda: [0, 0])
    mvd: List[tuple] = field(default_factory=lambda: [(0, 0), (0, 0)])
    # derived during walk
    mvf: Optional[dict] = None


class MvField:
    __slots__ = ("pred_flag", "mv", "poc", "ref_idx")

    def __init__(self, pred_flag=PF_INTRA, mv=None, poc=None, ref_idx=None):
        self.pred_flag = pred_flag
        self.mv = mv if mv is not None else [(0, 0), (0, 0)]
        self.poc = poc if poc is not None else [0, 0]
        self.ref_idx = ref_idx if ref_idx is not None else [0, 0]

    def copy(self):
        return MvField(self.pred_flag, [tuple(self.mv[0]), tuple(self.mv[1])],
                       list(self.poc), list(self.ref_idx))


def _mvf_at(st, x_pu, y_pu) -> MvField:
    return MvField(int(st.mvf_pred[y_pu, x_pu]),
                   [tuple(st.mvf_mv[y_pu, x_pu, 0]), tuple(st.mvf_mv[y_pu, x_pu, 1])],
                   [int(st.mvf_poc[y_pu, x_pu, 0]), int(st.mvf_poc[y_pu, x_pu, 1])],
                   [int(st.mvf_ref_idx[y_pu, x_pu, 0]), int(st.mvf_ref_idx[y_pu, x_pu, 1])])


def _store_mvf(st, x0, y0, w, h, f: MvField):
    xp, yp = x0 >> 2, y0 >> 2
    nw, nh = max(1, w >> 2), max(1, h >> 2)
    st.mvf_pred[yp:yp + nh, xp:xp + nw] = f.pred_flag
    for l in range(2):
        st.mvf_mv[yp:yp + nh, xp:xp + nw, l, 0] = f.mv[l][0]
        st.mvf_mv[yp:yp + nh, xp:xp + nw, l, 1] = f.mv[l][1]
        st.mvf_poc[yp:yp + nh, xp:xp + nw, l] = f.poc[l]
        st.mvf_ref_idx[yp:yp + nh, xp:xp + nw, l] = f.ref_idx[l]


def compare_mv_ref_idx(a: MvField, b: MvField) -> bool:
    if a.pred_flag != b.pred_flag:
        return False
    if a.pred_flag == PF_BI:
        return (a.poc[0] == b.poc[0] and a.mv[0] == b.mv[0] and
                a.poc[1] == b.poc[1] and a.mv[1] == b.mv[1])
    if a.pred_flag == PF_L0:
        return a.poc[0] == b.poc[0] and a.mv[0] == b.mv[0]
    if a.pred_flag == PF_L1:
        return a.poc[1] == b.poc[1] and a.mv[1] == b.mv[1]
    return False


def _clip_int8(v):
    return max(-128, min(127, v))


def _clip_int16(v):
    return max(-32768, min(32767, v))


def mv_scale(mv, td, tb):
    """spec 8.5.3.1.8 MV scaling; C-truncating division (hevc_mvs.c:124)."""
    td = _clip_int8(td)
    tb = _clip_int8(tb)
    q = (0x4000 + abs(td) // 2) // abs(td)
    tx = q if td > 0 else -q
    scale = max(-4096, min(4095, (tb * tx + 32) >> 6))
    x = scale * mv[0]
    y = scale * mv[1]
    return (_clip_int16((x + 127 + (1 if x < 0 else 0)) >> 8),
            _clip_int16((y + 127 + (1 if y < 0 else 0)) >> 8))


def z_scan_block_avail(st, x_curr, y_curr, x_n, y_n) -> bool:
    """spec 6.4.1 (hevc_mvs.c:63)."""
    sps = st.sps
    if (y_n >> sps.log2_ctb_size) < (y_curr >> sps.log2_ctb_size) or \
            (x_n >> sps.log2_ctb_size) < (x_curr >> sps.log2_ctb_size):
        return True
    zs = st.pps.min_tb_addr_zs
    lt = sps.log2_min_tb_size
    return int(zs[y_n >> lt, x_n >> lt]) <= int(zs[y_curr >> lt, x_curr >> lt])


def _is_diff_mer(st, xn, yn, xp, yp) -> bool:
    pl = st.pps.log2_parallel_merge_level
    return (xn >> pl) == (xp >> pl) and (yn >> pl) == (yp >> pl)


# ---------------------------------------------------------------------------
# temporal MV (spec 8.5.3.1.7/8; hevc_mvs.c:173-285)
# ---------------------------------------------------------------------------

def _derive_temporal_mv(st, temp: MvField, ref_idx_lx, X, col_poc, col_rpl,
                        col_rpl_lt):
    rpl = st.rpl
    rpl_lt = st.rpl_lt

    def check_mvset(lst):
        cur_lt = rpl_lt[X][ref_idx_lx]
        col_ref_idx = temp.ref_idx[lst]
        col_lt = bool(col_rpl_lt[lst][col_ref_idx]) if col_rpl_lt else False
        if cur_lt != col_lt:
            return None
        col_poc_diff = col_poc - col_rpl[lst][col_ref_idx]
        cur_poc_diff = st.cur_poc - rpl[X][ref_idx_lx]
        if cur_lt or col_poc_diff == cur_poc_diff or not col_poc_diff:
            return tuple(temp.mv[lst])
        return mv_scale(temp.mv[lst], col_poc_diff, cur_poc_diff)

    if temp.pred_flag == PF_INTRA:
        return None
    if not (temp.pred_flag & PF_L0):
        return check_mvset(1)
    if temp.pred_flag == PF_L0:
        return check_mvset(0)
    # BI
    diff = False
    for j in range(2):
        for poc in rpl[j]:
            if poc > st.cur_poc:
                diff = True
                break
        if diff:
            break
    if not diff:
        return check_mvset(0 if X == 0 else 1)
    return check_mvset(0 if st.sh.collocated_list == 1 else 1)


def temporal_luma_motion_vector(st, x0, y0, w, h, ref_idx_lx, X):
    col = st.collocated_frame
    if col is None or col.mvf_pred is None:
        return None
    sps = st.sps

    def try_pos(x, y):
        f = MvField(int(col.mvf_pred[y >> 2, x >> 2]),
                    [tuple(col.mvf_mv[y >> 2, x >> 2, 0]),
                     tuple(col.mvf_mv[y >> 2, x >> 2, 1])],
                    [int(col.mvf_poc[y >> 2, x >> 2, 0]),
                     int(col.mvf_poc[y >> 2, x >> 2, 1])],
                    [int(col.mvf_ref_idx[y >> 2, x >> 2, 0]),
                     int(col.mvf_ref_idx[y >> 2, x >> 2, 1])])
        return _derive_temporal_mv(st, f, ref_idx_lx, X, col.poc,
                                   col.rpl, col.rpl_lt)

    x, y = x0 + w, y0 + h
    if ((y0 >> sps.log2_ctb_size) == (y >> sps.log2_ctb_size) and
            y < sps.height and x < sps.width):
        mv = try_pos((x >> 4) << 4, (y >> 4) << 4)
        if mv is not None:
            return mv
    x = x0 + (w >> 1)
    y = y0 + (h >> 1)
    return try_pos((x >> 4) << 4, (y >> 4) << 4)


# ---------------------------------------------------------------------------
# merge candidate list (spec 8.5.3.1.2; hevc_mvs.c:299)
# ---------------------------------------------------------------------------

def derive_merge_candidates(st, cu, x0, y0, w, h, log2_cb, single_mcl,
                            part_idx, merge_idx):
    sh, sps = st.sh, st.sps
    na = st.neighbour_avail(x0, y0, w, h)
    # cand_up_right_sap (without end_of_tiles_x constraint)
    mask = sps.ctb_size - 1
    x0b, y0b = x0 & mask, y0 & mask
    if (x0b + w) == sps.ctb_size:
        cand_up_right_sap = st.ctb_up_right_flag and not y0b
    else:
        cand_up_right_sap = na["cand_up"]

    def available(cand, xn, yn):
        return bool(cand) and st.mvf_pred[yn >> 2, xn >> 2] != PF_INTRA

    xA1, yA1 = x0 - 1, y0 + h - 1
    xB1, yB1 = x0 + w - 1, y0 - 1
    xB0, yB0 = x0 + w, y0 - 1
    xA0, yA0 = x0 - 1, y0 + h
    xB2, yB2 = x0 - 1, y0 - 1

    nb_refs = sh.num_ref_idx[0] if sh.slice_type == 1 else \
        min(sh.num_ref_idx[0], sh.num_ref_idx[1])
    cands = []

    part_mode = cu.part_mode
    # A1
    if ((not single_mcl and part_idx == 1 and part_mode in (2, 6, 7)) or
            _is_diff_mer(st, xA1, yA1, x0, y0)):
        a1 = None
    else:
        a1 = _mvf_at(st, xA1 >> 2, yA1 >> 2) if available(na["cand_left"], xA1, yA1) else None
        if a1 is not None:
            cands.append(a1)
            if merge_idx == 0:
                return cands
    # B1
    if ((not single_mcl and part_idx == 1 and part_mode in (1, 4, 5)) or
            _is_diff_mer(st, xB1, yB1, x0, y0)):
        b1 = None
    else:
        b1 = _mvf_at(st, xB1 >> 2, yB1 >> 2) if available(na["cand_up"], xB1, yB1) else None
        if b1 is not None:
            if not (a1 is not None and compare_mv_ref_idx(b1, a1)):
                cands.append(b1)
                if merge_idx == len(cands) - 1:
                    return cands
    # B0
    b0 = None
    if (cand_up_right_sap and xB0 < sps.width and
            z_scan_block_avail(st, x0, y0, xB0, yB0) and
            not _is_diff_mer(st, xB0, yB0, x0, y0) and
            st.mvf_pred[yB0 >> 2, xB0 >> 2] != PF_INTRA):
        b0 = _mvf_at(st, xB0 >> 2, yB0 >> 2)
        if not (b1 is not None and compare_mv_ref_idx(b0, b1)):
            cands.append(b0)
            if merge_idx == len(cands) - 1:
                return cands
    # A0
    if (na["cand_bottom_left"] and yA0 < sps.height and
            z_scan_block_avail(st, x0, y0, xA0, yA0) and
            not _is_diff_mer(st, xA0, yA0, x0, y0) and
            st.mvf_pred[yA0 >> 2, xA0 >> 2] != PF_INTRA):
        a0 = _mvf_at(st, xA0 >> 2, yA0 >> 2)
        if not (a1 is not None and compare_mv_ref_idx(a0, a1)):
            cands.append(a0)
            if merge_idx == len(cands) - 1:
                return cands
    # B2
    if (available(na["cand_up_left"], xB2, yB2) and
            not _is_diff_mer(st, xB2, yB2, x0, y0) and len(cands) != 4):
        b2 = _mvf_at(st, xB2 >> 2, yB2 >> 2)
        if not ((a1 is not None and compare_mv_ref_idx(b2, a1)) or
                (b1 is not None and compare_mv_ref_idx(b2, b1))):
            cands.append(b2)
            if merge_idx == len(cands) - 1:
                return cands

    # temporal candidate
    if sh.temporal_mvp_enabled and len(cands) < sh.max_num_merge_cand:
        mv0 = temporal_luma_motion_vector(st, x0, y0, w, h, 0, 0)
        mv1 = temporal_luma_motion_vector(st, x0, y0, w, h, 0, 1) \
            if sh.slice_type == 0 else None
        if mv0 is not None or mv1 is not None:
            f = MvField(pred_flag=(1 if mv0 is not None else 0) +
                        (2 if mv1 is not None else 0))
            if mv0 is not None:
                f.mv[0] = mv0
                f.ref_idx[0] = 0
                f.poc[0] = st.rpl[0][0]
            if mv1 is not None:
                f.mv[1] = mv1
                f.ref_idx[1] = 0
                f.poc[1] = st.rpl[1][0]
            cands.append(f)
            if merge_idx == len(cands) - 1:
                return cands

    nb_orig = len(cands)
    # combined bi-predictive candidates (B slices)
    if sh.slice_type == 0 and nb_orig > 1 and nb_orig < sh.max_num_merge_cand:
        for comb_idx in range(nb_orig * (nb_orig - 1)):
            if len(cands) >= sh.max_num_merge_cand:
                break
            i0, i1 = L0_L1_CAND_IDX[comb_idx]
            l0c, l1c = cands[i0], cands[i1]
            if (l0c.pred_flag & PF_L0) and (l1c.pred_flag & PF_L1) and \
                    (l0c.poc[0] != l1c.poc[1] or l0c.mv[0] != l1c.mv[1]):
                f = MvField(PF_BI,
                            [tuple(l0c.mv[0]), tuple(l1c.mv[1])],
                            [l0c.poc[0], l1c.poc[1]],
                            [l0c.ref_idx[0], l1c.ref_idx[1]])
                cands.append(f)
                if merge_idx == len(cands) - 1:
                    return cands

    # zero candidates
    zero_idx = 0
    while len(cands) < sh.max_num_merge_cand:
        f = MvField(PF_L0 + (2 if sh.slice_type == 0 else 0))
        ri = zero_idx if zero_idx < nb_refs else 0
        f.ref_idx = [ri, ri]
        f.poc[0] = st.rpl[0][ri] if st.rpl[0] else 0
        f.poc[1] = st.rpl[1][ri] if st.rpl[1] else 0
        cands.append(f)
        if merge_idx == len(cands) - 1:
            return cands
        zero_idx += 1
    return cands


def luma_mv_merge_mode(st, cu, x0, y0, w, h, log2_cb, part_idx, merge_idx):
    """hevc_mvs.c:511."""
    single_mcl = False
    ncs = 1 << log2_cb
    w2, h2 = w, h
    if st.pps.log2_parallel_merge_level > 2 and ncs == 8:
        single_mcl = True
        x0, y0 = cu.x0, cu.y0
        w = h = ncs
        part_idx = 0
    cands = derive_merge_candidates(st, cu, x0, y0, w, h, log2_cb,
                                    single_mcl, part_idx, merge_idx)
    mv = cands[merge_idx].copy()
    if mv.pred_flag == PF_BI and (w2 + h2) == 12:
        mv.pred_flag = PF_L0
    return mv


# ---------------------------------------------------------------------------
# AMVP (spec 8.5.3.1.5/6; hevc_mvs.c:623)
# ---------------------------------------------------------------------------

def luma_mv_mvp_mode(st, cu, x0, y0, w, h, mv: MvField, mvp_flag, LX):
    sps, sh = st.sps, st.sh
    na = st.neighbour_avail(x0, y0, w, h)
    mask = sps.ctb_size - 1
    x0b, y0b = x0 & mask, y0 & mask
    if (x0b + w) == sps.ctb_size:
        cand_up_right_sap = st.ctb_up_right_flag and not y0b
    else:
        cand_up_right_sap = na["cand_up"]

    ref_idx = mv.ref_idx[LX]
    pf_l0, pf_l1 = LX, 1 - LX
    rpl = st.rpl
    rpl_lt = st.rpl_lt
    target_poc = rpl[LX][ref_idx]
    target_lt = rpl_lt[LX][ref_idx]

    def mvf(xn, yn):
        return _mvf_at(st, xn >> 2, yn >> 2)

    def mp_mx(f, idx):
        if (f.pred_flag & (1 << idx)) and f.poc[idx] == target_poc:
            return tuple(f.mv[idx])
        return None

    def mp_mx_lt(f, idx):
        if f.pred_flag & (1 << idx):
            col_lt = bool(rpl_lt[idx][f.ref_idx[idx]]) if rpl[idx] else False
            if col_lt == bool(target_lt):
                m = tuple(f.mv[idx])
                if not target_lt:
                    ref_poc_e = f.poc[idx]
                    if ref_poc_e != target_poc:
                        td = st.cur_poc - ref_poc_e
                        if td == 0:
                            td = 1
                        m = mv_scale(m, td, st.cur_poc - target_poc)
                return m
        return None

    xA0, yA0 = x0 - 1, y0 + h
    xA1, yA1 = x0 - 1, y0 + h - 1
    is_a0 = (na["cand_bottom_left"] and yA0 < sps.height and
             z_scan_block_avail(st, x0, y0, xA0, yA0) and
             st.mvf_pred[yA0 >> 2, xA0 >> 2] != PF_INTRA)
    is_a1 = na["cand_left"] and st.mvf_pred[yA1 >> 2, xA1 >> 2] != PF_INTRA
    is_scaled = is_a0 or is_a1

    mxA = None
    for getter in (mp_mx, mp_mx_lt):
        for avail, xx, yy in ((is_a0, xA0, yA0), (is_a1, xA1, yA1)):
            if avail and mxA is None:
                f = mvf(xx, yy)
                mxA = getter(f, pf_l0)
                if mxA is None:
                    mxA = getter(f, pf_l1)
        if mxA is not None:
            break

    if mxA is not None and not mvp_flag:
        return mxA

    xB0, yB0 = x0 + w, y0 - 1
    xB1, yB1 = x0 + w - 1, y0 - 1
    xB2, yB2 = x0 - 1, y0 - 1
    is_b0 = (cand_up_right_sap and xB0 < sps.width and
             z_scan_block_avail(st, x0, y0, xB0, yB0) and
             st.mvf_pred[yB0 >> 2, xB0 >> 2] != PF_INTRA)
    is_b1 = na["cand_up"] and st.mvf_pred[yB1 >> 2, xB1 >> 2] != PF_INTRA
    is_b2 = na["cand_up_left"] and st.mvf_pred[yB2 >> 2, xB2 >> 2] != PF_INTRA

    mxB = None
    for avail, xx, yy in ((is_b0, xB0, yB0), (is_b1, xB1, yB1), (is_b2, xB2, yB2)):
        if avail and mxB is None:
            f = mvf(xx, yy)
            mxB = mp_mx(f, pf_l0)
            if mxB is None:
                mxB = mp_mx(f, pf_l1)

    if not is_scaled:
        if mxB is not None:
            mxA = mxB
        mxB = None
        for avail, xx, yy in ((is_b0, xB0, yB0), (is_b1, xB1, yB1), (is_b2, xB2, yB2)):
            if avail and mxB is None:
                f = mvf(xx, yy)
                mxB = mp_mx_lt(f, pf_l0)
                if mxB is None:
                    mxB = mp_mx_lt(f, pf_l1)

    cand_list = []
    if mxA is not None:
        cand_list.append(mxA)
    if mxB is not None and (mxA is None or mxA != mxB):
        cand_list.append(mxB)
    if len(cand_list) < 2 and sh.temporal_mvp_enabled and mvp_flag == len(cand_list):
        mv_col = temporal_luma_motion_vector(st, x0, y0, w, h, ref_idx, LX)
        if mv_col is not None:
            cand_list.append(mv_col)
    while len(cand_list) < 2:
        cand_list.append((0, 0))
    return cand_list[mvp_flag]


# ---------------------------------------------------------------------------
# PU syntax
# ---------------------------------------------------------------------------

def _code_merge_idx(io: CabacIO, st, supply_idx):
    """ff_hevc_merge_idx_decode (hevc_cabac.c:917)."""
    if io.decoding:
        i = io.bin(_MERGE_IDX)
        if i:
            while i < st.sh.max_num_merge_cand - 1 and io.bypass():
                i += 1
        return i
    i = supply_idx
    io.bin(_MERGE_IDX, 1 if i > 0 else 0)
    if i > 0:
        for k in range(1, i):
            io.bypass(1)
        if i < st.sh.max_num_merge_cand - 1:
            io.bypass(0)
    return i


def _code_ref_idx(io: CabacIO, st, nb_refs, supply):
    maxv = nb_refs - 1
    max_ctx = min(maxv, 2)
    if io.decoding:
        i = 0
        while i < max_ctx and io.bin(_REF_IDX + i):
            i += 1
        if i == 2:
            while i < maxv and io.bypass():
                i += 1
        return i
    i = supply
    k = 0
    while k < min(i, max_ctx):
        io.bin(_REF_IDX + k, 1)
        k += 1
    if k < max_ctx and k == i:
        io.bin(_REF_IDX + k, 0)
    if i >= 2:
        for k in range(2, i):
            io.bypass(1)
        if i < maxv:
            io.bypass(0)
    return i


def _code_mvd(io: CabacIO, supply, st=None):
    """ff_hevc_hls_mvd_coding (hevc_cabac.c:1952), incl. the selective-
    encryption variants (mvd_decode_enc + MV-sign cipher,
    hevc_cabac.c:984/1955-1988)."""
    crypto = getattr(st, "crypto", None) if st is not None else None
    eparams = getattr(st, "encrypt_params", 0) if st is not None else 0
    enc_mvs = crypto is not None and (eparams & 1)      # HEVC_CRYPTO_MVs
    enc_signs = crypto is not None and (eparams & 2)    # HEVC_CRYPTO_MV_SIGNS
    if io.decoding:
        gx = io.bin(_MVD_GT0)
        gy = io.bin(_MVD_GT0)
        if gx:
            gx += io.bin(_MVD_GT1 + 1)
        if gy:
            gy += io.bin(_MVD_GT1 + 1)
        mx = _decode_mvd_value(io, gx, crypto if enc_mvs else None)
        sx = None
        if enc_signs and gx:
            from ..crypto import xform_sign_bit
            sx = xform_sign_bit(crypto, 1 if mx < 0 else 0)
        my = _decode_mvd_value(io, gy, crypto if enc_mvs else None)
        if enc_signs:
            from ..crypto import xform_sign_bit
            if gy:
                sy = xform_sign_bit(crypto, 1 if my < 0 else 0)
                my = -abs(my) if sy else abs(my)
            if gx:
                mx = -abs(mx) if sx else abs(mx)
        return (mx, my)
    mx, my = supply
    ax, ay = abs(mx), abs(my)
    io.bin(_MVD_GT0, 1 if ax > 0 else 0)
    io.bin(_MVD_GT0, 1 if ay > 0 else 0)
    if ax > 0:
        io.bin(_MVD_GT1 + 1, 1 if ax > 1 else 0)
    if ay > 0:
        io.bin(_MVD_GT1 + 1, 1 if ay > 1 else 0)
    # mirror the decoder's key consumption order exactly: x value keys,
    # x sign key, y value keys, y sign key
    sx_enc, xsuf = _encrypt_mvd_value(mx, crypto if enc_mvs else None)
    if enc_signs and ax > 0:
        from ..crypto import xform_sign_bit
        sx_enc = xform_sign_bit(crypto, 1 if mx < 0 else 0)
    _emit_mvd_value(io, mx, sx_enc, xsuf)
    sy_enc, ysuf = _encrypt_mvd_value(my, crypto if enc_mvs else None)
    if enc_signs and ay > 0:
        from ..crypto import xform_sign_bit
        sy_enc = xform_sign_bit(crypto, 1 if my < 0 else 0)
    _emit_mvd_value(io, my, sy_enc, ysuf)
    return (mx, my)


def _decode_mvd_value(io, g, crypto=None):
    if g == 0:
        return 0
    if g == 1:
        return -1 if io.bypass() else 1
    # abs >= 2: EG1
    ret = 2
    k = 1
    while k < 31 and io.bypass():
        ret += 1 << k
        k += 1
    suffix = io.bypass_bits(k)
    if crypto is not None:
        from ..crypto import xform_eg_suffix
        ret = (ret - 2) + 2 + xform_eg_suffix(crypto, suffix, k,
                                              encrypt=False)
    else:
        ret += suffix
    return -ret if io.bypass() else ret


def _encrypt_mvd_value(v, crypto):
    """Consume the MVD-value keystream (encrypt path) in decoder order and
    return (raw sign bit, encrypted suffix or None)."""
    a = abs(v)
    sign = 1 if v < 0 else 0
    if a < 2 or crypto is None:
        return sign, None
    p = a.bit_length() - 2
    from ..crypto import xform_eg_suffix
    suffix = a - (1 << (p + 1))
    return sign, xform_eg_suffix(crypto, suffix, p + 1, encrypt=True)


def _emit_mvd_value(io, v, sign, enc_suffix=None):
    a = abs(v)
    if a == 0:
        return
    if a == 1:
        io.bypass(sign)
        return
    p = a.bit_length() - 2        # a in [2^(p+1), 2^(p+2)-1]
    for _ in range(p):
        io.bypass(1)
    io.bypass(0)
    suffix = enc_suffix if enc_suffix is not None else a - (1 << (p + 1))
    io.bypass_bits(p + 1, suffix)
    io.bypass(1 if sign else 0)


def _emit_inter_op(st, x0, y0, w, h, f: MvField):
    _store_mvf(st, x0, y0, w, h, f)
    l0 = (f.poc[0], f.mv[0][0], f.mv[0][1]) if f.pred_flag & PF_L0 else None
    l1 = (f.poc[1], f.mv[1][0], f.mv[1][1]) if f.pred_flag & PF_L1 else None
    weights = None
    wp = st.sh.wp
    if wp is not None:
        def side(lst):
            if lst == 0 and not (f.pred_flag & PF_L0):
                return (1 << wp.luma_log2_denom, 0,
                        1 << wp.chroma_log2_denom, 0,
                        1 << wp.chroma_log2_denom, 0)
            if lst == 1 and not (f.pred_flag & PF_L1):
                return (1 << wp.luma_log2_denom, 0,
                        1 << wp.chroma_log2_denom, 0,
                        1 << wp.chroma_log2_denom, 0)
            ri = f.ref_idx[lst]
            return (wp.luma_weight[lst][ri], wp.luma_offset[lst][ri],
                    wp.chroma_weight[lst][ri][0], wp.chroma_offset[lst][ri][0],
                    wp.chroma_weight[lst][ri][1], wp.chroma_offset[lst][ri][1])
        weights = (wp.luma_log2_denom, wp.chroma_log2_denom,
                   side(0), side(1))
    st.plan.ops.append(InterOp(c_idx=-1, x=x0, y=y0, w=w, h=h, l0=l0, l1=l1,
                               weights=weights))
    _compute_pu_bs(st, x0, y0, w, h)


def _compute_pu_bs(st, x0, y0, w, h):
    """PU boundary BS on the 8-grid (interior PU edges handled by caller)."""
    # handled by ctu edge marking via compute_bs helpers; nothing extra here
    return


def code_prediction_unit(io: CabacIO, st, cu, x0, y0, w, h, log2_cb,
                         part_idx, pu: PUData, is_skip=False):
    sh = st.sh
    supply = not io.decoding

    if is_skip:
        merge_idx = 0
        if sh.max_num_merge_cand > 1:
            merge_idx = _code_merge_idx(io, st, pu.merge_idx if supply else None)
        pu.merge_flag = 1
        pu.merge_idx = merge_idx
        f = luma_mv_merge_mode(st, cu, x0, y0, w, h, log2_cb, part_idx, merge_idx)
        _emit_inter_op(st, x0, y0, w, h, f)
        return

    pu.merge_flag = io.bin(_MERGE_FLAG, pu.merge_flag if supply else None)
    if pu.merge_flag:
        merge_idx = 0
        if sh.max_num_merge_cand > 1:
            merge_idx = _code_merge_idx(io, st, pu.merge_idx if supply else None)
        pu.merge_idx = merge_idx
        f = luma_mv_merge_mode(st, cu, x0, y0, w, h, log2_cb, part_idx, merge_idx)
        _emit_inter_op(st, x0, y0, w, h, f)
        return

    # explicit AMVP
    na = st.neighbour_avail(x0, y0, w, h)   # matches set_neighbour_available
    f = MvField(pred_flag=0)
    inter_pred_idc = PRED_L0
    if sh.slice_type == 0:   # B
        if supply:
            inter_pred_idc = pu.inter_pred_idc
        if w + h == 12:
            b = io.bin(_INTER_PRED_IDC + 4,
                       (1 if inter_pred_idc == PRED_L1 else 0) if supply else None)
            if io.decoding:
                inter_pred_idc = PRED_L1 if b else PRED_L0
        else:
            b = io.bin(_INTER_PRED_IDC + st.ct_depth_cur,
                       (1 if inter_pred_idc == PRED_BI else 0) if supply else None)
            if b:
                inter_pred_idc = PRED_BI
            else:
                b2 = io.bin(_INTER_PRED_IDC + 4,
                            (1 if inter_pred_idc == PRED_L1 else 0) if supply else None)
                if io.decoding:
                    inter_pred_idc = PRED_L1 if b2 else PRED_L0
    pu.inter_pred_idc = inter_pred_idc

    if inter_pred_idc != PRED_L1:
        if sh.num_ref_idx[0] > 1:
            pu.ref_idx[0] = _code_ref_idx(io, st, sh.num_ref_idx[0],
                                          pu.ref_idx[0] if supply else None)
        else:
            pu.ref_idx[0] = 0
        f.ref_idx[0] = pu.ref_idx[0]
        f.pred_flag = PF_L0
        mvd = _code_mvd(io, pu.mvd[0] if supply else None, st)
        pu.mvd[0] = mvd
        pu.mvp_flag[0] = io.bin(_MVP_FLAG, pu.mvp_flag[0] if supply else None)
        mvp = luma_mv_mvp_mode(st, cu, x0, y0, w, h, f, pu.mvp_flag[0], 0)
        f.mv[0] = (_clip_int16(mvp[0] + mvd[0]), _clip_int16(mvp[1] + mvd[1]))
        f.poc[0] = st.rpl[0][f.ref_idx[0]]

    if inter_pred_idc != PRED_L0:
        if sh.num_ref_idx[1] > 1:
            pu.ref_idx[1] = _code_ref_idx(io, st, sh.num_ref_idx[1],
                                          pu.ref_idx[1] if supply else None)
        else:
            pu.ref_idx[1] = 0
        f.ref_idx[1] = pu.ref_idx[1]
        if sh.mvd_l1_zero and inter_pred_idc == PRED_BI:
            mvd = (0, 0)
        else:
            mvd = _code_mvd(io, pu.mvd[1] if supply else None)
        pu.mvd[1] = mvd
        f.pred_flag += PF_L1
        pu.mvp_flag[1] = io.bin(_MVP_FLAG, pu.mvp_flag[1] if supply else None)
        mvp = luma_mv_mvp_mode(st, cu, x0, y0, w, h, f, pu.mvp_flag[1], 1)
        f.mv[1] = (_clip_int16(mvp[0] + mvd[0]), _clip_int16(mvp[1] + mvd[1]))
        f.poc[1] = st.rpl[1][f.ref_idx[1]]

    _emit_inter_op(st, x0, y0, w, h, f)


def code_prediction_unit_skip(io: CabacIO, st, cu, x0, y0, cb_size, log2_cb):
    if cu.pus is None:
        cu.pus = [PUData()]
    cu.x0, cu.y0 = x0, y0
    code_prediction_unit(io, st, cu, x0, y0, cb_size, cb_size, log2_cb, 0,
                         cu.pus[0], is_skip=True)


# (part_mode -> list of (dx, dy, w, h) in units of cb_size/4)
_PART_GEOM = {
    0: [(0, 0, 4, 4)],
    1: [(0, 0, 4, 2), (0, 2, 4, 2)],
    2: [(0, 0, 2, 4), (2, 0, 2, 4)],
    3: [(0, 0, 2, 2), (2, 0, 2, 2), (0, 2, 2, 2), (2, 2, 2, 2)],
    4: [(0, 0, 4, 1), (0, 1, 4, 3)],
    5: [(0, 0, 4, 3), (0, 3, 4, 1)],
    6: [(0, 0, 1, 4), (1, 0, 3, 4)],
    7: [(0, 0, 3, 4), (3, 0, 1, 4)],
}


def code_prediction_units(io: CabacIO, st, cu, x0, y0, log2_cb):
    cb = 1 << log2_cb
    q = cb >> 2
    cu.x0, cu.y0 = x0, y0
    geom = _PART_GEOM[cu.part_mode]
    if cu.pus is None:
        cu.pus = [PUData() for _ in geom]
    for part_idx, (dx, dy, gw, gh) in enumerate(geom):
        code_prediction_unit(io, st, cu, x0 + dx * q, y0 + dy * q,
                             gw * q, gh * q, log2_cb, part_idx,
                             cu.pus[part_idx])
