"""CTU-level syntax: coding quadtree, coding unit, transform tree, SAO.

One direction-agnostic walker (CabacIO) serves both the decoder front-end and
the test-stream encoder — the traversal mirrors the reference's
hls_coding_quadtree / hls_coding_unit / hls_transform_tree / hls_sao_param
(libavcodec/hevc.c:2508/2347/1443/1112) and emits plan ops (decoder/plan.py)
as it walks.
"""

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..cabac.contexts import CTX_OFFSET
from ..decoder.plan import (IntraOp, ResidualOp, PcmOp, CtbFilterParams,
                            FramePlan)
from .io import CabacIO
from .residual import (RCParams, decode_residual, encode_residual,
                       derive_rext_transform)
from ..cabac.contexts import CTX_OFFSET as _CTXOFF

_RS_ABS = _CTXOFF["log2_res_scale_abs"]
_RS_SIGN = _CTXOFF["res_scale_sign_flag"]
from .scans import SCAN_DIAG, SCAN_HORIZ, SCAN_VERT

MODE_INTER = 0
MODE_INTRA = 1
MODE_SKIP = 2

PART_2Nx2N = 0
PART_2NxN = 1
PART_Nx2N = 2
PART_NxN = 3
PART_2NxnU = 4
PART_2NxnD = 5
PART_nLx2N = 6
PART_nRx2N = 7

INTRA_PLANAR = 0
INTRA_DC = 1
INTRA_ANGULAR_26 = 26

_SPLIT_CU = CTX_OFFSET["split_coding_unit_flag"]
_TQ_BYPASS = CTX_OFFSET["cu_transquant_bypass_flag"]
_SKIP = CTX_OFFSET["skip_flag"]
_PRED_MODE = CTX_OFFSET["pred_mode"]
_PART_MODE = CTX_OFFSET["part_mode"]
_PREV_INTRA = CTX_OFFSET["prev_intra_luma_pred_mode"]
_CHROMA_MODE = CTX_OFFSET["intra_chroma_pred_mode"]
_SPLIT_TT = CTX_OFFSET["split_transform_flag"]
_CBF_LUMA = CTX_OFFSET["cbf_luma"]
_CBF_CBCR = CTX_OFFSET["cbf_cb_cr"]
_SAO_MERGE = CTX_OFFSET["sao_merge_flag"]
_SAO_TYPE = CTX_OFFSET["sao_type_idx"]
_CU_QP_DELTA = CTX_OFFSET["cu_qp_delta"]
_CU_CHROMA_QP_OFFSET_FLAG = CTX_OFFSET["cu_chroma_qp_offset_flag"]
_CU_CHROMA_QP_OFFSET_IDX = CTX_OFFSET["cu_chroma_qp_offset_idx"]

# chroma qp mapping for chroma_array_type == 1 (spec table 8-10)
_QP_C = (29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37)

INTRA_CHROMA_TABLE = (0, 26, 10, 1)


# ---------------------------------------------------------------------------
# syntax tree structures (encoder builds these; decoder reconstructs them)
# ---------------------------------------------------------------------------

@dataclass
class TUData:
    """Leaf transform unit payload."""
    cbf_luma: int = 0
    cbf_cb: List[int] = field(default_factory=lambda: [0, 0])
    cbf_cr: List[int] = field(default_factory=lambda: [0, 0])
    # coefficient levels per component (None if cbf 0)
    levels_y: Optional[np.ndarray] = None
    levels_cb: Optional[np.ndarray] = None
    levels_cr: Optional[np.ndarray] = None
    tskip_y: bool = False
    tskip_cb: bool = False
    tskip_cr: bool = False


@dataclass
class TTNode:
    split: int = 0
    children: Optional[List["TTNode"]] = None
    tu: Optional[TUData] = None
    # chroma cbf decisions at this node (encoder fills; decoder reads)
    cbf_cb: List[int] = field(default_factory=lambda: [0, 0])
    cbf_cr: List[int] = field(default_factory=lambda: [0, 0])


@dataclass
class CUData:
    tq_bypass: int = 0
    skip: int = 0
    pred_mode: int = MODE_INTRA
    part_mode: int = PART_2Nx2N
    pcm: int = 0
    # intra
    prev_intra: List[int] = field(default_factory=lambda: [1, 1, 1, 1])
    mpm_idx: List[int] = field(default_factory=lambda: [0, 0, 0, 0])
    rem_mode: List[int] = field(default_factory=lambda: [0, 0, 0, 0])
    chroma_mode: int = 4        # raw coded value 0..4 (4 = derived)
    # 4:4:4 NxN: one chroma mode per partition (hevc.c:2286-2297)
    chroma_modes: Optional[List[int]] = None
    # inter
    pus: Optional[list] = None
    pcm_samples: Optional[list] = None   # encoder-supplied [Y, U, V] blocks
    rqt_root_cbf: int = 1
    tt: Optional[TTNode] = None
    cu_qp_delta: int = 0
    # encoder-supplied chroma-QP-offset-list index (-1 = code flag 0)
    cu_chroma_qp_offset_idx: int = -1
    # filled during walk
    intra_modes: List[int] = field(default_factory=lambda: [1, 1, 1, 1])
    intra_mode_c: int = 1
    intra_modes_c: List[int] = field(default_factory=lambda: [1, 1, 1, 1])


@dataclass
class CQTNode:
    split: int = 0
    children: Optional[List["CQTNode"]] = None
    cu: Optional[CUData] = None


@dataclass
class CtbData:
    sao_merge_left: int = 0
    sao_merge_up: int = 0
    sao: Optional[CtbFilterParams] = None
    cqt: Optional[CQTNode] = None


# ---------------------------------------------------------------------------
# per-frame syntax state
# ---------------------------------------------------------------------------

class FrameState:
    def __init__(self, sps, pps, sh, plan: FramePlan, init_type: int = 0,
                 pcm_map: np.ndarray = None):
        self.sps = sps
        self.pps = pps
        self.sh = sh
        self.plan = plan
        w, h = sps.width, sps.height
        self.ct_depth = np.zeros((sps.min_cb_height, sps.min_cb_width), np.int8)
        self.tab_ipm = np.full((sps.min_pu_height, sps.min_pu_width), INTRA_DC, np.uint8)
        self.is_intra = np.zeros((sps.min_pu_height, sps.min_pu_width), np.uint8)
        self.skip_flag = np.zeros((sps.min_cb_height, sps.min_cb_width), np.uint8)
        self.cbf_luma = np.zeros((sps.min_tb_height, sps.min_tb_width), np.uint8)
        self.qp_y_tab = np.full((sps.min_cb_height, sps.min_cb_width),
                                sh.slice_qp, np.int8)
        # pcm/bypass no-filter map: the reference never clears is_pcm between
        # frames (hevc.c:3207-3210 resets bs/cbf tables only), so the map is
        # sticky across the sequence; callers pass a persistent buffer.
        self.is_pcm_or_bypass = (pcm_map if pcm_map is not None
                                 else np.zeros((h >> 2, w >> 2), np.uint8))
        # deblock edge maps at 4-sample granularity
        self.vertical_bs = np.zeros((h >> 2, w >> 3), np.uint8) if w >= 8 else None
        self.horizontal_bs = np.zeros((h >> 3, w >> 2), np.uint8)
        self.tab_slice_address = np.full(sps.pic_size_in_ctbs, -1, np.int32)
        self.qp_y = sh.slice_qp
        self.qp_y_pred = sh.slice_qp
        self.is_cu_qp_delta_coded = 0
        self.cu_qp_delta = 0
        self.first_qp_group = 1
        # per-TU chroma QP offsets from the PPS offset lists (RExt;
        # hevc.c:1091-1092 resets at slice init, 1247-1263 decodes per
        # chroma-QP group, hevc_cabac.c:1453-1458 applies in dequant)
        self.is_cu_chroma_qp_offset_coded = 0
        self.cu_qp_offset_cb = 0
        self.cu_qp_offset_cr = 0
        # motion field at 4x4 granularity (TEST_MV_POC layout)
        h4, w4 = h >> 2, w >> 2
        self.mvf_mv = np.zeros((h4, w4, 2, 2), np.int32)
        self.mvf_poc = np.zeros((h4, w4, 2), np.int32)
        self.mvf_pred = np.zeros((h4, w4), np.uint8)     # 0 = intra
        self.mvf_ref_idx = np.zeros((h4, w4, 2), np.int8)
        # reference picture lists of the current slice (POCs + LT flags)
        self.rpl = [[], []]
        self.rpl_lt = [[], []]
        self.cur_poc = 0
        # selective encryption (crypto.cpp parity; set by the owner)
        self.crypto = None
        self.encrypt_params = 0
        self.collocated_frame = None
        self.ct_depth_cur = 0
        self.slice_or_tiles_up_boundary = 0
        self.slice_or_tiles_left_boundary = 0
        # per-CTB neighbor flags (decode_neighbour)
        self.ctb_left_flag = False
        self.ctb_up_flag = False
        self.ctb_up_left_flag = False
        self.ctb_up_right_flag = False
        self.end_of_tiles_x = w
        self.end_of_tiles_y = h
        # init-type for contexts, kept for WPP later
        self.init_type = init_type
        self.sao_ctbs = {}

    # -- neighbor availability ------------------------------------------------

    def decode_neighbour(self, x_ctb, y_ctb, ctb_addr_ts):
        sps, pps = self.sps, self.pps
        ctb_size = sps.ctb_size
        ctb_addr_rs = int(pps.ctb_addr_ts_to_rs[ctb_addr_ts])
        ctb_addr_in_slice = ctb_addr_rs - self.sh.slice_addr
        self.tab_slice_address[ctb_addr_rs] = self.sh.slice_addr

        if pps.entropy_coding_sync_enabled:
            if x_ctb == 0:
                self.first_qp_group = 1
            self.end_of_tiles_x = sps.width
        elif pps.tiles_enabled:
            if ctb_addr_ts and pps.tile_id[ctb_addr_ts] != pps.tile_id[ctb_addr_ts - 1]:
                self.first_qp_group = 1
                idx = int(np.searchsorted(pps.col_bd, x_ctb >> sps.log2_ctb_size,
                                          side="right")) - 1
                self.end_of_tiles_x = x_ctb + (pps._col_width[idx] << sps.log2_ctb_size)
        else:
            self.end_of_tiles_x = sps.width
        self.end_of_tiles_y = min(y_ctb + ctb_size, sps.height)

        if pps.tiles_enabled:
            tid = pps.tile_id
            rs2ts = pps.ctb_addr_rs_to_ts
            tile_left = x_ctb > 0 and tid[ctb_addr_ts] != tid[rs2ts[ctb_addr_rs - 1]]
            tile_up = y_ctb > 0 and tid[ctb_addr_ts] != tid[rs2ts[ctb_addr_rs - sps.ctb_width]]
            slice_left = x_ctb > 0 and (self.tab_slice_address[ctb_addr_rs] !=
                                        self.tab_slice_address[ctb_addr_rs - 1])
            slice_up = y_ctb > 0 and (self.tab_slice_address[ctb_addr_rs] !=
                                      self.tab_slice_address[ctb_addr_rs - sps.ctb_width])
        else:
            tile_left = tile_up = False
            slice_left = ctb_addr_in_slice <= 0
            slice_up = ctb_addr_in_slice < sps.ctb_width
        self.slice_or_tiles_left_boundary = int(bool(slice_left)) + (int(bool(tile_left)) << 1)
        self.slice_or_tiles_up_boundary = int(bool(slice_up)) + (int(bool(tile_up)) << 1)
        self.ctb_left_flag = x_ctb > 0 and ctb_addr_in_slice > 0 and not tile_left
        self.ctb_up_flag = (y_ctb > 0 and ctb_addr_in_slice >= sps.ctb_width
                            and not tile_up)
        if y_ctb > 0 and ctb_addr_in_slice + 1 >= sps.ctb_width and \
                ctb_addr_rs + 1 - sps.ctb_width >= 0 and \
                (ctb_addr_rs % sps.ctb_width) + 1 < sps.ctb_width:
            self.ctb_up_right_flag = (pps.tile_id[ctb_addr_ts] ==
                                      pps.tile_id[pps.ctb_addr_rs_to_ts[
                                          ctb_addr_rs + 1 - sps.ctb_width]])
        else:
            self.ctb_up_right_flag = False
        self.ctb_up_left_flag = (x_ctb > 0 and y_ctb > 0 and
                                 ctb_addr_in_slice - 1 >= sps.ctb_width and
                                 pps.tile_id[ctb_addr_ts] ==
                                 pps.tile_id[pps.ctb_addr_rs_to_ts[
                                     ctb_addr_rs - 1 - sps.ctb_width]])

    def neighbour_avail(self, x0, y0, w, h):
        """ff_hevc_set_neighbour_available (hevc_mvs.c:41)."""
        sps = self.sps
        mask = sps.ctb_size - 1
        x0b, y0b = x0 & mask, y0 & mask
        cand_up = bool(self.ctb_up_flag or y0b)
        cand_left = bool(self.ctb_left_flag or x0b)
        cand_up_left = self.ctb_up_left_flag if (not x0b and not y0b) else \
            (cand_left and cand_up)
        cand_up_right_sap = (self.ctb_up_right_flag and not y0b) \
            if (x0b + w) == sps.ctb_size else cand_up
        cand_up_right = bool(cand_up_right_sap and (x0 + w) < self.end_of_tiles_x)
        cand_bottom_left = False if (y0 + h) >= self.end_of_tiles_y else cand_left
        return dict(cand_up=cand_up, cand_left=cand_left,
                    cand_up_left=bool(cand_up_left),
                    cand_up_right=cand_up_right,
                    cand_bottom_left=bool(cand_bottom_left))

    def intra_avail(self, x0, y0, log2_size, c_idx, na):
        """Final reference-sample availability (hevcpred_template.c:105-118)."""
        sps = self.sps
        hs = sps.hshift[c_idx]
        vs = sps.vshift[c_idx]
        size = 1 << log2_size
        size_in_luma_h = size << hs
        size_in_luma_v = size << vs
        size_in_tbs_h = size_in_luma_h >> sps.log2_min_tb_size
        size_in_tbs_v = size_in_luma_v >> sps.log2_min_tb_size
        x_tb = x0 >> sps.log2_min_tb_size
        y_tb = y0 >> sps.log2_min_tb_size
        zs = self.pps.min_tb_addr_zs
        cur = int(zs[y_tb, x_tb])

        cbl = na["cand_bottom_left"]
        if cbl:
            ybl = y_tb + size_in_tbs_v
            cbl = ybl < zs.shape[0] and x_tb > 0 and cur > int(zs[ybl, x_tb - 1])
        cur_ = na["cand_up_right"]
        if cur_:
            xur = x_tb + size_in_tbs_h
            cur_ = xur < zs.shape[1] and y_tb > 0 and cur > int(zs[y_tb - 1, xur])
        bls = (min(y0 + 2 * size_in_luma_v, sps.height) - (y0 + size_in_luma_v)) >> vs
        trs = (min(x0 + 2 * size_in_luma_h, sps.width) - (x0 + size_in_luma_h)) >> hs
        return dict(cand_bottom_left=bool(cbl), cand_left=na["cand_left"],
                    cand_up_left=na["cand_up_left"], cand_up=na["cand_up"],
                    cand_up_right=bool(cur_),
                    bottom_left_size=max(0, bls), top_right_size=max(0, trs))

    # -- chroma qp --------------------------------------------------------------

    def chroma_qp(self, qp_y, c_idx):
        sps, pps, sh = self.sps, self.pps, self.sh
        offset = (pps.cb_qp_offset + sh.slice_cb_qp_offset +
                  self.cu_qp_offset_cb) if c_idx == 1 else \
            (pps.cr_qp_offset + sh.slice_cr_qp_offset + self.cu_qp_offset_cr)
        qp_i = max(-sps.qp_bd_offset, min(57, qp_y + offset))
        if sps.chroma_format_idc == 1:
            if qp_i < 30:
                qp = qp_i
            elif qp_i > 43:
                qp = qp_i - 6
            else:
                qp = _QP_C[qp_i - 30]
        else:
            qp = min(qp_i, 51)
        return qp + sps.qp_bd_offset


# ---------------------------------------------------------------------------
# SAO syntax
# ---------------------------------------------------------------------------

SAO_NOT_APPLIED = 0
SAO_BAND = 1
SAO_EDGE = 2


def code_sao(io: CabacIO, st: FrameState, rx, ry, ctb: CtbData):
    sh, sps = st.sh, st.sps
    if not (sh.sao_luma or sh.sao_chroma):
        ctb.sao = _sao_off()
        st.sao_ctbs[(rx, ry)] = ctb.sao
        return
    merge_left = merge_up = 0
    if rx > 0 and st.ctb_left_flag:
        merge_left = io.bin(_SAO_MERGE, ctb.sao_merge_left if not io.decoding else None)
    if ry > 0 and not merge_left and st.ctb_up_flag:
        merge_up = io.bin(_SAO_MERGE, ctb.sao_merge_up if not io.decoding else None)
    if merge_left:
        ctb.sao = st.sao_ctbs[(rx - 1, ry)]
        st.sao_ctbs[(rx, ry)] = ctb.sao
        return
    if merge_up:
        ctb.sao = st.sao_ctbs[(rx, ry - 1)]
        st.sao_ctbs[(rx, ry)] = ctb.sao
        return

    sao = ctb.sao if not io.decoding else _sao_off()
    if io.decoding:
        ctb.sao = sao
    for c_idx in range(3):
        enabled = sh.sao_luma if c_idx == 0 else sh.sao_chroma
        if not enabled:
            sao.sao_type[c_idx] = SAO_NOT_APPLIED
            continue
        if c_idx == 2:
            sao.sao_type[2] = sao.sao_type[1]
            sao.sao_eo_class[2] = sao.sao_eo_class[1]
        else:
            t = int(sao.sao_type[c_idx]) if not io.decoding else None
            first = io.bin(_SAO_TYPE, None if t is None else (1 if t else 0))
            if not first:
                sao.sao_type[c_idx] = SAO_NOT_APPLIED
                if c_idx == 1:
                    # type for cr mirrors cb; continue loop; cr handled via copy
                    pass
                continue
            b = io.bypass(None if t is None else (0 if t == SAO_BAND else 1))
            sao.sao_type[c_idx] = SAO_EDGE if b else SAO_BAND
        if sao.sao_type[c_idx] == SAO_NOT_APPLIED:
            continue
        cmax = (1 << (min(sps.bit_depth, 10) - 5)) - 1
        abs_vals = []
        for i in range(4):
            if io.decoding:
                abs_vals.append(io.tr_unary_bypass(cmax))
            else:
                v = int(sao.sao_offsets[c_idx][i + 1])
                if sao.sao_type[c_idx] == SAO_EDGE:
                    a = abs(v) if i > 1 else v
                else:
                    a = abs(v)
                abs_vals.append(io.tr_unary_bypass(cmax, a))
        if sao.sao_type[c_idx] == SAO_BAND:
            signs = []
            for i in range(4):
                if abs_vals[i]:
                    want = None if io.decoding else \
                        (1 if sao.sao_offsets[c_idx][i + 1] < 0 else 0)
                    signs.append(io.bypass(want))
                else:
                    signs.append(0)
            bp = io.bypass_bits(5, None if io.decoding else
                                int(sao.sao_band_position[c_idx]))
            sao.sao_band_position[c_idx] = bp
        else:
            signs = [0, 0, 0, 0]
            if c_idx != 2:
                eo = io.bypass_bits(2, None if io.decoding else
                                    int(sao.sao_eo_class[c_idx]))
                sao.sao_eo_class[c_idx] = eo
        if io.decoding:
            sao.sao_offsets[c_idx][0] = 0
            for i in range(4):
                v = abs_vals[i]
                if sao.sao_type[c_idx] == SAO_EDGE:
                    if i > 1:
                        v = -v
                elif signs[i]:
                    v = -v
                sao.sao_offsets[c_idx][i + 1] = v
    st.sao_ctbs[(rx, ry)] = ctb.sao


def _sao_off():
    return CtbFilterParams(sao_type=np.zeros(3, np.int32),
                           sao_band_position=np.zeros(3, np.int32),
                           sao_offsets=np.zeros((3, 5), np.int32),
                           sao_eo_class=np.zeros(3, np.int32))


# ---------------------------------------------------------------------------
# coding quadtree / coding unit
# ---------------------------------------------------------------------------

def code_ctu(io: CabacIO, st: FrameState, x_ctb, y_ctb, ctb_addr_ts,
             ctb: Optional[CtbData] = None) -> CtbData:
    if ctb is None:
        ctb = CtbData()
    st.decode_neighbour(x_ctb, y_ctb, ctb_addr_ts)
    code_sao(io, st, x_ctb >> st.sps.log2_ctb_size, y_ctb >> st.sps.log2_ctb_size, ctb)
    node = code_quadtree(io, st, x_ctb, y_ctb, st.sps.log2_ctb_size, 0,
                         ctb.cqt if not io.decoding else None)
    ctb.cqt = node
    return ctb


def code_quadtree(io: CabacIO, st: FrameState, x0, y0, log2_cb, depth,
                  supply: Optional[CQTNode]) -> CQTNode:
    sps = st.sps
    node = supply if supply is not None else CQTNode()
    can_split = log2_cb > sps.log2_min_cb_size
    inside = (x0 + (1 << log2_cb) <= sps.width and
              y0 + (1 << log2_cb) <= sps.height)
    if inside and can_split:
        # split_cu_flag context from neighbor depths
        mask = sps.ctb_size - 1
        x0b, y0b = x0 & mask, y0 & mask
        x_cb = x0 >> sps.log2_min_cb_size
        y_cb = y0 >> sps.log2_min_cb_size
        inc = 0
        if st.ctb_left_flag or x0b:
            inc += int(st.ct_depth[y_cb, x_cb - 1] > depth)
        if st.ctb_up_flag or y0b:
            inc += int(st.ct_depth[y_cb - 1, x_cb] > depth)
        split = io.bin(_SPLIT_CU + inc, node.split if supply is not None else None)
        node.split = split
    elif can_split and not inside:
        node.split = 1
        split = 1
    else:
        node.split = 0
        split = 0

    if st.pps.cu_qp_delta_enabled and \
            log2_cb >= sps.log2_ctb_size - st.pps.diff_cu_qp_delta_depth:
        st.is_cu_qp_delta_coded = 0
        st.cu_qp_delta = 0

    if st.sh.cu_chroma_qp_offset_enabled and \
            log2_cb >= sps.log2_ctb_size - \
            st.pps.diff_cu_chroma_qp_offset_depth:
        st.is_cu_chroma_qp_offset_coded = 0      # hevc.c:2531-2534

    if split:
        if node.children is None:
            node.children = [CQTNode() for _ in range(4)]
        half = 1 << (log2_cb - 1)
        coords = [(x0, y0), (x0 + half, y0), (x0, y0 + half), (x0 + half, y0 + half)]
        for i, (x1, y1) in enumerate(coords):
            if x1 < sps.width and y1 < sps.height:
                code_quadtree(io, st, x1, y1, log2_cb - 1, depth + 1,
                              node.children[i] if supply is not None else None)
        return node
    if node.cu is None:
        node.cu = CUData()
    st.ct_depth_cur = depth
    code_cu(io, st, x0, y0, log2_cb, depth, node.cu)
    return node


def code_cu(io: CabacIO, st: FrameState, x0, y0, log2_cb, depth, cu: CUData):
    sps, pps, sh = st.sps, st.pps, st.sh
    cu.x0, cu.y0 = x0, y0
    cb_size = 1 << log2_cb
    x_cb = x0 >> sps.log2_min_cb_size
    y_cb = y0 >> sps.log2_min_cb_size
    length = cb_size >> sps.log2_min_cb_size
    supply = not io.decoding

    if pps.transquant_bypass_enabled:
        cu.tq_bypass = io.bin(_TQ_BYPASS, cu.tq_bypass if supply else None)
        if cu.tq_bypass:
            _set_pcm_or_bypass(st, x0, y0, cb_size)
    else:
        cu.tq_bypass = 0

    if sh.slice_type != 2:      # P/B
        inc = 0
        if st.ctb_left_flag or (x0 & (sps.ctb_size - 1)):
            inc += int(st.skip_flag[y_cb, x_cb - 1])
        if st.ctb_up_flag or (y0 & (sps.ctb_size - 1)):
            inc += int(st.skip_flag[y_cb - 1, x_cb])
        cu.skip = io.bin(_SKIP + inc, cu.skip if supply else None)
        st.skip_flag[y_cb:y_cb + length, x_cb:x_cb + length] = cu.skip
        if cu.skip:
            cu.pred_mode = MODE_SKIP
        elif not supply:
            cu.pred_mode = MODE_INTER
        # (in encode mode the planner's INTRA/INTER choice is kept for the
        # pred_mode bin below)
    else:
        st.skip_flag[y_cb:y_cb + length, x_cb:x_cb + length] = 0
        cu.skip = 0
        cu.pred_mode = MODE_INTRA

    if cu.skip:
        from .pu import code_prediction_unit_skip
        code_prediction_unit_skip(io, st, cu, x0, y0, cb_size, log2_cb)
        _intra_default(st, cu, x0, y0, cb_size)
        _mark_cu_edges(st, x0, y0, cb_size)
    else:
        if sh.slice_type != 2:
            pm = io.bin(_PRED_MODE, 1 if (supply and cu.pred_mode == MODE_INTRA)
                        else (0 if supply else None))
            cu.pred_mode = MODE_INTRA if pm else MODE_INTER
        if cu.pred_mode != MODE_INTRA or log2_cb == sps.log2_min_cb_size:
            cu.part_mode = _code_part_mode(io, st, cu, log2_cb)
        else:
            cu.part_mode = PART_2Nx2N
        intra_split = (cu.part_mode == PART_NxN and cu.pred_mode == MODE_INTRA)

        if cu.pred_mode == MODE_INTRA:
            if (cu.part_mode == PART_2Nx2N and sps.pcm_enabled and
                    sps.pcm_log2_min_size <= log2_cb <= sps.pcm_log2_max_size):
                cu.pcm = io.terminate(cu.pcm if supply else None)
            if cu.pcm:
                _code_pcm(io, st, cu, x0, y0, cb_size)
            else:
                _code_intra_pred_info(io, st, cu, x0, y0, log2_cb)
        else:
            _intra_default(st, cu, x0, y0, cb_size)
            from .pu import code_prediction_units
            code_prediction_units(io, st, cu, x0, y0, log2_cb)

        if not cu.pcm:
            if cu.pred_mode != MODE_INTRA and not (
                    cu.part_mode == PART_2Nx2N and cu.pus and cu.pus[0].merge_flag):
                cu.rqt_root_cbf = io.bin(CTX_OFFSET["no_residual_data_flag"],
                                         cu.rqt_root_cbf if supply else None)
            if cu.rqt_root_cbf:
                max_depth = (sps.max_transform_hierarchy_depth_intra + intra_split
                             if cu.pred_mode == MODE_INTRA
                             else sps.max_transform_hierarchy_depth_inter)
                if cu.tt is None:
                    cu.tt = TTNode()
                # base cbf entries start at 0 (hevc.c:2473): the 4:2:2
                # second-chroma slots inherit when not explicitly coded
                code_transform_tree(io, st, cu, x0, y0, x0, y0, log2_cb,
                                    log2_cb, 0, 0, [0, 0], [0, 0], cu.tt,
                                    max_depth, intra_split)
            else:
                _mark_cu_edges(st, x0, y0, cb_size)

    if pps.cu_qp_delta_enabled and not st.is_cu_qp_delta_coded:
        set_qpy(st, x0, y0, 0)
    st.qp_y_tab[y_cb:y_cb + length, x_cb:x_cb + length] = st.qp_y
    st.ct_depth[y_cb:y_cb + length, x_cb:x_cb + length] = depth
    qg_mask = (1 << (sps.log2_ctb_size - pps.diff_cu_qp_delta_depth)) - 1
    if ((x0 + cb_size) & qg_mask) == 0 and ((y0 + cb_size) & qg_mask) == 0:
        st.qp_y_pred = st.qp_y


def _code_part_mode(io: CabacIO, st: FrameState, cu: CUData, log2_cb) -> int:
    sps = st.sps
    supply = not io.decoding
    want = cu.part_mode if supply else None

    b0 = io.bin(_PART_MODE, (1 if want == PART_2Nx2N else 0) if supply else None)
    if b0:
        return PART_2Nx2N
    if log2_cb == sps.log2_min_cb_size:
        if cu.pred_mode == MODE_INTRA:
            return PART_NxN
        b1 = io.bin(_PART_MODE + 1, (1 if want == PART_2NxN else 0) if supply else None)
        if b1:
            return PART_2NxN
        if log2_cb == 3:
            return PART_Nx2N
        b2 = io.bin(_PART_MODE + 2, (1 if want == PART_Nx2N else 0) if supply else None)
        if b2:
            return PART_Nx2N
        return PART_NxN
    if not sps.amp_enabled:
        b1 = io.bin(_PART_MODE + 1, (1 if want == PART_2NxN else 0) if supply else None)
        return PART_2NxN if b1 else PART_Nx2N
    horiz = want in (PART_2NxN, PART_2NxnU, PART_2NxnD) if supply else None
    b1 = io.bin(_PART_MODE + 1, (1 if horiz else 0) if supply else None)
    if b1:
        b3 = io.bin(_PART_MODE + 3, (1 if want == PART_2NxN else 0) if supply else None)
        if b3:
            return PART_2NxN
        bb = io.bypass((1 if want == PART_2NxnD else 0) if supply else None)
        return PART_2NxnD if bb else PART_2NxnU
    b3 = io.bin(_PART_MODE + 3, (1 if want == PART_Nx2N else 0) if supply else None)
    if b3:
        return PART_Nx2N
    bb = io.bypass((1 if want == PART_nRx2N else 0) if supply else None)
    return PART_nRx2N if bb else PART_nLx2N


def _intra_default(st: FrameState, cu: CUData, x0, y0, cb_size):
    sps = st.sps
    n = max(1, cb_size >> 2)
    xp, yp = x0 >> 2, y0 >> 2
    st.tab_ipm[yp:yp + n, xp:xp + n] = INTRA_DC
    if cu.pred_mode == MODE_INTRA:
        st.is_intra[yp:yp + n, xp:xp + n] = 1


def _code_pcm(io: CabacIO, st: FrameState, cu: CUData, x0, y0, cb_size):
    """pcm_sample (spec 7.3.8.7; reference hls_pcm_sample, hevc.c:1587).

    The arithmetic engine flushes to a byte boundary, raw samples follow,
    then the engine re-initializes with contexts preserved (spec 9.3.1)."""
    sps = st.sps
    supply = not io.decoding
    _intra_default(st, cu, x0, y0, cb_size)
    _mark_cu_edges(st, x0, y0, cb_size)
    if sps.pcm_loop_filter_disabled:
        _set_pcm_or_bypass(st, x0, y0, cb_size)
    io.pcm_begin()
    hs = 0 if sps.chroma_format_idc == 3 else 1
    vs = 0 if sps.chroma_format_idc >= 2 else 1
    geom = [(0, sps.pcm_bit_depth, sps.bit_depth, cb_size, cb_size),
            (1, sps.pcm_bit_depth_chroma, sps.bit_depth_chroma,
             cb_size >> hs, cb_size >> vs),
            (2, sps.pcm_bit_depth_chroma, sps.bit_depth_chroma,
             cb_size >> hs, cb_size >> vs)]
    for c_idx, pbd, bd, w, h in geom:
        shift = bd - pbd
        want = cu.pcm_samples[c_idx] if supply else None
        blk = np.zeros((h, w), np.int32)
        for yy in range(h):
            for xx in range(w):
                v = io.pcm_bits(
                    pbd, (int(want[yy, xx]) >> shift) if supply else None)
                blk[yy, xx] = v << shift
        st.plan.ops.append(PcmOp(
            c_idx=c_idx, x=x0 >> (hs if c_idx else 0),
            y=y0 >> (vs if c_idx else 0), size=w, samples=blk))
    io.pcm_end()


def _set_pcm_or_bypass(st: FrameState, x0, y0, cb_size):
    sps = st.sps
    x_end = min(x0 + cb_size, sps.width) >> 2
    y_end = min(y0 + cb_size, sps.height) >> 2
    st.is_pcm_or_bypass[y0 >> 2:y_end, x0 >> 2:x_end] = 1


def _mpm_candidates(st: FrameState, x0, y0):
    """spec 8.4.2 / reference luma_intra_pred_mode (hevc.c:2158)."""
    sps = st.sps
    x_pu, y_pu = x0 >> 2, y0 >> 2
    mask = sps.ctb_size - 1
    cand_up = int(st.tab_ipm[y_pu - 1, x_pu]) if (st.ctb_up_flag or (y0 & mask)) \
        else INTRA_DC
    cand_left = int(st.tab_ipm[y_pu, x_pu - 1]) if (st.ctb_left_flag or (x0 & mask)) \
        else INTRA_DC
    y_ctb = (y0 >> sps.log2_ctb_size) << sps.log2_ctb_size
    if y0 - 1 < y_ctb:
        cand_up = INTRA_DC
    if cand_left == cand_up:
        if cand_left < 2:
            return [INTRA_PLANAR, INTRA_DC, INTRA_ANGULAR_26]
        return [cand_left, 2 + ((cand_left - 2 - 1 + 32) & 31),
                2 + ((cand_left - 2 + 1) & 31)]
    cands = [cand_left, cand_up]
    if INTRA_PLANAR not in cands:
        cands.append(INTRA_PLANAR)
    elif INTRA_DC not in cands:
        cands.append(INTRA_DC)
    else:
        cands.append(INTRA_ANGULAR_26)
    return cands


def encode_mode_choice(cands, mode):
    """-> (prev_flag, mpm_idx, rem_mode) for a desired luma mode."""
    if mode in cands:
        return 1, cands.index(mode), 0
    sc = sorted(cands)
    rem = mode
    for c in reversed(sc):
        if mode > c:
            rem -= 1
    return 0, 0, rem


def _code_intra_pred_info(io: CabacIO, st: FrameState, cu: CUData, x0, y0, log2_cb):
    sps = st.sps
    supply = not io.decoding
    split = cu.part_mode == PART_NxN
    side = 2 if split else 1
    pb_size = (1 << log2_cb) >> (1 if split else 0)

    npus = 4 if side == 2 else 1
    if supply:
        # derive (prev_flag, mpm_idx, rem) for the desired modes, simulating
        # the progressive tab_ipm updates the decoder will perform
        saved = st.tab_ipm.copy()
        k = 0
        for i in range(side):
            for j in range(side):
                px, py = x0 + pb_size * j, y0 + pb_size * i
                cands = _mpm_candidates(st, px, py)
                pf, idx, rem = encode_mode_choice(cands, cu.intra_modes[k])
                cu.prev_intra[k] = pf
                cu.mpm_idx[k] = idx
                cu.rem_mode[k] = rem
                n = max(1, pb_size >> 2)
                xp, yp = px >> 2, py >> 2
                st.tab_ipm[yp:yp + n, xp:xp + n] = cu.intra_modes[k]
                k += 1
        st.tab_ipm[:] = saved

    prev_flags = []
    for i in range(npus):
        pf = io.bin(_PREV_INTRA, cu.prev_intra[i] if supply else None)
        prev_flags.append(pf)
        cu.prev_intra[i] = pf
    k = 0
    for i in range(side):
        for j in range(side):
            px, py = x0 + pb_size * j, y0 + pb_size * i
            cands = _mpm_candidates(st, px, py)
            if prev_flags[k]:
                idx = io.tr_unary_bypass(2, cu.mpm_idx[k] if supply else None)
                cu.mpm_idx[k] = idx
                mode = cands[idx]
            else:
                rem = io.bypass_bits(5, cu.rem_mode[k] if supply else None)
                cu.rem_mode[k] = rem
                sc = sorted(cands)
                mode = rem
                for c in sc:
                    if mode >= c:
                        mode += 1
            assert not supply or mode == cu.intra_modes[k]
            cu.intra_modes[k] = mode
            # write into ipm/intra maps
            n = max(1, pb_size >> 2)
            xp, yp = px >> 2, py >> 2
            st.tab_ipm[yp:yp + n, xp:xp + n] = mode
            st.is_intra[yp:yp + n, xp:xp + n] = 1
            k += 1
    if side == 1:
        cu.intra_modes[1] = cu.intra_modes[2] = cu.intra_modes[3] = cu.intra_modes[0]

    def _code_one_chroma(k, cm_supply):
        first = io.bin(_CHROMA_MODE,
                       (0 if cm_supply == 4 else 1) if supply else None)
        if not first:
            chroma_mode = 4
        else:
            chroma_mode = io.bypass_bits(2, cm_supply if supply else None)
        if chroma_mode != 4:
            if cu.intra_modes[k] == INTRA_CHROMA_TABLE[chroma_mode]:
                mode_c = 34
            else:
                mode_c = INTRA_CHROMA_TABLE[chroma_mode]
        else:
            mode_c = cu.intra_modes[k]
        return chroma_mode, mode_c

    if sps.chroma_format_idc == 3:
        # 4:4:4: one intra_chroma_pred_mode per partition (hevc.c:2286-2297)
        cms = (cu.chroma_modes if cu.chroma_modes is not None
               else [cu.chroma_mode] * 4)
        for k in range(side * side):
            cm, mode_c = _code_one_chroma(k, cms[k] if supply else None)
            cms[k] = cm
            cu.intra_modes_c[k] = mode_c
        if side == 1:
            cu.intra_modes_c[1] = cu.intra_modes_c[2] = \
                cu.intra_modes_c[3] = cu.intra_modes_c[0]
        cu.chroma_modes = cms
        cu.chroma_mode = cms[0]
        cu.intra_mode_c = cu.intra_modes_c[0]
        st._pu_stale = (cu.intra_modes[0], cu.intra_modes_c[0])
    else:
        # single chroma mode (4:2:0 / 4:2:2; 4:2:2 remaps via the table,
        # hevc.c:2299-2311)
        chroma_mode, mode_c = _code_one_chroma(
            0, cu.chroma_mode if supply else None)
        cu.chroma_mode = chroma_mode
        if sps.chroma_format_idc == 2:
            _TAB_MODE_IDX = (0, 1, 2, 2, 2, 2, 3, 5, 7, 8, 10, 12, 13, 15,
                             17, 18, 19, 20, 21, 22, 23, 23, 24, 24, 25, 25,
                             26, 27, 27, 28, 28, 29, 29, 30, 31)
            mode_c = _TAB_MODE_IDX[mode_c]
        cu.intra_mode_c = mode_c
        cu.intra_modes_c = [mode_c] * 4
        st._pu_stale = (cu.intra_modes[0], cu.intra_modes_c[0])


# ---------------------------------------------------------------------------
# transform tree / unit
# ---------------------------------------------------------------------------

def code_transform_tree(io: CabacIO, st: FrameState, cu: CUData, x0, y0,
                        x_base, y_base, log2_cb, log2_tt, depth, blk_idx,
                        parent_cbf_cb, parent_cbf_cr, node: TTNode,
                        max_depth, intra_split, cur_mode=None):
    sps = st.sps
    supply = not io.decoding
    cbf_cb = list(parent_cbf_cb)
    cbf_cr = list(parent_cbf_cr)
    # lc->tu.intra_pred_mode propagation (hevc.c:1461-1475); 4:4:4 also
    # selects the chroma mode per depth-1 block
    if intra_split:
        if depth == 1:
            cur_mode = cu.intra_modes[blk_idx]
            if sps.chroma_format_idc == 3:
                st._cur_mode_c = cu.intra_modes_c[blk_idx]
                st._cur_cm_c = (cu.chroma_modes[blk_idx]
                                if cu.chroma_modes is not None
                                else cu.chroma_mode)
            else:
                st._cur_mode_c = cu.intra_modes_c[0]
                st._cur_cm_c = (cu.chroma_modes[0]
                                if cu.chroma_modes is not None
                                else cu.chroma_mode)
    elif cu.pred_mode == MODE_INTRA:
        cur_mode = cu.intra_modes[0]
        st._cur_mode_c = cu.intra_modes_c[0]
        st._cur_cm_c = (cu.chroma_modes[0] if cu.chroma_modes is not None
                        else cu.chroma_mode)
    else:
        # inter CUs read the STALE lc->pu modes of the last intra CU in
        # this entropy context (hevc.c:1472-1474; the reference never
        # clears them) — reachable via the RExt bypass-RDPCM gates
        cur_mode, st._cur_mode_c = getattr(st, "_pu_stale", (0, 0))

    if (log2_tt <= sps.log2_max_tb_size and log2_tt > sps.log2_min_tb_size and
            depth < max_depth and not (intra_split and depth == 0)):
        split = io.bin(_SPLIT_TT + 5 - log2_tt, node.split if supply else None)
        node.split = split
    else:
        inter_split = (sps.max_transform_hierarchy_depth_inter == 0 and
                       cu.pred_mode == MODE_INTER and
                       cu.part_mode != PART_2Nx2N and depth == 0)
        split = int(log2_tt > sps.log2_max_tb_size or
                    (intra_split and depth == 0) or inter_split)
        node.split = split

    two_chroma = (sps.chroma_format_idc == 2 and (not split or log2_tt == 3))
    if log2_tt > 2 or sps.chroma_format_idc == 3:
        if depth == 0 or parent_cbf_cb[0]:
            cbf_cb[0] = io.bin(_CBF_CBCR + depth, node.cbf_cb[0] if supply else None)
            if two_chroma:
                cbf_cb[1] = io.bin(_CBF_CBCR + depth, node.cbf_cb[1] if supply else None)
        if depth == 0 or parent_cbf_cr[0]:
            cbf_cr[0] = io.bin(_CBF_CBCR + depth, node.cbf_cr[0] if supply else None)
            if two_chroma:
                cbf_cr[1] = io.bin(_CBF_CBCR + depth, node.cbf_cr[1] if supply else None)
    node.cbf_cb = cbf_cb
    node.cbf_cr = cbf_cr

    if split:
        if node.children is None:
            node.children = [TTNode() for _ in range(4)]
        half = 1 << (log2_tt - 1)
        coords = [(x0, y0), (x0 + half, y0), (x0, y0 + half), (x0 + half, y0 + half)]
        for i, (x1, y1) in enumerate(coords):
            code_transform_tree(io, st, cu, x1, y1, x0, y0, log2_cb,
                                log2_tt - 1, depth + 1, i, cbf_cb, cbf_cr,
                                node.children[i], max_depth, intra_split,
                                cur_mode)
        return

    if node.tu is None:
        node.tu = TUData()
    tu = node.tu
    if cu.pred_mode == MODE_INTRA or depth != 0 or cbf_cb[0] or cbf_cr[0] or \
            (sps.chroma_format_idc == 2 and (cbf_cb[1] or cbf_cr[1])):
        tu.cbf_luma = io.bin(_CBF_LUMA + (1 if depth == 0 else 0),
                             tu.cbf_luma if supply else None)
    else:
        tu.cbf_luma = 1
    tu.cbf_cb = cbf_cb
    tu.cbf_cr = cbf_cr
    code_transform_unit(io, st, cu, x0, y0, x_base, y_base, log2_cb, log2_tt,
                        depth, blk_idx, tu, cur_mode)

    if tu.cbf_luma:
        ntb = (1 << log2_tt) >> sps.log2_min_tb_size
        xt, yt = x0 >> sps.log2_min_tb_size, y0 >> sps.log2_min_tb_size
        st.cbf_luma[yt:yt + ntb, xt:xt + ntb] = 1
    _mark_tu_edges(st, x0, y0, 1 << log2_tt)


def _boundary_strength(st, xq4, yq4, xp4, yp4):
    """BS between two inter 4x4 PU cells (hevc_filter.c:584, TEST_MV_POC)."""
    cp = st.mvf_pred[yp4, xp4]
    cq = st.mvf_pred[yq4, xq4]
    mvp = st.mvf_mv[yp4, xp4]
    mvq = st.mvf_mv[yq4, xq4]
    pocp = st.mvf_poc[yp4, xp4]
    pocq = st.mvf_poc[yq4, xq4]

    def big(a, b):
        return abs(int(a[0]) - int(b[0])) >= 4 or abs(int(a[1]) - int(b[1])) >= 4

    if cq == 3 and cp == 3:
        if (pocq[0] == pocp[0] and pocq[0] == pocq[1] and pocp[0] == pocp[1]):
            if ((big(mvp[0], mvq[0]) or big(mvp[1], mvq[1])) and
                    (big(mvp[1], mvq[0]) or big(mvp[0], mvq[1]))):
                return 1
            return 0
        if pocp[0] == pocq[0] and pocp[1] == pocq[1]:
            return 1 if (big(mvp[0], mvq[0]) or big(mvp[1], mvq[1])) else 0
        if pocp[1] == pocq[0] and pocp[0] == pocq[1]:
            return 1 if (big(mvp[1], mvq[0]) or big(mvp[0], mvq[1])) else 0
        return 1
    if cq != 3 and cp != 3:
        a = mvq[0] if (cq & 1) else mvq[1]
        ref_a = pocq[0] if (cq & 1) else pocq[1]
        b = mvp[0] if (cp & 1) else mvp[1]
        ref_b = pocp[0] if (cp & 1) else pocp[1]
        if ref_a == ref_b:
            return 1 if big(a, b) else 0
        return 1
    return 1


def compute_bs(st: FrameState, x0, y0, log2_size):
    """ff_hevc_deblocking_boundary_strengths (hevc_filter.c:805)."""
    sps, sh, pps = st.sps, st.sh, st.pps
    size = 1 << log2_size
    is_intra_cu = st.mvf_pred[y0 >> 2, x0 >> 2] == 0
    ctb_mask = sps.ctb_size - 1

    if y0 > 0 and (y0 & 7) == 0:
        bd_ctby = y0 & ctb_mask
        bd_slice = sh.loop_filter_across_slices or \
            not (st.slice_or_tiles_up_boundary & 1)
        bd_tiles = pps.loop_filter_across_tiles_enabled or \
            not (st.slice_or_tiles_up_boundary & 2)
        if (bd_slice and bd_tiles) or bd_ctby:
            yp4, yq4 = (y0 - 1) >> 2, y0 >> 2
            yp_t, yq_t = (y0 - 1) >> sps.log2_min_tb_size, y0 >> sps.log2_min_tb_size
            for i in range(0, size, 4):
                x4 = (x0 + i) >> 2
                xt = (x0 + i) >> sps.log2_min_tb_size
                if st.mvf_pred[yq4, x4] == 0 or st.mvf_pred[yp4, x4] == 0:
                    bs = 2
                elif st.cbf_luma[yq_t, xt] or st.cbf_luma[yp_t, xt]:
                    bs = 1
                else:
                    bs = _boundary_strength(st, x4, yq4, x4, yp4)
                st.horizontal_bs[y0 >> 3, x4] = bs

    if x0 > 0 and (x0 & 7) == 0 and st.vertical_bs is not None:
        bd_ctbx = x0 & ctb_mask
        bd_slice = sh.loop_filter_across_slices or \
            not (st.slice_or_tiles_left_boundary & 1)
        bd_tiles = pps.loop_filter_across_tiles_enabled or \
            not (st.slice_or_tiles_left_boundary & 2)
        if (bd_slice and bd_tiles) or bd_ctbx:
            xp4, xq4 = (x0 - 1) >> 2, x0 >> 2
            xp_t, xq_t = (x0 - 1) >> sps.log2_min_tb_size, x0 >> sps.log2_min_tb_size
            for i in range(0, size, 4):
                y4 = (y0 + i) >> 2
                yt = (y0 + i) >> sps.log2_min_tb_size
                if st.mvf_pred[y4, xq4] == 0 or st.mvf_pred[y4, xp4] == 0:
                    bs = 2
                elif st.cbf_luma[yt, xq_t] or st.cbf_luma[yt, xp_t]:
                    bs = 1
                else:
                    bs = _boundary_strength(st, xq4, y4, xp4, y4)
                st.vertical_bs[y4, x0 >> 3] = bs

    # interior PU boundaries (8-grid) inside a TU larger than the min PU
    if log2_size > 2 and not is_intra_cu:
        for i in range(0, size, 4):
            x4 = (x0 + i) >> 2
            yp4 = (y0 + 8 - 1) >> 2
            for j in range(8, size, 8):
                yq4 = (y0 + j) >> 2
                st.horizontal_bs[(y0 + j) >> 3, x4] = \
                    _boundary_strength(st, x4, yq4, x4, yp4)
                yp4 = yq4
        if st.vertical_bs is not None:
            for j in range(0, size, 4):
                y4 = (y0 + j) >> 2
                xp4 = (x0 + 8 - 1) >> 2
                for i in range(8, size, 8):
                    xq4 = (x0 + i) >> 2
                    st.vertical_bs[y4, (x0 + i) >> 3] = \
                        _boundary_strength(st, xq4, y4, xp4, y4)
                    xp4 = xq4


def _mark_tu_edges(st: FrameState, x0, y0, size, bs=None):
    # BS is only derived for slices with deblocking enabled (hevc.c:1577);
    # a disabled slice's edges stay BS=0 and are never filtered
    if st.sh.deblocking_filter_disabled:
        return
    compute_bs(st, x0, y0, size.bit_length() - 1)


def _mark_cu_edges(st: FrameState, x0, y0, size, bs=None):
    if st.sh.deblocking_filter_disabled:
        return
    compute_bs(st, x0, y0, size.bit_length() - 1)


def _intra_op(st: FrameState, x0, y0, log2, c_idx, mode, w_luma, h_luma):
    na = st.neighbour_avail(x0, y0, w_luma, h_luma)
    av = st.intra_avail(x0, y0, log2, c_idx, na)
    hs, vs = st.sps.hshift[c_idx], st.sps.vshift[c_idx]
    return IntraOp(c_idx=c_idx, x=x0 >> hs, y=y0 >> vs, size=1 << log2,
                   mode=mode, **av)


def code_transform_unit(io: CabacIO, st: FrameState, cu: CUData, x0, y0,
                        x_base, y_base, log2_cb, log2_tt, depth, blk_idx,
                        tu: TUData, cur_mode):
    sps, pps, sh = st.sps, st.pps, st.sh
    plan = st.plan
    supply = not io.decoding
    log2_tt_c = log2_tt - sps.hshift[1]
    size = 1 << log2_tt

    mode = cur_mode if cur_mode is not None else cu.intra_modes[0]
    mode_c = getattr(st, "_cur_mode_c", None)
    if mode_c is None:
        mode_c = cu.intra_modes_c[0]

    if cu.pred_mode == MODE_INTRA:
        plan.ops.append(_intra_op(st, x0, y0, log2_tt, 0, mode, size, size))

    any_cbf = tu.cbf_luma or tu.cbf_cb[0] or tu.cbf_cr[0] or \
        (sps.chroma_format_idc == 2 and (tu.cbf_cb[1] or tu.cbf_cr[1]))

    # scan selection
    scan_idx = scan_idx_c = SCAN_DIAG
    if cu.pred_mode == MODE_INTRA and log2_tt < 4:
        if 6 <= mode <= 14:
            scan_idx = SCAN_VERT
        elif 22 <= mode <= 30:
            scan_idx = SCAN_HORIZ
        if 6 <= mode_c <= 14:
            scan_idx_c = SCAN_VERT
        elif 22 <= mode_c <= 30:
            scan_idx_c = SCAN_HORIZ

    if any_cbf:
        if pps.cu_qp_delta_enabled and not st.is_cu_qp_delta_coded:
            _code_cu_qp_delta(io, st, cu)
        cbf_chroma = tu.cbf_cb[0] or tu.cbf_cr[0] or \
            (sps.chroma_format_idc == 2 and (tu.cbf_cb[1] or tu.cbf_cr[1]))
        if (sh.cu_chroma_qp_offset_enabled and cbf_chroma and
                not cu.tq_bypass and not st.is_cu_chroma_qp_offset_coded):
            _code_cu_chroma_qp_offset(io, st, cu)
        qp_y = st.qp_y + sps.qp_bd_offset

        if tu.cbf_luma:
            levels, tskip, rot, rdir = _code_residual(
                io, st, cu, 0, log2_tt, scan_idx, mode, tu.levels_y,
                tu.tskip_y, x=x0, y=y0)
            tu.levels_y = levels
            tu.tskip_y = tskip
            plan.ops.append(ResidualOp(
                c_idx=0, x=x0, y=y0, log2_size=log2_tt, levels=levels,
                qp=qp_y, transform_skip=tskip,
                use_dst=(cu.pred_mode == MODE_INTRA and log2_tt == 2),
                transquant_bypass=bool(cu.tq_bypass), rot=rot,
                rdpcm_dir=rdir,
                matrix_id=_scaling_mid(st, cu, 0, tskip, log2_tt)))

        nblk_c = 2 if sps.chroma_format_idc == 2 else 1
        if log2_tt > 2 or sps.chroma_format_idc == 3:
            tsz_h = 1 << (log2_tt_c + sps.hshift[1])
            tsz_v = 1 << (log2_tt_c + sps.vshift[1])
            # cross-component prediction (4:4:4 only; hevc.c:1295-1298);
            # the intra gate tests the chroma-mode SYNTAX value (4 = DM,
            # lc->tu.chroma_mode_c), not the derived prediction mode
            cross_pf = bool(pps.cross_component_prediction_enabled and
                            tu.cbf_luma and sps.chroma_format_idc == 3 and
                            (cu.pred_mode != MODE_INTRA or
                             getattr(st, "_cur_cm_c", 0) == 4))
            # 4:2:2 codes two stacked square chroma TUs per component, the
            # second predicted below the first (hevc.c:1302-1340)
            for c_idx, cbf_arr, lv_attr, sk_attr in (
                    (1, tu.cbf_cb, "levels_cb", "tskip_cb"),
                    (2, tu.cbf_cr, "levels_cr", "tskip_cr")):
                alpha = 0
                if cross_pf:
                    sup = (st.cc_provider(st, cu, c_idx)
                           if getattr(st, "cc_provider", None) else 0)
                    alpha = _code_cc_alpha(io, st, c_idx - 1, sup)
                for i in range(nblk_c):
                    yb = y0 + (i << log2_tt_c)
                    if cu.pred_mode == MODE_INTRA:
                        plan.ops.append(_intra_op(st, x0, yb, log2_tt_c,
                                                  c_idx, mode_c, tsz_h,
                                                  tsz_v))
                    if cbf_arr[i]:
                        lv = getattr(tu, lv_attr)
                        sk = getattr(tu, sk_attr)
                        levels, tskip, rot, rdir = _code_residual(
                            io, st, cu, c_idx, log2_tt_c, scan_idx_c, mode_c,
                            lv[i] if isinstance(lv, list) else lv,
                            sk[i] if isinstance(sk, list) else sk,
                            x=x0 >> sps.hshift[1], y=yb >> sps.vshift[1])
                        if nblk_c == 2:
                            cur = getattr(tu, lv_attr)
                            if not isinstance(cur, list):
                                cur = [None, None]
                            curs = getattr(tu, sk_attr)
                            if not isinstance(curs, list):
                                curs = [False, False]
                            cur[i] = levels
                            curs[i] = tskip
                            setattr(tu, lv_attr, cur)
                            setattr(tu, sk_attr, curs)
                        else:
                            setattr(tu, lv_attr, levels)
                            setattr(tu, sk_attr, tskip)
                        plan.ops.append(ResidualOp(
                            c_idx=c_idx, x=x0 >> sps.hshift[1],
                            y=yb >> sps.vshift[1],
                            log2_size=log2_tt_c, levels=levels,
                            qp=st.chroma_qp(st.qp_y, c_idx),
                            transform_skip=tskip,
                            transquant_bypass=bool(cu.tq_bypass),
                            rot=rot, rdpcm_dir=rdir, cc_alpha=alpha,
                            matrix_id=_scaling_mid(st, cu, c_idx, tskip,
                                                   log2_tt_c)))
                    elif cross_pf and alpha:
                        # no coded chroma levels: the scaled luma residual
                        # alone is added (hevc.c:1315-1330)
                        import numpy as _np
                        plan.ops.append(ResidualOp(
                            c_idx=c_idx, x=x0 >> sps.hshift[1],
                            y=yb >> sps.vshift[1], log2_size=log2_tt_c,
                            levels=_np.zeros((1 << log2_tt_c,) * 2,
                                             _np.int32),
                            qp=st.chroma_qp(st.qp_y, c_idx),
                            cc_alpha=alpha, matrix_id=-1))
        elif blk_idx == 3:
            # chroma for the four 4x4 luma TUs, at the parent location
            tsz_h = 1 << (log2_tt + 1)
            tsz_v = 1 << (log2_tt + sps.vshift[1])
            for c_idx, cbf_arr, lv_attr, sk_attr in (
                    (1, tu.cbf_cb, "levels_cb", "tskip_cb"),
                    (2, tu.cbf_cr, "levels_cr", "tskip_cr")):
                for i in range(nblk_c):
                    yb = y_base + (i << log2_tt)
                    if cu.pred_mode == MODE_INTRA:
                        plan.ops.append(_intra_op(st, x_base, yb, log2_tt,
                                                  c_idx, mode_c, tsz_h,
                                                  tsz_v))
                    if cbf_arr[i]:
                        lv = getattr(tu, lv_attr)
                        sk = getattr(tu, sk_attr)
                        levels, tskip, rot, rdir = _code_residual(
                            io, st, cu, c_idx, log2_tt, scan_idx_c, mode_c,
                            lv[i] if isinstance(lv, list) else lv,
                            sk[i] if isinstance(sk, list) else sk,
                            x=x_base >> sps.hshift[1],
                            y=yb >> sps.vshift[1])
                        if nblk_c == 2:
                            cur = getattr(tu, lv_attr)
                            if not isinstance(cur, list):
                                cur = [None, None]
                            curs = getattr(tu, sk_attr)
                            if not isinstance(curs, list):
                                curs = [False, False]
                            cur[i] = levels
                            curs[i] = tskip
                            setattr(tu, lv_attr, cur)
                            setattr(tu, sk_attr, curs)
                        else:
                            setattr(tu, lv_attr, levels)
                            setattr(tu, sk_attr, tskip)
                        plan.ops.append(ResidualOp(
                            c_idx=c_idx, x=x_base >> sps.hshift[1],
                            y=yb >> sps.vshift[1], log2_size=log2_tt,
                            levels=levels, qp=st.chroma_qp(st.qp_y, c_idx),
                            transform_skip=tskip,
                            transquant_bypass=bool(cu.tq_bypass),
                            rot=rot, rdpcm_dir=rdir,
                            matrix_id=_scaling_mid(st, cu, c_idx, tskip,
                                                   log2_tt)))
    elif cu.pred_mode == MODE_INTRA:
        nblk_c = 2 if sps.chroma_format_idc == 2 else 1
        if log2_tt > 2 or sps.chroma_format_idc == 3:
            tsz_h = 1 << (log2_tt_c + sps.hshift[1])
            tsz_v = 1 << (log2_tt_c + sps.vshift[1])
            for c_idx in (1, 2):
                for i in range(nblk_c):
                    plan.ops.append(_intra_op(
                        st, x0, y0 + (i << log2_tt_c), log2_tt_c, c_idx,
                        mode_c, tsz_h, tsz_v))
        elif blk_idx == 3:
            tsz_h = 1 << (log2_tt + 1)
            tsz_v = 1 << (log2_tt + sps.vshift[1])
            for c_idx in (1, 2):
                for i in range(nblk_c):
                    plan.ops.append(_intra_op(
                        st, x_base, y_base + (i << log2_tt), log2_tt, c_idx,
                        mode_c, tsz_h, tsz_v))


def _scaling_mid(st: FrameState, cu: CUData, c_idx, tskip, log2) -> int:
    """Scaling-list matrix id (reference hevc_cabac.c:1484-1494); -1 = flat."""
    if (not st.sps.scaling_list_enabled or cu.tq_bypass or
            (tskip and log2 > 2)):
        return -1
    return 3 * (0 if cu.pred_mode == MODE_INTRA else 1) + c_idx


def _code_residual(io: CabacIO, st: FrameState, cu: CUData, c_idx, log2_size,
                   scan_idx, pred_mode_intra, supply_levels, supply_tskip,
                   x=0, y=0):
    sps = st.sps
    ctxset = io.dec.ctx if io.decoding else io.enc.ctx
    p = RCParams(c_idx=c_idx, log2_size=log2_size, scan_idx=scan_idx,
                 sign_data_hiding=bool(st.pps.sign_data_hiding),
                 transform_skip_enabled=bool(st.pps.transform_skip_enabled),
                 log2_max_transform_skip_size=int(getattr(
                     st.pps, "log2_max_transform_skip_block_size", 2)),
                 transquant_bypass=bool(cu.tq_bypass),
                 is_intra=(cu.pred_mode == MODE_INTRA),
                 pred_mode_intra=pred_mode_intra,
                 implicit_rdpcm=bool(sps.implicit_rdpcm_enabled),
                 explicit_rdpcm=bool(sps.explicit_rdpcm_enabled),
                 persistent_rice=bool(sps.persistent_rice_adaptation_enabled),
                 transform_skip_context=bool(
                     sps.transform_skip_context_enabled),
                 rotation_enabled=bool(sps.transform_skip_rotation_enabled),
                 stat_coeff=ctxset.stat_coeff,
                 crypto=st.crypto, encrypt_params=st.encrypt_params)
    if io.decoding:
        return decode_residual(io.dec, p)
    if supply_levels is None:
        # lazy level computation by the encoder's decision hook; providers
        # may also choose an explicit-rdpcm (flag, dir) for inter TS/bypass
        got = st.level_provider(
            st, cu, c_idx, x, y, log2_size, scan_idx, pred_mode_intra)
        if len(got) == 4:
            supply_levels, supply_tskip, ef, ed = got
            p.supply_erd = (bool(ef), int(ed))
        else:
            supply_levels, supply_tskip = got
    encode_residual(io.enc, p, supply_levels, transform_skip=bool(supply_tskip))
    rot, rdir = derive_rext_transform(p, p.erd_flag,
                                      p.supply_erd[1] if p.erd_flag else 0)
    return supply_levels, bool(supply_tskip), rot, rdir


def _code_cc_alpha(io: CabacIO, st: FrameState, idx, supply_alpha):
    """cross-component ResScaleVal syntax (hls_cross_component_pred,
    hevc.c:1186-1196): TR-coded log2_res_scale_abs_plus1 + sign."""
    if io.decoding:
        i = 0
        while i < 4 and io.dec.decode_bin(_RS_ABS + 4 * idx + i):
            i += 1
        if i == 0:
            return 0
        sign = io.dec.decode_bin(_RS_SIGN + idx)
        return (1 << (i - 1)) * (1 - 2 * sign)
    a = supply_alpha
    mag = 0 if a == 0 else abs(a).bit_length()   # log2(|a|)+1
    for i in range(mag):
        io.enc.encode_bin(_RS_ABS + 4 * idx + i, 1)
    if mag < 4:
        io.enc.encode_bin(_RS_ABS + 4 * idx + mag, 0)
    if mag:
        io.enc.encode_bin(_RS_SIGN + idx, 1 if a < 0 else 0)
    return a


def get_qpy_pred(st: FrameState, x_base, y_base):
    """spec 8.6.1 / reference get_qPy_pred (hevc_filter.c:91)."""
    sps, pps = st.sps, st.pps
    ctb_mask = sps.ctb_size - 1
    qg_mask = (1 << (sps.log2_ctb_size - pps.diff_cu_qp_delta_depth)) - 1
    xqg = x_base - (x_base & qg_mask)
    yqg = y_base - (y_base & qg_mask)
    x_cb = xqg >> sps.log2_min_cb_size
    y_cb = yqg >> sps.log2_min_cb_size
    avail_a = (x_base & ctb_mask) and (xqg & ctb_mask)
    avail_b = (y_base & ctb_mask) and (yqg & ctb_mask)
    if st.first_qp_group or (not xqg and not yqg):
        st.first_qp_group = int(not st.is_cu_qp_delta_coded)
        pred = st.sh.slice_qp
    else:
        pred = st.qp_y_pred
    qp_a = int(st.qp_y_tab[y_cb, x_cb - 1]) if avail_a else pred
    qp_b = int(st.qp_y_tab[y_cb - 1, x_cb]) if avail_b else pred
    return (qp_a + qp_b + 1) >> 1


def set_qpy(st: FrameState, x_base, y_base, delta):
    """reference ff_hevc_set_qPy (hevc_filter.c:131)."""
    pred = get_qpy_pred(st, x_base, y_base)
    off = st.sps.qp_bd_offset
    if delta:
        st.qp_y = ((pred + delta + 52 + 2 * off) % (52 + off)) - off
    else:
        st.qp_y = pred


def _code_cu_qp_delta(io: CabacIO, st: FrameState, cu: CUData):
    supply = not io.decoding
    want = cu.cu_qp_delta if supply else None
    aval = abs(want) if supply else None
    prefix = io.tr_unary(5, lambda i: _CU_QP_DELTA + (0 if i == 0 else 1),
                         min(aval, 5) if supply else None)
    if prefix >= 5:
        if io.decoding:
            k = 0
            while k < 31 and io.bypass():
                k += 1
            suffix = io.bypass_bits(k)
            val = ((1 << k) + 4) + suffix
        else:
            v = aval - 5
            k = (v + 1).bit_length() - 1
            for _ in range(k):
                io.bypass(1)
            io.bypass(0)
            io.bypass_bits(k, v + 1 - (1 << k))
            val = aval
    else:
        val = prefix
    if val:
        sign = io.bypass((1 if want < 0 else 0) if supply else None)
        val = -val if sign else val
    cu.cu_qp_delta = val
    st.is_cu_qp_delta_coded = 1
    set_qpy(st, cu.x0, cu.y0, val)
    return val


def _code_cu_chroma_qp_offset(io: CabacIO, st: FrameState, cu: CUData):
    """cu_chroma_qp_offset_flag / _idx (hevc.c:1247-1263).

    Decoded once per chroma-QP group when a TU has coded chroma; the index
    selects a (cb, cr) pair from the PPS offset lists, applied to the
    chroma QP of every TU until the next group (hevc_cabac.c:1453-1458).
    The idx is unary on one context with cMax = max(5, len-1) — the
    reference's FFMAX quirk (hevc_cabac.c:768) — and is only coded when
    the list has more than one entry (hevc.c:1252)."""
    pps = st.pps
    supply = not io.decoding
    want = cu.cu_chroma_qp_offset_idx if supply else None
    flag = io.bin(_CU_CHROMA_QP_OFFSET_FLAG,
                  (1 if want >= 0 else 0) if supply else None)
    if flag:
        idx = 0
        if len(pps.cb_qp_offset_list) > 1:
            c_max = max(5, len(pps.cb_qp_offset_list) - 1)
            idx = io.tr_unary(c_max, lambda i: _CU_CHROMA_QP_OFFSET_IDX,
                              want if supply else None)
        st.cu_qp_offset_cb = pps.cb_qp_offset_list[idx]
        st.cu_qp_offset_cr = pps.cr_qp_offset_list[idx]
    else:
        st.cu_qp_offset_cb = 0
        st.cu_qp_offset_cr = 0
    st.is_cu_chroma_qp_offset_coded = 1


def expand_qp_map(st: FrameState, sps):
    """qp_y_tab (min-cb grid) -> 8x8-granularity map for deblocking."""
    rep = 1 << (sps.log2_min_cb_size - 3)
    if rep <= 1:
        return st.qp_y_tab.astype(np.int32)
    return np.repeat(np.repeat(st.qp_y_tab, rep, 0), rep, 1).astype(np.int32)
