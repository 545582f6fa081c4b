"""Slice segment header: parse + write (spec 7.3.6; reference hevc.c:520).

Covers the Main/Main10 feature set: I/P/B slices, ST/LT RPS, ref list
modification, weighted prediction tables, WPP/tile entry points.
"""

import math
from dataclasses import dataclass, field
from typing import List, Optional

from ..bitstream.bits import BitReader, BitWriter
from ..bitstream import nal as nalmod
from ..ps.params import SPS, PPS, ShortTermRPS, parse_strps, write_strps

I_SLICE = 2
P_SLICE = 1
B_SLICE = 0


@dataclass
class WPTable:
    """Weighted-prediction parameters per list (spec 7.3.6.3)."""
    luma_log2_denom: int = 0
    chroma_log2_denom: int = 0
    luma_weight: List[List[int]] = field(default_factory=lambda: [[], []])
    luma_offset: List[List[int]] = field(default_factory=lambda: [[], []])
    chroma_weight: List[List[tuple]] = field(default_factory=lambda: [[], []])
    chroma_offset: List[List[tuple]] = field(default_factory=lambda: [[], []])


@dataclass
class SliceHeader:
    first_slice_in_pic: int = 1
    no_output_of_prior_pics: int = 0
    pps_id: int = 0
    dependent_slice_segment: int = 0
    slice_segment_addr: int = 0
    slice_type: int = I_SLICE
    pic_output_flag: int = 1
    colour_plane_id: int = 0
    pic_order_cnt_lsb: int = 0
    short_term_rps_sps_flag: int = 0
    short_term_rps_idx: int = 0
    slice_rps: Optional[ShortTermRPS] = None   # when signaled in slice
    # long-term refs
    lt_poc: List[int] = field(default_factory=list)
    lt_used: List[int] = field(default_factory=list)
    lt_msb_present: List[int] = field(default_factory=list)
    lt_delta_poc_msb_cycle: List[int] = field(default_factory=list)
    temporal_mvp_enabled: int = 0
    sao_luma: int = 0
    sao_chroma: int = 0
    num_ref_idx: List[int] = field(default_factory=lambda: [0, 0])
    rpl_modification: List[Optional[List[int]]] = field(default_factory=lambda: [None, None])
    mvd_l1_zero: int = 0
    cabac_init_flag: int = 0
    collocated_list: int = 0                   # 0 = L0
    collocated_ref_idx: int = 0
    wp: Optional[WPTable] = None
    max_num_merge_cand: int = 5
    slice_qp: int = 26
    slice_cb_qp_offset: int = 0
    slice_cr_qp_offset: int = 0
    cu_chroma_qp_offset_enabled: int = 0       # hevc.c:957-960
    deblocking_filter_disabled: int = 0
    beta_offset: int = 0
    tc_offset: int = 0
    loop_filter_across_slices: int = 0
    num_entry_point_offsets: int = 0
    entry_point_offsets: List[int] = field(default_factory=list)
    # SHVC inter-layer prediction signaling (hevc.c:805-833)
    inter_layer_pred_enabled: int = 0
    active_num_ilr: int = 0
    il_layer_idc: List[int] = field(default_factory=list)
    # derived
    slice_addr: int = 0

    @property
    def rps(self) -> Optional[ShortTermRPS]:
        return self.slice_rps

    def is_intra(self):
        return self.slice_type == I_SLICE


def _ceil_log2(x):
    return max(1, math.ceil(math.log2(x))) if x > 1 else 0


def parse_slice_header(r: BitReader, nal_type: int, sps: SPS, pps: PPS,
                       layer_id: int = 0, vps=None) -> SliceHeader:
    sh = SliceHeader()
    sh.pps_id = 0
    sh.first_slice_in_pic = r.u1()
    if nalmod.is_irap(nal_type):
        sh.no_output_of_prior_pics = r.u1()
    sh.pps_id = r.ue()
    if not sh.first_slice_in_pic:
        if pps.dependent_slice_segments_enabled:
            sh.dependent_slice_segment = r.u1()
        nbits = _ceil_log2(sps.pic_size_in_ctbs)
        sh.slice_segment_addr = r.u(nbits)
    sh.slice_addr = sh.slice_segment_addr

    if not sh.dependent_slice_segment:
        for _ in range(pps.num_extra_slice_header_bits):
            r.u1()
        sh.slice_type = r.ue()
        if pps.output_flag_present:
            sh.pic_output_flag = r.u1()
        if sps.separate_colour_plane_flag:
            sh.colour_plane_id = r.u(2)
        # EL slices carry poc_lsb even for IDR (hevc.c:727-743) unless
        # poc_lsb_not_present_flag is set in the VPS extension
        ext = getattr(vps, "ext", None) if vps is not None else None
        lsb_present = not nalmod.is_idr(nal_type) or (
            layer_id > 0 and not (
                ext is not None and
                (ext.layer_idx_of(layer_id) or 0) < len(ext.poc_lsb_not_present)
                and ext.poc_lsb_not_present[ext.layer_idx_of(layer_id) or 0]))
        if lsb_present:
            sh.pic_order_cnt_lsb = r.u(sps.log2_max_poc_lsb)
        if not nalmod.is_idr(nal_type):
            sh.short_term_rps_sps_flag = r.u1()
            if not sh.short_term_rps_sps_flag:
                sh.slice_rps = parse_strps(r, sps, sps.num_short_term_rps,
                                           is_slice_header=True)
            else:
                nbits = _ceil_log2(sps.num_short_term_rps)
                sh.short_term_rps_idx = r.u(nbits) if nbits else 0
                sh.slice_rps = sps.st_rps[sh.short_term_rps_idx]
            if sps.long_term_ref_pics_present:
                num_sps_lt = r.ue() if len(sps.lt_ref_poc_lsb) else 0
                num_slice_lt = r.ue()
                prev_msb = 0
                for i in range(num_sps_lt + num_slice_lt):
                    if i < num_sps_lt:
                        idx = r.u(_ceil_log2(len(sps.lt_ref_poc_lsb)))
                        sh.lt_poc.append(sps.lt_ref_poc_lsb[idx])
                        sh.lt_used.append(sps.lt_used_by_curr[idx])
                    else:
                        sh.lt_poc.append(r.u(sps.log2_max_poc_lsb))
                        sh.lt_used.append(r.u1())
                    msb_present = r.u1()
                    sh.lt_msb_present.append(msb_present)
                    sh.lt_delta_poc_msb_cycle.append(r.ue() if msb_present else 0)
            if sps.temporal_mvp_enabled:
                sh.temporal_mvp_enabled = r.u1()
        # inter-layer prediction signaling (hevc.c:805-833), present for ALL
        # EL slice types (including IDR) when the VPS declares a dependency
        num_ilr = ext.num_direct_ref_layers(layer_id) if (
            layer_id > 0 and ext is not None) else 0
        if num_ilr > 0:
            sh.inter_layer_pred_enabled = r.u1()
            if sh.inter_layer_pred_enabled:
                if num_ilr > 1:
                    nbits = 1
                    while (1 << nbits) < num_ilr:
                        nbits += 1
                    if not ext.max_one_active_ref_layer:
                        sh.active_num_ilr = r.u(nbits) + 1
                    else:
                        sh.active_num_ilr = 1
                    sh.il_layer_idc = [r.u(nbits)
                                       for _ in range(sh.active_num_ilr)]
                else:
                    sh.active_num_ilr = 1
                    sh.il_layer_idc = [0]
        if sps.sao_enabled:
            sh.sao_luma = r.u1()
            sh.sao_chroma = r.u1()
        if sh.slice_type in (P_SLICE, B_SLICE):
            sh.num_ref_idx = [pps.num_ref_idx_l0_default,
                              pps.num_ref_idx_l1_default if sh.slice_type == B_SLICE else 0]
            if r.u1():                      # num_ref_idx_active_override
                sh.num_ref_idx[0] = r.ue() + 1
                if sh.slice_type == B_SLICE:
                    sh.num_ref_idx[1] = r.ue() + 1
            if pps.lists_modification_present:
                npoc = _num_pic_total_curr(sh, sps, layer_id, vps)
                if npoc > 1:
                    nbits = math.ceil(math.log2(npoc))
                    for lst in range(2 if sh.slice_type == B_SLICE else 1):
                        if r.u1():
                            sh.rpl_modification[lst] = [
                                r.u(nbits) for _ in range(sh.num_ref_idx[lst])]
            if sh.slice_type == B_SLICE:
                sh.mvd_l1_zero = r.u1()
            if pps.cabac_init_present:
                sh.cabac_init_flag = r.u1()
            if sh.temporal_mvp_enabled:
                if sh.slice_type == B_SLICE:
                    sh.collocated_list = 0 if r.u1() else 1
                if sh.num_ref_idx[sh.collocated_list] > 1:
                    sh.collocated_ref_idx = r.ue()
            if ((pps.weighted_pred and sh.slice_type == P_SLICE) or
                    (pps.weighted_bipred and sh.slice_type == B_SLICE)):
                sh.wp = _parse_pred_weight_table(r, sh, sps)
            sh.max_num_merge_cand = 5 - r.ue()
        sh.slice_qp = pps.init_qp + r.se()
        if pps.slice_chroma_qp_offsets_present:
            sh.slice_cb_qp_offset = r.se()
            sh.slice_cr_qp_offset = r.se()
        if pps.chroma_qp_offset_list_enabled:
            sh.cu_chroma_qp_offset_enabled = r.u1()
        sh.deblocking_filter_disabled = pps.deblocking_filter_disabled
        sh.beta_offset = pps.beta_offset
        sh.tc_offset = pps.tc_offset
        if pps.deblocking_filter_control_present:
            override = r.u1() if pps.deblocking_filter_override_enabled else 0
            if override:
                sh.deblocking_filter_disabled = r.u1()
                if not sh.deblocking_filter_disabled:
                    sh.beta_offset = r.se() * 2
                    sh.tc_offset = r.se() * 2
        if (pps.loop_filter_across_slices_enabled and
                (sh.sao_luma or sh.sao_chroma or not sh.deblocking_filter_disabled)):
            sh.loop_filter_across_slices = r.u1()
        else:
            sh.loop_filter_across_slices = pps.loop_filter_across_slices_enabled

    if pps.tiles_enabled or pps.entropy_coding_sync_enabled:
        sh.num_entry_point_offsets = r.ue()
        if sh.num_entry_point_offsets > 0:
            offset_len = r.ue() + 1
            sh.entry_point_offsets = [r.u(offset_len) + 1
                                      for _ in range(sh.num_entry_point_offsets)]
    if pps.slice_header_extension_present:
        ext_len = r.ue()
        for _ in range(ext_len):
            r.u(8)
    # byte_alignment()
    if r.u1() != 1:
        raise ValueError("bad slice header alignment bit")
    r.align()
    return sh


def _num_pic_total_curr(sh: SliceHeader, sps: SPS, layer_id: int = 0,
                        vps=None) -> int:
    """ff_hevc_frame_nb_refs (hevc_refs.c:786): EL slices count one IL ref
    whenever the VPS sets max_one_active_ref_layer_flag, regardless of
    inter_layer_pred_enabled."""
    n = 0
    rps = sh.slice_rps
    if rps:
        n += sum(rps.used)
    n += sum(sh.lt_used)
    ext = getattr(vps, "ext", None) if vps is not None else None
    if layer_id > 0 and ext is not None:
        n += ext.max_one_active_ref_layer
    return n


def _parse_pred_weight_table(r: BitReader, sh: SliceHeader, sps: SPS) -> WPTable:
    wp = WPTable()
    wp.luma_log2_denom = r.ue()
    if sps.chroma_format_idc:
        wp.chroma_log2_denom = max(0, min(7, wp.luma_log2_denom + r.se()))
    nlists = 2 if sh.slice_type == B_SLICE else 1
    for lst in range(nlists):
        n = sh.num_ref_idx[lst]
        luma_flag = [r.u1() for _ in range(n)]
        chroma_flag = [r.u1() for _ in range(n)] if sps.chroma_format_idc else [0] * n
        for i in range(n):
            if luma_flag[i]:
                dw = r.se()
                off = r.se()
                wp.luma_weight[lst].append((1 << wp.luma_log2_denom) + dw)
                wp.luma_offset[lst].append(off)
            else:
                wp.luma_weight[lst].append(1 << wp.luma_log2_denom)
                wp.luma_offset[lst].append(0)
            if chroma_flag[i]:
                cw, co = [], []
                for _ in range(2):
                    dw = r.se()
                    doff = r.se()
                    w = (1 << wp.chroma_log2_denom) + dw
                    shift = 1 << 7
                    off = max(-128, min(127, (shift + doff -
                                              ((shift * w) >> wp.chroma_log2_denom))))
                    cw.append(w)
                    co.append(off)
                wp.chroma_weight[lst].append(tuple(cw))
                wp.chroma_offset[lst].append(tuple(co))
            else:
                wp.chroma_weight[lst].append((1 << wp.chroma_log2_denom,) * 2)
                wp.chroma_offset[lst].append((0, 0))
    return wp


def write_slice_header(sh: SliceHeader, nal_type: int, sps: SPS, pps: PPS,
                       layer_id: int = 0, vps=None) -> BitWriter:
    """Writes the header; returns the BitWriter (caller appends CABAC data)."""
    w = BitWriter()
    w.u1(sh.first_slice_in_pic)
    if nalmod.is_irap(nal_type):
        w.u1(sh.no_output_of_prior_pics)
    w.ue(sh.pps_id)
    if not sh.first_slice_in_pic:
        if pps.dependent_slice_segments_enabled:
            w.u1(sh.dependent_slice_segment)
        w.u(sh.slice_segment_addr, _ceil_log2(sps.pic_size_in_ctbs))
    ext = getattr(vps, "ext", None) if vps is not None else None
    if not sh.dependent_slice_segment:
        assert pps.num_extra_slice_header_bits == 0
        w.ue(sh.slice_type)
        if pps.output_flag_present:
            w.u1(sh.pic_output_flag)
        if not nalmod.is_idr(nal_type) or layer_id > 0:
            w.u(sh.pic_order_cnt_lsb, sps.log2_max_poc_lsb)
        if not nalmod.is_idr(nal_type):
            w.u1(sh.short_term_rps_sps_flag)
            if not sh.short_term_rps_sps_flag:
                write_strps(w, sh.slice_rps, sps.num_short_term_rps, sps,
                            is_slice_header=True)
            else:
                nbits = _ceil_log2(sps.num_short_term_rps)
                if nbits:
                    w.u(sh.short_term_rps_idx, nbits)
            if sps.long_term_ref_pics_present:
                if len(sps.lt_ref_poc_lsb):
                    w.ue(0)                 # num_long_term_sps
                w.ue(len(sh.lt_poc))        # num_long_term_pics
                for i in range(len(sh.lt_poc)):
                    w.u(sh.lt_poc[i], sps.log2_max_poc_lsb)
                    w.u1(sh.lt_used[i])
                    w.u1(sh.lt_msb_present[i])
                    if sh.lt_msb_present[i]:
                        w.ue(sh.lt_delta_poc_msb_cycle[i])
            if sps.temporal_mvp_enabled:
                w.u1(sh.temporal_mvp_enabled)
        num_ilr = ext.num_direct_ref_layers(layer_id) if (
            layer_id > 0 and ext is not None) else 0
        if num_ilr > 0:
            w.u1(sh.inter_layer_pred_enabled)
            if sh.inter_layer_pred_enabled and num_ilr > 1:
                nbits = 1
                while (1 << nbits) < num_ilr:
                    nbits += 1
                if not ext.max_one_active_ref_layer:
                    w.u(sh.active_num_ilr - 1, nbits)
                for idc in sh.il_layer_idc:
                    w.u(idc, nbits)
        if sps.sao_enabled:
            w.u1(sh.sao_luma)
            w.u1(sh.sao_chroma)
        if sh.slice_type in (P_SLICE, B_SLICE):
            override = (sh.num_ref_idx[0] != pps.num_ref_idx_l0_default or
                        (sh.slice_type == B_SLICE and
                         sh.num_ref_idx[1] != pps.num_ref_idx_l1_default))
            w.u1(1 if override else 0)
            if override:
                w.ue(sh.num_ref_idx[0] - 1)
                if sh.slice_type == B_SLICE:
                    w.ue(sh.num_ref_idx[1] - 1)
            if pps.lists_modification_present and \
                    _num_pic_total_curr(sh, sps, layer_id, vps) > 1:
                for lst in range(2 if sh.slice_type == B_SLICE else 1):
                    mod = sh.rpl_modification[lst]
                    w.u1(1 if mod else 0)
                    if mod:
                        nbits = math.ceil(math.log2(
                            _num_pic_total_curr(sh, sps, layer_id, vps)))
                        for v in mod:
                            w.u(v, nbits)
            if sh.slice_type == B_SLICE:
                w.u1(sh.mvd_l1_zero)
            if pps.cabac_init_present:
                w.u1(sh.cabac_init_flag)
            if sh.temporal_mvp_enabled:
                if sh.slice_type == B_SLICE:
                    w.u1(1 if sh.collocated_list == 0 else 0)
                if sh.num_ref_idx[sh.collocated_list] > 1:
                    w.ue(sh.collocated_ref_idx)
            if ((pps.weighted_pred and sh.slice_type == P_SLICE) or
                    (pps.weighted_bipred and sh.slice_type == B_SLICE)):
                _write_pred_weight_table(w, sh, sps)
            w.ue(5 - sh.max_num_merge_cand)
        w.se(sh.slice_qp - pps.init_qp)
        if pps.slice_chroma_qp_offsets_present:
            w.se(sh.slice_cb_qp_offset)
            w.se(sh.slice_cr_qp_offset)
        if pps.chroma_qp_offset_list_enabled:
            w.u1(sh.cu_chroma_qp_offset_enabled)
        if pps.deblocking_filter_control_present:
            override = (sh.deblocking_filter_disabled !=
                        pps.deblocking_filter_disabled or
                        sh.beta_offset != pps.beta_offset or
                        sh.tc_offset != pps.tc_offset)
            if pps.deblocking_filter_override_enabled:
                w.u1(1 if override else 0)
                if override:
                    w.u1(sh.deblocking_filter_disabled)
                    if not sh.deblocking_filter_disabled:
                        w.se(sh.beta_offset // 2)
                        w.se(sh.tc_offset // 2)
            else:
                assert not override, \
                    "slice deblock params differ but override is disabled"
        if (pps.loop_filter_across_slices_enabled and
                (sh.sao_luma or sh.sao_chroma or not sh.deblocking_filter_disabled)):
            w.u1(sh.loop_filter_across_slices)
    if pps.tiles_enabled or pps.entropy_coding_sync_enabled:
        w.ue(sh.num_entry_point_offsets)
        if sh.num_entry_point_offsets:
            offset_len = max(max(o - 1 for o in sh.entry_point_offsets), 1).bit_length()
            w.ue(offset_len - 1)
            for o in sh.entry_point_offsets:
                w.u(o - 1, offset_len)
    w.u1(1)
    w.align_zero()
    return w


def _write_pred_weight_table(w: BitWriter, sh: SliceHeader, sps: SPS):
    wp = sh.wp
    w.ue(wp.luma_log2_denom)
    if sps.chroma_format_idc:
        w.se(wp.chroma_log2_denom - wp.luma_log2_denom)
    nlists = 2 if sh.slice_type == B_SLICE else 1
    for lst in range(nlists):
        n = sh.num_ref_idx[lst]
        lflags = [1 if (wp.luma_weight[lst][i] != (1 << wp.luma_log2_denom) or
                        wp.luma_offset[lst][i] != 0) else 0 for i in range(n)]
        cflags = []
        for i in range(n):
            ident = (wp.chroma_weight[lst][i] == (1 << wp.chroma_log2_denom,) * 2
                     and wp.chroma_offset[lst][i] == (0, 0))
            cflags.append(0 if ident else 1)
        for f in lflags:
            w.u1(f)
        if sps.chroma_format_idc:
            for f in cflags:
                w.u1(f)
        for i in range(n):
            if lflags[i]:
                w.se(wp.luma_weight[lst][i] - (1 << wp.luma_log2_denom))
                w.se(wp.luma_offset[lst][i])
            if sps.chroma_format_idc and cflags[i]:
                for j in range(2):
                    cw = wp.chroma_weight[lst][i][j]
                    co = wp.chroma_offset[lst][i][j]
                    w.se(cw - (1 << wp.chroma_log2_denom))
                    # invert the offset derivation (parse side):
                    # off = clip(128 + doff - ((128*cw) >> denom))
                    doff = co - 128 + ((128 * cw) >> wp.chroma_log2_denom)
                    w.se(doff)
