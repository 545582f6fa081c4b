"""HEVC parameter sets: VPS/SPS/PPS structures with parse + write.

Field order follows ITU-T H.265 (04/2013) clause 7.3; behavioral parity with
the reference parser ff_hevc_decode_nal_{vps,sps,pps}
(libavcodec/hevc_ps.c:1097/1520/2151).  Both directions are implemented so the
framework can generate its own test bitstreams (the repo has no conformance
vectors; generated streams are validated against the reference decoder).

Derived PPS tile/address maps (ctb_addr_rs_to_ts etc.) mirror spec 6.5.1/6.5.2
(reference: hevc_ps.c:2441-2530).
"""

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..bitstream.bits import BitReader, BitWriter


# ---------------------------------------------------------------------------
# profile_tier_level
# ---------------------------------------------------------------------------

@dataclass
class PTL:
    profile_space: int = 0
    tier_flag: int = 0
    profile_idc: int = 1                    # 1=Main, 2=Main10, 3=MainSP, 4=RExt
    profile_compatibility_flags: int = 0    # 32-bit mask, bit i = flag[i]
    progressive_source_flag: int = 1
    interlaced_source_flag: int = 0
    non_packed_constraint_flag: int = 0
    frame_only_constraint_flag: int = 1
    level_idc: int = 120                    # level 4.0
    # per sub-layer (max_sub_layers-1 entries): (profile PTL-or-None,
    # level_idc-or-None) — temporal-scalability metadata (spec 7.3.3;
    # reference parses the same block in its PTL loop, hevc_ps.c)
    sub_layers: List[tuple] = field(default_factory=list)


def _parse_ptl_common(r, p):
    p.profile_space = r.u(2)
    p.tier_flag = r.u1()
    p.profile_idc = r.u(5)
    p.profile_compatibility_flags = r.u(32)
    p.progressive_source_flag = r.u1()
    p.interlaced_source_flag = r.u1()
    p.non_packed_constraint_flag = r.u1()
    p.frame_only_constraint_flag = r.u1()
    r.u(32); r.u(12)                        # general_reserved_zero_44bits


def parse_ptl(r: BitReader, max_sub_layers: int) -> PTL:
    """Parse profile_tier_level (spec 7.3.3)."""
    p = PTL()
    _parse_ptl_common(r, p)
    p.level_idc = r.u(8)
    flags = [(r.u1(), r.u1()) for _ in range(max_sub_layers - 1)]
    if max_sub_layers - 1 > 0:
        for _ in range(max_sub_layers - 1, 8):
            r.u(2)                          # reserved_zero_2bits alignment
    p.sub_layers = []
    for pf, lf in flags:
        sp = None
        if pf:
            sp = PTL()
            _parse_ptl_common(r, sp)        # 88-bit sub-layer profile block
        lv = r.u(8) if lf else None
        p.sub_layers.append((sp, lv))
    return p


def _write_ptl_common(w: BitWriter, p: PTL):
    w.u(p.profile_space, 2)
    w.u1(p.tier_flag)
    w.u(p.profile_idc, 5)
    compat = p.profile_compatibility_flags or (1 << (31 - p.profile_idc))
    w.u(compat, 32)
    w.u1(p.progressive_source_flag)
    w.u1(p.interlaced_source_flag)
    w.u1(p.non_packed_constraint_flag)
    w.u1(p.frame_only_constraint_flag)
    w.u(0, 32); w.u(0, 12)                  # general_reserved_zero_44bits


def write_ptl(w: BitWriter, p: PTL, max_sub_layers: int = 1):
    _write_ptl_common(w, p)
    w.u(p.level_idc, 8)
    subs = list(p.sub_layers)[:max_sub_layers - 1]
    subs += [(None, None)] * (max_sub_layers - 1 - len(subs))
    for sp, lv in subs:
        w.u1(1 if sp is not None else 0)
        w.u1(1 if lv is not None else 0)
    if max_sub_layers - 1 > 0:
        for _ in range(max_sub_layers - 1, 8):
            w.u(0, 2)
    for sp, lv in subs:
        if sp is not None:
            _write_ptl_common(w, sp)
        if lv is not None:
            w.u(lv, 8)


# ---------------------------------------------------------------------------
# short-term reference picture set (spec 7.3.7; reference hevc_ps.c:72)
# ---------------------------------------------------------------------------

@dataclass
class ShortTermRPS:
    # negative (before) and positive (after) delta POCs, each with used flag
    delta_poc: List[int] = field(default_factory=list)   # sorted: negatives then positives
    used: List[int] = field(default_factory=list)
    num_negative_pics: int = 0

    @property
    def num_delta_pocs(self) -> int:
        return len(self.delta_poc)


def parse_strps(r: BitReader, sps: "SPS", idx: int, is_slice_header: bool) -> ShortTermRPS:
    rps = ShortTermRPS()
    inter_rps_pred = False
    if idx > 0 or (is_slice_header and sps.num_short_term_rps > 0):
        inter_rps_pred = bool(r.u1())
    if inter_rps_pred:
        if is_slice_header:
            delta_idx = r.ue() + 1
        else:
            delta_idx = 1
        ref = sps.st_rps[idx - delta_idx] if not is_slice_header else \
            sps.st_rps[sps.num_short_term_rps - delta_idx]
        delta_rps_sign = r.u1()
        abs_delta_rps = r.ue() + 1
        delta_rps = (1 - 2 * delta_rps_sign) * abs_delta_rps
        nref = ref.num_delta_pocs
        used_by = []
        use_delta = []
        for _ in range(nref + 1):
            u = r.u1()
            d = 1
            if not u:
                d = r.u1()
            used_by.append(u)
            use_delta.append(d)
        # construct per spec 7.4.8
        neg, pos = [], []
        # positive side of ref processed descending for negative output
        for j in range(len([d for d in ref.delta_poc if d > 0]) - 1, -1, -1):
            k = ref.num_negative_pics + j
            dpoc = ref.delta_poc[k] + delta_rps
            if dpoc < 0 and use_delta[k]:
                neg.append((dpoc, used_by[k]))
        if delta_rps < 0 and use_delta[nref]:
            neg.append((delta_rps, used_by[nref]))
        for j in range(ref.num_negative_pics):
            dpoc = ref.delta_poc[j] + delta_rps
            if dpoc < 0 and use_delta[j]:
                neg.append((dpoc, used_by[j]))
        neg.sort(key=lambda t: -t[0])       # descending (closest first)
        for j in range(ref.num_negative_pics - 1, -1, -1):
            dpoc = ref.delta_poc[j] + delta_rps
            if dpoc > 0 and use_delta[j]:
                pos.append((dpoc, used_by[j]))
        if delta_rps > 0 and use_delta[nref]:
            pos.append((delta_rps, used_by[nref]))
        for j in range(len(ref.delta_poc) - ref.num_negative_pics):
            k = ref.num_negative_pics + j
            dpoc = ref.delta_poc[k] + delta_rps
            if dpoc > 0 and use_delta[k]:
                pos.append((dpoc, used_by[k]))
        pos.sort(key=lambda t: t[0])        # ascending
        rps.num_negative_pics = len(neg)
        rps.delta_poc = [d for d, _ in neg] + [d for d, _ in pos]
        rps.used = [u for _, u in neg] + [u for _, u in pos]
        return rps

    num_neg = r.ue()
    num_pos = r.ue()
    prev = 0
    neg = []
    for _ in range(num_neg):
        delta = r.ue() + 1
        prev -= delta
        neg.append((prev, r.u1()))
    prev = 0
    pos = []
    for _ in range(num_pos):
        delta = r.ue() + 1
        prev += delta
        pos.append((prev, r.u1()))
    rps.num_negative_pics = num_neg
    rps.delta_poc = [d for d, _ in neg] + [d for d, _ in pos]
    rps.used = [u for _, u in neg] + [u for _, u in pos]
    return rps


def write_strps(w: BitWriter, rps: ShortTermRPS, idx: int, sps: "SPS",
                is_slice_header: bool = False):
    """Always writes the explicit (non inter-RPS-predicted) form."""
    if idx > 0 or (is_slice_header and sps.num_short_term_rps > 0):
        w.u1(0)                             # inter_ref_pic_set_prediction_flag
    neg = [(d, u) for d, u in zip(rps.delta_poc, rps.used) if d < 0]
    pos = [(d, u) for d, u in zip(rps.delta_poc, rps.used) if d > 0]
    w.ue(len(neg))
    w.ue(len(pos))
    prev = 0
    for d, u in neg:
        w.ue(prev - d - 1)
        prev = d
        w.u1(u)
    prev = 0
    for d, u in pos:
        w.ue(d - prev - 1)
        prev = d
        w.u1(u)


# ---------------------------------------------------------------------------
# VPS
# ---------------------------------------------------------------------------

@dataclass
class VPS:
    vps_id: int = 0
    max_layers: int = 1
    max_sub_layers: int = 1
    temporal_id_nesting_flag: int = 1
    ptl: PTL = field(default_factory=PTL)
    max_dec_pic_buffering: List[int] = field(default_factory=lambda: [5])
    num_reorder_pics: List[int] = field(default_factory=lambda: [0])
    max_latency_increase: List[int] = field(default_factory=lambda: [-1])
    max_layer_id: int = 0
    num_layer_sets: int = 1
    # layer_id_included_flag[set-1][layer] for sets >= 1 (hevc_ps.c:1178)
    layer_id_included: List[List[int]] = field(default_factory=list)
    ext: Optional[object] = None            # layers.VPSExt (SHVC)
    # optional (num_units_in_tick, time_scale, nhrd): write side emits
    # vps_timing_info with nhrd HRD parameter blocks (test streams for
    # the HRD parse path; decode ignores timing metadata)
    timing: Optional[tuple] = None


def parse_vps(rbsp: bytes) -> VPS:
    r = BitReader(rbsp)
    v = VPS()
    v.vps_id = r.u(4)
    if r.u(2) != 3:
        raise ValueError("vps_reserved_three_2bits != 3")
    v.max_layers = r.u(6) + 1
    v.max_sub_layers = r.u(3) + 1
    v.temporal_id_nesting_flag = r.u1()
    r.u(16)     # vps_extension_offset (reference VPS_EXTN_OFFSET) / 0xffff
    v.ptl = parse_ptl(r, v.max_sub_layers)
    sub_layer_ordering = r.u1()
    start = 0 if sub_layer_ordering else v.max_sub_layers - 1
    v.max_dec_pic_buffering = []
    v.num_reorder_pics = []
    v.max_latency_increase = []
    for _ in range(start, v.max_sub_layers):
        v.max_dec_pic_buffering.append(r.ue() + 1)
        v.num_reorder_pics.append(r.ue())
        v.max_latency_increase.append(r.ue() - 1)
    v.max_layer_id = r.u(6)
    v.num_layer_sets = r.ue() + 1
    v.layer_id_included = []
    for _ in range(1, v.num_layer_sets):
        v.layer_id_included.append(
            [r.u1() for _ in range(v.max_layer_id + 1)])
    timing = r.u1()
    if timing:
        r.u(32); r.u(32)                    # num_units_in_tick, time_scale
        if r.u1():                          # poc_proportional_to_timing
            r.ue()                          # num_ticks_poc_diff_one_minus1
        # vps_num_hrd_parameters (spec 7.3.2.1; reference parses each with
        # decode_hrd, hevc_ps.c:287) — timing metadata only, field-exact
        # parse keeps the extension flag that follows aligned
        nhrd = r.ue()
        for i in range(nhrd):
            r.ue()                          # hrd_layer_set_idx[i]
            cprms = r.u1() if i > 0 else 1  # cprms_present_flag
            parse_hrd(r, cprms, v.max_sub_layers)
    if r.u1():                              # vps_extension_flag
        from .layers import parse_vps_extension
        r.align()                           # align_get_bits (hevc_ps.c:1215)
        try:
            v.ext = parse_vps_extension(r, v)
        except (ValueError, IndexError, EOFError):
            v.ext = None                    # tolerate exotic extensions
    return v


def write_vps(v: VPS) -> bytes:
    w = BitWriter()
    w.u(v.vps_id, 4)
    w.u(3, 2)
    w.u(v.max_layers - 1, 6)
    w.u(v.max_sub_layers - 1, 3)
    w.u1(v.temporal_id_nesting_flag)
    w.u(0xFFFF, 16)
    write_ptl(w, v.ptl, v.max_sub_layers)
    w.u1(1)                                 # sub_layer_ordering_info_present
    for i in range(v.max_sub_layers):
        w.ue(v.max_dec_pic_buffering[i] - 1)
        w.ue(v.num_reorder_pics[i])
        w.ue(v.max_latency_increase[i] + 1)
    w.u(v.max_layer_id, 6)
    w.ue(v.num_layer_sets - 1)
    for i in range(1, v.num_layer_sets):
        inc = v.layer_id_included[i - 1] if i - 1 < len(
            v.layer_id_included) else [1] * (v.max_layer_id + 1)
        for j in range(v.max_layer_id + 1):
            w.u1(inc[j] if j < len(inc) else 0)
    if v.timing is not None:
        nuit, tsc, nhrd = v.timing
        w.u1(1)                             # vps_timing_info_present_flag
        w.u(nuit, 32)
        w.u(tsc, 32)
        w.u1(0)                             # poc_proportional_to_timing
        w.ue(nhrd)
        for i in range(nhrd):
            w.ue(0)                         # hrd_layer_set_idx[i]
            if i > 0:
                w.u1(1)                     # cprms_present_flag
            write_hrd(w, 1, v.max_sub_layers)
    else:
        w.u1(0)                             # vps_timing_info_present_flag
    if v.ext is not None:
        from .layers import write_vps_extension
        w.u1(1)                             # vps_extension_flag
        w.align_zero()                      # vps_extension_alignment
        write_vps_extension(w, v, v.ext)
    else:
        w.u1(0)                             # vps_extension_flag
    w.rbsp_trailing_bits()
    return w.get_bytes()


# ---------------------------------------------------------------------------
# SPS
# ---------------------------------------------------------------------------

@dataclass
class VUI:
    """VUI parameters (spec E.2; reference decode_vui, hevc_ps.c:1235).

    Display/timing metadata only — nothing here changes decoded samples,
    but parsing it is required to reach the SPS range extension that
    follows it and to interpret pic-timing SEI."""
    sar_num: int = 0
    sar_den: int = 1
    overscan_appropriate: int = 0
    video_format: int = 5
    video_full_range: int = 0
    colour_primaries: int = 2
    transfer_characteristic: int = 2
    matrix_coeffs: int = 2
    chroma_loc_top: int = 0
    chroma_loc_bottom: int = 0
    neutral_chroma_indication: int = 0
    field_seq: int = 0
    frame_field_info_present: int = 0
    def_disp_win: tuple = (0, 0, 0, 0)      # left, right, top, bottom
    num_units_in_tick: int = 0
    time_scale: int = 0
    poc_proportional_to_timing: int = 0
    num_ticks_poc_diff_one: int = 1
    min_spatial_segmentation_idc: int = 0
    log2_max_mv_length_horizontal: int = 15
    log2_max_mv_length_vertical: int = 15


_SAR_TABLE = [(0, 1), (1, 1), (12, 11), (10, 11), (16, 11), (40, 33),
              (24, 11), (20, 11), (32, 11), (80, 33), (18, 11), (15, 11),
              (64, 33), (160, 99), (4, 3), (3, 2), (2, 1)]


def _parse_sublayer_hrd(r, nb_cpb, subpic):
    for _ in range(nb_cpb):
        r.ue()                              # bit_rate_value_minus1
        r.ue()                              # cpb_size_value_minus1
        if subpic:
            r.ue()                          # cpb_size_du_value_minus1
            r.ue()                          # bit_rate_du_value_minus1
        r.u1()                              # cbr_flag


def parse_hrd(r, common_inf_present, max_sublayers):
    """HRD parameters (spec E.2.2; reference decode_hrd, hevc_ps.c:287) —
    skipped field-exact so whatever follows stays aligned."""
    nal_present = vcl_present = subpic = 0
    if common_inf_present:
        nal_present = r.u1()
        vcl_present = r.u1()
        if nal_present or vcl_present:
            subpic = r.u1()
            if subpic:
                r.u(19)     # tick_divisor, du_cpb_removal_len, in_pic_sei, dpb_du_len
            r.u(8)          # bit_rate_scale + cpb_size_scale
            if subpic:
                r.u(4)      # cpb_size_du_scale
            r.u(15)         # initial/au cpb removal + dpb output delay lens
    for _ in range(max_sublayers):
        low_delay = 0
        nb_cpb = 1
        fixed_rate = r.u1()
        if not fixed_rate:
            fixed_rate = r.u1()
        if fixed_rate:
            r.ue()                          # elemental_duration_in_tc_minus1
        else:
            low_delay = r.u1()
        if not low_delay:
            nb_cpb = r.ue() + 1
        if nal_present:
            _parse_sublayer_hrd(r, nb_cpb, subpic)
        if vcl_present:
            _parse_sublayer_hrd(r, nb_cpb, subpic)


def write_hrd(w: BitWriter, common_inf_present, max_sublayers,
              bitrate_m1=9999, cpb_m1=9999):
    """Write a minimal NAL-HRD parameter block (spec E.2.2), the inverse
    of parse_hrd's field walk: no sub-pic params, one CPB per sub-layer,
    fixed picture rate."""
    if common_inf_present:
        w.u1(1)                             # nal_hrd_parameters_present
        w.u1(0)                             # vcl_hrd_parameters_present
        w.u1(0)                             # sub_pic_hrd_params_present
        w.u(0, 8)                           # bit_rate_scale + cpb_size_scale
        w.u(0, 15)                          # cpb removal / dpb output lens
    for _ in range(max_sublayers):
        w.u1(1)                             # fixed_pic_rate_general_flag
        w.ue(0)                             # elemental_duration_in_tc_minus1
        w.ue(0)                             # cpb_cnt_minus1
        w.ue(bitrate_m1)                    # bit_rate_value_minus1
        w.ue(cpb_m1)                        # cpb_size_value_minus1
        w.u1(0)                             # cbr_flag


def parse_vui(r, max_sub_layers) -> VUI:
    v = VUI()
    if r.u1():                              # aspect_ratio_info_present
        idx = r.u(8)
        if idx < len(_SAR_TABLE):
            v.sar_num, v.sar_den = _SAR_TABLE[idx]
        elif idx == 255:                    # EXTENDED_SAR
            v.sar_num = r.u(16)
            v.sar_den = r.u(16)
    if r.u1():                              # overscan_info_present
        v.overscan_appropriate = r.u1()
    if r.u1():                              # video_signal_type_present
        v.video_format = r.u(3)
        v.video_full_range = r.u1()
        if r.u1():                          # colour_description_present
            v.colour_primaries = r.u(8)
            v.transfer_characteristic = r.u(8)
            v.matrix_coeffs = r.u(8)
    if r.u1():                              # chroma_loc_info_present
        v.chroma_loc_top = r.ue()
        v.chroma_loc_bottom = r.ue()
    v.neutral_chroma_indication = r.u1()
    v.field_seq = r.u1()
    v.frame_field_info_present = r.u1()
    if r.u1():                              # default_display_window
        v.def_disp_win = tuple(2 * r.ue() for _ in range(4))
    if r.u1():                              # vui_timing_info_present
        v.num_units_in_tick = r.u(32)
        v.time_scale = r.u(32)
        v.poc_proportional_to_timing = r.u1()
        if v.poc_proportional_to_timing:
            v.num_ticks_poc_diff_one = r.ue() + 1
        if r.u1():                          # hrd_parameters_present
            parse_hrd(r, 1, max_sub_layers)
    if r.u1():                              # bitstream_restriction
        r.u(3)      # tiles_fixed / mv_over_pic_boundaries / restricted_rpl
        v.min_spatial_segmentation_idc = r.ue()
        r.ue()                              # max_bytes_per_pic_denom
        r.ue()                              # max_bits_per_min_cu_denom
        v.log2_max_mv_length_horizontal = r.ue()
        v.log2_max_mv_length_vertical = r.ue()
    return v


@dataclass
class SPS:
    vps_id: int = 0
    max_sub_layers: int = 1
    temporal_id_nesting_flag: int = 1
    ptl: PTL = field(default_factory=PTL)
    sps_id: int = 0
    chroma_format_idc: int = 1
    separate_colour_plane_flag: int = 0
    width: int = 0                          # pic_width_in_luma_samples
    height: int = 0
    conf_win: tuple = (0, 0, 0, 0)          # left, right, top, bottom (in chroma units)
    bit_depth: int = 8
    bit_depth_chroma: int = 8
    log2_max_poc_lsb: int = 8
    sub_layer_ordering_info_present: int = 1
    max_dec_pic_buffering: List[int] = field(default_factory=lambda: [5])
    num_reorder_pics: List[int] = field(default_factory=lambda: [0])
    max_latency_increase: List[int] = field(default_factory=lambda: [-1])
    log2_min_cb_size: int = 3
    log2_ctb_size: int = 6
    log2_min_tb_size: int = 2
    log2_max_tb_size: int = 5
    max_transform_hierarchy_depth_inter: int = 0
    max_transform_hierarchy_depth_intra: int = 0
    scaling_list_enabled: int = 0
    scaling_list: Optional[object] = None
    amp_enabled: int = 0
    sao_enabled: int = 0
    pcm_enabled: int = 0
    pcm_bit_depth: int = 8
    pcm_bit_depth_chroma: int = 8
    pcm_log2_min_size: int = 3
    pcm_log2_max_size: int = 3
    pcm_loop_filter_disabled: int = 0
    st_rps: List[ShortTermRPS] = field(default_factory=list)
    long_term_ref_pics_present: int = 0
    lt_ref_poc_lsb: List[int] = field(default_factory=list)
    lt_used_by_curr: List[int] = field(default_factory=list)
    temporal_mvp_enabled: int = 0
    strong_intra_smoothing_enabled: int = 0
    vui_present: int = 0
    vui: Optional["VUI"] = None
    # range extension (hevc_ps.c:1920-1959); extended_precision /
    # high_precision_offsets / cabac_bypass_alignment parse-only (the
    # reference logs "not yet implemented" for them, hevc_ps.c:1938-1958)
    transform_skip_rotation_enabled: int = 0
    transform_skip_context_enabled: int = 0
    implicit_rdpcm_enabled: int = 0
    explicit_rdpcm_enabled: int = 0
    extended_precision_processing: int = 0
    intra_smoothing_disabled: int = 0
    high_precision_offsets_enabled: int = 0
    persistent_rice_adaptation_enabled: int = 0
    cabac_bypass_alignment_enabled: int = 0
    # SHVC multilayer SPS (hevc_ps.c:1556-1618): geometry comes from the
    # VPS-extension rep_format instead of explicit fields
    layer_id: int = 0
    update_rep_format_flag: int = 0
    update_rep_format_idx: int = 0

    # --- derived ---
    @property
    def num_short_term_rps(self) -> int:
        return len(self.st_rps)

    @property
    def ctb_size(self) -> int:
        return 1 << self.log2_ctb_size

    @property
    def ctb_width(self) -> int:
        return (self.width + self.ctb_size - 1) >> self.log2_ctb_size

    @property
    def ctb_height(self) -> int:
        return (self.height + self.ctb_size - 1) >> self.log2_ctb_size

    @property
    def pic_size_in_ctbs(self) -> int:
        return self.ctb_width * self.ctb_height

    @property
    def min_cb_width(self) -> int:
        return self.width >> self.log2_min_cb_size

    @property
    def min_cb_height(self) -> int:
        return self.height >> self.log2_min_cb_size

    @property
    def min_tb_width(self) -> int:
        return self.width >> self.log2_min_tb_size

    @property
    def min_tb_height(self) -> int:
        return self.height >> self.log2_min_tb_size

    @property
    def min_pu_width(self) -> int:
        return self.width >> 2

    @property
    def min_pu_height(self) -> int:
        return self.height >> 2

    @property
    def qp_bd_offset(self) -> int:
        return 6 * (self.bit_depth - 8)

    @property
    def hshift(self):
        # chroma subsampling shifts per plane index
        if self.chroma_format_idc == 1:
            return (0, 1, 1)
        if self.chroma_format_idc == 2:
            return (0, 1, 1)
        return (0, 0, 0)

    @property
    def vshift(self):
        if self.chroma_format_idc == 1:
            return (0, 1, 1)
        return (0, 0, 0)


def parse_sps(rbsp: bytes, layer_id: int = 0, vps_list=None) -> SPS:
    """layer_id: nuh_layer_id of the SPS NAL; vps_list: {vps_id: VPS} for
    the SHVC multilayer form, whose geometry lives in the VPS rep_format
    (hevc_ps.c:1556-1726)."""
    r = BitReader(rbsp)
    s = SPS()
    s.layer_id = layer_id
    s.vps_id = r.u(4)
    vps = (vps_list or {}).get(s.vps_id)
    if layer_id == 0:
        s.max_sub_layers = r.u(3) + 1
        s.temporal_id_nesting_flag = r.u1()
        s.ptl = parse_ptl(r, s.max_sub_layers)
    else:
        if vps is None:
            raise ValueError("multilayer SPS requires its VPS")
        s.max_sub_layers = vps.max_sub_layers
        s.temporal_id_nesting_flag = vps.temporal_id_nesting_flag
    s.sps_id = r.ue()
    if layer_id > 0:
        s.update_rep_format_flag = r.u1()
        if s.update_rep_format_flag:
            s.update_rep_format_idx = r.u(8)
    else:
        s.chroma_format_idc = r.ue()
        if s.chroma_format_idc == 3:
            s.separate_colour_plane_flag = r.u1()
        s.width = r.ue()
        s.height = r.ue()
    if r.u1():
        s.conf_win = (r.ue(), r.ue(), r.ue(), r.ue())
    if layer_id == 0:
        s.bit_depth = r.ue() + 8
        s.bit_depth_chroma = r.ue() + 8
    else:
        ext = vps.ext
        if ext is None:
            raise ValueError("multilayer SPS requires a VPS extension")
        if s.update_rep_format_flag:
            rf = ext.rep_formats[s.update_rep_format_idx]
        else:
            rf = ext.rep_format_for(layer_id)
        s.width, s.height = rf.pic_width, rf.pic_height
        s.bit_depth = rf.bit_depth_luma
        s.bit_depth_chroma = rf.bit_depth_chroma
        s.chroma_format_idc = 1     # reference supports 4:2:0 EL only
    s.log2_max_poc_lsb = r.ue() + 4
    s.sub_layer_ordering_info_present = r.u1()
    start = 0 if s.sub_layer_ordering_info_present else s.max_sub_layers - 1
    s.max_dec_pic_buffering, s.num_reorder_pics, s.max_latency_increase = [], [], []
    for _ in range(start, s.max_sub_layers):
        s.max_dec_pic_buffering.append(r.ue() + 1)
        s.num_reorder_pics.append(r.ue())
        s.max_latency_increase.append(r.ue() - 1)
    s.log2_min_cb_size = r.ue() + 3
    s.log2_ctb_size = s.log2_min_cb_size + r.ue()
    s.log2_min_tb_size = r.ue() + 2
    s.log2_max_tb_size = s.log2_min_tb_size + r.ue()
    s.max_transform_hierarchy_depth_inter = r.ue()
    s.max_transform_hierarchy_depth_intra = r.ue()
    s.scaling_list_enabled = r.u1()
    if s.scaling_list_enabled:
        # SHVC scaling-list inference (hevc_ps.c:1810-1822)
        infer = r.u1() if layer_id > 0 else 0
        if infer:
            r.ue()                          # sps_scaling_list_ref_layer_id
            s.scaling_list_enabled = 0
        elif r.u1():                        # sps_scaling_list_data_present
            from .scaling import parse_scaling_list
            s.scaling_list = parse_scaling_list(r, s.chroma_format_idc)
        else:
            s.scaling_list = None           # default lists
    s.amp_enabled = r.u1()
    s.sao_enabled = r.u1()
    s.pcm_enabled = r.u1()
    if s.pcm_enabled:
        s.pcm_bit_depth = r.u(4) + 1
        s.pcm_bit_depth_chroma = r.u(4) + 1
        s.pcm_log2_min_size = r.ue() + 3
        s.pcm_log2_max_size = s.pcm_log2_min_size + r.ue()
        s.pcm_loop_filter_disabled = r.u1()
    nrps = r.ue()
    s.st_rps = []
    for i in range(nrps):
        s.st_rps.append(parse_strps(r, s, i, is_slice_header=False))
    s.long_term_ref_pics_present = r.u1()
    if s.long_term_ref_pics_present:
        n = r.ue()
        for _ in range(n):
            s.lt_ref_poc_lsb.append(r.u(s.log2_max_poc_lsb))
            s.lt_used_by_curr.append(r.u1())
    s.temporal_mvp_enabled = r.u1()
    s.strong_intra_smoothing_enabled = r.u1()
    s.vui_present = r.u1()
    if s.vui_present:
        s.vui = parse_vui(r, s.max_sub_layers)
    if r.u1():                              # sps_extension_present_flag
        range_ext = r.u1()                  # sps_range_extension_flag
        r.u(7)                              # sps_extension_7bits
        if range_ext:
            s.transform_skip_rotation_enabled = r.u1()
            s.transform_skip_context_enabled = r.u1()
            s.implicit_rdpcm_enabled = r.u1()
            s.explicit_rdpcm_enabled = r.u1()
            s.extended_precision_processing = r.u1()
            s.intra_smoothing_disabled = r.u1()
            s.high_precision_offsets_enabled = r.u1()
            s.persistent_rice_adaptation_enabled = r.u1()
            s.cabac_bypass_alignment_enabled = r.u1()
    return s


def write_sps(s: SPS) -> bytes:
    w = BitWriter()
    w.u(s.vps_id, 4)
    if s.layer_id == 0:
        w.u(s.max_sub_layers - 1, 3)
        w.u1(s.temporal_id_nesting_flag)
        write_ptl(w, s.ptl, s.max_sub_layers)
    w.ue(s.sps_id)
    if s.layer_id > 0:
        w.u1(s.update_rep_format_flag)
        if s.update_rep_format_flag:
            w.u(s.update_rep_format_idx, 8)
    else:
        w.ue(s.chroma_format_idc)
        if s.chroma_format_idc == 3:
            w.u1(s.separate_colour_plane_flag)
        w.ue(s.width)
        w.ue(s.height)
    if any(s.conf_win):
        w.u1(1)
        for v in s.conf_win:
            w.ue(v)
    else:
        w.u1(0)
    if s.layer_id == 0:
        w.ue(s.bit_depth - 8)
        w.ue(s.bit_depth_chroma - 8)
    w.ue(s.log2_max_poc_lsb - 4)
    w.u1(1)                                 # sub_layer_ordering_info_present
    for i in range(s.max_sub_layers):
        w.ue(s.max_dec_pic_buffering[i] - 1)
        w.ue(s.num_reorder_pics[i])
        w.ue(s.max_latency_increase[i] + 1)
    w.ue(s.log2_min_cb_size - 3)
    w.ue(s.log2_ctb_size - s.log2_min_cb_size)
    w.ue(s.log2_min_tb_size - 2)
    w.ue(s.log2_max_tb_size - s.log2_min_tb_size)
    w.ue(s.max_transform_hierarchy_depth_inter)
    w.ue(s.max_transform_hierarchy_depth_intra)
    w.u1(s.scaling_list_enabled)
    if s.scaling_list_enabled:
        if s.layer_id > 0:
            w.u1(0)                         # sps_infer_scaling_list_flag
        if s.scaling_list is not None:
            w.u1(1)
            from .scaling import write_scaling_list
            write_scaling_list(w, s.scaling_list)
        else:
            w.u1(0)                         # use default scaling lists
    w.u1(s.amp_enabled)
    w.u1(s.sao_enabled)
    w.u1(s.pcm_enabled)
    if s.pcm_enabled:
        w.u(s.pcm_bit_depth - 1, 4)
        w.u(s.pcm_bit_depth_chroma - 1, 4)
        w.ue(s.pcm_log2_min_size - 3)
        w.ue(s.pcm_log2_max_size - s.pcm_log2_min_size)
        w.u1(s.pcm_loop_filter_disabled)
    w.ue(len(s.st_rps))
    for i, rps in enumerate(s.st_rps):
        write_strps(w, rps, i, s)
    w.u1(s.long_term_ref_pics_present)
    if s.long_term_ref_pics_present:
        w.ue(len(s.lt_ref_poc_lsb))
        for lsb, used in zip(s.lt_ref_poc_lsb, s.lt_used_by_curr):
            w.u(lsb, s.log2_max_poc_lsb)
            w.u1(used)
    w.u1(s.temporal_mvp_enabled)
    w.u1(s.strong_intra_smoothing_enabled)
    w.u1(0)                                 # vui_parameters_present_flag
    rext = (s.transform_skip_rotation_enabled
            or s.transform_skip_context_enabled or s.implicit_rdpcm_enabled
            or s.explicit_rdpcm_enabled or s.extended_precision_processing
            or s.intra_smoothing_disabled
            or s.high_precision_offsets_enabled
            or s.persistent_rice_adaptation_enabled
            or s.cabac_bypass_alignment_enabled)
    if rext:
        w.u1(1)                             # sps_extension_present_flag
        w.u1(1)                             # sps_range_extension_flag
        w.u(0, 7)                           # sps_extension_7bits
        w.u1(s.transform_skip_rotation_enabled)
        w.u1(s.transform_skip_context_enabled)
        w.u1(s.implicit_rdpcm_enabled)
        w.u1(s.explicit_rdpcm_enabled)
        w.u1(s.extended_precision_processing)
        w.u1(s.intra_smoothing_disabled)
        w.u1(s.high_precision_offsets_enabled)
        w.u1(s.persistent_rice_adaptation_enabled)
        w.u1(s.cabac_bypass_alignment_enabled)
    else:
        w.u1(0)                             # sps_extension_flag
    w.rbsp_trailing_bits()
    return w.get_bytes()


# ---------------------------------------------------------------------------
# PPS
# ---------------------------------------------------------------------------

@dataclass
class PPS:
    pps_id: int = 0
    sps_id: int = 0
    layer_id: int = 0                       # nuh_layer_id of this PPS's NALs
    infer_scaling_list: int = 0             # SHVC (SCALINGLIST_INFERRING)
    scaling_list_ref_layer_id: int = 0
    dependent_slice_segments_enabled: int = 0
    output_flag_present: int = 0
    num_extra_slice_header_bits: int = 0
    sign_data_hiding: int = 0
    cabac_init_present: int = 0
    num_ref_idx_l0_default: int = 1
    num_ref_idx_l1_default: int = 1
    init_qp: int = 26                       # 26 + init_qp_minus26
    constrained_intra_pred: int = 0
    transform_skip_enabled: int = 0
    cu_qp_delta_enabled: int = 0
    diff_cu_qp_delta_depth: int = 0
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    slice_chroma_qp_offsets_present: int = 0
    weighted_pred: int = 0
    weighted_bipred: int = 0
    transquant_bypass_enabled: int = 0
    tiles_enabled: int = 0
    entropy_coding_sync_enabled: int = 0
    num_tile_columns: int = 1
    num_tile_rows: int = 1
    uniform_spacing: int = 1
    column_widths: Optional[List[int]] = None   # in CTBs; derived if uniform
    row_heights: Optional[List[int]] = None
    loop_filter_across_tiles_enabled: int = 1
    loop_filter_across_slices_enabled: int = 0
    deblocking_filter_control_present: int = 0
    deblocking_filter_override_enabled: int = 0
    deblocking_filter_disabled: int = 0
    beta_offset: int = 0                    # *2 applied already
    tc_offset: int = 0
    scaling_list_data_present: int = 0
    scaling_list: Optional[object] = None
    lists_modification_present: int = 0
    log2_parallel_merge_level: int = 2
    slice_header_extension_present: int = 0
    # range extension (hevc_ps.c:2086-2151); chroma_qp_offset_list and
    # log2_max_transform_skip_block_size>2 parse-only, mirroring the
    # reference's partial support
    log2_max_transform_skip_block_size: int = 2
    cross_component_prediction_enabled: int = 0
    chroma_qp_offset_list_enabled: int = 0
    diff_cu_chroma_qp_offset_depth: int = 0
    cb_qp_offset_list: List[int] = field(default_factory=list)
    cr_qp_offset_list: List[int] = field(default_factory=list)
    log2_sao_offset_scale_luma: int = 0
    log2_sao_offset_scale_chroma: int = 0
    has_range_ext: int = 0

    # derived (filled by finalize(sps))
    col_bd: Optional[np.ndarray] = None
    row_bd: Optional[np.ndarray] = None
    ctb_addr_rs_to_ts: Optional[np.ndarray] = None
    ctb_addr_ts_to_rs: Optional[np.ndarray] = None
    tile_id: Optional[np.ndarray] = None            # indexed by ts
    min_tb_addr_zs: Optional[np.ndarray] = None     # [y][x] in min-TB units
    ctb_row_to_rs: Optional[np.ndarray] = None

    def finalize(self, sps: SPS):
        """Compute tile boundary + address maps (spec 6.5.1/6.5.2)."""
        w_ctbs, h_ctbs = sps.ctb_width, sps.ctb_height
        nc, nr = self.num_tile_columns, self.num_tile_rows
        if not self.tiles_enabled:
            nc = nr = 1
        if self.uniform_spacing or self.column_widths is None:
            colw = [((i + 1) * w_ctbs) // nc - (i * w_ctbs) // nc for i in range(nc)]
        else:
            colw = list(self.column_widths)
        if self.uniform_spacing or self.row_heights is None:
            rowh = [((i + 1) * h_ctbs) // nr - (i * h_ctbs) // nr for i in range(nr)]
        else:
            rowh = list(self.row_heights)
        self._col_width, self._row_height = colw, rowh
        col_bd = np.zeros(nc + 1, np.int32)
        row_bd = np.zeros(nr + 1, np.int32)
        for i in range(nc):
            col_bd[i + 1] = col_bd[i] + colw[i]
        for i in range(nr):
            row_bd[i + 1] = row_bd[i] + rowh[i]
        self.col_bd, self.row_bd = col_bd, row_bd

        pic_size = w_ctbs * h_ctbs
        rs_to_ts = np.zeros(pic_size, np.int32)
        for rs in range(pic_size):
            tb_x, tb_y = rs % w_ctbs, rs // w_ctbs
            tile_x = int(np.searchsorted(col_bd, tb_x, side="right")) - 1
            tile_y = int(np.searchsorted(row_bd, tb_y, side="right")) - 1
            ts = 0
            # all tiles before this one in tile raster order
            for ty in range(nr):
                for tx in range(nc):
                    if ty < tile_y or (ty == tile_y and tx < tile_x):
                        ts += colw[tx] * rowh[ty]
            ts += (tb_y - row_bd[tile_y]) * colw[tile_x] + (tb_x - col_bd[tile_x])
            rs_to_ts[rs] = ts
        ts_to_rs = np.zeros(pic_size, np.int32)
        ts_to_rs[rs_to_ts] = np.arange(pic_size, dtype=np.int32)
        self.ctb_addr_rs_to_ts = rs_to_ts
        self.ctb_addr_ts_to_rs = ts_to_rs

        tile_id = np.zeros(pic_size, np.int32)
        tid = 0
        for ty in range(nr):
            for tx in range(nc):
                for y in range(row_bd[ty], row_bd[ty + 1]):
                    for x in range(col_bd[tx], col_bd[tx + 1]):
                        tile_id[rs_to_ts[y * w_ctbs + x]] = tid
                tid += 1
        self.tile_id = tile_id

        # ctb_row_to_rs: first ctb (rs) of each ctb row (for WPP entry points)
        self.ctb_row_to_rs = np.arange(h_ctbs, dtype=np.int32) * w_ctbs

        # z-scan order array in min-TB granularity (spec 6.5.2)
        log2_diff = sps.log2_ctb_size - sps.log2_min_tb_size
        mtb_w = w_ctbs << log2_diff
        mtb_h = h_ctbs << log2_diff
        zs = np.zeros((mtb_h, mtb_w), np.int64)
        xs = np.arange(mtb_w, dtype=np.int64)
        ys = np.arange(mtb_h, dtype=np.int64)
        tb_x = (xs << sps.log2_min_tb_size) >> sps.log2_ctb_size
        tb_y = (ys << sps.log2_min_tb_size) >> sps.log2_ctb_size
        base = rs_to_ts[(tb_y[:, None] * w_ctbs + tb_x[None, :])].astype(np.int64) \
            << (2 * log2_diff)
        interleave_x = np.zeros(mtb_w, np.int64)
        interleave_y = np.zeros(mtb_h, np.int64)
        for i in range(log2_diff):
            m = 1 << i
            interleave_x += (xs & m) * m          # (m & x) ? m*m : 0
            interleave_y += (ys & m) * 2 * m      # (m & y) ? 2*m*m : 0
        zs = base + interleave_x[None, :] + interleave_y[:, None]
        self.min_tb_addr_zs = zs


def parse_pps(rbsp: bytes, layer_id: int = 0, sps_list=None) -> PPS:
    r = BitReader(rbsp)
    p = PPS()
    p.layer_id = layer_id
    p.pps_id = r.ue()
    p.sps_id = r.ue()
    p.dependent_slice_segments_enabled = r.u1()
    p.output_flag_present = r.u1()
    p.num_extra_slice_header_bits = r.u(3)
    p.sign_data_hiding = r.u1()
    p.cabac_init_present = r.u1()
    p.num_ref_idx_l0_default = r.ue() + 1
    p.num_ref_idx_l1_default = r.ue() + 1
    p.init_qp = 26 + r.se()
    p.constrained_intra_pred = r.u1()
    p.transform_skip_enabled = r.u1()
    p.cu_qp_delta_enabled = r.u1()
    if p.cu_qp_delta_enabled:
        p.diff_cu_qp_delta_depth = r.ue()
    p.cb_qp_offset = r.se()
    p.cr_qp_offset = r.se()
    p.slice_chroma_qp_offsets_present = r.u1()
    p.weighted_pred = r.u1()
    p.weighted_bipred = r.u1()
    p.transquant_bypass_enabled = r.u1()
    p.tiles_enabled = r.u1()
    p.entropy_coding_sync_enabled = r.u1()
    if p.tiles_enabled:
        p.num_tile_columns = r.ue() + 1
        p.num_tile_rows = r.ue() + 1
        p.uniform_spacing = r.u1()
        if not p.uniform_spacing:
            p.column_widths = [r.ue() + 1 for _ in range(p.num_tile_columns - 1)]
            p.row_heights = [r.ue() + 1 for _ in range(p.num_tile_rows - 1)]
        p.loop_filter_across_tiles_enabled = r.u1()
    p.loop_filter_across_slices_enabled = r.u1()
    p.deblocking_filter_control_present = r.u1()
    if p.deblocking_filter_control_present:
        p.deblocking_filter_override_enabled = r.u1()
        p.deblocking_filter_disabled = r.u1()
        if not p.deblocking_filter_disabled:
            p.beta_offset = r.se() * 2
            p.tc_offset = r.se() * 2
    # SHVC inter-layer scaling-list inference (SCALINGLIST_INFERRING,
    # hevc_ps.c:2380-2390): layer>0 PPSs carry pps_infer_scaling_list_flag
    p.infer_scaling_list = r.u1() if layer_id > 0 else 0
    if p.infer_scaling_list:
        p.scaling_list_ref_layer_id = r.ue()
        p.scaling_list_data_present = 0
    else:
        p.scaling_list_data_present = r.u1()
        if p.scaling_list_data_present:
            from .scaling import parse_scaling_list
            p.scaling_list = parse_scaling_list(r)
    p.lists_modification_present = r.u1()
    p.log2_parallel_merge_level = r.ue() + 2
    p.slice_header_extension_present = r.u1()
    # the reference gates pps_range_extensions on the RExt profile
    # (hevc_ps.c:2421-2427)
    if r.u1():                              # pps_extension_present_flag
        range_ext = r.u1()
        r.u(7)                              # pps_extension_7bits
        sps = (sps_list or {}).get(p.sps_id)
        if range_ext and sps is not None and sps.ptl.profile_idc == 4:
            p.has_range_ext = 1
            if p.transform_skip_enabled:
                p.log2_max_transform_skip_block_size = r.ue() + 2
            p.cross_component_prediction_enabled = r.u1()
            p.chroma_qp_offset_list_enabled = r.u1()
            if p.chroma_qp_offset_list_enabled:
                p.diff_cu_chroma_qp_offset_depth = r.ue()
                n = r.ue() + 1
                for _ in range(n):
                    p.cb_qp_offset_list.append(r.se())
                    p.cr_qp_offset_list.append(r.se())
            p.log2_sao_offset_scale_luma = r.ue()
            p.log2_sao_offset_scale_chroma = r.ue()
    return p


def write_pps(p: PPS, sps: SPS) -> bytes:
    w = BitWriter()
    w.ue(p.pps_id)
    w.ue(p.sps_id)
    w.u1(p.dependent_slice_segments_enabled)
    w.u1(p.output_flag_present)
    w.u(p.num_extra_slice_header_bits, 3)
    w.u1(p.sign_data_hiding)
    w.u1(p.cabac_init_present)
    w.ue(p.num_ref_idx_l0_default - 1)
    w.ue(p.num_ref_idx_l1_default - 1)
    w.se(p.init_qp - 26)
    w.u1(p.constrained_intra_pred)
    w.u1(p.transform_skip_enabled)
    w.u1(p.cu_qp_delta_enabled)
    if p.cu_qp_delta_enabled:
        w.ue(p.diff_cu_qp_delta_depth)
    w.se(p.cb_qp_offset)
    w.se(p.cr_qp_offset)
    w.u1(p.slice_chroma_qp_offsets_present)
    w.u1(p.weighted_pred)
    w.u1(p.weighted_bipred)
    w.u1(p.transquant_bypass_enabled)
    w.u1(p.tiles_enabled)
    w.u1(p.entropy_coding_sync_enabled)
    if p.tiles_enabled:
        w.ue(p.num_tile_columns - 1)
        w.ue(p.num_tile_rows - 1)
        w.u1(p.uniform_spacing)
        if not p.uniform_spacing:
            for cw in p.column_widths[:-1]:
                w.ue(cw - 1)
            for rh in p.row_heights[:-1]:
                w.ue(rh - 1)
        w.u1(p.loop_filter_across_tiles_enabled)
    w.u1(p.loop_filter_across_slices_enabled)
    w.u1(p.deblocking_filter_control_present)
    if p.deblocking_filter_control_present:
        w.u1(p.deblocking_filter_override_enabled)
        w.u1(p.deblocking_filter_disabled)
        if not p.deblocking_filter_disabled:
            w.se(p.beta_offset // 2)
            w.se(p.tc_offset // 2)
    if p.layer_id > 0:
        w.u1(0)                             # pps_infer_scaling_list_flag
    if p.scaling_list_data_present and p.scaling_list is not None:
        w.u1(1)
        from .scaling import write_scaling_list
        write_scaling_list(w, p.scaling_list)
    else:
        w.u1(0)                             # pps_scaling_list_data_present
    w.u1(p.lists_modification_present)
    w.ue(p.log2_parallel_merge_level - 2)
    w.u1(p.slice_header_extension_present)
    rext = (p.has_range_ext or p.cross_component_prediction_enabled
            or p.log2_max_transform_skip_block_size > 2
            or p.chroma_qp_offset_list_enabled
            or p.log2_sao_offset_scale_luma or p.log2_sao_offset_scale_chroma)
    if rext:
        w.u1(1)                             # pps_extension_present_flag
        w.u1(1)                             # pps_range_extension_flag
        w.u(0, 7)
        if p.transform_skip_enabled:
            w.ue(p.log2_max_transform_skip_block_size - 2)
        w.u1(p.cross_component_prediction_enabled)
        w.u1(p.chroma_qp_offset_list_enabled)
        if p.chroma_qp_offset_list_enabled:
            w.ue(p.diff_cu_chroma_qp_offset_depth)
            w.ue(len(p.cb_qp_offset_list) - 1)
            for cb, cr in zip(p.cb_qp_offset_list, p.cr_qp_offset_list):
                w.se(cb)
                w.se(cr)
        w.ue(p.log2_sao_offset_scale_luma)
        w.ue(p.log2_sao_offset_scale_chroma)
    else:
        w.u1(0)                             # pps_extension_flag
    w.rbsp_trailing_bits()
    return w.get_bytes()
