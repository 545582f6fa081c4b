"""SHVC VPS extension: scalability structure, rep formats, dependencies.

Bit-for-bit mirror of the reference's parse_vps_extension
(libavcodec/hevc_ps.c:714-1095) with every compile-time feature macro at its
shipped value (hevc_defs.h), plus a canonical writer emitting exactly the
fields that parser consumes.  This is what carries the enhancement-layer
geometry (rep_format), the BL->EL dependency, and the inter-layer RPS knobs
(max_one_active_ref_layer_flag, poc_lsb_not_present_flag, phase alignment).
"""

from dataclasses import dataclass, field
from typing import List, Optional

from ..bitstream.bits import BitReader, BitWriter
from .params import PTL, parse_ptl, write_ptl

MAX_VPS_NUM_SCALABILITY_TYPES = 16


@dataclass
class RepFormat:
    """rep_format() (hevc_ps.c:411-468, REPN_FORMAT_CONTROL_FLAG form)."""
    chroma_and_bit_depth_present: int = 1
    pic_width: int = 0
    pic_height: int = 0
    chroma_format_idc: int = 1
    separate_colour_plane: int = 0
    bit_depth_luma: int = 8
    bit_depth_chroma: int = 8


@dataclass
class VPSExt:
    avc_base_layer: int = 0
    splitting_flag: int = 0
    scalability_mask: List[int] = field(
        default_factory=lambda: [0] * MAX_VPS_NUM_SCALABILITY_TYPES)
    dimension_id_len: List[int] = field(default_factory=list)
    nuh_layer_id_present: int = 0
    layer_id_in_nuh: List[int] = field(default_factory=lambda: [0])
    dimension_id: List[List[int]] = field(default_factory=list)
    view_id_len_minus1: int = 0
    view_id_val: List[int] = field(default_factory=lambda: [0])
    # direct_dependency[i][j]: layer (vps index) i depends on layer j
    direct_dependency: List[List[int]] = field(default_factory=list)
    max_ts_layers_present: int = 0
    max_ts_layer_minus1: List[int] = field(default_factory=list)
    max_tid_ref_present: int = 0
    max_tid_il_ref_pics_plus1: List[List[int]] = field(default_factory=list)
    ilp_ssh: int = 0                       # all_ref_layers_active_flag
    num_profile_tier_level: int = 2
    ptl_present: List[int] = field(default_factory=list)
    ptl_ext: List[PTL] = field(default_factory=list)
    more_output_layer_sets: int = 0
    num_add_output_layer_sets: int = 0
    default_one_target_output: int = 0
    profile_level_tier_idx: List[int] = field(default_factory=list)
    alt_output_layer: int = 0
    rep_format_idx_present: int = 0
    rep_formats: List[RepFormat] = field(default_factory=list)
    rep_format_idx: List[int] = field(default_factory=list)
    max_one_active_ref_layer: int = 1
    poc_lsb_not_present: List[int] = field(default_factory=list)
    phase_align: int = 0
    # DPB size table, per output layer set >=1: (sub_layer_flag_info,
    #   [per sub-layer: (present, [dpb_minus1...], reorder, latency_plus1)])
    dpb_size_table: List[tuple] = field(default_factory=list)
    direct_dep_type_len: int = 2
    default_dep_type_flag: int = 1
    default_dep_type: int = 2
    direct_dep_type: List[List[int]] = field(default_factory=list)
    single_layer_for_non_irap: int = 0
    higher_layer_irap_skip: int = 0

    # ---- derived helpers -------------------------------------------------
    def num_direct_ref_layers(self, nuh_layer_id: int) -> int:
        idx = self.layer_idx_of(nuh_layer_id)
        if idx is None or idx == 0 or idx >= len(self.direct_dependency) + 1:
            return 0
        return sum(self.direct_dependency[idx - 1])

    def ref_layer_ids(self, nuh_layer_id: int) -> List[int]:
        idx = self.layer_idx_of(nuh_layer_id)
        if idx is None or idx == 0:
            return []
        return [j for j, f in enumerate(self.direct_dependency[idx - 1]) if f]

    def layer_idx_of(self, nuh_layer_id: int) -> Optional[int]:
        try:
            return self.layer_id_in_nuh.index(nuh_layer_id)
        except ValueError:
            return None

    def rep_format_for(self, layer_idx: int) -> RepFormat:
        if self.rep_format_idx_present and layer_idx < len(self.rep_format_idx):
            i = self.rep_format_idx[layer_idx]
        else:
            i = layer_idx if len(self.rep_formats) > 1 else 0
        return self.rep_formats[min(i, len(self.rep_formats) - 1)]


def _num_layer_in_id_list(vps) -> List[int]:
    """deriveLayerIdListVariables (hevc_ps.c:472-489)."""
    out = [1]
    for i in range(1, vps.num_layer_sets):
        inc = vps.layer_id_included[i - 1] if i - 1 < len(
            vps.layer_id_included) else []
        out.append(sum(1 for f in inc if f))
    return out


def parse_rep_format(r: BitReader) -> RepFormat:
    rf = RepFormat()
    rf.chroma_and_bit_depth_present = r.u1()
    rf.pic_width = r.u(16)
    rf.pic_height = r.u(16)
    if rf.chroma_and_bit_depth_present:
        rf.chroma_format_idc = r.u(2)
        if rf.chroma_format_idc == 3:
            rf.separate_colour_plane = r.u1()
        rf.bit_depth_luma = r.u(4) + 8
        rf.bit_depth_chroma = r.u(4) + 8
    return rf


def write_rep_format(w: BitWriter, rf: RepFormat):
    w.u1(rf.chroma_and_bit_depth_present)
    w.u(rf.pic_width, 16)
    w.u(rf.pic_height, 16)
    if rf.chroma_and_bit_depth_present:
        w.u(rf.chroma_format_idc, 2)
        if rf.chroma_format_idc == 3:
            w.u1(rf.separate_colour_plane)
        w.u(rf.bit_depth_luma - 8, 4)
        w.u(rf.bit_depth_chroma - 8, 4)
    return w


def parse_vps_extension(r: BitReader, vps) -> VPSExt:
    """vps: the already-parsed base VPS (params.VPS).  Reader must be
    byte-aligned by the caller (align_get_bits before parse_vps_extension)."""
    e = VPSExt()
    max_layers = vps.max_layers
    e.avc_base_layer = r.u1()
    e.splitting_flag = r.u1()
    e.scalability_mask = [r.u1() for _ in range(MAX_VPS_NUM_SCALABILITY_TYPES)]
    n_scal = sum(e.scalability_mask)
    e.dimension_id_len = [r.u(3) + 1 for _ in range(n_scal - e.splitting_flag)]
    if e.splitting_flag:
        used = sum(e.dimension_id_len[:n_scal - 1])
        e.dimension_id_len.append(6 - used)
    e.nuh_layer_id_present = r.u1()
    e.layer_id_in_nuh = [0]
    e.dimension_id = []
    for i in range(1, max_layers):
        e.layer_id_in_nuh.append(r.u(6) if e.nuh_layer_id_present else i)
        e.dimension_id.append([r.u(e.dimension_id_len[j])
                               for j in range(n_scal)])
    # view_id: the reference derives numViews from a never-written mask
    # (getNumViews reads m_scalabilityMask, parse fills scalability_mask —
    # hevc_ps.c:356/727), so exactly one view_id_val is coded
    e.view_id_len_minus1 = r.u(4)
    e.view_id_val = [r.u(e.view_id_len_minus1 + 1)]
    e.direct_dependency = [[r.u1() for _ in range(i)]
                           for i in range(1, max_layers)]
    e.max_ts_layers_present = r.u1()
    if e.max_ts_layers_present:
        e.max_ts_layer_minus1 = [r.u(3) for _ in range(max_layers - 1)]
    e.max_tid_ref_present = r.u1()
    e.max_tid_il_ref_pics_plus1 = [[7] * max_layers for _ in range(max_layers)]
    if e.max_tid_ref_present:
        for i in range(max_layers - 1):
            for j in range(i + 1, max_layers):
                if e.direct_dependency[j - 1][i]:
                    e.max_tid_il_ref_pics_plus1[i][j] = r.u(3)
    e.ilp_ssh = r.u1()
    n_sets_m1 = r.u(10)
    if n_sets_m1 != vps.num_layer_sets - 1:
        raise ValueError("vps_number_layer_sets_minus1 mismatch")
    e.num_profile_tier_level = r.u(6) + 1
    e.ptl_present = [1]
    e.ptl_ext = [vps.ptl]
    for _ in range(1, e.num_profile_tier_level):
        present = r.u1()
        e.ptl_present.append(present)
        if not present:
            r.u(6)                          # profile_ref_minus1 (copy source)
        # NOTE the reference parses a full PTL regardless of the flag
        # (hevc_ps.c:890-896)
        e.ptl_ext.append(parse_ptl(r, vps.max_sub_layers))
    e.more_output_layer_sets = r.u1()
    if e.more_output_layer_sets:
        e.num_add_output_layer_sets = r.u(10)
    n_out_sets = vps.num_layer_sets + e.num_add_output_layer_sets
    if n_out_sets > 1:
        e.default_one_target_output = r.u1()
    nll = _num_layer_in_id_list(vps)
    out_set_idx = [0]
    e.profile_level_tier_idx = [0]
    for i in range(1, n_out_sets):
        if i > vps.num_layer_sets - 1:
            nbits = 1
            while (1 << nbits) < (vps.num_layer_sets - 1):
                nbits += 1
            idx = r.u(nbits) + 1
            out_set_idx.append(idx)
            for _ in range(max(0, nll[idx] - 1)):
                r.u1()                      # output_layer_flag
        else:
            out_set_idx.append(i)
        nbits = 1
        while (1 << nbits) < e.num_profile_tier_level:
            nbits += 1
        e.profile_level_tier_idx.append(r.u(nbits))
    if max_layers > 1:
        e.alt_output_layer = r.u1()
    e.rep_format_idx_present = r.u1()
    n_rep = r.u(8) + 1 if e.rep_format_idx_present else max_layers
    e.rep_formats = [parse_rep_format(r) for _ in range(n_rep)]
    e.rep_format_idx = [0]
    if e.rep_format_idx_present:
        for _ in range(1, max_layers):
            e.rep_format_idx.append(r.u(8) if n_rep > 1 else 0)
    else:
        e.rep_format_idx = list(range(max_layers))
    e.max_one_active_ref_layer = r.u1()
    e.poc_lsb_not_present = [0] * max_layers
    for i in range(1, max_layers):
        nuh = e.layer_id_in_nuh[i]
        idx = e.layer_idx_of(nuh)
        ndirect = sum(e.direct_dependency[idx - 1]) if idx else 0
        if ndirect == 0:
            e.poc_lsb_not_present[i] = r.u1()
    e.phase_align = r.u1()
    # DPB size table (VPS_DPB_SIZE_TABLE)
    e.dpb_size_table = []
    for i in range(1, n_out_sets):
        sub_flag = r.u1()
        n_sub_dpbs = nll[out_set_idx[i]]
        rows = []
        for j in range(vps.max_sub_layers):
            present = r.u1() if (j > 0 and sub_flag) else (1 if j == 0 else 0)
            if present:
                dpbs = [r.ue() for _ in range(n_sub_dpbs)]
                reorder = r.ue()
                latency = r.ue()
                rows.append((1, dpbs, reorder, latency))
            else:
                rows.append((0, [], 0, 0))
        e.dpb_size_table.append((sub_flag, rows))
    e.direct_dep_type_len = r.ue() + 2
    e.default_dep_type_flag = r.u1()
    if e.default_dep_type_flag:
        e.default_dep_type = r.u(e.direct_dep_type_len)
    e.direct_dep_type = []
    for i in range(1, max_layers):
        row = []
        for j in range(i):
            if e.direct_dependency[i - 1][j] and not e.default_dep_type_flag:
                row.append(r.u1())
            else:
                row.append(e.default_dep_type)
        e.direct_dep_type.append(row)
    e.single_layer_for_non_irap = r.u1()
    e.higher_layer_irap_skip = r.u1()
    if r.u1():                              # vps_vui_present
        r.align()
        # VPS VUI is informative only; the writer never emits it and real
        # SHM streams' VUI trails to the RBSP end — stop parsing here.
    return e


def write_vps_extension(w: BitWriter, vps, e: VPSExt):
    max_layers = vps.max_layers
    w.u1(e.avc_base_layer)
    w.u1(e.splitting_flag)
    for f in e.scalability_mask:
        w.u1(f)
    n_scal = sum(e.scalability_mask)
    for j in range(n_scal - e.splitting_flag):
        w.u(e.dimension_id_len[j] - 1, 3)
    w.u1(e.nuh_layer_id_present)
    for i in range(1, max_layers):
        if e.nuh_layer_id_present:
            w.u(e.layer_id_in_nuh[i], 6)
        for j in range(n_scal):
            w.u(e.dimension_id[i - 1][j], e.dimension_id_len[j])
    w.u(e.view_id_len_minus1, 4)
    w.u(e.view_id_val[0], e.view_id_len_minus1 + 1)
    for i in range(1, max_layers):
        for j in range(i):
            w.u1(e.direct_dependency[i - 1][j])
    w.u1(e.max_ts_layers_present)
    if e.max_ts_layers_present:
        for i in range(max_layers - 1):
            w.u(e.max_ts_layer_minus1[i], 3)
    w.u1(e.max_tid_ref_present)
    if e.max_tid_ref_present:
        for i in range(max_layers - 1):
            for j in range(i + 1, max_layers):
                if e.direct_dependency[j - 1][i]:
                    w.u(e.max_tid_il_ref_pics_plus1[i][j], 3)
    w.u1(e.ilp_ssh)
    w.u(vps.num_layer_sets - 1, 10)
    w.u(e.num_profile_tier_level - 1, 6)
    for i in range(1, e.num_profile_tier_level):
        w.u1(1)                             # vps_profile_present_flag
        write_ptl(w, e.ptl_ext[i] if i < len(e.ptl_ext) else vps.ptl,
                  vps.max_sub_layers)
    w.u1(e.more_output_layer_sets)
    if e.more_output_layer_sets:
        w.u(e.num_add_output_layer_sets, 10)
    n_out_sets = vps.num_layer_sets + e.num_add_output_layer_sets
    if n_out_sets > 1:
        w.u1(e.default_one_target_output)
    for i in range(1, n_out_sets):
        assert i <= vps.num_layer_sets - 1, "additional output sets unsupported"
        nbits = 1
        while (1 << nbits) < e.num_profile_tier_level:
            nbits += 1
        w.u(e.profile_level_tier_idx[i] if i < len(e.profile_level_tier_idx)
            else min(i, e.num_profile_tier_level - 1), nbits)
    if max_layers > 1:
        w.u1(e.alt_output_layer)
    w.u1(e.rep_format_idx_present)
    assert not e.rep_format_idx_present, "canonical writer: one rep per layer"
    for rf in e.rep_formats:
        write_rep_format(w, rf)
    w.u1(e.max_one_active_ref_layer)
    for i in range(1, max_layers):
        ndirect = sum(e.direct_dependency[i - 1])
        if ndirect == 0:
            w.u1(e.poc_lsb_not_present[i]
                 if i < len(e.poc_lsb_not_present) else 0)
    w.u1(e.phase_align)
    nll = _num_layer_in_id_list(vps)
    for i in range(1, n_out_sets):
        table = (e.dpb_size_table[i - 1] if i - 1 < len(e.dpb_size_table)
                 else (0, []))
        sub_flag = table[0]
        w.u1(sub_flag)
        for j in range(vps.max_sub_layers):
            rows = table[1]
            row = rows[j] if j < len(rows) else (1 if j == 0 else 0,
                                                 [4] * nll[i], 0, 0)
            if j > 0 and sub_flag:
                w.u1(row[0])
            if (j == 0) or (sub_flag and row[0]):
                dpbs = row[1] or [4] * nll[i]
                for k in range(nll[i]):
                    w.ue(dpbs[k] if k < len(dpbs) else 4)
                w.ue(row[2])
                w.ue(row[3])
    w.ue(e.direct_dep_type_len - 2)
    w.u1(e.default_dep_type_flag)
    if e.default_dep_type_flag:
        w.u(e.default_dep_type, e.direct_dep_type_len)
    for i in range(1, max_layers):
        for j in range(i):
            if e.direct_dependency[i - 1][j] and not e.default_dep_type_flag:
                w.u1(e.direct_dep_type[i - 1][j])
    w.u1(e.single_layer_for_non_irap)
    w.u1(e.higher_layer_irap_skip)
    w.u1(0)                                 # vps_vui_present_flag
    return w


def make_shvc_vps_ext(width_bl, height_bl, width_el, height_el,
                      bit_depth=8, phase_align=0) -> VPSExt:
    """Canonical 2-layer spatial/SNR-scalable VPS extension."""
    e = VPSExt()
    e.scalability_mask[2] = 1               # scalability dimension (SHM)
    e.dimension_id_len = [1]
    e.layer_id_in_nuh = [0, 1]
    e.dimension_id = [[1]]
    e.direct_dependency = [[1]]             # EL depends on BL
    e.num_profile_tier_level = 2
    e.profile_level_tier_idx = [0, 1]
    e.rep_formats = [
        RepFormat(pic_width=width_bl, pic_height=height_bl,
                  bit_depth_luma=bit_depth, bit_depth_chroma=bit_depth),
        RepFormat(pic_width=width_el, pic_height=height_el,
                  bit_depth_luma=bit_depth, bit_depth_chroma=bit_depth)]
    e.rep_format_idx = [0, 1]
    e.max_one_active_ref_layer = 1
    e.poc_lsb_not_present = [0, 0]
    e.phase_align = phase_align
    e.default_dep_type = 2
    e.direct_dep_type = [[2]]
    return e
