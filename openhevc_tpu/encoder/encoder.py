"""Test-stream HEVC encoder.

Produces spec-conformant bitstreams to test the decoder (the repo has no
conformance vectors offline).  Quality is secondary; syntax coverage and
bit-exactness of the reconstruction are the point.  The reconstruction path
is the same plan executor the decoder uses, so encoder recon == decoder
recon by construction; the reference decoder (.oracle) is the independent
correctness oracle.

Intra mode decisions use source-pixel heuristics; levels are computed lazily
during the CABAC walk from the true (recon-based) prediction, via
FrameState.level_provider.
"""

import copy
import random
from dataclasses import dataclass

import numpy as np

from ..bitstream import nal as nalmod
from ..bitstream.nal import write_nal
from ..cabac import CabacDecoder, CabacEncoder, ContextSet
from ..decoder.plan import FramePlan
from ..decoder import recon_np
from ..model import transforms as tr
from ..model import intra as ipred
from ..ps.params import VPS, SPS, PPS, write_vps, write_sps, write_pps
from ..decoder.slice import SliceHeader, write_slice_header, I_SLICE, P_SLICE, B_SLICE
from ..decoder.refs import DPB, Frame, construct_rpl, resolve_lt_pocs
from ..ps.params import ShortTermRPS
from ..syntax.ctu import (FrameState, CtbData, CQTNode, CUData, TTNode,
                          TUData, code_ctu, MODE_INTRA, MODE_INTER, PART_2Nx2N,
                          PART_NxN, _mpm_candidates, _sao_off, expand_qp_map)
from ..syntax.pu import PUData, _PART_GEOM
from ..syntax.io import CabacIO


@dataclass
class EncoderConfig:
    width: int = 0
    height: int = 0
    qp: int = 32
    bit_depth: int = 8
    chroma_format: int = 1      # 1=4:2:0, 2=4:2:2, 3=4:4:4
    log2_ctb: int = 5
    amp: bool = False           # asymmetric motion partitions (SPS flag)
    p_amp: float = 0.3          # P(AMP mode) for eligible inter CUs
    sao: bool = False
    deblock: bool = True
    sign_data_hiding: bool = False
    transform_skip: bool = False
    wpp: bool = False
    tiles: tuple = None          # (num_cols, num_rows) or None
    weighted_pred: bool = False
    cu_qp_delta: bool = False
    strong_intra_smoothing: bool = True
    rng_seed: int = 1234
    # probability knobs for syntax coverage
    p_split: float = 0.4
    p_tt_split: float = 0.3
    p_cbf_zero: float = 0.15
    p_nxn: float = 0.3
    p_skip: float = 0.25
    p_merge: float = 0.35
    p_intra_in_inter: float = 0.1
    p_no_residual: float = 0.2
    mv_range: int = 32          # quarter-pel units
    max_refs: int = 3
    temporal_mvp: bool = False
    p_pcm: float = 0.0          # PCM probability for eligible intra CUs
    pcm_loop_filter_disabled: bool = False
    pcm_bit_depth: int = 0      # 0 -> same as bit_depth
    scaling_lists: str = ""     # "" | "default" | "custom" | "pps"
    slices: int = 1             # slice segments per frame
    dependent_slices: bool = False  # segments >0 are dependent segments
    long_term: bool = False     # keep POC 0 as a long-term reference
    reorder_pics: int = 0       # sps_max_num_reorder_pics (open-GOP streams)
    encrypt_params: int = 0     # selective encryption flags (crypto.py)
    across_slices: bool = True  # loop_filter_across_slices_enabled
    # per-slice filter params: random beta/tc offsets, per-slice deblock
    # disable and SAO enables (hevc.c:2677 s->deblock[ctb] coverage)
    slice_filter_variants: bool = False
    no_output_of_prior_pics: bool = False   # set on IRAP slice headers
    # RExt coding tools (sps/pps range extensions)
    transform_skip_rotation: bool = False
    transform_skip_context: bool = False
    implicit_rdpcm: bool = False
    explicit_rdpcm: bool = False
    persistent_rice: bool = False
    intra_smoothing_disabled: bool = False
    cross_component: bool = False   # requires chroma_format == 3
    transquant_bypass: float = 0.0  # per-CU bypass probability (RExt paths)
    # PPS chroma-QP offset lists: [(cb, cr), ...] pairs; enables the
    # cu_chroma_qp_offset TU syntax (hevc.c:1247-1263)
    chroma_qp_offsets: tuple = ()


class Encoder:
    def __init__(self, cfg: EncoderConfig, layer_id: int = 0):
        assert cfg.width % 8 == 0 and cfg.height % 8 == 0, \
            "dimensions must be multiples of the min CB size"
        self.cfg = cfg
        self.layer_id = layer_id
        self._il_pocs = ()          # SHVC: IL ref POCs for the next frame
        self.rng = random.Random(cfg.rng_seed)
        self.poc = 0
        self.dpb = DPB()
        self.crypto = None
        if cfg.encrypt_params:
            from ..crypto import HevcCrypto
            self.crypto = HevcCrypto()

        self.vps = VPS()
        self.sps = SPS(width=cfg.width, height=cfg.height,
                       bit_depth=cfg.bit_depth, bit_depth_chroma=cfg.bit_depth,
                       chroma_format_idc=cfg.chroma_format,
                       log2_ctb_size=cfg.log2_ctb,
                       log2_min_cb_size=3, log2_min_tb_size=2,
                       log2_max_tb_size=5,
                       max_transform_hierarchy_depth_intra=1,
                       max_transform_hierarchy_depth_inter=1,
                       amp_enabled=1 if cfg.amp else 0,
                       sao_enabled=1 if cfg.sao else 0,
                       temporal_mvp_enabled=1 if cfg.temporal_mvp else 0,
                       strong_intra_smoothing_enabled=1 if cfg.strong_intra_smoothing else 0)
        if cfg.reorder_pics:
            self.sps.num_reorder_pics = [cfg.reorder_pics]
        if cfg.bit_depth > 8:
            self.sps.ptl.profile_idc = 2
        s = self.sps
        s.transform_skip_rotation_enabled = int(cfg.transform_skip_rotation)
        s.transform_skip_context_enabled = int(cfg.transform_skip_context)
        s.implicit_rdpcm_enabled = int(cfg.implicit_rdpcm)
        s.explicit_rdpcm_enabled = int(cfg.explicit_rdpcm)
        s.intra_smoothing_disabled = int(cfg.intra_smoothing_disabled)
        s.persistent_rice_adaptation_enabled = int(cfg.persistent_rice)
        if cfg.cross_component:
            assert cfg.chroma_format == 3, "cross-component needs 4:4:4"
        if cfg.dependent_slices:
            # dependent slice-state restore shares the snapshot buffer
            # with the WPP row snapshot on the native path; the reference
            # combination rules are not modeled — keep them apart
            assert not (cfg.wpp or cfg.tiles), \
                "dependent slices + wpp/tiles not supported"
        if cfg.slices > 1 and cfg.persistent_rice:
            assert False, "multi-slice + persistent rice not supported"
        if (cfg.transform_skip_rotation or cfg.transform_skip_context
                or cfg.implicit_rdpcm or cfg.explicit_rdpcm
                or cfg.persistent_rice or cfg.intra_smoothing_disabled
                or cfg.cross_component or cfg.chroma_format != 1
                or cfg.transquant_bypass or cfg.chroma_qp_offsets):
            # the reference gates pps_range_extensions on the RExt profile
            s.ptl.profile_idc = 4
        if cfg.scaling_lists:
            self.sps.scaling_list_enabled = 1
            if cfg.scaling_lists in ("custom", "pps"):
                from ..ps.scaling import ScalingList
                sl = ScalingList()
                rng2 = random.Random(cfg.rng_seed + 17)
                for size_id in range(4):
                    for m in range(0, 6, 3 if size_id == 3 else 1):
                        n = 16 if size_id == 0 else 64
                        pert = np.array([rng2.randrange(-4, 5)
                                         for _ in range(n)], np.int32)
                        sl.sl[size_id][m] = np.clip(
                            sl.sl[size_id][m] + pert, 1, 255)
                        if size_id > 1:
                            sl.sl_dc[size_id - 2][m] = rng2.randrange(8, 40)
                if cfg.scaling_lists == "pps":
                    self._pps_sl = sl       # applied after PPS construction
                else:
                    self.sps.scaling_list = sl
        if cfg.long_term:
            self.sps.long_term_ref_pics_present = 1
        if cfg.p_pcm > 0:
            self.sps.pcm_enabled = 1
            pbd = cfg.pcm_bit_depth or cfg.bit_depth
            self.sps.pcm_bit_depth = pbd
            self.sps.pcm_bit_depth_chroma = pbd
            self.sps.pcm_log2_min_size = 3
            self.sps.pcm_log2_max_size = min(cfg.log2_ctb, 5)
            self.sps.pcm_loop_filter_disabled = \
                1 if cfg.pcm_loop_filter_disabled else 0
        self.pps = PPS(sign_data_hiding=1 if cfg.sign_data_hiding else 0,
                       transform_skip_enabled=1 if cfg.transform_skip else 0,
                       init_qp=26)
        if cfg.transquant_bypass:
            self.pps.transquant_bypass_enabled = 1
        if cfg.cross_component:
            self.pps.cross_component_prediction_enabled = 1
            self.pps.has_range_ext = 1
        if cfg.wpp:
            self.pps.entropy_coding_sync_enabled = 1
        if cfg.tiles:
            self.pps.tiles_enabled = 1
            self.pps.num_tile_columns, self.pps.num_tile_rows = cfg.tiles
        if cfg.weighted_pred:
            self.pps.weighted_pred = 1
            self.pps.weighted_bipred = 1
        if cfg.cu_qp_delta:
            self.pps.cu_qp_delta_enabled = 1
            self.pps.diff_cu_qp_delta_depth = self.rng.randrange(0, 3)
        if cfg.chroma_qp_offsets:
            self.pps.has_range_ext = 1
            self.pps.chroma_qp_offset_list_enabled = 1
            self.pps.diff_cu_chroma_qp_offset_depth = self.rng.randrange(0, 3)
            self.pps.cb_qp_offset_list = [cb for cb, _ in
                                          cfg.chroma_qp_offsets]
            self.pps.cr_qp_offset_list = [cr for _, cr in
                                          cfg.chroma_qp_offsets]
        if not cfg.deblock:
            self.pps.deblocking_filter_control_present = 1
            self.pps.deblocking_filter_disabled = 1
        if cfg.slices > 1:
            self.pps.loop_filter_across_slices_enabled = \
                1 if cfg.across_slices else 0
            if cfg.dependent_slices:
                self.pps.dependent_slice_segments_enabled = 1
        if cfg.slice_filter_variants:
            self.pps.deblocking_filter_control_present = 1
            self.pps.deblocking_filter_override_enabled = 1
        if getattr(self, "_pps_sl", None) is not None:
            self.pps.scaling_list_data_present = 1
            self.pps.scaling_list = self._pps_sl
        if layer_id > 0:
            # SHVC enhancement layer: own SPS/PPS ids, multilayer SPS form
            self.sps.layer_id = layer_id
            self.sps.sps_id = layer_id
            self.pps.layer_id = layer_id
            self.pps.pps_id = layer_id
            self.pps.sps_id = layer_id
        self.pps.finalize(self.sps)

    # ------------------------------------------------------------------ ps

    def parameter_set_nals(self):
        out = []
        if self.layer_id == 0:
            out.append(write_nal(nalmod.NAL_VPS, write_vps(self.vps)))
        out.append(write_nal(nalmod.NAL_SPS, write_sps(self.sps),
                             layer_id=self.layer_id))
        out.append(write_nal(nalmod.NAL_PPS, write_pps(self.pps, self.sps),
                             layer_id=self.layer_id))
        return out

    # ---------------------------------------------------------------- frame

    def encode_intra_frame(self, src_planes):
        return self.encode_frame(src_planes, "I")

    def encode_frame(self, src_planes, slice_type="P", nal_type=None,
                     poc=None, ref_pocs=None):
        """-> (nal_bytes, recon_planes, plan). src_planes: [Y, U, V] int.

        slice_type: "I"/"P"/"B".  nal_type overrides the NAL unit type
        (e.g. NAL_CRA_NUT for an open GOP, NAL_RASL_R for leading pictures);
        poc overrides the picture order count (RASL pictures have POCs below
        their CRA); ref_pocs pins the RPS reference set explicitly."""
        cfg, sps, pps = self.cfg, self.sps, self.pps
        if poc is not None:
            self.poc = poc
        if (slice_type == "I" and nal_type is None) or not self.dpb.frames:
            if nal_type is None or nalmod.is_idr(nal_type):
                slice_type = "I"
                self.poc = 0
                self.dpb.clear()
        stype = {"I": I_SLICE, "P": P_SLICE, "B": B_SLICE}[slice_type]
        sh = SliceHeader(slice_type=stype, slice_qp=cfg.qp,
                         pps_id=self.pps.pps_id,
                         sao_luma=1 if cfg.sao else 0,
                         sao_chroma=1 if cfg.sao else 0,
                         loop_filter_across_slices=(
                             self.pps.loop_filter_across_slices_enabled))
        if cfg.no_output_of_prior_pics:
            sh.no_output_of_prior_pics = 1
        if self.pps.chroma_qp_offset_list_enabled:
            sh.cu_chroma_qp_offset_enabled = 1
        if stype == I_SLICE and nal_type is None:
            nal_type = nalmod.NAL_IDR_W_RADL
        if stype == I_SLICE:
            if not nalmod.is_idr(nal_type):
                # non-IDR IRAP (CRA/BLA) I slice carries poc lsb + an RPS
                sh.pic_order_cnt_lsb = \
                    self.poc & ((1 << sps.log2_max_poc_lsb) - 1)
                sh.slice_rps = ShortTermRPS()
            elif self.layer_id > 0:
                # EL IDR still carries poc lsb (hevc.c:727-743)
                sh.pic_order_cnt_lsb = \
                    self.poc & ((1 << sps.log2_max_poc_lsb) - 1)
        else:
            if nal_type is None:
                nal_type = nalmod.NAL_TRAIL_R
            sh.pic_order_cnt_lsb = self.poc & ((1 << sps.log2_max_poc_lsb) - 1)
            use_lt = cfg.long_term and self.poc >= 2 and 0 in self.dpb.frames
            # the SHVC inter-layer ref sits in the DPB under the current POC
            # and must not enter the short-term RPS (it rides IL_REF0)
            cand = sorted((p for p in self.dpb.frames if p != self.poc),
                          reverse=True)
            if use_lt:
                cand = [p for p in cand if p != 0]
            if ref_pocs is not None:
                use_lt = False
                cand = [p for p in cand if p in ref_pocs]
            refs = cand[:cfg.max_refs]
            rps = ShortTermRPS()
            neg = sorted((p - self.poc for p in refs if p < self.poc),
                         reverse=True)          # closest first
            pos = sorted(p - self.poc for p in refs if p > self.poc)
            rps.delta_poc = neg + pos
            rps.used = [1] * len(rps.delta_poc)
            rps.num_negative_pics = len(neg)
            sh.slice_rps = rps
            if use_lt:
                # POC 0 as a slice-level long-term ref (lsb 0 + msb cycle)
                sh.lt_poc = [0]
                sh.lt_used = [1]
                sh.lt_msb_present = [1]
                sh.lt_delta_poc_msb_cycle = [self.poc >> sps.log2_max_poc_lsb]
            il_pocs = self._il_pocs if self.layer_id > 0 else ()
            if il_pocs:
                sh.inter_layer_pred_enabled = 1
                sh.active_num_ilr = len(il_pocs)
                sh.il_layer_idc = [0] * len(il_pocs)
            nref = max(1, len(refs) + (1 if use_lt else 0) + len(il_pocs))
            sh.num_ref_idx = [nref, nref if slice_type == "B" else 0]
            sh.max_num_merge_cand = 5
            if cfg.temporal_mvp:
                sh.temporal_mvp_enabled = 1
                sh.collocated_list = 0
                sh.collocated_ref_idx = 0
            if cfg.weighted_pred:
                sh.wp = self._pick_weights(sh)

        plan = FramePlan(poc=self.poc, width=sps.width, height=sps.height,
                         bit_depth=sps.bit_depth,
                         chroma_format_idc=sps.chroma_format_idc,
                         log2_ctb_size=sps.log2_ctb_size,
                         strong_intra_smoothing=bool(sps.strong_intra_smoothing_enabled),
                         intra_smoothing_disabled=bool(
                             sps.intra_smoothing_disabled),
                         sao_luma=bool(sh.sao_luma), sao_chroma=bool(sh.sao_chroma),
                         deblock_disable=not cfg.deblock or bool(sh.deblocking_filter_disabled))
        plan.poc = self.poc
        plan.slice_type = stype
        init_type = 0
        if stype == P_SLICE:
            init_type = 2 if sh.cabac_init_flag else 1
        elif stype == B_SLICE:
            init_type = 1 if sh.cabac_init_flag else 2
        if not hasattr(self, "_pcm_sticky"):
            self._pcm_sticky = np.zeros((sps.height >> 2, sps.width >> 2),
                                        np.uint8)
        st = FrameState(sps, pps, sh, plan, init_type=init_type,
                        pcm_map=self._pcm_sticky)
        st._pu_stale = getattr(self, "_pu_stale_carry", (0, 0))
        st.crypto = self.crypto
        st.encrypt_params = cfg.encrypt_params
        if sps.scaling_list_enabled:
            if not hasattr(self, "_sf"):
                from ..ps.scaling import ScalingList, build_scaling_factors
                sl = (pps.scaling_list if pps.scaling_list_data_present
                      else (sps.scaling_list or ScalingList()))
                self._sf = build_scaling_factors(sl)
            plan.scaling = self._sf
        st.cur_poc = self.poc
        if stype != I_SLICE:
            lt_pocs = resolve_lt_pocs(sh, self.poc,
                                      1 << sps.log2_max_poc_lsb,
                                      sorted(self.dpb.frames))
            st.rpl, st.rpl_lt = construct_rpl(
                sh, self.poc, lt_pocs,
                il_pocs=self._il_pocs if self.layer_id > 0 else ())
            plan.rpl = st.rpl
            plan.rpl_lt = st.rpl_lt
            if sh.temporal_mvp_enabled and st.rpl[sh.collocated_list]:
                st.collocated_frame = self.dpb.get(
                    st.rpl[sh.collocated_list][sh.collocated_ref_idx])
        self._slice_type = stype
        self._active_nref = sh.num_ref_idx[0] if stype != I_SLICE else 0
        if not cfg.deblock:
            sh.deblocking_filter_disabled = 1
            plan.deblock_disable = True

        self.src = [np.asarray(p, np.int32) for p in src_planes]
        self.recon = recon_np.alloc_frame(plan)
        self._exec_pos = 0
        st.level_provider = self._level_provider
        if self.cfg.cross_component:
            st.cc_provider = self._cc_provider
        self._plan = plan

        nctbs = sps.pic_size_in_ctbs
        if cfg.slices > 1:
            if cfg.wpp or cfg.tiles:
                # slice cuts align to substream starts (CTB rows / tiles /
                # rows-in-tiles): each slice carries whole substreams and
                # its entry points delimit exactly those
                # (hls_decode_entry_wpp, hevc.c:2751-2832)
                subs = _substream_bounds(sps, pps)
                idxs = sorted({min(round(i * len(subs) / cfg.slices),
                                   len(subs))
                               for i in range(cfg.slices + 1)})
                cuts = [subs[i][0] if i < len(subs) else nctbs
                        for i in idxs]
            else:
                cuts = [round(i * nctbs / cfg.slices)
                        for i in range(cfg.slices + 1)]
            slice_ranges = [(cuts[i], cuts[i + 1] - 1)
                            for i in range(len(cuts) - 1)
                            if cuts[i] < cuts[i + 1]]
        else:
            slice_ranges = [(0, nctbs - 1)]
        slice_nals = []
        segments = []
        cont_ctx = None
        saved_ctx = None        # WPP row snapshot; carries ACROSS slices
        for sli, (sl0, sl1) in enumerate(slice_ranges):
            sh_k = sh if sli == 0 else copy.copy(sh)
            if sli > 0:
                # per-slice state reset mirrors the decoder's
                sh_k.first_slice_in_pic = 0
                sl0_rs = int(pps.ctb_addr_ts_to_rs[sl0])
                sh_k.slice_segment_addr = sl0_rs
                if cfg.dependent_slices:
                    sh_k.dependent_slice_segment = 1
                    sh_k.slice_addr = sh.slice_addr  # containing slice
                else:
                    sh_k.slice_addr = sl0_rs
                st.sh = sh_k
                st.qp_y = sh_k.slice_qp
                st.qp_y_pred = sh_k.slice_qp
                st.first_qp_group = 1
                st.is_cu_qp_delta_coded = 0
                st.cu_qp_delta = 0
                st.cu_qp_offset_cb = 0
                st.cu_qp_offset_cr = 0
            if cfg.slice_filter_variants and not sh_k.dependent_slice_segment:
                rng = self.rng
                sh_k.deblocking_filter_disabled = \
                    1 if rng.random() < 0.25 else 0
                if not sh_k.deblocking_filter_disabled:
                    sh_k.beta_offset = 2 * rng.randint(-3, 3)
                    sh_k.tc_offset = 2 * rng.randint(-3, 3)
                if cfg.sao:
                    sh_k.sao_luma = 1 if rng.random() < 0.8 else 0
                    sh_k.sao_chroma = 1 if rng.random() < 0.8 else 0
            segments.append((sl0, sh_k))
            if cfg.slices == 1:
                bounds = _substream_bounds(sps, pps)
            elif cfg.wpp or cfg.tiles:
                bounds = [(a, b) for (a, b) in _substream_bounds(sps, pps)
                          if sl0 <= a and b <= sl1]
            else:
                bounds = [(sl0, sl1)]
            loads, saves = _substream_ctx_rules(sps, pps, bounds)
            payload = b""
            entry_points = []       # unescaped substream lengths
            prev_ctx = cont_ctx
            for si, (ts0, ts1) in enumerate(bounds):
                if si == 0 and sli > 0 and cfg.dependent_slices and \
                        cont_ctx is not None:
                    ctx = cont_ctx          # contexts carry over (dependent)
                else:
                    ctx = ContextSet(init_type=init_type, qp=sh.slice_qp)
                if loads[si] and saved_ctx is not None:
                    ctx.load(saved_ctx)
                    if prev_ctx is not None and ctx is not prev_ctx:
                        ctx.stat_coeff[:] = prev_ctx.stat_coeff
                prev_ctx = ctx
                cont_ctx = ctx
                enc = CabacEncoder(ctx)
                io = CabacIO(enc=enc)
                for ts in range(ts0, ts1 + 1):
                    rs = int(pps.ctb_addr_ts_to_rs[ts])
                    x_ctb = (rs % sps.ctb_width) << sps.log2_ctb_size
                    y_ctb = (rs // sps.ctb_width) << sps.log2_ctb_size
                    ctb = self._plan_ctb(st, x_ctb, y_ctb)
                    code_ctu(io, st, x_ctb, y_ctb, ts, ctb)
                    io.terminate(1 if ts == sl1 else 0)
                    if saves[si] and ts == ts0 + 1:
                        saved_ctx = ctx.save()
                if ts1 != sl1:
                    io.terminate(1)          # end_of_subset_one_bit
                sub = enc.finish()
                entry_points.append(len(sub))
                payload += sub
            # entry_point_offsets are in escaped-NAL-byte coordinates
            # (spec 7.4.7.1; decoder fixup hevc.c:3030-3051): start from the
            # unescaped substream lengths and iterate to a fixpoint, since
            # the offsets live inside the header whose bytes feed the
            # emulation-prevention state entering the payload.
            sub_lens = entry_points
            sh_k.num_entry_point_offsets = len(bounds) - 1
            sh_k.entry_point_offsets = list(sub_lens[:-1])
            w = write_slice_header(sh_k, nal_type, sps, pps,
                                   layer_id=self.layer_id, vps=self.vps)
            if sh_k.num_entry_point_offsets:
                from ..bitstream.nal import escaped_entry_points
                for _ in range(8):
                    eps = escaped_entry_points(w.get_bytes(), payload,
                                               sub_lens)
                    if eps == sh_k.entry_point_offsets:
                        break
                    sh_k.entry_point_offsets = eps
                    w = write_slice_header(sh_k, nal_type, sps, pps,
                                           layer_id=self.layer_id,
                                           vps=self.vps)
                else:
                    raise RuntimeError("entry-point fixpoint did not converge")
            slice_nals.append(write_nal(nal_type, w.get_bytes() + payload,
                                        layer_id=self.layer_id))

        # catch up remaining recon ops
        self._execute_pending()
        plan.qp_map = expand_qp_map(st, sps)
        plan.vertical_bs = st.vertical_bs
        plan.horizontal_bs = st.horizontal_bs
        plan.sao = st.sao_ctbs if cfg.sao and any(
            s.sao_luma or s.sao_chroma for _, s in segments) else None
        plan.no_filter_map = st.is_pcm_or_bypass.copy()
        # per-slice filter parameter maps (same builder the decoder uses)
        from ..decoder.slicefilters import (build_filter_param_maps,
                                            build_sao_boundary_restore)
        fmaps = build_filter_param_maps(segments, sps, pps)
        plan.sao_luma = any(s.sao_luma for _, s in segments)
        plan.sao_chroma = any(s.sao_chroma for _, s in segments)
        plan.deblock_disable = not fmaps["any_deblock"]
        if not fmaps["uniform"]:
            plan.deblock_beta_map = fmaps["beta_map"]
            plan.deblock_tc_map = fmaps["tc_map"]
        else:
            # slice offsets ride the plan scalars (the plan default of 0
            # silently dropped per-slice offsets on uniform pictures)
            plan.beta_offset = fmaps["beta0"]
            plan.tc_offset = fmaps["tc0"]
        if plan.sao is not None:
            plan.sao_restore = build_sao_boundary_restore(
                plan, sps, pps, fmaps["lfase_map"], fmaps["slice_addr_map"])

        recon_np.deblock_frame(plan, self.recon)
        self.recon = recon_np.sao_frame(plan, self.recon, sps.ctb_size)

        # store in the encoder DPB for future reference frames
        self.dpb.add(Frame(poc=self.poc, planes=[p.copy() for p in self.recon],
                           mvf_mv=st.mvf_mv.copy(), mvf_poc=st.mvf_poc.copy(),
                           mvf_pred=st.mvf_pred.copy(),
                           mvf_ref_idx=st.mvf_ref_idx.copy(),
                           rpl=st.rpl, rpl_lt=st.rpl_lt))
        if sh.slice_rps is not None:
            self.dpb.apply_rps(self.poc, sh.slice_rps,
                               lt_pocs=(0,) if cfg.long_term else ())

        nal = b"".join(slice_nals)
        from ..decoder.sei import plane_md5, write_picture_hash_sei
        sei = write_nal(nalmod.NAL_SEI_SUFFIX,
                        write_picture_hash_sei(
                            [plane_md5(np.asarray(p), sps.bit_depth)
                             for p in self.recon]),
                        layer_id=self.layer_id)
        self.poc += 1
        self._pu_stale_carry = getattr(st, "_pu_stale", (0, 0))
        return nal + sei, self.recon, plan

    # ------------------------------------------------------------ decisions

    def _plan_ctb(self, st, x_ctb, y_ctb) -> CtbData:
        ctb = CtbData()
        if self.cfg.sao and (st.sh.sao_luma or st.sh.sao_chroma):
            ctb.sao = self._pick_sao()
        ctb.cqt = self._plan_cqt(x_ctb, y_ctb, self.sps.log2_ctb_size)
        return ctb

    def _pick_sao(self):
        sao = _sao_off()
        rng = self.rng
        for c_idx in range(3):
            if c_idx == 2:
                # cr type/class mirror cb
                sao.sao_type[2] = sao.sao_type[1]
                sao.sao_eo_class[2] = sao.sao_eo_class[1]
                t = int(sao.sao_type[2])
            else:
                t = rng.choice([0, 1, 2, 2])
                sao.sao_type[c_idx] = t
            if t == 1:
                sao.sao_band_position[c_idx] = rng.randrange(0, 29)
                for i in range(4):
                    sao.sao_offsets[c_idx][i + 1] = rng.randint(-7, 7)
            elif t == 2:
                if c_idx != 2:
                    sao.sao_eo_class[c_idx] = rng.randrange(0, 4)
                sao.sao_offsets[c_idx][1] = rng.randint(0, 7)
                sao.sao_offsets[c_idx][2] = rng.randint(0, 7)
                sao.sao_offsets[c_idx][3] = -rng.randint(0, 7)
                sao.sao_offsets[c_idx][4] = -rng.randint(0, 7)
        return sao

    def _plan_cqt(self, x0, y0, log2) -> CQTNode:
        sps = self.sps
        node = CQTNode()
        inside = (x0 + (1 << log2) <= sps.width and
                  y0 + (1 << log2) <= sps.height)
        must_split = not inside
        may_split = log2 > sps.log2_min_cb_size
        if may_split and (must_split or self.rng.random() < self.cfg.p_split):
            node.split = 1
            half = 1 << (log2 - 1)
            node.children = []
            for (x1, y1) in ((x0, y0), (x0 + half, y0), (x0, y0 + half),
                             (x0 + half, y0 + half)):
                if x1 < sps.width and y1 < sps.height:
                    node.children.append(self._plan_cqt(x1, y1, log2 - 1))
                else:
                    node.children.append(CQTNode())
            return node
        node.cu = self._plan_cu(x0, y0, log2)
        return node

    def _plan_cu(self, x0, y0, log2) -> CUData:
        cfg, sps, rng = self.cfg, self.sps, self.rng
        if self._slice_type != I_SLICE:
            cu = self._plan_inter_cu(x0, y0, log2)
            if cfg.cu_qp_delta:
                cu.cu_qp_delta = rng.choice([0, 0, 1, -1, 3, -4])
            self._pick_chroma_qp_offset(cu)
            return cu
        cu = CUData(pred_mode=MODE_INTRA)
        if self._maybe_pcm(cu, x0, y0, log2):
            if cfg.cu_qp_delta:
                cu.cu_qp_delta = 0
            return cu
        if cfg.transquant_bypass and rng.random() < cfg.transquant_bypass:
            cu.tq_bypass = 1
        nxn = (log2 == sps.log2_min_cb_size and rng.random() < cfg.p_nxn)
        cu.part_mode = PART_NxN if nxn else PART_2Nx2N
        # luma modes chosen from source-pixel heuristic + randomness
        npus = 4 if nxn else 1
        pb = (1 << log2) >> (1 if nxn else 0)
        for k in range(npus):
            cu.intra_modes[k] = self._pick_luma_mode()
        if not nxn:
            cu.intra_modes[1:] = [cu.intra_modes[0]] * 3
        cu.chroma_mode = rng.choice([4, 4, 0, 1, 2, 3])
        # derive intra_mode_c the same way the walker will
        from ..syntax.ctu import INTRA_CHROMA_TABLE
        if cu.chroma_mode != 4:
            if cu.intra_modes[0] == INTRA_CHROMA_TABLE[cu.chroma_mode]:
                cu.intra_mode_c = 34
            else:
                cu.intra_mode_c = INTRA_CHROMA_TABLE[cu.chroma_mode]
        else:
            cu.intra_mode_c = cu.intra_modes[0]
        cu.tt = self._plan_tt(log2, 0, intra_split=nxn)
        if cfg.cu_qp_delta:
            cu.cu_qp_delta = rng.choice([0, 0, 1, -1, 3, -4])
        self._pick_chroma_qp_offset(cu)
        return cu

    def _pick_chroma_qp_offset(self, cu):
        if self.cfg.chroma_qp_offsets and not cu.tq_bypass:
            n = len(self.cfg.chroma_qp_offsets)
            cu.cu_chroma_qp_offset_idx = self.rng.choice(
                [-1, -1, 0, n - 1, self.rng.randrange(n)])

    def _pick_luma_mode(self):
        r = self.rng.random()
        if r < 0.25:
            return 0        # planar
        if r < 0.45:
            return 1        # dc
        return self.rng.randrange(2, 35)

    def _plan_tt(self, log2, depth, intra_split, is_intra=True,
                 part_mode=PART_2Nx2N) -> TTNode:
        cfg, sps, rng = self.cfg, self.sps, self.rng
        node = TTNode()
        if is_intra:
            max_depth = sps.max_transform_hierarchy_depth_intra + (1 if intra_split else 0)
        else:
            max_depth = sps.max_transform_hierarchy_depth_inter
        inter_split = (sps.max_transform_hierarchy_depth_inter == 0 and
                       not is_intra and part_mode != PART_2Nx2N and depth == 0)
        forced_split = (log2 > sps.log2_max_tb_size or
                        (intra_split and depth == 0) or inter_split)
        may_split = (log2 <= sps.log2_max_tb_size and
                     log2 > sps.log2_min_tb_size and depth < max_depth and
                     not (intra_split and depth == 0))
        split = forced_split or (may_split and rng.random() < cfg.p_tt_split)
        # chroma cbf decisions at this node
        if log2 > 2 or sps.chroma_format_idc == 3:
            node.cbf_cb = [0 if rng.random() < cfg.p_cbf_zero else 1, 0]
            node.cbf_cr = [0 if rng.random() < cfg.p_cbf_zero else 1, 0]
        if split:
            node.split = 1
            node.children = [self._plan_tt(log2 - 1, depth + 1, intra_split,
                                           is_intra, part_mode)
                             for _ in range(4)]
            return node
        node.tu = TUData()
        node.tu.cbf_luma = 0 if rng.random() < cfg.p_cbf_zero else 1
        # levels left None -> computed lazily via level_provider
        return node

    def _plan_inter_cu(self, x0, y0, log2) -> CUData:
        cfg, sps, rng = self.cfg, self.sps, self.rng
        cu = CUData()
        nrefs = getattr(self, "_active_nref", None) or len(self.sh_refs())
        if rng.random() < cfg.p_intra_in_inter:
            cu2 = self._plan_intra_cu_payload(x0, y0, log2)
            return cu2
        cu.pred_mode = MODE_INTER
        if cfg.transquant_bypass and rng.random() < cfg.transquant_bypass:
            cu.tq_bypass = 1
        if rng.random() < cfg.p_skip:
            cu.skip = 1
            cu.pred_mode = MODE_INTER
            cu.pus = [PUData(merge_flag=1, merge_idx=rng.randrange(0, 5))]
            cu.tt = None
            return cu
        # part mode: 2Nx2N / 2NxN / Nx2N, plus the four AMP modes
        # (2NxnU/2NxnD/nLx2N/nRx2N; hls_prediction_unit, hevc.c:1968)
        # when enabled and legal (log2 > min_cb; binarization 9.3.3.7)
        if cfg.amp and log2 > sps.log2_min_cb_size and \
                rng.random() < cfg.p_amp:
            cu.part_mode = int(rng.choice([4, 5, 6, 7]))
        else:
            cu.part_mode = rng.choice([PART_2Nx2N, PART_2Nx2N, 1, 2])
        geom = _PART_GEOM[cu.part_mode]
        cb = 1 << log2
        q = cb >> 2
        cu.pus = []
        for (dx, dy, gw, gh) in geom:
            w, h = gw * q, gh * q
            pu = PUData()
            if rng.random() < cfg.p_merge:
                pu.merge_flag = 1
                pu.merge_idx = rng.randrange(0, 5)
            else:
                pu.merge_flag = 0
                if self._slice_type == B_SLICE:
                    if w + h == 12:
                        pu.inter_pred_idc = rng.choice([0, 1])
                    else:
                        pu.inter_pred_idc = rng.choice([0, 1, 2, 2])
                else:
                    pu.inter_pred_idc = 0
                r = cfg.mv_range
                pu.ref_idx = [rng.randrange(0, nrefs), rng.randrange(0, nrefs)]
                pu.mvp_flag = [rng.randrange(0, 2), rng.randrange(0, 2)]
                pu.mvd = [(rng.randint(-r, r), rng.randint(-r, r)),
                          (rng.randint(-r, r), rng.randint(-r, r))]
            cu.pus.append(pu)
        if (cu.part_mode == PART_2Nx2N and cu.pus[0].merge_flag):
            cu.rqt_root_cbf = 1
        else:
            cu.rqt_root_cbf = 0 if rng.random() < cfg.p_no_residual else 1
        if cu.rqt_root_cbf:
            cu.tt = self._plan_tt(log2, 0, intra_split=False, is_intra=False,
                                  part_mode=cu.part_mode)
        return cu

    def _pick_weights(self, sh):
        from ..decoder.slice import WPTable
        rng = self.rng
        wp = WPTable()
        wp.luma_log2_denom = rng.randrange(0, 8)
        wp.chroma_log2_denom = max(0, min(7, wp.luma_log2_denom + rng.randint(-2, 1)))
        for lst in range(2):
            for i in range(max(sh.num_ref_idx[lst], 1)):
                if rng.random() < 0.6:
                    wp.luma_weight[lst].append(
                        (1 << wp.luma_log2_denom) + rng.randint(-3, 3))
                    wp.luma_offset[lst].append(rng.randint(-20, 20))
                else:
                    wp.luma_weight[lst].append(1 << wp.luma_log2_denom)
                    wp.luma_offset[lst].append(0)
                if rng.random() < 0.6:
                    cw = tuple((1 << wp.chroma_log2_denom) + rng.randint(-3, 3)
                               for _ in range(2))
                    co = tuple(rng.randint(-20, 20) for _ in range(2))
                else:
                    cw = (1 << wp.chroma_log2_denom,) * 2
                    co = (0, 0)
                wp.chroma_weight[lst].append(cw)
                wp.chroma_offset[lst].append(co)
        return wp

    def sh_refs(self):
        return sorted(self.dpb.frames, reverse=True)[:self.cfg.max_refs] or [0]

    def _maybe_pcm(self, cu, x0, y0, log2) -> bool:
        """Turn an intra CU into a PCM CU (verbatim source samples)."""
        sps, cfg = self.sps, self.cfg
        if not (sps.pcm_enabled and
                sps.pcm_log2_min_size <= log2 <= sps.pcm_log2_max_size and
                self.rng.random() < cfg.p_pcm):
            return False
        cu.pcm = 1
        cu.part_mode = PART_2Nx2N
        cu.tt = None
        s = 1 << log2
        cu.pcm_samples = [
            self.src[0][y0:y0 + s, x0:x0 + s],
            self.src[1][y0 >> 1:(y0 + s) >> 1, x0 >> 1:(x0 + s) >> 1],
            self.src[2][y0 >> 1:(y0 + s) >> 1, x0 >> 1:(x0 + s) >> 1]]
        return True

    def _plan_intra_cu_payload(self, x0, y0, log2) -> CUData:
        """Intra CU inside a P/B slice."""
        sps, rng, cfg = self.sps, self.rng, self.cfg
        cu = CUData(pred_mode=MODE_INTRA)
        if self._maybe_pcm(cu, x0, y0, log2):
            return cu
        nxn = (log2 == sps.log2_min_cb_size and rng.random() < cfg.p_nxn)
        cu.part_mode = PART_NxN if nxn else PART_2Nx2N
        npus = 4 if nxn else 1
        for k in range(npus):
            cu.intra_modes[k] = self._pick_luma_mode()
        if not nxn:
            cu.intra_modes[1:] = [cu.intra_modes[0]] * 3
        cu.chroma_mode = rng.choice([4, 4, 0, 1, 2, 3])
        from ..syntax.ctu import INTRA_CHROMA_TABLE
        if cu.chroma_mode != 4:
            if cu.intra_modes[0] == INTRA_CHROMA_TABLE[cu.chroma_mode]:
                cu.intra_mode_c = 34
            else:
                cu.intra_mode_c = INTRA_CHROMA_TABLE[cu.chroma_mode]
        else:
            cu.intra_mode_c = cu.intra_modes[0]
        cu.tt = self._plan_tt(log2, 0, intra_split=nxn)
        return cu

    # ----------------------------------------------------------- lazy levels

    def _execute_pending(self):
        ops = self._plan.ops
        while self._exec_pos < len(ops):
            recon_np.execute_plan(
                _SubPlan(self._plan, ops[self._exec_pos:self._exec_pos + 1]),
                self.recon, dpb=self.dpb)
            self._exec_pos += 1

    def _level_provider(self, st, cu, c_idx, x, y, log2_size, scan_idx,
                        pred_mode_intra):
        """Quantize the true residual (source - prediction) for this TU."""
        self._execute_pending()
        n = 1 << log2_size
        pred = self.recon[c_idx][y:y + n, x:x + n]
        srcb = self.src[c_idx][y:y + n, x:x + n]
        resid = srcb.astype(np.int32) - pred
        bd = self.sps.bit_depth
        if cu.tq_bypass:
            levels = np.clip(resid, -32768, 32767).astype(np.int32)
            if not levels.any():
                levels[0, 0] = 1
            return (levels, False) + self._pick_erd(cu, tskip=False)
        tskip = (self.cfg.transform_skip and log2_size == 2 and
                 self.rng.random() < 0.5)
        if tskip:
            ts_shift = 15 - bd - log2_size
            coefs = (resid << ts_shift) if ts_shift >= 0 else \
                (resid >> -ts_shift)
        else:
            use_dst = (cu.pred_mode == MODE_INTRA and c_idx == 0 and
                       log2_size == 2)
            coefs = tr.fdst4x4(resid, bd) if use_dst else tr.fdct2d(resid, bd)
        qp = st.qp_y + self.sps.qp_bd_offset if c_idx == 0 else \
            st.chroma_qp(st.qp_y, c_idx)
        levels = tr.quantize(coefs, qp, log2_size, bd)
        if not levels.any():
            levels[0, 0] = 1
        if self.cfg.sign_data_hiding:
            levels = _fix_sign_hiding(levels, scan_idx, log2_size)
        return (levels, tskip) + self._pick_erd(cu, tskip)

    def _pick_erd(self, cu, tskip):
        """Explicit-RDPCM (flag, dir) choice for eligible inter TUs."""
        if (self.cfg.explicit_rdpcm and cu.pred_mode == MODE_INTER and
                (tskip or cu.tq_bypass) and self.rng.random() < 0.6):
            return (True, self.rng.randrange(2))
        return (False, 0)

    def _cc_provider(self, st, cu, c_idx):
        """Cross-component ResScaleVal choice (log2|alpha| in 0..3)."""
        return self.rng.choice([0, 1, -1, 2, -2, 4, -4, 8, -8])


def _substream_bounds(sps, pps):
    """-> [(first_ts, last_ts)] per CABAC substream (WPP rows, tiles,
    WPP-inside-tiles rows, or the whole picture)."""
    nctbs = sps.pic_size_in_ctbs
    if pps.entropy_coding_sync_enabled and pps.tiles_enabled:
        # one substream per CTB row of each tile, in tile-scan order
        # (hls_decode_entry_wpp_in_tiles, hevc.c:2834)
        out = []
        start = 0
        for ty in range(pps.num_tile_rows):
            for tx in range(pps.num_tile_columns):
                cw_, rh_ = pps._col_width[tx], pps._row_height[ty]
                for r in range(rh_):
                    out.append((start + r * cw_, start + (r + 1) * cw_ - 1))
                start += cw_ * rh_
        return out
    if pps.entropy_coding_sync_enabled:
        w = sps.ctb_width
        return [(r * w, min((r + 1) * w, nctbs) - 1)
                for r in range(sps.ctb_height)]
    if pps.tiles_enabled:
        out = []
        start = 0
        for ty in range(pps.num_tile_rows):
            for tx in range(pps.num_tile_columns):
                size = pps._col_width[tx] * pps._row_height[ty]
                out.append((start, start + size - 1))
                start += size
        return out
    return [(0, nctbs - 1)]


def _substream_ctx_rules(sps, pps, bounds):
    """Per-substream WPP context propagation flags implementing
    ff_hevc_cabac_init + ff_hevc_save_states (hevc_cabac.c:552-656):
    -> (loads, saves) where loads[si] means substream si starts from the
    saved snapshot (instead of a fresh context init) and saves[si] means its
    state is snapshotted after its 2nd CTB.  Tile starts always re-init;
    rows of 1-CTB-wide tiles re-init (no snapshot exists)."""
    n = len(bounds)
    if not pps.entropy_coding_sync_enabled:
        return [False] * n, [False] * n
    if not pps.tiles_enabled:
        w = sps.ctb_width
        return [si > 0 and w > 1 for si in range(n)], [w > 1] * n
    tile_starts = set()
    start = 0
    tw_at = {}
    for ty in range(pps.num_tile_rows):
        for tx in range(pps.num_tile_columns):
            cw_, rh_ = pps._col_width[tx], pps._row_height[ty]
            tile_starts.add(start)
            for r in range(rh_):
                tw_at[start + r * cw_] = cw_
            start += cw_ * rh_
    loads, saves = [], []
    for si, (b0, b1) in enumerate(bounds):
        tw = tw_at.get(b0, sps.ctb_width)
        loads.append(si > 0 and b0 not in tile_starts and tw > 1)
        saves.append(tw > 1)
    return loads, saves


class _SubPlan:
    """View of a plan with a subset of ops (for incremental execution)."""
    def __init__(self, plan, ops):
        self._plan = plan
        self.ops = ops

    def __getattr__(self, k):
        return getattr(self._plan, k)


def _fix_sign_hiding(levels, scan_idx, log2_size):
    """Adjust levels so hidden-sign parity holds per 4x4 CG."""
    from ..syntax.scans import select_scans
    coeff_scan, cg_scan, _ = select_scans(scan_idx, log2_size)
    ncg = max(1, (1 << log2_size) >> 2)
    for cy in range(ncg):
        for cx in range(ncg):
            blk = levels[cy * 4:cy * 4 + 4, cx * 4:cx * 4 + 4]
            nzpos = [i for i, (sx, sy) in enumerate(coeff_scan) if blk[sy, sx]]
            if not nzpos:
                continue
            first, last = min(nzpos), max(nzpos)
            if last - first < 4:
                continue
            sx, sy = coeff_scan[first]
            want_neg = int(np.abs(blk).sum()) & 1
            is_neg = blk[sy, sx] < 0
            if bool(want_neg) != bool(is_neg):
                # bump the first coefficient's magnitude to flip parity while
                # keeping its sign
                blk[sy, sx] += 1 if blk[sy, sx] > 0 else -1
    return levels
