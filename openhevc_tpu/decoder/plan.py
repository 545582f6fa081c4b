"""Frame plan: the host-front-end -> TPU-back-end contract.

The CABAC front-end parses a frame into a *plan*: an ordered list of
reconstruction ops plus per-frame filter parameter tensors.  The back-end
(NumPy scalar model, or the batched TPU path) executes the plan.  Op order
encodes intra dependencies (a TU's prediction may read pixels written by any
earlier op).
"""

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class IntraOp:
    """Intra-predict block (x,y,size) of plane c_idx, then add residual."""
    c_idx: int
    x: int
    y: int
    size: int
    mode: int
    # availability flags resolved by the front-end (decode order + CIP)
    cand_bottom_left: bool
    cand_left: bool
    cand_up_left: bool
    cand_up: bool
    cand_up_right: bool
    bottom_left_size: int
    top_right_size: int


@dataclass
class InterOp:
    """Motion-compensate PU (x,y,w,h) of plane c_idx from the DPB."""
    c_idx: int
    x: int
    y: int
    w: int
    h: int
    # per direction: (dpb_slot, mv_x, mv_y) or None
    l0: Optional[tuple]
    l1: Optional[tuple]
    # weighted prediction: (denom, w0, o0, w1, o1) or None
    weights: Optional[tuple] = None


@dataclass
class ResidualOp:
    """Dequant + inverse transform + add at (x,y) of plane c_idx."""
    c_idx: int
    x: int
    y: int
    log2_size: int
    levels: np.ndarray          # (n, n) int32 coefficient levels
    qp: int                     # final per-component qp (incl. offsets)
    transform_skip: bool = False
    use_dst: bool = False       # 4x4 intra luma DST-VII
    transquant_bypass: bool = False
    rdpcm_dir: int = -1         # -1 none, 0 horizontal, 1 vertical
    rot: bool = False           # 4x4 transform-skip rotation (RExt)
    cc_alpha: int = 0           # cross-component ResScaleVal (RExt, 4:4:4)
    matrix_id: int = -1         # scaling-list matrix id, -1 = flat (16)


@dataclass
class PcmOp:
    c_idx: int
    x: int
    y: int
    size: int
    samples: np.ndarray


@dataclass
class CtbFilterParams:
    """Per-CTB SAO parameters (reference SAOParams, hevc.h:514)."""
    sao_type: np.ndarray        # (3,) 0=off 1=band 2=edge
    sao_band_position: np.ndarray
    sao_offsets: np.ndarray     # (3, 5) SaoOffsetVal (index 0 = 0)
    sao_eo_class: np.ndarray


@dataclass
class FramePlan:
    poc: int
    width: int
    height: int
    bit_depth: int
    chroma_format_idc: int
    ops: List[object] = field(default_factory=list)
    # deblock inputs, filled during parse:
    #   bs tensors at 4-sample granularity on the 8-pixel edge grid
    vertical_bs: Optional[np.ndarray] = None      # (h/4, w/8)
    horizontal_bs: Optional[np.ndarray] = None    # (h/8, w/4)
    qp_map: Optional[np.ndarray] = None           # (h/8, w/8) qp_y per 8x8
    # per-CTB SAO
    sao: Optional[dict] = None   # {(rx, ry): CtbFilterParams}
    # raw (nctb, 24) int32 SAO rows from the native walk (same data as
    # `sao`); the TPU backend builds its per-CTB grids from this with one
    # vectorized reshape instead of a 510-object python loop per frame
    sao_raw: Optional[object] = None
    deblock_disable: bool = False
    strong_intra_smoothing: bool = False
    intra_smoothing_disabled: bool = False   # RExt sps flag
    # cross-component execution state (last luma TU residual) — lives on
    # the plan so incremental execution (encoder lazy recon) persists it
    cc_state: dict = field(default_factory=dict)
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    sao_luma: bool = False
    sao_chroma: bool = False
    beta_offset: int = 0
    tc_offset: int = 0
    # per-CTB filter parameters for multi-slice pictures whose slices signal
    # different deblock offsets (s->deblock[ctb], hevc.c:2677); None means
    # the frame-level scalars above apply everywhere
    deblock_beta_map: Optional[np.ndarray] = None   # (ctb_h, ctb_w) int32
    deblock_tc_map: Optional[np.ndarray] = None
    # SAO pixels restored at slice/tile boundaries with cross-filtering
    # disabled (sao_edge_filter_1 restores, hevcdsp_template.c); per-plane
    # bool masks or None
    sao_restore: Optional[list] = None
    # transquant-bypass / pcm pixels excluded from SAO when pcm_loop_filter_disabled
    no_filter_map: Optional[np.ndarray] = None    # (h/4, w/4) bool
    # scaling-list factor matrices {(log2n, matrix_id): (n, n) int32} or None
    scaling: Optional[dict] = None
    cu_transquant_bypass_map: Optional[np.ndarray] = None
    slice_type: int = 2
    # native-front-end SoA op arrays (see native.split_ops) + the flat level
    # buffer; None when the Python front-end built per-op objects directly
    soa: Optional[dict] = None
    raw_levels: Optional[np.ndarray] = None
    # motion field snapshot for DPB storage (TMVP of later frames)
    mvf_mv: Optional[np.ndarray] = None
    mvf_poc: Optional[np.ndarray] = None
    mvf_pred: Optional[np.ndarray] = None
    mvf_ref_idx: Optional[np.ndarray] = None
    rpl: Optional[list] = None
    rpl_lt: Optional[list] = None
    # decoded-picture-hash SEI captured for this picture (list of 3 digests)
    md5: Optional[list] = None
    # POCs the RPS of this picture keeps alive (DPB pruning; hevc_refs.c RPS
    # unreferencing) -- None means "keep everything" (pre-RPS streams)
    ref_keep: Optional[list] = None
    # SPS-derived values snapshotted at parse time so reconstruction does not
    # race a parse-ahead thread activating a different SPS (ADVICE round 1)
    log2_ctb_size: int = 6
    num_reorder_pics: int = 0
    conf_win: tuple = (0, 0, 0, 0)      # (left, right, top, bottom) in chroma units
