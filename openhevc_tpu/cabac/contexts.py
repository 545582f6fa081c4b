"""HEVC CABAC context models: layout + initialization values.

Init values are the normative tables 9-5..9-32 of ITU-T H.265, organized per
syntax element with one row per initType (0 = I slices, 1/2 = P/B with
cabac_init_flag swap).  Layout matches the reference's elem_offset scheme
(libavcodec/hevc_cabac.c:98-155) so WPP context snapshots stay comparable.
"""

import numpy as np

from .tables import init_state

CNU = 154

# element -> per-initType init values (len = number of contexts for element)
_INIT = {
    "sao_merge_flag":          ([153], [153], [153]),
    "sao_type_idx":            ([200], [185], [160]),
    "split_coding_unit_flag":  ([139, 141, 157], [107, 139, 126], [107, 139, 126]),
    "cu_transquant_bypass_flag": ([154], [154], [154]),
    "skip_flag":               ([CNU] * 3, [197, 185, 201], [197, 185, 201]),
    "cu_qp_delta":             ([154] * 3, [154] * 3, [154] * 3),
    "pred_mode":               ([CNU], [149], [134]),
    "part_mode":               ([184, CNU, CNU, CNU], [154, 139, 154, 154], [154, 139, 154, 154]),
    "prev_intra_luma_pred_mode": ([184], [154], [183]),
    "intra_chroma_pred_mode":  ([63, 139], [152, 139], [152, 139]),
    "merge_flag":              ([CNU], [110], [154]),
    "merge_idx":               ([CNU], [122], [137]),
    "inter_pred_idc":          ([CNU] * 5, [95, 79, 63, 31, 31], [95, 79, 63, 31, 31]),
    "ref_idx_l0":              ([CNU] * 2, [153, 153], [153, 153]),
    "ref_idx_l1":              ([CNU] * 2, [153, 153], [153, 153]),
    "abs_mvd_greater0_flag":   ([CNU] * 2, [140, 198], [169, 198]),
    "abs_mvd_greater1_flag":   ([CNU] * 2, [140, 198], [169, 198]),
    "mvp_lx_flag":             ([CNU], [168], [168]),
    "no_residual_data_flag":   ([CNU], [79], [79]),
    "split_transform_flag":    ([153, 138, 138], [124, 138, 94], [224, 167, 122]),
    "cbf_luma":                ([111, 141], [153, 111], [153, 111]),
    "cbf_cb_cr":               ([94, 138, 182, 154], [149, 107, 167, 154], [149, 92, 167, 154]),
    "transform_skip_flag":     ([139, 139], [139, 139], [139, 139]),
    "explicit_rdpcm_flag":     ([139, 139], [139, 139], [139, 139]),
    "explicit_rdpcm_dir_flag": ([139, 139], [139, 139], [139, 139]),
    "last_significant_coeff_x_prefix": (
        [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111,
         79, 108, 123, 63],
        [125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95,
         94, 108, 123, 108],
        [125, 110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111,
         79, 108, 123, 93]),
    "last_significant_coeff_y_prefix": (
        [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111,
         79, 108, 123, 63],
        [125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95,
         94, 108, 123, 108],
        [125, 110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111,
         79, 108, 123, 93]),
    "significant_coeff_group_flag": ([91, 171, 134, 141], [121, 140, 61, 154],
                                     [121, 140, 61, 154]),
    "significant_coeff_flag": (
        [111, 111, 125, 110, 110, 94, 124, 108, 124, 107, 125, 141, 179, 153,
         125, 107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153, 125, 140,
         139, 182, 182, 152, 136, 152, 136, 153, 136, 139, 111, 136, 139, 111,
         141, 111],
        [155, 154, 139, 153, 139, 123, 123, 63, 153, 166, 183, 140, 136, 153,
         154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170,
         153, 123, 123, 107, 121, 107, 121, 167, 151, 183, 140, 151, 183, 140,
         140, 140],
        [170, 154, 139, 153, 139, 123, 123, 63, 124, 166, 183, 140, 136, 153,
         154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170,
         153, 138, 138, 122, 121, 122, 121, 167, 151, 183, 140, 151, 183, 140,
         140, 140]),
    "coeff_abs_level_greater1_flag": (
        [140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92, 139, 107,
         122, 152, 140, 179, 166, 182, 140, 227, 122, 197],
        [154, 196, 196, 167, 154, 152, 167, 182, 182, 134, 149, 136, 153, 121,
         136, 137, 169, 194, 166, 167, 154, 167, 137, 182],
        [154, 196, 167, 167, 154, 152, 167, 182, 182, 134, 149, 136, 153, 121,
         136, 122, 169, 208, 166, 167, 154, 152, 167, 182]),
    "coeff_abs_level_greater2_flag": ([138, 153, 136, 167, 152, 152],
                                      [107, 167, 91, 122, 107, 167],
                                      [107, 167, 91, 107, 107, 167]),
    "log2_res_scale_abs":      ([154] * 8, [154] * 8, [154] * 8),
    "res_scale_sign_flag":     ([154] * 2, [154] * 2, [154] * 2),
    "cu_chroma_qp_offset_flag": ([154], [154], [154]),
    "cu_chroma_qp_offset_idx": ([154], [154], [154]),
}

_ORDER = list(_INIT.keys())

CTX_OFFSET = {}
_off = 0
for _name in _ORDER:
    CTX_OFFSET[_name] = _off
    _off += len(_INIT[_name][0])
NUM_CONTEXTS = _off

INIT_VALUES = np.zeros((3, NUM_CONTEXTS), np.uint8)
for _it in range(3):
    for _name in _ORDER:
        o = CTX_OFFSET[_name]
        vals = _INIT[_name][_it]
        INIT_VALUES[_it, o:o + len(vals)] = vals


class ContextSet:
    """All context models for one entropy-coding state (one substream).

    stat_coeff is the RExt persistent-rice state: reset with the context
    init (cabac_init_state, hevc_cabac.c:602-604) but NOT saved/loaded by
    WPP snapshots (ff_hevc_save_states copies cabac_state only) — callers
    carry it across substreams in decode order instead."""

    __slots__ = ("state", "mps", "stat_coeff")

    def __init__(self, init_type: int = 0, qp: int = 26):
        self.state = np.zeros(NUM_CONTEXTS, np.uint8)
        self.mps = np.zeros(NUM_CONTEXTS, np.uint8)
        self.stat_coeff = np.zeros(4, np.int32)
        row = INIT_VALUES[init_type]
        for i in range(NUM_CONTEXTS):
            s, m = init_state(int(row[i]), qp)
            self.state[i] = s
            self.mps[i] = m

    def save(self):
        return self.state.copy(), self.mps.copy()

    def load(self, snapshot):
        self.state[:] = snapshot[0]
        self.mps[:] = snapshot[1]
