"""residual_coding() syntax: symmetric CABAC decode + encode.

Decode mirrors the reference ff_hevc_hls_residual_coding
(libavcodec/hevc_cabac.c:1372-1950) / spec 7.3.8.11, but emits raw
coefficient *levels* (plan tensors); dequant + inverse transform happen later
on the TPU.  Encode is the exact inverse, used by the test-stream generator.
"""

from dataclasses import dataclass

import numpy as np

from ..cabac.contexts import CTX_OFFSET
from .scans import SCAN_DIAG, SCAN_HORIZ, SCAN_VERT, select_scans

_LAST_X = CTX_OFFSET["last_significant_coeff_x_prefix"]
_LAST_Y = CTX_OFFSET["last_significant_coeff_y_prefix"]
_CSBF = CTX_OFFSET["significant_coeff_group_flag"]
_SIG = CTX_OFFSET["significant_coeff_flag"]
_G1 = CTX_OFFSET["coeff_abs_level_greater1_flag"]
_G2 = CTX_OFFSET["coeff_abs_level_greater2_flag"]
_TSKIP = CTX_OFFSET["transform_skip_flag"]
_ERD = CTX_OFFSET["explicit_rdpcm_flag"]
_ERD_DIR = CTX_OFFSET["explicit_rdpcm_dir_flag"]

# sig_coeff_flag context patterns (hevc_cabac.c:1622-1628 / spec 9.3.4.2.5)
_CTX_IDX_MAP = (
    (0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8),   # log2 size 2
    (1, 1, 1, 0, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0),   # prev_sig 0
    (2, 2, 2, 2, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0),   # prev_sig 1
    (2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 0),   # prev_sig 2
    (2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2),   # prev_sig 3
)


@dataclass
class RCParams:
    """Per-TU invariants for residual coding."""
    c_idx: int
    log2_size: int
    scan_idx: int
    sign_data_hiding: bool = False
    transform_skip_enabled: bool = False
    log2_max_transform_skip_size: int = 2
    transquant_bypass: bool = False
    is_intra: bool = True
    pred_mode_intra: int = 1
    # RExt switches (all off for Main/Main10)
    implicit_rdpcm: bool = False
    explicit_rdpcm: bool = False        # SPS enable; per-TU flag is decoded
    persistent_rice: bool = False
    transform_skip_context: bool = False
    rotation_enabled: bool = False      # sps transform_skip_rotation
    stat_coeff: object = None           # shared int32[4] persistent-rice state
    # encoder-side supplied explicit-rdpcm choice for this TU
    supply_erd: tuple = (False, 0)
    # selective encryption (crypto.cpp parity)
    crypto: object = None
    encrypt_params: int = 0


def _last_ctx_params(c_idx, log2_size):
    if c_idx == 0:
        offset = 3 * (log2_size - 2) + ((log2_size - 1) >> 2)
        shift = (log2_size + 1) >> 2
    else:
        offset = 15
        shift = log2_size - 2
    return offset, shift


def _sig_ctx_table(p: RCParams, x_cg, y_cg, prev_sig):
    """-> (ctx_idx_map row, scalar offset) for n>0 sig flags."""
    if p.transform_skip_context and (p.transform_skip or p.transquant_bypass):
        return _CTX_IDX_MAP[4], 40 if p.c_idx == 0 else 14 + 27
    scf_offset = 0 if p.c_idx == 0 else 27
    if p.log2_size == 2:
        return _CTX_IDX_MAP[0], scf_offset
    m = _CTX_IDX_MAP[prev_sig + 1]
    if p.c_idx == 0:
        if x_cg > 0 or y_cg > 0:
            scf_offset += 3
        scf_offset += 9 if (p.log2_size == 3 and p.scan_idx == SCAN_DIAG) else \
            (15 if p.log2_size == 3 else 21)
    else:
        scf_offset += 9 if p.log2_size == 3 else 12
    return m, scf_offset


def _sig_ctx_dc(p: RCParams, i, scf_offset):
    """offset for the position-0 sig flag (hevc_cabac.c:1682-1699)."""
    if p.transform_skip_context and (p.transform_skip or p.transquant_bypass):
        return 42 if p.c_idx == 0 else 16 + 27
    if i == 0:
        return 0 if p.c_idx == 0 else 27
    return 2 + scf_offset


def decode_residual(dec, p: RCParams):
    """-> (levels int32 (n,n), transform_skip_flag, rot, rdpcm_dir)."""
    n = 1 << p.log2_size
    levels = np.zeros((n, n), np.int32)

    p.transform_skip = False
    if (not p.transquant_bypass and p.transform_skip_enabled and
            p.log2_size <= p.log2_max_transform_skip_size):
        p.transform_skip = bool(dec.decode_bin(_TSKIP + (1 if p.c_idx else 0)))

    # explicit RDPCM (inter, transform-skip/bypass; hevc_cabac.c:1502-1508)
    erd_flag = False
    erd_dir = 0
    if ((not p.is_intra) and p.explicit_rdpcm and
            (p.transform_skip or p.transquant_bypass)):
        erd_flag = bool(dec.decode_bin(_ERD + (1 if p.c_idx else 0)))
        if erd_flag:
            erd_dir = dec.decode_bin(_ERD_DIR + (1 if p.c_idx else 0))
    p.erd_flag = erd_flag

    # last significant coefficient position
    offset_c, shift_c = _last_ctx_params(p.c_idx, p.log2_size)
    maxv = (p.log2_size << 1) - 1
    lx = 0
    while lx < maxv and dec.decode_bin(_LAST_X + (lx >> shift_c) + offset_c):
        lx += 1
    ly = 0
    while ly < maxv and dec.decode_bin(_LAST_Y + (ly >> shift_c) + offset_c):
        ly += 1
    if lx > 3:
        length = (lx >> 1) - 1
        suffix = dec.decode_bypass_bits(length)
        lx = (1 << length) * (2 + (lx & 1)) + suffix
    if ly > 3:
        length = (ly >> 1) - 1
        suffix = dec.decode_bypass_bits(length)
        ly = (1 << length) * (2 + (ly & 1)) + suffix
    if p.scan_idx == SCAN_VERT:
        lx, ly = ly, lx

    coeff_scan, cg_scan, full_inv = select_scans(p.scan_idx, p.log2_size)
    num_coeff = int(full_inv[ly, lx]) + 1
    num_last_subset = (num_coeff - 1) >> 4
    x_cg_last, y_cg_last = lx >> 2, ly >> 2

    ncg = max(1, n >> 2)
    csbf = np.zeros((ncg, ncg), np.uint8)
    greater1_ctx = 0

    for i in range(num_last_subset, -1, -1):
        x_cg, y_cg = cg_scan[i]
        offset = i << 4
        implicit_nz = 0
        if i < num_last_subset and i > 0:
            ctx_cg = 0
            if x_cg < ncg - 1:
                ctx_cg += csbf[y_cg, x_cg + 1]
            if y_cg < ncg - 1:
                ctx_cg += csbf[y_cg + 1, x_cg]
            inc = min(int(ctx_cg), 1) + (2 if p.c_idx else 0)
            csbf[y_cg, x_cg] = dec.decode_bin(_CSBF + inc)
            implicit_nz = 1
        else:
            csbf[y_cg, x_cg] = ((x_cg == x_cg_last and y_cg == y_cg_last) or
                                (x_cg == 0 and y_cg == 0))

        last_scan_pos = num_coeff - offset - 1
        sig_idx = []
        if i == num_last_subset:
            n_end = last_scan_pos - 1
            sig_idx.append(last_scan_pos)
        else:
            n_end = 15

        prev_sig = 0
        if x_cg < ((n - 1) >> 2):
            prev_sig = int(csbf[y_cg, x_cg + 1] != 0)
        if y_cg < ((n - 1) >> 2):
            prev_sig += int(csbf[y_cg + 1, x_cg] != 0) << 1

        if csbf[y_cg, x_cg] and n_end >= 0:
            ctx_map, scf_offset = _sig_ctx_table(p, x_cg, y_cg, prev_sig)
            for sn in range(n_end, 0, -1):
                x_c, y_c = coeff_scan[sn]
                inc = ctx_map[(y_c << 2) + x_c] + scf_offset
                if dec.decode_bin(_SIG + inc):
                    sig_idx.append(sn)
                    implicit_nz = 0
            if implicit_nz == 0:
                off0 = _sig_ctx_dc(p, i, scf_offset)
                if dec.decode_bin(_SIG + off0):
                    sig_idx.append(0)
            else:
                sig_idx.append(0)

        n_sig = len(sig_idx)
        if n_sig == 0:
            continue

        # greater1 / greater2 / signs / remaining
        ctx_set = 2 if (i > 0 and p.c_idx == 0) else 0
        if i != num_last_subset and greater1_ctx == 0:
            ctx_set += 1
        greater1_ctx = 1
        last_nz = sig_idx[0]
        first_nz = sig_idx[-1]

        g1 = []
        first_g1_idx = -1
        for m in range(min(n_sig, 8)):
            inc = (ctx_set << 2) + greater1_ctx + (16 if p.c_idx else 0)
            f = dec.decode_bin(_G1 + inc)
            g1.append(f)
            if f:
                greater1_ctx = 0
                if first_g1_idx == -1:
                    first_g1_idx = m
            elif 0 < greater1_ctx < 3:
                greater1_ctx += 1

        if p.transquant_bypass or erd_flag or (
                p.is_intra and p.implicit_rdpcm and p.transform_skip and
                p.pred_mode_intra in (10, 26)):
            sign_hidden = False
        else:
            sign_hidden = (last_nz - first_nz) >= 4

        if first_g1_idx != -1:
            g1[first_g1_idx] += dec.decode_bin(_G2 + ctx_set + (4 if p.c_idx else 0))

        nb_signs = n_sig - (1 if (p.sign_data_hiding and sign_hidden) else 0)
        coeff_signs = dec.decode_bypass_bits(nb_signs)
        if p.crypto is not None and p.encrypt_params & 8:   # COEFF_SIGNS
            from ..crypto import xform_signs
            coeff_signs = xform_signs(p.crypto, coeff_signs, nb_signs)
        coeff_signs <<= 16 - nb_signs

        c_rice, sb_type = _rice_init(p)
        rice_stat_done = False
        sum_abs = 0
        for m in range(n_sig):
            sn = sig_idx[m]
            x_c = (x_cg << 2) + coeff_scan[sn][0]
            y_c = (y_cg << 2) + coeff_scan[sn][1]
            if m < 8:
                level = 1 + g1[m]
                if level == (3 if m == first_g1_idx else 2):
                    rem = _decode_remaining(dec, c_rice, p, base=level)
                    level += rem
                    c_rice = _rice_update(p, c_rice, level, rem, sb_type,
                                          rice_stat_done)
                    rice_stat_done = True
            else:
                rem = _decode_remaining(dec, c_rice, p, base=1)
                level = 1 + rem
                c_rice = _rice_update(p, c_rice, level, rem, sb_type,
                                      rice_stat_done)
                rice_stat_done = True
            if p.sign_data_hiding and sign_hidden:
                sum_abs += level
                if sn == first_nz and (sum_abs & 1):
                    level = -level
            if coeff_signs >> 15:
                level = -level
            coeff_signs = (coeff_signs << 1) & 0xFFFF
            levels[y_c, x_c] = level

    rot, rdir = derive_rext_transform(p, erd_flag, erd_dir)
    return levels, p.transform_skip, rot, rdir


def _rice_init(p: RCParams):
    """Per-subset rice parameter init (hevc_cabac.c:1718-1724)."""
    if not p.persistent_rice:
        return 0, 0
    sb_type = 2 * (1 if p.c_idx == 0 else 0)
    if p.transform_skip or p.transquant_bypass:
        sb_type += 1
    return int(p.stat_coeff[sb_type]) // 4, sb_type


def _rice_update(p: RCParams, c_rice, level, rem, sb_type, stat_done):
    """Rice escalation + once-per-subset stat_coeff adaptation
    (hevc_cabac.c:1776-1788)."""
    if level > (3 << c_rice):
        c_rice = c_rice + 1 if p.persistent_rice else min(c_rice + 1, 4)
    if p.persistent_rice and not stat_done:
        init = int(p.stat_coeff[sb_type]) // 4
        if rem >= (3 << init):
            p.stat_coeff[sb_type] += 1
        elif 2 * rem < (1 << init):
            if p.stat_coeff[sb_type] > 0:
                p.stat_coeff[sb_type] -= 1
    return c_rice


def derive_rext_transform(p: RCParams, erd_flag, erd_dir):
    """-> (rot, rdpcm_dir) mirroring the residual-coding tail
    (hevc_cabac.c:1868-1895).  Note the fork gates the implicit-RDPCM of
    transform-skip blocks on transform_skip_ROTATION_enabled (not
    implicit_rdpcm_enabled, an upstream divergence) — mirrored for parity.
    rdpcm_dir: -1 none, 0 horizontal, 1 vertical."""
    rot = False
    rdir = -1
    if p.transquant_bypass:
        if erd_flag or (p.implicit_rdpcm and p.pred_mode_intra in (10, 26)):
            rdir = ((1 if p.pred_mode_intra == 26 else 0)
                    if p.implicit_rdpcm else erd_dir)
    elif p.transform_skip:
        rot = (p.rotation_enabled and p.log2_size == 2 and p.is_intra)
        if erd_flag or (p.rotation_enabled and p.is_intra and
                        p.pred_mode_intra in (10, 26)):
            rdir = erd_dir if erd_flag else (1 if p.pred_mode_intra == 26
                                             else 0)
    return rot, rdir


def _decode_remaining(dec, rice, p=None, base=1):
    enc_on = (p is not None and p.crypto is not None and
              (p.encrypt_params & 4))                     # TRANSF_COEFFS
    prefix = 0
    while prefix < 31 and dec.decode_bypass():
        prefix += 1
    if prefix < 3:
        suffix = dec.decode_bypass_bits(rice)
        if enc_on:
            from ..crypto import xform_remaining_suffix
            suffix = xform_remaining_suffix(p.crypto, prefix, suffix, rice,
                                            base, encrypt=False)
        return (prefix << rice) + suffix
    pm3 = prefix - 3
    suffix = dec.decode_bypass_bits(pm3 + rice)
    if enc_on:
        from ..crypto import xform_eg_suffix
        suffix = xform_eg_suffix(p.crypto, suffix, pm3 + rice, encrypt=False)
    return (((1 << pm3) + 2) << rice) + suffix


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _encode_remaining(enc, value, rice, p=None, base=1):
    enc_on = (p is not None and p.crypto is not None and
              (p.encrypt_params & 4))
    if value < (3 << rice):
        prefix = value >> rice
        suffix = value & ((1 << rice) - 1)
        if enc_on:
            from ..crypto import xform_remaining_suffix
            suffix = xform_remaining_suffix(p.crypto, prefix, suffix, rice,
                                            base, encrypt=True)
        for _ in range(prefix):
            enc.encode_bypass(1)
        enc.encode_bypass(0)
        enc.encode_bypass_bits(suffix, rice)
        return
    pm3 = ((value >> rice) - 2).bit_length() - 1
    suffix = value - (((1 << pm3) + 2) << rice)
    assert 0 <= suffix < (1 << (pm3 + rice))
    if enc_on:
        from ..crypto import xform_eg_suffix
        suffix = xform_eg_suffix(p.crypto, suffix, pm3 + rice, encrypt=True)
    for _ in range(3 + pm3):
        enc.encode_bypass(1)
    enc.encode_bypass(0)
    enc.encode_bypass_bits(suffix, pm3 + rice)


def _encode_last_prefix(enc, value, max_v, base, offset_c, shift_c):
    prefix = value if value <= 3 else ((value.bit_length() - 1) << 1) + \
        ((value >> (value.bit_length() - 2)) & 1)
    for i in range(prefix):
        enc.encode_bin(base + (i >> shift_c) + offset_c, 1)
    if prefix < max_v:
        enc.encode_bin(base + (prefix >> shift_c) + offset_c, 0)
    return prefix


def encode_residual(enc, p: RCParams, levels: np.ndarray,
                    transform_skip: bool = False):
    """Encode one TU's coefficient levels. levels must be non-all-zero.
    Sets p.erd_flag and returns via derive_rext_transform-compatible state
    (the caller re-derives rot/rdpcm from p + p.supply_erd)."""
    n = 1 << p.log2_size
    assert levels.shape == (n, n)

    if (not p.transquant_bypass and p.transform_skip_enabled and
            p.log2_size <= p.log2_max_transform_skip_size):
        enc.encode_bin(_TSKIP + (1 if p.c_idx else 0), 1 if transform_skip else 0)
    p.transform_skip = transform_skip

    erd_flag, erd_dir = p.supply_erd
    if ((not p.is_intra) and p.explicit_rdpcm and
            (transform_skip or p.transquant_bypass)):
        enc.encode_bin(_ERD + (1 if p.c_idx else 0), 1 if erd_flag else 0)
        if erd_flag:
            enc.encode_bin(_ERD_DIR + (1 if p.c_idx else 0), erd_dir)
    else:
        erd_flag, erd_dir = False, 0
    p.erd_flag = erd_flag

    coeff_scan, cg_scan, full_inv = select_scans(p.scan_idx, p.log2_size)
    nz = levels != 0
    assert nz.any(), "encode_residual requires at least one nonzero level"
    scan_pos = np.where(nz, full_inv, -1)
    num_coeff = int(scan_pos.max()) + 1
    ly, lx = np.unravel_index(int(np.argmax(scan_pos)), scan_pos.shape)
    lx, ly = int(lx), int(ly)

    # last sig coeff position (swap back for vertical scan)
    ex, ey = (ly, lx) if p.scan_idx == SCAN_VERT else (lx, ly)
    offset_c, shift_c = _last_ctx_params(p.c_idx, p.log2_size)
    maxv = (p.log2_size << 1) - 1
    px = _encode_last_prefix(enc, ex, maxv, _LAST_X, offset_c, shift_c)
    py = _encode_last_prefix(enc, ey, maxv, _LAST_Y, offset_c, shift_c)
    if px > 3:
        length = (px >> 1) - 1
        enc.encode_bypass_bits(ex - (1 << length) * (2 + (px & 1)), length)
    if py > 3:
        length = (py >> 1) - 1
        enc.encode_bypass_bits(ey - (1 << length) * (2 + (py & 1)), length)

    num_last_subset = (num_coeff - 1) >> 4
    x_cg_last, y_cg_last = lx >> 2, ly >> 2
    ncg = max(1, n >> 2)

    # coded-sub-block flags: a CG is coded iff it contains a nonzero level OR
    # is the first/last CG (those are implicit 1)
    csbf = np.zeros((ncg, ncg), np.uint8)
    for cy in range(ncg):
        for cx in range(ncg):
            csbf[cy, cx] = nz[cy * 4:cy * 4 + 4, cx * 4:cx * 4 + 4].any()
    csbf[y_cg_last, x_cg_last] = 1
    csbf[0, 0] = 1

    greater1_ctx = 0
    coded = np.zeros((ncg, ncg), np.uint8)    # csbf as seen by the decoder

    for i in range(num_last_subset, -1, -1):
        x_cg, y_cg = cg_scan[i]
        offset = i << 4
        this_csbf = int(csbf[y_cg, x_cg])
        if i < num_last_subset and i > 0:
            ctx_cg = 0
            if x_cg < ncg - 1:
                ctx_cg += coded[y_cg, x_cg + 1]
            if y_cg < ncg - 1:
                ctx_cg += coded[y_cg + 1, x_cg]
            inc = min(int(ctx_cg), 1) + (2 if p.c_idx else 0)
            enc.encode_bin(_CSBF + inc, this_csbf)
        coded[y_cg, x_cg] = this_csbf

        last_scan_pos = num_coeff - offset - 1
        sig_idx = []
        if i == num_last_subset:
            n_end = last_scan_pos - 1
            sig_idx.append(last_scan_pos)
            implicit_nz = 0
        else:
            n_end = 15
            implicit_nz = 1 if (0 < i < num_last_subset) else 0

        prev_sig = 0
        if x_cg < ((n - 1) >> 2):
            prev_sig = int(coded[y_cg, x_cg + 1] != 0)
        if y_cg < ((n - 1) >> 2):
            prev_sig += int(coded[y_cg + 1, x_cg] != 0) << 1

        if this_csbf and n_end >= 0:
            ctx_map, scf_offset = _sig_ctx_table(p, x_cg, y_cg, prev_sig)
            for sn in range(n_end, 0, -1):
                x_c, y_c = coeff_scan[sn]
                sig = int(levels[(y_cg << 2) + y_c, (x_cg << 2) + x_c] != 0)
                inc = ctx_map[(y_c << 2) + x_c] + scf_offset
                enc.encode_bin(_SIG + inc, sig)
                if sig:
                    sig_idx.append(sn)
                    implicit_nz = 0
            dc_sig = int(levels[y_cg << 2, x_cg << 2] != 0)
            if implicit_nz == 0:
                off0 = _sig_ctx_dc(p, i, scf_offset)
                enc.encode_bin(_SIG + off0, dc_sig)
                if dc_sig:
                    sig_idx.append(0)
            else:
                assert dc_sig, "csbf=1 subset with no significant coefficients"
                sig_idx.append(0)
        elif not this_csbf:
            continue

        n_sig = len(sig_idx)
        if n_sig == 0:
            continue

        vals = []
        for sn in sig_idx:
            x_c = (x_cg << 2) + coeff_scan[sn][0]
            y_c = (y_cg << 2) + coeff_scan[sn][1]
            vals.append(int(levels[y_c, x_c]))

        ctx_set = 2 if (i > 0 and p.c_idx == 0) else 0
        if i != num_last_subset and greater1_ctx == 0:
            ctx_set += 1
        greater1_ctx = 1
        last_nz = sig_idx[0]
        first_nz = sig_idx[-1]

        first_g1_idx = -1
        for m in range(min(n_sig, 8)):
            f = 1 if abs(vals[m]) > 1 else 0
            inc = (ctx_set << 2) + greater1_ctx + (16 if p.c_idx else 0)
            enc.encode_bin(_G1 + inc, f)
            if f:
                greater1_ctx = 0
                if first_g1_idx == -1:
                    first_g1_idx = m
            elif 0 < greater1_ctx < 3:
                greater1_ctx += 1

        if p.transquant_bypass or erd_flag or (
                p.is_intra and p.implicit_rdpcm and transform_skip and
                p.pred_mode_intra in (10, 26)):
            sign_hidden = False
        else:
            sign_hidden = (last_nz - first_nz) >= 4

        if first_g1_idx != -1:
            g2 = 1 if abs(vals[first_g1_idx]) > 2 else 0
            enc.encode_bin(_G2 + ctx_set + (4 if p.c_idx else 0), g2)

        hide = p.sign_data_hiding and sign_hidden
        nb_signs = n_sig - (1 if hide else 0)
        signs = 0
        for m in range(nb_signs):
            signs = (signs << 1) | (1 if vals[m] < 0 else 0)
        if p.crypto is not None and p.encrypt_params & 8:
            from ..crypto import xform_signs
            signs = xform_signs(p.crypto, signs, nb_signs)
        for m in range(nb_signs - 1, -1, -1):
            enc.encode_bypass((signs >> m) & 1)
        if hide:
            # hidden sign must equal parity of sum of abs levels
            assert (sum(abs(v) for v in vals) & 1) == (1 if vals[-1] < 0 else 0)

        c_rice, sb_type = _rice_init(p)
        rice_stat_done = False
        for m in range(n_sig):
            a = abs(vals[m])
            if m < 8:
                base = 3 if m == first_g1_idx else 2
                if a >= base:
                    _encode_remaining(enc, a - base, c_rice, p, base=base)
                    c_rice = _rice_update(p, c_rice, a, a - base, sb_type,
                                          rice_stat_done)
                    rice_stat_done = True
            else:
                _encode_remaining(enc, a - 1, c_rice, p, base=1)
                c_rice = _rice_update(p, c_rice, a, a - 1, sb_type,
                                      rice_stat_done)
                rice_stat_done = True
