"""SEI messages: decoded-picture-hash (the conformance oracle) + passthrough.

Parses the framing of spec 7.3.5 (reference hevc_sei.c:134) and the
decoded_picture_hash payload (hevc_sei.c:28).  The writer emits a suffix SEI
(payload type 132, MD5) so generated streams carry the same per-frame
correctness oracle conformance bitstreams do.
"""

import hashlib

import numpy as np

from ..bitstream.bits import BitReader, BitWriter
from ..bitstream import nal as nalmod

PICTURE_HASH_SUFFIX = 132
PICTURE_HASH_PREFIX_QUIRK = 256   # the reference also accepts this on prefix
PIC_TIMING = 1
FRAME_PACKING = 45
ACTIVE_PARAMETER_SETS = 129


def _parse_frame_packing(r):
    """frame_packing_arrangement SEI (reference hevc_sei.c:52): returns
    dict or None when the cancel flag is set."""
    r.ue()                                  # frame_packing_arrangement_id
    if r.u1():                              # cancel flag
        return None
    fp = {"arrangement_type": r.u(7),
          "quincunx_subsampling": r.u1(),
          "content_interpretation_type": r.u(6)}
    r.u(6)          # spatial_flipping..frame1_self_contained flags
    if not fp["quincunx_subsampling"] and fp["arrangement_type"] != 5:
        r.u(16)     # frame[01]_grid_position_[xy]
    r.u(8)          # reserved byte
    r.u(1)          # persistence flag
    return fp


def _parse_pic_timing(r, sps):
    """pic_timing SEI (reference hevc_sei.c:78): picture_struct only, and
    only when the active SPS VUI signals frame_field_info."""
    if sps is None or sps.vui is None or \
            not sps.vui.frame_field_info_present:
        return None
    ps = r.u(4)
    r.u(2)                                  # source_scan_type
    r.u(1)                                  # duplicate_flag
    return {"picture_struct": ps}


def _parse_active_ps(r):
    """active_parameter_sets SEI (reference hevc_sei.c:110)."""
    r.u(4)                                  # active_video_parameter_set_id
    r.u(1)                                  # self_contained_cvs_flag
    r.u(1)                                  # no_parameter_set_update_flag
    n = r.ue()                              # num_sps_ids_minus1
    active_sps = r.ue()
    for _ in range(n):
        r.ue()
    return {"active_seq_parameter_set_id": active_sps}


def parse_sei(rbsp: bytes, nal_type: int, sps=None, sps_list=None,
              active_sps_id=None):
    """-> list of (kind, payload).  Parsed kinds: picture_hash,
    frame_packing, pic_timing, active_parameter_sets (the set the
    reference parses, hevc_sei.c:134-180); other types pass through as
    (payload_type, None).

    sps_list/active_sps_id: an active_parameter_sets message re-targets
    the SPS used by a pic_timing payload LATER IN THE SAME NAL (the
    reference updates active_seq_parameter_set_id mid-NAL,
    hevc_sei.c:163-171); `sps` is the fallback when no id resolves."""
    r = BitReader(rbsp)
    out = []
    is_prefix = nal_type == nalmod.NAL_SEI_PREFIX

    def active_sps():
        if sps_list is not None and active_sps_id is not None:
            return sps_list.get(active_sps_id, sps)
        return sps
    while True:
        ptype = 0
        b = 0xFF
        while b == 0xFF:
            b = r.u(8)
            ptype += b
        psize = 0
        b = 0xFF
        while b == 0xFF:
            b = r.u(8)
            psize += b
        end_bit = r.bits_left() - 8 * psize
        if ptype == PICTURE_HASH_SUFFIX or ptype == PICTURE_HASH_PREFIX_QUIRK:
            hash_type = r.u(8)
            hashes = []
            for _ in range(3):
                if hash_type == 0:
                    hashes.append(bytes(r.u(8) for _ in range(16)))
                elif hash_type == 1:
                    r.u(16)
                elif hash_type == 2:
                    r.u(32)
            out.append(("picture_hash", hashes))
        elif ptype == FRAME_PACKING and is_prefix:
            out.append(("frame_packing", _parse_frame_packing(r)))
        elif ptype == PIC_TIMING and is_prefix:
            out.append(("pic_timing", _parse_pic_timing(r, active_sps())))
        elif ptype == ACTIVE_PARAMETER_SETS and is_prefix:
            aps = _parse_active_ps(r)
            active_sps_id = aps["active_seq_parameter_set_id"]
            out.append(("active_parameter_sets", aps))
        else:
            for _ in range(psize):
                r.u(8)
            out.append((ptype, None))
        # skip any unread payload tail (payloads are byte-sized)
        while r.bits_left() > max(end_bit, 0):
            r.u(1)
        if r.bits_left() <= 8:
            break
        # more_rbsp_data heuristic: stop at the rbsp trailing byte
        if not r.more_rbsp_data():
            break
    return out


def plane_md5(plane: np.ndarray, bit_depth: int) -> bytes:
    """Per-plane MD5 exactly like the reference's verify_md5 (hevc.c:4045):
    rows of the coded picture, 8-bit or 16-bit little-endian samples."""
    dt = np.dtype("<u2") if bit_depth > 8 else np.uint8
    return hashlib.md5(np.ascontiguousarray(plane.astype(dt)).tobytes()).digest()


def write_picture_hash_sei(md5s) -> bytes:
    """Build the suffix-SEI RBSP carrying MD5 hashes for 3 planes."""
    w = BitWriter()
    w.u(PICTURE_HASH_SUFFIX & 0xFF, 8)       # 132 < 255: single byte
    payload_size = 1 + 3 * 16
    w.u(payload_size, 8)
    w.u(0, 8)                                 # hash_type = MD5
    for digest in md5s:
        assert len(digest) == 16
        for byte in digest:
            w.u(byte, 8)
    w.rbsp_trailing_bits()
    return w.get_bytes()
