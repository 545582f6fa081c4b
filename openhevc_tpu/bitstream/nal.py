"""NAL unit layer: annex-B splitting, RBSP (un)escaping, NAL headers.

Mirrors the behavior of the reference's ff_hevc_extract_rbsp
(libavcodec/hevc.c:3724) and the annex-B scan in decode_nal_units
(hevc.c:3855), including the recording of removed emulation-prevention byte
positions (needed to fix up WPP/tile entry-point offsets).
"""

from dataclasses import dataclass, field
from typing import List

import numpy as np

# HEVC NAL unit types (ITU-T H.265 table 7-1); subset used by the decoder.
NAL_TRAIL_N = 0
NAL_TRAIL_R = 1
NAL_TSA_N = 2
NAL_TSA_R = 3
NAL_STSA_N = 4
NAL_STSA_R = 5
NAL_RADL_N = 6
NAL_RADL_R = 7
NAL_RASL_N = 8
NAL_RASL_R = 9
NAL_BLA_W_LP = 16
NAL_BLA_W_RADL = 17
NAL_BLA_N_LP = 18
NAL_IDR_W_RADL = 19
NAL_IDR_N_LP = 20
NAL_CRA_NUT = 21
NAL_VPS = 32
NAL_SPS = 33
NAL_PPS = 34
NAL_AUD = 35
NAL_EOS_NUT = 36
NAL_EOB_NUT = 37
NAL_FD_NUT = 38
NAL_SEI_PREFIX = 39
NAL_SEI_SUFFIX = 40


def is_irap(nal_type: int) -> bool:
    return NAL_BLA_W_LP <= nal_type <= 23


def is_idr(nal_type: int) -> bool:
    return nal_type in (NAL_IDR_W_RADL, NAL_IDR_N_LP)


def is_vcl(nal_type: int) -> bool:
    return nal_type < 32


@dataclass
class NalUnit:
    type: int
    layer_id: int
    temporal_id: int          # nuh_temporal_id_plus1 - 1
    rbsp: bytes               # unescaped payload (header bytes excluded)
    skipped_bytes: List[int] = field(default_factory=list)  # EPB positions in rbsp
    raw_size: int = 0         # escaped size incl. 2-byte header


def parse_nal_header(data: bytes):
    """Parse the 2-byte HEVC NAL header -> (type, layer_id, temporal_id)."""
    if len(data) < 2:
        raise ValueError("truncated NAL header")
    b0, b1 = data[0], data[1]
    if b0 & 0x80:
        raise ValueError("forbidden_zero_bit set")
    nal_type = (b0 >> 1) & 0x3F
    layer_id = ((b0 & 1) << 5) | (b1 >> 3)
    temporal_id = (b1 & 7) - 1
    return nal_type, layer_id, temporal_id


def extract_rbsp(data: bytes):
    """Remove emulation-prevention 0x03 bytes; return (rbsp, skipped_positions).

    skipped_positions are indices *in the output rbsp* after which a 0x03 was
    removed, matching the reference's skipped_bytes bookkeeping semantics.
    """
    n = len(data)
    if n < 3:
        return bytes(data), []
    d = np.frombuffer(data, np.uint8)
    # a removable 0x03 always follows two zeros; zeros are never removed,
    # so the vectorized mask over original bytes matches the scalar walk
    cand = np.flatnonzero((d[2:] == 3) & (d[1:-1] == 0) & (d[:-2] == 0)) + 2
    if cand.size == 0:
        return bytes(data), []
    out = np.delete(d, cand)
    skipped = (cand - np.arange(cand.size)).tolist()
    return out.tobytes(), skipped


def substream_rbsp_offsets(entry_point_offsets, data_start: int,
                           skipped, payload_len: int):
    """Convert slice-header entry points into RBSP substream offsets.

    entry_point_offsets are escaped-NAL-byte substream lengths (spec 7.4.7.1);
    the decoder splits the *unescaped* payload, so each offset must shrink by
    the number of emulation-prevention bytes removed inside that substream's
    span. Mirrors hls_slice_data's fixup (hevc.c:3030-3051); `skipped` holds
    extract_rbsp's removed-EPB positions (rbsp index of the byte that
    followed the removed 0x03), `data_start` is the rbsp byte offset of the
    slice data. Returns payload-relative offsets [0, o1, .., on, payload_len].
    """
    offs = [0]
    cur = data_start
    for e in entry_point_offsets:
        end = cur + e
        for p in skipped:
            if cur < p <= end:
                end -= 1
            elif p > end:
                break
        cur = end
        offs.append(cur - data_start)
    offs.append(payload_len)
    return offs


def escaped_entry_points(header_rbsp: bytes, payload: bytes, sub_lens):
    """Encoder-side inverse of substream_rbsp_offsets.

    Given the slice-header rbsp, the concatenated unescaped CABAC payload
    and the unescaped byte length of each substream, return conformant
    entry_point_offsets (escaped-byte substream lengths, one per substream
    except the last) by simulating emulation-prevention insertion over the
    whole NAL payload. An EPB whose following byte is the first byte of
    substream i+1 is attributed to substream i, and one preceding the very
    first payload byte to the header — matching substream_rbsp_offsets'
    windowing (cur < p <= end).
    """
    esc_hdr = escape_rbsp(header_rbsp)
    zeros = 0
    for b in esc_hdr[-2:]:
        zeros = zeros + 1 if b == 0 else 0
    counts = [0] * len(sub_lens)
    ends = []
    acc = 0
    for ln in sub_lens:
        acc += ln
        ends.append(acc)
    si = 0
    for idx, b in enumerate(payload):
        while si < len(sub_lens) - 1 and idx >= ends[si]:
            si += 1
        if zeros >= 2 and b <= 3:
            # EPB inserted before rbsp index idx; owner: substream j with
            # start_j < idx <= end_j (idx == start of substream si means the
            # previous substream, or the header when idx == 0)
            j = si if idx != (ends[si - 1] if si else 0) else si - 1
            if j >= 0:
                counts[j] += 1
            zeros = 0
        zeros = zeros + 1 if b == 0 else 0
    return [sub_lens[i] + counts[i] for i in range(len(sub_lens) - 1)]


def escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (inverse of extract_rbsp)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def split_annexb(buf: bytes) -> List[NalUnit]:
    """Split an annex-B elementary stream into NAL units."""
    nals = []
    n = len(buf)
    i = buf.find(b"\x00\x00\x01")
    if i < 0:
        return nals
    while i >= 0 and i < n:
        start = i + 3
        j = buf.find(b"\x00\x00\x01", start)
        end = j if j >= 0 else n
        # strip trailing zero bytes that belong to the next start code prefix
        payload_end = end
        while payload_end > start and buf[payload_end - 1] == 0:
            payload_end -= 1
        raw = buf[start:payload_end]
        if len(raw) >= 2:
            nal_type, layer_id, tid = parse_nal_header(raw)
            rbsp, skipped = extract_rbsp(raw[2:])
            nals.append(NalUnit(nal_type, layer_id, tid, rbsp, skipped,
                                raw_size=len(raw)))
        i = j
    return nals


def write_nal(nal_type: int, rbsp: bytes, layer_id: int = 0,
              temporal_id: int = 0, long_start: bool = True) -> bytes:
    """Serialize one NAL unit with annex-B start code."""
    hdr = bytes([(nal_type << 1) | (layer_id >> 5),
                 ((layer_id & 0x1F) << 3) | (temporal_id + 1)])
    sc = b"\x00\x00\x00\x01" if long_start else b"\x00\x00\x01"
    return sc + hdr + escape_rbsp(rbsp)


def write_annexb(nals) -> bytes:
    """nals: iterable of (nal_type, rbsp) or (nal_type, rbsp, layer_id, tid)."""
    out = bytearray()
    for item in nals:
        if len(item) == 2:
            nal_type, rbsp = item
            layer_id = tid = 0
        else:
            nal_type, rbsp, layer_id, tid = item
        out += write_nal(nal_type, rbsp, layer_id, tid)
    return bytes(out)
