"""Stream parser: AU boundary detection + picture probing without decode.

Equivalent of the reference's AVCodecParser (libavcodec/hevc_parser.c):
  - find_frame_end: incremental access-unit boundary scan over raw bytes
    (hevc_parser.c:40-79), SHVC-aware — higher-layer NALs never break an AU.
  - HevcParser.probe / iter_access_units: light slice-header parse
    (hevc_parser.c:89-263) extracting pict_type / POC / key_frame per AU
    without entropy-decoding anything.
  - split_ps: extradata split after the leading parameter sets
    (hevc_split, hevc_parser.c:291-317).
"""

from dataclasses import dataclass
from typing import List, Optional

from .bitstream import nal as nalmod
from .bitstream.bits import BitReader
from .bitstream.nal import split_annexb, parse_nal_header
from .ps.params import parse_vps, parse_sps, parse_pps

I_PICT, P_PICT, B_PICT = "I", "P", "B"
_SLICE_PICT = {2: I_PICT, 1: P_PICT, 0: B_PICT}


@dataclass
class PictureInfo:
    offset: int                  # byte offset of the AU in the buffer
    size: int
    pict_type: str = I_PICT
    poc: int = 0
    key_frame: bool = False
    nal_type: int = 0
    temporal_id: int = 0


class FrameEndScanner:
    """Streaming AU-boundary scan (ff_hevc_find_frame_end semantics): feed
    arbitrary byte chunks; returns the ABSOLUTE stream offset of the byte
    just past the AU (i.e. where the next AU's start code begins, possibly
    inside an earlier chunk), or -1 (END_NOT_FOUND).  After a hit, resume by
    feeding the remaining bytes (from `self.consumed`) of the stream."""

    def __init__(self):
        self.state = 0               # rolling 64-bit byte window
        self.frame_start_found = False
        self.consumed = 0            # absolute position after scanned bytes

    def scan(self, buf: bytes) -> int:
        base = self.consumed
        for i, by in enumerate(buf):
            self.state = ((self.state << 8) | by) & 0xFFFFFFFFFFFFFFFF
            hit = False
            if ((self.state >> 24) & 0xFFFFFF) == 0x000001:
                nut = (self.state >> 17) & 0x3F
                layer_id = (((self.state >> 16) & 1) << 5) | \
                    (((self.state >> 8) & 0xF8) >> 3)
                if (32 <= nut <= 35) or nut == 39 or 41 <= nut <= 44 or \
                        48 <= nut <= 55:
                    if self.frame_start_found and layer_id == 0:
                        self.frame_start_found = False
                        hit = True
                elif nut <= 9 or 16 <= nut <= 21:
                    first_slice = by >> 7
                    if first_slice and layer_id == 0:
                        if self.frame_start_found:
                            # this slice opens the NEXT AU; since scanning
                            # continues past it, it stays "found"
                            hit = True
                        self.frame_start_found = True
            if hit:
                self.consumed = base + i + 1
                return base + i - 5
        self.consumed = base + len(buf)
        return -1


def split_ps(data: bytes) -> int:
    """Return the byte length of the leading parameter-set run (the
    extradata split point); 0 if the stream does not start with PS NALs."""
    state = 0xFFFFFFFF
    has_ps = False
    for i, by in enumerate(data):
        state = ((state << 8) | by) & 0xFFFFFFFF
        if ((state >> 8) & 0xFFFFFF) == 0x000001:
            nut = (state >> 1) & 0x3F
            if nut in (nalmod.NAL_VPS, nalmod.NAL_SPS, nalmod.NAL_PPS):
                has_ps = True
            elif has_ps:
                return i - 3        # hevc_parser.c:304 (3-byte start code)
            else:
                return 0
    return 0


class HevcParser:
    """Stateful picture prober: parameter sets are tracked so slice headers
    can be skimmed for POC / type without any CABAC work."""

    def __init__(self):
        self.vps_list = {}
        self.sps_list = {}
        self.pps_list = {}
        self.prev_poc = 0

    def _probe_slice(self, nal) -> Optional[tuple]:
        r = BitReader(nal.rbsp)
        first_slice = r.u1()
        if nalmod.is_irap(nal.type):
            r.u1()                  # no_output_of_prior_pics
        pps_id = r.ue()
        pps = self.pps_list.get(pps_id)
        sps = self.sps_list.get(pps.sps_id) if pps else None
        if pps is None or sps is None:
            return None
        dependent = 0
        if not first_slice:
            if pps.dependent_slice_segments_enabled:
                dependent = r.u1()
            n = max(1, (sps.pic_size_in_ctbs - 1).bit_length())
            r.u(n)                  # slice_segment_address
        if dependent:
            return None
        for _ in range(pps.num_extra_slice_header_bits):
            r.u1()
        slice_type = r.ue()
        if pps.output_flag_present:
            r.u1()
        if sps.separate_colour_plane_flag:
            r.u(2)
        poc = 0
        if not nalmod.is_idr(nal.type):
            lsb = r.u(sps.log2_max_poc_lsb)
            max_lsb = 1 << sps.log2_max_poc_lsb
            prev = self.prev_poc
            prev_lsb = prev & (max_lsb - 1)
            prev_msb = prev - prev_lsb
            if lsb < prev_lsb and prev_lsb - lsb >= max_lsb // 2:
                msb = prev_msb + max_lsb
            elif lsb > prev_lsb and lsb - prev_lsb > max_lsb // 2:
                msb = prev_msb - max_lsb
            else:
                msb = prev_msb
            poc = msb + lsb
        # prevTid0Pic predictor update (hevc.c:793-802)
        if nal.temporal_id == 0 and nal.type not in (
                nalmod.NAL_TRAIL_N, nalmod.NAL_TSA_N, nalmod.NAL_STSA_N,
                nalmod.NAL_RADL_N, nalmod.NAL_RADL_R,
                nalmod.NAL_RASL_N, nalmod.NAL_RASL_R):
            self.prev_poc = poc
        return (_SLICE_PICT.get(slice_type, I_PICT), poc, first_slice)

    def probe_au(self, au: bytes) -> PictureInfo:
        """Parse one AU's headers -> PictureInfo (pict_type of the first
        independent slice; the reference reports B>P>I priority across
        slices — hevc_parser.c:246-253)."""
        info = PictureInfo(offset=0, size=len(au))
        rank = {I_PICT: 0, P_PICT: 1, B_PICT: 2}
        for nal in split_annexb(au):
            t = nal.type
            try:
                if t == nalmod.NAL_VPS:
                    v = parse_vps(nal.rbsp)
                    self.vps_list[v.vps_id] = v
                elif t == nalmod.NAL_SPS:
                    s = parse_sps(nal.rbsp, layer_id=nal.layer_id,
                                  vps_list=self.vps_list)
                    self.sps_list[s.sps_id] = s
                elif t == nalmod.NAL_PPS:
                    p = parse_pps(nal.rbsp, layer_id=nal.layer_id,
                                  sps_list=self.sps_list)
                    self.pps_list[p.pps_id] = p
                elif nalmod.is_vcl(t) and nal.layer_id == 0:
                    got = self._probe_slice(nal)
                    info.nal_type = t
                    info.temporal_id = nal.temporal_id
                    if nalmod.is_irap(t):
                        info.key_frame = True
                    if got is not None:
                        pict, poc, first = got
                        if rank[pict] >= rank[info.pict_type] or first:
                            info.pict_type = pict
                        info.poc = poc
            except Exception:
                continue            # probing never raises on bad bitstreams
        return info

    def iter_access_units(self, data: bytes):
        """Split a whole buffer into AUs and probe each ->
        [(PictureInfo with offset/size filled)]."""
        sc = FrameEndScanner()
        out: List[PictureInfo] = []
        start = 0
        while True:
            boundary = sc.scan(data[sc.consumed:])
            if boundary < 0:
                break
            au = data[start:boundary]
            if au.strip(b"\x00"):
                info = self.probe_au(au)
                info.offset = start
                info.size = len(au)
                out.append(info)
            start = boundary
        if start < len(data):
            au = data[start:]
            if au.strip(b"\x00"):
                info = self.probe_au(au)
                info.offset = start
                info.size = len(au)
                out.append(info)
        return out
