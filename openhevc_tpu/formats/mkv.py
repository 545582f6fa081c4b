"""Matroska (MKV/WebM) demuxer (and test muxer) for HEVC tracks.

Parity target: the reference ships libavformat's matroskadec.c (SURVEY.md
§2.4, 3380 LoC) so players can feed .mkv files to the decoder.  This
implements the HEVC-relevant subset: EBML varint walk, Segment/Tracks/
TrackEntry (CodecID V_MPEGH/ISO/HEVC + CodecPrivate hvcC), Cluster/
SimpleBlock/BlockGroup with no-lacing, Xiph, fixed and EBML lacing, and
length-prefixed-NAL to annex-B conversion.

The muxer writes a minimal single-track file used by the round-trip tests;
it groups NALs into access units by the first-slice flag.
"""

from ..bitstream import nal as nalmod
from ..bitstream.nal import split_annexb, write_nal
from .mp4 import parse_hvcc, build_hvcc


def _to_annexb(sample: bytes, length_size: int) -> bytes:
    """Length-prefixed NALs -> annex-B."""
    out = bytearray()
    pos, end = 0, len(sample)
    while pos + length_size <= end:
        ln = int.from_bytes(sample[pos:pos + length_size], "big")
        pos += length_size
        out += b"\x00\x00\x00\x01" + sample[pos:pos + ln]
        pos += ln
    return bytes(out)

# EBML element IDs (with marker bits, as they appear in the file)
EBML_HEADER = 0x1A45DFA3
SEGMENT = 0x18538067
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
CODEC_PRIVATE = 0x63A2
CLUSTER = 0x1F43B675
TIMECODE = 0xE7
SIMPLE_BLOCK = 0xA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1


def _read_vint(data, pos, strip_marker=True):
    """EBML varint at pos -> (value, new_pos); marker bit optionally kept
    (element IDs keep it, sizes strip it)."""
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("invalid EBML varint")
    length = 1
    mask = 0x80
    while not (b0 & mask):
        length += 1
        mask >>= 1
    val = b0 & (mask - 1) if strip_marker else b0
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length


def _read_id(data, pos):
    return _read_vint(data, pos, strip_marker=False)


def _elements(data, pos, end):
    """Iterate (id, payload_start, payload_end) over sibling elements."""
    while pos < end:
        eid, pos = _read_id(data, pos)
        size, pos = _read_vint(data, pos)
        yield eid, pos, min(pos + size, end)
        pos += size


def probe_mkv(data: bytes) -> bool:
    return len(data) > 4 and \
        int.from_bytes(data[:4], "big") == EBML_HEADER


def _lace_sizes(data, pos, flags, payload_end):
    """Frame sizes per the Block lacing mode -> (sizes, new_pos).
    The last frame's size is implicit (remainder)."""
    lacing = (flags >> 1) & 3
    if lacing == 0:
        return [payload_end - pos], pos
    nframes = data[pos] + 1
    pos += 1
    sizes = []
    if lacing == 2:                             # fixed-size
        total = payload_end - pos
        each = total // nframes
        sizes = [each] * nframes
    elif lacing == 1:                           # Xiph
        for _ in range(nframes - 1):
            sz = 0
            while data[pos] == 255:
                sz += 255
                pos += 1
            sz += data[pos]
            pos += 1
            sizes.append(sz)
        sizes.append(payload_end - pos - sum(sizes))
    else:                                       # EBML lacing
        first, pos = _read_vint(data, pos)
        sizes.append(first)
        prev = first
        for _ in range(nframes - 2):
            delta, npos = _read_vint(data, pos)
            # signed: subtract the mid-range bias for the varint length
            nbytes = npos - pos
            delta -= (1 << (7 * nbytes - 1)) - 1
            pos = npos
            prev += delta
            sizes.append(prev)
        sizes.append(payload_end - pos - sum(sizes))
    return sizes, pos


def demux_mkv(data: bytes) -> bytes:
    """Matroska bytes -> annex-B HEVC stream (parameter sets + all AUs)."""
    seg = None
    for eid, s, e in _elements(data, 0, len(data)):
        if eid == SEGMENT:
            seg = (s, e)
            break
    if seg is None:
        raise ValueError("no Matroska Segment")

    video_track = None
    length_size = 4
    out = bytearray()
    for eid, s, e in _elements(data, seg[0], seg[1]):
        if eid == TRACKS:
            for tid, ts, te in _elements(data, s, e):
                if tid != TRACK_ENTRY:
                    continue
                tnum, codec, priv = None, None, None
                for fid, fs, fe in _elements(data, ts, te):
                    if fid == TRACK_NUMBER:
                        tnum = int.from_bytes(data[fs:fe], "big")
                    elif fid == CODEC_ID:
                        codec = data[fs:fe].rstrip(b"\x00")
                    elif fid == CODEC_PRIVATE:
                        priv = data[fs:fe]
                if codec == b"V_MPEGH/ISO/HEVC" and video_track is None:
                    video_track = tnum
                    if priv:
                        length_size, ps_nals = parse_hvcc(priv)
                        for nb in ps_nals:
                            out += b"\x00\x00\x00\x01" + nb
        elif eid == CLUSTER:
            for cid, cs, ce in _elements(data, s, e):
                blocks = []
                if cid == SIMPLE_BLOCK:
                    blocks.append((cs, ce))
                elif cid == BLOCK_GROUP:
                    for bid, bs, be in _elements(data, cs, ce):
                        if bid == BLOCK:
                            blocks.append((bs, be))
                for bs, be in blocks:
                    tnum, pos = _read_vint(data, bs)
                    if video_track is not None and tnum != video_track:
                        continue
                    pos += 2                    # relative timecode (s16)
                    flags = data[pos]
                    pos += 1
                    sizes, pos = _lace_sizes(data, pos, flags, be)
                    for sz in sizes:
                        out += _to_annexb(data[pos:pos + sz], length_size)
                        pos += sz
    return bytes(out)


# ---------------------------------------------------------------------------
# minimal muxer (round-trip tests)
# ---------------------------------------------------------------------------

def _enc_vint(val, length=None):
    """Encode an EBML size varint."""
    if length is None:
        length = 1
        while val >= (1 << (7 * length)) - 1:
            length += 1
    out = val | (1 << (7 * length))
    return out.to_bytes(length, "big")


def _enc_id(eid):
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _elem(eid, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_vint(len(payload)) + payload


def mux_mkv(annexb: bytes) -> bytes:
    """Annex-B HEVC stream -> minimal single-track Matroska file."""
    ps = {32: None, 33: None, 34: None}
    sps_obj = None
    aus = []                    # list of lists of raw NAL bytes
    for nal in split_annexb(annexb):
        raw = write_nal(nal.type, nal.rbsp, layer_id=nal.layer_id,
                        temporal_id=nal.temporal_id)[4:]
        if nal.type in (32, 33, 34):
            ps[nal.type] = raw
            if nal.type == 33:
                from ..ps.params import parse_sps
                sps_obj = parse_sps(nal.rbsp)
        elif nalmod.is_vcl(nal.type):
            if nal.rbsp[0] >> 7:                   # first slice: new AU
                aus.append([])
            aus[-1].append(raw)
        else:
            if aus:
                aus[-1].append(raw)
    hvcc = build_hvcc(ps[32], ps[33], ps[34], sps_obj)
    ebml = _elem(EBML_HEADER,
                 _elem(0x4286, b"\x01") +           # EBMLVersion
                 _elem(0x42F7, b"\x01") +           # EBMLReadVersion
                 _elem(0x42F2, b"\x04") +           # EBMLMaxIDLength
                 _elem(0x42F3, b"\x08") +           # EBMLMaxSizeLength
                 _elem(0x4282, b"matroska") +       # DocType
                 _elem(0x4287, b"\x04") +           # DocTypeVersion
                 _elem(0x4285, b"\x02"))            # DocTypeReadVersion
    info = _elem(0x1549A966,
                 _elem(0x2AD7B1, (1000000).to_bytes(3, "big")) +  # TimecodeScale
                 _elem(0x4D80, b"openhevc_tpu") +
                 _elem(0x5741, b"openhevc_tpu"))
    track = _elem(TRACK_ENTRY,
                  _elem(TRACK_NUMBER, b"\x01") +
                  _elem(0x73C5, b"\x01") +          # TrackUID
                  _elem(TRACK_TYPE, b"\x01") +      # video
                  _elem(CODEC_ID, b"V_MPEGH/ISO/HEVC") +
                  _elem(CODEC_PRIVATE, hvcc))
    tracks = _elem(TRACKS, track)
    clusters = b""
    for i, au in enumerate(aus):
        sample = b"".join(len(n).to_bytes(4, "big") + n for n in au)
        block = _enc_vint(1) + (0).to_bytes(2, "big") + bytes([0x80]) + sample
        clusters += _elem(CLUSTER,
                          _elem(TIMECODE, _int_bytes(i * 40)) +
                          _elem(SIMPLE_BLOCK, block))
    segment = _elem(SEGMENT, info + tracks + clusters)
    return ebml + segment


def _int_bytes(v):
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")
