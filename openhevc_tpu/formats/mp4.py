"""MP4 / ISO-BMFF demuxer (and test muxer) for HEVC tracks.

Parity target: the reference ships libavformat's mov demuxer (SURVEY.md §2.4,
mov.c) so players can feed .mp4/.mov files to the decoder.  This implements
the HEVC-relevant subset: box walk, hvc1/hev1 sample entry with hvcC decoder
configuration (ISO 14496-15 §8.3.3), sample tables (stsz/stsc/stco/co64),
and length-prefixed-NAL to annex-B conversion.

The muxer writes a minimal single-track file (ftyp + mdat + moov) used by the
round-trip tests; it groups NALs into access units by the first-slice flag.
"""

import struct

from ..bitstream import nal as nalmod
from ..bitstream.nal import split_annexb


def _boxes(data, pos=0, end=None):
    """Iterate (type, payload_start, payload_end) over sibling boxes."""
    end = len(data) if end is None else end
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr:
            break
        yield typ, pos + hdr, pos + size
        pos += size


def _find(data, path, pos=0, end=None):
    """Find the first box at a '/'-separated path; -> (start, end) or None."""
    parts = path.split(b"/")
    for typ, s, e in _boxes(data, pos, end):
        if typ == parts[0]:
            if len(parts) == 1:
                return s, e
            return _find(data, b"/".join(parts[1:]), s, e)
    return None


def probe_mp4(data: bytes) -> bool:
    return len(data) > 8 and data[4:8] in (b"ftyp", b"moov", b"mdat")


def parse_hvcc(cfg: bytes):
    """hvcC (ISO 14496-15) -> (nal_length_size, [parameter-set NAL bytes])."""
    length_size = (cfg[21] & 3) + 1
    pos = 22
    num_arrays = cfg[pos]
    pos += 1
    out = []
    for _ in range(num_arrays):
        pos += 1
        n = int.from_bytes(cfg[pos:pos + 2], "big")
        pos += 2
        for _ in range(n):
            ln = int.from_bytes(cfg[pos:pos + 2], "big")
            pos += 2
            out.append(cfg[pos:pos + ln])
            pos += ln
    return length_size, out


def demux_mp4(data: bytes) -> bytes:
    """Extract the first HEVC track as an annex-B stream (PS + samples)."""
    moov = _find(data, b"moov")
    if moov is None:
        raise ValueError("no moov box")
    for typ, ts, te in _boxes(data, *moov):
        if typ != b"trak":
            continue
        stbl = _find(data, b"mdia/minf/stbl", ts, te)
        if stbl is None:
            continue
        stsd = _find(data, b"stsd", *stbl)
        if stsd is None:
            continue
        # sample entries start after version/flags + entry_count
        hvcc = None
        for etyp, es, ee in _boxes(data, stsd[0] + 8, stsd[1]):
            if etyp in (b"hvc1", b"hev1"):
                # VisualSampleEntry: 78 bytes before the config boxes
                for btyp, bs, be in _boxes(data, es + 78, ee):
                    if btyp == b"hvcC":
                        hvcc = data[bs:be]
        if hvcc is None:
            continue
        length_size, ps_nals = parse_hvcc(hvcc)
        sizes = _parse_stsz(data, stbl)
        offsets = _sample_offsets(data, stbl, sizes)
        out = bytearray()
        for ps in ps_nals:
            out += b"\x00\x00\x00\x01" + ps
        for off, size in zip(offsets, sizes):
            pos, end = off, off + size
            while pos + length_size <= end:
                ln = int.from_bytes(data[pos:pos + length_size], "big")
                pos += length_size
                out += b"\x00\x00\x00\x01" + data[pos:pos + ln]
                pos += ln
        return bytes(out)
    raise ValueError("no HEVC track found")


def _parse_stsz(data, stbl):
    b = _find(data, b"stsz", *stbl)
    s, _ = b
    sample_size = int.from_bytes(data[s + 4:s + 8], "big")
    count = int.from_bytes(data[s + 8:s + 12], "big")
    if sample_size:
        return [sample_size] * count
    return [int.from_bytes(data[s + 12 + 4 * i:s + 16 + 4 * i], "big")
            for i in range(count)]


def _sample_offsets(data, stbl, sizes):
    co = _find(data, b"stco", *stbl)
    entry = 4
    if co is None:
        co = _find(data, b"co64", *stbl)
        entry = 8
    s, _ = co
    n_chunks = int.from_bytes(data[s + 4:s + 8], "big")
    chunk_off = [int.from_bytes(data[s + 8 + entry * i:s + 8 + entry * (i + 1)],
                                "big") for i in range(n_chunks)]
    b = _find(data, b"stsc", *stbl)
    s, _ = b
    n = int.from_bytes(data[s + 4:s + 8], "big")
    stsc = [(int.from_bytes(data[s + 8 + 12 * i:s + 12 + 12 * i], "big"),
             int.from_bytes(data[s + 12 + 12 * i:s + 16 + 12 * i], "big"))
            for i in range(n)]                     # (first_chunk, per_chunk)
    offsets = []
    si = 0
    for ci in range(n_chunks):
        per = 0
        for first, cnt in stsc:
            if ci + 1 >= first:
                per = cnt
        pos = chunk_off[ci]
        for _ in range(per):
            if si >= len(sizes):
                break
            offsets.append(pos)
            pos += sizes[si]
            si += 1
    return offsets


# ---------------------------------------------------------------------------
# minimal muxer (round-trip tests; ffmpeg-compatible layout)
# ---------------------------------------------------------------------------

def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, payload: bytes, version=0, flags=0) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


def build_hvcc(vps, sps_bytes, pps, sps_obj) -> bytes:
    ptl = sps_obj.ptl if hasattr(sps_obj, "ptl") else None
    profile = getattr(ptl, "profile_idc", 1) if ptl else 1
    level = getattr(ptl, "level_idc", 120) if ptl else 120
    cfg = bytearray()
    cfg.append(1)                                  # configurationVersion
    cfg.append(profile & 0x1F)                     # space/tier/profile
    cfg += b"\x60\x00\x00\x00"                     # profile compat flags
    cfg += b"\x90\x00\x00\x00\x00\x00"             # constraint flags
    cfg.append(level)
    cfg += struct.pack(">H", 0xF000)               # min_spatial_segmentation
    cfg.append(0xFC)                               # parallelismType
    cfg.append(0xFC | (sps_obj.chroma_format_idc & 3))
    cfg.append(0xF8 | ((sps_obj.bit_depth - 8) & 7))
    cfg.append(0xF8 | ((sps_obj.bit_depth - 8) & 7))
    cfg += struct.pack(">H", 0)                    # avgFrameRate
    cfg.append(0x03)                               # lengthSizeMinusOne=3
    arrays = [(32, vps), (33, sps_bytes), (34, pps)]
    cfg.append(len(arrays))
    for t, nal_bytes in arrays:
        cfg.append(t)
        cfg += struct.pack(">H", 1)
        cfg += struct.pack(">H", len(nal_bytes)) + nal_bytes
    return bytes(cfg)


def mux_mp4(annexb: bytes, width, height, sps_obj=None) -> bytes:
    """Minimal single-track HEVC mp4: [ftyp][mdat][moov]."""
    ps = {32: None, 33: None, 34: None}
    aus = []                    # list of lists of raw NAL bytes
    from ..bitstream.nal import write_nal
    for nal in split_annexb(annexb):
        # rebuild the raw NAL (header + escaped payload, no start code)
        raw = write_nal(nal.type, nal.rbsp, layer_id=nal.layer_id,
                        temporal_id=nal.temporal_id)[4:]
        if nal.type in (32, 33, 34):
            ps[nal.type] = raw
        elif nalmod.is_vcl(nal.type):
            if nal.rbsp[0] >> 7:                   # first slice: new AU
                aus.append([])
            aus[-1].append(raw)
        else:
            if aus:
                aus[-1].append(raw)
    if sps_obj is None:
        from ..ps.params import parse_sps
        from ..bitstream.nal import split_annexb as _sa
        for n in _sa(annexb):
            if n.type == 33:
                sps_obj = parse_sps(n.rbsp)
                break
    samples = []
    for au in aus:
        s = bytearray()
        for raw in au:
            s += struct.pack(">I", len(raw)) + raw
        samples.append(bytes(s))

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    mdat_start = len(ftyp) + 8
    mdat = _box(b"mdat", mdat_payload)

    offsets = []
    pos = mdat_start
    for s in samples:
        offsets.append(pos)
        pos += len(s)

    n = len(samples)
    hvcc = build_hvcc(ps[32], ps[33], ps[34], sps_obj)
    sample_entry = (b"\x00" * 6 + struct.pack(">H", 1) +      # data_ref_idx
                    b"\x00" * 16 +
                    struct.pack(">HH", width, height) +
                    struct.pack(">II", 0x00480000, 0x00480000) +
                    struct.pack(">I", 0) + struct.pack(">H", 1) +
                    b"\x00" * 32 +
                    struct.pack(">Hh", 0x18, -1) +
                    _box(b"hvcC", hvcc))
    stsd = _full(b"stsd", struct.pack(">I", 1) + _box(b"hvc1", sample_entry))
    stts = _full(b"stts", struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(b"stsz", struct.pack(">II", 0, n) +
                 b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", struct.pack(">I", n) +
                 b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", b"", flags=1)
    dinf = _box(b"dinf", _full(b"dref", struct.pack(">I", 1) + url))
    vmhd = _full(b"vmhd", b"\x00" * 8, flags=1)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 +
                 b"VideoHandler\x00")
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 25, n, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", struct.pack(">IIII", 0, 0, 1, 0) +
                 struct.pack(">I", n) + b"\x00" * 8 +
                 struct.pack(">HHHH", 0, 0, 0, 0) +
                 struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000) +
                 struct.pack(">II", width << 16, height << 16), flags=3)
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, 25, n) +
                 struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10 +
                 struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000) + b"\x00" * 24 +
                 struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
