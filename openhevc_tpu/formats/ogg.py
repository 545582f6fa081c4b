"""Ogg container: page walk + packet reassembly -> annex-B HEVC.

Implements the Ogg framing layer of the reference's generic Ogg demuxer
(/root/reference/libavformat/oggdec.c): page capture pattern, lacing-value
segment table, packet spanning across pages (255-lacing continuation),
continued-page flags, and the Ogg CRC. There is no standardized HEVC-in-Ogg
mapping, so the stream mapping mirrors what the reference does for raw
codecs: packet 0 is an ID header carrying the parameter-set NALs and each
following packet is one annex-B access unit.
"""

import struct

__all__ = ["probe_ogg", "demux_ogg", "mux_ogg"]

_MAGIC = b"OggS"
_ID_HDR = b"\x7fHEVC-annexb\x00"


def _crc_table():
    tab = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if (r & 0x80000000) else (r << 1)
        tab.append(r & 0xFFFFFFFF)
    return tab


_CRC = _crc_table()


def _ogg_crc(data: bytes) -> int:
    # Ogg uses the unreflected CRC-32/04C11DB7 with zero init/xorout
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC[((crc >> 24) & 0xFF) ^ b]
    return crc


def probe_ogg(data: bytes) -> bool:
    return data[:4] == _MAGIC


def _pages(data: bytes):
    """Yield (header_type, granule, serial, seq, segments) per page."""
    pos = 0
    n = len(data)
    while pos + 27 <= n:
        if data[pos:pos + 4] != _MAGIC:
            # resync: scan for the next capture pattern (oggdec.c:341)
            nxt = data.find(_MAGIC, pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        (version, htype, granule, serial, seq, crc,
         nsegs) = struct.unpack_from("<BBqIIIB", data, pos + 4)
        if version != 0:
            raise ValueError(f"ogg: unsupported stream structure {version}")
        seg_tab = data[pos + 27:pos + 27 + nsegs]
        body_len = sum(seg_tab)
        body_end = pos + 27 + nsegs + body_len
        if body_end > n:
            return                       # truncated final page
        page = bytearray(data[pos:body_end])
        page[22:26] = b"\x00" * 4
        if _ogg_crc(bytes(page)) != crc:
            pos = body_end               # bad page: skip (oggdec tolerates)
            continue
        body = data[pos + 27 + nsegs:body_end]
        segs = []
        off = 0
        for lace in seg_tab:
            segs.append((body[off:off + lace], lace))
            off += lace
        yield htype, granule, serial, seq, segs
        pos = body_end


def demux_ogg(data: bytes) -> bytes:
    """Extract the HEVC elementary stream (annex B) from an Ogg file."""
    packets = []
    partial = b""
    cont_open = False
    for htype, granule, serial, seq, segs in _pages(data):
        if not (htype & 1):              # not a continuation page
            partial = b""
            cont_open = False
        elif not cont_open:
            # continuation with no open packet (the opening page was
            # dropped, e.g. bad CRC): the orphaned continued data up to
            # its terminating lace < 255 belongs to a packet whose head
            # is lost — discard it (oggdec drops continued data with no
            # open packet rather than emitting a truncated packet)
            keep = []
            dropping = True
            for seg, lace in segs:
                if dropping:
                    if lace < 255:
                        dropping = False
                    continue
                keep.append((seg, lace))
            segs = keep
        for seg, lace in segs:
            partial += seg
            if lace < 255:               # lacing < 255 terminates a packet
                packets.append(partial)
                partial = b""
                cont_open = False
            else:
                cont_open = True
    if partial and not cont_open:
        packets.append(partial)
    out = bytearray()
    for i, pkt in enumerate(packets):
        if i == 0 and pkt.startswith(_ID_HDR):
            out += pkt[len(_ID_HDR):]    # ID header: parameter sets
        else:
            out += pkt
    return bytes(out)


def _emit_page(out, serial, seq, granule, htype, payload, packet_ends):
    """One page.  packet_ends=True terminates the packet on this page
    (a final lacing value < 255, adding a 0 lace for exact multiples)."""
    seg_tab = bytearray()
    rest = len(payload)
    while rest >= 255:
        seg_tab.append(255)
        rest -= 255
    if packet_ends or rest:
        seg_tab.append(rest)
    hdr = struct.pack("<4sBBqIIIB", _MAGIC, 0, htype, granule, serial,
                      seq, 0, len(seg_tab))
    page = bytearray(hdr + bytes(seg_tab) + payload)
    page[22:26] = struct.pack("<I", _ogg_crc(bytes(page)))
    out += page


def mux_ogg(stream: bytes, serial: int = 0x48455643) -> bytes:
    """Wrap an annex-B HEVC stream into Ogg: the parameter-set NALs ride in
    the ID-header packet (beginning-of-stream page), every following access
    unit is one packet, one page per packet (spanning when >64KB)."""
    from ..parser import FrameEndScanner, split_ps

    ps_end = split_ps(stream)
    id_pkt = _ID_HDR + stream[:ps_end]
    rest = stream[ps_end:]

    # AU boundaries via the stream parser (first-slice flags)
    cuts = []
    scan = FrameEndScanner()
    while True:
        r = scan.scan(rest[scan.consumed:])
        if r < 0:
            break
        cuts.append(r)
    edges = [0] + cuts + [len(rest)]
    packets = [id_pkt] + [rest[a:b] for a, b in zip(edges, edges[1:])
                          if b > a]

    out = bytearray()
    seq = 0
    for i, pkt in enumerate(packets):
        htype = 2 if i == 0 else 0               # BOS on the first page
        pos = 0
        while True:
            chunk = pkt[pos:pos + 255 * 255]
            pos += len(chunk)
            done = pos >= len(pkt)
            if done and i == len(packets) - 1:
                htype |= 4                       # EOS
            _emit_page(out, serial, seq, i if done else -1, htype, chunk,
                       packet_ends=done)
            seq += 1
            if done:
                break
            htype = 1                            # continuation
    return bytes(out)
