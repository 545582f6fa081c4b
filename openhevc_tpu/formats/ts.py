"""MPEG-TS demuxer (and test muxer) for HEVC elementary streams.

Parity target: the reference ships libavformat's mpegts demuxer
(SURVEY.md §2.4, mpegts.c).  Subset implemented: 188-byte packet sync,
PAT -> PMT -> HEVC PID resolution (stream_type 0x24), adaptation-field
skipping, PES payload reassembly, and annex-B pass-through.  The muxer
writes a single-program, single-stream TS used by the round-trip tests.
"""

import struct

TS_PACKET = 188
STREAM_TYPE_HEVC = 0x24


def probe_ts(data: bytes) -> bool:
    if len(data) < TS_PACKET * 2 or data[0] != 0x47:
        return False
    return data[TS_PACKET] == 0x47


def _payload(pkt):
    """-> (pid, payload_unit_start, payload bytes) or None."""
    if pkt[0] != 0x47:
        return None
    pusi = (pkt[1] >> 6) & 1
    pid = ((pkt[1] & 0x1F) << 8) | pkt[2]
    afc = (pkt[3] >> 4) & 3
    pos = 4
    if afc in (2, 3):
        pos += 1 + pkt[4]
    if afc in (1, 3) and pos < TS_PACKET:
        return pid, pusi, pkt[pos:]
    return pid, pusi, b""


def _psi_table(payload):
    """Strip the pointer_field and return the section bytes."""
    ptr = payload[0]
    return payload[1 + ptr:]


def demux_ts(data: bytes) -> bytes:
    """Extract the first HEVC elementary stream as annex-B bytes."""
    pmt_pid = None
    hevc_pid = None
    pes = bytearray()
    out = bytearray()

    def flush_pes():
        nonlocal pes
        if len(pes) >= 9 and pes[:3] == b"\x00\x00\x01":
            hdr_len = pes[8]
            out.extend(pes[9 + hdr_len:])
        pes = bytearray()

    for off in range(0, len(data) - TS_PACKET + 1, TS_PACKET):
        pkt = data[off:off + TS_PACKET]
        got = _payload(pkt)
        if got is None:
            continue
        pid, pusi, payload = got
        if pid == 0 and pusi and pmt_pid is None:          # PAT
            sec = _psi_table(payload)
            # section: table_id(1) len(2) tsid(2) ver(1) sec(2) -> programs
            n = ((sec[1] & 0x0F) << 8 | sec[2]) - 9        # bytes of programs
            pos = 8
            while n >= 4:
                prog = (sec[pos] << 8) | sec[pos + 1]
                pid_ = ((sec[pos + 2] & 0x1F) << 8) | sec[pos + 3]
                if prog != 0:
                    pmt_pid = pid_
                    break
                pos += 4
                n -= 4
        elif pid == pmt_pid and pusi and hevc_pid is None:  # PMT
            sec = _psi_table(payload)
            sec_len = ((sec[1] & 0x0F) << 8) | sec[2]
            pinfo_len = ((sec[10] & 0x0F) << 8) | sec[11]
            pos = 12 + pinfo_len
            end = 3 + sec_len - 4                          # minus CRC
            while pos + 5 <= end:
                stype = sec[pos]
                epid = ((sec[pos + 1] & 0x1F) << 8) | sec[pos + 2]
                eslen = ((sec[pos + 3] & 0x0F) << 8) | sec[pos + 4]
                if stype == STREAM_TYPE_HEVC:
                    hevc_pid = epid
                    break
                pos += 5 + eslen
        elif pid == hevc_pid:
            if pusi:
                flush_pes()
            pes.extend(payload)
    flush_pes()
    if hevc_pid is None:
        raise ValueError("no HEVC stream in TS")
    return bytes(out)


# ---------------------------------------------------------------------------
# minimal muxer (round-trip tests)
# ---------------------------------------------------------------------------

def _crc32_mpeg(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if (crc & 0x80000000) \
                else (crc << 1) & 0xFFFFFFFF
    return crc


def _section(table_id, body):
    sec = bytes([table_id, 0xB0 | (len(body) + 9) >> 8, (len(body) + 9) & 0xFF,
                 0, 1, 0xC1, 0, 0]) + body
    return sec + struct.pack(">I", _crc32_mpeg(sec))


def _packets(pid, payload, pusi_first=True, counter=0):
    """Split a byte stream into TS packets with stuffing."""
    out = bytearray()
    pos = 0
    first = True
    while pos < len(payload) or first:
        chunk = payload[pos:pos + 184]
        pos += len(chunk)
        pusi = 0x40 if (first and pusi_first) else 0
        hdr = bytes([0x47, pusi | (pid >> 8), pid & 0xFF,
                     0x10 | (counter & 0x0F)])
        counter += 1
        if len(chunk) < 184:
            # adaptation field stuffing to fill the packet
            stuff = 184 - len(chunk) - 1
            hdr = bytes([0x47, pusi | (pid >> 8), pid & 0xFF,
                         0x30 | ((counter - 1) & 0x0F)])
            if stuff == 0:
                af = b"\x00"
            else:
                af = bytes([stuff - 1 + 1]) + b"\x00" * min(1, stuff - 1) + \
                    b"\xff" * max(0, stuff - 2)
                af = bytes([stuff]) + (b"\x00" + b"\xff" * (stuff - 1)
                                       if stuff >= 1 else b"")
                af = af[:1 + stuff]
            out += hdr + af + chunk
        else:
            out += hdr + chunk
        first = False
    return bytes(out), counter


def mux_ts(annexb: bytes) -> bytes:
    pat = _section(0x00, bytes([0x00, 0x01, 0xE0 | 0x10, 0x00]))
    # PMT: pcr_pid + program_info_len + one HEVC stream on pid 0x100
    pmt_body = bytes([0xE1, 0x00, 0xF0, 0x00,
                      STREAM_TYPE_HEVC, 0xE1, 0x00, 0xF0, 0x00])
    pmt = _section(0x02, pmt_body)
    out = bytearray()
    pkts, _ = _packets(0x0000, bytes([0]) + pat)       # pointer_field 0
    out += pkts
    pkts, _ = _packets(0x1000, bytes([0]) + pmt)
    out += pkts
    pes_hdr = b"\x00\x00\x01\xE0\x00\x00" + bytes([0x80, 0x00, 0x00])
    pkts, _ = _packets(0x0100, pes_hdr + annexb)
    out += pkts
    return bytes(out)
