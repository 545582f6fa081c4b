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


def parse_sei(rbsp: bytes, nal_type: int):
    """-> list of (payload_type, payload) with decoded_picture_hash parsed."""
    r = BitReader(rbsp)
    out = []
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
        else:
            for _ in range(psize):
                r.u(8)
            out.append((ptype, None))
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
