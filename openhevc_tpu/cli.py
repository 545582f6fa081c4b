"""hevc-equivalent CLI (reference main_hm/main.c + getopt.c flag surface).

Usage: python -m openhevc_tpu.cli -i in.265 [-o out.yuv] [-n] [-c] [-p N]
       [-f type] [-t tid] [-s nframes] [-b backend]
"""

import argparse
import sys
import time

import numpy as np

from .api import (libOpenHevcInit, libOpenHevcStartDecoder, libOpenHevcDecode,
                  libOpenHevcGetOutput, libOpenHevcSetCheckMD5,
                  libOpenHevcSetTemporalLayer_id, libOpenHevcClose,
                  libOpenHevcVersion)
from .bitstream.nal import split_annexb, write_nal
from .bitstream import nal as nalmod


def _split_access_units(data: bytes):
    """Group NAL units into access units (first-slice flag starts a new AU)."""
    au = []
    for nal in split_annexb(data):
        if nalmod.is_vcl(nal.type):
            first_slice = bool(nal.rbsp[0] & 0x80)
            if first_slice and any(nalmod.is_vcl(n[0]) for n in au):
                yield au
                au = []
        au.append((nal.type, nal.rbsp, nal.layer_id, nal.temporal_id))
    if au:
        yield au


def main(argv=None):
    ap = argparse.ArgumentParser(prog="openhevc_tpu",
                                 description=libOpenHevcVersion())
    ap.add_argument("-i", dest="input", required=True, help="input .265/.hevc")
    ap.add_argument("-o", dest="output", help="output YUV file")
    ap.add_argument("-n", dest="no_display", action="store_true",
                    help="no display (always true; kept for parity)")
    ap.add_argument("-c", dest="no_md5", action="store_true",
                    help="disable MD5 check")
    ap.add_argument("-p", dest="threads", type=int, default=1,
                    help="number of threads (front-end workers)")
    ap.add_argument("-f", dest="thread_type", type=int, default=1,
                    help="thread type 1=frame 2=slice 4=frameslice")
    ap.add_argument("-t", dest="temporal_layer", type=int, default=7,
                    help="temporal layer id")
    ap.add_argument("-s", dest="stop_frame", type=int, default=0,
                    help="stop after N frames")
    ap.add_argument("-b", dest="backend", default="auto",
                    choices=("auto", "tpu", "np"),
                    help="reconstruction backend")
    args = ap.parse_args(argv)

    data = open(args.input, "rb").read()
    from .formats import probe_mp4, demux_mp4, probe_ts, demux_ts
    if probe_mp4(data):
        data = demux_mp4(data)      # mp4/mov -> annex B
    elif probe_ts(data):
        data = demux_ts(data)       # mpeg-ts -> annex B
    h = libOpenHevcInit(args.threads, args.thread_type)
    h._backend_kind = args.backend if args.backend != "np" else "none"
    libOpenHevcSetCheckMD5(h, 0 if args.no_md5 else 1)
    libOpenHevcSetTemporalLayer_id(h, args.temporal_layer)
    libOpenHevcStartDecoder(h)

    fout = open(args.output, "wb") if args.output else None
    nframes = 0
    t0 = time.time()

    def emit():
        nonlocal nframes
        out = libOpenHevcGetOutput(h)
        if out is None:
            return
        if fout:
            fout.write(out.pvY.tobytes())
            fout.write(out.pvU.tobytes())
            fout.write(out.pvV.tobytes())
        nframes += 1

    for au in _split_access_units(data):
        buf = b"".join(write_nal(t, rbsp, lid, tid) for t, rbsp, lid, tid in au)
        if libOpenHevcDecode(h, buf, len(buf)):
            emit()
        if args.stop_frame and nframes >= args.stop_frame:
            break
    while libOpenHevcDecode(h, b"", 0):
        emit()

    dt = time.time() - t0
    info = h.get_picture_info()
    print(f"frame= {nframes} fps= {nframes / dt:.0f} time= {dt:.2f} "
          f"video_size= {info.nWidth}x{info.nHeight}")
    if not args.no_md5:
        for poc, plane, digest in h.md5_log[:3 * min(nframes, 4)]:
            print(f"MD5 poc {poc} plane {plane}: {digest}", file=sys.stderr)
    if fout:
        fout.close()
    libOpenHevcClose(h)
    return 0


if __name__ == "__main__":
    sys.exit(main())
