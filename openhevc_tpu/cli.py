"""hevc-equivalent CLI (reference main_hm/main.c + getopt.c flag surface).

Usage: python -m openhevc_tpu.cli -i in.265 [-o out.yuv] [-n] [-c] [-p N]
       [-f type] [-t tid] [-s nframes] [-b backend]

The decode path is the product pipeline (runtime/pipeline.py): the C++
CABAC front-end parses ahead on its own thread while the main thread runs
one fused TPU dispatch per frame — the TPU-native equivalent of the
reference's frame threads (-f 0/4; pthread_frame.c).
"""

import argparse
import sys
import time

import numpy as np

from .api import libOpenHevcVersion


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
    ap.add_argument("-l", dest="layer", type=int, default=0,
                    help="SHVC output layer (0=base, 1=enhancement)")
    ap.add_argument("-v", dest="verbose", action="store_true",
                    help="debug logs + decode stats on exit")
    ap.add_argument("-b", dest="backend", default="auto",
                    choices=("auto", "tpu", "np"),
                    help="reconstruction backend")
    ap.add_argument("-r", dest="framerate", type=float, default=0,
                    help="pace output to N fps (the reference's display "
                         "framerate knob, main_hm getopt.c:180)")
    args = ap.parse_args(argv)
    if args.verbose:
        from .log import set_debug_mode
        set_debug_mode(1)

    data = open(args.input, "rb").read()
    from .formats import probe_mp4, demux_mp4, probe_ts, demux_ts
    if probe_mp4(data):
        data = demux_mp4(data)      # mp4/mov -> annex B
    elif probe_ts(data):
        data = demux_ts(data)       # mpeg-ts -> annex B
    from .formats.mkv import probe_mkv, demux_mkv
    if probe_mkv(data):
        data = demux_mkv(data)      # matroska -> annex B
    from .formats.ogg import probe_ogg, demux_ogg
    if probe_ogg(data):
        data = demux_ogg(data)      # ogg -> annex B

    backend = None
    if args.backend in ("auto", "tpu"):
        try:
            from .tpu import TpuBackend
            backend = TpuBackend()
        except Exception:
            if args.backend == "tpu":
                raise
    use_native = True
    try:
        from .native import get_lib
        get_lib()
    except Exception:
        use_native = False

    if args.layer > 0:
        # SHVC layered decode: synchronous BL->EL chain (decoder/shvc.py)
        from .decoder.shvc import ShvcDecoder
        dec = ShvcDecoder(backend=backend, check_md5=not args.no_md5,
                          use_native=use_native, nb_layers=args.layer + 1)
        outs = dec.decode_stream(data)
        sel = outs[args.layer]
        if args.stop_frame:
            sel = sel[:args.stop_frame]
        dec.frames = lambda *a, **k: iter(sel)
    else:
        from .runtime import PipelinedDecoder
        dec = PipelinedDecoder(backend=backend, check_md5=not args.no_md5,
                               use_native=use_native, resilient=True,
                               parse_threads=max(1, args.threads))

    fout = open(args.output, "wb") if args.output else None
    nframes = 0
    last = None
    t0 = time.time()
    for frame in dec.frames(data, max_tid=args.temporal_layer,
                            max_frames=args.stop_frame):
        if args.framerate > 0:
            # real-time pacing (SDL_framerate.c analog, sans display)
            due = t0 + nframes / args.framerate
            delay = due - time.time()
            if delay > 0:
                time.sleep(delay)
        nframes += 1
        last = frame
        if fout:
            l, r, t, b = frame.conf_win
            sub_w = 2 if frame.chroma_format_idc in (1, 2) else 1
            sub_h = 2 if frame.chroma_format_idc == 1 else 1
            dt = np.uint16 if frame.bit_depth > 8 else np.uint8
            y, u, v = frame.host_planes()
            H, W = y.shape
            y = y[t * sub_h:H - b * sub_h or None, l * sub_w:W - r * sub_w or None]
            u = u[t:(u.shape[0] - b) or None, l:(u.shape[1] - r) or None]
            v = v[t:(v.shape[0] - b) or None, l:(v.shape[1] - r) or None]
            fout.write(y.astype(dt).tobytes())
            fout.write(u.astype(dt).tobytes())
            fout.write(v.astype(dt).tobytes())

    dt_s = time.time() - t0
    h, w = (last.planes[0].shape if last is not None else (0, 0))
    print(f"frame= {nframes} fps= {nframes / dt_s:.1f} time= {dt_s:.2f} "
          f"video_size= {w}x{h}")
    rc = 0
    if args.verbose and hasattr(dec, "stats"):
        import json as _json
        print("stats:", _json.dumps(dec.stats.as_dict()), file=sys.stderr)
    if not args.no_md5:
        # reference-style verdict summary (hevc.c:4158)
        print(f"MD5 check: {dec.md5_ok} correct, {dec.md5_fail} incorrect",
              file=sys.stderr)
        if dec.md5_fail:
            rc = 1
    if fout:
        fout.close()
    return rc


if __name__ == "__main__":
    sys.exit(main())
