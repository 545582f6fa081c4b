#!/usr/bin/env python3
"""E2E stage profiler: where does the bytes->host-YUV wall clock go?

Runs the bench stream through PipelinedDecoder with per-stage timers
patched around the product code (no product changes):

  parse      native CTU walk + plan build   (parser thread, CPU)
  prepare    plan -> packed wire buffers    (dispatcher thread, CPU)
  dispatch   frame_step call (async enqueue)
  up_bytes   int16+int8 packed buffer sizes
  fetch      host_planes() wait             (consumer thread, wire)
  wall       total bytes->YUV

Usage: python tools/e2e_prof.py [config] [reps]
"""

import os
import sys
import time
import threading

import numpy as np

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "1080p_main"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, "streams", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    spath = os.path.join(REPO, "streams", f"bench_v4_{name}.265")
    with open(spath, "rb") as f:
        stream = f.read()

    from openhevc_tpu.runtime import PipelinedDecoder
    from openhevc_tpu.tpu.backend import TpuBackend
    from openhevc_tpu.decoder.frontend import Frontend

    stats = {}

    orig_decode_nal = Frontend.decode_nal
    orig_end_picture = Frontend.end_picture
    orig_prepare = TpuBackend.prepare_host

    def timed_decode_nal(self, nal):
        t0 = time.monotonic()
        r = orig_decode_nal(self, nal)
        stats["parse"] = stats.get("parse", 0.0) + time.monotonic() - t0
        return r

    def timed_end_picture(self):
        t0 = time.monotonic()
        r = orig_end_picture(self)
        stats["parse"] = stats.get("parse", 0.0) + time.monotonic() - t0
        return r

    def timed_prepare(self, plan):
        t0 = time.monotonic()
        r = orig_prepare(self, plan)
        dt = time.monotonic() - t0
        stats["prepare"] = stats.get("prepare", 0.0) + dt
        stats["up_bytes"] = stats.get("up_bytes", 0) + r[1].size
        return r

    Frontend.decode_nal = timed_decode_nal
    Frontend.end_picture = timed_end_picture
    TpuBackend.prepare_host = timed_prepare

    for rep in range(reps):
        stats.clear()
        backend = TpuBackend()
        dec = PipelinedDecoder(backend=backend, check_md5=False,
                               use_native=True)
        t0 = time.monotonic()
        n = 0
        fetch = 0.0
        down = 0
        frame_walls = []
        tprev = t0
        for frame in dec.frames(stream):
            tf = time.monotonic()
            hp = frame.host_planes()
            fetch += time.monotonic() - tf
            if frame.wire is None:
                down += sum(p.size for p in hp)
            elif isinstance(frame.wire, tuple):
                down += sum(int(c.size) for c in frame.wire)
            else:
                down += int(frame.wire.size)
            n += 1
            tn = time.monotonic()
            frame_walls.append(tn - tprev)
            tprev = tn
        wall = time.monotonic() - t0
        print(f"--- rep {rep}: {name} {n} frames ---")
        print(f"  wall      {wall*1e3:8.1f} ms  ({n/wall:.2f} fps, "
              f"{wall/n*1e3:.1f} ms/frame)")
        for k in ("parse", "prepare"):
            v = stats.get(k, 0.0)
            print(f"  {k:9s} {v*1e3:8.1f} ms  ({v/n*1e3:.1f} ms/frame)")
        print(f"  fetch     {fetch*1e3:8.1f} ms  ({fetch/n*1e3:.1f} "
              f"ms/frame)")
        print(f"  up_bytes  {stats.get('up_bytes',0)/n/1e6:8.2f} MB/frame")
        print(f"  down_bytes{down/n/1e6:8.2f} MB/frame")
        print("  per-frame wall (ms):",
              " ".join(f"{w*1e3:.0f}" for w in frame_walls))


if __name__ == "__main__":
    main()
