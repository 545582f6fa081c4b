#!/usr/bin/env python3
"""Per-stage e2e profile of one bench config through PipelinedDecoder.

Answers "where does the wall time go" on the real link: per frame it
records parse (plan emit), prepare_host, finish+dispatch, and the
consumer's host fetch wait, plus process CPU time — if cpu_s/frame ~=
wall_s/frame the pipeline is host-CPU-bound (1-core image) and byte/CPU
cuts pay; if cpu << wall it is wire-latency-bound and overlap pays.

Usage: python tools/e2e_prof.py [config] [reps]
"""
import os
import sys
import time
import threading

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "4k_main"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, "streams", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from openhevc_tpu.runtime import PipelinedDecoder
    from openhevc_tpu.tpu import TpuBackend

    import bench
    spath = bench.stream_path(name, bench.CONFIGS[name])
    assert os.path.exists(spath), f"no stream for {name} ({spath})"
    stream = open(spath, "rb").read()
    print(f"stream {os.path.basename(spath)} {len(stream)/1e6:.2f} MB",
          file=sys.stderr)

    stages = {}
    lock = threading.Lock()

    def acc(k, dt):
        with lock:
            stages[k] = stages.get(k, 0.0) + dt

    def wrap(obj, attr, key):
        fn = getattr(obj, attr)

        def wrapped(*a, **kw):
            t0 = time.monotonic()
            r = fn(*a, **kw)
            acc(key, time.monotonic() - t0)
            return r
        setattr(obj, attr, wrapped)

    for rep in range(reps):
        be = TpuBackend()
        wrap(be, "prepare_host", "prepare_host")
        wrap(be, "finish_frame", "finish_frame")
        wrap(be, "upload_group", "upload_group")
        wrap(be, "decode_prepared", "dispatch")
        wrap(be, "decode_frame", "dispatch")
        dec = PipelinedDecoder(backend=be, check_md5=False, use_native=True)
        stages.clear()
        t0 = time.monotonic()
        c0 = time.process_time()
        n = 0
        tf = 0.0
        for frame in dec.frames(stream):
            tq0 = time.monotonic()
            frame.host_planes()
            tf += time.monotonic() - tq0
            n += 1
        wall = time.monotonic() - t0
        cpu = time.process_time() - c0
        print(f"rep {rep}: {n} frames wall {wall:.2f}s "
              f"({1e3*wall/n:.0f} ms/f, {n/wall:.2f} fps) "
              f"cpu {cpu:.2f}s ({1e3*cpu/n:.0f} ms/f, {100*cpu/wall:.0f}%)",
              file=sys.stderr)
        for k in sorted(stages):
            print(f"  {k:14s} {1e3*stages[k]/n:7.1f} ms/f", file=sys.stderr)
        print(f"  {'fetch_wait':14s} {1e3*tf/n:7.1f} ms/f", file=sys.stderr)


if __name__ == "__main__":
    main()
