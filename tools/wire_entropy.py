#!/usr/bin/env python3
"""Measure the compressibility of the DECODED output planes for a bench
config: per-plane horizontal-delta histogram -> entropy bits/sample, plus
the escape fraction at several delta widths.  Decides whether a d5-style
delta output wire (or a wider tier) can cut that config's D2H wire.

Usage: python tools/wire_entropy.py [config] [nframes]
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "1080p_main10"
    nmax = int(sys.argv[2]) if len(sys.argv) > 2 else 3
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

    be = TpuBackend()
    be._dwire = False                   # raw planes: we analyse host-side
    dec = PipelinedDecoder(backend=be, check_md5=False, use_native=True)
    n = 0
    tot_bits = 0.0
    tot_n = 0
    esc = {4: 0, 5: 0, 6: 0, 7: 0}
    for frame in dec.frames(stream):
        for p in frame.host_planes():
            p = np.asarray(p).astype(np.int64)
            bd = 8 if p.max() < 256 else (10 if p.max() < 1024 else 12)
            # first column biased by -mid, matching observe_output's model
            d = np.concatenate([p[:, :1] - (1 << (bd - 1)),
                                np.diff(p, axis=1)], axis=1).ravel()
            hist = np.bincount(d - d.min())
            pr = hist[hist > 0] / d.size
            tot_bits += float(-(pr * np.log2(pr)).sum()) * d.size
            tot_n += d.size
            for wbits in esc:
                lo, hi = -(1 << (wbits - 1)), (1 << (wbits - 1)) - 1
                esc[wbits] += int(((d < lo) | (d > hi)).sum())
        n += 1
        if n >= nmax:
            break
    print(f"{name}: {n} frames, delta entropy {tot_bits / tot_n:.2f} "
          f"bits/sample")
    for wbits, cnt in sorted(esc.items()):
        print(f"  {wbits}-bit deltas: escape fraction {cnt / tot_n:.4f}")


if __name__ == "__main__":
    main()
