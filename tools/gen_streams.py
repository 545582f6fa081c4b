#!/usr/bin/env python3
"""Populate the streams/ cache (streams + plans + oracle + baselines) for
all bench configs without touching the TPU — lets a later bench.py run go
straight to measurement.  Order: cheapest first so a bounded run still
covers the most configs.

Usage: python tools/gen_streams.py [config ...]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import bench


def main():
    names = sys.argv[1:] or ["bqmall_480p", "rext_422", "rext_444",
                             "1080p_main", "1080p_main10", "4k_main",
                             "shvc_4k60"]
    bench.ensure_oracle()
    for name in names:
        cfg = bench.CONFIGS[name]
        spath = bench.ensure_stream(name, cfg)
        bench.measure_baseline(name, spath,
                               layer=1 if cfg.get("shvc") else 0)
        if not cfg.get("shvc"):
            bench.ensure_plans(name, spath)
        bench.log(f"[{name}] cache ready")


if __name__ == "__main__":
    main()
