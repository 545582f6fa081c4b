#!/usr/bin/env python3
"""On-hardware kernel test rig (VERDICT r2 weak #5).

Runs each Pallas kernel that participates in the fused frame_step at
FULL-FRAME geometry (1920x1080 / 3840x2160) with small batch counts on the
real TPU, asserting bit-exactness against the NumPy/XLA scalar semantics.
Kernel-level compiles take seconds (unlike the fused frame_step), so this
rig localizes geometry bugs (lane offsets > 128, sublane offsets, SMEM
prefetch capacity at large N) without burning 20-40 min fused compiles.

Usage: python tools/hw_rig.py [--big] [--only NAME]
  --big also runs the large-N SMEM-capacity probes (N~8k MC, M~130k cells).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def check(name, got, want):
    got = np.asarray(got)
    want = np.asarray(want)
    d = np.abs(got.astype(np.int64) - want.astype(np.int64))
    if d.max() != 0:
        bad = np.argwhere(d > 0)
        log(f"FAIL {name}: {len(bad)} mismatches, max {d.max()}, "
            f"first at {bad[0]} got={got[tuple(bad[0])]} "
            f"want={want[tuple(bad[0])]}")
        return False
    log(f"ok   {name}")
    return True


# ---------------------------------------------------------------------------
# band_paint at full widths (disjoint tiles on an (n, n) grid)
# ---------------------------------------------------------------------------

def rig_band_paint(W, H, sizes=(4, 8, 16, 32), ns=(8, 64), dtype=np.int16):
    from openhevc_tpu.tpu.mc_pallas import band_paint, band_pad_shape
    rng = np.random.default_rng(0)
    ok = True
    Hp, Wp = band_pad_shape(H, W)
    for n in sizes:
        for N in ns:
            plane = rng.integers(-100, 100, (Hp, Wp)).astype(dtype)
            tiles = rng.integers(-3000, 3000, (N, n, n)).astype(dtype)
            # disjoint origins on the (n, n) grid spanning the whole plane
            cols, rows = W // n, H // n
            picks = rng.choice(rows * cols, size=N, replace=False)
            ys = (picks // cols * n).astype(np.int32)
            xs = (picks % cols * n).astype(np.int32)
            xs[0], ys[0] = W - n, H - n          # corner case
            xs[1], ys[1] = 0, 0
            valid = (rng.random(N) > 0.2).astype(np.int32)
            valid[:2] = 1
            for i in range(2, N):                # keep forced corners disjoint
                for j in (0, 1):
                    if (xs[i] < xs[j] + n and xs[j] < xs[i] + n and
                            ys[i] < ys[j] + n and ys[j] < ys[i] + n):
                        valid[i] = 0
            got = band_paint(jnp.asarray(plane), jnp.asarray(tiles),
                             jnp.asarray(xs), jnp.asarray(ys),
                             jnp.asarray(valid), n, n)
            want = plane.copy()
            for i in range(N):
                if valid[i]:
                    want[ys[i]:ys[i] + n, xs[i]:xs[i] + n] = tiles[i]
            ok &= check(f"band_paint {W}x{H} n={n} N={N}", got, want)
    return ok


# ---------------------------------------------------------------------------
# mc_batch_pallas vs mc_batch (XLA per-pixel clamp gather)
# ---------------------------------------------------------------------------

def rig_mc(W, H, is_luma, w, h, N, bit_depth=8, R=2, extreme_mv=False,
           hs=1, vs=1):
    from openhevc_tpu.tpu.mc_pallas import (mc_batch_pallas, pad_refs,
                                            clamp_starts)
    from openhevc_tpu.tpu.mc import mc_batch
    rng = np.random.default_rng(2)
    mx = (1 << bit_depth) - 1
    refs = rng.integers(0, mx + 1, (R, H, W)).astype(np.int32)
    sel = rng.integers(0, R, N).astype(np.int32)
    xs = rng.integers(0, max(1, W - w + 1), N).astype(np.int32)
    ys = rng.integers(0, max(1, H - h + 1), N).astype(np.int32)
    span = 3000 if extreme_mv else 64
    mvx = rng.integers(-span, span, N).astype(np.int32)
    mvy = rng.integers(-span, span, N).astype(np.int32)
    # corner cases: block at the picture corners with outward MVs
    xs[0], ys[0], mvx[0], mvy[0] = 0, 0, -40, -40
    xs[1], ys[1] = W - w, H - h
    mvx[1], mvy[1] = 90, 90

    B = 32
    refs_p = pad_refs(jnp.asarray(refs), B)
    sy, sx, ro, co, fx, fy = clamp_starts(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(mvx), jnp.asarray(mvy),
        w, h, W, H, is_luma, B, hs, vs)
    t0 = time.time()
    got = mc_batch_pallas(refs_p, jnp.asarray(sel), sy, sx, ro, co, fx, fy,
                          w, h, is_luma, bit_depth)
    got.block_until_ready()
    dt = time.time() - t0
    want = mc_batch(jnp.asarray(refs), jnp.asarray(sel), jnp.asarray(xs),
                    jnp.asarray(ys), jnp.asarray(mvx), jnp.asarray(mvy),
                    w, h, is_luma, bit_depth, hs=hs, vs=vs)
    tag = "luma" if is_luma else "chroma"
    return check(f"mc {tag} {W}x{H} {w}x{h} N={N} ext={extreme_mv} "
                 f"({dt:.1f}s)", got, want)


# ---------------------------------------------------------------------------
# intra_seq window init: untouched pixels must pass through bit-exactly
# (the round-2 bug: the output VMEM window was never initialized from the
# input on hardware), and DC blocks with no neighbours land exactly.
# ---------------------------------------------------------------------------

def rig_intra(W, H, bd=8):
    from openhevc_tpu.tpu.intra_pallas import _intra_seq_raw, build_meta
    rng = np.random.default_rng(4)
    plane = rng.integers(0, (1 << bd) - 1, (H, W)).astype(np.int32)
    resid = rng.integers(-128, 128, (H, W)).astype(np.int32)

    class _Op:
        pass

    ops = []
    for (x, y, n) in ((0, 0, 8), (W - 16, H - 16, 16), (512, 512, 32),
                      (128, 64, 4), (W - 4, 0, 4)):
        op = _Op()
        op.c_idx, op.x, op.y, op.size, op.mode = 0, x, y, n, 1   # DC
        op.cand_bottom_left = op.cand_left = op.cand_up_left = False
        op.cand_up = op.cand_up_right = False
        ops.append(op)
    meta = build_meta(ops, 0, False)
    got = np.asarray(_intra_seq_raw(jnp.asarray(plane), jnp.asarray(resid),
                                    jnp.asarray(meta), H, H, W, 0, bd,
                                    False, False, False))
    want = plane.copy()
    mid = 1 << (bd - 1)
    for op in ops:
        x, y, n = op.x, op.y, op.size
        want[y:y + n, x:x + n] = np.clip(mid + resid[y:y + n, x:x + n],
                                         0, (1 << bd) - 1)
    return check(f"intra_seq {W}x{H}", got, want)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--h", type=int, default=1080)
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")
    W, H = args.w, args.h
    ok = True

    def want(name):
        return not args.only or args.only in name

    if want("paint"):
        ok &= rig_band_paint(W, H)
        ok &= rig_band_paint(W // 2, H // 2, sizes=(2, 8), dtype=np.int32)
    if want("intra"):
        ok &= rig_intra(W, H)
    if want("mc"):
        for (w, h) in ((64, 64), (32, 32), (16, 16), (16, 4), (4, 16),
                       (4, 4)):
            ok &= rig_mc(W, H, True, w, h, 64)
        for (w, h) in ((32, 32), (16, 16), (8, 8), (8, 2), (2, 8), (2, 2)):
            ok &= rig_mc(W // 2, H // 2, False, w, h, 64)
        ok &= rig_mc(W, H, True, 16, 16, 64, extreme_mv=True)
        ok &= rig_mc(W // 2, H // 2, False, 8, 8, 64, extreme_mv=True)
        ok &= rig_mc(W, H, True, 16, 16, 64, bit_depth=10)
    if args.big:
        if want("mc"):
            ok &= rig_mc(W, H, True, 16, 16, 8192)     # SMEM capacity probe
        if want("paint"):
            ok &= rig_band_paint(W, H, sizes=(16,), ns=(8000,))
    log("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
