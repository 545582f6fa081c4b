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
# scatter_tiles at full widths
# ---------------------------------------------------------------------------

def rig_scatter_tiles(W, H, sizes=(4, 8, 16, 32), ns=(8, 64)):
    from openhevc_tpu.tpu.mc_pallas import scatter_tiles, scatter_pad_shape
    rng = np.random.default_rng(0)
    ok = True
    Hp, Wp = scatter_pad_shape(H, W)
    for n in sizes:
        for N in ns:
            plane = rng.integers(-100, 100, (Hp, Wp)).astype(np.int16)
            tiles = rng.integers(-3000, 3000, (N, n, n)).astype(np.int16)
            # positions multiple of 2 (tile origins are 2-aligned), spanning
            # the full plane incl. lane offsets > 128 and the right edge
            xs = (rng.integers(0, (W - n) // 2, N) * 2).astype(np.int32)
            ys = (rng.integers(0, (H - n) // 2, N) * 2).astype(np.int32)
            xs[0], ys[0] = W - n, H - n          # corner case
            xs[1], ys[1] = 0, 0
            valid = (rng.random(N) > 0.2).astype(np.int32)
            got = scatter_tiles(jnp.asarray(plane), jnp.asarray(tiles),
                                jnp.asarray(xs), jnp.asarray(ys),
                                jnp.asarray(valid), n, n)
            want = plane.copy()
            for i in range(N):
                if valid[i]:
                    want[ys[i]:ys[i] + n, xs[i]:xs[i] + n] = tiles[i]
            ok &= check(f"scatter_tiles {W}x{H} n={n} N={N}", got, want)
    return ok


# ---------------------------------------------------------------------------
# paint_cells at full frame geometry
# ---------------------------------------------------------------------------

def rig_paint_cells(W, H, cs=4, M=4096):
    from openhevc_tpu.tpu.mc_pallas import (paint_cells, plane_to_cells,
                                            cells_to_plane)
    rng = np.random.default_rng(1)
    plane = rng.integers(0, 255, (H, W)).astype(np.int32)
    S = (H // cs) * (W // cs) + 1
    cells = rng.integers(0, 255, (M, cs, cs)).astype(np.int32)
    # distinct destinations (valid cells are disjoint in the product)
    dst = rng.choice(S - 1, size=M, replace=False).astype(np.int32)
    dst[M // 3:M // 3 + M // 10] = S - 1        # a run of invalid cells
    cv = plane_to_cells(jnp.asarray(plane), cs, cs)
    cv = paint_cells(cv, jnp.asarray(cells), jnp.asarray(dst), cs, cs)
    got = cells_to_plane(cv, H, W, cs, cs)
    want = plane.copy()
    wcells = W // cs
    for i in range(M):
        if dst[i] == S - 1:
            continue
        cy, cx = divmod(int(dst[i]), wcells)
        want[cy * cs:(cy + 1) * cs, cx * cs:(cx + 1) * cs] = cells[i]
    return check(f"paint_cells {W}x{H} cs={cs} M={M}", got, want)


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

    if want("scatter"):
        ok &= rig_scatter_tiles(W, H)
    if want("paint"):
        ok &= rig_paint_cells(W, H, cs=4, M=4096)
        ok &= rig_paint_cells(W // 2, H // 2, cs=2, M=4096)
    if want("mc"):
        for (w, h) in ((16, 16), (16, 4), (4, 16), (4, 4)):
            ok &= rig_mc(W, H, True, w, h, 64)
        for (w, h) in ((8, 8), (8, 2), (2, 8), (2, 2)):
            ok &= rig_mc(W // 2, H // 2, False, w, h, 64)
        ok &= rig_mc(W, H, True, 16, 16, 64, extreme_mv=True)
        ok &= rig_mc(W // 2, H // 2, False, 8, 8, 64, extreme_mv=True)
        ok &= rig_mc(W, H, True, 16, 16, 64, bit_depth=10)
    if args.big:
        if want("mc"):
            ok &= rig_mc(W, H, True, 16, 16, 8192)     # SMEM capacity probe
        if want("paint"):
            ok &= rig_paint_cells(W, H, cs=4, M=131072)
            ok &= rig_paint_cells(W // 2, H // 2, cs=2, M=32768)
        if want("scatter"):
            ok &= rig_scatter_tiles(W, H, sizes=(16,), ns=(8192,))
    log("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
