"""Pallas MC kernel vs the scalar model (interpret mode on CPU-only runs,
compiled on TPU), plus the banded tile paint."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openhevc_tpu.model import mc as mc_model
from openhevc_tpu.tpu.mc_pallas import (mc_batch_pallas, pad_refs,
                                        clamp_starts, band_paint,
                                        band_pad_shape)

_INTERPRET = jax.default_backend() == "cpu"


@pytest.mark.parametrize("is_luma", [True, False])
@pytest.mark.parametrize("wh", [(16, 16), (16, 4), (4, 16), (4, 4)])
def test_mc_pallas_vs_model(is_luma, wh):
    w, h = wh
    rng = np.random.default_rng(5)
    H, W = 64, 96
    R = 2
    refs = rng.integers(0, 256, (R, H, W)).astype(np.int32)
    border = 32
    refs_p = pad_refs(jnp.asarray(refs), border)

    n = 17
    xs = rng.integers(0, W - w + 1, n).astype(np.int32)
    ys = rng.integers(0, H - h + 1, n).astype(np.int32)
    fbits = 2 if is_luma else 3
    mvx = rng.integers(-40 << fbits, 40 << fbits, n).astype(np.int32)
    mvy = rng.integers(-40 << fbits, 40 << fbits, n).astype(np.int32)
    # a couple of extreme MVs to exercise full clamping
    mvx[0] = -4000
    mvy[1] = 4000
    sel = rng.integers(0, R, n).astype(np.int32)

    sy, sx, ro, co, fx, fy = clamp_starts(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(mvx), jnp.asarray(mvy),
        w, h, W, H, is_luma, border)
    got = np.asarray(mc_batch_pallas(refs_p, jnp.asarray(sel), sy, sx, ro, co,
                                     fx, fy, w, h, is_luma, 8,
                                     interpret=_INTERPRET))

    before = 3 if is_luma else 1
    taps = 8 if is_luma else 4
    fn = mc_model.qpel if is_luma else mc_model.epel
    for i in range(n):
        bx = int(xs[i]) + (int(mvx[i]) >> fbits)
        by = int(ys[i]) + (int(mvy[i]) >> fbits)
        win_y = np.clip(np.arange(by - before, by + h + taps - 1 - before),
                        0, H - 1)
        win_x = np.clip(np.arange(bx - before, bx + w + taps - 1 - before),
                        0, W - 1)
        win = refs[sel[i]][np.ix_(win_y, win_x)]
        want = fn(win, int(mvx[i]) & ((1 << fbits) - 1),
                  int(mvy[i]) & ((1 << fbits) - 1), w, h, 8)
        np.testing.assert_array_equal(got[i], want,
                                      err_msg=f"block {i} luma={is_luma}")


def _disjoint_positions(rng, H, W, h, w, N, align=2):
    """N disjoint (x, y) origins on an (h, w)-granular grid, align-aligned,
    spanning both band-straddle cases (y across 64, x across 256)."""
    cols = W // w
    rows = H // h
    picks = rng.choice(rows * cols, size=N, replace=False)
    ys = (picks // cols * h).astype(np.int32)
    xs = (picks % cols * w).astype(np.int32)
    return xs, ys


@pytest.mark.parametrize("dtype", [np.int16, np.int32])
def test_band_paint(dtype):
    """Banded tile paint: untouched pixels intact, every valid tile placed,
    tiles straddling band boundaries (y across 64, x across 256) exact."""
    rng = np.random.default_rng(0)
    H, W = 100, 300
    Hp, Wp = band_pad_shape(H, W)
    assert Hp % 64 == 0 and Wp % 256 == 0
    plane = rng.integers(0, 1023, (Hp, Wp)).astype(dtype)
    ref = plane.copy()
    for (h, w) in ((16, 16), (4, 16), (2, 8), (8, 2), (32, 32)):
        N = 12
        xs, ys = _disjoint_positions(rng, H, W, h, w, N)
        # force straddles: a tile crossing the row band and the lane band
        xs[0], ys[0] = 0, 64 - h // 2 if h > 1 else 63
        xs[1] = 256 - w // 2 if w > 1 else 255
        ys[1] = min(ys[1], H - h)
        valid = rng.integers(0, 2, N).astype(np.int32)
        valid[:2] = 1
        # the forced straddle positions may collide with grid picks;
        # disjointness is the kernel's contract, so drop the collisions
        for i in range(2, N):
            for j in (0, 1):
                if (xs[i] < xs[j] + w and xs[j] < xs[i] + w and
                        ys[i] < ys[j] + h and ys[j] < ys[i] + h):
                    valid[i] = 0
        tiles = rng.integers(0, 1023, (N, h, w)).astype(dtype)
        for i in range(N):
            if valid[i]:
                ref[ys[i]:ys[i] + h, xs[i]:xs[i] + w] = tiles[i]
        plane = np.asarray(band_paint(
            jnp.asarray(plane), jnp.asarray(tiles), jnp.asarray(xs),
            jnp.asarray(ys), jnp.asarray(valid), h, w, interpret=True))
    assert np.array_equal(plane, ref)


def test_band_paint_empty_bands():
    """Bands with no tiles at all must still carry the input through."""
    rng = np.random.default_rng(3)
    Hp, Wp = band_pad_shape(256, 1024)
    plane = rng.integers(0, 255, (Hp, Wp)).astype(np.int16)
    tiles = rng.integers(0, 255, (4, 8, 8)).astype(np.int16)
    xs = np.asarray([0, 512, 1000, 8], np.int32)
    ys = np.asarray([0, 128, 248, 200], np.int32)
    valid = np.asarray([1, 1, 1, 0], np.int32)
    got = np.asarray(band_paint(jnp.asarray(plane), jnp.asarray(tiles),
                                jnp.asarray(xs), jnp.asarray(ys),
                                jnp.asarray(valid), 8, 8, interpret=True))
    want = plane.copy()
    for i in range(3):
        want[ys[i]:ys[i] + 8, xs[i]:xs[i] + 8] = tiles[i]
    np.testing.assert_array_equal(got, want)


def test_band_paint_chunked(monkeypatch):
    """N above the SMEM scalar-prefetch cap splits into chained calls
    (the 4K residual batches overflow SMEM in one call)."""
    from openhevc_tpu.tpu import mc_pallas
    monkeypatch.setattr(mc_pallas, "_PAINT_CAPN", 5)
    rng = np.random.default_rng(11)
    Hp, Wp = band_pad_shape(128, 512)
    plane = rng.integers(0, 255, (Hp, Wp)).astype(np.int16)
    N, h, w = 17, 8, 8
    xs, ys = _disjoint_positions(rng, 128, 512, h, w, N)
    valid = rng.integers(0, 2, N).astype(np.int32)
    tiles = rng.integers(0, 255, (N, h, w)).astype(np.int16)
    want = plane.copy()
    for i in range(N):
        if valid[i]:
            want[ys[i]:ys[i] + h, xs[i]:xs[i] + w] = tiles[i]
    got = np.asarray(mc_pallas.band_paint.__wrapped__(
        jnp.asarray(plane), jnp.asarray(tiles), jnp.asarray(xs),
        jnp.asarray(ys), jnp.asarray(valid), h, w, interpret=True))
    np.testing.assert_array_equal(got, want)
