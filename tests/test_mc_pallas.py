"""Pallas MC kernel vs the scalar model (interpret mode on CPU-only runs,
compiled on TPU), plus the cell-paint scatter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openhevc_tpu.model import mc as mc_model
from openhevc_tpu.tpu.mc_pallas import (mc_batch_pallas, pad_refs,
                                        clamp_starts, paint_cells,
                                        plane_to_cells, cells_to_plane)

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


@pytest.mark.parametrize("cs", [4, 2])
def test_paint_cells(cs):
    rng = np.random.default_rng(7)
    H, W = 32, 64
    canvas = rng.integers(0, 256, (H, W)).astype(np.int32)
    cv = plane_to_cells(jnp.asarray(canvas), cs, cs)
    S = cv.shape[0]
    # paint a few disjoint cells + one invalid (reserved slot)
    m = 9
    dst = np.asarray([1, 5, 9, 20, 33, 47, 2, 3, S - 1], np.int32)
    cells = rng.integers(0, 256, (m, cs, cs)).astype(np.int32)
    cv2 = paint_cells(cv, jnp.asarray(cells), jnp.asarray(dst), cs, cs,
                      interpret=_INTERPRET)
    out = np.asarray(cells_to_plane(cv2, H, W, cs, cs))
    want = canvas.copy()
    Wc = W // cs
    for i in range(m - 1):          # last one targets the reserved slot
        y, x = (dst[i] // Wc) * cs, (dst[i] % Wc) * cs
        want[y:y + cs, x:x + cs] = cells[i]
    np.testing.assert_array_equal(out, want)


def test_scatter_tiles_rmw():
    """Tile scatter (RMW band stores) leaves untouched pixels intact and
    places every valid tile exactly, at awkward plane sizes."""
    import jax.numpy as jnp
    from openhevc_tpu.tpu.mc_pallas import scatter_tiles, scatter_pad_shape
    rng = np.random.default_rng(0)
    H, W = 36, 150
    Hp, Wp = scatter_pad_shape(H, W)
    plane = rng.integers(0, 1023, (Hp, Wp)).astype(np.int16)
    ref = plane.copy()
    for (h, w) in ((16, 16), (4, 16), (2, 8), (8, 2)):
        N = 7
        xs = (rng.integers(0, (W - w) // 2, N) * 2).astype(np.int32)
        ys = (rng.integers(0, (H - h) // 2, N) * 2).astype(np.int32)
        valid = rng.integers(0, 2, N).astype(np.int32)
        valid[0] = 1
        tiles = rng.integers(0, 1023, (N, h, w)).astype(np.int16)
        for i in range(N):
            if valid[i]:
                ref[ys[i]:ys[i] + h, xs[i]:xs[i] + w] = tiles[i]
        plane = np.asarray(scatter_tiles(
            jnp.asarray(plane), jnp.asarray(tiles), jnp.asarray(xs),
            jnp.asarray(ys), jnp.asarray(valid), h, w, interpret=True))
    assert np.array_equal(plane, ref)
