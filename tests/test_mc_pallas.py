"""Pallas MC kernel vs the scalar model (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from openhevc_tpu.model import mc as mc_model
from openhevc_tpu.tpu.mc_pallas import (mc_batch_pallas, pad_refs,
                                        clamp_starts)


@pytest.mark.parametrize("is_luma", [True, False])
@pytest.mark.parametrize("wh", [(16, 16), (16, 4), (4, 16), (4, 4)])
def test_mc_pallas_vs_model(is_luma, wh):
    w, h = wh
    rng = np.random.default_rng(5)
    H, W = 64, 96
    R = 2
    refs = rng.integers(0, 256, (R, H, W)).astype(np.int32)
    border = (max(w, h) + 7) if is_luma else (max(w, h) + 3)
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

    sy, sx, fx, fy = clamp_starts(jnp.asarray(xs), jnp.asarray(ys),
                                  jnp.asarray(mvx), jnp.asarray(mvy),
                                  w, h, W, H, is_luma, border)
    got = np.asarray(mc_batch_pallas(refs_p, jnp.asarray(sel), sy, sx, fx, fy,
                                     w, h, is_luma, 8, interpret=True))

    before = 3 if is_luma else 1
    after = 4 if is_luma else 2
    fn = mc_model.qpel if is_luma else mc_model.epel
    for i in range(n):
        bx = int(xs[i]) + (int(mvx[i]) >> fbits)
        by = int(ys[i]) + (int(mvy[i]) >> fbits)
        win_y = np.clip(np.arange(by - before, by + h + after), 0, H - 1)
        win_x = np.clip(np.arange(bx - before, bx + w + after), 0, W - 1)
        win = refs[sel[i]][np.ix_(win_y, win_x)]
        want = fn(win, int(mvx[i]) & ((1 << fbits) - 1),
                  int(mvy[i]) & ((1 << fbits) - 1), w, h, 8)
        np.testing.assert_array_equal(got[i], want,
                                      err_msg=f"block {i} luma={is_luma}")
