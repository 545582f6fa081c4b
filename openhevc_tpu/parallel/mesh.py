"""Multi-chip scaling via jax.sharding over a device Mesh.

The reference scales with pthreads inside one address space (frame threads +
WPP row threads, SURVEY.md §2.3).  The TPU-native equivalents here:

  - dp axis: frame-level parallelism — independent frames (or independent
    streams) reconstruct on different chips; the DPB lives in HBM and
    reference frames move over ICI only when a consumer chip needs them.
  - sp axis: spatial parallelism — CTB-row bands of one frame are sharded
    across chips; the deblock/SAO halo dependencies become XLA-inserted
    collective-permutes of the boundary rows (the 2-CTB WPP skew analog).

GSPMD does the partitioning: we annotate shardings and let XLA place the
halo exchanges on ICI.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tpu import deblock as dbk
from ..tpu.residual import residual_batch, scatter_add_residual
from ..tpu import sao as sao_mod


def make_mesh(n_devices=None, devices=None):
    """Factor devices into a (dp, sp) mesh: frames x row-bands."""
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    sp = 1
    for cand in (4, 2):
        if n % cand == 0 and n // cand >= 1 and n >= 2 * cand:
            sp = cand
            break
    dp = n // sp
    return Mesh(np.asarray(devs).reshape(dp, sp), ("dp", "sp"))


def _frame_step(frame, levels, qp, kind, xs, ys, valid, vbs, hbs, qp_map,
                nfm, bit_depth):
    """Per-frame reconstruction step: residual + deblock + SAO band."""
    res = residual_batch(levels, qp, kind, levels.shape[-1], bit_depth)
    frame = scatter_add_residual(frame, xs, ys, res, valid, bit_depth)
    frame = dbk.deblock_luma_vertical(frame, vbs, qp_map, 0, 0, nfm, bit_depth)
    frame = dbk.deblock_luma_horizontal(frame, hbs, qp_map, 0, 0, nfm, bit_depth)
    return frame


def sharded_recon_step(mesh, bit_depth=8):
    """Build the jitted multi-chip reconstruction step.

    Input batch of frames is sharded frames-over-dp and rows-over-sp; the
    residual scatter and the horizontal-deblock halo reads cross the sp
    boundary, so XLA inserts ICI collectives.
    """
    batch = partial(jax.vmap(_frame_step,
                             in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None)),
                    )

    frame_sh = NamedSharding(mesh, P("dp", "sp", None))
    rep_sh = NamedSharding(mesh, P("dp"))

    @partial(jax.jit, static_argnames=("bd",))
    def step(frames, levels, qp, kind, xs, ys, valid, vbs, hbs, qp_map, nfm,
             bd=bit_depth):
        frames = jax.lax.with_sharding_constraint(frames, frame_sh)
        out = batch(frames, levels, qp, kind, xs, ys, valid, vbs, hbs,
                    qp_map, nfm, bd)
        return jax.lax.with_sharding_constraint(out, frame_sh)

    return step, frame_sh, rep_sh


def dryrun_step(mesh, fh=64, fw=64, nblk=8, bsz=8, bit_depth=8):
    """Build tiny example inputs + run one sharded step on the mesh."""
    dp = mesh.shape["dp"]
    b = max(dp, 2)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, fh, fw)), jnp.int32)
    levels = jnp.asarray(rng.integers(-10, 10, (b, nblk, bsz, bsz)), jnp.int32)
    qp = jnp.full((b, nblk), 30, jnp.int32)
    kind = jnp.zeros((b, nblk), jnp.int32)
    # disjoint block positions per frame
    per_row = fw // bsz
    idx = np.arange(nblk)
    xs = jnp.asarray(np.tile((idx % per_row) * bsz, (b, 1)), jnp.int32)
    ys = jnp.asarray(np.tile((idx // per_row) * bsz, (b, 1)), jnp.int32)
    valid = jnp.ones((b, nblk), bool)
    vbs = jnp.asarray(rng.integers(0, 3, (b, fh // 4, fw // 8)), jnp.int32)
    hbs = jnp.asarray(rng.integers(0, 3, (b, fh // 8, fw // 4)), jnp.int32)
    qp_map = jnp.full((b, fh // 8, fw // 8), 30, jnp.int32)
    nfm = jnp.zeros((b, fh // 4, fw // 4), jnp.int32)

    step, frame_sh, _ = sharded_recon_step(mesh, bit_depth)
    with mesh:
        frames = jax.device_put(frames, frame_sh)
        out = step(frames, levels, qp, kind, xs, ys, valid, vbs, hbs,
                   qp_map, nfm)
        out.block_until_ready()
    return out
