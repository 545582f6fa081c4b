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


def sp_plane_sharding(mesh):
    """Frame planes partition into row bands over the mesh's sp axis."""
    return NamedSharding(mesh, P("sp", None))


def sp_backend(mesh):
    """A TpuBackend whose fused frame_step runs sp-sharded on `mesh`:
    plane tensors carry CTB-row-band sharding constraints at every stage
    boundary (tpu/frame_step.py `_sc`), so the MC/residual scatters and
    the deblock/SAO halo reads across band edges lower to XLA collectives
    (the reference's WPP progress waits, pthread_slice.c:238-263, become
    data dependencies)."""
    from ..tpu import TpuBackend
    return TpuBackend(shard=sp_plane_sharding(mesh))


def dryrun_step(mesh, w=96, h=96, nframes=3):
    """Decode a real (tiny) stream through the PRODUCT fused frame_step
    with sp-axis sharding, asserting bit-exactness against the scalar
    NumPy pipeline. Returns the decoded frames."""
    from ..decoder.frontend import Decoder

    from ..encoder import Encoder, EncoderConfig
    enc = Encoder(EncoderConfig(width=w, height=h, qp=30, sao=True,
                                rng_seed=11))
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(1)
    base = [rng.integers(0, 256, (h, w)).astype(np.int32),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)]
    recons = []
    for i, t in enumerate("I" + "P" * (nframes - 1)):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p) for p in recon])

    dec = Decoder(backend=sp_backend(mesh), check_md5=True)
    frames = dec.decode_stream(stream)
    assert dec.md5_fail == 0 and dec.md5_ok > 0, "sp-sharded decode mismatch"
    for f, want in zip(frames, recons):
        for c in range(3):
            assert np.array_equal(np.asarray(f.planes[c]), want[c]), \
                "sp-sharded plane mismatch"
    return frames
