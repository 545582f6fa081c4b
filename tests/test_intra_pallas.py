"""Sequential Pallas intra kernel (intra_pallas.intra_seq) vs the batched
wavefront path — interpret mode on the CPU mesh (the real-TPU compile is
exercised by bench/driver runs).

Interpret mode is slow, so CHUNK is shrunk and the cases kept small."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openhevc_tpu.tpu.intra import intra_batch
from openhevc_tpu.tpu import intra_pallas as ip


class _Op:
    pass


def _mk(x, y, n, mode, flg, c_idx=0):
    op = _Op()
    op.c_idx = c_idx
    op.x, op.y, op.size, op.mode = x, y, n, mode
    (op.cand_bottom_left, op.cand_left, op.cand_up_left, op.cand_up,
     op.cand_up_right) = flg
    return op


def _seq_reference(plane, resid, ops, bd, strong=False, c444=False):
    """Decode-order chain of intra_batch calls (the proven batched path)."""
    ref = jnp.asarray(plane)
    maxv = (1 << bd) - 1
    for op in ops:
        n = op.size
        pred = intra_batch(
            ref, jnp.array([op.x]), jnp.array([op.y]), jnp.array([op.mode]),
            jnp.array([[op.cand_bottom_left, op.cand_left, op.cand_up_left,
                        op.cand_up, op.cand_up_right]], jnp.int32),
            n, min(op.c_idx, 1), bd, strong, chroma_444=c444)
        blk = jnp.clip(pred[0] + resid[op.y:op.y + n, op.x:op.x + n],
                       0, maxv)
        ref = ref.at[op.y:op.y + n, op.x:op.x + n].set(blk)
    return np.asarray(ref)


@pytest.fixture(autouse=True)
def _small_chunk(monkeypatch):
    monkeypatch.setattr(ip, "CHUNK", 16)


def _run(plane, resid, ops, H, W, bd=8, strong=False, c444=False, c_idx=0):
    meta = ip.build_meta(ops, c_idx, c444)
    return np.asarray(ip.intra_seq(
        jnp.asarray(plane), jnp.asarray(resid), jnp.asarray(meta),
        H, W, min(c_idx, 1), bd, strong, c444, interpret=True))


def test_mixed_sizes_modes_chain():
    rng = np.random.default_rng(1)
    H, W = 64, 96
    plane = rng.integers(0, 256, (H, W)).astype(np.int32)
    resid = rng.integers(-30, 30, (H, W)).astype(np.int32)
    cases = [(0, 0, 8, 0, (0, 0, 0, 0, 0)), (8, 0, 8, 26, (0, 1, 0, 0, 0)),
             (16, 16, 16, 11, (1, 1, 1, 1, 0)),
             (16, 32, 4, 30, (1, 1, 1, 1, 1)),
             (88, 56, 8, 1, (0, 1, 1, 1, 1)),
             (32, 0, 32, 14, (0, 1, 0, 0, 0)),
             (0, 32, 32, 0, (1, 0, 1, 1, 1)),     # !cl && cbl fill path
             (64, 32, 32, 2, (0, 1, 1, 1, 0)),    # smoothing + neg angle
             (20, 32, 4, 8, (0, 1, 1, 1, 0)),
             (64, 0, 16, 33, (0, 1, 0, 0, 0)),
             (80, 16, 16, 10, (0, 1, 1, 1, 0)),   # horizontal edge filter
             (48, 16, 8, 18, (1, 1, 1, 1, 1))]
    ops = [_mk(*c) for c in cases]
    ref = _seq_reference(plane, resid, ops, 8)
    out = _run(plane, resid, ops, H, W)
    assert np.array_equal(out, ref)


def test_dense_tiling_with_edges():
    """Full 8x8 tiling: exercises apron replication at right/bottom edges
    and chained decode-order dependencies."""
    rng = np.random.default_rng(2)
    H, W = 32, 48
    plane = rng.integers(0, 256, (H, W)).astype(np.int32)
    resid = rng.integers(-20, 20, (H, W)).astype(np.int32)
    ops = []
    modes = rng.integers(0, 35, (H // 8, W // 8))
    for by in range(H // 8):
        for bx in range(W // 8):
            ops.append(_mk(bx * 8, by * 8, 8, int(modes[by, bx]),
                           (int(by < H // 8 - 1 and bx > 0), int(bx > 0),
                            int(bx > 0 and by > 0), int(by > 0),
                            int(by > 0 and bx < W // 8 - 1))))
    ref = _seq_reference(plane, resid, ops, 8)
    out = _run(plane, resid, ops, H, W)
    assert np.array_equal(out, ref)


def test_strong_smoothing_10bit():
    rng = np.random.default_rng(3)
    H, W = 64, 128
    plane = rng.integers(0, 1024, (H, W)).astype(np.int32)
    resid = rng.integers(-60, 60, (H, W)).astype(np.int32)
    # low-gradient top edge triggers the bilinear branch
    plane[31, :] = np.linspace(100, 200, W).astype(np.int32)
    ops = [_mk(32, 32, 32, 30, (0, 1, 1, 1, 0)),
           _mk(64, 32, 32, 0, (0, 1, 1, 1, 0))]
    ref = _seq_reference(plane, resid, ops, 10, strong=True)
    out = _run(plane, resid, ops, H, W, bd=10, strong=True)
    assert np.array_equal(out, ref)


@pytest.mark.slow
def test_banded_e2e_interpret(monkeypatch):
    """Banded intra reconstruction (the 4K path) end-to-end in interpret
    mode: a tiny VMEM budget forces multiple CTB-row bands."""
    import os
    from openhevc_tpu.encoder import Encoder, EncoderConfig
    from openhevc_tpu.decoder.frontend import Decoder
    from openhevc_tpu.tpu import TpuBackend
    from openhevc_tpu.tpu import backend as be

    # every luma plane overflows the fake budget -> >=2 bands
    real_band_plan = ip.band_plan
    monkeypatch.setattr(
        ip, "band_plan",
        lambda H, W, ctb, budget=0: real_band_plan(H, W, ctb, budget=90_000))
    monkeypatch.setattr(be.intra_pallas, "band_plan", ip.band_plan)
    monkeypatch.setenv("OPENHEVC_IPAL", "interp")

    cfg = EncoderConfig(width=64, height=96, qp=30, rng_seed=5, log2_ctb=5)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(3)
    base = [rng.integers(0, 256, (96, 64)).astype(np.int32),
            rng.integers(0, 256, (48, 32)).astype(np.int32),
            rng.integers(0, 256, (48, 32)).astype(np.int32)]
    recons = []
    for i, t in enumerate("IP"):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])

    dec = Decoder(backend=TpuBackend())
    frames = dec.decode_stream(stream)
    # the backend must actually have used multiple bands for luma
    bands = ip.band_plan(96, 64, 32)
    assert len(bands) >= 2
    for fi, (f, r) in enumerate(zip(frames, recons)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), r[c],
                                          err_msg=f"banded f{fi} p{c}")
