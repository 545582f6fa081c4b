"""Multi-device decode across the dp axis, bit-exact vs serial decode.

Runs on the conftest's 8-device virtual CPU mesh; the same code path
drives real multi-chip TPU meshes (device round-robin over segments)."""

import numpy as np
import jax
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from openhevc_tpu.parallel import MeshDecoder, split_closed_gops
from tests.util_e2e import make_source


def _multi_gop_stream(n_gops=3, frames_per_gop=3, w=64, h=48, seed=5):
    cfg = EncoderConfig(width=w, height=h, qp=30, rng_seed=seed)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(seed)
    src = make_source(rng, w, h)
    recons = []
    for g in range(n_gops):
        for i, t in enumerate("I" + "P" * (frames_per_gop - 1)):
            s = [np.roll(p, g * 7 + i, 0) for p in src]
            nal, recon, _ = enc.encode_frame(s, t)
            stream += nal
            recons.append([np.asarray(p).copy() for p in recon])
    return stream, recons


def test_split_closed_gops():
    stream, recons = _multi_gop_stream(3, 3)
    segs = split_closed_gops(stream)
    assert len(segs) == 3
    assert segs[0][0] == 0
    assert segs[-1][0] + segs[-1][1] == len(stream)


def test_mesh_decode_bit_exact_vs_serial():
    stream, recons = _multi_gop_stream(3, 3)
    assert len(jax.devices()) >= 2, "conftest must provide the CPU mesh"
    serial = Decoder(check_md5=False).decode_stream(stream)
    mdec = MeshDecoder(check_md5=True, use_native=False,
                       backend_factory=lambda: None)
    frames = mdec.decode_stream(stream)
    assert len(frames) == len(serial) == len(recons)
    assert mdec.md5_fail == 0 and mdec.md5_ok > 0
    for i, (f, s, want) in enumerate(zip(frames, serial, recons)):
        for c in range(3):
            np.testing.assert_array_equal(f.planes[c], np.asarray(s.planes[c]),
                                          err_msg=f"frame {i} plane {c}")
            np.testing.assert_array_equal(f.planes[c], want[c])


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
def test_mesh_decode_tpu_backend_devices():
    """Fused frame_step dispatches pinned per device of the mesh."""
    from openhevc_tpu.tpu import TpuBackend
    stream, recons = _multi_gop_stream(2, 2)
    mdec = MeshDecoder(check_md5=False, use_native=False)
    frames = mdec.decode_stream(stream)
    assert len(frames) == len(recons)
    for i, (f, want) in enumerate(zip(frames, recons)):
        for c in range(3):
            np.testing.assert_array_equal(f.planes[c], want[c],
                                          err_msg=f"frame {i} plane {c}")


@pytest.mark.slow
def test_sp_sharded_product_frame_step():
    """The PRODUCT fused frame_step decodes bit-exact with sp-axis
    CTB-row-band sharding on the virtual mesh (VERDICT r2 item 5)."""
    from openhevc_tpu.parallel import make_mesh, dryrun_step
    mesh = make_mesh(len(jax.devices()))
    assert mesh.shape.get("sp", 1) >= 2, f"mesh {dict(mesh.shape)}"
    frames = dryrun_step(mesh)          # asserts MD5 + plane equality
    assert len(frames) == 3


@pytest.mark.slow
def test_open_gop_pipelined_multi_device():
    """A single open GOP (CRA/RASL, unsplittable) pipelines dependent
    frames round-robin across devices with explicit ref transfer,
    bit-exact vs serial decode (VERDICT r2 item 6; reference analog
    pthread_frame.c:325-513)."""
    from tests.test_robustness import _open_gop_stream
    from openhevc_tpu.tpu import TpuBackend
    stream, _ = _open_gop_stream()
    assert len(split_closed_gops(stream)) == 1      # truly unsplittable
    serial = Decoder(check_md5=True).decode_stream(stream)
    mdec = MeshDecoder(check_md5=True, use_native=True)
    frames = mdec.decode_stream(stream)
    assert mdec.md5_fail == 0 and mdec.md5_ok > 0
    assert len(frames) == len(serial) == 7
    for i, (f, s) in enumerate(zip(frames, serial)):
        assert f.poc == s.poc
        for c in range(3):
            np.testing.assert_array_equal(
                f.planes[c], np.asarray(s.planes[c]),
                err_msg=f"poc {f.poc} plane {c}")
