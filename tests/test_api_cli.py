"""Public API (libOpenHevc*) and CLI smoke tests."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from tests.conftest import cpu_subprocess_env
from openhevc_tpu.encoder import Encoder, EncoderConfig
from tests.util_e2e import make_source


@pytest.fixture(scope="module")
def stream_and_recon():
    rng = np.random.default_rng(8)
    enc = Encoder(EncoderConfig(width=64, height=64, qp=30, rng_seed=131))
    stream = b"".join(enc.parameter_set_nals())
    recons = []
    base = make_source(rng, 64, 64)
    for i, t in enumerate("IPP"):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    return stream, recons


def test_api_decode(stream_and_recon):
    stream, recons = stream_and_recon
    from openhevc_tpu.api import (libOpenHevcInit, libOpenHevcStartDecoder,
                                  libOpenHevcDecode, libOpenHevcGetOutput,
                                  libOpenHevcSetCheckMD5,
                                  libOpenHevcGetPictureInfo, libOpenHevcClose,
                                  libOpenHevcVersion)
    h = libOpenHevcInit(1, 1)
    h._backend_kind = "none"
    libOpenHevcSetCheckMD5(h, 1)
    libOpenHevcStartDecoder(h)
    assert "openhevc_tpu" in libOpenHevcVersion(h)
    got = []
    n = libOpenHevcDecode(h, stream, len(stream))
    while n:
        out = libOpenHevcGetOutput(h)
        got.append(out)
        n = libOpenHevcDecode(h, b"", 0)
    info = libOpenHevcGetPictureInfo(h)
    assert info.nWidth == 64 and info.nHeight == 64
    assert len(got) == 3
    for g, want in zip(got, recons):
        np.testing.assert_array_equal(g.pvY.astype(np.int32), want[0])
        np.testing.assert_array_equal(g.pvU.astype(np.int32), want[1])
        np.testing.assert_array_equal(g.pvV.astype(np.int32), want[2])
    # MD5 SEI verification ran for every frame
    assert len(h.md5_log) == 9
    libOpenHevcClose(h)


def test_cli(stream_and_recon, tmp_path):
    stream, recons = stream_and_recon
    inp = tmp_path / "in.265"
    outp = tmp_path / "out.yuv"
    inp.write_bytes(stream)
    r = subprocess.run(
        [sys.executable, "-m", "openhevc_tpu.cli", "-i", str(inp),
         "-o", str(outp), "-n", "-b", "np"],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=cpu_subprocess_env())
    assert r.returncode == 0, r.stderr
    assert "frame= 3" in r.stdout
    data = np.fromfile(outp, np.uint8)
    fsz = 64 * 64 * 3 // 2
    assert len(data) == 3 * fsz
    y0 = data[:64 * 64].reshape(64, 64)
    np.testing.assert_array_equal(y0.astype(np.int32), recons[0][0])


def test_multichip_dryrun():
    import __graft_entry__ as g
    fn, args = g.entry()
    import jax
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == (128, 128)
    g.dryrun_multichip(8)
