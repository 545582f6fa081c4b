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


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
def test_multichip_dryrun():
    import __graft_entry__ as g
    fn, args = g.entry()
    import jax
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == (64, 64)    # entry() decodes a 64x64 P-frame
    g.dryrun_multichip(8)


import pytest


@pytest.mark.slow
def test_poc_reset_output_order_and_prior_pics_discard():
    """Across an IDR POC reset the old sequence drains first (seq counters,
    hevc.c:561-566); with no_output_of_prior_pics_flag the old frames are
    dropped instead (hevc_refs.c:186-196)."""
    import numpy as np
    from openhevc_tpu.api.openhevc import OpenHevcDecoder
    from openhevc_tpu.encoder import Encoder, EncoderConfig
    from openhevc_tpu.parser import HevcParser

    def make_stream(discard):
        cfg = EncoderConfig(width=64, height=64, qp=30, rng_seed=4,
                            reorder_pics=1,
                            no_output_of_prior_pics=discard)
        enc = Encoder(cfg)
        stream = b"".join(enc.parameter_set_nals())
        rng = np.random.default_rng(1)
        base = [rng.integers(0, 256, (64, 64)).astype(np.int32),
                rng.integers(0, 256, (32, 32)).astype(np.int32),
                rng.integers(0, 256, (32, 32)).astype(np.int32)]
        for g in range(2):                      # two IDR-led GOPs
            for i, t in enumerate("IPP"):
                src = [np.roll(p, g * 3 + i, 0) for p in base]
                nal, _, _ = enc.encode_frame(src, t)
                stream += nal
        return stream

    def run(stream):
        infos = HevcParser().iter_access_units(stream)
        offs = [i.offset for i in infos] + [len(stream)]
        aus = [stream[:offs[1]]] + [stream[offs[k]:offs[k + 1]]
                                    for k in range(1, len(offs) - 1)]
        dec = OpenHevcDecoder()
        dec.start()
        pocs = []
        for au in aus:
            if dec.decode(au):
                pocs.append(dec.get_picture_info().display_picture_number)
        while dec.decode(b""):
            pocs.append(dec.get_picture_info().display_picture_number)
        dec.close()
        return pocs

    # normal: all 6 frames output, old sequence before the new one
    pocs = run(make_stream(discard=False))
    assert len(pocs) == 6
    assert pocs[:3] == sorted(pocs[:3])

    # discard: the second IDR drops undisplayed prior pictures
    pocs2 = run(make_stream(discard=True))
    assert len(pocs2) < 6



@pytest.mark.slow
def test_get_output_cpy_pitch_quirks():
    """GetOutputCpy pitch parity (openHevcWrapper.c:245-397): byte pitches,
    odd-width chroma truncation, >8-bit doubling."""
    import numpy as np
    from openhevc_tpu.api.openhevc import (libOpenHevcInit,
                                           libOpenHevcStartDecoder,
                                           libOpenHevcDecode,
                                           libOpenHevcGetOutputCpy,
                                           libOpenHevcClose)
    from openhevc_tpu.encoder import Encoder, EncoderConfig
    from tests.util_e2e import make_source
    # coded 72 cropped to 70 via the conformance window: chroma pitch
    # nUPitch = nWidth>>1 = 35 while the stored chroma plane is 36 wide —
    # the Cpy copy loop reads dst-pitch bytes per row
    rng = np.random.default_rng(3)
    enc = Encoder(EncoderConfig(width=72, height=40, qp=30, rng_seed=5))
    enc.sps.conf_win = (0, 1, 0, 0)     # crop 2 luma / 1 chroma col right
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, 72, 40)
    nal, recon, _ = enc.encode_frame(base, "I")
    stream += nal
    h = libOpenHevcInit(1, 1)
    libOpenHevcStartDecoder(h)
    for chunk in (stream, b""):
        libOpenHevcDecode(h, chunk)
    out = libOpenHevcGetOutputCpy(h)
    assert out is not None
    assert out.frameInfo.nWidth == 70 and out.frameInfo.nHeight == 40
    assert out.frameInfo.nYPitch == 70
    assert out.frameInfo.nUPitch == 35
    assert out.pvY.shape == (40, 70)
    assert out.pvU.shape == (20, 35)
    np.testing.assert_array_equal(out.pvY, np.asarray(recon[0])[:40, :70])
    np.testing.assert_array_equal(out.pvU,
                                  np.asarray(recon[1])[:20, :35])
    libOpenHevcClose(h)

    # 10-bit: byte pitches double
    enc = Encoder(EncoderConfig(width=64, height=32, qp=30, bit_depth=10,
                                rng_seed=6))
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, 64, 32, 10)
    nal, recon, _ = enc.encode_frame(base, "I")
    stream += nal
    h = libOpenHevcInit(1, 1)
    libOpenHevcStartDecoder(h)
    for chunk in (stream, b""):
        libOpenHevcDecode(h, chunk)
    out = libOpenHevcGetOutputCpy(h)
    assert out.frameInfo.nYPitch == 128 and out.frameInfo.nUPitch == 64
    assert out.pvY.dtype == np.uint16
    np.testing.assert_array_equal(out.pvY, np.asarray(recon[0]))
    libOpenHevcClose(h)
