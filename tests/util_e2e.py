"""Shared helpers for end-to-end stream tests against the reference decoder."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

ORACLE_CLI = os.path.join(os.path.dirname(__file__), "..", ".oracle", "oracle_cli")


def have_oracle():
    return os.path.exists(ORACLE_CLI)


def oracle_decode(stream: bytes, width, height, bit_depth=8, chroma=1,
                  layer=0):
    """Run the reference decoder -> list of [Y, U, V] planes per frame.
    layer selects the SHVC output layer (0 = base, 1 = enhancement)."""
    if not have_oracle():
        pytest.skip("reference oracle_cli not built")
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.265")
        out = os.path.join(td, "out.yuv")
        with open(inp, "wb") as f:
            f.write(stream)
        r = subprocess.run([ORACLE_CLI, inp, out, "1", "1", str(layer)],
                           capture_output=True, text=True)
        assert os.path.exists(out), f"oracle failed: {r.stdout}\n{r.stderr}"
        dt = np.uint16 if bit_depth > 8 else np.uint8
        data = np.fromfile(out, dt)
        cw = width >> (1 if chroma in (1, 2) else 0)
        ch = height >> (1 if chroma == 1 else 0)
        fsz = width * height + 2 * cw * ch
        nframes = len(data) // fsz
        frames = []
        for i in range(nframes):
            base = i * fsz
            y = data[base:base + width * height].reshape(height, width)
            u = data[base + width * height:base + width * height + cw * ch].reshape(ch, cw)
            v = data[base + width * height + cw * ch:base + fsz].reshape(ch, cw)
            frames.append([y.astype(np.int32), u.astype(np.int32), v.astype(np.int32)])
        return frames


def oracle_md5_verify(stream: bytes, layer=0):
    """Run the reference decoder with its own MD5-SEI verification enabled
    (verify_md5, hevc.c:4045) -> (nframes, nmismatches).  The parity oracle
    for formats the reference wrapper cannot output (e.g. 14-bit: no
    PIX_FMT_YUV420P14 case in openHevcWrapper.c:179-232)."""
    if not have_oracle():
        pytest.skip("reference oracle_cli not built")
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.265")
        with open(inp, "wb") as f:
            f.write(stream)
        r = subprocess.run([ORACLE_CLI, inp, "-", "1", "1", str(layer), "1"],
                           capture_output=True, text=True)
        nframes = 0
        for line in (r.stdout + r.stderr).splitlines():
            if line.startswith("frames="):
                nframes = int(line.split("frames=")[1].split()[0])
        bad = (r.stdout + r.stderr).count("mismatching checksum")
        return nframes, bad


def my_decode(stream: bytes):
    """Decode with our frontend + NumPy back-end -> plane triples, POC order."""
    from openhevc_tpu.decoder.frontend import Decoder
    dec = Decoder()
    return [f.planes for f in dec.decode_stream(stream)]


def make_source(rng, w, h, bit_depth=8, smooth=True):
    mx = (1 << bit_depth) - 1
    if smooth:
        y = (rng.integers(0, mx + 1, (h // 8, w // 8)).repeat(8, 0).repeat(8, 1) * 0.6
             + rng.integers(0, mx + 1, (h, w)) * 0.4).astype(np.int32)
        u = (rng.integers(0, mx + 1, (h // 8, w // 8)).repeat(4, 0).repeat(4, 1)
             ).astype(np.int32)[:h // 2, :w // 2]
        v = (rng.integers(0, mx + 1, (h // 8, w // 8)).repeat(4, 0).repeat(4, 1)
             ).astype(np.int32)[:h // 2, :w // 2]
    else:
        y = rng.integers(0, mx + 1, (h, w)).astype(np.int32)
        u = rng.integers(0, mx + 1, (h // 2, w // 2)).astype(np.int32)
        v = rng.integers(0, mx + 1, (h // 2, w // 2)).astype(np.int32)
    return [y, u, v]


def assert_frames_equal(mine, oracle, tag=""):
    assert len(mine) == len(oracle), f"{tag}: frame count {len(mine)} != {len(oracle)}"
    for fi, (m, o) in enumerate(zip(mine, oracle)):
        for ci in range(3):
            d = np.abs(m[ci] - o[ci])
            assert d.max() == 0, (
                f"{tag}: frame {fi} plane {ci}: {int((d > 0).sum())} mismatches, "
                f"max {int(d.max())}, first at {np.argwhere(d > 0)[:5].tolist()}")
