"""libLibOpenHevcWrapper C ABI shim: a compiled C driver (standing in for a
GPAC-style player) dlopens nothing python-side — it links the shim, which
embeds CPython and delegates to the openhevc_tpu API."""

import os
import struct
import subprocess
import sys
import sysconfig
import tempfile

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.parser import HevcParser
from tests.conftest import cpu_subprocess_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_driver(tmp):
    from openhevc_tpu.native import build_abi
    so = build_abi()
    drv = os.path.join(tmp, "abi_driver")
    libdir = os.path.dirname(so)
    subprocess.run(
        ["gcc", "-O1", os.path.join(REPO, "tools", "abi_driver.c"),
         "-o", drv, f"-L{libdir}", "-lLibOpenHevcWrapper",
         f"-Wl,-rpath,{libdir}"], check=True)
    return drv


@pytest.mark.slow
def test_abi_player_loop():
    cfg = EncoderConfig(width=96, height=64, qp=30, rng_seed=6)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(2)
    base = [rng.integers(0, 256, (64, 96)).astype(np.int32),
            rng.integers(0, 256, (32, 48)).astype(np.int32),
            rng.integers(0, 256, (32, 48)).astype(np.int32)]
    recons = []
    for i, t in enumerate("IPP"):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).astype(np.uint8) for p in recon])

    # split into AUs like a demuxer (PS prepended to the first AU)
    infos = HevcParser().iter_access_units(stream)
    offs = [i.offset for i in infos] + [len(stream)]
    aus = [stream[:offs[1]]] + [stream[offs[k]:offs[k + 1]]
                                for k in range(1, len(offs) - 1)]
    assert len(aus) == 3

    with tempfile.TemporaryDirectory() as td:
        drv = _build_driver(td)
        auf = os.path.join(td, "in.aus")
        with open(auf, "wb") as f:
            for au in aus:
                f.write(struct.pack("<I", len(au)))
                f.write(au)
        outf = os.path.join(td, "out.yuv")
        env = cpu_subprocess_env()
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run([drv, auf, outf, "md5"], env=env,
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, f"driver failed:\n{r.stdout}\n{r.stderr}"
        assert "frames=3" in r.stdout
        assert "openhevc_tpu" in r.stdout          # version string

        got = np.fromfile(outf, np.uint8)
        want = np.concatenate([p.ravel() for fr in recons for p in fr])
        assert np.array_equal(got, want)


def _build_gpac_driver(tmp):
    from openhevc_tpu.native import build_abi
    so = build_abi()
    drv = os.path.join(tmp, "gpac_driver")
    libdir = os.path.dirname(so)
    subprocess.run(
        ["gcc", "-O1", os.path.join(REPO, "tools", "gpac_driver.c"),
         "-o", drv, f"-L{libdir}", "-lLibOpenHevcWrapper",
         f"-Wl,-rpath,{libdir}"], check=True)
    return drv


def _gpac_samples():
    """hvcC + MP4-form samples + expected recons for the GPAC tests."""
    from openhevc_tpu.formats.mp4 import build_hvcc

    cfg = EncoderConfig(width=96, height=64, qp=30, rng_seed=6)
    enc = Encoder(cfg)
    ps = enc.parameter_set_nals()              # [vps, sps, pps] annex-B

    def raw(nal):
        return nal[4:] if nal[:4] == b"\x00\x00\x00\x01" else nal[3:]

    hvcc = build_hvcc(raw(ps[0]), raw(ps[1]), raw(ps[2]), enc.sps)

    rng = np.random.default_rng(2)
    base = [rng.integers(0, 256, (64, 96)).astype(np.int32),
            rng.integers(0, 256, (32, 48)).astype(np.int32),
            rng.integers(0, 256, (32, 48)).astype(np.int32)]
    recons, samples = [], []
    for i, t in enumerate("IPP"):
        src = [np.roll(p, i, 0) for p in base]
        au, recon, _ = enc.encode_frame(src, t)
        recons.append([np.asarray(p).astype(np.uint8) for p in recon])
        # MP4 sample form: 4-byte length-prefixed NALUs, no start codes
        starts = []
        k = au.find(b"\x00\x00\x01")
        while k != -1:
            starts.append(k)
            k = au.find(b"\x00\x00\x01", k + 3)
        nals = []
        for si, k in enumerate(starts):
            end = starts[si + 1] if si + 1 < len(starts) else len(au)
            if si + 1 < len(starts) and au[end - 1] == 0:
                end -= 1                # 4-byte start code's leading zero
            nals.append(au[k + 3:end])
        sample = b"".join(struct.pack(">I", len(n)) + n for n in nals)
        samples.append(sample)
    return hvcc, samples, recons


def _write_smp(path, hvcc, samples):
    with open(path, "wb") as f:
        f.write(struct.pack("<I", len(hvcc)))
        f.write(hvcc)
        for s in samples:
            f.write(struct.pack("<I", len(s)))
            f.write(s)


@pytest.mark.slow
def test_gpac_module_lifecycle():
    """The exact call sequence of GPAC's openhevc_dec plugin against the
    shim: hvcC extradata via CopyExtraData (switching the decoder into
    ISO length-prefixed NALFF mode), SetActiveDecoders/SetViewLayers,
    per-sample Decode + GetPictureInfo(SetCpy) + GetOutputCpy, EOS drain
    + Flush + Close — every symbol the plugin links."""
    hvcc, samples, recons = _gpac_samples()

    with tempfile.TemporaryDirectory() as td:
        drv = _build_gpac_driver(td)
        inf = os.path.join(td, "in.smp")
        with open(inf, "wb") as f:
            f.write(struct.pack("<I", len(hvcc)))
            f.write(hvcc)
            for s in samples:
                f.write(struct.pack("<I", len(s)))
                f.write(s)
        outf = os.path.join(td, "out.yuv")
        env = cpu_subprocess_env()
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run([drv, inf, outf], env=env,
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, f"driver failed:\n{r.stdout}\n{r.stderr}"
        assert "frames=3" in r.stdout
        got = np.fromfile(outf, np.uint8)
        want = np.concatenate([p.ravel() for fr in recons for p in fr])
        assert np.array_equal(got, want)


def _build_gpac_module(tmp):
    from openhevc_tpu.native import build_abi
    so = build_abi()
    drv = os.path.join(tmp, "gpac_module_host")
    libdir = os.path.dirname(so)
    mdir = os.path.join(REPO, "tools", "gpac_module")
    subprocess.run(
        ["gcc", "-O1", os.path.join(mdir, "openhevc_dec.c"),
         os.path.join(mdir, "harness.c"),
         "-o", drv, f"-L{libdir}", "-lLibOpenHevcWrapper",
         f"-Wl,-rpath,{libdir}"], check=True)
    return drv


@pytest.mark.slow
def test_gpac_module_source():
    """The actual GPAC decoder-module SOURCE (tools/gpac_module/
    openhevc_dec.c — QueryInterfaces/LoadInterface/ShutdownInterface +
    GF_MediaDecoder vtable, the reference plugin's surface) decodes a
    length-prefixed sample stream bit-exactly when driven by a
    mini-GPAC host through AttachStream / GetCapabilities /
    ProcessData(+ EOS drain) / DetachStream."""
    hvcc, samples, recons = _gpac_samples()

    with tempfile.TemporaryDirectory() as td:
        drv = _build_gpac_module(td)
        inf = os.path.join(td, "in.smp")
        _write_smp(inf, hvcc, samples)
        outf = os.path.join(td, "out.yuv")
        env = cpu_subprocess_env()
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run([drv, inf, outf], env=env,
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, f"module host failed:\n{r.stdout}\n{r.stderr}"
        assert "module=openhevc_tpu Decoder" in r.stdout
        assert "frames=3" in r.stdout
        got = np.fromfile(outf, np.uint8)
        want = np.concatenate([p.ravel() for fr in recons for p in fr])
        assert np.array_equal(got, want)
