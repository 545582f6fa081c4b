"""hevc_sdl2-equivalent player: decodes annex-B through the C ABI shim and
presents frames on a terminal display backend (tools/player.c; reference
main_hm/sdl2.c + main.c:235-274 + SDL_framerate.c)."""

import os
import subprocess
import tempfile
import time

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from tests.conftest import cpu_subprocess_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_player(tmp):
    from openhevc_tpu.native import build_abi
    so = build_abi()
    exe = os.path.join(tmp, "player")
    libdir = os.path.dirname(so)
    subprocess.run(
        ["gcc", "-O1", os.path.join(REPO, "tools", "player.c"),
         "-o", exe, f"-L{libdir}", "-lLibOpenHevcWrapper",
         f"-Wl,-rpath,{libdir}"], check=True)
    return exe


def _make_stream():
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
    return stream, recons


@pytest.mark.slow
def test_player_display_and_dump():
    stream, recons = _make_stream()
    with tempfile.TemporaryDirectory() as td:
        exe = _build_player(td)
        inf = os.path.join(td, "in.265")
        with open(inf, "wb") as f:
            f.write(stream)
        outf = os.path.join(td, "out.yuv")
        env = cpu_subprocess_env()
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

        # displayed run on a forced 24x8 cell geometry: the player splits
        # the annex-B stream into AUs itself (hevc_parser.c:40 analog) and
        # renders half-block truecolor frames
        r = subprocess.run([exe, "-i", inf, "-o", outf, "-z", "24x8"],
                           env=env, capture_output=True, timeout=600)
        assert r.returncode == 0, r.stderr.decode()
        assert b"frame= 3" in r.stderr
        assert b"video_size= 96x64" in r.stderr
        out = r.stdout
        assert b"\x1b[2J" in out                   # display cleared
        assert b"\x1b[38;2;" in out                # truecolor fg cells
        assert out.count("▀".encode()) >= 3 * 8 * 8  # block glyphs

        got = np.fromfile(outf, np.uint8)
        want = np.concatenate([p.ravel() for fr in recons for p in fr])
        assert np.array_equal(got, want)

        # framerate governor: 3 frames at 10 fps must take >= 0.2 s
        t0 = time.time()
        r = subprocess.run([exe, "-i", inf, "-n", "-c", "-r", "10"],
                           env=env, capture_output=True, timeout=600)
        assert r.returncode == 0, r.stderr.decode()
        assert time.time() - t0 >= 0.2
        assert r.stdout == b""                     # -n: no display bytes
