"""TPU back-end vs NumPy scalar pipeline: must be bit-exact.

The TPU-backend decode runs in a SPAWNED subprocess: compiling the big
fused frame_step programs late in a long pytest process intermittently
segfaults XLA:CPU (observed in compile, executable serialize AND
deserialize); a fresh interpreter per decode sidesteps all of them, and
the persistent jit cache keeps repeats fast."""

import os
import pickle
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from tests.conftest import cpu_subprocess_env
from tests.util_e2e import make_source, assert_frames_equal

pytestmark = pytest.mark.slow      # subprocess-per-decode; ~15-30 s each


def _roll(p, dx, dy):
    return np.roll(np.roll(p, dy, 0), dx, 1)


_RUNNER = r"""
import pickle, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/openhevc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from openhevc_tpu.decoder.frontend import Decoder
from openhevc_tpu.tpu import TpuBackend

inp, outp = sys.argv[1], sys.argv[2]
stream = open(inp, "rb").read()
dec = Decoder(backend=TpuBackend())
frames = dec.decode_stream(stream)
# host_planes: the product fetch path (narrow wire + 10/12-bit unpack)
mine = [[np.asarray(p).astype(np.int32) for p in f.host_planes()]
        for f in frames]
with open(outp, "wb") as f:
    pickle.dump(mine, f)
"""


def _decode_tpu_subprocess(stream: bytes):
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.265")
        outp = os.path.join(td, "out.pkl")
        with open(inp, "wb") as f:
            f.write(stream)
        env = cpu_subprocess_env()
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run([sys.executable, "-c", _RUNNER, inp, outp],
                           env=env, capture_output=True, text=True,
                           timeout=900)
        assert r.returncode == 0, f"tpu decode failed:\n{r.stderr[-3000:]}"
        with open(outp, "rb") as f:
            return pickle.load(f)


def _run(cfg: EncoderConfig, pattern, seed=0):
    rng = np.random.default_rng(seed)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, cfg.width, cfg.height, cfg.bit_depth)
    recons = []
    for i, st in enumerate(pattern):
        src = [_roll(base[0], 2 * i, i), _roll(base[1], i, 0), _roll(base[2], i, 0)]
        nal, recon, _ = enc.encode_frame(src, st)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    mine = _decode_tpu_subprocess(stream)
    assert_frames_equal(mine, recons, "tpu-vs-recon")


def test_tpu_intra_basic():
    _run(EncoderConfig(width=64, height=64, qp=30, rng_seed=31), "I", seed=1)


def test_tpu_intra_sao():
    _run(EncoderConfig(width=96, height=96, qp=32, sao=True, rng_seed=32), "I", seed=2)


@pytest.mark.parametrize("qp", [0, 22, 45, 51])
def test_tpu_intra_qp(qp):
    _run(EncoderConfig(width=64, height=64, qp=qp, rng_seed=33 + qp), "I", seed=3)


def test_tpu_intra_ctb64():
    _run(EncoderConfig(width=128, height=128, qp=28, log2_ctb=6, rng_seed=34),
         "I", seed=4)


def test_tpu_inter_p():
    _run(EncoderConfig(width=64, height=64, qp=30, rng_seed=35), "IPPP", seed=5)


def test_tpu_inter_b_sao():
    _run(EncoderConfig(width=96, height=64, qp=31, sao=True, rng_seed=36),
         "IPBB", seed=6)


def test_tpu_inter_tmvp():
    _run(EncoderConfig(width=64, height=64, qp=30, temporal_mvp=True,
                       rng_seed=37), "IPPP", seed=7)


def test_tpu_nxn_heavy():
    _run(EncoderConfig(width=64, height=64, qp=26, p_split=0.9, p_nxn=0.9,
                       rng_seed=38), "IP", seed=8)


def test_tpu_weighted_pred():
    _run(EncoderConfig(width=64, height=64, qp=30, weighted_pred=True,
                       rng_seed=39), "IPB", seed=9)


def test_tpu_weighted_pred_main10():
    # bd > 8 weighted-bi: the rounding term is (ox0+ox1+1) << log2Wd with
    # scaled offsets but the +1 UNSCALED (hevcdsp_template.c bi_w) — a
    # formulation that folded the +1 into the offset scale was ~2 LSB off
    _run(EncoderConfig(width=64, height=64, qp=30, bit_depth=10,
                       weighted_pred=True, rng_seed=44), "IPB", seed=14)


def test_tpu_wpp_tiles_streams():
    _run(EncoderConfig(width=96, height=64, qp=30, wpp=True, rng_seed=40),
         "IP", seed=10)


def test_tpu_main10_packed_wire():
    # 10-bit: the D2H wire is bit-packed 4 samples -> 5 bytes
    # (tpu/frame_step.py) and Frame.host_planes unpacks; MD5 SEI
    # verification inside the Decoder runs over the unpacked planes
    _run(EncoderConfig(width=64, height=64, qp=30, bit_depth=10,
                       sao=True, rng_seed=41), "IP", seed=11)


def test_tpu_main14_wire():
    """14-bit (the reference's BIT_DEPTH 14 template, hevcdsp.c:1060):
    generic int16 D2H wire + host unpack, SAO/deblock clips at (1<<14)-1."""
    _run(EncoderConfig(width=64, height=64, qp=33, bit_depth=14,
                       sao=True, rng_seed=43), "IP", seed=13)


def test_tpu_amp():
    """AMP PU geometries through the fused frame_step MC tile buckets."""
    _run(EncoderConfig(width=96, height=96, qp=30, amp=True, p_amp=0.8,
                       p_skip=0.1, log2_ctb=6, rng_seed=42), "IPP", seed=12)
