"""TPU back-end vs NumPy scalar pipeline: must be bit-exact."""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from openhevc_tpu.tpu import TpuBackend
from tests.util_e2e import make_source, assert_frames_equal


def _roll(p, dx, dy):
    return np.roll(np.roll(p, dy, 0), dx, 1)


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
    dec = Decoder(backend=TpuBackend())
    frames = dec.decode_stream(stream)
    mine = [[np.asarray(p) for p in f.planes] for f in frames]
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


def test_tpu_wpp_tiles_streams():
    _run(EncoderConfig(width=96, height=64, qp=30, wpp=True, rng_seed=40),
         "IP", seed=10)
