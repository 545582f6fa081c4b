"""End-to-end intra-frame golden tests vs the reference decoder."""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from tests.util_e2e import (oracle_decode, my_decode, make_source,
                            assert_frames_equal)


def _run(cfg: EncoderConfig, seed=0, smooth=True, nframes=1):
    rng = np.random.default_rng(seed)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    recons = []
    for _ in range(nframes):
        src = make_source(rng, cfg.width, cfg.height, cfg.bit_depth, smooth)
        nal, recon, _ = enc.encode_intra_frame(src)
        stream += nal
        recons.append([p.copy() for p in recon])
    mine = my_decode(stream)
    assert_frames_equal(mine, recons, "self")
    oracle = oracle_decode(stream, cfg.width, cfg.height, cfg.bit_depth)
    assert_frames_equal(mine, oracle, "oracle")


def test_basic_64():
    _run(EncoderConfig(width=64, height=64, qp=30))


def test_no_deblock():
    _run(EncoderConfig(width=64, height=64, qp=35, deblock=False), seed=1)


@pytest.mark.parametrize("qp", [0, 10, 22, 37, 51])
def test_qp_sweep(qp):
    _run(EncoderConfig(width=96, height=64, qp=qp, rng_seed=qp), seed=qp)


def test_sao():
    _run(EncoderConfig(width=96, height=96, qp=32, sao=True, rng_seed=7), seed=7)


def test_ctb64_strong_smoothing():
    _run(EncoderConfig(width=128, height=128, qp=28, log2_ctb=6,
                       p_split=0.3, rng_seed=3), seed=3)


def test_noise_source_high_qp():
    _run(EncoderConfig(width=64, height=64, qp=45, rng_seed=9), seed=9,
         smooth=False)


def test_nxn_heavy():
    _run(EncoderConfig(width=64, height=64, qp=30, p_split=0.9, p_nxn=0.9,
                       rng_seed=11), seed=11)


def test_multi_frame_idr():
    _run(EncoderConfig(width=64, height=64, qp=33, rng_seed=13), seed=13,
         nframes=3)


def test_sign_data_hiding():
    _run(EncoderConfig(width=64, height=64, qp=26, sign_data_hiding=True,
                       rng_seed=17), seed=17)


def test_nonsquare_ctb_partial():
    # dimensions not multiples of the CTB size exercise forced splits
    _run(EncoderConfig(width=88, height=72, qp=30, rng_seed=19), seed=19)
