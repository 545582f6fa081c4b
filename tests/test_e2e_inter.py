"""End-to-end inter (P/B) golden tests vs the reference decoder."""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from tests.util_e2e import (oracle_decode, my_decode, make_source,
                            assert_frames_equal)


def _shift(p, dx, dy):
    return np.roll(np.roll(p, dy, 0), dx, 1)


def _run(cfg: EncoderConfig, pattern, seed=0):
    """pattern: string like 'IPPP' or 'IBBB'."""
    rng = np.random.default_rng(seed)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, cfg.width, cfg.height, cfg.bit_depth)
    recons = []
    for i, st in enumerate(pattern):
        src = [_shift(base[0], 2 * i + (i % 3), i),
               _shift(base[1], i, (i % 2)),
               _shift(base[2], i, (i % 2))]
        noise = rng.integers(-6, 7, src[0].shape)
        src[0] = np.clip(src[0] + noise, 0, (1 << cfg.bit_depth) - 1)
        nal, recon, _ = enc.encode_frame(src, st)
        stream += nal
        recons.append([p.copy() for p in recon])
    mine = my_decode(stream)
    assert_frames_equal(mine, recons, "self")
    oracle = oracle_decode(stream, cfg.width, cfg.height, cfg.bit_depth)
    assert_frames_equal(mine, oracle, "oracle")


def test_p_basic():
    _run(EncoderConfig(width=64, height=64, qp=30, rng_seed=5), "IPPP", seed=2)


def test_p_more_motion():
    _run(EncoderConfig(width=96, height=64, qp=27, mv_range=80, rng_seed=6),
         "IPPPPP", seed=3)


def test_p_small_qp_heavy_split():
    _run(EncoderConfig(width=64, height=64, qp=18, p_split=0.8, rng_seed=7),
         "IPP", seed=4)


def test_p_sao_deblock():
    _run(EncoderConfig(width=96, height=96, qp=33, sao=True, rng_seed=8),
         "IPPP", seed=5)


def test_b_lowdelay():
    _run(EncoderConfig(width=64, height=64, qp=30, rng_seed=9), "IPBB", seed=6)


def test_b_heavy():
    _run(EncoderConfig(width=96, height=64, qp=28, p_merge=0.5, rng_seed=10),
         "IPBBBB", seed=7)


def test_tmvp_p():
    _run(EncoderConfig(width=64, height=64, qp=30, temporal_mvp=True,
                       rng_seed=11), "IPPPP", seed=8)


def test_tmvp_b():
    _run(EncoderConfig(width=64, height=64, qp=30, temporal_mvp=True,
                       rng_seed=12), "IPBBB", seed=9)


def test_ctb64_inter():
    _run(EncoderConfig(width=128, height=128, qp=32, log2_ctb=6, rng_seed=13),
         "IPP", seed=10)


def test_intra_in_p():
    _run(EncoderConfig(width=64, height=64, qp=30, p_intra_in_inter=0.5,
                       rng_seed=14), "IPPP", seed=11)


def test_weighted_pred():
    _run(EncoderConfig(width=96, height=64, qp=30, weighted_pred=True,
                       rng_seed=15), "IPPBB", seed=12)


def test_weighted_pred_main10():
    # weighted uni/bi at 10-bit, oracle-verified (bi rounding term uses an
    # unscaled +1 next to the scaled offsets, hevcdsp_template.c bi_w)
    _run(EncoderConfig(width=96, height=64, qp=30, bit_depth=10,
                       weighted_pred=True, rng_seed=21), "IPPBB", seed=18)


def test_cu_qp_delta():
    _run(EncoderConfig(width=96, height=64, qp=30, cu_qp_delta=True,
                       rng_seed=16), "IPPB", seed=13)


def test_amp_partitions():
    """AMP inter partitions (2NxnU/2NxnD/nLx2N/nRx2N; hls_prediction_unit
    part modes, hevc.c:1968) decode bit-exact vs the encoder recon AND the
    reference oracle.  Round-3 gap: both front-ends implemented AMP but no
    generated stream ever exercised it."""
    _run(EncoderConfig(width=96, height=96, qp=30, amp=True, p_amp=0.8,
                       p_skip=0.1, log2_ctb=6, rng_seed=61), "IPBP", seed=21)
