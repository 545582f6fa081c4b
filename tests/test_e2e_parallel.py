"""WPP / tiles end-to-end tests vs the reference decoder."""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from tests.util_e2e import (oracle_decode, my_decode, make_source,
                            assert_frames_equal)


def _run(cfg, pattern="IP", seed=0):
    rng = np.random.default_rng(seed)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, cfg.width, cfg.height, cfg.bit_depth)
    recons = []
    for i, t in enumerate(pattern):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    mine = my_decode(stream)
    assert_frames_equal(mine, recons, "self")
    oracle = oracle_decode(stream, cfg.width, cfg.height, cfg.bit_depth)
    assert_frames_equal(mine, oracle, "oracle")


def test_wpp_intra():
    _run(EncoderConfig(width=96, height=96, qp=30, wpp=True, rng_seed=101),
         "I", 1)


def test_wpp_inter_sao():
    _run(EncoderConfig(width=128, height=96, qp=31, wpp=True, sao=True,
                       rng_seed=102), "IPPB", 2)


def test_wpp_ctb64():
    _run(EncoderConfig(width=128, height=128, qp=28, log2_ctb=6, wpp=True,
                       rng_seed=103), "IP", 3)


def test_tiles_2x2():
    _run(EncoderConfig(width=128, height=96, qp=30, tiles=(2, 2),
                       rng_seed=104), "IPP", 4)


def test_tiles_3x1_sao():
    _run(EncoderConfig(width=192, height=64, qp=33, tiles=(3, 1), sao=True,
                       rng_seed=105), "IP", 5)


def test_tiles_1x3_main10():
    _run(EncoderConfig(width=64, height=96, qp=30, tiles=(1, 3),
                       bit_depth=10, rng_seed=106), "IP", 6)


def _epb_stream(cfg, pattern="IPP"):
    """Build a stream whose PCM zero-runs force emulation-prevention bytes
    inside WPP/tile substreams (exercises the hevc.c:3030-3051 entry-point
    fixup; CABAC output alone almost never contains 00 00 0x)."""
    from openhevc_tpu.bitstream.nal import split_annexb, is_vcl
    rng = np.random.default_rng(0)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    h, w = cfg.height, cfg.width
    recons = []
    for i, t in enumerate(pattern):
        src = [np.zeros((h, w), np.uint8), np.zeros((h // 2, w // 2), np.uint8),
               np.zeros((h // 2, w // 2), np.uint8)]
        if i:
            src = [(p + rng.integers(0, 20, p.shape).astype(np.uint8))
                   for p in src]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    epbs = sum(len(n.skipped_bytes) for n in split_annexb(stream)
               if is_vcl(n.type))
    assert epbs > 0, "stream must contain EPBs inside slice data"
    return stream, recons


def test_wpp_entry_points_with_epbs():
    cfg = EncoderConfig(width=128, height=128, qp=30, rng_seed=0, wpp=True,
                        p_pcm=0.5)
    stream, recons = _epb_stream(cfg)
    mine = my_decode(stream)
    assert_frames_equal(mine, recons, "self")
    oracle = oracle_decode(stream, cfg.width, cfg.height)
    assert_frames_equal(mine, oracle, "oracle")


def test_wpp_entry_points_with_epbs_native():
    from openhevc_tpu.decoder.frontend import Decoder
    cfg = EncoderConfig(width=128, height=128, qp=30, rng_seed=0, wpp=True,
                        p_pcm=0.5)
    stream, recons = _epb_stream(cfg)
    dec = Decoder(use_native=True)
    mine = [f.planes for f in dec.decode_stream(stream)]
    assert_frames_equal(mine, recons, "native")


def test_tiles_entry_points_with_epbs():
    cfg = EncoderConfig(width=128, height=128, qp=30, rng_seed=0,
                        tiles=(2, 2), p_pcm=0.5)
    stream, recons = _epb_stream(cfg)
    mine = my_decode(stream)
    assert_frames_equal(mine, recons, "self")
    oracle = oracle_decode(stream, cfg.width, cfg.height)
    assert_frames_equal(mine, oracle, "oracle")
