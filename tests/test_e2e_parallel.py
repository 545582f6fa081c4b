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


# ---------------------------------------------------------------------------
# WPP inside tiles (hevc.c:2834 hls_decode_entry_wpp_in_tiles; round 2)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_native", [False, True])
@pytest.mark.parametrize("grid", [(2, 2), (3, 1), (1, 2)])
def test_wpp_inside_tiles(use_native, grid):
    """Both PPS flags set: one substream per CTB row of each tile, CABAC
    re-init at tile starts, WPP context propagation within each tile
    (ff_hevc_cabac_init tile/WPP rules, hevc_cabac.c:606-656)."""
    from openhevc_tpu.decoder.frontend import Decoder
    cfg = EncoderConfig(width=128, height=64, qp=30, rng_seed=7, wpp=True,
                        tiles=grid, sao=True)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(42)
    src = make_source(rng, 128, 64)
    recons = []
    for i, t in enumerate("IPP"):
        s = [np.roll(p, i, 0) for p in src]
        nal, recon, _ = enc.encode_frame(s, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    dec = Decoder(check_md5=True, use_native=use_native)
    frames = dec.decode_stream(stream)
    for i, (f, want) in enumerate(zip(frames, recons)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), want[c],
                                          err_msg=f"frame {i} plane {c}")
    if use_native:
        for i, (got, want) in enumerate(zip(
                oracle_decode(stream, 128, 64), recons)):
            for c in range(3):
                np.testing.assert_array_equal(got[c], want[c],
                                              err_msg=f"oracle f{i} p{c}")


def test_wpp_inside_tiles_one_ctb_columns():
    """1-CTB-wide tiles: every WPP row re-inits instead of loading the
    (nonexistent) snapshot (hevc_cabac.c:618 tile_width==1 branch)."""
    from openhevc_tpu.decoder.frontend import Decoder
    cfg = EncoderConfig(width=64, height=64, qp=32, rng_seed=3, wpp=True,
                        tiles=(2, 1))
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(1)
    src = make_source(rng, 64, 64)
    nal, recon, _ = enc.encode_frame(src, "I")
    stream += nal
    dec = Decoder(check_md5=True)
    frames = dec.decode_stream(stream)
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(frames[0].planes[c]),
                                      np.asarray(recon[c]))
    for got, want in zip(oracle_decode(stream, 64, 64)[0], recon):
        np.testing.assert_array_equal(got, np.asarray(want))
