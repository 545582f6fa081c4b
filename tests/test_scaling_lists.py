"""Scaling lists: parse/write round trip + e2e vs the reference oracle.

Covers default lists, explicit (custom) SPS lists, PPS-override lists
(spec 7.3.4 scaling_list_data; reference hevc_ps.c scaling_list_data,
hevc_cabac.c:1484-1832 dequant with scale_m), across Python, native and
TPU-batched decode paths.
"""

import numpy as np
import pytest

from openhevc_tpu.bitstream.bits import BitReader, BitWriter
from openhevc_tpu.ps.scaling import (ScalingList, parse_scaling_list,
                                     write_scaling_list,
                                     build_scaling_factors)
from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from tests.util_e2e import make_source, my_decode, oracle_decode, \
    assert_frames_equal


def test_scaling_list_roundtrip():
    rng = np.random.default_rng(3)
    sl = ScalingList()
    for size_id in range(4):
        for m in range(0, 6, 3 if size_id == 3 else 1):
            n = 16 if size_id == 0 else 64
            sl.sl[size_id][m] = rng.integers(1, 255, n).astype(np.int32)
            if size_id > 1:
                sl.sl_dc[size_id - 2][m] = int(rng.integers(1, 255))
    w = BitWriter()
    write_scaling_list(w, sl)
    w.rbsp_trailing_bits()        # byte-align for get_bytes
    r = BitReader(w.get_bytes())
    sl2 = parse_scaling_list(r)
    for size_id in range(4):
        for m in range(0, 6, 3 if size_id == 3 else 1):
            np.testing.assert_array_equal(sl.sl[size_id][m],
                                          sl2.sl[size_id][m])
    np.testing.assert_array_equal(sl.sl_dc, sl2.sl_dc)


def test_scaling_factors_upsample():
    sl = ScalingList()
    sl.sl_dc[0][2] = 31
    f = build_scaling_factors(sl)
    assert f[(2, 0)].shape == (4, 4) and (f[(2, 0)] == 16).all()
    m16 = f[(4, 2)]
    assert m16.shape == (16, 16)
    assert m16[0, 0] == 31                       # dc injected
    # pixel repetition of the default 8x8 intra list
    assert m16[15, 15] == 115 and m16[14, 14] == 115 and m16[13, 13] == 70


def _encode(mode, seed=404, types="IPB"):
    rng = np.random.default_rng(5)
    enc = Encoder(EncoderConfig(width=64, height=64, qp=30, rng_seed=seed,
                                scaling_lists=mode, p_intra_in_inter=0.2))
    stream = b"".join(enc.parameter_set_nals())
    recons = []
    base = make_source(rng, 64, 64)
    for i, t in enumerate(types):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    return stream, recons


@pytest.mark.parametrize("mode", ["default", "custom", "pps"])
def test_scaling_e2e(mode):
    stream, recons = _encode(mode)
    mine = my_decode(stream)
    for f, want in zip(mine, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
    oracle = oracle_decode(stream, 64, 64)
    assert_frames_equal(recons, oracle, tag=f"scaling {mode}")


def test_scaling_native():
    stream, recons = _encode("custom")
    dec = Decoder(backend=None, check_md5=True)
    dec.fe.use_native = True
    frames = [f.planes for f in dec.decode_stream(stream)]
    for f, want in zip(frames, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)


def test_scaling_tpu_backend():
    from openhevc_tpu.tpu import TpuBackend
    stream, recons = _encode("custom", types="IP")
    dec = Decoder(backend=TpuBackend(ctb_log2=5), check_md5=True)
    frames = [f.planes for f in dec.decode_stream(stream)]
    for f, want in zip(frames, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
