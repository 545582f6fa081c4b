"""Range-extension chroma formats: 4:2:2 and 4:4:4 end-to-end.

Exercises the double-TU 4:2:2 chroma loops (hevc.c:1302-1363), per-part
4:4:4 chroma intra modes (hevc.c:2286-2297), the 4:2:2 intra mode
remapping table, subsampling-dependent chroma MC phases (hevc.c:1834),
and generalized chroma deblock/SAO — all bit-exact vs the encoder recon
and the reference oracle, on the python walker, the C front-end, and the
fused TPU backend."""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from tests.util_e2e import oracle_decode


def _encode(cfmt, pattern="IPPB", w=64, h=64, seed=7, **kw):
    cfg = EncoderConfig(width=w, height=h, qp=30, rng_seed=seed,
                        chroma_format=cfmt, **kw)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(seed)
    hs = 1 if cfmt in (1, 2) else 0
    vs = 1 if cfmt == 1 else 0
    base = [rng.integers(0, 256, (h, w)).astype(np.int32),
            rng.integers(0, 256, (h >> vs, w >> hs)).astype(np.int32),
            rng.integers(0, 256, (h >> vs, w >> hs)).astype(np.int32)]
    recons = []
    for i, t in enumerate(pattern):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    return stream, recons


def _check(stream, recons, cfmt, w=64, h=64, dec=None):
    dec = dec or Decoder(check_md5=True)
    frames = dec.decode_stream(stream)
    assert len(frames) == len(recons)
    for i, (f, want) in enumerate(zip(frames, recons)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), want[c],
                                          err_msg=f"frame {i} plane {c}")
    for i, (got, want) in enumerate(zip(
            oracle_decode(stream, w, h, chroma=cfmt), recons)):
        for c in range(3):
            np.testing.assert_array_equal(got[c], want[c],
                                          err_msg=f"oracle f{i} p{c}")


@pytest.mark.parametrize("cfmt", [2, 3])
def test_chroma_format_ipb(cfmt):
    stream, recons = _encode(cfmt)
    _check(stream, recons, cfmt)


@pytest.mark.parametrize("cfmt", [2, 3])
def test_chroma_format_native_frontend(cfmt):
    stream, recons = _encode(cfmt, seed=11)
    _check(stream, recons, cfmt, dec=Decoder(check_md5=True, use_native=True))


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
@pytest.mark.parametrize("cfmt", [2, 3])
def test_chroma_format_tpu_backend(cfmt):
    from openhevc_tpu.tpu import TpuBackend
    stream, recons = _encode(cfmt, seed=13, pattern="IPP")
    _check(stream, recons, cfmt,
           dec=Decoder(check_md5=True, backend=TpuBackend()))


@pytest.mark.parametrize("cfmt", [2, 3])
def test_chroma_format_sao(cfmt):
    stream, recons = _encode(cfmt, seed=17, sao=True)
    _check(stream, recons, cfmt)


@pytest.mark.parametrize("cfmt", [2, 3])
def test_chroma_format_nxn_heavy(cfmt):
    """Deep splits + NxN exercise the per-part 4:4:4 chroma modes and the
    4:2:2 blk3 double-TU aggregation."""
    stream, recons = _encode(cfmt, seed=19, pattern="IP", p_split=0.8,
                             p_nxn=0.8, p_cbf_zero=0.3)
    _check(stream, recons, cfmt)


@pytest.mark.parametrize("cfmt", [2, 3])
def test_chroma_format_main10(cfmt):
    stream, recons = _encode(cfmt, seed=23, pattern="IP", bit_depth=10)
    dec = Decoder(check_md5=True)
    frames = dec.decode_stream(stream)
    for i, (f, want) in enumerate(zip(frames, recons)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), want[c])
    for i, (got, want) in enumerate(zip(
            oracle_decode(stream, 64, 64, bit_depth=10, chroma=cfmt),
            recons)):
        for c in range(3):
            np.testing.assert_array_equal(got[c], want[c],
                                          err_msg=f"oracle f{i} p{c}")


@pytest.mark.parametrize("cfmt", [2, 3])
def test_chroma_format_transform_skip_sdh(cfmt):
    stream, recons = _encode(cfmt, seed=29, pattern="IP",
                             transform_skip=True, sign_data_hiding=True)
    _check(stream, recons, cfmt)
