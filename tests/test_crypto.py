"""Selective encryption of CABAC bypass bins (crypto.cpp parity).

The keystream generator replicates the reference's AES-128-CFB counter
scheme (crypto.cpp:41-100) with its demo key/iv; the bin transforms mirror
hevc_cabac.c's *_decode_enc variants.  Because the oracle build has no
Crypto++, correctness is established by round-trip (encrypt-at-encode /
decrypt-at-decode must be bit-exact) plus a negative test (decoding the
encrypted stream WITHOUT the key must corrupt the output while still
parsing — the transforms preserve the rice/EG code classes).
"""

import numpy as np
import pytest

from openhevc_tpu.crypto import (HevcCrypto, HEVC_CRYPTO_MVS,
                                 HEVC_CRYPTO_MV_SIGNS,
                                 HEVC_CRYPTO_TRANSF_COEFFS,
                                 HEVC_CRYPTO_TRANSF_COEFF_SIGNS,
                                 HEVC_CRYPTO_ON, xform_remaining_suffix,
                                 xform_eg_suffix)
from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from tests.util_e2e import make_source


def test_keystream_deterministic():
    a, b = HevcCrypto(), HevcCrypto()
    seq_a = [a.get_key(n) for n in (1, 2, 3, 8, 16, 32, 5, 1, 7)]
    seq_b = [b.get_key(n) for n in (1, 2, 3, 8, 16, 32, 5, 1, 7)]
    assert seq_a == seq_b
    assert any(seq_a), "keystream must not be all-zero"
    # different counters diverge
    c = HevcCrypto(counter=bytes(16))
    assert [c.get_key(8) for _ in range(4)] != [HevcCrypto().get_key(8)
                                               for _ in range(4)]


@pytest.mark.parametrize("rice", [1, 2, 3, 4])
@pytest.mark.parametrize("base", [1, 2, 3])
def test_rice_suffix_roundtrip(rice, base):
    """encrypt then decrypt restores every suffix for every prefix class,
    with both sides chaining prev_pos identically."""
    enc, dec = HevcCrypto(), HevcCrypto()
    rng = np.random.default_rng(rice * 7 + base)
    for _ in range(500):
        prefix = int(rng.integers(0, 3))
        suffix = int(rng.integers(0, 1 << rice))
        e = xform_remaining_suffix(enc, prefix, suffix, rice, base,
                                   encrypt=True)
        assert 0 <= e < (1 << rice)
        d = xform_remaining_suffix(dec, prefix, e, rice, base, encrypt=False)
        assert d == suffix, (prefix, suffix, e, d)
        assert enc.prev_pos == dec.prev_pos


def test_eg_suffix_roundtrip():
    enc, dec = HevcCrypto(), HevcCrypto()
    rng = np.random.default_rng(3)
    for _ in range(300):
        nbits = int(rng.integers(0, 12))
        suffix = int(rng.integers(0, 1 << nbits)) if nbits else 0
        e = xform_eg_suffix(enc, suffix, nbits, encrypt=True)
        d = xform_eg_suffix(dec, e, nbits, encrypt=False)
        assert d == suffix
        assert enc.prev_pos == dec.prev_pos


def _roundtrip(flags, pattern="IPP", seed=5):
    cfg = EncoderConfig(width=64, height=48, qp=27, rng_seed=seed,
                        encrypt_params=flags, mv_range=48,
                        sign_data_hiding=True)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(42)
    src = make_source(rng, 64, 48)
    recons = []
    for i, t in enumerate(pattern):
        s = [np.roll(p, i, 0) for p in src]
        nal, recon, _ = enc.encode_frame(s, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    return stream, recons


@pytest.mark.parametrize("flags", [
    HEVC_CRYPTO_TRANSF_COEFFS, HEVC_CRYPTO_TRANSF_COEFF_SIGNS,
    HEVC_CRYPTO_MVS, HEVC_CRYPTO_MV_SIGNS, HEVC_CRYPTO_ON])
def test_encrypted_stream_roundtrip(flags):
    stream, recons = _roundtrip(flags)
    dec = Decoder(check_md5=True, encrypt_params=flags)
    frames = dec.decode_stream(stream)
    assert len(frames) == len(recons)
    for f, want in zip(frames, recons):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), want[c])
    assert dec.md5_ok > 0 and dec.md5_fail == 0


def test_encrypted_stream_without_key_is_garbage():
    """The whole point: without the keystream the stream still parses but
    the pictures are scrambled (reference behavior when the key is absent)."""
    stream, recons = _roundtrip(HEVC_CRYPTO_ON)
    dec = Decoder(check_md5=False, encrypt_params=0)
    frames = dec.decode_stream(stream)
    assert len(frames) == len(recons)
    diff = sum(int((np.asarray(f.planes[0]) != want[0]).sum())
               for f, want in zip(frames, recons))
    assert diff > 100, "decoding without the key should corrupt the output"
