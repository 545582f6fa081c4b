"""Long-term reference pictures (spec 8.3.2/8.3.4; hevc_refs.c LT sets).

POC 0 is kept as a slice-signalled long-term ref; checks LT POC resolution
(MSB cycle), RPL construction with LT flags, the LT rules in TMVP/AMVP
(no scaling, lt/st candidate mismatch -> unavailable), and DPB retention.
"""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from tests.util_e2e import make_source, my_decode, oracle_decode, \
    assert_frames_equal


def _encode(seed=13, tmvp=True, pattern="IPPBPP"):
    rng = np.random.default_rng(5)
    enc = Encoder(EncoderConfig(width=96, height=64, qp=30, rng_seed=seed,
                                long_term=True, max_refs=2,
                                temporal_mvp=tmvp, p_intra_in_inter=0.1))
    stream = b"".join(enc.parameter_set_nals())
    recons, plans = [], []
    base = make_source(rng, 96, 64)
    for i, t in enumerate(pattern):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, plan = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
        plans.append(plan)
    return stream, recons, plans


@pytest.mark.parametrize("tmvp", [False, True])
def test_long_term_vs_oracle(tmvp):
    stream, recons, plans = _encode(tmvp=tmvp)
    # LT flag actually present in the reference lists from frame 2 on
    assert any(p.rpl_lt and any(any(l) for l in p.rpl_lt)
               for p in plans[2:])
    mine = my_decode(stream)
    for f, want in zip(mine, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
    oracle = oracle_decode(stream, 96, 64)
    assert_frames_equal(recons, oracle, tag=f"long-term tmvp={tmvp}")


def test_long_term_native():
    stream, recons, _ = _encode()
    dec = Decoder(backend=None, check_md5=True)
    dec.fe.use_native = True
    frames = [f.planes for f in dec.decode_stream(stream)]
    for f, want in zip(frames, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
def test_long_term_tpu_backend():
    from openhevc_tpu.tpu import TpuBackend
    stream, recons, _ = _encode(pattern="IPPP")
    dec = Decoder(backend=TpuBackend(ctb_log2=5), check_md5=True)
    frames = [f.planes for f in dec.decode_stream(stream)]
    for f, want in zip(frames, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
