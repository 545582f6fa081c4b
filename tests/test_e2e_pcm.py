"""PCM (I_PCM) end-to-end: encoder stream -> my decoders == reference oracle.

Covers pcm_flag coding (terminate bin + engine flush/realign, spec 9.3.1),
raw sample read-back, the sticky is_pcm no-filter map (reference never
clears it between frames), and intra-in-inter CUs (pred_mode INTRA in P/B
slices), which PCM coverage relies on.
"""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from openhevc_tpu.decoder.plan import IntraOp, PcmOp
from tests.util_e2e import make_source, my_decode, oracle_decode, \
    assert_frames_equal


def _encode(lf_dis, bit_depth=8, pcm_bd=0, seed=909):
    rng = np.random.default_rng(77)
    enc = Encoder(EncoderConfig(width=64, height=64, qp=30, rng_seed=seed,
                                bit_depth=bit_depth, p_pcm=0.5,
                                p_intra_in_inter=0.3,
                                pcm_bit_depth=pcm_bd,
                                pcm_loop_filter_disabled=lf_dis))
    stream = b"".join(enc.parameter_set_nals())
    recons, plans = [], []
    base = make_source(rng, 64, 64, bit_depth=bit_depth)
    for i, t in enumerate("IPBP"):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, plan = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
        plans.append(plan)
    return stream, recons, plans


@pytest.mark.parametrize("lf_dis", [False, True])
def test_pcm_triple_agreement(lf_dis):
    stream, recons, plans = _encode(lf_dis)
    n_pcm = sum(isinstance(o, PcmOp) for p in plans for o in p.ops)
    n_intra_inter = sum(isinstance(o, IntraOp)
                        for p in plans[1:] for o in p.ops)
    assert n_pcm >= 9, "PCM coverage collapsed"
    assert n_intra_inter > 0, "intra-in-inter coverage collapsed"
    mine = my_decode(stream)
    for f, want in zip(mine, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
    oracle = oracle_decode(stream, 64, 64)
    assert_frames_equal(recons, oracle, tag=f"pcm lf_dis={lf_dis}")


def test_pcm_native_frontend():
    stream, recons, _ = _encode(True)
    dec = Decoder(backend=None, check_md5=True)
    dec.fe.use_native = True
    frames = [f.planes for f in dec.decode_stream(stream)]
    for f, want in zip(frames, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
def test_pcm_tpu_backend():
    from openhevc_tpu.tpu import TpuBackend
    stream, recons, _ = _encode(False)
    dec = Decoder(backend=TpuBackend(ctb_log2=5), check_md5=True)
    frames = [f.planes for f in dec.decode_stream(stream)]
    for f, want in zip(frames, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)


def test_pcm_reduced_bit_depth():
    """pcm_sample at pcm_bit_depth < bit_depth (decoder shifts up)."""
    stream, recons, _ = _encode(False, bit_depth=8, pcm_bd=6, seed=31)
    mine = my_decode(stream)
    for f, want in zip(mine, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
    oracle = oracle_decode(stream, 64, 64)
    assert_frames_equal(recons, oracle, tag="pcm 6bit")


def test_pcm_main10():
    stream, recons, _ = _encode(False, bit_depth=10, seed=55)
    mine = my_decode(stream)
    for f, want in zip(mine, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
    oracle = oracle_decode(stream, 64, 64, bit_depth=10)
    assert_frames_equal(recons, oracle, tag="pcm main10")
