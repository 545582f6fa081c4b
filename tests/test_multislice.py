"""Multi-slice pictures: several independent slice segments per frame.

Covers open-ended slice CTB ranges (end_of_slice_segment_flag driven),
per-slice CABAC/QP state resets, slice-boundary neighbor availability
(reference hls_slice_data / hls_decode_entry, hevc.c:3017/2644), and the
deferred picture emission in the frontend (a picture completes only when
all its slices are in).
"""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from tests.util_e2e import make_source, my_decode, oracle_decode, \
    assert_frames_equal


def _encode(slices, seed=11, w=64, h=64, **kw):
    rng = np.random.default_rng(5)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=30, rng_seed=seed,
                                slices=slices, p_intra_in_inter=0.2, **kw))
    stream = b"".join(enc.parameter_set_nals())
    recons = []
    base = make_source(rng, w, h)
    for i, t in enumerate("IPB"):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    return stream, recons


@pytest.mark.parametrize("slices", [2, 3])
def test_multislice_vs_oracle(slices):
    stream, recons = _encode(slices)
    mine = my_decode(stream)
    assert len(mine) == 3
    for f, want in zip(mine, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
    oracle = oracle_decode(stream, 64, 64)
    assert_frames_equal(recons, oracle, tag=f"slices={slices}")


def test_multislice_qp_delta_sao():
    stream, recons = _encode(3, seed=77, w=96, h=64, cu_qp_delta=True,
                             sao=True)
    mine = my_decode(stream)
    for f, want in zip(mine, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
    oracle = oracle_decode(stream, 96, 64)
    assert_frames_equal(recons, oracle, tag="slices+qpd+sao")


def test_multislice_native():
    stream, recons = _encode(3, seed=77, w=96, h=64, sao=True)
    dec = Decoder(backend=None, check_md5=True)
    dec.fe.use_native = True
    frames = [f.planes for f in dec.decode_stream(stream)]
    for f, want in zip(frames, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
def test_multislice_tpu_backend():
    from openhevc_tpu.tpu import TpuBackend
    stream, recons = _encode(2)
    dec = Decoder(backend=TpuBackend(ctb_log2=5), check_md5=True)
    frames = [f.planes for f in dec.decode_stream(stream)]
    for f, want in zip(frames, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)


def test_dependent_slices():
    """Dependent slice segments: header inheritance + CABAC context
    carry-over (reference ff_hevc_cabac_init, hevc_cabac.c:606)."""
    rng = np.random.default_rng(5)
    enc = Encoder(EncoderConfig(width=96, height=64, qp=30, rng_seed=21,
                                slices=3, dependent_slices=True,
                                p_intra_in_inter=0.2, sao=True))
    stream = b"".join(enc.parameter_set_nals())
    recons = []
    base = make_source(rng, 96, 64)
    for i, t in enumerate("IPB"):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    mine = my_decode(stream)
    for f, want in zip(mine, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
    oracle = oracle_decode(stream, 96, 64)
    assert_frames_equal(recons, oracle, tag="dependent slices")
    dec = Decoder(backend=None, check_md5=True)
    dec.fe.use_native = True
    frames = [f.planes for f in dec.decode_stream(stream)]
    for f, want in zip(frames, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)


# ---------------------------------------------------------------------------
# per-slice filter parameters + slice-boundary masking (round 2)
# ---------------------------------------------------------------------------

def _slice_filter_stream(seed, slices=3, across=False, sao=True,
                         dependent=False, pattern="IPP", w=96, h=64):
    from openhevc_tpu.encoder import Encoder, EncoderConfig
    from tests.util_e2e import make_source
    cfg = EncoderConfig(width=w, height=h, qp=30, rng_seed=seed,
                        slices=slices, sao=sao, across_slices=across,
                        dependent_slices=dependent,
                        slice_filter_variants=True)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(seed)
    src = make_source(rng, w, h)
    recons = []
    for i, t in enumerate(pattern):
        s = [np.roll(p, i, 0) for p in src]
        nal, recon, _ = enc.encode_frame(s, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    return stream, recons


@pytest.mark.parametrize("across", [False, True])
@pytest.mark.parametrize("use_native", [False, True])
def test_slice_filter_variants(across, use_native):
    """Per-slice deblock offsets/disable + SAO enables + (optionally)
    loop_filter_across_slices=0 boundary masking, vs the reference
    (hevc.c:2677 deblock[ctb] fill; sao_filter_CTB edge restrictions)."""
    from openhevc_tpu.decoder.frontend import Decoder
    from tests.util_e2e import oracle_decode
    stream, recons = _slice_filter_stream(11 if across else 13, across=across)
    dec = Decoder(check_md5=True, use_native=use_native)
    frames = dec.decode_stream(stream)
    for i, (f, want) in enumerate(zip(frames, recons)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), want[c],
                                          err_msg=f"frame {i} plane {c}")
    for i, (got, want) in enumerate(zip(oracle_decode(stream, 96, 64),
                                        recons)):
        for c in range(3):
            np.testing.assert_array_equal(got[c], want[c],
                                          err_msg=f"oracle f{i} p{c}")


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
def test_slice_filter_variants_tpu_backend():
    """The fused TPU frame_step applies per-CTB deblock offset maps and the
    SAO boundary-restore mask bit-exactly."""
    from openhevc_tpu.decoder.frontend import Decoder
    from openhevc_tpu.tpu import TpuBackend
    stream, recons = _slice_filter_stream(17, across=False)
    dec = Decoder(check_md5=True, backend=TpuBackend())
    frames = dec.decode_stream(stream)
    for i, (f, want) in enumerate(zip(frames, recons)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), want[c],
                                          err_msg=f"tpu frame {i} plane {c}")


@pytest.mark.parametrize("kw", [dict(wpp=True), dict(tiles=(2, 2)),
                                dict(wpp=True, tiles=(2, 2))])
def test_multislice_with_substreams(kw):
    """Multi-slice pictures whose slices carry WPP rows / tiles /
    WPP-in-tiles substreams (slice cuts align to substream starts;
    hls_decode_entry_wpp decodes num_entry_point_offsets+1 rows per
    slice, hevc.c:2751-2832).  Round-3 gap: the encoder asserted this
    combination away, so the decoder paths were never exercised."""
    stream, recons = _encode(3, seed=88, w=128, h=96, sao=True, **kw)
    mine = my_decode(stream)
    for f, want in zip(mine, recons):
        for p, q in zip(f, want):
            np.testing.assert_array_equal(np.asarray(p), q)
    oracle = oracle_decode(stream, 128, 96)
    assert_frames_equal(recons, oracle, tag=f"slices+{kw}")
    # native front-end agrees with the python walker (and the recon)
    dec = Decoder(check_md5=True, use_native=True)
    frames = dec.decode_stream(stream)
    assert dec.md5_fail == 0 and dec.md5_ok > 0
    for f, want in zip(frames, recons):
        for p, q in zip(f.planes, want):
            np.testing.assert_array_equal(np.asarray(p), q)


def test_multislice_wpp_parallel_parse():
    """threads>1 on a multi-slice WPP picture: the first slice may take
    the host-parallel row pool, later slices the serial loop."""
    stream, recons = _encode(2, seed=89, w=128, h=96, wpp=True)
    dec = Decoder(check_md5=True, use_native=True)
    dec.fe.parse_threads = 4
    frames = dec.decode_stream(stream)
    assert dec.md5_fail == 0
    for f, want in zip(frames, recons):
        for p, q in zip(f.planes, want):
            np.testing.assert_array_equal(np.asarray(p), q)
