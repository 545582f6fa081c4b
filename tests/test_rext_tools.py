"""RExt coding tools: persistent Rice adaptation, transform-skip
rotation/context, implicit/explicit RDPCM, transquant bypass,
intra-smoothing-disable, cross-component prediction.

Every stream round-trips through the python walker and is checked
bit-exact against the encoder recon and the reference decoder (oracle)."""

import numpy as np
import pytest

from openhevc_tpu.decoder.frontend import Decoder
from openhevc_tpu.encoder import Encoder, EncoderConfig
from tests.util_e2e import oracle_decode


def _run(cfg_kwargs, frames="IPP", seed=7, w=96, h=64):
    cfmt = cfg_kwargs.get("chroma_format", 1)
    cfg = EncoderConfig(width=w, height=h, rng_seed=seed, **cfg_kwargs)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(seed)
    hs = 1 if cfmt in (1, 2) else 0
    vs = 1 if cfmt == 1 else 0
    base = [rng.integers(0, 256, (h, w)).astype(np.int32),
            rng.integers(0, 256, (h >> vs, w >> hs)).astype(np.int32),
            rng.integers(0, 256, (h >> vs, w >> hs)).astype(np.int32)]
    recons = []
    for i, t in enumerate(frames):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])

    dec = Decoder(check_md5=True)
    out = dec.decode_stream(stream)
    assert len(out) == len(recons) and dec.md5_fail == 0
    for fi, (f, r) in enumerate(zip(out, recons)):
        for c in range(3):
            np.testing.assert_array_equal(
                np.asarray(f.planes[c]), r[c],
                err_msg=f"decoder/encoder frame {fi} plane {c}")

    for fi, (got, want) in enumerate(zip(
            oracle_decode(stream, w, h, chroma=cfmt), recons)):
        for c in range(3):
            np.testing.assert_array_equal(got[c], want[c],
                                          err_msg=f"oracle f{fi} p{c}")
    return stream


def test_persistent_rice():
    _run(dict(persistent_rice=True, transform_skip=True, qp=22))


def test_persistent_rice_wpp():
    # stat_coeff must carry across WPP substreams without reinit
    _run(dict(persistent_rice=True, transform_skip=True, wpp=True, qp=22))


def test_transform_skip_rotation_and_context():
    _run(dict(transform_skip=True, transform_skip_rotation=True,
              transform_skip_context=True, qp=30))


def test_implicit_rdpcm():
    _run(dict(transform_skip=True, implicit_rdpcm=True, qp=30))


def test_transquant_bypass():
    _run(dict(transquant_bypass=0.4, qp=30))


def test_bypass_implicit_rdpcm():
    _run(dict(transquant_bypass=0.4, implicit_rdpcm=True,
              transform_skip=True, qp=30))


def test_explicit_rdpcm():
    _run(dict(explicit_rdpcm=True, transform_skip=True,
              transquant_bypass=0.3, qp=30), frames="IPPP")


def test_intra_smoothing_disabled():
    _run(dict(intra_smoothing_disabled=True, qp=30))


def test_cross_component():
    _run(dict(chroma_format=3, cross_component=True, qp=30), frames="IPP")


def test_chroma_qp_offset_lists():
    # PPS chroma-QP offset lists + per-group cu_chroma_qp_offset TU syntax
    # (hevc.c:1247-1263, applied in dequant hevc_cabac.c:1453-1458)
    _run(dict(chroma_qp_offsets=((2, -2), (5, 1), (-3, 4)), qp=30),
         frames="IPP")


def test_chroma_qp_offset_lists_single_entry():
    # single-entry list: the idx is never coded (hevc.c:1252)
    _run(dict(chroma_qp_offsets=((4, -4),), cu_qp_delta=True, qp=30),
         frames="IPP", seed=9)


def test_rext_parse_only_flags():
    # extended precision / high-precision offsets / CABAC bypass alignment
    # are parse-only in the reference (hevc_ps.c:1920-1959); a stream
    # carrying them must parse and decode identically on both decoders
    cfg = EncoderConfig(width=96, height=64, rng_seed=7, chroma_format=3,
                        transform_skip=True, qp=30)
    enc = Encoder(cfg)
    enc.sps.extended_precision_processing = 1
    enc.sps.high_precision_offsets_enabled = 1
    enc.sps.cabac_bypass_alignment_enabled = 1
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(7)
    base = [rng.integers(0, 256, (64, 96)).astype(np.int32),
            rng.integers(0, 256, (64, 96)).astype(np.int32),
            rng.integers(0, 256, (64, 96)).astype(np.int32)]
    recons = []
    for i, t in enumerate("IP"):
        nal, recon, _ = enc.encode_frame([np.roll(p, i, 0) for p in base], t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])

    dec = Decoder(check_md5=True)
    out = dec.decode_stream(stream)
    assert dec.md5_fail == 0
    sps = dec.fe.sps
    assert sps.extended_precision_processing == 1
    assert sps.high_precision_offsets_enabled == 1
    assert sps.cabac_bypass_alignment_enabled == 1
    for fi, (got, want) in enumerate(zip(
            oracle_decode(stream, 96, 64, chroma=3), recons)):
        for c in range(3):
            np.testing.assert_array_equal(got[c], want[c],
                                          err_msg=f"oracle f{fi} p{c}")


def test_rext_combo():
    _run(dict(chroma_format=3, cross_component=True, transform_skip=True,
              persistent_rice=True, implicit_rdpcm=True,
              explicit_rdpcm=True, transform_skip_rotation=True,
              transform_skip_context=True, transquant_bypass=0.2,
              sign_data_hiding=True, qp=27), frames="IPBP", seed=11)


def _run_native(cfg_kwargs, frames="IPP", seed=7, w=96, h=64):
    """Same streams through the native C front-end."""
    cfmt = cfg_kwargs.get("chroma_format", 1)
    cfg = EncoderConfig(width=w, height=h, rng_seed=seed, **cfg_kwargs)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(seed)
    hs = 1 if cfmt in (1, 2) else 0
    vs = 1 if cfmt == 1 else 0
    base = [rng.integers(0, 256, (h, w)).astype(np.int32),
            rng.integers(0, 256, (h >> vs, w >> hs)).astype(np.int32),
            rng.integers(0, 256, (h >> vs, w >> hs)).astype(np.int32)]
    recons = []
    for i, t in enumerate(frames):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])
    dec = Decoder(check_md5=True, use_native=True)
    out = dec.decode_stream(stream)
    assert len(out) == len(recons) and dec.md5_fail == 0
    for fi, (f, r) in enumerate(zip(out, recons)):
        for c in range(3):
            np.testing.assert_array_equal(
                np.asarray(f.planes[c]), r[c],
                err_msg=f"native frame {fi} plane {c}")


def test_native_persistent_rice_wpp():
    _run_native(dict(persistent_rice=True, transform_skip=True, wpp=True,
                     qp=22))


def test_native_rdpcm_rotation():
    _run_native(dict(transform_skip=True, implicit_rdpcm=True,
                     explicit_rdpcm=True, transform_skip_rotation=True,
                     transform_skip_context=True, transquant_bypass=0.3,
                     qp=30), frames="IPPP")


def test_native_cross_component():
    _run_native(dict(chroma_format=3, cross_component=True, qp=30))


def test_native_chroma_qp_offset_lists():
    _run_native(dict(chroma_qp_offsets=((2, -2), (5, 1), (-3, 4)),
                     cu_qp_delta=True, qp=30), frames="IPP")


def test_native_chroma_qp_offset_lists_wpp():
    _run_native(dict(chroma_qp_offsets=((1, -1), (6, 0)), wpp=True, qp=30),
                frames="IPP", seed=5)


def test_native_rext_combo():
    _run_native(dict(chroma_format=3, cross_component=True,
                     transform_skip=True, persistent_rice=True,
                     implicit_rdpcm=True, explicit_rdpcm=True,
                     transform_skip_rotation=True, transform_skip_context=True,
                     transquant_bypass=0.2, sign_data_hiding=True, qp=27),
                frames="IPBP", seed=11)
