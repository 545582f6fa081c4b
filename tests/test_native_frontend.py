"""Native (C++) front-end must match the Python front-end op-for-op."""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Frontend
from openhevc_tpu.decoder.refs import DPB, Frame
from tests.util_e2e import make_source


def _plans(stream, native, with_dpb_frames=None, threads=1):
    fe = Frontend(dpb=DPB(), use_native=native, parse_threads=threads)
    plans = []
    from openhevc_tpu.bitstream.nal import split_annexb
    from openhevc_tpu.bitstream import nal as nalmod

    def finish():
        plan = fe.end_picture()
        if plan is not None:
            plans.append(plan)
            # register a stub frame so TMVP has collocated motion
            fe.dpb.add(Frame(poc=plan.poc, planes=None,
                             mvf_mv=plan.mvf_mv, mvf_poc=plan.mvf_poc,
                             mvf_pred=plan.mvf_pred,
                             mvf_ref_idx=plan.mvf_ref_idx,
                             rpl=plan.rpl, rpl_lt=plan.rpl_lt))

    for nal in split_annexb(stream):
        if nalmod.is_vcl(nal.type) and (nal.rbsp[0] >> 7):
            finish()            # complete the previous picture first
        fe.decode_nal(nal)
    finish()
    return plans


def _diff(pa, pb):
    assert len(pa) == len(pb)
    for f, (a, b) in enumerate(zip(pa, pb)):
        assert len(a.ops) == len(b.ops), (f, len(a.ops), len(b.ops))
        for i, (x, y) in enumerate(zip(a.ops, b.ops)):
            for k, va in x.__dict__.items():
                vb = y.__dict__[k]
                if isinstance(va, np.ndarray):
                    assert (va == vb).all(), (f, i, type(x).__name__, k)
                else:
                    assert va == vb, (f, i, type(x).__name__, k, va, vb)
        assert (a.vertical_bs == b.vertical_bs).all()
        assert (a.horizontal_bs == b.horizontal_bs).all()
        assert (a.qp_map == b.qp_map).all()
        assert (a.mvf_pred == b.mvf_pred).all()
        assert (np.asarray(a.no_filter_map) == np.asarray(b.no_filter_map)).all()
        if a.sao:
            for k in a.sao:
                for fld in ("sao_type", "sao_band_position", "sao_eo_class",
                            "sao_offsets"):
                    assert (np.asarray(getattr(a.sao[k], fld)) ==
                            np.asarray(getattr(b.sao[k], fld))).all()


def _run(cfg, pattern, seed):
    rng = np.random.default_rng(seed)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, cfg.width, cfg.height, cfg.bit_depth)
    for i, t in enumerate(pattern):
        src = [np.roll(p, i, 0) for p in base]
        nal, _, _ = enc.encode_frame(src, t)
        stream += nal
    _diff(_plans(stream, False), _plans(stream, True))


def test_native_intra():
    _run(EncoderConfig(width=64, height=64, qp=28, rng_seed=81), "I", 1)


def test_native_inter_sao():
    _run(EncoderConfig(width=96, height=64, qp=31, sao=True, rng_seed=82),
         "IPPB", 2)


def test_native_tmvp():
    _run(EncoderConfig(width=64, height=64, qp=30, temporal_mvp=True,
                       rng_seed=83), "IPPP", 3)


def test_native_main10_tskip():
    _run(EncoderConfig(width=64, height=64, qp=33, bit_depth=10,
                       transform_skip=True, rng_seed=84), "IP", 4)


def test_native_sign_hiding_nxn():
    _run(EncoderConfig(width=64, height=64, qp=24, sign_data_hiding=True,
                       p_nxn=0.8, p_split=0.8, rng_seed=85), "IP", 5)


def test_native_wpp():
    _run(EncoderConfig(width=128, height=96, qp=30, wpp=True, sao=True,
                       rng_seed=86), "IPP", 6)


def test_native_wpp_parallel():
    """Host-parallel WPP substream decode must be byte-identical to the
    serial walk (reference analog: hls_decode_entry_wpp, hevc.c:2751)."""
    cfg = EncoderConfig(width=192, height=160, qp=30, wpp=True, sao=True,
                        temporal_mvp=True, rng_seed=87)
    rng = np.random.default_rng(7)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, cfg.width, cfg.height, cfg.bit_depth)
    for i, t in enumerate("IPBP"):
        src = [np.roll(p, i, 0) for p in base]
        nal, _, _ = enc.encode_frame(src, t)
        stream += nal
    serial = _plans(stream, True)
    for threads in (2, 4):
        par = _plans(stream, True, threads=threads)
        for a, b in zip(serial, par):
            assert (np.asarray(a.soa["intra"]) ==
                    np.asarray(b.soa["intra"])).all()
            assert (np.asarray(a.soa["resid"]) ==
                    np.asarray(b.soa["resid"])).all()
            assert (np.asarray(a.soa["inter"]) ==
                    np.asarray(b.soa["inter"])).all()
            assert (a.raw_levels == b.raw_levels).all()
            assert (a.vertical_bs == b.vertical_bs).all()
            assert (a.horizontal_bs == b.horizontal_bs).all()
            assert (a.qp_map == b.qp_map).all()
            assert (a.mvf_mv == b.mvf_mv).all()
            assert (a.mvf_poc == b.mvf_poc).all()
        _diff(serial, par)


def test_native_tiles():
    _run(EncoderConfig(width=128, height=96, qp=30, tiles=(2, 2),
                       rng_seed=87), "IP", 7)


def test_native_weighted_pred():
    _run(EncoderConfig(width=96, height=64, qp=30, weighted_pred=True,
                       rng_seed=88), "IPPB", 8)


def test_native_cu_qp_delta():
    _run(EncoderConfig(width=96, height=64, qp=30, cu_qp_delta=True,
                       rng_seed=89), "IPP", 9)


def test_native_cu_qp_delta_wpp():
    _run(EncoderConfig(width=96, height=96, qp=33, cu_qp_delta=True, wpp=True,
                       rng_seed=90), "IP", 10)


def test_native_wpp_parallel_1ctb_wide():
    """1-CTB-wide WPP pictures never write the row snapshot (it is saved
    at a row's 2nd CTB, hevc_cabac.c save_states w>1 rule), so each row
    re-inits: the host-parallel path must not load a snapshot there.
    Regression: parallel decode used ctx_load=1 unconditionally and read
    a zero-filled context table."""
    cfg = EncoderConfig(width=32, height=256, qp=30, wpp=True, log2_ctb=5,
                        sao=True, rng_seed=91)
    rng = np.random.default_rng(91)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, cfg.width, cfg.height, cfg.bit_depth)
    for i, t in enumerate("IP"):
        src = [np.roll(p, i, 0) for p in base]
        nal, _, _ = enc.encode_frame(src, t)
        stream += nal
    py = _plans(stream, False)
    for threads in (1, 4):
        _diff(py, _plans(stream, True, threads=threads))


def test_native_wpp_parallel_overflow_fallback(monkeypatch):
    """A failed parallel WPP attempt (a dense row overflowing its equal
    per-row ops/levels carve returns err 5) must fall back to the serial
    substream loop and still produce the exact op stream — even though
    the attempt partially scribbled the per-picture buffers."""
    import openhevc_tpu.native as native
    cfg = EncoderConfig(width=192, height=160, qp=30, wpp=True, sao=True,
                        temporal_mvp=True, rng_seed=87)
    rng = np.random.default_rng(7)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, cfg.width, cfg.height, cfg.bit_depth)
    for i, t in enumerate("IPBP"):
        src = [np.roll(p, i, 0) for p in base]
        nal, _, _ = enc.encode_frame(src, t)
        stream += nal
    serial = _plans(stream, True)

    pics = []
    real_alloc = native.alloc_pic_buffers

    def spy_alloc(*a, **k):
        pic = real_alloc(*a, **k)
        pics.append(pic)
        return pic

    real_get_lib = native.get_lib

    class FailingWpp:
        _wpp_ready = True

        def __init__(self, lib):
            self._lib = lib

        def __getattr__(self, k):
            return getattr(self._lib, k)

        def decode_substreams_wpp(self, *args):
            pic = pics[-1]
            for k in ("mvf_mv", "mvf_poc", "mvf_pred", "mvf_ref_idx",
                      "vbs", "hbs", "qp_y_tab", "pcm_map", "sao_out",
                      "cbf_luma", "scratch", "ctx_io"):
                pic[k][...] = 1          # simulate partial writes
            return 5                     # err 5: per-row carve overflow

    monkeypatch.setattr(native, "alloc_pic_buffers", spy_alloc)
    monkeypatch.setattr(native, "get_lib",
                        lambda: FailingWpp(real_get_lib()))
    par = _plans(stream, True, threads=4)
    monkeypatch.undo()
    _diff(serial, par)


def test_native_amp():
    """AMP part modes through the C front-end vs the Python walker."""
    _run(EncoderConfig(width=96, height=96, qp=30, amp=True, p_amp=0.8,
                       p_skip=0.1, log2_ctb=6, rng_seed=92), "IPP", 12)
