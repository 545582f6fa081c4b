"""Fused Pallas deblock+SAO vs the XLA-HLO reference path (bit-exact).

The XLA path (tpu/deblock.py + tpu/sao.py) is itself oracle-verified, so
equality here certifies the fused kernel (tpu/filter_pallas.py) without
hardware.  Runs in Pallas interpret mode on CPU."""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from openhevc_tpu.tpu import deblock as dbk
from openhevc_tpu.tpu.sao import sao_plane
from openhevc_tpu.tpu import filter_pallas as fp

_QP_C = jnp.asarray([29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37],
                    jnp.int32)


def _rand_maps(rng, H, W):
    vbs = rng.integers(0, 3, (H // 4, W // 8)).astype(np.int32)
    hbs = rng.integers(0, 3, (H // 8, W // 4)).astype(np.int32)
    qp = rng.integers(20, 45, (H // 8, W // 8)).astype(np.int32)
    nfm = (rng.random((H // 4, W // 4)) < 0.05).astype(np.int32)
    return vbs, hbs, qp, nfm


def _rand_sao(rng, gr, gc):
    tm = rng.integers(0, 3, (gr, gc)).astype(np.int32)
    bm = rng.integers(0, 32, (gr, gc)).astype(np.int32)
    em = rng.integers(0, 4, (gr, gc)).astype(np.int32)
    om = rng.integers(-7, 8, (gr, gc, 5)).astype(np.int32)
    return tm, bm, em, om


def _expand(g, csy, csx, H, W):
    gh, gw = g.shape[:2]
    tail = g.shape[2:]
    e = np.broadcast_to(g[:, None, :, None],
                        (gh, csy, gw, csx) + tail)
    return e.reshape((gh * csy, gw * csx) + tail)[:H, :W]


@pytest.mark.parametrize("bd,H,W", [(8, 96, 160), (10, 64, 320),
                                    (8, 72, 136)])
def test_fused_luma(bd, H, W):
    rng = np.random.default_rng(bd * 1000 + W)
    Hp = -(-H // 16) * 16
    Wp0 = -(-W // 16) * 16
    plane = rng.integers(0, 1 << bd, (H, W)).astype(np.int32)
    vbs, hbs, qp, nfm = _rand_maps(rng, Hp, Wp0)
    ctb = 64
    gr, gc = -(-H // ctb), -(-W // ctb)
    tm, bm, em, om = _rand_sao(rng, gr, gc)

    # XLA ground truth (the frame_step stage, verbatim)
    luma = jnp.pad(jnp.asarray(plane), ((0, Hp - H), (0, Wp0 - W)))
    luma = dbk.deblock_luma_vertical(luma, vbs, qp, 0, 0, nfm, bd)
    luma = dbk.deblock_luma_horizontal(luma, hbs, qp, 0, 0, nfm, bd)
    pre = np.asarray(luma)[:H, :W]
    want = np.asarray(sao_plane(
        jnp.asarray(pre), jnp.asarray(_expand(tm, ctb, ctb, H, W)),
        jnp.asarray(_expand(bm, ctb, ctb, H, W)),
        jnp.asarray(_expand(em, ctb, ctb, H, W)),
        jnp.asarray(_expand(om, ctb, ctb, H, W)), bd))

    vg, hg = fp.build_luma_grids(jnp.asarray(vbs), jnp.asarray(hbs),
                                 jnp.asarray(qp), 0, 0, jnp.asarray(nfm),
                                 bd, Hp, Wp0)
    om5 = jnp.asarray(om).transpose(0, 2, 1)      # (gr, 5, gc)
    got = np.asarray(fp.fused_filter_plane(
        jnp.asarray(plane), vg, hg,
        (jnp.asarray(tm), jnp.asarray(bm), jnp.asarray(em), om5), None,
        luma=True, bd=bd, deblock_on=True, sao_on=True, csx=ctb, csy=ctb,
        H=H, W=W, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("four20", [True, False])
def test_fused_chroma(four20):
    bd = 8
    rng = np.random.default_rng(7 if four20 else 8)
    # luma geometry 128x192; chroma half in 4:2:0, full in 4:4:4
    HL, WL = 128, 192
    hsub = vsub = 2 if four20 else 1
    Hc, Wc = HL // vsub, WL // hsub
    plane = rng.integers(0, 256, (Hc, Wc)).astype(np.int32)
    vbs, hbs, qp, nfm = _rand_maps(rng, HL, WL)
    vbs[:] = rng.integers(0, 3, vbs.shape)        # need bs==2 cells
    ctb = 64
    csx, csy = ctb // hsub, ctb // vsub
    gr, gc = -(-Hc // csy), -(-Wc // csx)
    tm, bm, em, om = _rand_sao(rng, gr, gc)
    qp_off = 1

    pl_ = jnp.asarray(plane)
    pl_ = dbk.deblock_chroma_vertical(pl_, jnp.asarray(vbs), jnp.asarray(qp),
                                      qp_off, 0, jnp.asarray(nfm), _QP_C, bd,
                                      hsub=hsub, vsub=vsub, four20=four20)
    pl_ = dbk.deblock_chroma_horizontal(pl_, jnp.asarray(hbs),
                                        jnp.asarray(qp), qp_off, 0,
                                        jnp.asarray(nfm), _QP_C, bd,
                                        hsub=hsub, vsub=vsub, four20=four20)
    pre = np.asarray(pl_)
    want = np.asarray(sao_plane(
        jnp.asarray(pre), jnp.asarray(_expand(tm, csy, csx, Hc, Wc)),
        jnp.asarray(_expand(bm, csy, csx, Hc, Wc)),
        jnp.asarray(_expand(em, csy, csx, Hc, Wc)),
        jnp.asarray(_expand(om, csy, csx, Hc, Wc)), bd))

    vg, hg = fp.build_chroma_grids(
        jnp.asarray(vbs), jnp.asarray(hbs), jnp.asarray(qp), qp_off, 0, 0,
        jnp.asarray(nfm), _QP_C, bd, Hc, Wc, hsub, vsub, four20)
    om5 = jnp.asarray(om).transpose(0, 2, 1)
    got = np.asarray(fp.fused_filter_plane(
        jnp.asarray(plane), vg, hg,
        (jnp.asarray(tm), jnp.asarray(bm), jnp.asarray(em), om5), None,
        luma=False, bd=bd, deblock_on=True, sao_on=True, csx=csx, csy=csy,
        H=Hc, W=Wc, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fused_restore_and_flags():
    """SAO restore mask + deblock-only + sao-only variants."""
    bd = 8
    rng = np.random.default_rng(11)
    H, W = 96, 160
    Hp, Wp0 = 96, 160
    plane = rng.integers(0, 256, (H, W)).astype(np.int32)
    vbs, hbs, qp, nfm = _rand_maps(rng, Hp, Wp0)
    ctb = 64
    gr, gc = -(-H // ctb), -(-W // ctb)
    tm, bm, em, om = _rand_sao(rng, gr, gc)
    restore = (rng.random((H, W)) < 0.1).astype(np.int8)

    luma = dbk.deblock_luma_vertical(jnp.asarray(plane), vbs, qp, 0, 0,
                                     nfm, bd)
    luma = dbk.deblock_luma_horizontal(luma, hbs, qp, 0, 0, nfm, bd)
    pre = np.asarray(luma)
    filt = np.asarray(sao_plane(
        jnp.asarray(pre), jnp.asarray(_expand(tm, ctb, ctb, H, W)),
        jnp.asarray(_expand(bm, ctb, ctb, H, W)),
        jnp.asarray(_expand(em, ctb, ctb, H, W)),
        jnp.asarray(_expand(om, ctb, ctb, H, W)), bd))
    want = np.where(restore.astype(bool), pre, filt)

    vg, hg = fp.build_luma_grids(jnp.asarray(vbs), jnp.asarray(hbs),
                                 jnp.asarray(qp), 0, 0, jnp.asarray(nfm),
                                 bd, Hp, Wp0)
    om5 = jnp.asarray(om).transpose(0, 2, 1)
    got = np.asarray(fp.fused_filter_plane(
        jnp.asarray(plane), vg, hg,
        (jnp.asarray(tm), jnp.asarray(bm), jnp.asarray(em), om5),
        jnp.asarray(restore),
        luma=True, bd=bd, deblock_on=True, sao_on=True, csx=ctb, csy=ctb,
        H=H, W=W, interpret=True))
    np.testing.assert_array_equal(got, want)

    # deblock only
    got = np.asarray(fp.fused_filter_plane(
        jnp.asarray(plane), vg, hg, None, None,
        luma=True, bd=bd, deblock_on=True, sao_on=False, csx=ctb, csy=ctb,
        H=H, W=W, interpret=True))
    np.testing.assert_array_equal(got, pre)

    # sao only
    got = np.asarray(fp.fused_filter_plane(
        jnp.asarray(plane), None, None,
        (jnp.asarray(tm), jnp.asarray(bm), jnp.asarray(em), om5), None,
        luma=True, bd=bd, deblock_on=False, sao_on=True, csx=ctb, csy=ctb,
        H=H, W=W, interpret=True))
    want2 = np.asarray(sao_plane(
        jnp.asarray(plane), jnp.asarray(_expand(tm, ctb, ctb, H, W)),
        jnp.asarray(_expand(bm, ctb, ctb, H, W)),
        jnp.asarray(_expand(em, ctb, ctb, H, W)),
        jnp.asarray(_expand(om, ctb, ctb, H, W)), bd))
    np.testing.assert_array_equal(got, want2)


@pytest.mark.slow
@pytest.mark.parametrize("slices", [1, 2])
def test_fused_e2e_interpret(monkeypatch, slices):
    """Deblock+SAO through the fused kernel inside the real frame_step
    (OPENHEVC_FFILT=interp), bit-exact vs the encoder recon.  slices=2
    exercises the per-CTB beta/tc offset maps ("map" path)."""
    from openhevc_tpu.encoder import Encoder, EncoderConfig
    from openhevc_tpu.decoder.frontend import Decoder
    from openhevc_tpu.tpu import TpuBackend

    monkeypatch.setenv("OPENHEVC_FFILT", "interp")
    cfg = EncoderConfig(width=96, height=96, qp=34, rng_seed=9, log2_ctb=5,
                        sao=True, deblock=True, slices=slices,
                        slice_filter_variants=(slices > 1))
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(4)
    base = [rng.integers(0, 256, (96, 96)).astype(np.int32),
            rng.integers(0, 256, (48, 48)).astype(np.int32),
            rng.integers(0, 256, (48, 48)).astype(np.int32)]
    recons = []
    for i, t in enumerate("IPP"):
        src = [np.roll(p, i, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t)
        stream += nal
        recons.append([np.asarray(p).copy() for p in recon])

    dec = Decoder(backend=TpuBackend())
    frames = dec.decode_stream(stream)
    assert len(frames) == len(recons)
    for fi, (f, r) in enumerate(zip(frames, recons)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), r[c],
                                          err_msg=f"fused f{fi} p{c}")
