"""SHVC 2-layer scalable decode, end-to-end vs the reference oracle.

Streams come from ShvcEncoder (one VPS with the scalability extension,
multilayer EL SPS, IL refs in the EL RPLs); decode goes through ShvcDecoder
and must be bit-exact against both the encoder reconstruction and the
reference decoder built into .oracle/ (whole-frame upsample build — see
tools/build_oracle.sh for why per-PU upsampling is not a valid oracle).

Reference paths exercised: hevc.c:3219-3243 (EL frame start + IL ref),
hevc_refs.c:746-752 (IL_REF0 in the RPS), hevc_refs.c:457-459 (RPL
candidate order), hevc_filter.c:1311 (MV-field upscale for TMVP),
hevcdsp_template.c:2164-2440 (upsampling kernels).
"""

import numpy as np
import pytest

from openhevc_tpu.encoder import EncoderConfig
from openhevc_tpu.encoder.shvc import ShvcEncoder
from openhevc_tpu.decoder.shvc import ShvcDecoder
from openhevc_tpu.ps.params import VPS, SPS, parse_vps, write_vps, \
    parse_sps, write_sps
from openhevc_tpu.ps.layers import make_shvc_vps_ext
from tests.util_e2e import make_source, oracle_decode, have_oracle


def _encode(cfg_bl, cfg_el, pattern="IPPP", seed=42):
    enc = ShvcEncoder(cfg_bl, cfg_el)
    stream = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(seed)
    src_bl = make_source(rng, cfg_bl.width, cfg_bl.height)
    src_el = make_source(rng, cfg_el.width, cfg_el.height)
    bl_recons, el_recons = [], []
    for i, t in enumerate(pattern):
        sb = [np.roll(p, i, 0) for p in src_bl]
        se = [np.roll(p, i, 1) for p in src_el]
        au, rb, re = enc.encode_frame(sb, se, t)
        stream += au
        bl_recons.append([np.asarray(p).astype(np.int32) for p in rb])
        el_recons.append([np.asarray(p).astype(np.int32) for p in re])
    return stream, bl_recons, el_recons


def _check(stream, bl_recons, el_recons, cfg_bl, cfg_el, oracle=True):
    dec = ShvcDecoder(check_md5=True)
    outs = dec.decode_stream(stream)
    assert len(outs[0]) == len(bl_recons)
    assert len(outs[1]) == len(el_recons)
    for i, (f, want) in enumerate(zip(outs[0], bl_recons)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), want[c],
                                          err_msg=f"BL frame {i} plane {c}")
    for i, (f, want) in enumerate(zip(outs[1], el_recons)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), want[c],
                                          err_msg=f"EL frame {i} plane {c}")
    assert dec.md5_fail == 0 and dec.md5_ok > 0
    # reference decoder: highest (EL) layer output
    if oracle and have_oracle():
        frames = oracle_decode(stream, cfg_el.width, cfg_el.height,
                               bit_depth=cfg_el.bit_depth, layer=1)
        assert len(frames) == len(el_recons)
        for i, (got, want) in enumerate(zip(frames, el_recons)):
            for c in range(3):
                np.testing.assert_array_equal(
                    got[c], want[c], err_msg=f"oracle EL frame {i} plane {c}")


def test_shvc_x2_spatial():
    cfg_bl = EncoderConfig(width=48, height=32, qp=30, rng_seed=7)
    cfg_el = EncoderConfig(width=96, height=64, qp=30, rng_seed=11)
    _check(*_encode(cfg_bl, cfg_el), cfg_bl, cfg_el)


def test_shvc_x1_5_spatial():
    cfg_bl = EncoderConfig(width=64, height=32, qp=31, rng_seed=3)
    cfg_el = EncoderConfig(width=96, height=48, qp=29, rng_seed=5)
    _check(*_encode(cfg_bl, cfg_el), cfg_bl, cfg_el)


def test_shvc_snr():
    cfg_bl = EncoderConfig(width=64, height=48, qp=34, rng_seed=13)
    cfg_el = EncoderConfig(width=64, height=48, qp=26, rng_seed=17)
    _check(*_encode(cfg_bl, cfg_el), cfg_bl, cfg_el)


def test_shvc_bframes():
    cfg_bl = EncoderConfig(width=48, height=32, qp=30, rng_seed=19)
    cfg_el = EncoderConfig(width=96, height=64, qp=30, rng_seed=23)
    _check(*_encode(cfg_bl, cfg_el, pattern="IPBPB"), cfg_bl, cfg_el)


def test_shvc_tmvp_through_il_ref():
    """TMVP with the IL ref as collocated picture exercises the upscaled
    motion field (ff_upscale_mv_block) and set_refindex_data's RPL map."""
    cfg_bl = EncoderConfig(width=48, height=32, qp=30, rng_seed=29,
                           temporal_mvp=True)
    cfg_el = EncoderConfig(width=96, height=64, qp=30, rng_seed=31,
                           temporal_mvp=True)
    _check(*_encode(cfg_bl, cfg_el, pattern="IPPPP"), cfg_bl, cfg_el)


def test_shvc_arbitrary_ratio():
    """Non-standard 1.6x/1.5x scaling (DEFAULT-idx kernels).  Vertical
    ratios > 2 are not oracle-testable: the reference's whole-frame chroma
    stage sizes its row loop as max(BL luma h, EL chroma h)>>1
    (hevcdsp_template.c:2313) and reads past the BL chroma plane whenever
    BL height < EL height / 2 — undefined output.  SHM ratios (1.5/2) never
    trip it; our model follows the spec (clamp at the true plane edge)."""
    cfg_bl = EncoderConfig(width=40, height=32, qp=30, rng_seed=37)
    cfg_el = EncoderConfig(width=64, height=48, qp=30, rng_seed=41)
    _check(*_encode(cfg_bl, cfg_el), cfg_bl, cfg_el)


def test_vps_extension_roundtrip():
    v = VPS(max_layers=2, max_layer_id=1, num_layer_sets=2,
            layer_id_included=[[1, 1]])
    v.ext = make_shvc_vps_ext(64, 48, 128, 96)
    v2 = parse_vps(write_vps(v))
    assert v2.ext is not None
    assert v2.ext.rep_formats[1].pic_width == 128
    assert v2.ext.num_direct_ref_layers(1) == 1
    assert v2.ext.max_one_active_ref_layer == 1
    s = SPS(layer_id=1, sps_id=1, vps_id=0)
    s2 = parse_sps(write_sps(s), layer_id=1, vps_list={0: v2})
    assert (s2.width, s2.height) == (128, 96)


def test_single_layer_decoder_ignores_el():
    """A plain (BL-only) decoder fed the 2-layer stream decodes the base
    layer, mirroring the reference's per-decoder layer filter."""
    from openhevc_tpu.decoder.frontend import Decoder
    cfg_bl = EncoderConfig(width=48, height=32, qp=30, rng_seed=7)
    cfg_el = EncoderConfig(width=96, height=64, qp=30, rng_seed=11)
    stream, bl_recons, _ = _encode(cfg_bl, cfg_el, pattern="IPP")
    dec = Decoder(check_md5=False)
    frames = dec.decode_stream(stream)
    assert len(frames) == len(bl_recons)
    for f, want in zip(frames, bl_recons):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(f.planes[c]), want[c])


def _au_split(buf):
    """AU boundaries: layer-0 VCL first slices / parameter sets."""
    scs, i = [], 0
    while True:
        j = buf.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        scs.append(j)
        i = j + 3
    scs.append(len(buf))
    aus, au, has_vcl = [], bytearray(), False
    for k in range(len(scs) - 1):
        s, e = scs[k], scs[k + 1]
        hdr = s + 3
        nal_type = (buf[hdr] >> 1) & 0x3F
        layer = ((buf[hdr] & 1) << 5) | (buf[hdr + 1] >> 3)
        is_vcl = nal_type <= 31
        first = is_vcl and (buf[hdr + 2] >> 7)
        if has_vcl and layer == 0 and (
                (is_vcl and first) or nal_type in (32, 33, 34, 35, 39)):
            aus.append(bytes(au))
            au, has_vcl = bytearray(), False
        au += buf[s:e]
        has_vcl |= is_vcl
    if au:
        aus.append(bytes(au))
    return aus


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
def test_api_layered_decode():
    """SetActiveDecoders/SetViewLayers chain an EL decoder behind the same
    libOpenHevc* handle (openHevcWrapper.c:106-133 parity)."""
    from openhevc_tpu.api import openhevc as api
    cfg_bl = EncoderConfig(width=48, height=32, qp=30, rng_seed=7)
    cfg_el = EncoderConfig(width=96, height=64, qp=30, rng_seed=11)
    stream, _, el_recons = _encode(cfg_bl, cfg_el)
    h = api.libOpenHevcInit(1, 1)
    api.libOpenHevcSetActiveDecoders(h, 1)
    api.libOpenHevcSetViewLayers(h, 1)
    api.libOpenHevcSetCheckMD5(h, 1)
    h._backend_kind = "np"
    api.libOpenHevcStartDecoder(h)
    got_frames = []
    for au in _au_split(stream):
        if api.libOpenHevcDecode(h, au, len(au)) > 0:
            fr = api.libOpenHevcGetOutput(h)
            got_frames.append(fr)
    while api.libOpenHevcDecode(h, b"", 0) > 0:
        got_frames.append(api.libOpenHevcGetOutput(h))
    assert len(got_frames) == len(el_recons)
    for fr, want in zip(got_frames, el_recons):
        assert (fr.frameInfo.nWidth, fr.frameInfo.nHeight) == (96, 64)
        np.testing.assert_array_equal(fr.pvY.astype(np.int32), want[0])
    assert h._el.md5_fail == 0 and h._el.md5_ok > 0
    api.libOpenHevcClose(h)


def test_cli_shvc_layer(tmp_path):
    import os
    import subprocess
    import sys as _sys
    from tests.conftest import cpu_subprocess_env
    cfg_bl = EncoderConfig(width=48, height=32, qp=30, rng_seed=7)
    cfg_el = EncoderConfig(width=96, height=64, qp=30, rng_seed=11)
    stream, _, el_recons = _encode(cfg_bl, cfg_el, pattern="IPP")
    inp = tmp_path / "two_layer.265"
    outp = tmp_path / "el.yuv"
    inp.write_bytes(stream)
    r = subprocess.run(
        [_sys.executable, "-m", "openhevc_tpu.cli", "-i", str(inp),
         "-o", str(outp), "-n", "-l", "1", "-b", "np"],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=cpu_subprocess_env())
    assert r.returncode == 0, r.stderr
    assert "frame= 3" in r.stdout
    data = np.fromfile(outp, np.uint8)
    want = np.concatenate([np.concatenate([p.ravel() for p in fr])
                           for fr in el_recons]).astype(np.uint8)
    np.testing.assert_array_equal(data, want)


def test_shvc_main10():
    """Main-10 two-layer decode: 10-bit upsampling (shift1/shift2 change,
    hevcdsp_template.c:2164) + 10-bit IL ref path.

    Not oracle-testable: the reference build aborts on 10-bit EL
    allocation (av_malloc pixel-size assertion, libavutil/mem.c:226), so
    the check is encoder-recon bit-exactness + embedded MD5."""
    cfg_bl = EncoderConfig(width=48, height=32, qp=30, rng_seed=37,
                           bit_depth=10)
    cfg_el = EncoderConfig(width=96, height=64, qp=30, rng_seed=41,
                           bit_depth=10)
    _check(*_encode(cfg_bl, cfg_el, pattern="IPP"), cfg_bl, cfg_el,
           oracle=False)
