import random

import pytest

from openhevc_tpu.bitstream import (BitReader, BitWriter, split_annexb,
                                    extract_rbsp, escape_rbsp)
from openhevc_tpu.bitstream.nal import write_nal, parse_nal_header


def test_bitrw_roundtrip_fixed():
    w = BitWriter()
    w.u(0b101, 3)
    w.u(0xDEAD, 16)
    w.u1(1)
    w.u(0, 4)
    w.rbsp_trailing_bits()
    data = w.get_bytes()
    r = BitReader(data)
    assert r.u(3) == 0b101
    assert r.u(16) == 0xDEAD
    assert r.u1() == 1
    assert r.u(4) == 0


def test_bitrw_roundtrip_random():
    rng = random.Random(0)
    fields = [(rng.randrange(1, 25),) for _ in range(500)]
    vals = [rng.randrange(0, 1 << n) for (n,) in fields]
    w = BitWriter()
    for (n,), v in zip(fields, vals):
        w.u(v, n)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for (n,), v in zip(fields, vals):
        assert r.u(n) == v


def test_golomb_roundtrip():
    rng = random.Random(1)
    ue_vals = [0, 1, 2, 3, 7, 8, 255, 65534] + [rng.randrange(0, 100000) for _ in range(200)]
    se_vals = [0, 1, -1, 2, -2, 32767, -32768] + [rng.randrange(-100000, 100000) for _ in range(200)]
    w = BitWriter()
    for v in ue_vals:
        w.ue(v)
    for v in se_vals:
        w.se(v)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for v in ue_vals:
        assert r.ue() == v
    for v in se_vals:
        assert r.se() == v


def test_golomb_known_codes():
    # H.265 9.2: ue(v) codeword table
    w = BitWriter()
    w.ue(0)  # '1'
    w.ue(1)  # '010'
    w.ue(2)  # '011'
    w.ue(3)  # '00100'
    w.u(0, 4)  # pad to 16 bits
    data = w.get_bytes()
    assert data[0] == 0b10100110
    assert data[1] == 0b01000000


def test_epb_escape_roundtrip():
    rng = random.Random(2)
    for _ in range(50):
        raw = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in range(rng.randrange(0, 64)))
        esc = escape_rbsp(raw)
        # escaped stream must not contain 00 00 0x with x<=3 untreated
        assert b"\x00\x00\x00" not in esc
        assert b"\x00\x00\x01" not in esc
        assert b"\x00\x00\x02" not in esc
        un, _ = extract_rbsp(esc)
        assert un == raw


def test_nal_roundtrip():
    rbsp = bytes([0, 0, 1, 0, 0, 2, 0, 0, 0, 0, 3, 65])
    nal = write_nal(33, rbsp, layer_id=0, temporal_id=0)
    nals = split_annexb(nal + write_nal(34, b"\x55"))
    assert len(nals) == 2
    assert nals[0].type == 33
    assert nals[0].rbsp == rbsp
    assert nals[1].type == 34
    assert nals[1].rbsp == b"\x55"


def test_nal_header():
    t, lid, tid = parse_nal_header(bytes([33 << 1, 1]))
    assert (t, lid, tid) == (33, 0, 0)
    t, lid, tid = parse_nal_header(bytes([(19 << 1) | 0, (5 << 3) | 3]))
    assert (t, lid, tid) == (19, 5, 2)


def test_vui_parse():
    """VUI fields parse and the SPS range extension behind them stays
    reachable (reference decode_vui, hevc_ps.c:1235)."""
    from openhevc_tpu.ps.params import parse_vui
    w = BitWriter()
    w.u1(1); w.u(255, 8); w.u(4, 16); w.u(3, 16)    # extended SAR 4:3
    w.u1(0)                                          # overscan
    w.u1(1); w.u(1, 3); w.u1(1); w.u1(1)             # video signal + colour
    w.u(9, 8); w.u(14, 8); w.u(9, 8)
    w.u1(0)                                          # chroma loc
    w.u1(0); w.u1(0); w.u1(1)                        # frame_field_info on
    w.u1(1); w.ue(1); w.ue(2); w.ue(3); w.ue(4)      # default display window
    w.u1(1); w.u(1001, 32); w.u(60000, 32); w.u1(0)  # timing, no hrd
    w.u1(0)
    w.u1(1); w.u(0, 3); w.ue(0); w.ue(0); w.ue(0)    # bitstream restriction
    w.ue(10); w.ue(11)
    w.rbsp_trailing_bits()
    v = parse_vui(BitReader(w.get_bytes()), max_sub_layers=1)
    assert (v.sar_num, v.sar_den) == (4, 3)
    assert v.colour_primaries == 9 and v.matrix_coeffs == 9
    assert v.frame_field_info_present == 1
    assert v.def_disp_win == (2, 4, 6, 8)
    assert (v.num_units_in_tick, v.time_scale) == (1001, 60000)
    assert v.log2_max_mv_length_horizontal == 10
    assert v.log2_max_mv_length_vertical == 11


def test_sei_types_parse():
    """frame_packing / pic_timing / active_parameter_sets SEIs parse like
    the reference (hevc_sei.c:52-180) and hash SEIs still work after."""
    from openhevc_tpu.decoder.sei import parse_sei
    from openhevc_tpu.bitstream import nal as nalmod
    from openhevc_tpu.ps.params import SPS, VUI

    def payload(ptype, bits):
        w = BitWriter()
        w.u(ptype, 8)
        body = bits.get_bytes()
        w.u(len(body), 8)
        for b in body:
            w.u(b, 8)
        w.rbsp_trailing_bits()
        return w.get_bytes()

    # frame packing: type 3 side-by-side
    b = BitWriter()
    b.ue(7); b.u1(0)                # id, not cancelled
    b.u(3, 7); b.u1(0); b.u(0, 6)   # type 3, no quincunx
    b.u(0, 6); b.u(0, 16); b.u(0, 8); b.u1(0); b.u1(0)
    b.rbsp_trailing_bits()
    out = parse_sei(payload(45, b), nalmod.NAL_SEI_PREFIX)
    assert out[0][0] == "frame_packing"
    assert out[0][1]["arrangement_type"] == 3

    # pic timing needs an active SPS with frame_field_info
    sps = SPS(); sps.vui = VUI(frame_field_info_present=1)
    b = BitWriter()
    b.u(1, 4); b.u(0, 2); b.u(0, 1)  # picture_struct=1 (top field)
    b.rbsp_trailing_bits()
    out = parse_sei(payload(1, b), nalmod.NAL_SEI_PREFIX, sps=sps)
    assert out[0] == ("pic_timing", {"picture_struct": 1})

    # active parameter sets
    b = BitWriter()
    b.u(0, 4); b.u1(1); b.u1(0); b.ue(0); b.ue(2)
    b.rbsp_trailing_bits()
    out = parse_sei(payload(129, b), nalmod.NAL_SEI_PREFIX)
    assert out[0] == ("active_parameter_sets",
                      {"active_seq_parameter_set_id": 2})


def test_sei_active_ps_retargets_pic_timing_mid_nal():
    """An active_parameter_sets message re-targets the SPS used by a
    pic_timing payload LATER IN THE SAME SEI NAL (the reference updates
    active_seq_parameter_set_id mid-NAL, hevc_sei.c:163-171)."""
    from openhevc_tpu.decoder.sei import parse_sei
    from openhevc_tpu.bitstream import nal as nalmod
    from openhevc_tpu.ps.params import SPS, VUI

    sps0 = SPS()                                  # no VUI: pic_timing None
    sps1 = SPS()
    sps1.vui = VUI(frame_field_info_present=1)

    w = BitWriter()

    def put(ptype, bits):
        body = bits.get_bytes()
        w.u(ptype, 8)
        w.u(len(body), 8)
        for byte in body:
            w.u(byte, 8)

    b1 = BitWriter()                              # active_parameter_sets -> 1
    b1.u(0, 4); b1.u1(1); b1.u1(0); b1.ue(0); b1.ue(1)
    b1.rbsp_trailing_bits()
    put(129, b1)
    b2 = BitWriter()                              # pic_timing, struct=2
    b2.u(2, 4); b2.u(0, 2); b2.u(0, 1)
    b2.rbsp_trailing_bits()
    put(1, b2)
    w.rbsp_trailing_bits()

    out = parse_sei(w.get_bytes(), nalmod.NAL_SEI_PREFIX, sps=sps0,
                    sps_list={0: sps0, 1: sps1}, active_sps_id=0)
    assert out[0] == ("active_parameter_sets",
                      {"active_seq_parameter_set_id": 1})
    assert out[1] == ("pic_timing", {"picture_struct": 2})


def test_vps_timing_hrd_sublayer_ptl_roundtrip():
    """VPS with vps_timing_info + HRD blocks and a 2-sub-layer PTL
    round-trips through write_vps/parse_vps (reference decode_hrd,
    hevc_ps.c:287, and the sub-layer loop of decode_profile_tier_level).
    These are timing/capability metadata: parsing must stay field-exact
    so the vps_extension_flag that follows them lands on the right bit."""
    from openhevc_tpu.ps.params import (VPS, PTL, parse_vps, write_vps)
    v = VPS()
    v.max_sub_layers = 2
    v.max_dec_pic_buffering = [4, 5]
    v.num_reorder_pics = [0, 1]
    v.max_latency_increase = [-1, -1]
    v.ptl.sub_layers = [(PTL(profile_idc=1, level_idc=63), 63)]
    v.timing = (1001, 60000, 2)             # two HRD blocks
    out = parse_vps(write_vps(v))
    assert out.max_sub_layers == 2
    assert out.ptl.sub_layers[0][1] == 63
    sp = out.ptl.sub_layers[0][0]
    assert sp is not None and sp.profile_idc == 1
    assert out.num_reorder_pics == [0, 1]


def test_decode_stream_with_vps_hrd_and_sublayer_ptl():
    """A real coded stream whose VPS carries timing+HRD and sub-layer PTL
    decodes identically to the plain-VPS stream (an x265/HM-style VPS
    must not abort the parse)."""
    import numpy as np
    from openhevc_tpu.encoder import Encoder, EncoderConfig
    from openhevc_tpu.ps.params import PTL, write_vps
    from openhevc_tpu.bitstream import nal as nalmod
    from openhevc_tpu.bitstream.nal import write_nal
    from util_e2e import make_source, my_decode

    rng = np.random.default_rng(11)
    enc = Encoder(EncoderConfig(width=64, height=64, qp=30, rng_seed=3))
    src = make_source(rng, 64, 64)
    ps = enc.parameter_set_nals()
    au, _, _ = enc.encode_frame(src, "I")
    plain = b"".join(ps) + au

    enc.vps.max_sub_layers = 2
    enc.vps.max_dec_pic_buffering = enc.vps.max_dec_pic_buffering * 2
    enc.vps.num_reorder_pics = enc.vps.num_reorder_pics * 2
    enc.vps.max_latency_increase = enc.vps.max_latency_increase * 2
    enc.vps.ptl.sub_layers = [(PTL(), 63)]
    enc.vps.timing = (1001, 30000, 1)
    rich_vps = write_nal(nalmod.NAL_VPS, write_vps(enc.vps))
    rich = rich_vps + b"".join(ps[1:]) + au

    a = my_decode(plain)
    b = my_decode(rich)
    assert len(a) == len(b) == 1
    for pa, pb in zip(a[0], b[0]):
        assert np.array_equal(pa, pb)
