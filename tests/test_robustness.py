"""Real-stream robustness: CRA/BLA/RASL gating, missing-ref concealment,
and corrupted/truncated-stream resilience.

Parity targets: max_ra RASL gating (hevc.c:3375-3397), BLA POC-MSB reset
(hevc_refs.c:778-782), generate_missing_ref (hevc_refs.c:538-600), and the
continue-on-error decode loop (hevc.c:3496-3499).
"""

import numpy as np
import pytest

from openhevc_tpu.bitstream import nal as nalmod
from openhevc_tpu.bitstream.nal import split_annexb, write_nal
from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from tests.util_e2e import make_source, oracle_decode, my_decode, \
    assert_frames_equal


def _open_gop_stream(w=96, h=64):
    """IDR(0) P(1) P(2) CRA(5) RASL(3, refs P2) RASL(4, refs P2) P(6, refs CRA).

    The RASL pictures reference a pre-CRA frame: decodable from the start,
    must be skipped when decode begins at the CRA.
    """
    rng = np.random.default_rng(11)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=30, rng_seed=21,
                                sao=True, reorder_pics=2))
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, w, h)
    frames = [
        dict(t="I"),
        dict(t="P"),
        dict(t="P"),
        dict(t="I", nal=nalmod.NAL_CRA_NUT, poc=5),
        dict(t="P", nal=nalmod.NAL_RASL_R, poc=3, refs=[2, 5]),
        dict(t="P", nal=nalmod.NAL_RASL_N, poc=4, refs=[2, 5]),
        dict(t="P", poc=6, refs=[5]),
    ]
    cra_offset = None
    for i, f in enumerate(frames):
        if f.get("nal") == nalmod.NAL_CRA_NUT:
            cra_offset = len(stream)
        src = [np.roll(p, i, 0) for p in base]
        nal, _, _ = enc.encode_frame(src, f["t"], nal_type=f.get("nal"),
                                     poc=f.get("poc"), ref_pocs=f.get("refs"))
        stream += nal
    return stream, cra_offset


def _ps_nals(stream):
    out = b""
    for nal in split_annexb(stream):
        if nal.type in (32, 33, 34):
            out += write_nal(nal.type, nal.rbsp)
    return out


def test_cra_rasl_full_stream():
    """From the start, RASL pictures are decodable and output in POC order."""
    stream, _ = _open_gop_stream()
    mine = my_decode(stream)
    ref = oracle_decode(stream, 96, 64)
    assert_frames_equal(mine, ref, "open-gop full")


def test_cra_midstream_start():
    """Starting at the CRA, its RASL leaders must be skipped (max_ra)."""
    stream, cra_offset = _open_gop_stream()
    cut = _ps_nals(stream) + stream[cra_offset:]
    mine = my_decode(cut)
    # CRA(5) and P(6) decode; RASL(3)/RASL(4) are skipped
    assert len(mine) == 2
    ref = oracle_decode(cut, 96, 64)
    assert_frames_equal(mine, ref, "open-gop mid-stream")


def test_bla_poc_msb_reset():
    """A BLA picture's POC MSB resets to 0 (hevc_refs.c:778)."""
    from openhevc_tpu.decoder.frontend import Frontend
    from openhevc_tpu.decoder.slice import SliceHeader

    class FakeSPS:
        log2_max_poc_lsb = 4
    fe = Frontend()
    fe.prev_poc = 77                    # MSB 64 + LSB 13
    sh = SliceHeader()
    sh.pic_order_cnt_lsb = 3
    poc = fe._compute_poc(nalmod.NAL_BLA_W_LP, sh, FakeSPS(), 0)
    assert poc == 3                     # not 64 + 3


def test_missing_ref_concealment():
    """Dropping a reference picture must not crash: the missing ref is
    synthesized mid-gray like generate_missing_ref, decode continues."""
    rng = np.random.default_rng(12)
    enc = Encoder(EncoderConfig(width=96, height=64, qp=30, rng_seed=22))
    stream_nals = [b"".join(enc.parameter_set_nals())]
    base = make_source(rng, 96, 64)
    for i, t in enumerate("IPPP"):
        src = [np.roll(p, i, 0) for p in base]
        nal, _, _ = enc.encode_frame(src, t)
        stream_nals.append(nal)
    damaged = b"".join(stream_nals[:2] + stream_nals[3:])   # drop P(1)
    dec = Decoder(check_md5=False)      # concealed frames cannot match MD5
    mine = [f.planes for f in dec.decode_stream(damaged)]
    assert len(mine) == 3               # I(0), P(2), P(3) all emerge
    ref = oracle_decode(damaged, 96, 64)
    assert_frames_equal(mine, ref, "missing-ref")


@pytest.mark.parametrize("cut_frac", [0.35, 0.55, 0.8, 0.95])
def test_truncated_stream(cut_frac):
    """Truncation mid-slice must not raise out of the public API."""
    from openhevc_tpu.api import OpenHevcDecoder
    stream, _ = _open_gop_stream()
    cut = stream[:int(len(stream) * cut_frac)]
    dec = OpenHevcDecoder(backend="np")
    dec._backend_kind = "none"
    dec.start()
    got = dec.decode(cut)
    while dec.decode(b""):
        pass


def test_corrupted_payload_resilience():
    """Byte corruption inside slice data must not raise out of the API."""
    stream, _ = _open_gop_stream()
    rng = np.random.default_rng(33)
    buf = bytearray(stream)
    # corrupt a handful of bytes in the back half (slice payloads)
    for _ in range(8):
        pos = rng.integers(len(buf) // 2, len(buf))
        buf[pos] ^= 0xFF
    from openhevc_tpu.api import OpenHevcDecoder
    dec = OpenHevcDecoder(backend="np")
    dec._backend_kind = "none"
    dec.start()
    dec.decode(bytes(buf))
    while dec.decode(b""):
        pass


def test_pipeline_resilient_mode():
    """The pipelined decoder with resilient=True survives truncation."""
    from openhevc_tpu.runtime import PipelinedDecoder
    stream, _ = _open_gop_stream()
    cut = stream[:int(len(stream) * 0.6)]
    dec = PipelinedDecoder(backend=None, check_md5=False, use_native=False,
                           resilient=True)
    frames = dec.decode_stream(cut)
    assert len(frames) >= 1


def test_bumping_reorder_pyramid():
    """BUMPING-style stress: a random-access B-pyramid with reorder depth
    4 — decode order 0,8,4,2,6,1,3,5,7 vs output order 0..8.  The output
    bump process (DPB fullness vs sps_max_num_reorder_pics,
    hevc_refs.c output/bumping) must emit strictly POC-ascending frames,
    bit-exact vs the encoder recon AND the reference oracle."""
    from tests.util_e2e import oracle_decode, my_decode, assert_frames_equal
    w, h = 64, 64
    rng = np.random.default_rng(23)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=30, rng_seed=55,
                                temporal_mvp=True, sao=True,
                                reorder_pics=4))
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, w, h)
    # each RPS lists every picture still needed by later frames in
    # decode order (real RA streams keep future refs in the RPS too;
    # the encoder's apply_rps drops anything unlisted from its DPB)
    order = [(0, "I", None), (8, "P", [0]), (4, "B", [0, 8]),
             (2, "B", [0, 4, 8]), (6, "B", [4, 8, 0, 2]),
             (1, "B", [0, 2, 4, 6, 8]), (3, "B", [2, 4, 6, 8]),
             (5, "B", [4, 6, 8]), (7, "B", [6, 8])]
    recon_by_poc = {}
    for poc, t, refs in order:
        src = [np.roll(p, poc, 0) for p in base]
        nal, recon, _ = enc.encode_frame(src, t, poc=poc, ref_pocs=refs)
        stream += nal
        recon_by_poc[poc] = [np.asarray(p).copy() for p in recon]
    want = [recon_by_poc[p] for p in range(9)]
    mine = my_decode(stream)                    # python front-end path
    assert_frames_equal(mine, want, "bumping-python")
    # native front-end through the pipelined decoder (bounded reorder)
    from openhevc_tpu.runtime import PipelinedDecoder
    dec = PipelinedDecoder(check_md5=True, use_native=True)
    frames = dec.decode_stream(stream)
    assert dec.md5_fail == 0 and dec.md5_ok > 0
    assert [f.poc for f in frames] == list(range(9)), \
        [f.poc for f in frames]
    for f, wnt in zip(frames, want):
        for p, q in zip(f.host_planes(), wnt):
            np.testing.assert_array_equal(np.asarray(p), q)
    oracle = oracle_decode(stream, w, h)
    assert_frames_equal(want, oracle, "bumping-oracle")
