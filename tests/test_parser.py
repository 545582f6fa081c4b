"""Stream parser probe (hevc_parser.c parity): AU boundaries, pict_type,
POC and key-frame detection without decoding."""

import numpy as np

from openhevc_tpu.parser import HevcParser, FrameEndScanner, split_ps
from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.bitstream import nal as nalmod
from tests.util_e2e import make_source


def _stream(pattern="IPBP", **kw):
    cfg = EncoderConfig(width=64, height=48, qp=30, rng_seed=3, **kw)
    enc = Encoder(cfg)
    ps = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(1)
    src = make_source(rng, 64, 48)
    aus = []
    for i, t in enumerate(pattern):
        s = [np.roll(p, i, 0) for p in src]
        au, _, _ = enc.encode_frame(s, t)
        aus.append(au)
    return ps, aus


def test_iter_access_units_types_and_pocs():
    ps, aus = _stream("IPBPP")
    data = ps + b"".join(aus)
    infos = HevcParser().iter_access_units(data)
    assert len(infos) == 5
    assert [i.pict_type for i in infos] == ["I", "P", "B", "P", "P"]
    assert [i.poc for i in infos] == [0, 1, 2, 3, 4]
    assert infos[0].key_frame and not infos[1].key_frame
    # offsets/sizes tile the buffer exactly
    assert infos[0].offset == 0
    for a, b in zip(infos, infos[1:]):
        assert a.offset + a.size == b.offset
    assert infos[-1].offset + infos[-1].size == len(data)


def test_frame_end_scanner_streaming():
    """Boundary detection works with the scanner fed byte-at-a-time."""
    ps, aus = _stream("IPP")
    data = ps + b"".join(aus)
    sc = FrameEndScanner()
    hits = []
    while sc.consumed < len(data):
        r = sc.scan(data[sc.consumed:sc.consumed + 1])
        if r >= 0:
            hits.append(r)
    assert len(hits) == 2           # two boundaries between three AUs
    # boundaries agree with the whole-buffer parse
    infos = HevcParser().iter_access_units(data)
    assert hits == [infos[1].offset, infos[2].offset]


def test_split_ps():
    ps, aus = _stream("I")
    data = ps + aus[0]
    cut = split_ps(data)
    # reference semantics (hevc_parser.c:304): the split lands at the next
    # NAL's 3-byte start code, so a leading zero of a 4-byte start code
    # stays with the extradata
    assert abs(cut - len(ps)) <= 1
    # every NAL before the cut is a parameter set
    from openhevc_tpu.bitstream.nal import split_annexb
    for nal in split_annexb(data[:cut]):
        assert nal.type in (nalmod.NAL_VPS, nalmod.NAL_SPS, nalmod.NAL_PPS)


def test_probe_multislice():
    ps, aus = _stream("IPP", slices=2)
    infos = HevcParser().iter_access_units(ps + b"".join(aus))
    assert [i.pict_type for i in infos] == ["I", "P", "P"]
    assert [i.poc for i in infos] == [0, 1, 2]


def test_probe_shvc_stream_tracks_base_layer():
    from openhevc_tpu.encoder.shvc import ShvcEncoder
    cfg_bl = EncoderConfig(width=48, height=32, qp=30, rng_seed=7)
    cfg_el = EncoderConfig(width=96, height=64, qp=30, rng_seed=11)
    enc = ShvcEncoder(cfg_bl, cfg_el)
    data = b"".join(enc.parameter_set_nals())
    rng = np.random.default_rng(42)
    src_bl = make_source(rng, 48, 32)
    src_el = make_source(rng, 96, 64)
    for i, t in enumerate("IPP"):
        au, _, _ = enc.encode_frame([np.roll(p, i, 0) for p in src_bl],
                                    [np.roll(p, i, 1) for p in src_el], t)
        data += au
    infos = HevcParser().iter_access_units(data)
    # EL NALs must not split AUs: exactly one entry per AU
    assert len(infos) == 3
    assert [i.poc for i in infos] == [0, 1, 2]
