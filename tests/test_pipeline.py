"""Pipelined decode (frame-threading equivalent, SURVEY.md §2.3).

The parser thread runs ahead on a motion-only DPB while the main thread
reconstructs in order; results must match the serial Decoder exactly.
"""

import numpy as np

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from openhevc_tpu.runtime import PipelinedDecoder
from tests.util_e2e import make_source


def _stream():
    rng = np.random.default_rng(5)
    enc = Encoder(EncoderConfig(width=96, height=64, qp=30, rng_seed=13,
                                temporal_mvp=True, long_term=True, sao=True))
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, 96, 64)
    for i, t in enumerate("IPPBPPIPP"):      # includes a mid-stream IDR
        src = [np.roll(p, i, 0) for p in base]
        nal, _, _ = enc.encode_frame(src, t)
        stream += nal
    return stream


def test_pipelined_matches_serial():
    stream = _stream()
    serial = Decoder(backend=None, check_md5=True)
    ref = serial.decode_stream(stream)
    for use_native in (False, True):
        dec = PipelinedDecoder(backend=None, check_md5=True,
                               use_native=use_native)
        got = dec.decode_stream(stream)
        assert len(got) == len(ref)
        assert dec.md5_fail == 0 and dec.md5_ok == 3 * len(ref)
        for a, b in zip(got, ref):
            assert a.poc == b.poc
            for pa, pb in zip(a.planes, b.planes):
                np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
