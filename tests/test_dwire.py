"""Delta-compressed output wire ("d5"): 5-bit horizontal deltas with
escape channels (tpu/frame_step.py tail <-> decoder/refs._unpack_d5).

The backend probes the first fetched frame: smooth (structured) content
enables the format, noise disables it; escape-cap overflow falls back to
a raw plane fetch and grows the sticky caps.  All paths must stay
bit-exact with the NumPy scalar pipeline."""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Decoder
from openhevc_tpu.tpu import TpuBackend
from openhevc_tpu.tpu import backend as backend_mod


@pytest.fixture(autouse=True)
def _lift_size_gate(monkeypatch):
    """These tests probe the d5 machinery on deliberately tiny frames;
    disable the production small-frame gate (raw wire always wins below
    1 MPx) so the probe itself is exercised."""
    monkeypatch.setattr(backend_mod, "_DWIRE_MIN_PX", 0)


def _smooth_source(rng, w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(96 + 40 * np.sin(2 * np.pi * xx / 37)
                + 30 * np.sin(2 * np.pi * (xx + yy) / 53)
                + rng.normal(0, 1.0, (h, w)), 0, 255).astype(np.int32)
    u = np.clip(128 + 20 * np.sin(2 * np.pi * xx[: h // 2, : w // 2] / 29),
                0, 255).astype(np.int32)
    v = np.clip(128 + 20 * np.cos(2 * np.pi * yy[: h // 2, : w // 2] / 31),
                0, 255).astype(np.int32)
    return [y, u, v]


def _noise_source(rng, w, h):
    return [rng.integers(0, 256, (h, w)).astype(np.int32),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)]


def _encode(src_fn, w=96, h=64, qp=30, n=3):
    rng = np.random.default_rng(5)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=qp, sao=True,
                                rng_seed=13))
    stream = b"".join(enc.parameter_set_nals())
    base = src_fn(rng, w, h)
    recons = []
    for i, t in enumerate("I" + "P" * (n - 1)):
        nal, recon, _ = enc.encode_frame([np.roll(p, i, 1) for p in base], t)
        stream += nal
        recons.append([np.asarray(p) for p in recon])
    return stream, recons


def _decode_check(stream, recons, backend):
    dec = Decoder(backend=backend, check_md5=True)
    frames = dec.decode_stream(stream)
    assert dec.md5_fail == 0 and dec.md5_ok > 0
    assert len(frames) == len(recons)
    for f, want in zip(frames, recons):
        got = f.host_planes()
        for c in range(3):
            assert np.array_equal(np.asarray(got[c], np.int32), want[c]), \
                f"poc {f.poc} plane {c} mismatch"
    return dec


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
def test_dwire_enables_and_bit_exact():
    stream, recons = _encode(_smooth_source)
    backend = TpuBackend()
    _decode_check(stream, recons, backend)
    assert isinstance(backend._dwire, tuple), \
        "probe should enable d5 on smooth content"
    # at least one frame must actually have shipped the d5 wire
    assert backend.wire_fmt is not None and backend.wire_fmt[0] == "d5"


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
def test_dwire_probe_disables_on_noise():
    stream, recons = _encode(_noise_source, qp=20)
    backend = TpuBackend()
    _decode_check(stream, recons, backend)
    assert backend._dwire is False, \
        "noise deltas must not enable the d5 wire"


@pytest.mark.slow   # >60 s on the 1-core image; np-backend sibling stays fast
def test_dwire_overflow_falls_back_and_grows():
    # noise content force-enabled with tiny caps: the first d5 frame
    # overflows both escape channels, host_planes must fall back to the
    # raw plane fetch (bit-exact) and grow the sticky caps; later frames
    # then fit (huge caps) and ship d5 again
    stream, recons = _encode(_noise_source, qp=20)
    backend = TpuBackend()
    backend._dwire = ((8, 8), (8, 8), (8, 8))
    _decode_check(stream, recons, backend)
    assert isinstance(backend._dwire, tuple)
    assert backend._dwire[0][0] > 8, "caps should have grown after overflow"


def test_dwire_small_frame_gate(monkeypatch):
    # below _DWIRE_MIN_PX the probe must never engage d5 (device compute
    # + host unpack measured net-negative at <=480p): smooth content that
    # WOULD enable it stays on the raw wire, still bit-exact
    monkeypatch.setattr(backend_mod, "_DWIRE_MIN_PX", 1 << 20)
    stream, recons = _encode(_smooth_source)
    backend = TpuBackend()
    _decode_check(stream, recons, backend)
    assert backend._dwire is False, \
        "small frames must keep the raw output wire"
