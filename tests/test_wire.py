"""The packed-plan wire format (backend.prepare -> frame_step._unpack).

Coefficient levels travel as packed 4-bit nibbles (quartering the dominant
plan section vs int16); |level| in (7, 127] rides an (index, int8 value)
escape side-channel, the rare |level| > 127 an (index, int16 value) one.
These tests verify the encoding host-side, without compiling any device
program."""

import numpy as np
import pytest

from openhevc_tpu.encoder import Encoder, EncoderConfig
from openhevc_tpu.decoder.frontend import Frontend
from openhevc_tpu.decoder.refs import DPB
from tests.util_e2e import make_source


def _plan(qp):
    cfg = EncoderConfig(width=64, height=64, qp=qp, rng_seed=77)
    rng = np.random.default_rng(7)
    enc = Encoder(cfg)
    stream = b"".join(enc.parameter_set_nals())
    base = make_source(rng, cfg.width, cfg.height, cfg.bit_depth)
    nal, _, _ = enc.encode_frame(base, "I")
    stream += nal
    fe = Frontend(dpb=DPB(), use_native=True)
    return fe.decode_bytes(stream)[0], fe.sps.log2_ctb_size


def _prepare(plan, ctb_log2, fast, monkeypatch):
    # OPENHEVC_IPAL=interp selects the SoA fast path (native pack_levels)
    # on CPU jax; unset leaves the schedule_slots path (numpy encoding)
    if fast:
        monkeypatch.setenv("OPENHEVC_IPAL", "interp")
    else:
        monkeypatch.delenv("OPENHEVC_IPAL", raising=False)
    from openhevc_tpu.tpu import TpuBackend
    backend = TpuBackend(ctb_log2=ctb_log2)
    refs, blob, prof = backend.prepare(plan, DPB())
    n16 = prof[-2]                      # prof tail: (layout8, n16, dwire)
    b = np.asarray(blob)
    return b[:2 * n16].view(np.int16), b[2 * n16:], prof


def _unpack_entry(buf, entry):
    """Mirror frame_step._unpack for one layout entry (numpy)."""
    p, o, s = entry[:3]
    size = int(np.prod(s)) if s else 1
    tag = entry[3] if len(entry) > 3 else None
    if tag == "nib":
        raw = buf[o:o + size // 2].astype(np.int32) & 0xFF
        lo = raw & 15
        lo = lo - ((lo & 8) << 1)
        hi = raw >> 4
        hi = hi - ((hi & 8) << 1)
        return np.stack([lo, hi], axis=-1).reshape(s)
    if tag == "b2":
        raw = buf[o:o + -(-size // 4)].astype(np.int32) & 0xFF
        cols = np.stack([(raw >> (2 * k)) & 3 for k in range(4)], -1)
        return cols.reshape(-1)[:size].reshape(s)
    if tag == "b1":
        raw = buf[o:o + -(-size // 8)].astype(np.int32) & 0xFF
        cols = np.stack([(raw >> k) & 1 for k in range(8)], -1)
        return cols.reshape(-1)[:size].reshape(s)
    return buf[o:o + size].reshape(s).astype(np.int32)


def _wire_levels(packed, packed8, prof):
    """Re-widen the wire levels exactly like frame_step does (numpy)."""
    layout = prof[17]
    layout8 = prof[-3]
    resid_keys = prof[8]
    arr = {e[0]: _unpack_entry(packed, e) for e in layout}
    arr8 = {e[0]: _unpack_entry(packed8, e) for e in layout8}
    arr.update({p: v for p, v in arr8.items()
                if p[-1] != "levels"})      # int8 field sections
    out = {}
    for (c, n, N, E, E8) in resid_keys:
        lv = arr8[("resid", c, n, "levels")].copy()
        if E8:
            # delta-coded uint16 gaps: idx = cumsum(d) - 1, scatter-ADD
            # (padding tail re-adds 0 at the last index; all-padding
            # buckets land on -1 and drop)
            dd = arr[("rese", c, n, "d")].astype(np.int64) & 0xFFFF
            idx = np.cumsum(dd) - 1
            val = arr[("rese", c, n, "val")]
            flat = lv.reshape(-1)
            ok = (idx >= 0) & (idx < flat.size)
            np.add.at(flat, idx[ok], val[ok])
            lv = flat.reshape(lv.shape)
        if E:
            lo = arr[("resc", c, n, "lo")] & 0xFFFF
            hi = arr[("resc", c, n, "hi")]
            idx = (hi << 16) | lo
            val = arr[("resc", c, n, "val")]
            flat = lv.reshape(-1)
            ok = idx < flat.size            # mode="drop" semantics
            flat[idx[ok]] = val[ok]
            lv = flat.reshape(lv.shape)
        out[(c, n)] = (lv, arr[("resid", c, n, "valid")])
    return out


def _check_vs_oracle(qp, fast, monkeypatch):
    from openhevc_tpu.tpu import plan_soa
    plan, ctb_log2 = _plan(qp)
    got = _wire_levels(*_prepare(plan, ctb_log2, fast, monkeypatch))
    want = plan_soa.resid_buckets(np.asarray(plan.soa["resid"]),
                                  plan.raw_levels,
                                  plan.chroma_format_idc)
    n_esc16 = n_esc8 = 0
    for key, d in want.items():
        if key not in got:              # slow path omits empty buckets
            assert len(d["levels"]) == 0
            continue
        lv, valid = got[key]
        N = len(d["levels"])
        assert (lv[:N] == d["levels"]).all(), f"levels mismatch {key}"
        assert (lv[N:] == 0).all(), f"padding not zero {key}"
        assert valid[:N].all() and not valid[N:].any()
        n_esc16 += int((np.abs(d["levels"]) > 127).sum())
        n_esc8 += int(((np.abs(d["levels"]) > 7)
                       & (np.abs(d["levels"]) <= 127)).sum())
    return n_esc16, n_esc8


def test_wire_levels_nibble_native(monkeypatch):
    # qp=30: some int8 escapes, no int16 ones
    e16, e8 = _check_vs_oracle(qp=30, fast=True, monkeypatch=monkeypatch)
    assert e16 == 0 and e8 > 0


def test_wire_levels_escapes_native(monkeypatch):
    # qp=0 noise: guaranteed |level| > 127 coefficients hit the escapes
    e16, e8 = _check_vs_oracle(qp=0, fast=True, monkeypatch=monkeypatch)
    assert e16 > 0 and e8 > 0


def test_wire_levels_escapes_slow_path(monkeypatch):
    # the schedule_slots (non-SoA) path must encode the same wire levels
    e16, e8 = _check_vs_oracle(qp=0, fast=False, monkeypatch=monkeypatch)
    assert e16 > 0
