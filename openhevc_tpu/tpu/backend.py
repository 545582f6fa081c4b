"""TPU back-end orchestrator: one fused jit dispatch per frame.

Host side: compile the FramePlan into a single packed int32 buffer + a
static profile; device side: frame_step() runs MC, the intra/residual
wavefront scan, deblocking and SAO in a single program (remote-TPU dispatch
latency makes many small dispatches prohibitive, and per-array transfers
cost ~1s each over the tunnel, so the whole plan ships as ONE device_put).
Bit-exact with the NumPy scalar pipeline (recon_np); the tests enforce it.
"""

import ast
import json
import os
import threading

import numpy as np
import jax
import jax.numpy as jnp

from ..decoder.plan import FramePlan
from .plan_compile import compile_plan, pad_batch
from .wavefront import schedule_slots
from .frame_step import frame_step
from .sao import build_sao_grids
from . import intra_pallas

# ---------------------------------------------------------------------------
# Converged-cap store: the sticky batch capacities a long-running decoder
# converges to, persisted per (geometry, path) so that every later run —
# including a cold process — builds its FINAL plan shapes from frame 0
# and compiles each frame family exactly once (the per-shape programs
# themselves persist in the XLA compilation cache).  Without this, each
# cap-growth step during the first frames is a distinct fused-program
# shape (~10-20 min/compile on a tunneled TPU).
# Enabled by pointing OPENHEVC_CAP_STORE at a JSON path (bench.py does).
# ---------------------------------------------------------------------------

_CAP_FIELDS = ("_slot_caps", "_inter_caps", "_work_caps", "_slot_T",
               "_flat_len", "_resid_len", "_resc_len", "_rese_len",
               "_blob_cap", "_ipal_chunks")
_cap_lock = threading.Lock()

# Luma-plane size below which the d5 delta output wire is never engaged:
# at <=480p the extra device compute for the delta sections (~6 ms) and
# the host-side unpack outweigh the few ms of wire saved (measured
# net-negative on bqmall/rext); 1080p and up it wins.
_DWIRE_MIN_PX = 1 << 20


def _enc_keys(v):
    if isinstance(v, dict):
        return {repr(k): _enc_keys(x) for k, x in v.items()}
    if isinstance(v, tuple):
        return list(v)
    return v


def _dec_keys(v):
    if isinstance(v, dict):
        out = {}
        for k, x in v.items():
            try:
                kk = ast.literal_eval(k)
            except (ValueError, SyntaxError):
                kk = k
            out[kk] = _dec_keys(x)
        return out
    return v


def _cap_store_path():
    return os.environ.get("OPENHEVC_CAP_STORE") or None


def _load_cap_store(path):
    try:
        with open(path) as f:
            data = json.load(f)
        if data.get("v") != 1:
            return {}
        return data.get("keys", {})
    except (OSError, ValueError):
        return {}


def _save_cap_store(path, key, entry):
    with _cap_lock:
        keys = _load_cap_store(path)
        keys[key] = entry
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"v": 1, "keys": keys}, f)
        os.replace(tmp, path)


def _canonical_pu_sizes(ctb):
    """MC tile buckets (PUs are decomposed by plan_compile._tile_pu)."""
    from .plan_compile import TILE_SIZES
    return TILE_SIZES


def _pow2(x):
    p = 8
    while p < x:
        p *= 2
    return p


def _quant(x):
    """Next size of the form 2^k * {1, 1.25, 1.5, 1.75} (>= 8): bounds the
    sticky padding waste of the big level buffers at 25% (vs 100% for
    pow2), at the cost of a few more shape variants during warmup."""
    p = _pow2(x)
    if p > 8:
        for m in (10, 12, 14):
            c = (p >> 4) * m
            if c >= x:
                return c
    return p


class TpuBackend:
    def __init__(self, ctb_log2=None, shard=None, device_schedule=None):
        self.ctb_log2 = ctb_log2
        # sp-axis spatial sharding: a NamedSharding over a mesh with an
        # 'sp' axis; frame planes partition into CTB-row bands across
        # devices and the fused step's filter halos ride XLA collectives
        self.shard = shard
        # dp-axis pipelining of DEPENDENT frames: frame i dispatches to
        # device_schedule[i % n]; reference planes transfer explicitly
        # from their producer's device (the ICI analog of the reference's
        # cross-thread ref reads guarded by progress waits,
        # pthread_frame.c:479-513).  Dispatches are async, so the host
        # prepares frame i+1 while device k executes frame i.
        self.device_schedule = device_schedule
        self._disp_i = 0
        self._cur_device = None
        # sticky capacities: profiles grow monotonically, so the fused
        # program recompiles only when a batch outgrows its previous bound
        # sticky state is kept per frame family: intra frames schedule
        # many small slots (large T, small caps), inter frames few large
        # ones (small T, large caps) — mixing the two families multiplies
        # T(intra) by caps(inter) and explodes the scan cost
        self._slot_caps = {"I": {}, "PB": {}}
        self._inter_caps = {}
        self._work_caps = {}            # compacted MC work-batch caps
        self._slot_T = {"I": {}, "PB": {}}
        self._flat_len = {"I": {}, "PB": {}}
        self._resid_len = {"I": {}, "PB": {}}
        self._resc_len = {"I": {}, "PB": {}}    # int16 escape-level caps
        self._rese_len = {"I": {}, "PB": {}}    # int8 escape-level caps
        # delta-compressed output wire state ("d5", frame_step wire tail):
        #   None  -> probe pending (first fetched frame decides)
        #   False -> off (content doesn't fit 5-bit deltas, e.g. noise)
        #   tuple -> per-plane (esc8_cap, esc16_cap) sticky capacities
        self._dwire = None
        self.wire_fmt = None            # format of the LAST finished frame
        self._blob_cap = {}             # sticky whole-blob upload length
        self._ipal_chunks = {"I": {}, "PB": {}}
        self._caps_key = None           # cap-store key (set at 1st prepare)
        self._caps_saved = None

    def _caps_sync(self, plan, use_ipal):
        """Load the converged sticky caps for this (geometry, path) from
        the cap store, once per backend instance."""
        path = _cap_store_path()
        if path is None or self._caps_key is not None:
            return
        self._caps_key = (f"{plan.width}x{plan.height}:{plan.bit_depth}:"
                          f"{plan.chroma_format_idc}:{int(bool(use_ipal))}")
        entry = _load_cap_store(path).get(self._caps_key)
        if not entry:
            return

        def merge_max(dst, src):
            for k, v in src.items():
                if isinstance(v, dict):
                    merge_max(dst.setdefault(k, {}), v)
                elif isinstance(v, (int, float)):
                    dst[k] = max(dst.get(k, 0), v)

        for f in _CAP_FIELDS:
            got = _dec_keys(entry.get(f) or {})
            merge_max(getattr(self, f), got)
        dw = entry.get("_dwire")
        if plan.width * plan.height < _DWIRE_MIN_PX:
            if self._dwire is None:
                self._dwire = False     # small frame: raw wire always wins
        elif self._dwire is None and isinstance(dw, list):
            self._dwire = tuple(tuple(int(x) for x in c) for c in dw)

    def _caps_flush(self):
        """Write the current sticky caps back when they changed."""
        path = _cap_store_path()
        if path is None or self._caps_key is None:
            return
        entry = {f: _enc_keys(getattr(self, f)) for f in _CAP_FIELDS}
        if isinstance(self._dwire, tuple):
            entry["_dwire"] = [list(c) for c in self._dwire]
        blob = json.dumps(entry, sort_keys=True)
        if blob != self._caps_saved:
            self._caps_saved = blob
            _save_cap_store(path, self._caps_key, entry)

    def observe_output(self, hplanes, counts=None, overflow=False):
        """Fetch-time feedback from refs.host_planes.

        Probe: the FIRST fetched frame's pixels decide whether the "d5"
        delta output wire wins for this content (escape fraction < 4%) and
        size its sticky escape capacities.  Overflow: a later frame's
        escapes outgrew the caps (host fell back to a raw plane fetch);
        grow the caps so subsequent frames recompile once and fit."""
        if self._dwire is None and hplanes is not None and \
                np.asarray(hplanes[0]).size < _DWIRE_MIN_PX:
            # small frames: the d5 sections' device compute (+~6 ms at
            # 480p) and host unpack outweigh the few ms of wire saved —
            # measured net-negative; keep the raw wire (and its already
            # compiled profile)
            self._dwire = False
            return
        if overflow and isinstance(self._dwire, tuple) and counts is not None:
            caps = []
            for c in range(3):
                o8, o16 = self._dwire[c]
                caps.append((max(o8, _quant(int(counts[2 * c]) * 2 + 64)),
                             max(o16, _quant(int(counts[2 * c + 1]) * 2
                                             + 16))))
            self._dwire = tuple(caps)
            return
        if self._dwire is not None:
            return
        self._dwire = False             # claim the probe (re-entrancy)
        tot = n = 0
        caps = []
        for p in hplanes:
            p = np.asarray(p).astype(np.int32)
            y = np.concatenate([p[:, :1] - 128, np.diff(p, axis=1)], axis=1)
            esc = (y < -16) | (y > 15)
            e8 = int((esc & (y >= -128) & (y <= 127)).sum())
            e16 = int(esc.sum()) - e8
            tot += e8 + e16
            n += y.size
            caps.append((_quant(e8 * 5 // 2 + 64), _quant(e16 * 3 + 16)))
        if n and tot / n < 0.04:
            self._dwire = tuple(caps)

    def decode_frame(self, plan: FramePlan, dpb):
        """Returns ([Y, U, V] device int32 planes, wire) — wire is the flat
        uint8/uint16 copy to fetch host-side; the int32 planes stay on
        device as future references."""
        if self.device_schedule:
            import contextlib
            self._cur_device = self.device_schedule[
                self._disp_i % len(self.device_schedule)]
            self._disp_i += 1
            with jax.default_device(self._cur_device):
                args = self.prepare(plan, dpb)
                *planes, wire = frame_step(*args)
            return list(planes), wire
        args = self.prepare(plan, dpb)
        *planes, wire = frame_step(*args)
        return list(planes), wire

    def decode_prepared(self, prep, blob_dev, dpb):
        """Like decode_frame, but from a prepare_host() product and an
        optionally pre-uploaded blob slice (upload_group)."""
        args = self.finish_frame(prep, blob_dev, dpb)
        *planes, wire = frame_step(*args)
        return list(planes), wire

    def prepare(self, plan: FramePlan, dpb):
        """Host-side plan compilation; returns the frame_step argument tuple
        (refs on device, one packed plan buffer, static profile)."""
        return self.finish_frame(self.prepare_host(plan), None, dpb)

    def upload_group(self, preps):
        """ONE host->device transfer for several prepared frames' blobs.

        The tunnel's H2D rate roughly doubles from ~2 MB transfers to
        ~8-16 MB ones, so the pipeline batches a few frames' plan blobs
        into a single device_put and dispatches from device-side slices."""
        if len(preps) == 1:
            return [None]
        blobs = [p[1] for p in preps]
        group = jnp.asarray(np.concatenate(blobs))
        out = []
        off = 0
        for b in blobs:
            out.append(group[off:off + len(b)])
            off += len(b)
        return out

    def finish_frame(self, prep, blob_dev, dpb):
        """DPB-dependent half of prepare(): resolve reference planes and
        (unless pre-uploaded) ship the blob; returns frame_step args."""
        plan, blob_np, prof, ref_pocs = prep
        # wire_fmt must reflect THIS frame (group mode runs several
        # prepare_host calls before any dispatch)
        self.wire_fmt = ("d5", prof[-1]) if prof[-1] is not None else None
        if blob_dev is None:
            blob_dev = jnp.asarray(blob_np)
        if ref_pocs:
            refs = self._build_refs(plan, ref_pocs, dpb)
            if self.shard is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                ns2 = NamedSharding(self.shard.mesh, P("sp", None))
                refs = tuple(tuple(jax.device_put(p, ns2) for p in r)
                             for r in refs)
        else:
            # dummy refs keep the pytree structure stable (cached: avoid
            # three eager zeros dispatches per intra frame)
            if not hasattr(self, "_dummy_refs"):
                self._dummy_refs = tuple(
                    (jnp.zeros((8, 8), jnp.int32),) for _ in range(3))
            refs = self._dummy_refs
        return (refs, blob_dev, prof)

    def _build_refs(self, plan, ref_pocs, dpb):
        from ..decoder.refs import get_or_synth
        bd = plan.bit_depth
        cfmt = plan.chroma_format_idc
        rframes = [get_or_synth(dpb, p, plan.width, plan.height, bd, cfmt)
                   for p in ref_pocs]

        def _ref_plane(f, c):
            p = f.planes[c]
            if self._cur_device is not None:
                # explicit producer->consumer ref transfer (ICI on real
                # multi-chip; pthread_frame's progress-guarded cross-thread
                # read becomes a data edge)
                p = jax.device_put(p, self._cur_device)
            return jnp.asarray(p, jnp.int32)

        # refs ship as per-plane tuples; frame_step stacks them INSIDE the
        # fused program (an HBM copy XLA schedules, ~15 us at 1080p)
        # instead of eager jnp.stack dispatches here — on the remote TPU
        # each eager op is a round trip per frame
        return tuple(tuple(_ref_plane(f, c) for f in rframes)
                     for c in range(3))

    def prepare_host(self, plan: FramePlan):
        """Plan-only half of prepare(): builds the packed wire blob and the
        static profile with NO DPB access, so the pipeline can batch
        several frames' blobs into one upload before dispatching any of
        them.  -> (plan, blob_np, prof, ref_pocs)."""
        bd = plan.bit_depth
        cfmt = plan.chroma_format_idc
        hs = 1 if cfmt in (1, 2) else 0
        vs = 1 if cfmt == 1 else 0

        fam = "I" if plan.slice_type == 2 else "PB"

        # ---- path selection (also see intra path selection below) ----
        ipal_env = os.environ.get("OPENHEVC_IPAL", "")
        use_ipal = (ipal_env != "off"
                    and (jax.default_backend() not in ("cpu",)
                         or ipal_env == "interp"))
        self._caps_sync(plan, use_ipal)
        # fused deblock+SAO Pallas kernel (tpu/filter_pallas.py): one VMEM
        # pass per plane instead of a dozen whole-plane HLO stages.  Same
        # env contract as OPENHEVC_IPAL; off under sp-sharding (pallas_call
        # operates on unsharded planes)
        ff_env = os.environ.get("OPENHEVC_FFILT", "")
        if self.shard is not None or ff_env == "off":
            ffilt = False
        elif ff_env == "interp":
            ffilt = "interp"
        else:
            ffilt = jax.default_backend() not in ("cpu",)
        # delta-compressed output wire: only once the probe enabled it
        # (8-bit, unsharded; plane sizes must split into groups of 8)
        dwire = None
        if (bd == 8 and self.shard is None
                and isinstance(self._dwire, tuple)
                and (plan.height * plan.width) % 8 == 0
                and ((plan.height >> vs) * (plan.width >> hs)) % 8 == 0
                and os.environ.get("OPENHEVC_DWIRE") != "off"):
            dwire = self._dwire
        self.wire_fmt = ("d5", dwire) if dwire is not None else None
        # vectorized SoA fast path: batches built straight from the native
        # op arrays, no per-op Python objects (plan_soa.py).  getattr: plans
        # unpickled from caches written before the field existed lack it
        fast = getattr(plan, "soa", None) is not None and use_ipal
        if fast:
            from . import plan_soa

            class _CP:
                pass

            cp = _CP()
            soa = plan.soa
            if len(soa["inter"]):
                pocs, s0, s1 = plan_soa.ref_pocs_and_slots(soa["inter"])
                cp.ref_pocs = pocs
                cp.inter = plan_soa.tile_buckets(soa["inter"], s0, s1)
            else:
                cp.ref_pocs = []
                cp.inter = {}
        else:
            cp = compile_plan(plan)
        parts = []          # (path, int32 ndarray) in layout order

        parts8 = []         # int8 wire sections (joins the levels buffer)

        def add(path, arr):
            # int16 wire format (see frame_step._unpack); every field fits.
            # arrays keep their native dtype here — the single packing pass
            # below casts each one exactly once, straight into the final
            # pinned buffer (no per-field int16 copy + big concatenate)
            parts.append((path, np.asarray(arr)))

        def add8(path, arr):
            # int8 wire sections: fields whose values provably fit int8
            # (masks, QP maps, SAO params, small resid/inter fields) ride
            # the int8 buffer — half the tunnel bytes of the int16 wire
            parts8.append((path, np.asarray(arr), None))

        def add2(path, arr):
            # 2-bit pack (values in [0, 3]: boundary strengths): 4/byte.
            # The deblock BS/no-filter maps are ~0.3 MB/frame at 1080p as
            # int8 — a fifth of the non-level wire — and provably 2/1-bit
            a = np.asarray(arr)
            flat = a.reshape(-1)
            pad = -flat.size % 4
            if pad:
                flat = np.concatenate([flat, np.zeros(pad, flat.dtype)])
            q = flat.reshape(-1, 4).astype(np.uint8)
            by = (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6))
            parts8.append((path, (by.view(np.int8), a.shape), "b2"))

        def add1(path, arr):
            # 1-bit pack (flags): 8/byte
            a = np.asarray(arr)
            flat = a.reshape(-1).astype(bool)
            pad = -flat.size % 8
            if pad:
                flat = np.concatenate([flat, np.zeros(pad, bool)])
            by = np.packbits(flat.reshape(-1, 8), axis=1, bitorder="little")
            parts8.append((path, (by.reshape(-1).view(np.int8), a.shape),
                           "b1"))

        # ---- inter batches (padded, canonical size list) ----
        # MC runs over a COMPACTED work batch: one (sel, x, y, mv) entry
        # per needed (PU, direction) — uni-predicted PUs cost one filter
        # pass, not two — and per-row indices i0/i1 gather the results
        # back for the weighted combine (halves P-frame MC work)
        def work_form(b, valid, key):
            pf = np.asarray(b["pf"])
            v = valid.astype(bool)
            m0 = ((pf & 1) != 0) & v
            m1 = ((pf & 2) != 0) & v
            n0, n1 = int(m0.sum()), int(m1.sum())
            nw = n0 + n1
            def cat(f0, f1):
                return np.concatenate([np.asarray(b[f0])[m0],
                                       np.asarray(b[f1])[m1]])
            wf = dict(wxs=cat("xs", "xs"), wys=cat("ys", "ys"),
                      wsel=cat("s0", "s1"), wmvx=cat("mvx0", "mvx1"),
                      wmvy=cat("mvy0", "mvy1"))
            tgt = max(nw, self._work_caps.get(key, 8))
            self._work_caps[key] = tgt
            pad = tgt - nw
            if pad:
                for f in wf:
                    last = wf[f][-1:] if nw else np.zeros(1, np.int32)
                    wf[f] = np.concatenate(
                        [wf[f], np.repeat(last, pad, axis=0)])
            i0 = np.zeros(len(pf), np.int32)
            i0[m0] = np.arange(n0)
            i1 = np.zeros(len(pf), np.int32)
            i1[m1] = n0 + np.arange(n1)
            wf["i0"] = i0
            wf["i1"] = i1
            return wf

        inter_sizes = []
        refs_padded = False
        ref_pocs = list(cp.ref_pocs) if cp.inter else []
        if cp.inter:
            built = []
            has_w = False
            ident = np.array([1, 0, 1, 0, 1, 0], np.int32)
            for (w, h) in _canonical_pu_sizes(1 << (self.ctb_log2 or 6)):
                batch = cp.inter.get((w, h))
                if batch is None:
                    b = dict(xs=np.zeros(8, np.int32), ys=np.zeros(8, np.int32),
                             pf=np.ones(8, np.int32), s0=np.zeros(8, np.int32),
                             mvx0=np.zeros(8, np.int32), mvy0=np.zeros(8, np.int32),
                             s1=np.zeros(8, np.int32), mvx1=np.zeros(8, np.int32),
                             mvy1=np.zeros(8, np.int32),
                             wden=np.zeros((8, 2), np.int32),
                             w0=np.tile(ident, (8, 1)),
                             w1=np.tile(ident, (8, 1)))
                    valid = np.zeros(8, bool)
                else:
                    b, valid = pad_batch(batch)
                    tgt = max(len(valid), self._inter_caps.get((w, h), 8))
                    if tgt > len(valid):
                        pad = tgt - len(valid)
                        b = {k: np.concatenate(
                            [v, np.repeat(v[-1:], pad, axis=0)]) for k, v in b.items()}
                        valid = np.concatenate([valid, np.zeros(pad, bool)])
                    self._inter_caps[(w, h)] = len(valid)
                    if (np.any(np.asarray(b["wden"])) or
                            np.any(np.asarray(b["w0"]) != ident) or
                            np.any(np.asarray(b["w1"]) != ident)):
                        has_w = True
                b["valid"] = valid.astype(np.int32)
                b.update(work_form(b, valid, (w, h)))
                built.append((w, h, b))
            for (w, h, b) in built:
                # w0/w1 stay int16: a weight is (1 << denom) + delta, up to
                # 255 (hevc_ps.c pred_weight_table ranges).  Unweighted
                # frames (the common case) ship no weight fields at all —
                # 12 int16 columns/PU saved — and the device combine takes
                # the exact put_hevc_qpel_{uni,bi} path instead of the
                # weighted formulas (which differ at BIT_DEPTH 14)
                flds = ("xs", "ys", "i0", "i1", "wxs", "wys", "wmvx", "wmvy")
                if has_w:
                    flds += ("w0", "w1")
                for f in flds:
                    add(("inter", w, h, f), b[f])
                for f in (("pf", "wden", "valid", "wsel") if has_w
                          else ("pf", "valid", "wsel")):
                    add8(("inter", w, h, f), b[f])
                inter_sizes.append((w, h))
        else:
            has_w = False

        # ---- intra reconstruction path ----
        # on a real TPU the sequential Pallas kernel replaces the lax.scan
        # wavefront whenever the plane fits VMEM (OPENHEVC_IPAL=interp
        # forces it in interpreter mode for CPU tests; =off disables)
        ipal = ()
        if use_ipal:
            if not fast:
                from ..decoder.plan import IntraOp
                iops = [op for op in plan.ops if isinstance(op, IntraOp)]
            c444 = cfmt == 3
            ctb = 1 << (plan.log2_ctb_size or 6)
            bands_l = intra_pallas.band_plan(plan.height, plan.width, ctb)
            for c in range(3):
                shs, svs = (hs, vs) if c else (0, 0)
                hc, wc = plan.height >> svs, plan.width >> shs
                bands = [(s >> svs, e >> svs) for (s, e) in bands_l]
                if fast:
                    from . import plan_soa
                    metas = plan_soa.intra_meta_bands(
                        plan.soa["intra"], c, bands, c444,
                        smoothing_off=bool(plan.intra_smoothing_disabled))
                else:
                    metas = intra_pallas.split_meta_bands(
                        iops, c, c444, bands,
                        smoothing_off=bool(plan.intra_smoothing_disabled))
                entry = ()
                for bi, ((s, e), meta) in enumerate(zip(bands, metas)):
                    if meta is None:
                        continue
                    tgt = max(meta.shape[0],
                              self._ipal_chunks[fam].get((c, bi), 1))
                    if meta.shape[0] < tgt:
                        meta = np.concatenate(
                            [meta, np.zeros((tgt - meta.shape[0],) +
                                            meta.shape[1:], np.int32)])
                    self._ipal_chunks[fam][(c, bi)] = tgt
                    add(("ipal", c, bi), meta)
                    entry += ((bi, s, e, tgt),)
                if entry:
                    ipal += ((c, entry),)

        # ---- wavefront slots (flat, slot-ordered layout) ----
        if fast:
            from . import plan_soa
            T, caps, data = 1, {}, {}
            resid = plan_soa.resid_fields(plan.soa["resid"], cfmt)
        elif use_ipal:
            T, caps, data, resid = schedule_slots(plan, min_caps=None,
                                                  intra=False)
        else:
            T, caps, data, resid = schedule_slots(
                plan, min_caps=self._slot_caps[fam])
        self._slot_caps[fam] = dict(caps)
        tmin = self._slot_T[fam].get("T", 1)
        if T < tmin:
            pad = tmin - T
            for k in data:
                for kk in ("offs", "counts"):
                    data[k][kk] = np.concatenate(
                        [data[k][kk], np.zeros(pad, np.int32)])
            T = tmin
        self._slot_T[fam]["T"] = T
        slot_keys = tuple(sorted(data.keys()))
        slot_caps = tuple(caps[k] for k in slot_keys)
        for key in slot_keys:
            d = data[key]
            # sticky pow2 flat length so the packed layout stays monotone
            n_rows = len(d["xs"])
            tgt = max(_pow2(n_rows), self._flat_len[fam].get(key, 8))
            self._flat_len[fam][key] = tgt
            for f, v in d.items():
                if f in ("offs", "counts"):
                    add(("slot",) + key + (f,), v)
                    continue
                if len(v) < tgt:
                    v = np.concatenate(
                        [v, np.zeros((tgt - len(v),) + v.shape[1:], v.dtype)])
                add(("slot",) + key + (f,), v)

        # ---- whole-frame residual batches (outside the scan) ----
        # coefficient levels ride a SEPARATE wire buffer as packed 4-bit
        # nibbles: 97-99% of levels fit [-8, 7] on real content, so this
        # quarters the dominant plan section vs int16.  Exceptions ship as
        # (index, value) escapes the device scatters over the widened
        # plane: (7, 127] with int8 values (5 B each), the ultra-rare
        # |level| > 127 with int16 values (6 B each).  (The reference
        # stores full int16 coeffs, hevc_cabac.c:1950.)
        resid_keys = []
        lv_specs = []                   # (key, n_rows, tgt) per bucket
        for key in sorted(resid.keys()):
            c, n = key
            d = resid[key]
            n_rows = len(d["xs"])
            tgt = max(_quant(max(1, n_rows)),
                      self._resid_len.setdefault(fam, {}).get(key, 1))
            self._resid_len[fam][key] = tgt
            valid = np.zeros(tgt, np.int32)
            valid[:n_rows] = 1
            for f in ("xs", "ys", "qp", "kind", "mid", "xtra"):
                v = d[f]
                if len(v) < tgt:
                    v = np.concatenate(
                        [v, np.zeros((tgt - len(v),) + v.shape[1:], v.dtype)])
                (add if f in ("xs", "ys") else add8)(("resid", c, n, f), v)
            add8(("resid", c, n, "valid"), valid)
            lv_specs.append((key, n_rows, tgt))

        # nibble buffer layout + fill (native one-pass on the fast path);
        # every bucket's nibble region is tgt*n*n/2 bytes (n*n >= 16 even,
        # so TUs stay byte-aligned)
        layout8 = []
        off8 = 0
        bucket_base = np.zeros(12, np.int64)
        for (key, n_rows, tgt) in lv_specs:
            c, n = key
            layout8.append((("resid", c, n, "levels"), off8, (tgt, n, n),
                            "nib"))
            bucket_base[c * 4 + (n.bit_length() - 3)] = off8
            off8 += tgt * n * n // 2
        packed8_np = np.zeros(max(off8, 1), np.int8)
        if lv_specs:
            if fast:
                from ..native import pack_levels_native
                eb, ei, ev, e8b, e8i, e8v = pack_levels_native(
                    plan.soa["resid"], plan.raw_levels, bucket_base,
                    packed8_np)
            else:
                ebl, eil, evl = [], [], []
                e8bl, e8il, e8vl = [], [], []
                for (key, n_rows, tgt), (lpath, o8, _shape, _nib) in \
                        zip(lv_specs, layout8):
                    c, n = key
                    b = c * 4 + (n.bit_length() - 3)
                    lv = np.clip(resid[key]["levels"], -32768, 32767) \
                        .astype(np.int32).reshape(n_rows, -1) \
                        if n_rows else np.zeros((0, n * n), np.int32)
                    esc8 = ((lv < -8) | (lv > 7)) & (lv >= -128) & (lv <= 127)
                    esc16 = (lv < -128) | (lv > 127)
                    if esc8.any():
                        idx = np.flatnonzero(esc8.ravel())
                        e8bl.append(np.full(len(idx), b, np.int32))
                        e8il.append(idx.astype(np.int64))
                        e8vl.append(lv.ravel()[idx].astype(np.int8))
                    if esc16.any():
                        idx = np.flatnonzero(esc16.ravel())
                        ebl.append(np.full(len(idx), b, np.int32))
                        eil.append(idx.astype(np.int64))
                        evl.append(lv.ravel()[idx])
                    lv4 = np.where(esc8 | esc16, 0, lv).reshape(-1, 2)
                    by = ((lv4[:, 0] & 15) | ((lv4[:, 1] & 15) << 4)) \
                        .astype(np.uint8).view(np.int8)
                    packed8_np[o8:o8 + n_rows * n * n // 2] = by
                eb = np.concatenate(ebl) if ebl else np.zeros(0, np.int32)
                ei = np.concatenate(eil) if eil else np.zeros(0, np.int64)
                ev = np.concatenate(evl) if evl else np.zeros(0, np.int32)
                e8b = np.concatenate(e8bl) if e8bl else np.zeros(0, np.int32)
                e8i = np.concatenate(e8il) if e8il else np.zeros(0, np.int64)
                e8v = np.concatenate(e8vl) if e8vl else np.zeros(0, np.int8)

        # per-bucket escape sections (sticky caps; idx split lo/hi int16;
        # int8-value escapes put their value byte on the nibble buffer)
        for (key, n_rows, tgt) in lv_specs:
            c, n = key
            b = c * 4 + (n.bit_length() - 3)
            oob = tgt * n * n           # out-of-range index: device drops it
            m = eb == b
            cnt = int(m.sum())
            ecap = max(_pow2(cnt) if cnt else 0,
                       self._resc_len.setdefault(fam, {}).get(key, 0))
            self._resc_len[fam][key] = ecap
            if ecap:
                idx = np.full(ecap, oob, np.int64)
                val = np.zeros(ecap, np.int32)
                idx[:cnt] = ei[m]
                val[:cnt] = ev[m]
                add(("resc", c, n, "lo"), idx & 0xFFFF)
                add(("resc", c, n, "hi"), idx >> 16)
                add(("resc", c, n, "val"), val)
            m8 = e8b == b
            cnt8 = int(m8.sum())
            # int8-value escapes ship as DELTA-coded indices: one uint16
            # gap per escape instead of a 32-bit index (3 B/escape, was 5).
            # idx = cumsum(d) - 1 on device; hops > 65535 split into extra
            # zero-value entries (the scatter is .add, so val=0 is inert,
            # as is the d=0 padding tail that re-adds 0 at the last index)
            if cnt8:
                perm = np.argsort(e8i[m8], kind="stable")
                idx8 = e8i[m8][perm]
                v8 = e8v[m8][perm]
                d = np.diff(idx8 + 1, prepend=np.int64(0))
                nsplit = (d - 1) // 65535
                if nsplit.any():
                    dl, vl = [], []
                    for dj, vj, ns in zip(d, v8, nsplit):
                        for _ in range(int(ns)):
                            dl.append(65535)
                            vl.append(0)
                            dj -= 65535
                        dl.append(int(dj))
                        vl.append(vj)
                    d = np.asarray(dl, np.int64)
                    v8 = np.asarray(vl, np.int8)
            else:
                d = np.zeros(0, np.int64)
                v8 = np.zeros(0, np.int8)
            e8cap = max(_quant(len(d)) if len(d) else 0,
                        self._rese_len.setdefault(fam, {}).get(key, 0))
            self._rese_len[fam][key] = e8cap
            if e8cap:
                dd = np.zeros(e8cap, np.int64)
                val = np.zeros(e8cap, np.int8)
                dd[:len(d)] = d
                val[:len(d)] = v8
                add(("rese", c, n, "d"), dd.astype(np.uint16).view(np.int16))
                add8(("rese", c, n, "val"), val)
            resid_keys.append((c, n, tgt, ecap, e8cap))
        resid_keys = tuple(resid_keys)

        # ---- cross-component alpha maps (RExt 4:4:4) ----
        has_cc = False
        if cfmt == 3:
            if fast:
                from . import plan_soa
                amaps = plan_soa.cc_alpha_maps(plan.soa["resid"],
                                               plan.height, plan.width)
                for c in (1, 2):
                    if amaps[c - 1] is not None:
                        add8(("ccmap", c), amaps[c - 1])
                        has_cc = True
            else:
                from ..decoder.plan import ResidualOp as _ROp
                for c in (1, 2):
                    amap = None
                    for op in plan.ops:
                        if isinstance(op, _ROp) and op.c_idx == c \
                                and op.cc_alpha:
                            if amap is None:
                                amap = np.zeros((plan.height, plan.width),
                                                np.int32)
                            nn = 1 << op.log2_size
                            amap[op.y:op.y + nn, op.x:op.x + nn] = op.cc_alpha
                    if amap is not None:
                        add8(("ccmap", c), amap)
                        has_cc = True

        # ---- filter maps ----
        deblock_on = not plan.deblock_disable
        ph = -plan.height % 16
        pw = -plan.width % 16

        def padmap(m, dy, dx):
            return np.pad(np.asarray(m), ((0, dy), (0, dx)))

        nfm0 = (plan.no_filter_map if plan.no_filter_map is not None
                else np.zeros((plan.height // 4, plan.width // 4), np.int32))
        add2(("map", "vbs"), padmap(plan.vertical_bs, ph // 4, pw // 8))
        add2(("map", "hbs"), padmap(plan.horizontal_bs, ph // 8, pw // 4))
        add8(("map", "qp"), padmap(plan.qp_map, ph // 8, pw // 8))
        add1(("map", "nfm"), padmap(nfm0, ph // 4, pw // 4))
        db_maps = plan.deblock_beta_map is not None
        if db_maps:
            add8(("map", "dbbeta"), plan.deblock_beta_map)
            add8(("map", "dbtc"), plan.deblock_tc_map)

        # ---- SAO maps ----
        sao_on = plan.sao is not None and (plan.sao_luma or plan.sao_chroma)
        if sao_on:
            ctb = 1 << (self.ctb_log2 or 6)
            restore_any = ((plan.no_filter_map is not None and
                            np.asarray(plan.no_filter_map).any()) or
                           plan.sao_restore is not None)
            grid = (-(-plan.height // ctb), -(-plan.width // ctb))
            for c in range(3):
                shape = (plan.height >> (vs if c else 0),
                         plan.width >> (hs if c else 0))
                tm, bm, em, om = build_sao_grids(plan, c, grid)
                add8(("sao", c, "tm"), tm)
                add8(("sao", c, "bm"), bm)
                add8(("sao", c, "em"), em)
                add8(("sao", c, "om"), om)   # |offset| <= 31 (cmax, 7.3.8.3)
                if restore_any:
                    # per-axis subsampling: 4:2:2 halves x only (hs=1,
                    # vs=0), 4:2:0 halves both, 4:4:4 neither
                    rep_y = 4 >> (vs if c else 0)
                    rep_x = 4 >> (hs if c else 0)
                    mask = np.repeat(np.repeat(np.asarray(
                        plan.no_filter_map if plan.no_filter_map is not None
                        else np.zeros((plan.height // 4, plan.width // 4))),
                        rep_y, 0), rep_x, 1)[:shape[0], :shape[1]].astype(bool)
                    if plan.sao_restore is not None:
                        mask = mask | np.asarray(plan.sao_restore[c],
                                                 bool)[:shape[0], :shape[1]]
                    add1(("sao", c, "restore"), mask.astype(np.int8))

        # ---- PCM base canvas (verbatim samples precede the wavefront) ----
        if fast:
            from . import plan_soa
            base_np = plan_soa.pcm_base(plan.soa["pcm"], plan.raw_levels,
                                        cfmt, plan.height, plan.width)
            has_base = base_np is not None
        else:
            from ..decoder.plan import PcmOp
            pcm_ops = [op for op in plan.ops if isinstance(op, PcmOp)]
            has_base = bool(pcm_ops)
            if has_base:
                shapes = [(plan.height, plan.width),
                          (plan.height >> vs, plan.width >> hs),
                          (plan.height >> vs, plan.width >> hs)]
                base_np = [np.zeros(s, np.int32) for s in shapes]
                for op in pcm_ops:
                    s = op.samples
                    base_np[op.c_idx][op.y:op.y + s.shape[0],
                                      op.x:op.x + s.shape[1]] = s
        if has_base:
            for c in range(3):
                add(("base", c), base_np[c])

        # ---- scaling-list factor stacks per transform size ----
        has_scaling = plan.scaling is not None
        if has_scaling:
            for l2, n in ((2, 4), (3, 8), (4, 16), (5, 32)):
                add(("scale", n),
                    np.stack([plan.scaling[(l2, m)] for m in range(6)]))

        # ---- ONE packed wire blob + static layouts ----
        # [int16 fields (as raw little-endian bytes) | int8/nibble region]:
        # a single host->device transfer per frame instead of two — the
        # tunnel's per-transfer setup cost and its small-chunk rate penalty
        # both halve (frame_step bitcasts the head back to int16 on device)
        layout = []
        off = 0
        for path, arr in parts:
            layout.append((path, off, arr.shape))
            off += arr.size
        n16 = max(off, 1)
        # int8 region: [levels | int8 field sections]; "b2"/"b1" entries
        # store packed bytes with the LOGICAL shape in the layout
        o8 = off8
        flats8 = []
        for path, arr, tag in parts8:
            if tag in ("b2", "b1"):
                by, shape = arr
                layout8.append((path, o8, shape, tag))
                flats8.append(by)
                o8 += by.size
            else:
                layout8.append((path, o8, arr.shape))
                flats8.append(arr.reshape(-1))
                o8 += arr.size
        # sticky whole-blob capacity: a stable upload length per frame
        # family (fewer jit signatures, and group uploads slice evenly)
        total = 2 * n16 + max(o8, 1)
        bcap = max(_quant(total), self._blob_cap.get(fam, 0))
        self._blob_cap[fam] = bcap
        blob_np = np.zeros(bcap, np.int8)
        packed_np = blob_np[:2 * n16].view(np.int16)
        if off < n16:
            packed_np[off:] = 0
        for (path, o, shape), (_p, arr) in zip(layout, parts):
            # single casting copy per field, straight into the wire buffer
            packed_np[o:o + arr.size] = arr.reshape(-1)
        full8 = blob_np[2 * n16:]
        full8[:off8] = packed8_np[:off8]
        for (entry, flat) in zip(layout8[len(lv_specs):], flats8):
            o = entry[1]
            full8[o:o + flat.size] = flat

        prof = (bd, bool(plan.strong_intra_smoothing), cfmt, plan.height,
                plan.width, tuple(inter_sizes), slot_keys, slot_caps,
                resid_keys, deblock_on, sao_on,
                "map" if db_maps else plan.beta_offset,
                "map" if db_maps else plan.tc_offset,
                plan.cb_qp_offset, plan.cr_qp_offset,
                has_base, has_scaling, tuple(layout), plan.log2_ctb_size,
                ipal, has_cc, bool(plan.intra_smoothing_disabled),
                refs_padded, has_w, ffilt, self.shard, tuple(layout8), n16,
                dwire)
        self._caps_flush()
        return (plan, blob_np, prof, ref_pocs)
